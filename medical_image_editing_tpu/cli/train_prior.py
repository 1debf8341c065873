"""Train an autoregressive prior over VQ ids and sample novel images.

Completes the taming-style second stage the reference implies but never wires
(it vendors minGPT at `src/networks/mingpt.py` with `forward_with_past`, yet
ships no trainer/sampler CLI): freeze a trained first-stage VQ-WNet, encode
the dataset to id grids, teacher-force a causal transformer over the raster
order, then sample grids with the KV-cache scan sampler and decode them
through the codebook + decoder.

Usage:
    train-prior -c config.json --ckpt /path/to/epoch_ckpt [--steps 2000]
                [--sample 8] [--out prior_out] [--n-layer 8 --n-head 8
                 --n-embd 256] [--temperature 1.0 --top-k 5]

Everything device-side is jitted: id extraction (encoder+VQ forward), the LM
step, the whole-grid sampler (one `lax.scan` program), and the decode.
"""

import argparse
import json
import os


def build_first_stage(cfg):
    """Encoder/decoder/state from a run_vqwnet-style config + checkpoint."""
    import jax
    import jax.numpy as jnp

    from ..models import UNetDecoder
    from ..models.unet_encoder import EncoderWithVQ
    from ..train.state import create_train_state, make_optimizer

    vqm = cfg["model"]["vqmodel"]
    encoder = EncoderWithVQ(
        filters=tuple(vqm["enc_filters"]),
        dict_size=int(vqm["dict_size"]),
        momentum=float(vqm.get("momentum", 0.99)),
        use_styled_up_block=bool(vqm.get("enc_use_styled_up_block", False)),
    )
    decoder = UNetDecoder(
        out_channels=int(vqm.get("in_channels", 1)),
        filters=tuple(vqm["dec_filters"]),
        use_dropblock=bool(vqm.get("use_dropblock", False)),
        block_size=int(vqm.get("block_size", 3)),
        dropped_skip_layers=tuple(vqm.get("dropped_skip_layers", ()) or ()),
        use_pixel_shuffle=bool(vqm.get("use_pixel_shuffle", False)),
    )
    h, w = cfg["dataset"]["image_size"]
    x0 = jnp.zeros((1, int(h), int(w), int(vqm.get("in_channels", 1))), jnp.float32)
    enc_vars, vq = encoder.init(jax.random.key(0), x0)
    q, *_ = encoder(enc_vars, vq, x0, train=False)
    dec_vars = decoder.init(
        {"params": jax.random.key(1), "dropblock": jax.random.key(2)}, q,
        train=False,
    )
    tx = make_optimizer(1e-4)
    state = create_train_state(jax.random.key(3), enc_vars, dec_vars, vq, tx, tx)
    grid_hw = tuple(int(s) for s in q.shape[1:3])
    return encoder, decoder, state, grid_hw


def main(argv=None):
    parser = argparse.ArgumentParser(description="VQ-id prior trainer/sampler")
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--ckpt", default=None,
                        help="first-stage Orbax checkpoint to freeze "
                             "(default: random init — smoke/debug only)")
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--batch", type=int, default=None,
                        help="prior batch size (default: dataset batch_size)")
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--n-layer", type=int, default=8)
    parser.add_argument("--n-head", type=int, default=8)
    parser.add_argument("--n-embd", type=int, default=256)
    parser.add_argument("--dropout", type=float, default=0.1)
    parser.add_argument("--sample", type=int, default=8,
                        help="grids to sample + decode at the end (0 = skip)")
    parser.add_argument("--temperature", type=float, default=1.0)
    parser.add_argument("--top-k", type=int, default=None)
    parser.add_argument("--out", default="prior_out")
    parser.add_argument("--log-every", type=int, default=50)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args(argv)

    from . import cli_setup

    cli_setup("train-prior")

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from ..data import get_data_loader
    from ..models.mingpt import GPT, GPTConfig
    from ..models.unet_encoder import get_embed_from_ids
    from ..train.prior import (
        create_prior_state,
        make_prior_sampler,
        make_prior_train_step,
    )
    from ..utils.checkpoint import restore_fields
    from ..utils.imaging import save_image_grid

    with open(args.config) as f:
        cfg = json.load(f)

    encoder, decoder, state, grid_hw = build_first_stage(cfg)
    if args.ckpt:
        state = restore_fields(args.ckpt, state, ("enc_vars", "dec_vars", "vq"))
        print(f"first stage restored from {args.ckpt}")
    else:
        print("WARNING: no --ckpt; prior trains on ids of a RANDOM first stage")

    dict_size = int(cfg["model"]["vqmodel"]["dict_size"])
    sos = dict_size
    n_tokens = grid_hw[0] * grid_hw[1]
    gcfg = GPTConfig(
        vocab_size=dict_size + 1,
        block_size=n_tokens,
        n_layer=args.n_layer,
        n_head=args.n_head,
        n_embed=args.n_embd,
        emb_pdrop=args.dropout,
        res_pdrop=args.dropout,
        att_pdrop=args.dropout,
    )
    gpt = GPT(gcfg)
    tx = optax.adamw(args.lr, weight_decay=0.01)
    pstate = create_prior_state(jax.random.key(args.seed), gpt, tx, batch=1)
    pstep = jax.jit(make_prior_train_step(gpt, tx, sos_token=sos))

    @jax.jit
    def extract_ids(st, image):
        # encoder ids are 1-based (0 = VQ background convention); the grids
        # seen in training have no background → 0-based LM vocab
        _, _, ids, _, _ = encoder(st.enc_vars, st.vq, image, train=False)
        return ids - 1

    ds = cfg["dataset"]
    loader = get_data_loader(
        "train", ds["dataset_name"], ds["root_dir_path"],
        batch_size=int(args.batch or ds["batch_size"]),
        num_workers=int(ds.get("num_workers", 0) or 0),
        modality=ds.get("modality"),
        augmentations=[],  # ids of the CLEAN slices are the LM corpus
        drop_last=True,
        window_width=ds.get("window_width"),
        window_center=ds.get("window_center"),
        window_scale=ds.get("window_scale"),
        seed=args.seed,
    )

    os.makedirs(args.out, exist_ok=True)
    step_n = 0
    while step_n < args.steps:
        for batch in loader:
            ids = extract_ids(state, jnp.asarray(batch["image"]))
            pstate, metrics = pstep(pstate, ids)
            step_n += 1
            if step_n % args.log_every == 0 or step_n == args.steps:
                print(f"step {step_n}: loss={float(metrics['loss']):.4f} "
                      f"acc={float(metrics['acc']):.3f}", flush=True)
            if step_n >= args.steps:
                break

    # persist the prior (orbax, same layout as the trainer checkpoints)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    prior_path = os.path.abspath(os.path.join(args.out, "prior_ckpt"))
    ckptr.save(prior_path, {"params": pstate.variables["params"]}, force=True)
    ckptr.wait_until_finished()
    print(f"prior saved: {prior_path}")

    if args.sample > 0:
        sampler = jax.jit(
            make_prior_sampler(
                gpt, sos_token=sos, grid_hw=grid_hw,
                temperature=args.temperature, top_k=args.top_k,
            ),
            static_argnums=(2,),
        )

        @jax.jit
        def decode(st, ids):
            q = get_embed_from_ids(st.vq, ids)
            return decoder.apply(st.dec_vars, q, False)

        key = jax.random.key(args.seed + 1)
        eval_vars = {"params": pstate.variables["params"]}
        grids = sampler(eval_vars, key, args.sample)
        images = decode(state, grids)
        out_png = os.path.join(args.out, "samples.png")
        # decoder output is in [-1, 1]; the grid helper expects [0, 1]
        save_image_grid((np.asarray(images) + 1.0) / 2.0, out_png, nrow=4)
        np.save(os.path.join(args.out, "sample_ids.npy"), np.asarray(grids))
        print(f"samples: {out_png}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
