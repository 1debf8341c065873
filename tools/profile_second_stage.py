"""In-situ marginal accounting for the GAN second-stage step.

Same method as tools/profile_ablate.py (the honest one under XLA fusion):
rebuild the FULL jitted step with one piece disabled and read the end-to-end
delta. Pieces map to the reference's step composition at
`src/trainers/single_window_trainer.py:264-432`:

  * decoder objective (recon + focal-frequency)           — loss flags off
  * "unet_perceptual" feature-matching D(real) call       — loss flag off
  * the whole discriminator inner iteration               — time(n=2) − time(n=1)
    (hinge on real/fake maps+bottlenecks, CutMix composite, consistency MSE,
    Adam — one full extra scan iteration is exactly one inner loop's cost)
  * the decoder's conv stack                              — 1×1-conv stub
  * everything the discriminator touches                  — 1×1-conv stub D

Defaults reproduce PERF.md's operating point (256², batch 4, D_ch 64, bf16
generator). For a CPU smoke of the tool itself:

    JAX_PLATFORMS=cpu python tools/profile_second_stage.py \
        --size 64 --batch 2 --dch 4 --filters 4,8,16,32,64 --iters 2
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def run_step_loop(step, state, image, iters):
    state, m = step(state, image, jnp.float32(0.0))  # compile
    float(m["total"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, image, jnp.float32(0.0))
    float(m["total"])  # device→host barrier (block_until_ready is unreliable here)
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--dch", type=int, default=64)
    ap.add_argument("--dattn", default="64",
                    help="D attention resolutions ('0' to disable; needed "
                         "for tiny --dch where C//8 would hit zero)")
    ap.add_argument("--dict-size", type=int, default=10)
    ap.add_argument("--filters", default="16,32,64,128,256")
    ap.add_argument("--dec-filters", default="32,64,128,256,512")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from medical_image_editing_tpu.utils.compile_cache import enable_compile_cache
    from medical_image_editing_tpu.utils.device_probe import require_default_backend

    enable_compile_cache()
    require_default_backend("profile_second_stage")

    import flax.linen as nn

    from medical_image_editing_tpu.models import UNetDecoder, UNetDiscriminator
    from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ
    from medical_image_editing_tpu.train import create_train_state
    from medical_image_editing_tpu.train.second_stage import (
        SecondStageLossConfig,
        make_second_stage_step,
    )
    from medical_image_editing_tpu.train.state import make_optimizer

    filters = tuple(int(s) for s in args.filters.split(","))
    dec_filters = tuple(int(s) for s in args.dec_filters.split(","))

    enc = EncoderWithVQ(filters=filters, dict_size=args.dict_size,
                        momentum=0.999, dtype=jnp.bfloat16)
    dec = UNetDecoder(out_channels=1, filters=dec_filters, dropped_skip_layers=(),
                      use_pixel_shuffle=False, dtype=jnp.bfloat16)
    dis = UNetDiscriminator(D_ch=args.dch, resolution=args.size, D_attn=args.dattn)

    x0 = jnp.zeros((args.batch, args.size, args.size, 1), jnp.float32)
    enc_vars, vq = enc.init(jax.random.key(0), x0)
    q, *_ = enc(enc_vars, vq, x0, train=False)
    dec_vars = dec.init(
        {"params": jax.random.key(1), "dropblock": jax.random.key(2)}, q, train=False
    )
    dis_vars = dis.init(jax.random.key(3), x0, train=False)
    enc_tx, dec_tx, dis_tx = (make_optimizer(1e-4), make_optimizer(1e-4),
                              make_optimizer(4e-4))
    state = create_train_state(jax.random.key(4), enc_vars, dec_vars, vq,
                               enc_tx, dec_tx, dis_vars=dis_vars, dis_tx=dis_tx)
    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.uniform(-1, 1, (args.batch, args.size, args.size, 1)).astype(np.float32)
    )

    base = dict(n_inner_loops=1, use_unet_perceptual_loss=True)

    def build(dec_mod=dec, dis_mod=dis, dis_state=None, **cfg_kw):
        cfg = SecondStageLossConfig(**{**base, **cfg_kw})
        step = jax.jit(make_second_stage_step(
            enc, dec_mod, dis_mod, dec_tx, dis_tx,
            loss_cfg=cfg, dis_type="UNetDiscriminator",
        ))
        return step, (dis_state or state)

    rows = []
    step, st = build()
    full = run_step_loop(step, st, image, args.iters)
    rows.append(("FULL step (n_inner_loops=1)", full))

    step, st = build(n_inner_loops=2)
    rows.append(("n_inner_loops=2 (marginal = one full dis iteration)",
                 run_step_loop(step, st, image, args.iters)))

    step, st = build(use_unet_perceptual_loss=False)
    rows.append(("− unet_perceptual (feature-match D(real) call)",
                 run_step_loop(step, st, image, args.iters)))

    step, st = build(use_recon_loss=False, use_frequency_loss=False)
    rows.append(("− recon − focal-frequency (decoder objective)",
                 run_step_loop(step, st, image, args.iters)))

    class TinyDec(nn.Module):
        dtype: object = jnp.bfloat16

        @nn.compact
        def __call__(self, x, train=False, drop_prob=0.0):
            return nn.Conv(1, (1, 1), dtype=self.dtype)(x)

    tiny_dec = TinyDec()
    tdv = tiny_dec.init(jax.random.key(9), q)
    st_td = state.replace(dec_vars=tdv, dec_opt=dec_tx.init(tdv["params"]))
    step, _ = build(dec_mod=tiny_dec)
    rows.append(("− decoder (1×1 stub)", run_step_loop(step, st_td, image, args.iters)))

    class TinyDis(nn.Module):
        @nn.compact
        def __call__(self, x, train=True):
            m = nn.Conv(1, (1, 1))(x)
            return m, jnp.mean(m, axis=(1, 2)), [m]

    tiny_dis = TinyDis()
    tiv = tiny_dis.init(jax.random.key(10), x0)
    st_ti = state.replace(dis_vars=tiv, dis_opt=dis_tx.init(tiv["params"]))
    step, _ = build(dis_mod=tiny_dis)
    rows.append(("− discriminator (1×1 stub: all D fwd/bwd + its Adam)",
                 run_step_loop(step, st_ti, image, args.iters)))

    print(f"\noperating point: {args.size}², batch {args.batch}, "
          f"D_ch {args.dch}, bf16 generator, backend "
          f"{jax.devices()[0].platform}")
    print("| Variant | ms | marginal |")
    print("|---|---|---|")
    for name, ms in rows:
        sign = ms - full if name.startswith("n_inner") else full - ms
        print(f"| {name} | {ms:.1f} | {sign:+.1f} |")


if __name__ == "__main__":
    main()
