"""`import-ckpt`: convert a reference PyTorch-Lightning checkpoint into this
framework's Orbax checkpoint format.

The reference saves Lightning `.ckpt` files whose `state_dict` nests every
model under its trainer attribute name (`encoder.*`, `decoder.*`,
`discriminator.*` — `run_recon.py:99-111`, `trainers/base.py:85-114`). This
CLI rebuilds the models from the SAME config JSON the reference trainer used,
transplants the torch weights (incl. VQ codebook buffers, SPADE BatchNorm
running stats and spectral-norm u-vectors), and writes a checkpoint directory
that every consumer here accepts: `run.resume_checkpoint`,
`run.first_stage_ckpt_path`, `run.discriminator_ckpt_path`, `run_recon`'s
`LUNG_CKPT`/`CRC_CKPT`, `edit-batch`, `serve-edit`, `edit-volume`.

Usage:
    import-ckpt -c config.json --ckpt last.ckpt --out converted_ckpt/
    # then e.g.:  LUNG_CKPT=converted_ckpt run-recon ...
    # or set "resume_checkpoint": "converted_ckpt" in the config.

Optimizer states are NOT converted (torch Adam moments don't map onto optax
pytrees 1:1 in storage, and a resumed fine-tune re-warms them in a few steps);
the saved step/epoch come from the Lightning ckpt so retention/resume
bookkeeping continues where the reference left off.
"""

import argparse
import warnings


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Convert a reference Lightning .ckpt to an Orbax checkpoint"
    )
    parser.add_argument("-c", "--config", required=True,
                        help="the reference-style config JSON for this model")
    parser.add_argument("--ckpt", required=True, help="Lightning .ckpt path")
    parser.add_argument("--out", required=True,
                        help="output checkpoint directory")
    parser.add_argument("-w", "--multiwindow", action="store_true")
    parser.add_argument("-v", "--vqgan", action="store_true",
                        help="the checkpoint's decoder field holds a VQGAN")
    parser.add_argument("--image-size", type=int, default=None,
                        help="override dataset.image_size for model init")
    args = parser.parse_args(argv)

    from . import cli_setup
    from ..train.trainer import Trainer
    from ..utils.checkpoint import CheckpointManager
    from ..utils.config import getattr_else_none as g
    from ..utils.config import load_json, validate_config
    from ..utils import torch_import as ti

    cli_setup("import-ckpt")
    config = load_json(args.config)
    for w in validate_config(config, multi_window=bool(args.multiwindow),
                             vqgan=bool(args.vqgan)):
        warnings.warn(w)

    size = args.image_size
    if size is None:
        s = g(config.dataset, "image_size", None)
        size = 256 if s is None else (
            int(s[0]) if isinstance(s, (list, tuple)) else int(s)
        )

    trainer = Trainer(
        config, logger=None,
        use_multi_window=bool(args.multiwindow), use_vqgan=bool(args.vqgan),
    )
    state = trainer.init_state(size, load_staged=False)

    sd, meta = ti.load_reference_ckpt(args.ckpt)
    imported = []
    updates = {}

    if args.vqgan or any(k.startswith("decoder.encoder.conv_in") for k in sd):
        dec_vars, vq = ti.import_vqgan(sd, "decoder.",
                                       target_vars=state.dec_vars,
                                       target_vq=state.vq)
        updates.update(dec_vars=dec_vars, vq=vq)
        imported.append("VQGAN (decoder field) + VQ buffers")
    else:
        if any(k.startswith("encoder.") for k in sd):
            updates["enc_vars"] = ti.import_unet_encoder(
                sd, "encoder.", target_vars=state.enc_vars
            )
            updates["vq"] = ti.import_vq_state(sd, "encoder.vq.",
                                               target=state.vq)
            imported.append("UNetEncoder + VQ buffers")
        if any(k.startswith("decoder.") for k in sd):
            updates["dec_vars"] = ti.import_unet_decoder(
                sd, "decoder.", target_vars=state.dec_vars
            )
            imported.append("UNetDecoder (incl. SPADE BN running stats)")

    if any(k.startswith("discriminator.") for k in sd):
        if trainer.dis_type == "UNetDiscriminator":
            updates["dis_vars"] = ti.import_unet_discriminator(
                sd, "discriminator.", target_vars=state.dis_vars
            )
        else:
            updates["dis_vars"] = ti.import_nlayer_discriminator(
                sd, "discriminator.", target_vars=state.dis_vars
            )
        imported.append(f"{trainer.dis_type} (spectral-norm u-vectors kept)")

    if not updates:
        raise SystemExit(
            "no encoder./decoder./discriminator. keys found in "
            f"{args.ckpt} — is this a reference checkpoint?"
        )

    import jax.numpy as jnp

    state = state.replace(
        step=jnp.asarray(meta["step"], jnp.int32),
        epoch=jnp.asarray(meta["epoch"], jnp.int32),
        **updates,
    )

    mgr = CheckpointManager(args.out, limit_num=10**9)
    mgr.save(state, epoch=meta["epoch"])
    mgr.close()
    print(f"Imported from {args.ckpt} (epoch {meta['epoch']}, "
          f"step {meta['step']}):")
    for line in imported:
        print(f"  * {line}")
    print(f"Wrote Orbax checkpoint under {args.out} — usable as "
          "resume_checkpoint / first_stage_ckpt_path / "
          "discriminator_ckpt_path / LUNG_CKPT.")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
