"""`export-ckpt`: write this framework's checkpoint as a reference-compatible
PyTorch-Lightning `.ckpt`.

The inverse of `import-ckpt` — train here on TPU, hand the `.ckpt` to a
collaborator running the reference on GPUs: its `state_dict` loads into the
reference's own modules with `load_state_dict(strict=True)` (prefixes
`encoder.` / `decoder.` / `discriminator.`, `run_recon.py:99-111`,
`trainers/base.py:85-114`), i.e. its inference surgery and staged loaders
(`load_from_checkpoint` / `first_stage_ckpt_path` / `discriminator_ckpt_path`)
all accept the file. It is NOT a full Lightning training checkpoint —
optimizer states are not exported, so Trainer `resume_from_checkpoint` is out
of scope; a reference-side fine-tune starts fresh optimizers.

Usage:
    export-ckpt -c config.json --ckpt results/study/version_0/ckpt --out ref.ckpt
"""

import argparse
import warnings


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Export an Orbax checkpoint as a reference Lightning .ckpt"
    )
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("--ckpt", required=True,
                        help="this framework's checkpoint directory")
    parser.add_argument("--out", required=True, help="output .ckpt path")
    parser.add_argument("-w", "--multiwindow", action="store_true")
    parser.add_argument("-v", "--vqgan", action="store_true")
    parser.add_argument("--epoch", type=int, default=None,
                        help="pick a specific saved epoch (default: newest)")
    parser.add_argument("--image-size", type=int, default=None)
    args = parser.parse_args(argv)

    from . import cli_setup
    from ..train.trainer import Trainer
    from ..utils.checkpoint import restore_state
    from ..utils.config import getattr_else_none as g
    from ..utils.config import load_json, validate_config
    from ..utils import torch_export as te

    cli_setup("export-ckpt")
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
    state = restore_state(args.ckpt, state, epoch=args.epoch)

    named = {}
    if trainer.vqgan is not None:
        named["decoder"] = te.export_vqgan(state.dec_vars, state.vq,
                                           trainer.vqgan)
        what = ["VQGAN (decoder field) + VQ buffers"]
    else:
        named["encoder"] = te.export_unet_encoder(state.enc_vars, state.vq)
        named["decoder"] = te.export_unet_decoder(state.dec_vars)
        what = ["UNetEncoder + VQ buffers", "UNetDecoder"]
    if trainer.dis_type == "UNetDiscriminator":
        named["discriminator"] = te.export_unet_discriminator(
            state.dis_vars, trainer.dis
        )
    else:
        named["discriminator"] = te.export_nlayer_discriminator(state.dis_vars)
    what.append(trainer.dis_type)

    epoch, step = int(state.epoch), int(state.step)
    te.save_lightning_ckpt(args.out, named, epoch=epoch, step=step)
    print(f"Exported (epoch {epoch}, step {step}):")
    for line in what:
        print(f"  * {line}")
    print(f"Wrote reference-compatible Lightning checkpoint: {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
