"""AOT export of the serving edit path as a self-contained StableHLO artifact.

A production capability beyond the reference (whose serving story is
`run_recon.py`'s resident Python process): `jax.export` serializes the
jit-compiled edit function — decoder weights and VQ codebook baked in as
constants — into one portable blob. A server deserializes and calls it with
NO model code, NO flax, NO checkpoint plumbing; the batch dimension is
symbolic, so one artifact serves any batch size, and the artifact is lowered
for both CPU and TPU by default.

Semantics of the exported function are exactly
`cli.edit_batch.make_batched_edit_fn` (label-0 masking + codebook lookup +
per-slice mean rescale + decode + optional lung re-window + optional uint8
quantization — reference `run_recon.py:182-197`), pinned by round-trip test.

CLI:
    python run_export.py --config lung --out edit_lung.jaxexport \\
        [--image-size 512] [--uint8]
    (checkpoint from LUNG_CKPT/CRC_CKPT env, as run_recon)
"""

import argparse
import os
import sys

import jax
import jax.numpy as jnp
from jax import export as jax_export

from .edit_batch import make_batched_edit_fn


def export_edit_artifact(
    decoder,
    dec_vars,
    vq_state,
    *,
    image_size: int,
    is_lung: bool = False,
    dataset_window=(4096, 0.0, 2.0),
    output_dtype=None,
    platforms=("cpu", "tpu"),
) -> bytes:
    """Serialize the batched edit function to a portable artifact.

    Weights/codebook are embedded as constants; input is
    `(b, image_size, image_size) int32` with symbolic batch `b`.
    """
    edit = make_batched_edit_fn(
        decoder,
        is_lung=is_lung,
        dataset_window=dataset_window,
        output_dtype=output_dtype,
    )

    def fn(id_maps):
        return edit(dec_vars, vq_state, id_maps)

    (b,) = jax_export.symbolic_shape("b")
    spec = jax.ShapeDtypeStruct((b, image_size, image_size), jnp.int32)
    exported = jax_export.export(jax.jit(fn), platforms=list(platforms))(spec)
    return bytes(exported.serialize())


def save_edit_artifact(path: str, data: bytes) -> None:
    with open(path, "wb") as f:
        f.write(data)


def load_edit_artifact(path: str):
    """Deserialize an artifact → callable(id_maps (B,H,W) int32) → recon.

    Needs only jax — no model classes, no checkpoint."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))

    def call(id_maps):
        return exported.call(jnp.asarray(id_maps, jnp.int32))

    call.exported = exported
    return call


def main(argv=None):
    from ..utils.config import load_dotenv
    from .run_recon import CRCConfig, LungConfig, load_model

    load_dotenv()  # LUNG_CKPT / CRC_CKPT, as every sibling serving CLI
    p = argparse.ArgumentParser(description="Export the edit path as a StableHLO artifact")
    p.add_argument("--config", choices=["lung", "crc"], default="lung")
    p.add_argument("--out", required=True)
    p.add_argument("--image-size", type=int, default=512)
    p.add_argument("--uint8", action="store_true",
                   help="quantize [-1,1]→uint8 on device (PNG consumers)")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering platforms")
    p.add_argument("--dtype", choices=["f32", "bf16"], default=None,
                   help="decode compute dtype baked into the artifact")
    p.add_argument("--allow-random-init", action="store_true",
                   help="export even with no checkpoint configured (smoke "
                        "tests only — the artifact would serve random weights)")
    args = p.parse_args(argv)

    from . import cli_setup

    cli_setup("export-edit")

    config = LungConfig() if args.config == "lung" else CRCConfig()
    if args.dtype:
        config.compute_dtype = {"f32": None, "bf16": "bfloat16"}[args.dtype]
    if not config.resume_checkpoint and not args.allow_random_init:
        print("error: no checkpoint configured (set LUNG_CKPT/CRC_CKPT or "
              ".env); pass --allow-random-init to export anyway",
              file=sys.stderr)
        return 1
    _, decoder, state = load_model(config)
    if not config.resume_checkpoint:
        print("warning: no checkpoint env set — exporting random-init weights",
              file=sys.stderr)

    data = export_edit_artifact(
        decoder,
        state.dec_vars,
        state.vq,
        image_size=args.image_size,
        is_lung=args.config == "lung",
        output_dtype="uint8" if args.uint8 else None,
        platforms=tuple(s for s in args.platforms.split(",") if s),
    )
    save_edit_artifact(args.out, data)
    print(f"wrote {args.out}: {len(data) / 1e6:.1f} MB "
          f"(batch symbolic, {args.image_size}², "
          f"{'uint8' if args.uint8 else 'float32'} output)")


if __name__ == "__main__":
    sys.exit(main())
