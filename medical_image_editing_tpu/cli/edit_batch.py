"""Batched codebook-swap editing: many painted label maps → decoded slices in
one jit-compiled dispatch.

BASELINE.json configs #3/#4: "lung-cancer CT editing: codebook-swap nodule
insertion at 512², batched 32-slice inference" and "rectal-cancer T2 MR
editing: full-study multi-slice edit pipeline on v5e-8 data parallel". The
reference's editing loop (`src/run_recon.py:232-238`) is strictly batch-1 at
1 Hz; this module is the batched/throughput generalization: the same
label-0-masking + codebook-lookup + mean-rescale + decode semantics
(`run_recon.py:182-197`), vmapped over a slice batch, optionally shard_map'd
over a data mesh for full-study editing.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..models.unet_encoder import get_embed_from_ids
from ..ops.windowing import denormalize, normalize


def make_batched_edit_fn(
    decoder,
    *,
    is_lung: bool = False,
    dataset_window=(4096, 0.0, 2.0),
    mesh=None,
    partition: str = "data",
    output_dtype=None,
    quantize=None,
    microbatch=None,
):
    """Returns edit(dec_vars, vq_state, id_maps (B,H,W) int32) → recon (B,H,W).

    Per-sample mask/rescale parity with `run_recon.py:182-192` (the mean
    rescale is per-slice, matching the reference's single-slice math).

    With `mesh`, two parallelization modes (the reference is DP-only,
    SURVEY.md §2.8 — 'spatial' is new TPU-native design):

    - partition='data': the batch is sharded over the 'data' axis
      (throughput — full-study editing).
    - partition='spatial': every image's ROWS are sharded over the 'spatial'
      axis via GSPMD jit shardings — XLA inserts the halo exchanges for the
      decoder convs and all-reduces the per-slice mask mean, so the single
      dispatch's compute spreads over the chips (latency — interactive
      editing of one batch). A 2-D ('data' × 'spatial') mesh composes both.
      State is replicated either way.

    output_dtype="uint8" quantizes [-1,1]→[0,255] ON DEVICE: display/PNG
    consumers need uint8 anyway, and the 4×-smaller device→host transfer
    cuts measured p50 edit latency ~13% at 512² (PERF.md).

    quantize="int8" runs every decoder conv on the MXU's s8×s8→s32 path
    (dynamic per-input-channel activation scales folded into per-output-
    channel weight scales — ops/quantized_conv.py); same checkpoint,
    serving-time choice. Accuracy vs f32/bf16 pinned in
    tests/test_quantized_conv.py; measured latency/throughput in PERF.md
    ("int8 serving decode").

    microbatch=N sequences the batch through the decoder N slices at a time
    (`lax.scan` over reshaped chunks inside the same jit) instead of one
    monolithic dispatch. Peak HBM for the decoder activations scales with the
    in-flight chunk, not the batch: the int8 path at batch 32 @512² OOMs a
    16 GB v5e chip (each full-res conv holds the s32 accumulator + quantize
    temps at (32,512,512,32) ≈ 1 GB apiece, and ASPP runs five such branches),
    while microbatch=8 fits with headroom. Per-slice math (mask mean rescale)
    is unchanged — chunking is semantically invisible.
    """
    from ..ops.quantized_conv import quantize_convs

    def edit_chunk(dec_vars, vq_state, id_maps):
        ids = id_maps.astype(jnp.int32)
        bg = ids == 0
        ids0 = jnp.where(bg, 1, ids) - 1
        mask = 1.0 - bg.astype(jnp.float32)  # (B,H,W)

        embed = get_embed_from_ids(vq_state, ids0)  # (B,H,W,C)
        embed = embed * mask[..., None]
        per_slice = mask.shape[1] * mask.shape[2] / jnp.maximum(
            jnp.sum(mask, axis=(1, 2)), 1.0
        )
        embed = embed * per_slice[:, None, None, None]

        with quantize_convs(quantize):
            recon = decoder.apply(dec_vars, embed, False)
        if is_lung:
            dw, dc, s = dataset_window
            hu = denormalize(recon, dw, dc, s)
            recon = normalize(hu, 1500, -550, 2.0)
        recon = recon[..., 0]
        if output_dtype == "uint8":
            recon = ((jnp.clip(recon, -1.0, 1.0) + 1.0) * 127.5).astype(jnp.uint8)
        return recon

    def edit(dec_vars, vq_state, id_maps):
        b = id_maps.shape[0]
        if not microbatch or b <= microbatch:
            return edit_chunk(dec_vars, vq_state, id_maps)
        if b % microbatch:
            raise ValueError(
                f"batch {b} not divisible by microbatch {microbatch}"
            )
        chunks = id_maps.reshape((b // microbatch, microbatch) + id_maps.shape[1:])

        def body(_, chunk):
            return None, edit_chunk(dec_vars, vq_state, chunk)

        _, out = jax.lax.scan(body, None, chunks)
        return out.reshape((b,) + out.shape[2:])

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import DATA_AXIS, SPATIAL_AXIS

        if partition == "spatial":
            if SPATIAL_AXIS not in mesh.axis_names:
                raise ValueError(
                    f"partition='spatial' needs a '{SPATIAL_AXIS}' mesh axis, "
                    f"got {mesh.axis_names}"
                )
            b_ax = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
            rep = NamedSharding(mesh, P())
            sp = NamedSharding(mesh, P(b_ax, SPATIAL_AXIS))
            return jax.jit(edit, in_shardings=(rep, rep, sp), out_shardings=sp)
        if partition != "data":
            raise ValueError(f"unknown partition {partition!r}")
        edit = jax.shard_map(
            edit, mesh=mesh, in_specs=(P(), P(), P(DATA_AXIS)),
            out_specs=P(DATA_AXIS), check_vma=False,
        )
    return jax.jit(edit)


def edit_study(
    decoder,
    state,
    label_dir: str,
    out_dir: str,
    *,
    batch_size: int = 32,
    is_lung: bool = False,
    dataset_window=(4096, 0.0, 2.0),
    mesh=None,
    partition: str = "data",
    quantize=None,
):
    """Full-study pipeline: every `label_*.nii.gz` under label_dir → decoded
    `edited_*.nii.gz` under out_dir, batched `batch_size` slices per dispatch."""
    from ..utils import nifti

    files = sorted(
        f for f in os.listdir(label_dir) if f.startswith("label_") and ".nii" in f
    )
    if not files:
        return []
    edit = make_batched_edit_fn(
        decoder, is_lung=is_lung, dataset_window=dataset_window, mesh=mesh,
        partition=partition, quantize=quantize,
    )
    os.makedirs(out_dir, exist_ok=True)

    written = []
    for start in range(0, len(files), batch_size):
        chunk = files[start : start + batch_size]
        maps = []
        for f in chunk:
            data = nifti.load(os.path.join(label_dir, f))
            if data.ndim == 3:
                data = data[:, :, 0]
            maps.append(np.transpose(data)[::-1, ::-1].copy())
        batch = np.stack(maps).astype(np.int32)
        pad = 0
        if len(chunk) < batch_size:  # static shapes: pad the tail batch
            pad = batch_size - len(chunk)
            batch = np.concatenate([batch, np.repeat(batch[-1:], pad, 0)])
        recons = np.asarray(edit(state.dec_vars, state.vq, jnp.asarray(batch)))
        if pad:
            recons = recons[: len(chunk)]
        for f, rec in zip(chunk, recons):
            out = f.replace("label_", "edited_")
            nifti.save(nifti.to_nifti_array(rec), os.path.join(out_dir, out))
            written.append(out)
    return written


def main(argv=None):
    """CLI: decode every painted `label_*.nii.gz` in a directory, batched."""
    import argparse

    from ..utils.config import load_dotenv
    from .run_recon import CRCConfig, LungConfig, load_model

    load_dotenv()  # LUNG_CKPT / CRC_CKPT etc.
    parser = argparse.ArgumentParser(description="Batched codebook-swap editing")
    parser.add_argument("--config", choices=["lung", "crc"], default="lung")
    parser.add_argument("--label-dir", required=True,
                        help="directory of label_*.nii.gz painted id maps")
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--partition", choices=["none", "data", "spatial"],
                        default="none",
                        help="shard each dispatch over all local devices: "
                        "'data' = batch axis (throughput), 'spatial' = image "
                        "rows via GSPMD halo-exchanged convs (latency)")
    parser.add_argument("--dtype", choices=["f32", "bf16", "int8"], default=None,
                        help="decode compute dtype (bf16 cuts TPU edit "
                             "latency; int8 runs the convs on the MXU's "
                             "s8 path; params/checkpoints stay f32)")
    args = parser.parse_args(argv)

    from . import cli_setup

    cli_setup("edit-batch")

    mesh = None
    if args.partition != "none":
        from jax.sharding import Mesh

        from ..parallel import DATA_AXIS, SPATIAL_AXIS

        axis = DATA_AXIS if args.partition == "data" else SPATIAL_AXIS
        mesh = Mesh(np.asarray(jax.devices()), (axis,))

    config = LungConfig() if args.config == "lung" else CRCConfig()
    if args.dtype:
        config.compute_dtype = {"f32": None, "bf16": "bfloat16",
                                "int8": None}[args.dtype]
    _, decoder, state = load_model(config)
    written = edit_study(
        decoder, state, args.label_dir, args.out_dir,
        batch_size=args.batch_size,
        is_lung=config.config_name == "LungConfig",
        dataset_window=(config.window_width, config.window_center,
                        config.window_scale),
        mesh=mesh,
        partition="data" if args.partition == "none" else args.partition,
        quantize="int8" if args.dtype == "int8" else None,
    )
    print(f"{len(written)} edited volumes -> {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
