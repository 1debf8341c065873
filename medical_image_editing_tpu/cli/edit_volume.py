"""Volumetric codebook-swap editing: painted 3-D id volumes → decoded volumes.

Lifts the reference's 2-D editing semantics — label-0 masking, codebook
lookup, mean rescale, decode (`/root/reference/src/run_recon.py:182-197`) —
to the 3-D volumetric VQ-WNet (BASELINE config #5). The reference has no 3-D
counterpart; the math is the 2-D edit path's with the mean rescale computed
per VOLUME, and the decode optionally GSPMD-sharded over the mesh's
'spatial' axis (volume depth) exactly like volumetric training.

CLI:
    python -m medical_image_editing_tpu.cli.edit_volume \\
        --ckpt out/volumetric_ckpt --labels labels/ --out edited/ \\
        [--filters 8,16,32,64] [--dict-size 10] [--partition spatial]

`--labels` is a directory of `.npy` (D,H,W) or `.nii/.nii.gz` (X,Y,Z) int id
volumes — 0 = background, k = codebook id k−1 — or one such file. Outputs
`edited_<name>` volumes in [-1, 1], same format as each input.
"""

import argparse
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..models.unet_encoder import get_embed_from_ids


def make_volumetric_edit_fn(decoder, *, mesh=None, output_dtype=None):
    """Returns edit(dec_vars, vq_state, id_vols (B,D,H,W) int32) → (B,D,H,W).

    Same masking/rescale contract as `make_batched_edit_fn` (2-D editing,
    `run_recon.py:182-192`) with the mean rescale per volume. With `mesh`,
    the depth axis is sharded over 'spatial' (and batch over 'data' when the
    mesh has that axis) via GSPMD jit shardings — XLA halo-exchanges the 3-D
    decoder convs, as in volumetric training (`train/volumetric.py`).
    """

    def edit(dec_vars, vq_state, id_vols):
        ids = id_vols.astype(jnp.int32)
        bg = ids == 0
        ids0 = jnp.where(bg, 1, ids) - 1
        mask = 1.0 - bg.astype(jnp.float32)  # (B,D,H,W)

        embed = get_embed_from_ids(vq_state, ids0)  # (B,D,H,W,C)
        embed = embed * mask[..., None]
        voxels = mask.shape[1] * mask.shape[2] * mask.shape[3]
        per_vol = voxels / jnp.maximum(jnp.sum(mask, axis=(1, 2, 3)), 1.0)
        embed = embed * per_vol[:, None, None, None, None]

        recon = decoder.apply(dec_vars, embed, False)[..., 0]
        if output_dtype == "uint8":
            recon = ((jnp.clip(recon, -1.0, 1.0) + 1.0) * 127.5).astype(jnp.uint8)
        return recon

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import DATA_AXIS, SPATIAL_AXIS

        if SPATIAL_AXIS not in mesh.axis_names:
            raise ValueError(
                f"mesh needs a '{SPATIAL_AXIS}' axis, got {mesh.axis_names}"
            )
        b_ax = DATA_AXIS if DATA_AXIS in mesh.axis_names else None
        rep = NamedSharding(mesh, P())
        sp = NamedSharding(mesh, P(b_ax, SPATIAL_AXIS))
        return jax.jit(edit, in_shardings=(rep, rep, sp), out_shardings=sp)
    return jax.jit(edit)


def load_volumetric_checkpoint(path: str, *, filters, dict_size: int,
                               out_channels: int = 1):
    """Restore a `train-volumetric` Orbax checkpoint → (decoder, dec_vars, vq).

    The checkpoint layout is the dict `train_volumetric.main` saves:
    {"enc": ..., "dec": ..., "vq": {embed, cluster_size, embed_avg}}.
    """
    import orbax.checkpoint as ocp

    from ..models.volumetric import VolumetricUNetDecoder
    from ..ops.vq import VQState

    restored = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    vq = VQState(
        embed=jnp.asarray(restored["vq"]["embed"]),
        cluster_size=jnp.asarray(restored["vq"]["cluster_size"]),
        embed_avg=jnp.asarray(restored["vq"]["embed_avg"]),
    )
    if int(vq.embed.shape[0]) != dict_size:
        raise ValueError(
            f"checkpoint codebook has {vq.embed.shape[0]} entries, "
            f"--dict-size says {dict_size}"
        )
    decoder = VolumetricUNetDecoder(out_channels=out_channels,
                                    filters=tuple(filters))
    dec_vars = jax.tree.map(jnp.asarray, restored["dec"])
    return decoder, dec_vars, vq


def _load_label_volume(path: str) -> np.ndarray:
    if ".nii" in os.path.basename(path):
        from ..utils import nifti

        # NIfTI stores (X,Y,Z); editing works depth-major (D,H,W)
        vol = np.transpose(nifti.load(path), (2, 1, 0))
    else:
        vol = np.load(path, allow_pickle=False)
    if vol.ndim != 3:
        raise ValueError(f"{path}: expected a (D,H,W) id volume, got {vol.shape}")
    return np.rint(vol).astype(np.int32)


def _save_volume(path: str, vol: np.ndarray) -> None:
    if ".nii" in os.path.basename(path):
        from ..utils import nifti

        nifti.save(np.transpose(vol, (2, 1, 0)).astype(np.float64), path)
    else:
        np.save(path, vol)


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Decode painted 3-D id volumes with the volumetric VQ-WNet"
    )
    p.add_argument("--ckpt", required=True,
                   help="train-volumetric Orbax checkpoint directory")
    p.add_argument("--labels", required=True,
                   help=".npy id volume, or a directory of them")
    p.add_argument("--out", required=True)
    p.add_argument("--filters", default="8,16,32,64")
    p.add_argument("--dict-size", type=int, default=10)
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--partition", choices=["none", "spatial"], default="none",
                   help="'spatial' shards volume depth over all local devices"
                   " (GSPMD halo-exchanged 3-D convs)")
    p.add_argument("--uint8", action="store_true")
    args = p.parse_args(argv)

    from . import cli_setup

    cli_setup("edit-volume")

    filters = tuple(int(f) for f in args.filters.split(","))
    decoder, dec_vars, vq = load_volumetric_checkpoint(
        args.ckpt, filters=filters, dict_size=args.dict_size
    )

    mesh = None
    if args.partition == "spatial":
        from jax.sharding import Mesh

        from ..parallel import SPATIAL_AXIS

        mesh = Mesh(np.asarray(jax.devices()), (SPATIAL_AXIS,))
    edit = make_volumetric_edit_fn(
        decoder, mesh=mesh, output_dtype="uint8" if args.uint8 else None
    )

    if os.path.isdir(args.labels):
        files = sorted(
            os.path.join(args.labels, f)
            for f in os.listdir(args.labels)
            if f.endswith(".npy") or ".nii" in f
        )
    else:
        files = [args.labels]
    if not files:
        print(f"no .npy/.nii label volumes under {args.labels}", file=sys.stderr)
        return 1

    os.makedirs(args.out, exist_ok=True)
    for start in range(0, len(files), args.batch):
        chunk = files[start : start + args.batch]
        batch = np.stack([_load_label_volume(f) for f in chunk])
        pad = args.batch - len(chunk)
        if pad:  # static shapes: pad the tail batch
            batch = np.concatenate([batch, np.repeat(batch[-1:], pad, 0)])
        recons = np.asarray(edit(dec_vars, vq, jnp.asarray(batch)))
        if pad:
            recons = recons[: len(chunk)]
        for f, rec in zip(chunk, recons):
            name = "edited_" + os.path.basename(f)
            _save_volume(os.path.join(args.out, name), rec)
            print(name)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
