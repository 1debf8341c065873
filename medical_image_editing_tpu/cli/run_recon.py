"""Interactive editing server: watch an edited NIfTI label map, decode on change.

Behavioral spec: reference `src/run_recon.py` — hardcoded env-configured
LungConfig/CRCConfig (`:27-69`), model loading with checkpoint key surgery
(`:98-147`), a 1 Hz polling loop over the edited NIfTI file (`:230-238`,
exceptions tolerated), and per edit (`inner`, `:169-228`):
  1. load the edited id map; skip if unchanged (np.array_equal);
  2. CRC: vertical flip into model space (`:176-177`);
  3. label 0 → background mask; remaining ids −1 → codebook ids (`:182-186`);
  4. codebook lookup (`get_embed_from_ids`), embedding zeroed under the mask
     and rescaled by numel/sum(mask) (`:189-192`);
  5. decode; lung: re-normalize from the dataset window into the lung window
     (`denorm_norm`, `:150-161`, NB uses the CLAMPED `normalize` here);
  6. display + save recon/label PNGs (`:208-222`).

TPU-first: steps 3–5 are ONE jit-compiled function (`make_edit_fn`) — the
per-edit latency is a single device dispatch (the p50 edit-latency metric in
BASELINE.md); the model stays resident between edits. Display is optional
(headless save-only by default; `--show` pops matplotlib like the reference).
"""

import argparse
import datetime
import os
import time
from typing import Optional

import numpy as np


class LungConfig:
    """Spec: `run_recon.py:27-48`."""

    config_name = "LungConfig"
    in_channels = 1
    enc_filters = (16, 32, 64, 128, 256)
    dec_filters = (32, 64, 128, 256, 512)
    dict_size = 10
    momentum = 0.999
    window_width = 4096
    window_center = 0.0
    window_scale = 2.0
    use_dropblock = False
    block_size = 30
    dropped_skip_layers = ()
    use_styled_up_block = True
    use_pixel_shuffle = False

    def __init__(self):
        self.resume_checkpoint = os.environ.get("LUNG_CKPT")
        self.edited_file_path = os.environ.get("LUNG_EDITED_FILE")
        self.save_dir_path = "inference"
        # serving compute dtype: "bfloat16" halves decoder HBM/MXU work on
        # TPU (params stay f32 — checkpoints are unaffected). The reference
        # serves f32 (torch), so f32 stays the default; bench_edit measures
        # the bfloat16 path (PERF.md edit-latency numbers).
        self.compute_dtype = os.environ.get("MEDIMG_EDIT_DTYPE")


class CRCConfig(LungConfig):
    """Spec: `run_recon.py:51-69` (no window re-normalization)."""

    config_name = "CRCConfig"

    def __init__(self):
        super().__init__()
        self.resume_checkpoint = os.environ.get("CRC_CKPT")
        self.edited_file_path = os.environ.get("CRC_EDITED_FILE")


LUNG_WINDOW = {"width": 1500, "center": -550, "scale": 2.0}


def load_model(config):
    """Build encoder/decoder and restore enc/dec/vq from an Orbax checkpoint.

    The functional analogue of `run_recon.py:115-147` (+ `init_from_ckpt` key
    surgery, `:98-112` — here `restore_fields` on the TrainState pytree).
    """
    import jax
    import jax.numpy as jnp

    from ..models import UNetDecoder
    from ..models.unet_encoder import EncoderWithVQ
    from ..train.state import create_train_state, make_optimizer
    from ..utils.checkpoint import restore_fields

    dtype = None
    if getattr(config, "compute_dtype", None) in ("bfloat16", "bf16"):
        dtype = jnp.bfloat16
    encoder = EncoderWithVQ(
        in_channels=config.in_channels,
        filters=tuple(config.enc_filters),
        dict_size=config.dict_size,
        momentum=config.momentum,
        use_styled_up_block=False,
        dtype=dtype,
    )
    decoder = UNetDecoder(
        out_channels=config.in_channels,
        filters=tuple(config.dec_filters),
        use_dropblock=bool(config.use_dropblock),
        block_size=int(config.block_size),
        dropped_skip_layers=tuple(config.dropped_skip_layers),
        use_pixel_shuffle=bool(config.use_pixel_shuffle),
        dtype=dtype,
    )
    x0 = jnp.zeros((1, 64, 64, config.in_channels), jnp.float32)
    enc_vars, vq = encoder.init(jax.random.key(0), x0)
    q, *_ = encoder(enc_vars, vq, x0, train=False)
    dec_vars = decoder.init(
        {"params": jax.random.key(1), "dropblock": jax.random.key(2)}, q, train=False
    )
    tx = make_optimizer(1e-4)
    state = create_train_state(jax.random.key(3), enc_vars, dec_vars, vq, tx, tx)
    if config.resume_checkpoint:
        from ..utils import torch_import as ti

        p = str(config.resume_checkpoint)
        if ti.is_lightning_ckpt(p):
            # a reference Lightning .ckpt FILE: convert in memory — the
            # analogue of the reference's own init_from_ckpt key surgery
            # (`run_recon.py:98-112`) applied to a torch checkpoint
            state = state.replace(**ti.import_first_stage_fields(p, state))
            print(f"Imported reference Lightning ckpt {p}")
        else:
            state = restore_fields(p, state, ("enc_vars", "dec_vars", "vq"))
            print(f"Restored from {p}")
    return encoder, decoder, state


def make_edit_fn(decoder, state, config):
    """The jit-compiled edit path: id map → decoded image. Spec: `:182-197`.

    With `config.partition == "spatial"` (CLI `--partition spatial`) the
    single slice's rows are GSPMD-sharded over all local chips — the decode
    spreads across the mesh for latency, like `edit_batch`'s spatial mode.
    """
    import jax
    import jax.numpy as jnp

    from ..models.unet_encoder import get_embed_from_ids
    from ..ops.windowing import denormalize, normalize

    is_lung = config.config_name == "LungConfig"

    def edit(dec_vars, vq_state, id_map):
        ids = id_map.astype(jnp.int32)  # (1,H,W), 0 = background
        bg = ids == 0
        ids = jnp.where(bg, 1, ids) - 1
        mask = 1.0 - bg.astype(jnp.float32)

        embed = get_embed_from_ids(vq_state, ids)
        embed = embed * mask[..., None]
        embed = embed * (mask.size / jnp.maximum(jnp.sum(mask), 1.0))

        recon = decoder.apply(dec_vars, embed, False)
        if is_lung:
            hu = denormalize(recon, config.window_width, config.window_center,
                             config.window_scale)
            recon = normalize(hu, LUNG_WINDOW["width"], LUNG_WINDOW["center"],
                              LUNG_WINDOW["scale"])
        return recon[..., 0], mask

    if getattr(config, "partition", None) == "spatial":
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from ..parallel import SPATIAL_AXIS

        mesh = Mesh(np.asarray(jax.devices()), (SPATIAL_AXIS,))
        rep = NamedSharding(mesh, P())
        sp = NamedSharding(mesh, P(None, SPATIAL_AXIS))
        edit = jax.jit(edit, in_shardings=(rep, rep, sp),
                       out_shardings=(sp, sp))
    else:
        edit = jax.jit(edit)

    def fn(id_map_np):
        recon, mask = edit(state.dec_vars, state.vq, jnp.asarray(id_map_np))
        return np.asarray(recon), np.asarray(mask)

    return fn


def process_edit(edit_fn, config, loaded_map, *, save_dir: str = ".", show=False):
    """One edit: host-side orientation + PNG exports. Spec: `inner`, `:169-228`."""
    from ..utils.imaging import CMAP, save_image

    timestamp = datetime.datetime.now().strftime("%Y%m%d%H%M%S")
    work = loaded_map
    if config.config_name == "CRCConfig":
        work = np.flipud(work).copy()

    recon, mask = edit_fn(work[None].astype(np.int32))
    recon, mask = recon[0], mask[0]
    id_out = np.where(mask > 0, work, 0).astype(np.int32)

    if config.config_name == "CRCConfig":
        recon = np.flipud(recon).copy()
        id_out = np.flipud(id_out).copy()

    if show:
        import matplotlib.pyplot as plt

        plt.imshow(recon, cmap="gray", vmin=-1, vmax=1)
        plt.axis("off")
        plt.show()
        plt.clf()

    base = os.path.basename(str(config.edited_file_path)).split(".")[0]
    os.makedirs(save_dir, exist_ok=True)
    save_image(recon, "gray", -1, 1,
               os.path.join(save_dir, f"recon_{base}_{timestamp}_img.png"))
    save_image(id_out, CMAP, 0, config.dict_size,
               os.path.join(save_dir, f"label_{base}_{timestamp}_lbl.png"))
    return recon, id_out


def load_edited_map(path: str) -> np.ndarray:
    """NIfTI → model-space id map (transpose + double flip). Spec: `:90-95`."""
    from ..utils import nifti

    data = nifti.load(path)
    if data.ndim == 3:
        data = data[:, :, 0]
    return np.transpose(data)[::-1, ::-1].copy()


def serve(config, *, poll_seconds: float = 1.0, max_iters: Optional[int] = None,
          show: bool = False, watch: str = "auto"):
    """The file-watching loop. Spec: `run_recon.py:164-238` (1 Hz polling).

    watch="auto"/"inotify" waits on kernel inotify events instead of sleeping
    a full poll interval, cutting edit→recon latency from up to `poll_seconds`
    to milliseconds; the content comparison below is unchanged, so behavior is
    identical apart from reaction time. watch="poll" forces reference-style
    sleeping. Either way each pass re-reads and content-compares the map, so
    missed events only cost latency, never correctness.
    """
    from ..utils.fswatch import FileWatcher

    encoder, decoder, state = load_model(config)
    edit_fn = make_edit_fn(decoder, state, config)

    watcher = None
    if watch in ("auto", "inotify"):
        watcher = FileWatcher(config.edited_file_path)
        if not watcher.active and watch == "inotify":
            print("inotify unavailable; falling back to polling")
    prev_map = None
    iters = 0
    while max_iters is None or iters < max_iters:
        iters += 1
        try:
            loaded = load_edited_map(config.edited_file_path).astype(np.int32)
            timestamp = datetime.datetime.now().strftime("%Y%m%d%H%M%S")
            if prev_map is None or not np.array_equal(prev_map, loaded):
                print(f"[{timestamp}] Processing...")
                process_edit(edit_fn, config, loaded,
                             save_dir=config.save_dir_path, show=show)
                prev_map = loaded
            else:
                print(f"[{timestamp}] Skip...")
        except Exception as e:  # parity: tolerate partial writes (`:235-236`)
            print(e.args)
        if watcher is not None and watcher.active:
            watcher.wait(poll_seconds)
        else:
            time.sleep(poll_seconds)
    if watcher is not None:
        watcher.close()


def main(argv=None):
    from ..utils.config import load_dotenv

    load_dotenv()  # LUNG_CKPT / LUNG_EDITED_FILE etc. (`run_recon.py:20-24`)
    parser = argparse.ArgumentParser(description="Interactive editing server")
    parser.add_argument("--config", choices=["lung", "crc"], default="lung")
    parser.add_argument("--show", action="store_true",
                        help="pop a matplotlib window per edit (reference behavior)")
    parser.add_argument("--poll-seconds", type=float, default=1.0)
    parser.add_argument("--max-iters", type=int, default=None)
    parser.add_argument("--watch", choices=["auto", "inotify", "poll"],
                        default="auto",
                        help="inotify wake-on-write (default) vs 1 Hz polling")
    parser.add_argument("--dtype", choices=["f32", "bf16"], default=None,
                        help="decode compute dtype (bf16 cuts TPU edit "
                             "latency; params/checkpoints stay f32)")
    parser.add_argument("--partition", choices=["none", "spatial"],
                        default="none",
                        help="'spatial' GSPMD-shards the slice's rows over "
                             "all local chips (multi-chip latency)")
    args = parser.parse_args(argv)

    from . import cli_setup

    cli_setup("run-recon")
    config = LungConfig() if args.config == "lung" else CRCConfig()
    if args.dtype:
        config.compute_dtype = {"f32": None, "bf16": "bfloat16"}[args.dtype]
    if args.partition != "none":
        config.partition = args.partition
    serve(config, poll_seconds=args.poll_seconds, max_iters=args.max_iters,
          show=args.show, watch=args.watch)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
