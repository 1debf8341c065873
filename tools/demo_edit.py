"""End-to-end editing demo: train on synthetic data, then insert + remove a
"lesion" by painting the VQ label map — the framework's whole story in one
panel (the reference demonstrates exactly this with clinical images in its
README; this reproduces it with shippable synthetic data).

Pipeline (all on the default jax backend — TPU here):
  1. 300 first-stage steps on structured synthetic slices (gaussian "nodules"
     on an intensity gradient) — the same harness as
     tests/test_learning_dynamics.py.
  2. Encode a held-out slice → per-pixel codebook ids (the "segmentation").
  3. Edit the id map like a user in a NIfTI editor would:
       - INSERT: paint a disc of the nodule's id at a new location;
       - REMOVE: paint background ids over an existing nodule.
  4. Decode original and edited id maps through the serving edit path
     (`make_batched_edit_fn` — label-0 masking + mean rescale + decode).
  5. Write a 2×3 PNG panel: input | id map | recon
                            edited id map | edited recon | |recon − edited|.

Usage: python tools/demo_edit.py [--out docs/demo_edit.png] [--steps 300]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_editing_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

SIZE = 128
DICT = 10


def make_batch(rng, n=8, size=SIZE, blobs=3):
    """Gaussian "nodules" on a vertical intensity gradient (test harness)."""
    yy, xx = np.mgrid[0:size, 0:size] / size
    imgs, centers = [], []
    for _ in range(n):
        img = 0.4 * (yy - 0.5) + 0.1 * rng.normal()
        cs = []
        for _ in range(blobs):
            cy, cx = rng.uniform(0.2, 0.8, 2)
            s, a = rng.uniform(0.03, 0.07), rng.uniform(0.5, 0.9)
            img = img + a * np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s**2)))
            cs.append((cy, cx, s))
        imgs.append(np.clip(img, -1, 1))
        centers.append(cs)
    return jnp.asarray(np.stack(imgs)[..., None].astype(np.float32)), centers


def train(steps: int, rng):
    from medical_image_editing_tpu.models import UNetDecoder
    from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ
    from medical_image_editing_tpu.train import (
        create_train_state,
        make_first_stage_step,
    )
    from medical_image_editing_tpu.train.first_stage import (
        FirstStageLossConfig,
        init_codebook_step,
    )
    from medical_image_editing_tpu.train.state import make_optimizer

    aug = {"modules": ["RandomHorizontalFlip", "RandomAffine"],
           "RandomHorizontalFlip": {"p": 0.5},
           "RandomAffine": {"degrees": 8.0, "translate": [0.03, 0.03], "p": 0.8}}
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else None
    enc = EncoderWithVQ(filters=(16, 32, 64, 128, 256), dict_size=DICT,
                        momentum=0.99, dtype=dtype)
    dec = UNetDecoder(out_channels=1, filters=(32, 64, 128, 256, 512),
                      dropped_skip_layers=(), use_pixel_shuffle=False,
                      dtype=dtype)
    x0, _ = make_batch(rng)
    ev, vq = enc.init(jax.random.key(0), x0)
    q, *_ = enc(ev, vq, x0, train=False)
    dv = dec.init({"params": jax.random.key(1), "dropblock": jax.random.key(2)},
                  q, train=False)
    etx, dtx = make_optimizer(2e-4), make_optimizer(2e-4)
    state = create_train_state(jax.random.key(3), ev, dv, vq, etx, dtx)
    state = jax.jit(init_codebook_step(enc, num_iters=10))(state, x0)
    step = jax.jit(make_first_stage_step(
        enc, dec, etx, dtx,
        loss_cfg=FirstStageLossConfig(margin=0.5, w_reg=0.01, w_recon=10.0),
        aug_cfg=aug, dict_size=DICT))
    for i in range(steps):
        batch, _ = make_batch(rng)
        state, m = step(state, batch, jnp.float32(0.0))
        if i % 50 == 0 or i == steps - 1:
            print(f"step {i}: total={float(m['total']):.3f} "
                  f"recon={float(m['recon']):.3f}", flush=True)
    return enc, dec, state


def disc_mask(size, cy, cx, r):
    yy, xx = np.mgrid[0:size, 0:size] / size
    return ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r


def colorize(ids, dict_size=DICT):
    """Id map → RGB via the reference's CMAP ('Spectral', base.py:37)."""
    import matplotlib

    cmap = matplotlib.colormaps["Spectral"]
    return np.asarray(cmap((ids.astype(float)) / dict_size))[..., :3]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--out", default="docs/demo_edit.png")
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    enc, dec, state = train(args.steps, rng)

    from medical_image_editing_tpu.cli.edit_batch import make_batched_edit_fn

    # held-out slice (fresh rng stream)
    test_rng = np.random.default_rng(args.seed + 1234)
    x, centers = make_batch(test_rng, n=1)
    _, _, ids, _, _ = enc(state.enc_vars, state.vq, x, train=False)
    ids = np.asarray(ids)[0]  # (H,W), offset ids (1-based; 0 reserved = bg)

    cy0, cx0, s0 = centers[0][0]  # an existing nodule
    nodule_id = int(ids[int(cy0 * SIZE), int(cx0 * SIZE)])
    # the surrounding-tissue id at the same height (gradient varies with y)
    bg_row = int(cy0 * SIZE)
    bg_id = int(np.bincount(
        ids[bg_row][~disc_mask(SIZE, cy0, cx0, 3 * s0)[bg_row]]).argmax())

    edited = ids.copy()
    edited[disc_mask(SIZE, 0.75, 0.25, 0.06)] = nodule_id       # INSERT
    edited[disc_mask(SIZE, cy0, cx0, 2.5 * s0)] = bg_id          # REMOVE

    edit = make_batched_edit_fn(dec)
    recon = np.asarray(edit(state.dec_vars, state.vq, jnp.asarray(ids[None])))[0]
    recon_edit = np.asarray(
        edit(state.dec_vars, state.vq, jnp.asarray(edited[None])))[0]

    def to01(img):
        return np.repeat(((img + 1.0) / 2.0)[..., None], 3, axis=-1)

    panel = np.stack([
        to01(np.asarray(x)[0, ..., 0]), colorize(ids), to01(recon),
        colorize(edited), to01(recon_edit),
        np.repeat(np.abs(recon_edit - recon)[..., None], 3, -1),
    ])
    from medical_image_editing_tpu.utils.imaging import save_image_grid

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    save_image_grid(panel, args.out, nrow=3)
    print(f"wrote {args.out}")
    print("panel: input | id map | recon // edited ids | edited recon | |diff|")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
