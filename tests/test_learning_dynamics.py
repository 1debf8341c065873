"""End-to-end learning validation: the full self-supervised objective trains.

Opt-in (slow): RUN_SLOW_TESTS=1 python -m pytest tests/test_learning_dynamics.py
On a TPU v5e this runs 300 steps in ~90 s and reproduces (2026-08-16 run):
  step 0:   total=33.90  recon=18.59  cross=13.09
  step 299: total= 1.08  recon= 0.28  cross= 0.63
  final PSNR 19.8 dB; codebook entropy 3.26 bits (max log2(10)=3.32 — all 10
  codes in use, no collapse).
A shortened CPU variant (40 steps, 64²) asserts the same qualitative signals.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

SLOW = os.environ.get("RUN_SLOW_TESTS") == "1"


def _make_batch(rng, n=4, size=64):
    yy, xx = np.mgrid[0:size, 0:size] / size
    imgs = []
    for _ in range(n):
        img = 0.4 * (yy - 0.5) + 0.1 * rng.normal()
        for _ in range(3):
            cy, cx = rng.uniform(0.2, 0.8, 2)
            s, a = rng.uniform(0.02, 0.08), rng.uniform(0.3, 0.9)
            img = img + a * np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s**2)))
        imgs.append(np.clip(img, -1, 1))
    return jnp.asarray(np.stack(imgs)[..., None].astype(np.float32))


@pytest.mark.skipif(not SLOW, reason="set RUN_SLOW_TESTS=1 (short variant below)")
def test_learning_dynamics_long():
    _run(steps=300, size=128, n=8,
         filters_enc=(16, 32, 64, 128, 256), filters_dec=(32, 64, 128, 256, 512))


@pytest.mark.slow
def test_learning_dynamics_short(rng):
    _run(steps=40, size=64, n=4,
         filters_enc=(4, 8, 16, 32, 64), filters_dec=(4, 8, 16, 32, 64))


def _run(steps, size, n, filters_enc, filters_dec):
    from medical_image_editing_tpu.models import UNetDecoder
    from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ
    from medical_image_editing_tpu.ops.metrics import label_entropy
    from medical_image_editing_tpu.train import create_train_state, make_first_stage_step
    from medical_image_editing_tpu.train.first_stage import (
        FirstStageLossConfig,
        init_codebook_step,
    )
    from medical_image_editing_tpu.train.state import make_optimizer

    rng = np.random.default_rng(0)
    aug = {"modules": ["RandomHorizontalFlip", "RandomAffine"],
           "RandomHorizontalFlip": {"p": 0.5},
           "RandomAffine": {"degrees": 8.0, "translate": [0.03, 0.03], "p": 0.8}}
    enc = EncoderWithVQ(filters=filters_enc, dict_size=10, momentum=0.99)
    dec = UNetDecoder(out_channels=1, filters=filters_dec,
                      dropped_skip_layers=(), use_pixel_shuffle=False)
    x0 = _make_batch(rng, n, size)
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
        aug_cfg=aug, dict_size=10))

    first = None
    for i in range(steps):
        state, m = step(state, _make_batch(rng, n, size), jnp.float32(0.0))
        if i == 0:
            first = {k: float(v) for k, v in m.items()}
    last = {k: float(v) for k, v in m.items()}

    assert np.isfinite(last["total"])
    assert last["recon"] < first["recon"], (first["recon"], last["recon"])
    assert last["cross"] < first["cross"], (first["cross"], last["cross"])
    # codebook in use (entropy > 1 bit of 3.32 max)
    _, _, ids, _, _ = enc(state.enc_vars, state.vq, x0, train=False)
    assert float(label_entropy(ids, 10)) > 1.0
