"""Tests for the multi-window trainer (first/second/joint steps)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_editing_tpu.models import UNetDecoder, UNetDiscriminator
from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ
from medical_image_editing_tpu.ops.windowing import denormalize, t_normalize
from medical_image_editing_tpu.train import create_train_state
from medical_image_editing_tpu.train.first_stage import FirstStageLossConfig
from medical_image_editing_tpu.train.multi_window import (
    make_joint_step,
    make_multi_window_first_stage_step,
    make_multi_window_second_stage_step,
    make_multiwindow_recon_loss,
    window_fns,
)
from medical_image_editing_tpu.train.second_stage import SecondStageLossConfig
from medical_image_editing_tpu.train.state import make_optimizer

FILTERS = (4, 8, 16, 32, 64)
DICT = 5
RES = 128
DSW = (4096, 0.0, 2.0)  # dataset window (width, center, scale)
AUG = {
    "modules": ["RandomHorizontalFlip"],
    "RandomHorizontalFlip": {"p": 0.5},
}


def test_window_fns_roundtrip(rng):
    fns = window_fns(DSW)
    x = jnp.asarray(rng.uniform(-0.2, 0.2, (1, 8, 8, 1)).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(fns[0](x)), np.asarray(x))
    lung = fns[1](x)
    want = t_normalize(denormalize(x, 4096, 0.0, 2.0), 1500, -550, 2.0)
    np.testing.assert_allclose(np.asarray(lung), np.asarray(want), rtol=1e-5)


def test_multiwindow_recon_loss_weights(rng):
    cfg = FirstStageLossConfig()
    f = make_multiwindow_recon_loss(cfg, DSW, (1.0, 0.0, 0.0), (0.0, 0.0, 0.0), (0, 0, 0))
    r = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 1)).astype(np.float32))
    t = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 1)).astype(np.float32))
    l_recon, l_freq, l_percep = f(r, t)
    # only the raw window contributes, weight 1, divided by 3 windows
    np.testing.assert_allclose(float(l_recon), np.mean((np.asarray(r) - np.asarray(t)) ** 2) / 3, rtol=1e-5)
    assert float(l_freq) == 0.0 and float(l_percep) == 0.0


def _build(step_type):
    axis_name = None
    enc = EncoderWithVQ(filters=FILTERS, dict_size=DICT)
    dec = UNetDecoder(out_channels=1, filters=FILTERS, dropped_skip_layers=())
    dis = UNetDiscriminator(D_ch=4, resolution=RES, D_attn="0")
    x = jnp.zeros((2, RES, RES, 1))
    enc_vars, vq = enc.init(jax.random.key(0), x)
    q, *_ = enc(enc_vars, vq, x, train=False)
    dec_vars = dec.init({"params": jax.random.key(1), "dropblock": jax.random.key(2)}, q, train=False)
    dis_vars = dis.init(jax.random.key(3), x, train=False)
    enc_tx, dec_tx, dis_tx = make_optimizer(1e-4), make_optimizer(1e-4), make_optimizer(4e-4)
    state = create_train_state(jax.random.key(4), enc_vars, dec_vars, vq,
                               enc_tx, dec_tx, dis_vars=dis_vars, dis_tx=dis_tx)
    fc = FirstStageLossConfig(margin=0.5)
    sc = SecondStageLossConfig(use_unet_perceptual_loss=True)
    common = dict(dataset_window=DSW)
    if step_type == "first":
        step = make_multi_window_first_stage_step(
            enc, dec, enc_tx, dec_tx, loss_cfg=fc, aug_cfg=AUG, dict_size=DICT, **common)
    elif step_type == "second":
        step = make_multi_window_second_stage_step(
            enc, dec, dis, dec_tx, dis_tx, loss_cfg=sc, **common)
    else:
        step = make_joint_step(
            enc, dec, dis, enc_tx, dec_tx, dis_tx,
            first_cfg=fc, second_cfg=sc, aug_cfg=AUG, dict_size=DICT, **common)
    return state, step


@pytest.mark.parametrize("step_type", ["first", "second", "joint"])
@pytest.mark.slow
def test_multi_window_steps_run(rng, step_type):
    state, step = _build(step_type)
    image = jnp.asarray(rng.uniform(-0.3, 0.3, (2, RES, RES, 1)).astype(np.float32))
    new_state, metrics = jax.jit(step)(state, image, 0.0)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (step_type, k, float(v))
    assert int(new_state.step) == 1
    if step_type == "joint":
        # all three nets moved
        for attr in ("enc_vars", "dec_vars", "dis_vars"):
            p0 = jax.tree.leaves(getattr(state, attr)["params"])[0]
            p1 = jax.tree.leaves(getattr(new_state, attr)["params"])[0]
            assert not np.allclose(np.asarray(p0), np.asarray(p1)), attr


@pytest.mark.slow
def test_joint_step_remat_matches_plain(rng):
    """use_remat=True recomputes instead of storing activations — the step's
    numerics must be bit-compatible with the plain step."""
    state, step = _build("joint")
    enc = EncoderWithVQ(filters=FILTERS, dict_size=DICT)
    dec = UNetDecoder(out_channels=1, filters=FILTERS, dropped_skip_layers=())
    dis = UNetDiscriminator(D_ch=4, resolution=RES, D_attn="0")
    enc_tx, dec_tx, dis_tx = make_optimizer(1e-4), make_optimizer(1e-4), make_optimizer(4e-4)
    step_r = make_joint_step(
        enc, dec, dis, enc_tx, dec_tx, dis_tx,
        first_cfg=FirstStageLossConfig(margin=0.5),
        second_cfg=SecondStageLossConfig(use_unet_perceptual_loss=True),
        aug_cfg=AUG, dict_size=DICT, dataset_window=DSW, use_remat=True,
    )
    image = jnp.asarray(rng.uniform(-0.3, 0.3, (2, RES, RES, 1)).astype(np.float32))
    s1, m1 = jax.jit(step)(state, image, 0.0)
    s2, m2 = jax.jit(step_r)(state, image, 0.0)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-5,
                                   err_msg=k)
    a = jax.tree.leaves(s1.dec_vars["params"])[0]
    b = jax.tree.leaves(s2.dec_vars["params"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)
