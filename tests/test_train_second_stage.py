"""Integration tests for the second-stage GAN training step (both
discriminator types), single-device and data-parallel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_editing_tpu.models import (
    NLayerDiscriminator,
    UNetDecoder,
    UNetDiscriminator,
)
from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ
from medical_image_editing_tpu.train import create_train_state
from medical_image_editing_tpu.train.second_stage import (
    SecondStageLossConfig,
    make_second_stage_step,
)
from medical_image_editing_tpu.train.state import make_optimizer

FILTERS = (4, 8, 16, 32, 64)
DICT = 5
RES = 128  # smallest UNetDiscriminator arch


def _build(dis_type, axis_name=None):
    enc = EncoderWithVQ(filters=FILTERS, dict_size=DICT, axis_name=axis_name)
    dec = UNetDecoder(out_channels=1, filters=FILTERS, dropped_skip_layers=(),
                      axis_name=axis_name)
    if dis_type == "UNetDiscriminator":
        dis = UNetDiscriminator(D_ch=4, resolution=RES, D_attn="0")
    else:
        dis = NLayerDiscriminator(n_filters=8, n_layers=2,
                                  normalization="instancenorm")
    x = jnp.zeros((2, RES, RES, 1))
    enc_vars, vq = enc.init(jax.random.key(0), x)
    q, *_ = enc(enc_vars, vq, x, train=False)
    dec_vars = dec.init({"params": jax.random.key(1), "dropblock": jax.random.key(2)},
                        q, train=False)
    dis_vars = dis.init(jax.random.key(3), x, train=False)
    dec_tx, dis_tx = make_optimizer(1e-4), make_optimizer(4e-4)
    enc_tx = make_optimizer(1e-4)
    state = create_train_state(jax.random.key(4), enc_vars, dec_vars, vq,
                               enc_tx, dec_tx, dis_vars=dis_vars, dis_tx=dis_tx)
    step = make_second_stage_step(
        enc, dec, dis, dec_tx, dis_tx,
        loss_cfg=SecondStageLossConfig(n_inner_loops=2, use_unet_perceptual_loss=True),
        dis_type=dis_type,
        axis_name=axis_name,
    )
    return state, step


@pytest.mark.parametrize("dis_type", ["UNetDiscriminator", "NLayerDiscriminator"])
@pytest.mark.slow
def test_second_stage_step(rng, dis_type):
    state, step = _build(dis_type)
    image = jnp.asarray(rng.uniform(-1, 1, (2, RES, RES, 1)).astype(np.float32))
    jit_step = jax.jit(step)
    new_state, metrics = jit_step(state, image, 0.0)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    # decoder + discriminator moved; encoder and codebook frozen
    assert not np.allclose(
        np.asarray(jax.tree.leaves(state.dec_vars["params"])[0]),
        np.asarray(jax.tree.leaves(new_state.dec_vars["params"])[0]),
    )
    assert not np.allclose(
        np.asarray(jax.tree.leaves(state.dis_vars["params"])[0]),
        np.asarray(jax.tree.leaves(new_state.dis_vars["params"])[0]),
    )
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state.enc_vars["params"])[0]),
        np.asarray(jax.tree.leaves(new_state.enc_vars["params"])[0]),
    )
    np.testing.assert_array_equal(
        np.asarray(state.vq.embed), np.asarray(new_state.vq.embed)
    )
    # second call reuses the compiled step
    s2, m2 = jit_step(new_state, image, 0.0)
    assert np.isfinite(float(m2["total"]))


@pytest.mark.slow
def test_second_stage_data_parallel(rng):
    from medical_image_editing_tpu.parallel import (
        DATA_AXIS, create_mesh, data_parallel, replicate, shard_batch,
    )

    mesh = create_mesh(jax.devices("cpu")[:4])
    state, step = _build("NLayerDiscriminator", axis_name=DATA_AXIS)
    dp_step = data_parallel(step, mesh, n_state_args=1)
    state = replicate(mesh, state)
    image = shard_batch(mesh, jnp.asarray(
        rng.uniform(-1, 1, (4, RES, RES, 1)).astype(np.float32)))
    new_state, metrics = dp_step(state, image, replicate(mesh, jnp.float32(0.0)))
    assert np.isfinite(float(metrics["total"]))
    assert int(new_state.step) == 1
