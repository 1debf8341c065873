"""Tests for the VQGAN model and its adversarial trainer."""

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_editing_tpu.models.vqgan import VQGAN
from medical_image_editing_tpu.models import UNetDiscriminator
from medical_image_editing_tpu.ops.vq import vq_init
from medical_image_editing_tpu.train import create_train_state
from medical_image_editing_tpu.train.second_stage import SecondStageLossConfig
from medical_image_editing_tpu.train.state import make_optimizer
from medical_image_editing_tpu.train.vqgan_stage import make_vqgan_step

# tiny config: 32² input, 3 levels → bottleneck 8²
VQGAN_KW = dict(
    in_channels=1, mid_channels=4, out_channels=1, emb_dim=8, dict_size=6,
    enc_ch_multiplier=(1, 2, 4), dec_ch_multiplier=(1, 2, 4),
    num_res_blocks=1, enc_attn_resolutions=(), dec_attn_resolutions=(8,),
    resolution=32,
)


def _init_vqgan(rng_key=0):
    m = VQGAN(**VQGAN_KW)
    x = jnp.zeros((2, 32, 32, 1))
    vq = vq_init(jax.random.key(41), 6, 8)
    vars_ = m.init(jax.random.key(rng_key), x, vq, train=False)
    return m, vars_, vq


def test_vqgan_forward_shapes(rng):
    m, vars_, vq = _init_vqgan()
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32))
    recon, commit, ids, emb, new_vq = m.apply(vars_, x, vq, False)
    assert recon.shape == (2, 32, 32, 1)
    assert ids.shape == (2, 8, 8)          # bottleneck at 32/2² = 8
    assert emb.shape == (2, 8, 8, 8)
    assert float(commit) > 0
    assert new_vq is vq  # eval: no EMA update


def test_vqgan_train_updates_codebook(rng):
    m, vars_, vq = _init_vqgan()
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32))
    _, _, _, _, new_vq = m.apply(vars_, x, vq, True)
    assert not np.allclose(np.asarray(new_vq.cluster_size), np.asarray(vq.cluster_size))


def test_vqgan_generate_from_ids(rng):
    m, vars_, vq = _init_vqgan()
    ids = jnp.asarray(rng.integers(0, 6, (1, 8, 8)).astype(np.int32))
    recon = m.apply(vars_, ids, vq, method=m.generate_image_from_ids)
    assert recon.shape == (1, 32, 32, 1)


def test_vqgan_unet_dis_step(rng):
    m, vars_, vq = _init_vqgan()
    dis = UNetDiscriminator(D_ch=4, resolution=128, D_attn="0")
    # use 128² input for the dis arch; rebuild VQGAN at 128
    kw = dict(VQGAN_KW, resolution=128)
    m = VQGAN(**kw)
    x0 = jnp.zeros((2, 128, 128, 1))
    vq = vq_init(jax.random.key(41), 6, 8)
    vqgan_vars = m.init(jax.random.key(0), x0, vq, train=False)
    dis_vars = dis.init(jax.random.key(1), x0, train=False)
    dec_tx, dis_tx = make_optimizer(1e-4), make_optimizer(4e-4)
    enc_tx = make_optimizer(1e-4)
    # enc slot unused for the VQGAN path; store an empty-params placeholder
    state = create_train_state(
        jax.random.key(2), {"params": {}}, vqgan_vars, vq, enc_tx, dec_tx,
        dis_vars=dis_vars, dis_tx=dis_tx,
    )
    step = make_vqgan_step(
        m, dis, dec_tx, dis_tx,
        loss_cfg=SecondStageLossConfig(n_inner_loops=1, use_unet_perceptual_loss=True),
    )
    image = jnp.asarray(rng.uniform(-1, 1, (2, 128, 128, 1)).astype(np.float32))
    new_state, metrics = jax.jit(step)(state, image, 0.0)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert not np.allclose(np.asarray(new_state.vq.cluster_size), np.asarray(vq.cluster_size))
