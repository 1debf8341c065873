"""Tests for PatchGAN + BigGAN U-Net discriminators, ActNorm, spectral norm."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_editing_tpu.models import (
    ActNorm,
    NLayerDiscriminator,
    UNetDiscriminator,
)
from medical_image_editing_tpu.models.biggan_layers import (
    Attention,
    DBlock,
    GBlock2,
    SNConv,
)


def test_actnorm_data_dependent_init(rng):
    m = ActNorm(4)
    x = jnp.asarray(rng.normal(3.0, 2.0, (8, 6, 6, 4)).astype(np.float32))
    vars_ = m.init(jax.random.key(0), x, train=False)
    out, upd = m.apply(vars_, x, True, mutable=["actnorm"])
    # first train-mode call whitens per channel
    o = np.asarray(out)
    np.testing.assert_allclose(o.mean(axis=(0, 1, 2)), 0.0, atol=1e-4)
    np.testing.assert_allclose(o.std(axis=(0, 1, 2)), 1.0, atol=1e-3)
    assert bool(upd["actnorm"]["initialized"])
    # second call with different stats does NOT reinit
    vars2 = {"params": vars_["params"], "actnorm": upd["actnorm"]}
    x2 = x * 5.0
    out2, upd2 = m.apply(vars2, x2, True, mutable=["actnorm"])
    np.testing.assert_allclose(
        np.asarray(upd2["actnorm"]["data_loc"]), np.asarray(upd["actnorm"]["data_loc"])
    )
    # reverse inverts
    rev = m.apply(vars2, out, False, True)
    np.testing.assert_allclose(np.asarray(rev), np.asarray(x), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("normalization", ["instancenorm", "batchnorm", "actnorm"])
@pytest.mark.slow
def test_nlayer_discriminator_norms(rng, normalization):
    m = NLayerDiscriminator(n_filters=8, n_layers=3, normalization=normalization)
    x = jnp.asarray(rng.normal(size=(2, 32, 32, 1)).astype(np.float32))
    vars_ = m.init(jax.random.key(0), x, train=False)
    out, _ = m.apply(vars_, x, True, mutable=True)
    # 3 stride-2 4×4 convs (32→16→8→4) then two stride-1 4×4 convs (4→3→2)
    assert out.shape == (2, 2, 2, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_nlayer_discriminator_spectral_norm(rng):
    m = NLayerDiscriminator(n_filters=8, n_layers=2, apply_spectral_norm=True)
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 1)).astype(np.float32))
    vars_ = m.init(jax.random.key(0), x, train=False)
    assert "batch_stats" in vars_  # power-iteration state exists
    out, upd = m.apply(vars_, x, True, mutable=["batch_stats"])
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_dblock_gblock_shapes(rng):
    x = jnp.asarray(rng.normal(size=(1, 16, 16, 8)).astype(np.float32))
    db = DBlock(16, downsample=True, preactivation=True)
    v = db.init(jax.random.key(0), x, train=False)
    out, _ = db.apply(v, x, True, mutable=["batch_stats"])
    assert out.shape == (1, 8, 8, 16)
    gb = GBlock2(4, upsample=True)
    v = gb.init(jax.random.key(0), x, train=False)
    out, _ = gb.apply(v, x, True, mutable=["batch_stats"])
    assert out.shape == (1, 32, 32, 4)


def test_attention_block(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 16)).astype(np.float32))
    m = Attention()
    v = m.init(jax.random.key(0), x, train=False)
    out, _ = m.apply(v, x, True, mutable=["batch_stats"])
    # gamma starts at 0 → identity at init
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


@pytest.mark.parametrize("resolution", [128, 256])
@pytest.mark.slow
def test_unet_discriminator_outputs(rng, resolution):
    # tiny width to keep the test fast; spatial = resolution required by arch
    m = UNetDiscriminator(D_ch=4, resolution=resolution, D_attn="0")
    x = jnp.asarray(rng.normal(size=(1, resolution, resolution, 1)).astype(np.float32))
    vars_ = m.init(jax.random.key(0), x, train=False)
    (pixel_map, bottleneck, feats), _ = m.apply(vars_, x, True, mutable=["batch_stats"])
    assert pixel_map.shape == (1, resolution, resolution, 1)
    assert bottleneck.shape == (1, 1)
    n_up = {128: 5, 256: 6, 512: 7}[resolution]
    assert len(feats) == n_up
    assert np.isfinite(np.asarray(pixel_map)).all()
