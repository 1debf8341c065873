"""Tests for the VGG/LPIPS-style perceptual losses (random-feature fallback)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_editing_tpu.ops.perceptual import (
    make_lpips_loss,
    make_perceptual_loss,
    make_vgg_loss,
)


@pytest.mark.parametrize("factory", [lambda: make_vgg_loss("22"),
                                     lambda: make_vgg_loss("54"),
                                     make_lpips_loss])
def test_perceptual_zero_for_identical(factory, rng):
    with pytest.warns(UserWarning):
        loss = factory()
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 1)).astype(np.float32))
    assert float(loss(x, x)) == pytest.approx(0.0, abs=1e-8)
    y = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 1)).astype(np.float32))
    assert float(loss(x, y)) > 0


def test_perceptual_gradient_reaches_pred_only(rng):
    with pytest.warns(UserWarning):
        loss = make_vgg_loss("22")
    x = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 1)).astype(np.float32))
    y = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 1)).astype(np.float32))
    gx = jax.grad(lambda p: loss(p, y))(x)
    assert float(jnp.sum(jnp.abs(gx))) > 0
    gy = jax.grad(lambda t: loss(x, t))(y)
    np.testing.assert_allclose(np.asarray(gy), 0.0)  # target stop-gradient


def test_make_perceptual_loss_dispatch():
    with pytest.warns(UserWarning):
        assert make_perceptual_loss("vgg") is not None
    with pytest.warns(UserWarning):
        assert make_perceptual_loss("lpips") is not None
    with pytest.raises(ValueError):
        make_perceptual_loss("nope")


def test_perceptual_three_channel_input(rng):
    with pytest.warns(UserWarning):
        loss = make_vgg_loss("22")
    x = jnp.asarray(rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32))
    assert np.isfinite(float(loss(x, x * 0.5)))
