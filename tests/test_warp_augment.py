"""Tests for invertible warps and the augmentation pipeline — including the
forward∘reverse ≈ identity property on id maps that the equivariance loss
relies on (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_editing_tpu.ops.augment import (
    apply_photometric,
    forward_transform,
    random_transform,
    reverse_transform,
    sample_geometric_matrices,
)
from medical_image_editing_tpu.ops.warp import (
    affine_matrix,
    hflip_matrix,
    identity_matrix,
    warp_perspective,
)

AUG_CFG = {
    "modules": [
        "RandomHorizontalFlip",
        "RandomAffine",
        "ColorJitter",
        "RandomGaussianBlur",
        "RandomGaussianNoise",
    ],
    "RandomHorizontalFlip": {"p": 0.5},
    "RandomAffine": {"degrees": 10.0, "translate": [0.05, 0.05], "shear": 5.0, "p": 0.9},
    "ColorJitter": {"brightness": 0.2, "contrast": 0.2, "saturation": 0.0, "hue": 0.0, "p": 0.5},
    "RandomGaussianBlur": {"kernel": 3, "sigma": 0.8, "p": 0.3},
    "RandomGaussianNoise": {"std": 0.05, "p": 0.5},
}


def test_identity_warp_is_identity(rng):
    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 1)).astype(np.float32))
    out = warp_perspective(x, identity_matrix(2), method="bilinear")
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_hflip_matrix_flips(rng):
    x = rng.uniform(0, 1, (1, 8, 8, 1)).astype(np.float32)
    m = jnp.broadcast_to(hflip_matrix(8), (1, 3, 3))
    out = np.asarray(warp_perspective(jnp.asarray(x), m, method="nearest"))
    np.testing.assert_allclose(out, x[:, :, ::-1, :], atol=1e-6)


def test_translation_matrix(rng):
    x = np.zeros((1, 8, 8, 1), np.float32)
    x[0, 2, 3, 0] = 1.0
    # translate +2 in x, +1 in y
    m = affine_matrix(0.0, jnp.array([2.0, 1.0]), jnp.array([1.0, 1.0]),
                      jnp.array([0.0, 0.0]), 8, 8)[None]
    out = np.asarray(warp_perspective(jnp.asarray(x), m, method="nearest"))
    assert out[0, 3, 5, 0] == 1.0 and out.sum() == 1.0


def test_rotation_90_about_center():
    x = np.zeros((1, 9, 9, 1), np.float32)
    x[0, 4, 8, 0] = 1.0  # rightmost point on center row
    m = affine_matrix(90.0, jnp.zeros(2), jnp.ones(2), jnp.zeros(2), 9, 9)[None]
    out = np.asarray(warp_perspective(jnp.asarray(x), m, method="nearest"))
    # 90° CCW in math coords == point (8,4) → x' = cx - (y-cy)... verify energy
    # conservation and that the point moved off its original spot but stayed
    # at radius 4 from center.
    assert out.sum() == pytest.approx(1.0)
    pos = np.argwhere(out[0, :, :, 0] > 0)[0]
    assert not np.array_equal(pos, [4, 8])
    assert np.hypot(pos[0] - 4, pos[1] - 4) == pytest.approx(4.0, abs=0.01)


def test_warp_forward_reverse_identity_on_ids(rng):
    """reverse ∘ forward ≈ identity away from borders — the property the
    equivariance loss needs (spec: random_transform.py:93-112)."""
    ids = jnp.asarray(rng.integers(1, 8, (4, 64, 64)).astype(np.int32))
    mats = sample_geometric_matrices(
        jax.random.key(3), AUG_CFG, 4, 64, 64
    )
    warped = forward_transform(ids, mats)
    back = reverse_transform(warped, mats)
    inner = np.s_[:, 16:48, 16:48]
    agree = (np.asarray(back)[inner] == np.asarray(ids)[inner]).mean()
    assert agree > 0.9, agree


def test_random_transform_shapes_and_clear_vs_noised(rng):
    x = jnp.asarray(rng.uniform(0, 1, (4, 32, 32, 1)).astype(np.float32))
    noised, clear, mats = random_transform(jax.random.key(0), x, AUG_CFG)
    assert noised.shape == x.shape and clear.shape == x.shape
    assert mats.shape == (4, 3, 3)
    # geometric part identical; photometric applied only to noised
    assert np.isfinite(np.asarray(noised)).all()


def test_two_views_differ(rng):
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 1)).astype(np.float32))
    n1, c1, m1 = random_transform(jax.random.key(1), x, AUG_CFG)
    n2, c2, m2 = random_transform(jax.random.key(2), x, AUG_CFG)
    assert not np.allclose(np.asarray(m1), np.asarray(m2))


def test_photometric_zero_p_is_identity(rng):
    cfg = dict(AUG_CFG)
    cfg = {**AUG_CFG,
           "ColorJitter": {**AUG_CFG["ColorJitter"], "p": 0.0},
           "RandomGaussianBlur": {**AUG_CFG["RandomGaussianBlur"], "p": 0.0},
           "RandomGaussianNoise": {**AUG_CFG["RandomGaussianNoise"], "p": 0.0}}
    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 1)).astype(np.float32))
    out = apply_photometric(jax.random.key(0), x, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_geometric_zero_p_gives_identity_matrices():
    cfg = {
        "modules": ["RandomHorizontalFlip", "RandomAffine"],
        "RandomHorizontalFlip": {"p": 0.0},
        "RandomAffine": {"degrees": 30.0, "p": 0.0},
    }
    mats = sample_geometric_matrices(jax.random.key(0), cfg, 3, 16, 16)
    np.testing.assert_allclose(np.asarray(mats), np.asarray(identity_matrix(3)), atol=1e-6)


def test_warp_jit_compiles_once(rng):
    x = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 1)).astype(np.float32))
    f = jax.jit(lambda im, m: warp_perspective(im, m, method="bilinear"))
    m = identity_matrix(2)
    out1 = f(x, m)
    out2 = f(x * 2, m)
    np.testing.assert_allclose(np.asarray(out2), 2 * np.asarray(out1), atol=1e-5)


def test_warp_matches_map_coordinates_golden(rng):
    """The packed-gather sampler must be bit-equal to
    jax.scipy.ndimage.map_coordinates(mode='constant', cval=0) — including the
    out-of-support fringe (large translation) and multi-channel images."""
    import jax
    from functools import partial
    from medical_image_editing_tpu.ops.warp import warp_perspective

    def golden(x, mats, order):
        def one(img, m):
            h, w, c = img.shape
            mi = jnp.linalg.inv(m)
            ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
            xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
            sx = mi[0, 0] * xs + mi[0, 1] * ys + mi[0, 2]
            sy = mi[1, 0] * xs + mi[1, 1] * ys + mi[1, 2]
            den = mi[2, 0] * xs + mi[2, 1] * ys + mi[2, 2]
            sx, sy = sx / den, sy / den
            return jnp.stack(
                [jax.scipy.ndimage.map_coordinates(
                    img[..., i], [sy, sx], order=order, mode="constant", cval=0.0)
                 for i in range(c)], -1)
        return jax.vmap(partial(one))(x.astype(jnp.float32), mats)

    h = w = 24
    for c, angle, tx in [(1, 4.0, 2.0), (3, 30.0, 15.0), (1, 0.0, 23.5)]:
        th = np.deg2rad(angle)
        m = np.eye(3, dtype=np.float32)
        m[0, 0] = np.cos(th); m[0, 1] = -np.sin(th)
        m[1, 0] = np.sin(th); m[1, 1] = np.cos(th)
        m[0, 2] = tx
        mats = jnp.asarray(np.broadcast_to(m, (2, 3, 3)).copy())
        x = jnp.asarray(rng.uniform(-1, 1, (2, h, w, c)).astype(np.float32))
        for method, order in [("bilinear", 1), ("nearest", 0)]:
            got = warp_perspective(x, mats, method=method)
            want = golden(x, mats, order)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-6, err_msg=f"{method} c={c} tx={tx}")
