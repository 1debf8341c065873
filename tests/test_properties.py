"""Property-based tests (hypothesis) for the numeric core.

Invariants the reference relies on implicitly (and the TPU rebuild must hold
for *all* inputs, not just the seeded fixtures used elsewhere):
  * windowing round trips: denormalize(normalize(x)) == clip(x, window) and
    t_normalize/denormalize are exact inverses (no clamp on the t-path) —
    spec `src/utils/__init__.py:17-51`;
  * norm/denorm are inverse bijections between [0,1]x[vmin,vmax];
  * affine warps: reverse(forward(ids)) fixes the interior of the id map
    (border pixels can legitimately be lost to zero padding), and the warp of
    a constant map stays within its value set;
  * one-hot: drop-background semantics used by the embed loss.
"""

import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from medical_image_editing_tpu.ops.onehot import one_hot
from medical_image_editing_tpu.ops.warp import (
    affine_matrix,
    warp_ids_forward,
    warp_ids_reverse,
)
from medical_image_editing_tpu.ops.windowing import (
    denorm,
    denormalize,
    norm,
    normalize,
    t_normalize,
)

finite_f = st.floats(
    min_value=-5000.0, max_value=5000.0, allow_nan=False, allow_infinity=False,
    width=32,
)
window_widths = st.integers(min_value=2, max_value=4000)
window_centers = st.integers(min_value=-2000, max_value=2000)
scales = st.floats(min_value=0.5, max_value=4.0, allow_nan=False, width=32)


@settings(max_examples=60, deadline=None)
@given(st.lists(finite_f, min_size=1, max_size=16), window_widths,
       window_centers, scales)
def test_normalize_denormalize_roundtrip_is_window_clip(vals, width, center, scale):
    x = np.asarray(vals, np.float64)
    vmin, vmax = center - width // 2, center + width // 2
    y = denormalize(normalize(x.copy(), width, center, scale), width, center, scale)
    np.testing.assert_allclose(y, np.clip(x, vmin, vmax), rtol=1e-6,
                               atol=1e-6 * max(1.0, width))
    # normalize lands in [-scale/2, scale/2]
    z = normalize(x.copy(), width, center, scale)
    assert np.all(z >= -scale / 2 - 1e-6) and np.all(z <= scale / 2 + 1e-6)


@settings(max_examples=60, deadline=None)
@given(st.lists(finite_f, min_size=1, max_size=16), window_widths,
       window_centers, scales)
def test_t_normalize_is_exact_inverse_of_denormalize(vals, width, center, scale):
    x = np.asarray(vals, np.float64)
    y = denormalize(t_normalize(x, width, center, scale), width, center, scale)
    np.testing.assert_allclose(y, x, rtol=1e-9, atol=1e-6 * max(1.0, width))


@settings(max_examples=60, deadline=None)
@given(st.lists(st.floats(min_value=0.0, max_value=1.0, allow_nan=False,
                          width=32), min_size=1, max_size=16),
       st.floats(min_value=-100.0, max_value=99.0, allow_nan=False, width=32),
       st.floats(min_value=0.5, max_value=200.0, allow_nan=False, width=32))
def test_norm_denorm_bijection(vals, vmin, span):
    x = np.asarray(vals, np.float64)
    vmax = vmin + span
    np.testing.assert_allclose(
        (norm(denorm(norm(x), vmin, vmax) / (vmax - vmin) - vmin / (vmax - vmin))),
        norm(x), rtol=1e-9, atol=1e-9,
    )
    # denorm maps [-1,1] onto [vmin,vmax] monotonically
    np.testing.assert_allclose(denorm(np.asarray([-1.0, 1.0]), vmin, vmax),
                               [vmin, vmax], rtol=1e-9, atol=1e-9)


@settings(max_examples=20, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.floats(min_value=-10.0, max_value=10.0, allow_nan=False),
    st.floats(min_value=-0.05, max_value=0.05, allow_nan=False),
    st.floats(min_value=-0.05, max_value=0.05, allow_nan=False),
)
def test_warp_roundtrip_fixes_interior(seed, degrees, tx, ty):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, 7, (1, 24, 24)), jnp.int32)
    h = w = 24
    mats = affine_matrix(
        jnp.float32(degrees),
        jnp.asarray([tx * w, ty * h], jnp.float32),
        jnp.asarray([1.0, 1.0], jnp.float32),
        jnp.asarray([0.0, 0.0], jnp.float32),
        h,
        w,
    )[None]
    rt = warp_ids_reverse(warp_ids_forward(ids, [mats]), [mats])
    rt = np.asarray(jnp.round(rt)).astype(np.int32)
    orig = np.asarray(ids)
    inner = (slice(0, 1), slice(4, -4), slice(4, -4))
    mismatch = np.mean(rt[inner] != orig[inner])
    # nearest-neighbour resampling can disagree on cell boundaries; the
    # interior must survive a small-affine round trip almost everywhere
    assert mismatch < 0.35, mismatch
    # values never leave the original id set union {0 padding}
    assert set(np.unique(rt)) <= set(np.unique(orig)) | {0}


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=0, max_value=10_000),
       st.integers(min_value=2, max_value=11))
def test_one_hot_drop_background(seed, k):
    rng = np.random.default_rng(seed)
    ids = jnp.asarray(rng.integers(0, k, (2, 8, 8)), jnp.int32)
    oh = one_hot(ids, k)
    assert oh.shape == (2, 8, 8, k)
    # exactly one channel hot per pixel, and dropping channel 0 zeroes
    # exactly the background pixels
    np.testing.assert_array_equal(np.asarray(oh.sum(-1)), np.ones((2, 8, 8)))
    dropped = np.asarray(oh[..., 1:].sum(-1))
    np.testing.assert_array_equal(dropped, np.asarray(ids) != 0)


@settings(max_examples=40, deadline=None)
@given(st.integers(min_value=0, max_value=100_000),
       st.integers(min_value=4, max_value=40),
       st.integers(min_value=4, max_value=40))
def test_cutmix_box_properties(seed, h, w):
    """Box corners are ordered and in range; the mask is the exact iota
    realization of python-slice semantics; the box area tracks 1−lam (the
    beta-sampled mix ratio) up to rounding/clipping at the borders."""
    import jax

    from medical_image_editing_tpu.ops.cutmix import (
        cutmix,
        cutmix_coordinates,
        cutmix_mask,
        mask_src_tgt,
    )

    coords, lam = cutmix_coordinates(jax.random.key(seed), h, w)
    ((y0, y1), (x0, x1)) = coords
    y0, y1, x0, x1 = (int(v) for v in (y0, y1, x0, x1))
    assert 0 <= y0 <= y1 <= h and 0 <= x0 <= x1 <= w

    mask = np.asarray(cutmix_mask(coords, h, w))
    ref = np.zeros((h, w), np.float32)
    ref[y0:y1, x0:x1] = 1.0
    np.testing.assert_array_equal(mask, ref)

    # un-clipped box area is h*sqrt(1-lam) * w*sqrt(1-lam) = h*w*(1-lam);
    # the realized mask only shrinks via border clipping (+1px rounding each edge)
    area = mask.sum() / (h * w)
    assert area <= (1.0 - float(lam)) + (2 * (h + w)) / (h * w) + 1e-6

    rng = np.random.default_rng(seed)
    src = jnp.asarray(rng.normal(size=(2, h, w, 1)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(2, h, w, 1)).astype(np.float32))
    mixed = np.asarray(cutmix(src, tgt, jnp.asarray(mask)))
    # inside the box → target, outside → source (exact)
    np.testing.assert_array_equal(mixed[:, y0:y1, x0:x1], np.asarray(tgt)[:, y0:y1, x0:x1])
    inv = 1 - ref.astype(bool)
    np.testing.assert_array_equal(mixed[:, inv.astype(bool)], np.asarray(src)[:, inv.astype(bool)])
    # mask_src_tgt is cutmix with the roles swapped
    np.testing.assert_allclose(
        np.asarray(mask_src_tgt(src, tgt, jnp.asarray(mask))),
        np.asarray(cutmix(tgt, src, jnp.asarray(mask))), rtol=1e-6)
