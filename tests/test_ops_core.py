"""Golden tests for core ops against straightforward numpy reimplementations
of the reference semantics (SURVEY.md §4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from medical_image_editing_tpu.ops import (
    cutmix,
    cutmix_coordinates,
    cutmix_mask,
    denorm,
    denormalize,
    dropblock_2d,
    focal_loss,
    hinge_d_loss,
    kmeans,
    label_entropy,
    mask_src_tgt,
    nmse,
    norm,
    normalize,
    normalize_intensity,
    one_hot,
    psnr,
    soft_dice_loss,
    ssim,
    straight_through,
    t_normalize,
    vanilla_d_loss,
    vq_apply,
    vq_assign,
    vq_init,
    vq_lookup,
)
from medical_image_editing_tpu.ops.losses import (
    embedding_cross_loss,
    embedding_distance_loss,
    embedding_loss,
    embedding_regularization_loss,
    focal_frequency_loss,
)
from medical_image_editing_tpu.ops.vq import VQState


# ---------------------------------------------------------------------------
# windowing
# ---------------------------------------------------------------------------


def test_window_normalize_golden(rng):
    # spec: src/utils/__init__.py:17-29
    img = rng.uniform(-2000, 2000, (8, 8)).astype(np.float32)
    out = np.asarray(normalize(jnp.asarray(img), 1500, -550, 2.0))
    vmin, vmax = -550 - 750, -550 + 750
    ref = np.clip(img, vmin, vmax)
    ref = ((ref - vmin) / (vmax - vmin) - 0.5) * 2.0
    np.testing.assert_allclose(out, ref, rtol=1e-6)
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6


def test_t_normalize_no_clamp():
    # the differentiable path must NOT clamp (src/utils/__init__.py:34)
    img = jnp.array([-5000.0, 5000.0])
    out = t_normalize(img, 1500, -550, 2.0)
    assert float(out[0]) < -1.0 and float(out[1]) > 1.0


def test_normalize_denormalize_roundtrip(rng):
    img = rng.uniform(-1250, 250, (16,)).astype(np.float32)  # inside window
    n = t_normalize(jnp.asarray(img), 1500, -550, 2.0)
    back = denormalize(n, 1500, -550, 2.0)
    np.testing.assert_allclose(np.asarray(back), img, rtol=1e-4, atol=1e-2)


def test_norm_denorm():
    x = jnp.array([0.0, 0.5, 1.0])
    np.testing.assert_allclose(np.asarray(norm(x)), [-1.0, 0.0, 1.0])
    np.testing.assert_allclose(np.asarray(denorm(norm(x), 0.0, 1.0)), np.asarray(x), atol=1e-6)


def test_normalize_intensity():
    x = jnp.array([-10.0, 0.0, 127.5, 255.0, 300.0])
    out = np.asarray(normalize_intensity(x))
    np.testing.assert_allclose(out, [-1.0, -1.0, 0.0, 1.0, 1.0], atol=1e-6)


# ---------------------------------------------------------------------------
# one-hot
# ---------------------------------------------------------------------------


def test_one_hot(rng):
    ids = rng.integers(0, 11, (2, 4, 4))
    oh = np.asarray(one_hot(jnp.asarray(ids), 11))
    assert oh.shape == (2, 4, 4, 11)
    np.testing.assert_array_equal(oh.argmax(-1), ids)
    np.testing.assert_array_equal(oh.sum(-1), np.ones_like(ids))


# ---------------------------------------------------------------------------
# VQ
# ---------------------------------------------------------------------------


def test_vq_assign_matches_bruteforce_l2(rng):
    embed = rng.normal(size=(10, 16)).astype(np.float32)
    flat = rng.normal(size=(100, 16)).astype(np.float32)
    ids = np.asarray(vq_assign(jnp.asarray(embed), jnp.asarray(flat)))
    d = ((flat[:, None, :] - embed[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(ids, d.argmin(1))


def test_vq_ema_update_golden(rng):
    # numpy reimplementation of vq_module.py:182-200 (single replica)
    k, c, momentum, eps = 7, 4, 0.9, 1e-5
    embed = rng.normal(size=(k, c)).astype(np.float32)
    cluster_size = rng.uniform(0.1, 2.0, (k,)).astype(np.float32)
    embed_avg = rng.normal(size=(k, c)).astype(np.float32)
    x = rng.normal(size=(2, 3, 3, c)).astype(np.float32)

    state = VQState(jnp.asarray(embed), jnp.asarray(cluster_size), jnp.asarray(embed_avg))
    q, commit, ids, new_state = vq_apply(state, jnp.asarray(x), momentum=momentum, eps=eps)

    flat = x.reshape(-1, c)
    d = ((flat[:, None, :] - embed[None, :, :]) ** 2).sum(-1)
    ref_ids = d.argmin(1)
    np.testing.assert_array_equal(np.asarray(ids).reshape(-1), ref_ids)

    onehot = np.eye(k, dtype=np.float32)[ref_ids]
    ref_cs = cluster_size * momentum + onehot.sum(0) * (1 - momentum)
    ref_avg = embed_avg * momentum + (onehot.T @ flat) * (1 - momentum)
    n = ref_cs.sum()
    ref_embed = ref_avg / (n * (ref_cs + eps) / (n + k * eps))[:, None]

    np.testing.assert_allclose(np.asarray(new_state.cluster_size), ref_cs, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.embed_avg), ref_avg, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state.embed), ref_embed, rtol=1e-5)

    ref_q = embed[ref_ids].reshape(x.shape)
    ref_commit = ((x - ref_q) ** 2).mean()
    np.testing.assert_allclose(float(commit), ref_commit, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(q), ref_q, rtol=1e-5)  # forward value


def test_vq_eval_does_not_update(rng):
    state = vq_init(jax.random.key(0), 5, 8)
    x = jnp.asarray(rng.normal(size=(1, 4, 4, 8)).astype(np.float32))
    _, _, _, new_state = vq_apply(state, x, train=False)
    assert new_state is state


def test_straight_through_gradient():
    # spec: grad_approximation.py — d(loss)/dx flows as if quantized == x
    def loss(x):
        q = jax.lax.stop_gradient(x * 0.0 + 7.0)  # arbitrary forward value
        return jnp.sum(straight_through(q, x) ** 2)

    x = jnp.array([1.0, -2.0])
    g = jax.grad(loss)(x)
    # d/dx sum(q_st²) with q_st forward==7: grad = 2*7 routed straight through
    np.testing.assert_allclose(np.asarray(g), [14.0, 14.0])


def test_vq_commit_gradient_reaches_encoder():
    state = vq_init(jax.random.key(0), 4, 8)

    def f(x):
        _, commit, _, _ = vq_apply(state, x, train=False)
        return commit

    x = jax.random.normal(jax.random.key(1), (1, 2, 2, 8))
    g = jax.grad(f)(x)
    assert float(jnp.sum(jnp.abs(g))) > 0.0


def test_vq_distributed_psum_matches_global(rng):
    """The psum'd EMA statistics over 8 devices must equal a single-replica
    update on the concatenated batch (spec: vq_module.py:182-196 intent)."""
    from jax.sharding import Mesh, PartitionSpec as P

    devices = np.array(jax.devices("cpu")[:8])
    assert devices.size == 8, "conftest must provide 8 virtual devices"
    mesh = Mesh(devices, ("data",))

    k, c = 6, 8
    state = vq_init(jax.random.key(0), k, c)
    x = jnp.asarray(rng.normal(size=(16, 4, 4, c)).astype(np.float32))

    def shard_fn(state, x):
        _, _, _, new_state = vq_apply(state, x, momentum=0.5, axis_name="data")
        return new_state

    sharded = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=P(),
    )
    dist_state = sharded(state, x)

    # single-replica on full batch, with the /world_size semantics folded in:
    # mean over replicas of per-replica sums == global sum / 8
    flat = np.asarray(x).reshape(-1, c)
    embed = np.asarray(state.embed)
    d = ((flat[:, None, :] - embed[None, :, :]) ** 2).sum(-1)
    ids = d.argmin(1)
    onehot = np.eye(k, dtype=np.float32)[ids]
    onehot_sum = onehot.sum(0) / 8.0
    embed_sum = (onehot.T @ flat) / 8.0
    m = 0.5
    ref_cs = np.asarray(state.cluster_size) * m + onehot_sum * (1 - m)
    ref_avg = np.asarray(state.embed_avg) * m + embed_sum * (1 - m)
    np.testing.assert_allclose(np.asarray(dist_state.cluster_size), ref_cs, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dist_state.embed_avg), ref_avg, rtol=1e-5)


# ---------------------------------------------------------------------------
# k-means
# ---------------------------------------------------------------------------


def test_kmeans_recovers_separated_clusters(rng):
    centers = np.array([[0.0, 0.0], [10.0, 10.0], [-10.0, 10.0]], np.float32)
    pts = np.concatenate(
        [c + 0.1 * rng.normal(size=(50, 2)).astype(np.float32) for c in centers]
    )
    ids, found = kmeans(jax.random.key(0), jnp.asarray(pts), 3, num_iters=25)
    found = np.sort(np.asarray(found), axis=0)
    expect = np.sort(centers, axis=0)
    np.testing.assert_allclose(found, expect, atol=0.2)
    # each true cluster maps to one label
    ids = np.asarray(ids)
    for s in range(3):
        seg = ids[50 * s : 50 * (s + 1)]
        assert (seg == seg[0]).all()


# ---------------------------------------------------------------------------
# embedding loss
# ---------------------------------------------------------------------------


def _naive_cross_loss(embed_nhwc, r_ids_nhwk, codebook_kc):
    """Direct port of embed_loss.py:46-66 math in numpy (NCHW broadcast)."""
    b, h, w, c = embed_nhwc.shape
    k = r_ids_nhwk.shape[-1]
    e = embed_nhwc.reshape(b, -1, c)          # (B,L,C)
    r = r_ids_nhwk.reshape(b, -1, k)          # (B,L,K)
    dist = ((e[:, :, None, :] - codebook_kc[None, None, :, :]) ** 2).sum(-1)  # (B,L,K)
    cross = (dist * r).sum(1) / (r.sum(1) + 1e-6)  # (B,K)
    present = r.sum(1) > 0
    return cross[present].mean()


def test_embedding_cross_loss_matches_naive(rng):
    b, h, w, c, k = 2, 4, 4, 6, 5
    embed = rng.normal(size=(b, h, w, c)).astype(np.float32)
    ids = rng.integers(0, k, (b, h, w))
    r = np.eye(k, dtype=np.float32)[ids]
    cb = rng.normal(size=(k, c)).astype(np.float32)
    got = float(embedding_cross_loss(jnp.asarray(embed), jnp.asarray(r), jnp.asarray(cb)))
    want = _naive_cross_loss(embed, r, cb)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_embedding_distance_loss_golden(rng):
    k, c, margin = 4, 3, 1.0
    cb = rng.normal(size=(k, c)).astype(np.float32)
    got = float(embedding_distance_loss(jnp.asarray(cb), margin))
    d = np.linalg.norm(cb[:, None, :] - cb[None, :, :], axis=-1)
    hinge = np.clip(2 * margin - d, 0, None) ** 2
    want = hinge.sum() / (2 * k * (k - 1))  # diagonal included, spec quirk
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_embedding_reg_loss(rng):
    cb = rng.normal(size=(5, 3)).astype(np.float32)
    got = float(embedding_regularization_loss(jnp.asarray(cb)))
    np.testing.assert_allclose(got, np.linalg.norm(cb, axis=-1).mean(), rtol=1e-5)


def test_embedding_loss_symmetric_and_gated(rng):
    b, h, w, c, k = 1, 4, 4, 6, 4
    e1 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    e2 = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    ids1 = rng.integers(0, k, (b, h, w))
    ids2 = rng.integers(0, k, (b, h, w))
    r1 = jnp.asarray(np.eye(k, dtype=np.float32)[ids1])
    r2 = jnp.asarray(np.eye(k, dtype=np.float32)[ids2])
    cb = jnp.asarray(rng.normal(size=(k, c)).astype(np.float32))
    l_cross, l_dist, l_reg = embedding_loss(e1, r1, e2, r2, cb, margin=0.5)
    assert float(l_cross) > 0 and float(l_dist) >= 0 and float(l_reg) > 0
    _, l_dist0, l_reg0 = embedding_loss(
        e1, r1, e2, r2, cb, use_distance_loss=False, use_regularization_loss=False
    )
    assert float(l_dist0) == 0.0 and float(l_reg0) == 0.0


def test_embedding_cross_loss_codebook_grad_stopped(rng):
    e = jnp.asarray(rng.normal(size=(1, 2, 2, 3)).astype(np.float32))
    r = jnp.ones((1, 2, 2, 2), jnp.float32) * 0.5
    cb = jnp.asarray(rng.normal(size=(2, 3)).astype(np.float32))
    g = jax.grad(lambda c: embedding_cross_loss(e, r, c))(cb)
    np.testing.assert_allclose(np.asarray(g), 0.0)


# ---------------------------------------------------------------------------
# GAN + seg losses
# ---------------------------------------------------------------------------


def test_gan_losses_golden():
    lr = jnp.array([0.5, 2.0])
    lf = jnp.array([-0.5, -2.0])
    want_hinge = 0.5 * (np.mean([0.5, 0.0]) + np.mean([0.5, 0.0]))
    np.testing.assert_allclose(float(hinge_d_loss(lr, lf)), want_hinge, rtol=1e-6)
    sp = lambda v: np.log1p(np.exp(-abs(v))) + max(v, 0)
    want_vanilla = 0.5 * (
        np.mean([sp(-0.5), sp(-2.0)]) + np.mean([sp(-0.5), sp(-2.0)])
    )
    np.testing.assert_allclose(float(vanilla_d_loss(lr, lf)), want_vanilla, rtol=1e-5)


def test_focal_frequency_loss_zero_and_positive(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 1)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(2, 16, 16, 1)).astype(np.float32))
    assert float(focal_frequency_loss(x, x)) == pytest.approx(0.0, abs=1e-10)
    assert float(focal_frequency_loss(x, y)) > 0
    g = jax.grad(lambda p: focal_frequency_loss(p, y))(x)
    assert np.isfinite(np.asarray(g)).all()


def test_soft_dice_perfect_prediction(rng):
    ids = rng.integers(0, 3, (2, 4, 4))
    target = np.eye(3, dtype=np.float32)[ids]
    logits = jnp.asarray(target * 100.0)
    assert float(soft_dice_loss(logits, jnp.asarray(target))) == pytest.approx(0.0, abs=1e-4)


def test_focal_loss_confident_correct_is_small(rng):
    ids = rng.integers(0, 3, (2, 4, 4))
    target = np.eye(3, dtype=np.float32)[ids]
    logits = jnp.asarray(target * 100.0)
    assert float(focal_loss(logits, jnp.asarray(target))) < 1e-3


# ---------------------------------------------------------------------------
# cutmix
# ---------------------------------------------------------------------------


def test_cutmix_mask_and_paste():
    coords = ((jnp.int32(2), jnp.int32(5)), (jnp.int32(1), jnp.int32(4)))
    m = np.asarray(cutmix_mask(coords, 8, 8))
    assert m.sum() == 3 * 3
    assert m[2:5, 1:4].all() and m[0, 0] == 0

    src = jnp.zeros((1, 8, 8, 1))
    tgt = jnp.ones((1, 8, 8, 1))
    mixed = np.asarray(cutmix(src, tgt, jnp.asarray(m)))
    assert mixed.sum() == 9
    lerp = np.asarray(mask_src_tgt(src, tgt, jnp.asarray(m)))
    # src*m + (1-m)*tgt: inside box src (0), outside tgt (1)
    assert lerp[0, 2:5, 1:4, 0].sum() == 0 and lerp.sum() == 64 - 9


def test_cutmix_coordinates_in_bounds():
    for i in range(5):
        coords, lam = cutmix_coordinates(jax.random.key(i), 32, 32)
        ((y0, y1), (x0, x1)) = coords
        assert 0 <= int(y0) <= int(y1) <= 32
        assert 0 <= int(x0) <= int(x1) <= 32
        assert 0.0 <= float(lam) <= 1.0


# ---------------------------------------------------------------------------
# dropblock
# ---------------------------------------------------------------------------


def test_dropblock_zero_prob_identity(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 4)).astype(np.float32))
    out = dropblock_2d(jax.random.key(0), x, 0.0, block_size=5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)


def test_dropblock_drops_blocks_and_rescales(rng):
    x = jnp.ones((4, 32, 32, 2))
    out = np.asarray(dropblock_2d(jax.random.key(1), x, 0.5, block_size=5))
    dropped = (out == 0).mean()
    assert dropped > 0.1  # blocks actually dropped
    kept = out[out > 0]
    np.testing.assert_allclose(kept, kept[0])  # uniform rescale
    assert kept[0] > 1.0  # mean-preserving upscale


def test_dropblock_eval_identity(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 1)).astype(np.float32))
    out = dropblock_2d(jax.random.key(0), x, 0.9, block_size=3, train=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_dropblock_schedule():
    from medical_image_editing_tpu.ops import dropblock_schedule

    vals = [float(dropblock_schedule(i, 0.1, 0.9, 5)) for i in range(8)]
    np.testing.assert_allclose(vals[:5], np.linspace(0.1, 0.9, 5), rtol=1e-6)
    assert vals[5] == vals[6] == vals[7] == pytest.approx(0.9)


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


def test_psnr_golden(rng):
    t = rng.uniform(-1, 1, (1, 16, 16, 1)).astype(np.float32)
    p = t + 0.1 * rng.normal(size=t.shape).astype(np.float32)
    got = float(psnr(jnp.asarray(p), jnp.asarray(t)))
    dr = t.max() - t.min()
    want = 10 * np.log10(dr**2 / np.mean((p - t) ** 2))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_nmse_is_mse(rng):
    t = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    p = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    np.testing.assert_allclose(
        float(nmse(jnp.asarray(p), jnp.asarray(t))), np.mean((p - t) ** 2), rtol=1e-5
    )


def test_ssim_identity_and_range(rng):
    t = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 1)).astype(np.float32))
    assert float(ssim(t, t, data_range=2.0)) == pytest.approx(1.0, abs=1e-5)
    noisy = t + 0.5 * jnp.asarray(rng.normal(size=t.shape).astype(np.float32))
    v = float(ssim(noisy, t, data_range=2.0))
    assert 0.0 < v < 1.0


def test_label_entropy_matches_scipy(rng):
    ids = rng.integers(0, 6, (2, 16, 16)) + 1  # +1 offset like the encoder
    got = float(label_entropy(jnp.asarray(ids), dict_size=6))
    counts = np.bincount(ids.ravel(), minlength=7)[1:]
    want = scipy.stats.entropy(counts, base=2)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_label_entropy_single_code_is_zero():
    ids = jnp.ones((1, 8, 8), jnp.int32)
    assert float(label_entropy(ids, dict_size=5)) == pytest.approx(0.0, abs=1e-6)


def test_vq_pallas_fused_matches_xla_reference(rng):
    """Fused Pallas kernel (interpret mode on CPU) vs the XLA reference path —
    the backend seam mirroring the reference's torch/faiss duality."""
    from medical_image_editing_tpu.ops.vq_pallas import vq_apply_fused

    state = vq_init(jax.random.key(0), 10, 16)
    x = jnp.asarray(rng.normal(size=(2, 16, 16, 16)).astype(np.float32))
    q1, c1, i1, s1 = vq_apply(state, x, momentum=0.9)
    q2, c2, i2, s2 = vq_apply_fused(state, x, momentum=0.9, tile_n=256)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-5)
    np.testing.assert_allclose(float(c1), float(c2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1.cluster_size), np.asarray(s2.cluster_size), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.embed), np.asarray(s2.embed), rtol=1e-4)


def test_vq_pallas_tile_autoselect():
    """Tile rows adapt to the scoped-VMEM budget: full 2048 at the flagship
    point, smaller at VQGAN's wide C=512 (tile 2048 there OOMs the 16 MB
    scoped-VMEM stack on hardware), and degrade gracefully for tiny/odd N."""
    from medical_image_editing_tpu.ops.vq_pallas import _pick_tile

    assert _pick_tile(8 * 256 * 256, 16, 10, None) == 2048  # flagship
    vq_tile = _pick_tile(8 * 32 * 32, 512, 64, None)  # VQGAN @512² latent
    assert vq_tile < 2048 and (8 * 32 * 32) % vq_tile == 0
    assert 16 * 512 * vq_tile + 8 * 64 * vq_tile <= 12 * 1024 * 1024
    assert _pick_tile(24, 16, 10, None) == 24  # small N: one tile
    assert _pick_tile(7, 16, 10, None) == 7  # odd N fallback
    assert _pick_tile(4096, 16, 10, 256) == 256  # explicit override wins


def test_vq_pallas_fused_wide_embedding(rng):
    """Fused kernel at a wide-C operating point (VQGAN-like, auto tiling)."""
    from medical_image_editing_tpu.ops.vq_pallas import vq_apply_fused

    state = vq_init(jax.random.key(0), 12, 96)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 96)).astype(np.float32))
    q1, c1, i1, s1 = vq_apply(state, x, momentum=0.9)
    q2, c2, i2, s2 = vq_apply_fused(state, x, momentum=0.9)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s1.embed), np.asarray(s2.embed), rtol=1e-4)


def test_vq_apply_backend_seam(rng):
    state = vq_init(jax.random.key(0), 6, 8)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 8)).astype(np.float32))
    for backend in ("xla", "torch", "pallas", "faiss"):
        q, c, i, s = vq_apply(state, x, backend=backend, train=False)
        assert q.shape == x.shape


def test_focal_frequency_rfft_equals_full_fft(rng):
    for hw in ((16, 16), (12, 10), (9, 7)):
        x = jnp.asarray(rng.normal(size=(2, *hw, 1)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(2, *hw, 1)).astype(np.float32))
        full = float(focal_frequency_loss(x, y, use_rfft=False))
        half = float(focal_frequency_loss(x, y, use_rfft=True))
        np.testing.assert_allclose(half, full, rtol=1e-5)
