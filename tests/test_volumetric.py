"""Tests for the 3-D volumetric VQ-WNet with GSPMD spatial partitioning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_editing_tpu.models.volumetric import (
    VolumetricUNetDecoder,
    VolumetricUNetEncoder,
    volumetric_forward,
)
from medical_image_editing_tpu.train.state import make_optimizer
from medical_image_editing_tpu.train.volumetric import (
    create_volumetric_mesh,
    init_volumetric,
    make_volumetric_train_step,
)

FILTERS = (4, 8, 16)
SHAPE = (2, 16, 16, 16, 1)


@pytest.mark.slow
def test_volumetric_forward_shapes(rng):
    enc, dec, ev, dv, vq, *_ = init_volumetric(
        jax.random.key(0), filters=FILTERS, dict_size=5, volume_shape=SHAPE)
    vol = jnp.asarray(rng.uniform(-1, 1, SHAPE).astype(np.float32))
    recon, commit, ids, new_vq = volumetric_forward(enc, dec, ev, dv, vq, vol)
    assert recon.shape == SHAPE
    assert ids.shape == SHAPE[:4]
    assert int(np.asarray(ids).min()) >= 1
    assert float(commit) > 0
    assert not np.allclose(np.asarray(new_vq.cluster_size), np.asarray(vq.cluster_size))


def test_volumetric_train_step_single_device(rng):
    enc, dec, ev, dv, vq, etx, dtx = init_volumetric(
        jax.random.key(0), filters=FILTERS, dict_size=5, volume_shape=SHAPE)
    step = make_volumetric_train_step(enc, dec, etx, dtx)
    vol = jnp.asarray(rng.uniform(-1, 1, SHAPE).astype(np.float32))
    eo, do = etx.init(ev["params"]), dtx.init(dv["params"])
    ev2, dv2, vq2, eo, do, m = step(ev, dv, vq, eo, do, vol)
    assert np.isfinite(float(m["total"]))
    p0 = jax.tree.leaves(ev["params"])[0]
    p1 = jax.tree.leaves(ev2["params"])[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_volumetric_remat_matches_plain(rng):
    """`use_remat=True` (the 128³ memory plan's seam, PERF.md) must change
    peak memory only, never values: same init (param trees identical leaf by
    leaf) and the same one-step metrics/updated params as the plain model."""
    enc, dec, ev, dv, vq, etx, dtx = init_volumetric(
        jax.random.key(0), filters=FILTERS, dict_size=5, volume_shape=SHAPE)
    enc_r, dec_r, ev_r, dv_r, vq_r, etx_r, dtx_r = init_volumetric(
        jax.random.key(0), filters=FILTERS, dict_size=5, volume_shape=SHAPE,
        use_remat=True)

    for a, b in zip(jax.tree.leaves(ev), jax.tree.leaves(ev_r)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(dv), jax.tree.leaves(dv_r)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    vol = jnp.asarray(rng.uniform(-1, 1, SHAPE).astype(np.float32))
    eo, do = etx.init(ev["params"]), dtx.init(dv["params"])
    out = make_volumetric_train_step(enc, dec, etx, dtx)(ev, dv, vq, eo, do, vol)
    out_r = make_volumetric_train_step(enc_r, dec_r, etx_r, dtx_r)(
        ev_r, dv_r, vq_r, eo, do, vol)

    for k in ("total", "recon", "commit"):
        np.testing.assert_allclose(float(out[5][k]), float(out_r[5][k]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(out[0]), jax.tree.leaves(out_r[0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_volumetric_bf16_step_finite(rng):
    """bf16 compute (the other half of the 128³ plan) trains a finite step;
    params and VQ state stay f32 (master weights)."""
    enc, dec, ev, dv, vq, etx, dtx = init_volumetric(
        jax.random.key(0), filters=FILTERS, dict_size=5, volume_shape=SHAPE,
        dtype=jnp.bfloat16, use_remat=True)
    assert all(a.dtype == jnp.float32 for a in jax.tree.leaves(ev["params"]))
    step = make_volumetric_train_step(enc, dec, etx, dtx)
    vol = jnp.asarray(rng.uniform(-1, 1, SHAPE).astype(np.float32))
    eo, do = etx.init(ev["params"]), dtx.init(dv["params"])
    ev2, dv2, vq2, eo, do, m = step(ev, dv, vq, eo, do, vol)
    assert np.isfinite(float(m["total"]))
    assert all(a.dtype == jnp.float32 for a in jax.tree.leaves(ev2["params"]))


@pytest.mark.slow
def test_volumetric_spatial_partitioning(rng):
    """2x4 (data x spatial) mesh: depth-sharded volumes, XLA halo exchange.
    The sharded result must match the single-device result."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    devices = jax.devices("cpu")[:8]
    mesh = create_volumetric_mesh(devices, data=2, spatial=4)

    enc, dec, ev, dv, vq, etx, dtx = init_volumetric(
        jax.random.key(0), filters=FILTERS, dict_size=5, volume_shape=SHAPE)
    vol_np = rng.uniform(-1, 1, SHAPE).astype(np.float32)

    step_ref = make_volumetric_train_step(enc, dec, etx, dtx)
    eo, do = etx.init(ev["params"]), dtx.init(dv["params"])
    ref = step_ref(ev, dv, vq, eo, do, jnp.asarray(vol_np))

    step_sp = make_volumetric_train_step(enc, dec, etx, dtx, mesh=mesh)
    vol_sharded = jax.device_put(
        jnp.asarray(vol_np), NamedSharding(mesh, P("data", "spatial")))
    repl = lambda t: jax.device_put(t, NamedSharding(mesh, P()))
    out = step_sp(repl(ev), repl(dv), repl(vq), repl(eo), repl(do), vol_sharded)

    np.testing.assert_allclose(float(out[5]["total"]), float(ref[5]["total"]),
                               rtol=1e-4)
    np.testing.assert_allclose(float(out[5]["recon"]), float(ref[5]["recon"]),
                               rtol=1e-4)
    # identical VQ statistics ⇒ identical assignments across the depth shards
    # (halo exchange correct); params are skipped: Adam's eps-dominated updates
    # on near-zero grads amplify f32 noise into meaningless relative error.
    np.testing.assert_allclose(
        np.asarray(out[2].cluster_size), np.asarray(ref[2].cluster_size), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(out[2].embed), np.asarray(ref[2].embed), rtol=1e-3, atol=1e-5
    )


def test_train_volumetric_cli(tmp_path):
    """CLI smoke: synthetic volumes → train → checkpoint + recon panel."""
    import os

    from medical_image_editing_tpu.cli import train_volumetric

    out = tmp_path / "vol_out"
    rc = train_volumetric.main([
        "--steps", "3", "--batch", "2", "--size", "16",
        "--n-synthetic", "4", "--filters", "4,8", "--log-every", "1",
        "--out", str(out),
    ])
    assert rc == 0
    assert os.path.isdir(out / "volumetric_ckpt")
    assert (out / "recon_mid.png").stat().st_size > 0


def test_train_volumetric_cli_mesh(tmp_path):
    """CLI with --mesh 2,4 on the 8-device virtual CPU mesh."""
    import os

    from medical_image_editing_tpu.cli import train_volumetric

    out = tmp_path / "vol_mesh_out"
    rc = train_volumetric.main([
        "--steps", "2", "--batch", "2", "--size", "16",
        "--n-synthetic", "4", "--filters", "4,8", "--mesh", "2,4",
        "--log-every", "1", "--out", str(out),
    ])
    assert rc == 0
    assert os.path.isdir(out / "volumetric_ckpt")


# ---------------------------------------------------------------------------
# Volumetric editing (edit_volume)
# ---------------------------------------------------------------------------


class _IdentityDecoder:
    """Decoder stub returning its input's first channel — isolates the
    mask/lookup/rescale math of the edit fn for a numpy golden check."""

    def apply(self, variables, embed, train):
        return embed


def test_volumetric_edit_math_golden(rng):
    from medical_image_editing_tpu.cli.edit_volume import make_volumetric_edit_fn
    from medical_image_editing_tpu.ops.vq import vq_init

    vq = vq_init(jax.random.key(0), 5, 3)
    ids = rng.integers(0, 6, (2, 4, 4, 4)).astype(np.int32)
    out = np.asarray(
        make_volumetric_edit_fn(_IdentityDecoder())({}, vq, jnp.asarray(ids))
    )

    # independent numpy recomputation of run_recon.py:182-192 lifted to 3-D
    codebook = np.asarray(vq.embed)
    bg = ids == 0
    ids0 = np.where(bg, 1, ids) - 1
    embed = codebook[ids0]  # (B,D,H,W,C)
    mask = (~bg).astype(np.float32)
    embed *= mask[..., None]
    per_vol = 4 * 4 * 4 / np.maximum(mask.sum(axis=(1, 2, 3)), 1.0)
    embed *= per_vol[:, None, None, None, None]
    np.testing.assert_allclose(out, embed[..., 0], rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_volumetric_edit_spatial_matches_unsharded(rng):
    from jax.sharding import Mesh

    from medical_image_editing_tpu.cli.edit_volume import make_volumetric_edit_fn
    from medical_image_editing_tpu.parallel import SPATIAL_AXIS

    _, dec, _, dv, vq, *_ = init_volumetric(
        jax.random.key(0), filters=FILTERS, dict_size=5, volume_shape=SHAPE)
    ids = jnp.asarray(rng.integers(0, 6, (2, 16, 16, 16)).astype(np.int32))

    want = np.asarray(make_volumetric_edit_fn(dec)(dv, vq, ids))
    assert want.shape == (2, 16, 16, 16) and np.isfinite(want).all()

    mesh = Mesh(np.asarray(jax.devices()[:8]), (SPATIAL_AXIS,))
    sp = make_volumetric_edit_fn(dec, mesh=mesh)
    got = np.asarray(sp(dv, vq, ids))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    txt = sp.lower(dv, vq, ids).compile().as_text()
    assert ("collective-permute" in txt) or ("all-reduce" in txt)


@pytest.mark.slow
def test_edit_volume_cli_roundtrip(tmp_path, rng):
    """Checkpoint from init state → edit-volume CLI → decoded .npy volumes."""
    import orbax.checkpoint as ocp

    from medical_image_editing_tpu.cli import edit_volume as ev

    _, dec, enc_vars, dv, vq, *_ = init_volumetric(
        jax.random.key(0), filters=FILTERS, dict_size=5, volume_shape=SHAPE)
    ckpt = tmp_path / "volumetric_ckpt"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        str(ckpt),
        {"enc": enc_vars, "dec": dv,
         "vq": {"embed": vq.embed, "cluster_size": vq.cluster_size,
                "embed_avg": vq.embed_avg}},
    )
    ckptr.wait_until_finished()
    labels = tmp_path / "labels"
    labels.mkdir()
    for i in range(3):
        np.save(labels / f"vol_{i}.npy",
                rng.integers(0, 6, (16, 16, 16)).astype(np.int32))
    out = tmp_path / "edited"
    rc = ev.main(["--ckpt", str(ckpt), "--labels", str(labels),
                  "--out", str(out), "--filters", "4,8,16",
                  "--dict-size", "5", "--batch", "2"])
    assert rc == 0
    for i in range(3):
        rec = np.load(out / f"edited_vol_{i}.npy")
        assert rec.shape == (16, 16, 16) and np.isfinite(rec).all()

    # wrong dict-size must fail loudly, not decode garbage
    with pytest.raises(ValueError, match="codebook"):
        ev.load_volumetric_checkpoint(str(ckpt), filters=FILTERS, dict_size=7)


@pytest.mark.slow
def test_edit_volume_nifti_roundtrip(tmp_path, rng):
    """NIfTI label volumes decode to the same recon as their .npy twins and
    come back out as NIfTI."""
    import orbax.checkpoint as ocp

    from medical_image_editing_tpu.cli import edit_volume as ev
    from medical_image_editing_tpu.utils import nifti

    _, dec, enc_vars, dv, vq, *_ = init_volumetric(
        jax.random.key(0), filters=FILTERS, dict_size=5, volume_shape=SHAPE)
    ckpt = tmp_path / "volumetric_ckpt"
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        str(ckpt),
        {"enc": enc_vars, "dec": dv,
         "vq": {"embed": vq.embed, "cluster_size": vq.cluster_size,
                "embed_avg": vq.embed_avg}},
    )
    ckptr.wait_until_finished()

    vol = rng.integers(0, 6, (16, 16, 16)).astype(np.int32)  # (D,H,W)
    labels = tmp_path / "labels"
    labels.mkdir()
    np.save(labels / "a.npy", vol)
    nifti.save(np.transpose(vol, (2, 1, 0)).astype(np.float64),
               str(labels / "b.nii.gz"))

    out = tmp_path / "edited"
    rc = ev.main(["--ckpt", str(ckpt), "--labels", str(labels),
                  "--out", str(out), "--filters", "4,8,16",
                  "--dict-size", "5", "--batch", "2"])
    assert rc == 0
    rec_npy = np.load(out / "edited_a.npy")
    rec_nii = np.transpose(nifti.load(str(out / "edited_b.nii.gz")), (2, 1, 0))
    np.testing.assert_allclose(rec_nii, rec_npy, atol=1e-5)
