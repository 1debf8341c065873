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
