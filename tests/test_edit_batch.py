"""Tests for the batched editing pipeline."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_editing_tpu.cli.edit_batch import edit_study, make_batched_edit_fn
from medical_image_editing_tpu.models import UNetDecoder
from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ
from medical_image_editing_tpu.utils import nifti

FILTERS = (4, 8, 16, 32, 64)


def _setup():
    enc = EncoderWithVQ(filters=FILTERS, dict_size=6)
    dec = UNetDecoder(out_channels=1, filters=FILTERS, dropped_skip_layers=())
    x0 = jnp.zeros((1, 32, 32, 1), jnp.float32)
    enc_vars, vq = enc.init(jax.random.key(0), x0)
    q, *_ = enc(enc_vars, vq, x0, train=False)
    dec_vars = dec.init({"params": jax.random.key(1), "dropblock": jax.random.key(2)},
                        q, train=False)
    return dec, {"dec_vars": dec_vars, "vq": vq}


@pytest.mark.slow
def test_batched_edit_matches_per_slice(rng):
    dec, s = _setup()
    edit = make_batched_edit_fn(dec)
    ids = jnp.asarray(rng.integers(0, 7, (4, 32, 32)).astype(np.int32))
    batched = np.asarray(edit(s["dec_vars"], s["vq"], ids))
    # per-slice results identical to batch-of-1 (per-slice mask rescale)
    for i in range(4):
        single = np.asarray(edit(s["dec_vars"], s["vq"], ids[i : i + 1]))
        np.testing.assert_allclose(batched[i], single[0], atol=2e-2)
    assert np.isfinite(batched).all()


def test_microbatched_edit_matches_independent_chunks(rng):
    """microbatch=N (lax.scan chunks inside the jit) computes exactly what N
    independent batch-N dispatches compute — the scan is pure plumbing. (NOT
    compared against the monolithic batch-8 dispatch: a different batch size
    changes XLA fusion/reduction order, and the random-init InstanceNorm
    stack divides by ~sqrt(eps) wherever spatial variance collapses,
    amplifying those last-ulp differences to O(1e-1); with trained weights
    the paths agree — see test_batched_edit_matches_per_slice's tolerance.)
    Covers the int8 quantized path, the config whose monolithic batch-32
    dispatch OOMs on hardware."""
    dec, s = _setup()
    ids = jnp.asarray(rng.integers(0, 7, (8, 32, 32)).astype(np.int32))
    for kw in ({}, {"quantize": "int8"}, {"output_dtype": "uint8"}):
        chunk2 = make_batched_edit_fn(dec, is_lung=True, **kw)
        micro = make_batched_edit_fn(dec, is_lung=True, microbatch=2, **kw)
        a = np.concatenate([
            np.asarray(chunk2(s["dec_vars"], s["vq"], ids[i : i + 2]))
            for i in range(0, 8, 2)
        ])
        b = np.asarray(micro(s["dec_vars"], s["vq"], ids))
        if a.dtype == np.uint8:
            assert np.abs(a.astype(np.int16) - b.astype(np.int16)).max() <= 1
        else:
            np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)
    # microbatch >= batch degrades to the monolithic dispatch (bit-identical)
    big = make_batched_edit_fn(dec, is_lung=True, microbatch=16)
    np.testing.assert_array_equal(
        np.asarray(big(s["dec_vars"], s["vq"], ids)),
        np.asarray(make_batched_edit_fn(dec, is_lung=True)(
            s["dec_vars"], s["vq"], ids)),
    )
    with pytest.raises(ValueError, match="divisible"):
        make_batched_edit_fn(dec, microbatch=3)(s["dec_vars"], s["vq"], ids)


def test_edit_study_pipeline(tmp_path, rng):
    dec, s = _setup()

    class S:
        dec_vars = s["dec_vars"]
        vq = s["vq"]

    label_dir = tmp_path / "labels"
    label_dir.mkdir()
    for i in range(5):
        ids = rng.integers(0, 7, (32, 32)).astype(np.float64)
        nifti.save(np.transpose(ids[::-1, ::-1]),
                   str(label_dir / f"label_{i:04d}.nii.gz"))
    out_dir = tmp_path / "out"
    written = edit_study(dec, S, str(label_dir), str(out_dir), batch_size=2)
    assert len(written) == 5
    rec = nifti.load(str(out_dir / "edited_0000.nii.gz"))
    assert rec.shape == (32, 32)
    assert np.isfinite(rec).all()


@pytest.mark.slow
def test_batched_edit_data_parallel(rng):
    from medical_image_editing_tpu.parallel import create_mesh

    dec, s = _setup()
    mesh = create_mesh(jax.devices("cpu")[:4])
    edit_dp = make_batched_edit_fn(dec, mesh=mesh)
    edit_sp = make_batched_edit_fn(dec)
    ids = jnp.asarray(rng.integers(0, 7, (8, 32, 32)).astype(np.int32))
    a = np.asarray(edit_dp(s["dec_vars"], s["vq"], ids))
    b = np.asarray(edit_sp(s["dec_vars"], s["vq"], ids))
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_uint8_output_matches_quantized_f32(rng):
    """output_dtype='uint8' equals quantizing the f32 output on host."""
    import jax

    from medical_image_editing_tpu.cli.edit_batch import make_batched_edit_fn
    from medical_image_editing_tpu.models import UNetDecoder
    from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ

    enc = EncoderWithVQ(filters=(4, 8, 16, 32, 64), dict_size=6, momentum=0.9)
    dec = UNetDecoder(out_channels=1, filters=(4, 8, 16, 32, 64),
                      dropped_skip_layers=(), use_pixel_shuffle=False)
    x0 = jnp.zeros((1, 32, 32, 1), jnp.float32)
    enc_vars, vq = enc.init(jax.random.key(0), x0)
    q, *_ = enc(enc_vars, vq, x0, train=False)
    dec_vars = dec.init({"params": jax.random.key(1),
                         "dropblock": jax.random.key(2)}, q, train=False)
    ids = jnp.asarray(rng.integers(0, 7, (2, 32, 32)).astype(np.int32))
    f32 = make_batched_edit_fn(dec, is_lung=True)
    u8 = make_batched_edit_fn(dec, is_lung=True, output_dtype="uint8")
    a = np.asarray(u8(dec_vars, vq, ids))
    b = ((np.clip(np.asarray(f32(dec_vars, vq, ids)), -1, 1) + 1) * 127.5
         ).astype(np.uint8)
    assert a.dtype == np.uint8
    # float rounding at the quantization boundary can differ by 1 LSB
    assert np.abs(a.astype(np.int16) - b.astype(np.int16)).max() <= 1


def test_edit_batch_cli_entrypoint(tmp_path, rng, monkeypatch):
    """The `edit-batch` console script's main() drives edit_study end to end."""
    import pytest as _pytest

    from medical_image_editing_tpu.cli import edit_batch as eb
    from medical_image_editing_tpu.cli import run_recon as rr
    from medical_image_editing_tpu.utils import nifti

    with _pytest.raises(SystemExit) as e:
        eb.main(["--help"])
    assert e.value.code == 0

    class TinyConfig(rr.LungConfig):
        enc_filters = (4, 8, 16, 32, 64)
        dec_filters = (4, 8, 16, 32, 64)

        def __init__(self):
            self.resume_checkpoint = None
            self.edited_file_path = None
            self.save_dir_path = str(tmp_path / "unused")

    import medical_image_editing_tpu.cli.run_recon as rr_mod

    monkeypatch.setattr(rr_mod, "LungConfig", TinyConfig)
    label_dir = tmp_path / "labels"
    label_dir.mkdir()
    for i in range(3):
        ids = rng.integers(0, 6, (32, 32)).astype(np.float64)
        nifti.save(np.transpose(ids[::-1, ::-1]),
                   str(label_dir / f"label_{i:03d}.nii.gz"))
    out_dir = tmp_path / "out"
    rc = eb.main(["--config", "lung", "--label-dir", str(label_dir),
                  "--out-dir", str(out_dir), "--batch-size", "2"])
    assert rc == 0
    outs = sorted(os.listdir(out_dir))
    assert outs == [f"edited_{i:03d}.nii.gz" for i in range(3)]


# ---------------------------------------------------------------------------
# Spatial (model-parallel) partitioning of the edit decode
# ---------------------------------------------------------------------------


def test_spatial_partition_matches_unsharded(rng):
    """GSPMD row-sharded edit decode == single-device decode, and the
    compiled module really partitions (collective ops present)."""
    from jax.sharding import Mesh

    from medical_image_editing_tpu.parallel import SPATIAL_AXIS

    dec, s = _setup()
    devices = np.asarray(jax.devices()[:8])
    mesh = Mesh(devices, (SPATIAL_AXIS,))

    edit_sp = make_batched_edit_fn(dec, mesh=mesh, partition="spatial")
    edit_ref = make_batched_edit_fn(dec)

    ids = jnp.asarray(rng.integers(0, 7, (2, 32, 32)).astype(np.int32))
    want = np.asarray(edit_ref(s["dec_vars"], s["vq"], ids))
    got = np.asarray(edit_sp(s["dec_vars"], s["vq"], ids))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)

    txt = edit_sp.lower(s["dec_vars"], s["vq"], ids).compile().as_text()
    assert ("collective-permute" in txt) or ("all-reduce" in txt), (
        "expected GSPMD partitioning evidence in the compiled HLO"
    )


def test_spatial_partition_2d_mesh_composes_with_data(rng):
    """('data' × 'spatial') mesh: batch over data, rows over spatial."""
    from jax.sharding import Mesh

    from medical_image_editing_tpu.parallel import DATA_AXIS, SPATIAL_AXIS

    dec, s = _setup()
    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, (DATA_AXIS, SPATIAL_AXIS))

    edit_sp = make_batched_edit_fn(dec, mesh=mesh, partition="spatial")
    edit_ref = make_batched_edit_fn(dec)

    ids = jnp.asarray(rng.integers(0, 7, (4, 32, 32)).astype(np.int32))
    want = np.asarray(edit_ref(s["dec_vars"], s["vq"], ids))
    got = np.asarray(edit_sp(s["dec_vars"], s["vq"], ids))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_spatial_partition_requires_spatial_axis():
    from jax.sharding import Mesh

    from medical_image_editing_tpu.parallel import DATA_AXIS

    dec, _ = _setup()
    mesh = Mesh(np.asarray(jax.devices()[:8]), (DATA_AXIS,))
    with pytest.raises(ValueError, match="spatial"):
        make_batched_edit_fn(dec, mesh=mesh, partition="spatial")


def test_serving_compute_dtype_plumb(rng):
    """LungConfig.compute_dtype='bfloat16' builds a bf16-compute decoder
    through load_model (the path every serving CLI uses); decode stays
    close to the f32 decode."""
    import medical_image_editing_tpu.cli.run_recon as rr

    class TinyConfig(rr.LungConfig):
        enc_filters = (4, 8, 16, 32, 64)
        dec_filters = (4, 8, 16, 32, 64)

        def __init__(self):
            self.resume_checkpoint = None
            self.edited_file_path = None
            self.save_dir_path = "unused"
            self.compute_dtype = None

    ids = jnp.asarray(rng.integers(0, 11, (1, 32, 32)).astype(np.int32))

    cfg = TinyConfig()
    _, dec32, s32 = rr.load_model(cfg)
    assert dec32.dtype is None
    want = np.asarray(make_batched_edit_fn(dec32)(s32.dec_vars, s32.vq, ids))

    cfg = TinyConfig()
    cfg.compute_dtype = "bfloat16"
    _, dec16, s16 = rr.load_model(cfg)
    assert dec16.dtype == jnp.bfloat16
    got = np.asarray(make_batched_edit_fn(dec16)(s16.dec_vars, s16.vq, ids))
    assert got.dtype == np.float32  # output stays f32 (final tanh cast)
    assert np.isfinite(got).all()
    # same weights (same seeds); bf16 rounding amplifies through the
    # random-init InstanceNorm stack, so pin agreement by correlation
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.99


def test_run_recon_edit_fn_spatial_partition(rng):
    """run_recon's make_edit_fn with config.partition='spatial' matches the
    unpartitioned edit (rows GSPMD-sharded over the virtual mesh)."""
    import medical_image_editing_tpu.cli.run_recon as rr

    class TinyConfig(rr.LungConfig):
        enc_filters = (4, 8, 16, 32, 64)
        dec_filters = (4, 8, 16, 32, 64)

        def __init__(self):
            self.resume_checkpoint = None
            self.edited_file_path = None
            self.save_dir_path = "unused"

    cfg = TinyConfig()
    _, dec, state = rr.load_model(cfg)
    plain = rr.make_edit_fn(dec, state, cfg)

    cfg_sp = TinyConfig()
    cfg_sp.partition = "spatial"
    sharded = rr.make_edit_fn(dec, state, cfg_sp)

    ids = rng.integers(0, 11, (1, 32, 32)).astype(np.int32)
    ids[0, :4, :4] = 0  # background region exercises the mask path
    r0, m0 = plain(ids)
    r1, m1 = sharded(ids)
    np.testing.assert_array_equal(m0, m1)
    np.testing.assert_allclose(r1, r0, atol=1e-4, rtol=1e-4)
