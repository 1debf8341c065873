"""Tests for the native C++ npy batch loader vs numpy ground truth."""

import numpy as np
import pytest

from medical_image_editing_tpu.data import native_loader
from medical_image_editing_tpu.ops.windowing import normalize as window_normalize

pytestmark = pytest.mark.skipif(
    not native_loader.is_available(), reason="native medimg_io not built"
)


def _write(tmp_path, arrays):
    paths = []
    for i, a in enumerate(arrays):
        p = str(tmp_path / f"s{i:03d}.npy")
        np.save(p, a)
        paths.append(p)
    return paths


def test_native_batch_matches_numpy(tmp_path, rng):
    arrays = [rng.normal(size=(16, 16)).astype(dt)
              for dt in (np.float32, np.float64, np.int32, np.int16, np.uint8)
              for _ in range(2)]
    # uint8/int need valid ranges
    arrays = [a if a.dtype != np.uint8 else rng.integers(0, 255, (16, 16)).astype(np.uint8)
              for a in arrays]
    paths = _write(tmp_path, arrays)
    out = native_loader.load_npy_batch(paths, 16, 16, n_threads=2)
    assert out.shape == (len(arrays), 16, 16)
    for i, a in enumerate(arrays):
        np.testing.assert_allclose(out[i], a.astype(np.float32), rtol=1e-6)


def test_native_fused_windowing(tmp_path, rng):
    arrays = [rng.uniform(-2000, 2000, (8, 8)).astype(np.float32) for _ in range(3)]
    paths = _write(tmp_path, arrays)
    out = native_loader.load_npy_batch(paths, 8, 8, window=(1500, -550, 2.0))
    for i, a in enumerate(arrays):
        want = np.asarray(window_normalize(a, 1500, -550, 2.0))
        np.testing.assert_allclose(out[i], want, rtol=1e-5, atol=1e-6)


def test_native_error_reporting(tmp_path, rng):
    paths = _write(tmp_path, [rng.normal(size=(8, 8)).astype(np.float32)])
    with pytest.raises(IOError):
        native_loader.load_npy_batch(paths + [str(tmp_path / "missing.npy")], 8, 8)
    # wrong shape
    np.save(tmp_path / "bad.npy", rng.normal(size=(4, 4)).astype(np.float32))
    with pytest.raises(IOError):
        native_loader.load_npy_batch([str(tmp_path / "bad.npy")], 8, 8)


def test_native_intensity_epilogue(tmp_path, rng):
    from medical_image_editing_tpu.data.loader import normalize_intensity_np

    arrays = [rng.uniform(-50, 300, (8, 8)).astype(np.float32) for _ in range(4)]
    paths = _write(tmp_path, arrays)
    out = native_loader.load_npy_batch(
        paths, 8, 8, epilogue=(native_loader.EP_INTENSITY, 0.0, 255.0),
        n_threads=2,
    )
    for i, a in enumerate(arrays):
        np.testing.assert_allclose(out[i], normalize_intensity_np(a),
                                   rtol=1e-5, atol=1e-6)


def test_get_data_loader_crc_uses_native_epilogue(tmp_path, rng):
    """CRC val/test (NormalizeIntensity only) is served by the native loader
    and matches the python transform path exactly."""
    from medical_image_editing_tpu.data import get_data_loader

    for p in range(2):
        pdir = tmp_path / f"P{p:03d}_x"
        pdir.mkdir()
        for s in range(3):
            np.save(pdir / f"{s:04d}.npy",
                    rng.uniform(0, 255, (16, 16)).astype(np.float32))
    mk = lambda: get_data_loader("test", "CRCDataset", str(tmp_path),
                                 batch_size=3, seed=7)
    native = mk()
    assert native._native and native._native_epilogue is not None
    python = mk()
    python._native = False
    for a, b in zip(native, python):
        np.testing.assert_allclose(a["image"], b["image"], rtol=1e-5, atol=1e-6)
        assert a["patient_id"] == b["patient_id"]


def test_dataloader_native_path_matches_python(tmp_path, rng):
    from medical_image_editing_tpu.data import DataLoader, NCCLungDataset

    for p in range(2):
        pdir = tmp_path / f"pat{p}"
        pdir.mkdir()
        for s in range(3):
            np.save(pdir / f"ct_img_{s:04d}.npy",
                    rng.uniform(-2000, 2000, (16, 16)).astype(np.float32))
    kw = dict(window_width=1500, window_center=-550, window_scale=2.0,
              shuffle_files=False)
    ds = NCCLungDataset(str(tmp_path), **kw)
    native = DataLoader(ds, batch_size=3, shuffle=False, use_native=True)
    python = DataLoader(ds, batch_size=3, shuffle=False, use_native=False)
    assert native._native
    for a, b in zip(native, python):
        np.testing.assert_allclose(a["image"], b["image"], rtol=1e-5, atol=1e-6)
        assert a["patient_id"] == b["patient_id"]
