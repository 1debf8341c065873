"""Tests for NIfTI I/O, datasets, loader, prefetch, and preprocessing geometry."""

import os

import numpy as np
import pytest

from medical_image_editing_tpu.data import (
    CRCDataset,
    DataLoader,
    MICCAIBraTSDataset,
    NCCLungDataset,
    SyntheticSliceDataset,
    get_data_loader,
    prefetch_to_device,
)
from medical_image_editing_tpu.data.loader import (
    normalize_intensity_np,
    random_affine_np,
    random_hflip_np,
)
from medical_image_editing_tpu.data.preprocess import (
    minmax_normalize,
    preprocess_brats_patient,
    preprocess_crc_volume,
    z_score_normalize,
)
from medical_image_editing_tpu.utils import nifti


# ---------------------------------------------------------------------------
# NIfTI
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
def test_nifti_roundtrip(tmp_path, rng, suffix):
    vol = rng.normal(size=(7, 9, 4)).astype(np.float32)
    path = str(tmp_path / f"vol{suffix}")
    nifti.save(vol, path)
    back = nifti.load(path)
    assert back.shape == vol.shape
    np.testing.assert_allclose(back, vol, rtol=1e-6)


def test_nifti_int_dtype_roundtrip(tmp_path, rng):
    ids = rng.integers(0, 11, (8, 8)).astype(np.int32)
    path = str(tmp_path / "ids.nii.gz")
    nifti.save(ids, path, dtype=np.int32)
    back = nifti.load(path)
    np.testing.assert_array_equal(back.astype(np.int32), ids)


def test_nifti_orientation_helper(rng):
    a = rng.normal(size=(4, 6)).astype(np.float32)
    out = nifti.to_nifti_array(a)
    np.testing.assert_array_equal(out, np.transpose(a)[::-1, ::-1])


# ---------------------------------------------------------------------------
# datasets
# ---------------------------------------------------------------------------


def _make_slice_tree(root, pattern, n_patients=2, n_slices=3, size=16, rng=None):
    rng = rng or np.random.default_rng(0)
    for p in range(n_patients):
        pdir = root / f"patient_{p:03d}"
        pdir.mkdir(parents=True, exist_ok=True)
        for s in range(n_slices):
            np.save(pdir / pattern.format(s=s), rng.normal(size=(size, size)).astype(np.float32))


def test_lung_dataset_walks_and_windows(tmp_path, rng):
    _make_slice_tree(tmp_path, "ct_img_{s:04d}.npy", rng=rng)
    ds = NCCLungDataset(
        str(tmp_path), window_width=1500, window_center=-550, window_scale=2.0,
        shuffle_files=False,
    )
    assert len(ds) == 6
    s = ds[0]
    assert set(s) >= {"patient_id", "slice_num", "image_path", "image"}
    assert s["image"].min() >= -1.0 and s["image"].max() <= 1.0  # windowed


def test_crc_dataset(tmp_path, rng):
    _make_slice_tree(tmp_path, "{s:04d}.npy", rng=rng)
    ds = CRCDataset(str(tmp_path), shuffle_files=False)
    assert len(ds) == 6
    assert ds[3]["image"].dtype == np.float32


def test_brats_dataset_modality_filter(tmp_path, rng):
    for pat in ("BraTS_001",):
        pdir = tmp_path / pat
        pdir.mkdir()
        for mod in ("t1", "t2", "flair"):
            for s in range(2):
                np.save(pdir / f"{pat}_{mod}_{s:04d}.npy",
                        rng.normal(size=(8, 8)).astype(np.float32))
    ds = MICCAIBraTSDataset(str(tmp_path), modality="t2")
    assert len(ds) == 2
    assert all("_t2_" in f["image_path"] for f in ds.files)


# ---------------------------------------------------------------------------
# loader
# ---------------------------------------------------------------------------


def test_loader_batching_and_shapes():
    ds = SyntheticSliceDataset(n=10, size=16)
    dl = DataLoader(ds, batch_size=4, shuffle=True, drop_last=False)
    batches = list(dl)
    assert [b["image"].shape[0] for b in batches] == [4, 4, 2]
    assert batches[0]["image"].shape == (4, 16, 16, 1)
    dl2 = DataLoader(ds, batch_size=4, shuffle=False, drop_last=True)
    assert [b["image"].shape[0] for b in dl2] == [4, 4]


def test_loader_background_worker_equals_sync():
    ds = SyntheticSliceDataset(n=8, size=8)
    sync = DataLoader(ds, batch_size=4, shuffle=False, num_workers=0)
    thr = DataLoader(ds, batch_size=4, shuffle=False, num_workers=1)
    for a, b in zip(sync, thr):
        np.testing.assert_array_equal(a["image"], b["image"])


def test_prefetch_to_device():
    import jax

    ds = SyntheticSliceDataset(n=8, size=8)
    dl = DataLoader(ds, batch_size=4, shuffle=False)
    out = list(prefetch_to_device(dl, size=2))
    assert len(out) == 2
    assert isinstance(out[0]["image"], jax.Array)
    np.testing.assert_allclose(
        np.asarray(out[0]["image"]), next(iter(dl))["image"], rtol=1e-6
    )


def test_get_data_loader_factory_modes(tmp_path, rng):
    _make_slice_tree(tmp_path, "{s:04d}.npy", rng=rng)
    train = get_data_loader("train", "CRCDataset", str(tmp_path), 2,
                            augmentations=["RandomHorizontalFlipTransform"])
    b = next(iter(train))
    assert b["image"].min() >= -1.0 and b["image"].max() <= 1.0  # intensity norm
    test = get_data_loader("test", "CRCDataset", str(tmp_path), 2)
    assert test.shuffle is False
    with pytest.raises(AssertionError):
        get_data_loader("test", "CRCDataset", str(tmp_path), 2,
                        augmentations=["RandomHorizontalFlipTransform"])


def test_host_transforms(rng):
    im = rng.uniform(0, 255, (16, 16)).astype(np.float32)
    out = normalize_intensity_np(im)
    assert out.min() >= -1 and out.max() <= 1
    g = np.random.default_rng(0)
    flipped = random_hflip_np(g, im, p=1.0)
    np.testing.assert_array_equal(flipped, im[:, ::-1])
    warped = random_affine_np(np.random.default_rng(1), im, p=1.0)
    assert warped.shape == im.shape and np.isfinite(warped).all()
    # identity-params affine ≈ identity
    ident = random_affine_np(np.random.default_rng(2), im, p=1.0,
                             degrees=(0, 0), translate=(0, 0), scale=(1, 1))
    np.testing.assert_allclose(ident, im, atol=1e-3)


# ---------------------------------------------------------------------------
# preprocessing
# ---------------------------------------------------------------------------


def test_minmax_and_zscore(rng):
    v = rng.normal(10, 5, (6, 6, 3))
    out = minmax_normalize(v.copy())
    assert out.min() == pytest.approx(0) and out.max() == pytest.approx(255)
    z = z_score_normalize(np.abs(v))
    mask = np.abs(v) > 0
    assert abs(z[mask].mean()) < 1e-5 and z[mask].std() == pytest.approx(1, abs=1e-4)


def test_preprocess_crc_volume_geometry(tmp_path, rng):
    vol = rng.uniform(0, 1000, (20, 24, 3))
    src = tmp_path / "P001_xyz_image.nii.gz"
    nifti.save(vol, str(src))
    dst = tmp_path / "out"
    preprocess_crc_volume(str(src), str(dst), image_size=16)
    files = sorted((dst / "P001_xyz").glob("*.npy"))
    assert len(files) == 3
    s0 = np.load(files[0])
    assert s0.shape == (16, 16)
    # geometry: flipud+rot90 before resize — compare against direct computation
    ref = minmax_normalize(vol)[..., 0]
    ref = np.rot90(ref[::-1, ...])
    from PIL import Image

    ref = np.array(Image.fromarray(ref).resize((16, 16), resample=Image.BILINEAR))
    np.testing.assert_allclose(s0, ref, rtol=1e-5)


def test_preprocess_brats_patient(tmp_path, rng):
    pat = "BraTS20_001"
    src = tmp_path / "Training" / pat
    src.mkdir(parents=True)
    for mod in ("t1", "t1ce", "t2", "flair"):
        nifti.save(np.abs(rng.normal(size=(10, 10, 2))) + 0.1,
                   str(src / f"{pat}_{mod}.nii.gz"))
    seg = rng.choice([0, 1, 2, 4], size=(10, 10, 2)).astype(np.float64)
    nifti.save(seg, str(src / f"{pat}_seg.nii.gz"))
    dst = tmp_path / "out"
    preprocess_brats_patient(pat, str(tmp_path / "Training"), str(dst), image_size=8)
    files = sorted((dst / pat).glob("*.npy"))
    assert len(files) == 10  # 5 modalities × 2 slices
    seg0 = np.load(dst / pat / f"{pat}_seg_0000.npy")
    assert set(np.unique(seg0)) <= {0, 1, 2, 3}  # 4→3 remap


def test_epoch_iterator_mid_epoch_resume_replays_exact_stream(tmp_path, rng):
    """Loader order is a pure function of (seed, epoch): skipping the first k
    batches of an epoch yields exactly the batches an uninterrupted run
    produced after its k-th — including the host-side augmentation draws."""
    from medical_image_editing_tpu.data import get_data_loader

    for p in range(3):
        pdir = tmp_path / f"P{p:03d}_x"
        pdir.mkdir()
        for s in range(8):
            np.save(pdir / f"{s:04d}.npy",
                    rng.uniform(0, 255, (16, 16)).astype(np.float32))
    mk = lambda: get_data_loader(
        "train", "CRCDataset", str(tmp_path), batch_size=4, drop_last=True,
        augmentations=["RandomAffineTransform", "RandomHorizontalFlipTransform"],
        seed=11,
    )
    full = list(mk().epoch_iterator(epoch=2))
    assert len(full) == 6
    for k in (1, 3, 5):
        resumed = list(mk().epoch_iterator(epoch=2, skip_batches=k))
        assert len(resumed) == len(full) - k
        for a, b in zip(full[k:], resumed):
            np.testing.assert_array_equal(a["image"], b["image"])
            assert a["patient_id"] == b["patient_id"]
    # different epochs shuffle differently
    other = list(mk().epoch_iterator(epoch=3))
    assert any(
        a["patient_id"] != b["patient_id"] or
        not np.array_equal(a["image"], b["image"])
        for a, b in zip(full, other)
    )


def test_len_reflects_process_shard(tmp_path, rng):
    """__len__ counts this process's batches (DistributedSampler semantics) —
    the trainer's mid-epoch resume math depends on it."""
    from medical_image_editing_tpu.data import DataLoader, SyntheticSliceDataset

    ds = SyntheticSliceDataset(n=20, size=8)
    single = DataLoader(ds, batch_size=3, shuffle=False, drop_last=True,
                        shard_by_process=False)
    assert len(single) == 6  # 20 // 3
    sharded = DataLoader(ds, batch_size=3, shuffle=False, drop_last=True,
                         shard_by_process=False)
    sharded._process_shard = (2, 1)  # process 1 of 2 → 10 samples
    assert len(sharded) == 3  # 10 // 3
    assert len(list(sharded)) == 3  # iteration agrees with len


def test_multi_worker_loader_matches_serial(tmp_path, rng):
    """num_workers N>1: a thread pool builds whole batches concurrently but
    yields them in order, bit-identical to the serial loader (per-batch rng
    is a pure function of (seed, epoch, bi))."""
    from medical_image_editing_tpu.data import get_data_loader

    for p in range(3):
        pdir = tmp_path / f"P{p:03d}_x"
        pdir.mkdir()
        for s in range(8):
            np.save(pdir / f"{s:04d}.npy",
                    rng.uniform(0, 255, (16, 16)).astype(np.float32))
    mk = lambda w: get_data_loader(
        "train", "CRCDataset", str(tmp_path), batch_size=4, drop_last=True,
        num_workers=w,
        augmentations=["RandomAffineTransform", "RandomHorizontalFlipTransform"],
        seed=5,
    )
    serial = list(mk(0).epoch_iterator(epoch=1))
    assert len(serial) == 6
    for w in (1, 3):
        parallel = list(mk(w).epoch_iterator(epoch=1))
        assert len(parallel) == len(serial)
        for a, b in zip(serial, parallel):
            np.testing.assert_array_equal(a["image"], b["image"])
            assert a["patient_id"] == b["patient_id"]
    # mid-epoch skip composes with workers
    skipped = list(mk(3).epoch_iterator(epoch=1, skip_batches=2))
    assert len(skipped) == 4
    for a, b in zip(serial[2:], skipped):
        np.testing.assert_array_equal(a["image"], b["image"])
