"""File-walking datasets over preprocessed per-slice `.npy` files.

Behavioral specs:
  NCCLungDataset     — reference `src/dataio/lung_dataset.py`: walks
                       `root/patient_id/*_img_*` slices, parses slice_num from
                       the filename tail, applies HU windowing at load when
                       window params are given; file list shuffled at init.
  CRCDataset         — `src/dataio/crc_dataset.py`: `root/patient_id/*.npy`,
                       values already 0–255 (normalized to [-1,1] later).
  MICCAIBraTSDataset — `src/dataio/miccai_dataset.py`: same pattern filtered by
                       modality ∈ {t1, t1ce, t2, flair}.

Samples are dicts {patient_id, slice_num, image_path, image(H,W) float32} —
the reference's sample schema. A SyntheticSliceDataset is added for tests and
smoke runs (the reference has none — SURVEY.md §4).
"""

import glob
import os
import pathlib
import random
from typing import Optional

import numpy as np

from ..ops.windowing import normalize as window_normalize


def _parse_slice_num(path: str) -> int:
    return int(os.path.splitext(os.path.basename(path))[0].split("_")[-1])


class _SliceDataset:
    """Common walker: one subdirectory per patient, sorted slice files."""

    pattern = "*.npy"

    def __init__(self, root_dir_path: str, shuffle_files: bool = False, seed=None):
        self.root_dir_path = pathlib.Path(root_dir_path)
        self.files = self._build_file_paths()
        if shuffle_files:
            rng = random.Random(seed)
            rng.shuffle(self.files)

    def _glob_pattern(self) -> str:
        return self.pattern

    def _build_file_paths(self):
        files = []
        for patient_id in sorted(os.listdir(self.root_dir_path)):
            patient_dir = self.root_dir_path / patient_id
            if not patient_dir.is_dir():
                continue
            for image_path in sorted(glob.glob(str(patient_dir / self._glob_pattern()))):
                files.append(
                    {
                        "patient_id": patient_id,
                        "slice_num": _parse_slice_num(image_path),
                        "image_path": image_path,
                    }
                )
        return files

    def __len__(self):
        return len(self.files)

    def _load_image(self, path: str) -> np.ndarray:
        return np.load(path).astype(np.float32)

    def __getitem__(self, index: int) -> dict:
        sample = dict(self.files[index])
        sample["image"] = self._load_image(sample["image_path"])
        return sample


class NCCLungDataset(_SliceDataset):
    """Lung CT slices with HU windowing at load. Spec: `lung_dataset.py:18-80`.

    NB the reference `random.shuffle`s the file list at init (`:37`); here the
    shuffle is seeded and optional (the loader reshuffles per epoch anyway).
    """

    pattern = "*_img_*"

    def __init__(
        self,
        root_dir_path: str,
        window_width: Optional[float] = None,
        window_center: Optional[float] = None,
        window_scale: Optional[float] = None,
        shuffle_files: bool = True,
        seed=None,
    ):
        super().__init__(root_dir_path, shuffle_files=shuffle_files, seed=seed)
        self.window = (
            (window_width, window_center, window_scale)
            if None not in (window_width, window_center, window_scale)
            else None
        )

    def __getitem__(self, index: int) -> dict:
        sample = super().__getitem__(index)
        if self.window is not None:
            w, c, s = self.window
            sample["image"] = np.asarray(
                window_normalize(sample["image"], width=w, center=c, scale=s),
                dtype=np.float32,
            )
        return sample


class CRCDataset(_SliceDataset):
    """Rectal-cancer T2 MR slices (0–255 valued). Spec: `crc_dataset.py`."""

    pattern = "*.npy"

    def __init__(self, root_dir_path: str, shuffle_files: bool = True, seed=None):
        super().__init__(root_dir_path, shuffle_files=shuffle_files, seed=seed)


class MICCAIBraTSDataset(_SliceDataset):
    """BraTS slices filtered by modality. Spec: `miccai_dataset.py:24,41`."""

    MODALITIES = ("t1", "t1ce", "t2", "flair")

    def __init__(self, root_dir_path: str, modality: str, shuffle_files: bool = False, seed=None):
        assert modality in self.MODALITIES, modality
        self.modality = modality
        super().__init__(root_dir_path, shuffle_files=shuffle_files, seed=seed)

    def _glob_pattern(self) -> str:
        return f"*_{self.modality}_*"


class SyntheticSliceDataset:
    """In-memory random slices for tests/smoke (no reference counterpart)."""

    def __init__(self, n: int = 32, size: int = 64, vmin=-1.0, vmax=1.0, seed: int = 0):
        rng = np.random.default_rng(seed)
        self._images = rng.uniform(vmin, vmax, (n, size, size)).astype(np.float32)
        self.files = [
            {"patient_id": f"synthetic_{i // 8:03d}", "slice_num": i % 8, "image_path": ""}
            for i in range(n)
        ]

    def __len__(self):
        return len(self.files)

    def __getitem__(self, index: int) -> dict:
        sample = dict(self.files[index])
        sample["image"] = self._images[index]
        return sample
