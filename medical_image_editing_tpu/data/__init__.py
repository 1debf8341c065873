"""Datasets, host-side loader with device prefetch, and preprocessing.

The reference's `src/dataio` (torch DataLoader + per-sample host transforms)
becomes: numpy file-walking datasets + a threaded batch loader with
double-buffered device prefetch; intensity normalization and augmentation run
on device inside the jitted step (SURVEY.md §7 step 4)."""

from .datasets import (
    CRCDataset,
    MICCAIBraTSDataset,
    NCCLungDataset,
    SyntheticSliceDataset,
)
from .loader import DataLoader, get_data_loader, prefetch_to_device
