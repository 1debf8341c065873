"""Every example config shipped in configs/ must load and validate cleanly.

These files are the first thing a migrating reference user touches
(README points at them as `-c` inputs, mirroring the reference's gitignored
`src/configs` dir, reference `.gitignore:3`); a stale example that trips
`validate_config` or the augmentation builder is a broken front door.
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_editing_tpu.ops.augment import random_transform
from medical_image_editing_tpu.utils.config import (
    load_json,
    validate_config,
)

CONFIG_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "configs")
CONFIG_PATHS = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.json")))


def _flags(path):
    """Infer the CLI trainer-select flags from the config filename, the same
    way a user would pass them (`run_vqwnet -c <cfg> [-w] [-v]`)."""
    name = os.path.basename(path)
    return {
        "multi_window": "multiwindow" in name,
        "vqgan": "vqgan" in name,
    }


def test_configs_are_shipped():
    assert CONFIG_PATHS, f"no example configs found under {CONFIG_DIR}"
    names = {os.path.basename(p) for p in CONFIG_PATHS}
    # one example per dataset family and per trainer mode
    assert "crc_first_stage.json" in names
    assert "brats_first_stage.json" in names
    assert "lung_first_stage.json" in names
    assert "lung_second_stage.json" in names
    assert "lung_multiwindow_joint.json" in names
    assert "crc_vqgan.json" in names


@pytest.mark.parametrize("path", CONFIG_PATHS, ids=os.path.basename)
def test_shipped_config_validates(path):
    cfg = load_json(path)
    warnings_ = validate_config(cfg, **_flags(path))
    assert warnings_ == [], f"{os.path.basename(path)} validated with warnings: {warnings_}"


@pytest.mark.parametrize("path", CONFIG_PATHS, ids=os.path.basename)
def test_shipped_config_augmentation_runs(path):
    cfg = load_json(path)
    aug = cfg.get("augmentation")
    assert aug is not None, "example configs should demonstrate the augmentation section"
    # drawing one view exercises every per-module param block in the config
    x = jnp.linspace(0.0, 1.0, 1 * 16 * 16).reshape(1, 16, 16, 1)
    noised, clear, mats = random_transform(jax.random.key(0), x, aug)
    assert noised.shape == clear.shape == x.shape
    assert mats.shape == (1, 3, 3)
    assert np.isfinite(np.asarray(noised)).all()
