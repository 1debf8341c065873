"""Utilities: config, logging, checkpointing, imaging, NIfTI I/O, seeding."""

from .config import ConfigNode, load_json, to_config, getattr_else_none
from .logging import Logger, is_main_process
from .checkpoint import CheckpointManager, restore_fields
from .seed import init_seed
from .imaging import (
    CMAP,
    save_fused_image,
    save_image,
    save_image_grid,
    save_snapshot_grid,
    subplot_image,
    to_image,
)
