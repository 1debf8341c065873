"""Utilities: config, logging, checkpointing, imaging, NIfTI I/O, seeding."""

from .config import ConfigNode, load_json, to_config, getattr_else_none
