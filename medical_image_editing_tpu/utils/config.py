"""JSON config loading with the reference's schema and quirks.

Behavioral spec: reference `src/utils/__init__.py:99-106` — JSON file parsed
into recursive attribute-access objects, with the object hook coercing `False`
values to `None` (quirk preserved by default for strict config compatibility;
both are falsy so gated features behave identically). `getattr_else_none`
mirrors `src/trainers/base.py` helper of the same name.

The full config schema (sections `run`, `dataset`, `model.vqmodel`,
`model.dis`, `model.vqgan`, `loss`, `save`, `enc_optim`/`dec_optim`/`dis_optim`,
`augmentation`) is documented in SURVEY.md §5.
"""

import json
from typing import Any, Mapping


class ConfigNode:
    """Recursive attribute-access view over a dict (replaces the reference's
    recursive namedtuple). Raises AttributeError on missing keys like a
    namedtuple would; use `getattr_else_none`/`get` for optional fields."""

    def __init__(self, data: Mapping[str, Any]):
        object.__setattr__(self, "_data", dict(data))

    def __getattr__(self, name: str) -> Any:
        data = object.__getattribute__(self, "_data")
        if name not in data:
            raise AttributeError(f"config has no field {name!r}")
        return data[name]

    def __setattr__(self, name, value):
        object.__getattribute__(self, "_data")[name] = value

    def get(self, name: str, default=None) -> Any:
        return object.__getattribute__(self, "_data").get(name, default)

    def __contains__(self, name: str) -> bool:
        return name in object.__getattribute__(self, "_data")

    def __repr__(self):
        return f"ConfigNode({object.__getattribute__(self, '_data')!r})"

    def to_dict(self) -> dict:
        def undo(v):
            if isinstance(v, ConfigNode):
                return v.to_dict()
            if isinstance(v, list):
                return [undo(x) for x in v]
            return v

        return {k: undo(v) for k, v in object.__getattribute__(self, "_data").items()}


def to_config(data: Any, false_to_none: bool = True) -> Any:
    """Recursively wrap dicts in ConfigNode; optionally apply the False→None
    object-hook quirk (`src/utils/__init__.py:102`)."""
    if isinstance(data, Mapping):
        return ConfigNode(
            {k: to_config(v, false_to_none) for k, v in data.items()}
        )
    if isinstance(data, list):
        return [to_config(v, false_to_none) for v in data]
    if data is False and false_to_none:
        return None
    return data


def load_json(path: str, false_to_none: bool = True):
    """Load a reference-format JSON config. Spec: `src/utils/__init__.py:99-106`."""
    with open(path) as f:
        return to_config(json.load(f), false_to_none)


def getattr_else_none(config, name: str, default=None):
    """Optional-field accessor. Spec: `src/trainers/base.py` helper."""
    try:
        if isinstance(config, ConfigNode):
            return config.get(name, default)
        return getattr(config, name, default)
    except AttributeError:
        return default


def load_dotenv(path: str = ".env") -> dict:
    """Minimal python-dotenv replacement (the reference loads `.env` for
    checkpoint paths and Slack secrets — `run_vqwnet.py:29-31`,
    `run_recon.py:20-24`, `preprocess_*.py`). Parses KEY=VALUE lines into
    os.environ (existing variables win) and returns the parsed dict."""
    import os

    parsed = {}
    if not os.path.exists(path):
        return parsed
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            key, _, value = line.partition("=")
            key, value = key.strip(), value.strip().strip("'\"")
            parsed[key] = value
            os.environ.setdefault(key, value)
    return parsed
