"""Bounded liveness probe for the default jax backend.

On this environment the TPU chip is reached through an axon PJRT plugin whose
initialization BLOCKS indefinitely when the tunnel is down — ``jax.devices()``
never returns and never raises. Anything that touches the default backend
first (bench.py, the driver's ``entry()`` compile-check) would hang with no
output instead of failing honestly. The probe runs ``jax.devices()`` in a
subprocess with a timeout, retrying over a bounded budget, so callers either
proceed on a live backend or raise a clear error in minutes.

CPU-pinned runs (tests, the hermetic multichip dryrun) are exempt: a config
or env pin of ``jax_platforms`` to cpu can never hang on the tunnel.
"""

import os
import subprocess
import sys
import time

__all__ = ["default_backend_ready", "require_default_backend"]

_PROBE_CODE = (
    "import jax; ds = jax.devices(); "
    "print('probe-ok', ds[0].platform, len(ds), flush=True)"
)


def _configured_cpu_only() -> bool:
    """True when this process's jax is pinned to the cpu platform (config
    value set by conftest/sitecustomize wins over the env var). Reads config
    only — never initializes a backend."""
    plats = None
    if "jax" in sys.modules:  # don't import jax just to read a default
        try:
            plats = sys.modules["jax"].config.jax_platforms
        except Exception:
            plats = None
    if not plats:
        plats = os.environ.get("JAX_PLATFORMS")
    if not plats:
        return False
    return plats.split(",")[0].strip() == "cpu"


def default_backend_ready(timeout_s: float = 120.0):
    """Probe ``jax.devices()`` in a subprocess (inheriting this environment,
    so the same sitecustomize/plugin applies). Returns the backend platform
    string (e.g. 'tpu') if it comes up within the timeout, else None."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_CODE],
            timeout=timeout_s, capture_output=True, text=True,
        )
    except subprocess.TimeoutExpired:
        return None
    if r.returncode != 0:
        return None
    for line in r.stdout.splitlines():
        if line.startswith("probe-ok "):
            return line.split()[1]
    return None


def require_default_backend(what: str = "this run", budget_s: float = None,
                            probe_s: float = 120.0) -> str:
    """Block until the default backend answers a device probe, or raise
    RuntimeError after ``budget_s`` seconds (env override
    ``MEDIMG_DEVICE_PROBE_BUDGET``). Returns the platform string; returns
    'cpu' immediately for cpu-pinned processes."""
    if _configured_cpu_only():
        return "cpu"
    if budget_s is None:
        budget_s = float(os.environ.get("MEDIMG_DEVICE_PROBE_BUDGET", "420"))
    deadline = time.monotonic() + budget_s
    attempt = 0
    while True:
        attempt += 1
        remaining = deadline - time.monotonic()
        if remaining <= 0:
            break
        platform = default_backend_ready(timeout_s=min(probe_s, remaining))
        if platform is not None:
            return platform
        print(
            f"device probe attempt {attempt} failed "
            f"({max(0.0, deadline - time.monotonic()):.0f}s of budget left); "
            "axon tunnel down?",
            file=sys.stderr, flush=True,
        )
        time.sleep(min(15.0, max(0.0, deadline - time.monotonic())))
    raise RuntimeError(
        f"default jax backend did not come up within {budget_s:.0f}s "
        f"({attempt} probe attempts) — refusing to start {what} (it would "
        "hang in PJRT plugin init). Set MEDIMG_DEVICE_PROBE_BUDGET to adjust."
    )
