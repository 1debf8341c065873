"""Hermetic CPU-pinned subprocess environments for virtual-mesh runs.

The multichip dryrun and the GSPMD benches must execute on N virtual CPU
devices with NO TPU-runtime involvement — a broken TPU runtime (or its
default conv precision) must never poison their correctness signal. The
recipe is environment-critical and lives in exactly one place:

* ``JAX_PLATFORMS=cpu``;
* replace any pre-existing ``--xla_force_host_platform_device_count`` flag;
* pop ``PALLAS_AXON_POOL_IPS`` — this environment's sitecustomize registers a
  TPU PJRT plugin gated on that var and force-updates ``jax_platforms``
  post-import, overriding the env var;
* pop vars some launchers use to pre-initialize TPU state.
"""

import os
from typing import Mapping, Optional


def cpu_pinned_env(n_devices: int,
                   base_env: Optional[Mapping[str, str]] = None) -> dict:
    """Environment dict for a subprocess pinned to n virtual CPU devices."""
    env = dict(os.environ if base_env is None else base_env)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if not f.startswith("--xla_force_host_platform_device_count")
    ]
    flags.append(f"--xla_force_host_platform_device_count={n_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    for var in ("TPU_LIBRARY_PATH", "PJRT_DEVICE", "TPU_NAME",
                "PALLAS_AXON_POOL_IPS"):
        env.pop(var, None)
    return env


def is_cpu_pinned(n_devices: int) -> bool:
    """True when the CURRENT process runs under cpu_pinned_env(n_devices)."""
    return os.environ.get("JAX_PLATFORMS") == "cpu" and (
        f"--xla_force_host_platform_device_count={n_devices}"
        in os.environ.get("XLA_FLAGS", "")
    )
