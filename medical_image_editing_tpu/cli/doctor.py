"""`medimg-doctor`: bounded environment diagnostics for this framework.

Production TPU hosts fail in ways that normally surface as silent hangs or
far-away errors: a dead tunnel blocks PJRT init forever, a cold compile cache
turns every dispatch into a minutes-long remote compile, a missing g++ quietly
drops the native loader to the Python path. Each check here is BOUNDED in
time and reports pass/warn/fail; exit code 1 if anything failed.

Checks:
  versions     python / jax / flax / optax / numpy (+ torch if present)
  env          JAX_PLATFORMS / XLA_FLAGS / MEDIMG_* / axon plugin gate
  backend      subprocess device probe with timeout (never hangs the CLI)
  cache        persistent compile-cache dir (entries, size)
  native       C++ loader builds/loads; host core count
  mesh         8-device virtual CPU mesh psum in a hermetic subprocess

`--skip-backend` omits the (slow on dead tunnels) backend probe;
`--probe-timeout` bounds it (default 120 s).
"""

import argparse
import os
import subprocess
import sys


def _line(status: str, name: str, detail: str = "") -> bool:
    print(f"[{status:^4}] {name:<10} {detail}")
    return status != "FAIL"


def check_versions() -> bool:
    import platform

    parts = [f"python {platform.python_version()}"]
    for mod in ("jax", "flax", "optax", "numpy", "torch"):
        try:
            m = __import__(mod)
            parts.append(f"{mod} {getattr(m, '__version__', '?')}")
        except Exception:
            if mod == "torch":
                parts.append("torch absent (checkpoint bridge unavailable)")
            else:
                return _line("FAIL", "versions", f"cannot import {mod}")
    return _line("ok", "versions", ", ".join(parts))


def check_env() -> bool:
    notes = []
    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        notes.append("axon plugin gate set (sitecustomize will register a "
                      "TPU backend and override JAX_PLATFORMS)")
    for var in ("JAX_PLATFORMS", "XLA_FLAGS"):
        if os.environ.get(var):
            notes.append(f"{var}={os.environ[var]}")
    for var in sorted(k for k in os.environ if k.startswith("MEDIMG_")):
        notes.append(f"{var}={os.environ[var]}")
    return _line("ok", "env", "; ".join(notes) or "no overrides")


def check_backend(timeout_s: float) -> bool:
    from ..utils.device_probe import default_backend_ready

    platform = default_backend_ready(timeout_s=timeout_s)
    if platform is None:
        return _line(
            "FAIL", "backend",
            f"default backend did not answer a device probe in {timeout_s:.0f}s "
            "(dead tunnel / broken PJRT plugin — anything touching the "
            "default backend would hang)",
        )
    return _line("ok", "backend", f"platform '{platform}' is live")


def check_cache() -> bool:
    from ..utils.compile_cache import CACHE_DIR, enable_compile_cache

    if not enable_compile_cache():
        return _line("FAIL", "cache", "jax.config compile-cache keys rejected")
    if not os.path.isdir(CACHE_DIR):
        return _line("WARN", "cache",
                     f"{CACHE_DIR} does not exist yet (first run compiles cold)")
    n, size = 0, 0
    for root, _, files in os.walk(CACHE_DIR):
        for f in files:
            n += 1
            try:
                size += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return _line("ok", "cache", f"{CACHE_DIR}: {n} entries, {size / 1e6:.1f} MB")


def check_native() -> bool:
    from ..data import native_loader

    cores = os.cpu_count() or 1
    if not native_loader.is_available():
        return _line("WARN", "native",
                     "C++ loader unavailable (g++ missing or build failed) — "
                     "host loading falls back to Python")
    note = f"C++ loader loaded; {cores} host core(s)"
    if cores == 1:
        note += " (single-core host: loader thread pool cannot parallelize)"
    return _line("ok", "native", note)


def check_mesh(n: int = 8, timeout_s: float = 600.0) -> bool:
    """Hermetic virtual-mesh smoke: n CPU devices, one psum. Validates the
    multi-chip code path without touching any real TPU runtime."""
    from ..utils.hermetic import cpu_pinned_env

    code = (
        "import jax, jax.numpy as jnp\n"
        "import numpy as np\n"
        "from jax.sharding import Mesh, PartitionSpec as P\n"
        "from jax.experimental.shard_map import shard_map\n"
        f"devs = np.asarray(jax.devices('cpu')[:{n}])\n"
        f"assert devs.size == {n}, devs\n"
        "mesh = Mesh(devs, ('data',))\n"
        "f = shard_map(lambda x: jax.lax.psum(x, 'data'), mesh=mesh,\n"
        "              in_specs=P('data'), out_specs=P())\n"
        f"out = f(jnp.arange({n}, dtype=jnp.float32))\n"
        f"assert float(out[0]) == sum(range({n})), out\n"
        f"print('mesh-ok', {n})\n"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], env=cpu_pinned_env(n),
            capture_output=True, text=True, timeout=timeout_s,
        )
    except subprocess.TimeoutExpired:
        return _line("FAIL", "mesh", f"virtual-mesh smoke timed out ({timeout_s:.0f}s)")
    if r.returncode != 0 or "mesh-ok" not in r.stdout:
        return _line("FAIL", "mesh",
                     f"virtual-mesh smoke failed: {r.stderr.strip()[-200:]}")
    return _line("ok", "mesh", f"{n}-device virtual CPU mesh psum verified")


def main(argv=None):
    parser = argparse.ArgumentParser(description="Environment diagnostics")
    parser.add_argument("--skip-backend", action="store_true",
                        help="skip the default-backend probe (slow when the "
                             "TPU runtime is dead)")
    parser.add_argument("--probe-timeout", type=float, default=120.0)
    parser.add_argument("--mesh-devices", type=int, default=8)
    args = parser.parse_args(argv)

    ok = True
    ok &= check_versions()
    ok &= check_env()
    if not args.skip_backend:
        ok &= check_backend(args.probe_timeout)
    ok &= check_cache()
    ok &= check_native()
    ok &= check_mesh(args.mesh_devices)
    print("doctor:", "all checks passed" if ok else "FAILURES above")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
