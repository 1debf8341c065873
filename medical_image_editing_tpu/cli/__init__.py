"""CLI entry points mirroring the reference surface:
`run_vqwnet.py -c config.json [-m train|test] [-w] [-v]` and `run_recon.py`."""


def cli_setup(what: str) -> None:
    """Common CLI preamble, called after argument parsing (so `--help` never
    touches the backend): enable the persistent XLA compile cache (TPU
    compiles travel a high-latency tunnel here) and gate on a bounded
    backend-liveness probe — a downed TPU runtime blocks PJRT init forever,
    so fail with a clear error instead of hanging (utils/device_probe.py).
    CPU-pinned processes skip the probe."""
    from ..utils.compile_cache import enable_compile_cache
    from ..utils.device_probe import require_default_backend

    enable_compile_cache()
    require_default_backend(what=what)
