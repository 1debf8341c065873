"""Shared persistent XLA compile-cache setup.

One knob for every entrypoint (bench scripts, graft entry, test conftest):
serialized executables land in a disk cache so repeat runs skip compilation —
which matters doubly here, where TPU compiles travel a high-latency tunnel.
"""

CACHE_DIR = "/tmp/medimg_jax_cache"


def enable_compile_cache(min_compile_seconds: float = 1.0) -> bool:
    """Idempotent; safe before or after backend init. Returns success."""
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", CACHE_DIR)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_seconds
        )
        return True
    except Exception:
        return False
