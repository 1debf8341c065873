"""Bounded backend-liveness probe (utils/device_probe.py).

On this environment a downed axon tunnel makes PJRT plugin init block
forever; bench.py and the driver's entry() compile-check gate on the probe so
they fail loudly in bounded time instead of hanging with no output.
"""

import subprocess

import pytest

from medical_image_editing_tpu.utils import device_probe as dp


def test_cpu_pinned_process_short_circuits():
    # conftest pins this process's jax_platforms to cpu → no subprocess probe
    assert dp._configured_cpu_only()
    assert dp.require_default_backend(what="test") == "cpu"


def test_probe_parses_platform(monkeypatch):
    def fake_run(cmd, timeout, capture_output, text):
        class R:
            returncode = 0
            stdout = "some plugin noise\nprobe-ok tpu 1\n"
        return R()

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert dp.default_backend_ready(timeout_s=1.0) == "tpu"


def test_probe_timeout_returns_none(monkeypatch):
    def fake_run(cmd, timeout, capture_output, text):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert dp.default_backend_ready(timeout_s=0.1) is None


def test_probe_nonzero_rc_returns_none(monkeypatch):
    def fake_run(cmd, timeout, capture_output, text):
        class R:
            returncode = 1
            stdout = "probe-ok tpu 1\n"  # rc wins: a dying probe is not ready
        return R()

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert dp.default_backend_ready(timeout_s=1.0) is None


def test_require_raises_after_budget(monkeypatch):
    monkeypatch.setattr(dp, "_configured_cpu_only", lambda: False)
    monkeypatch.setattr(dp, "default_backend_ready", lambda timeout_s: None)
    with pytest.raises(RuntimeError, match="refusing to start bench"):
        dp.require_default_backend(what="bench", budget_s=0.2, probe_s=0.05)


def test_require_returns_platform_on_recovery(monkeypatch):
    monkeypatch.setattr(dp, "_configured_cpu_only", lambda: False)
    calls = {"n": 0}

    def flaky(timeout_s):
        calls["n"] += 1
        return "tpu" if calls["n"] >= 2 else None

    monkeypatch.setattr(dp, "default_backend_ready", flaky)
    monkeypatch.setattr(dp.time, "sleep", lambda s: None)
    assert dp.require_default_backend(budget_s=30.0, probe_s=0.05) == "tpu"
    assert calls["n"] == 2


def test_real_subprocess_probe_on_cpu_env(monkeypatch):
    """End-to-end probe against a real subprocess: pin the child to cpu via
    the inherited env so it cannot touch the axon plugin."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    assert dp.default_backend_ready(timeout_s=120.0) == "cpu"
