"""`medimg-doctor` diagnostics (cli/doctor.py): each check bounded, correct
exit code, and the backend probe can never hang the CLI."""

import pytest

from medical_image_editing_tpu.cli import doctor


def test_doctor_all_green_skipping_backend(capsys):
    # cpu-pinned test env: every non-backend check should pass (native may
    # WARN but not FAIL on hosts without g++)
    rc = doctor.main(["--skip-backend", "--mesh-devices", "4"])
    out = capsys.readouterr().out
    assert rc == 0
    for name in ("versions", "env", "cache", "native", "mesh"):
        assert name in out
    assert "] backend" not in out  # the check itself was skipped
    assert "all checks passed" in out


def test_doctor_backend_probe_failure_sets_exit_code(capsys, monkeypatch):
    from medical_image_editing_tpu.utils import device_probe

    monkeypatch.setattr(doctor, "check_mesh", lambda n=8, timeout_s=600.0: True)
    monkeypatch.setattr(device_probe, "default_backend_ready",
                        lambda timeout_s: None)
    rc = doctor.main(["--probe-timeout", "1"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "[FAIL] backend" in out


def test_doctor_backend_probe_success(capsys, monkeypatch):
    from medical_image_editing_tpu.utils import device_probe

    monkeypatch.setattr(doctor, "check_mesh", lambda n=8, timeout_s=600.0: True)
    monkeypatch.setattr(device_probe, "default_backend_ready",
                        lambda timeout_s: "tpu")
    rc = doctor.main(["--probe-timeout", "1"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "platform 'tpu' is live" in out
