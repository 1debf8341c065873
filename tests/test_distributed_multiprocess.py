"""Two-process `jax.distributed` integration test (VERDICT r1 #6).

Covers the reference's multi-node DDP capability (`run_vqwnet.py:112-127`:
torch.distributed NCCL process group + DistributedSampler) with the TPU-native
equivalents: `parallel.initialize_distributed` → 2 CPU processes × 2 virtual
devices = one 4-device global mesh; per-process batch rows fed with
`make_array_from_process_local_data`; one `data_parallel` first-stage step
whose grad/VQ/batch-stats pmeans now cross a real process boundary.

Asserts (a) both processes end with bit-identical replicated state, and
(b) the result matches a single-process 4-device run of the same global batch
(the multi-process topology is numerically transparent).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _worker_env(n_local_devices: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    flags = [
        f for f in env.get("XLA_FLAGS", "").split()
        if "--xla_force_host_platform_device_count" not in f
    ]
    flags.append(f"--xla_force_host_platform_device_count={n_local_devices}")
    env["XLA_FLAGS"] = " ".join(flags)
    # keep the axon sitecustomize from registering a TPU backend at startup
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_NUM_CPU_DEVICES"] = str(n_local_devices)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


@pytest.mark.slow
def test_two_process_data_parallel_step(tmp_path):
    port = _free_port()
    outs = [str(tmp_path / f"p{i}.npz") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "distributed_worker.py"),
             str(i), str(port), outs[i]],
            env=_worker_env(2), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{logs[i][-4000:]}"

    r0, r1 = (np.load(o) for o in outs)

    # (a) replicated state identical across processes
    np.testing.assert_array_equal(r0["digest"], r1["digest"])
    assert r0["total2"] == r1["total2"]
    assert int(r0["step"]) == 2

    # (b) golden: same two steps, single process, 4 virtual devices
    # (this pytest process already runs on an 8-device CPU platform)
    import jax

    from medical_image_editing_tpu.parallel import (
        DATA_AXIS, create_mesh, data_parallel, replicate, shard_batch,
    )

    sys.path.insert(0, HERE)
    try:
        from distributed_worker import build, flat_params, global_batch
    finally:
        sys.path.remove(HERE)

    state, step = build(DATA_AXIS)
    mesh = create_mesh(jax.devices()[:4])
    state = replicate(mesh, state)
    image = shard_batch(mesh, np.asarray(global_batch()))
    pstep = data_parallel(step, mesh, n_state_args=1)
    state, m1 = pstep(state, image, 0.0)
    state, m2 = pstep(state, image, 0.0)

    assert np.isfinite(float(m2["total"]))
    # per_device_keys gives each device a distinct augmentation stream, so
    # the metric pmean averages genuinely different per-device values — the
    # gloo ring all-reduce vs XLA single-process reduction order then shows
    # at float32 ULP scale even on step 1; step 2 compounds it through the
    # ~1e5-magnitude grads. Both are reduction-order noise, so allclose.
    np.testing.assert_allclose(float(m1["total"]), float(r0["total1"]), rtol=1e-6)
    np.testing.assert_allclose(float(m2["total"]), float(r0["total2"]), rtol=1e-5)
    # parameter *updates* over two SGD steps match up to collective
    # reduction-order noise, relative to the update scale.
    delta_g = flat_params(jax.device_get(state)) - r0["flat0"]
    delta_w = r0["flat"] - r0["flat0"]
    scale = np.abs(delta_g).max()
    assert scale > 0
    np.testing.assert_allclose(delta_w, delta_g, rtol=1e-3, atol=1e-4 * scale)
