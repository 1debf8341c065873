"""Volumetric (3-D) VQ-WNet benchmarks + GSPMD partitioning evidence
(VERDICT r1 #10).

Two modes:
  --tpu   single-chip 64^3 train-step timing on the real chip.
  --gspmd (default) 8-device virtual CPU mesh ('data'=2 x 'spatial'=4):
          compiles the depth-sharded step, executes one step, and inspects
          the compiled HLO for the halo-exchange collectives
          (collective-permute) GSPMD inserts for 3-D convs across depth
          shards. Self-pins to the CPU backend in a subprocess (same recipe
          as __graft_entry__.dryrun_multichip).
"""

import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_tpu():
    import jax
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)
    from medical_image_editing_tpu.train.volumetric import (
        init_volumetric,
        make_volumetric_train_step,
    )

    shape = (1, 64, 64, 64, 1)
    enc, dec, ev, dv, vq, enc_tx, dec_tx = init_volumetric(
        jax.random.key(0), filters=(8, 16, 32, 64), dict_size=10,
        volume_shape=shape,
    )
    step = make_volumetric_train_step(enc, dec, enc_tx, dec_tx)
    rng = np.random.default_rng(0)
    vol = jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32))
    enc_opt, dec_opt = enc_tx.init(ev["params"]), dec_tx.init(dv["params"])

    ev, dv, vq, enc_opt, dec_opt, m = step(ev, dv, vq, enc_opt, dec_opt, vol)
    assert np.isfinite(float(m["total"]))
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        ev, dv, vq, enc_opt, dec_opt, m = step(ev, dv, vq, enc_opt, dec_opt, vol)
    assert np.isfinite(float(m["total"]))
    dt = (time.perf_counter() - t0) / n
    vox_per_sec = np.prod(shape[1:4]) / dt
    print(f"volumetric 64^3 step: {dt*1000:.2f} ms/step "
          f"({vox_per_sec/1e6:.1f} Mvox/s/chip), total={float(m['total']):.4f}")


def run_gspmd():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    sys.path.insert(0, REPO)
    from medical_image_editing_tpu.train.volumetric import (
        create_volumetric_mesh,
        init_volumetric,
        make_volumetric_train_step,
    )

    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    mesh = create_volumetric_mesh(devs, data=2, spatial=4)

    shape = (2, 32, 32, 32, 1)
    enc, dec, ev, dv, vq, enc_tx, dec_tx = init_volumetric(
        jax.random.key(0), filters=(8, 16, 32, 64), dict_size=10,
        volume_shape=(1,) + shape[1:],
    )
    step = make_volumetric_train_step(enc, dec, enc_tx, dec_tx, mesh=mesh)
    rng = np.random.default_rng(0)
    vol = jax.device_put(
        jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32)),
        NamedSharding(mesh, P("data", "spatial")),
    )
    enc_opt, dec_opt = enc_tx.init(ev["params"]), dec_tx.init(dv["params"])

    lowered = step.lower(ev, dv, vq, enc_opt, dec_opt, vol)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    n_cp = hlo.count("collective-permute")
    n_ag = hlo.count("all-gather")
    n_ar = hlo.count("all-reduce")
    print(f"compiled HLO collectives: collective-permute={n_cp} "
          f"(depth-halo exchange), all-gather={n_ag}, all-reduce={n_ar}")
    assert n_cp > 0, "expected GSPMD halo exchanges for depth-sharded 3-D convs"
    assert n_ar > 0, "expected gradient all-reduce"

    outs = compiled(ev, dv, vq, enc_opt, dec_opt, vol)
    m = outs[-1]
    assert np.isfinite(float(m["total"]))
    print(f"sharded step executed: total={float(m['total']):.4f}, "
          f"recon={float(m['recon']):.4f}")
    print("gspmd ok")


def main():
    if "--tpu" in sys.argv:
        run_tpu()
        return
    from medical_image_editing_tpu.utils.hermetic import cpu_pinned_env, is_cpu_pinned

    if is_cpu_pinned(8):
        run_gspmd()
        return
    env = cpu_pinned_env(8)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env)
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
