"""Flat-parameter Adam in-situ bench (round-4 optimization candidate #2).

The round-4 profiler trace (PERF.md "Profiler trace") attributes ~14.5
ms/step (7.3%) to 143 tiny bf16[32]/f32[C] per-channel parameter-update and
grad-scalar fusions — each running at fractional VPU-lane occupancy, the
same lane-starvation mechanism the lane-packed InstanceNorm attacks.
`optax.flatten` ravels the parameter pytree once per update so Adam runs on
a single lane-dense f32 vector; the math is elementwise and therefore
exactly unchanged, while ~100 leaf fusions collapse into a few full-lane
ops (cost: one concat + one split of ~2x params HBM traffic per step).

Usage: --step {baseline,flat} runs the flagship first-stage train step
(same harness as tools/bench_instance_norm.py) with MEDIMG_FLAT_OPT set
accordingly. Results recorded in PERF.md ("Flat-parameter Adam").
"""

import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def step(impl):
    os.environ["MEDIMG_FLAT_OPT"] = "1" if impl == "flat" else "0"
    import jax
    import jax.numpy as jnp
    import numpy as np

    from medical_image_editing_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    sys.path.insert(0, HERE)
    from bench_donation import build

    step_fn, state = build()
    jstep = jax.jit(step_fn, donate_argnums=(0,))
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(-1, 1, (8, 256, 256, 1)).astype(np.float32))
    w = jnp.float32(0.0)
    for _ in range(3):
        state, m = jstep(state, image, w)
        assert np.isfinite(float(m["total"]))
    best = 0.0
    for _ in range(3):
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = jstep(state, image, w)
        assert np.isfinite(float(m["total"]))
        best = max(best, n * 8 / (time.perf_counter() - t0))
    print(f"MEDIMG_FLAT_OPT={os.environ['MEDIMG_FLAT_OPT']}: "
          f"{best:.2f} images/s/chip ({8000/best:.1f} ms/step)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step", choices=["baseline", "flat"], required=True)
    args = ap.parse_args()
    step(args.step)


if __name__ == "__main__":
    main()
