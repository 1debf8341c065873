"""InstanceNorm statistics micro/macro benchmark (round-4 optimization).

The round-4 profiler trace (PERF.md "Profiler trace") shows the flagship
step spends ~26% of device time in f32[8,C] InstanceNorm-statistics chains
(802 distinct fusions/step), each running at ~42 GB/s — 5% of HBM peak —
because at C = 16/32 the channel-minor tiled layout occupies 16/128–32/128
VPU lanes (and pads HBM tiles to 128 lanes). The candidate fix keeps the
model math identical but computes the H,W reduction through a
lane-dense (B, H, W·C) view:

    stats:  x.reshape(B,H,W*C) --sum over H--> (B, W*C)   [full 128 lanes]
            .reshape(B,W,C)    --sum over W--> (B, C)     [tiny]

`jnp.var` two-pass becomes E[x²]−E[x]² (single pass over the lane-dense
view); statistics stay f32. Numerics: for post-IN activations (|mean|≲1,
var≈1) the cancellation error is ~1e-7 relative — verified against the
two-pass form in tests/test_models_unet.py::test_instance_norm_lanepacked.

Modes:
  --micro   standalone fwd and fwd+bwd timings of both implementations at
            (8,256,256,C) for C in {16,32}.
  --step    full flagship train step with MEDIMG_IN_IMPL={baseline,lanepacked}
            (in-situ images/s, the number that decides win-or-reject).

Results recorded in PERF.md ("Fused lane-packed InstanceNorm").
"""

import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _force(x):
    import numpy as np

    return float(np.asarray(x).ravel()[0])


def micro():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from medical_image_editing_tpu.models import blocks

    from medical_image_editing_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    B, S = 8, 256
    rng = np.random.default_rng(0)
    for C in (16, 32):
        x = jnp.asarray(rng.normal(size=(B, S, S, C)).astype(np.float32)
                        ).astype(jnp.bfloat16)

        for name, fn in (("baseline", blocks._instance_norm_twopass),
                         ("lanepacked", blocks._instance_norm_lanepacked),
                         ("lanepacked2p", blocks._instance_norm_lanepacked2p)):
            fwd = jax.jit(fn)
            # scalar readout forces the full chain; grad exercises the
            # backward reduction/broadcast structure the train step has
            loss = jax.jit(jax.grad(lambda v: jnp.sum(fn(v).astype(jnp.float32) ** 2)))
            _force(fwd(x)); _force(loss(x))  # compile
            for tag, f in (("fwd", fwd), ("fwd+bwd", loss)):
                n = 50
                t0 = time.perf_counter()
                for _ in range(n):
                    out = f(x)
                _force(out)
                dt = (time.perf_counter() - t0) / n
                gb = x.size * 2 / 1e9
                print(f"C={C:3d} {name:10s} {tag:7s}: {dt*1e6:8.1f} µs  "
                      f"({gb/dt:6.1f} GB/s logical-input)")


def step(impl):
    os.environ["MEDIMG_IN_IMPL"] = impl
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
    print(f"MEDIMG_IN_IMPL={impl}: {best:.2f} images/s/chip "
          f"({8000/best:.1f} ms/step)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--micro", action="store_true")
    ap.add_argument("--step",
                    choices=["baseline", "lanepacked", "lanepacked_cvjp",
                             "lanepacked2p", "lanepacked_shift"])
    args = ap.parse_args()
    if args.micro:
        micro()
    if args.step:
        step(args.step)


if __name__ == "__main__":
    main()
