"""Micro-benchmark: lane-packed Pallas 3×3 conv vs XLA's conv emitter.

VERDICT r4 item 2: ops/conv_pack.py landed untested/unmeasured; this bench
closes the measurement half (tests/test_conv_pack.py the correctness half).
Result recorded in PERF.md ("Pallas lane-packed conv").

The shapes are the flagship decoder's full-resolution conv bucket — the
largest remaining trace bucket (27.0 ms fwd + 16.2 ms wgrad of the 185.8 ms
step, PERF.md "Profiler trace"): B=8, 256², C=32→32, bf16, plus the 128²
C=64 stage for scaling context.

Modes:
  --correct   on-chip correctness vs lax.conv at the flagship shape
  --micro     fwd timings: conv3x3_packed vs lax.conv_general_dilated
"""

import argparse
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def _shapes():
    # (B, H, W, Cin, Cout): flagship decoder full-res stage + one mid stage.
    # (C=16 needs an 8-pixel packing — 4·16 = 64 lanes is below the 128-lane
    # tile Mosaic can slice; not built until the C=32 case shows a win.)
    return [(8, 256, 256, 32, 32), (8, 128, 128, 64, 64)]


def correct():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from medical_image_editing_tpu.ops.conv_pack import conv3x3_packed

    rng = np.random.default_rng(0)
    for b, h, w, cin, cout in _shapes():
        x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        want = np.asarray(jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32))
        got = np.asarray(conv3x3_packed(x, k), np.float32)
        err = np.max(np.abs(got - want)) / max(np.max(np.abs(want)), 1e-6)
        print(f"B{b} {h}x{w} C{cin}->{cout}: max rel err vs lax.conv = {err:.2e}")
        assert err < 2e-2, err


def micro():
    """Chained-dependency device timing: x_{i+1} = conv(x_i) inside one
    `lax.scan` dispatch (`block_until_ready` does not reliably block through
    the axon tunnel — bench.py header), scalar-forced; wall/n_chain ≈ device
    time + RPC/n_chain."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from medical_image_editing_tpu.ops.conv_pack import conv3x3_packed
    from medical_image_editing_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)
    n_chain = 50

    for b, h, w, cin, cout in _shapes():
        assert cin == cout, "chained protocol needs cin == cout"
        x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        # scale keeps the chained activations bounded (timing-irrelevant)
        k = (jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32))
             * (0.3 / (3.0 * np.sqrt(cin)))).astype(jnp.bfloat16)

        def xla_conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        flops = 2 * b * h * w * 9 * cin * cout
        for name, fn in (("xla", xla_conv), ("packed", conv3x3_packed)):
            def chained(x, k, fn=fn):
                def body(c, _):
                    return fn(c, k), None
                out, _ = jax.lax.scan(body, x, None, length=n_chain)
                return jnp.sum(out.astype(jnp.float32))

            jc = jax.jit(chained)
            v = float(jc(x, k))  # compile + execute once
            assert np.isfinite(v), (name, v)
            best = float("inf")
            for _ in range(5):
                t0 = time.perf_counter()
                float(jc(x, k))
                best = min(best, (time.perf_counter() - t0) / n_chain)
            print(f"B{b} {h}x{w} C{cin:3d}->{cout:3d} {name:7s}: "
                  f"{best*1e6:8.1f} µs  {flops/best/1e12:6.1f} TFLOP/s")


def step(impl):
    """In-situ flagship train-step A/B (same harness as
    tools/bench_instance_norm.py --step): MEDIMG_CONV_IMPL={xla,packed}."""
    os.environ["MEDIMG_CONV_IMPL"] = impl
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
    print(f"MEDIMG_CONV_IMPL={impl}: {best:.2f} images/s/chip "
          f"({8000/best:.1f} ms/step)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--correct", action="store_true")
    ap.add_argument("--micro", action="store_true")
    ap.add_argument("--step", choices=["xla", "packed"])
    args = ap.parse_args()
    if args.correct:
        correct()
    if args.micro:
        micro()
    if args.step:
        step(args.step)
    if not (args.correct or args.micro or args.step):
        correct()
        micro()


if __name__ == "__main__":
    main()
