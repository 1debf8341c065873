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
    # (B, H, W, Cin, Cout): flagship decoder full-res stage + one mid stage
    return [(8, 256, 256, 32, 32), (8, 128, 128, 64, 64), (8, 256, 256, 16, 16)]


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
    import jax
    import jax.numpy as jnp
    import numpy as np

    from medical_image_editing_tpu.ops.conv_pack import conv3x3_packed
    from medical_image_editing_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    rng = np.random.default_rng(0)

    for b, h, w, cin, cout in _shapes():
        x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32)
                        ).astype(jnp.bfloat16)

        def xla_conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        flops = 2 * b * h * w * 9 * cin * cout
        for name, fn in (("xla", jax.jit(xla_conv)),
                         ("packed", jax.jit(conv3x3_packed))):
            out = fn(x, k)
            out.block_until_ready()
            best = float("inf")
            for _ in range(3):
                n = 30
                t0 = time.perf_counter()
                for _ in range(n):
                    out = fn(x, k)
                out.block_until_ready()
                best = min(best, (time.perf_counter() - t0) / n)
            print(f"B{b} {h}x{w} C{cin:3d}->{cout:3d} {name:7s}: "
                  f"{best*1e6:8.1f} µs  {flops/best/1e12:6.1f} TFLOP/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--correct", action="store_true")
    ap.add_argument("--micro", action="store_true")
    args = ap.parse_args()
    if args.correct:
        correct()
    if args.micro:
        micro()
    if not (args.correct or args.micro):
        correct()
        micro()


if __name__ == "__main__":
    main()
