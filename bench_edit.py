"""Edit-latency benchmark (BASELINE.md north-star: p50 per-slice edit latency,
jit-compiled decode at 512²) + batched 32-slice editing throughput. Prints two
JSON lines; the driver-facing single-line benchmark stays in bench.py."""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_editing_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def run_edit_benchmarks(budget_s: float = None):
    """Measure + print the editing metrics as JSON lines; returns a
    {metric: value} dict so bench.py can fold them into its consolidated
    penultimate line (the driver captures only the output tail).

    budget_s (or MEDIMG_BENCH_EDIT_BUDGET, default 1200 s): soft deadline —
    remaining edit phases are skipped once exceeded so the headline training
    metric in bench.py always gets its turn inside the driver's window
    (compiles through the device tunnel can take minutes on bad days)."""
    import os

    if budget_s is None:
        budget_s = float(os.environ.get("MEDIMG_BENCH_EDIT_BUDGET", 1200))
    t_start = time.perf_counter()

    metrics = {}

    def over_budget(phase):
        if time.perf_counter() - t_start > budget_s:
            import sys

            print(f"edit bench budget exceeded; skipping {phase}",
                  file=sys.stderr)
            return True
        return False
    from medical_image_editing_tpu.cli.edit_batch import make_batched_edit_fn
    from medical_image_editing_tpu.models import UNetDecoder
    from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ

    enc = EncoderWithVQ(filters=(16, 32, 64, 128, 256), dict_size=10,
                        momentum=0.999, dtype=jnp.bfloat16)
    dec = UNetDecoder(out_channels=1, filters=(32, 64, 128, 256, 512),
                      dropped_skip_layers=(), use_pixel_shuffle=False,
                      dtype=jnp.bfloat16)
    # init on host CPU — avoids one-shot compile RPCs through the tunnel —
    # then commit the params to the accelerator explicitly
    with jax.default_device(jax.devices("cpu")[0]):
        x0 = jnp.zeros((1, 512, 512, 1), jnp.float32)
        enc_vars, vq = enc.init(jax.random.key(0), x0)
        q, *_ = enc(enc_vars, vq, x0, train=False)
        dec_vars = dec.init({"params": jax.random.key(1),
                             "dropblock": jax.random.key(2)}, q, train=False)
    dev = jax.devices()[0]
    dec_vars, vq = jax.device_put((dec_vars, vq), dev)

    rng = np.random.default_rng(0)

    # single-slice p50 latency (the run_recon hot path, run_recon.py:182-197)
    edit1 = make_batched_edit_fn(dec, is_lung=True)
    ids1 = jnp.asarray(rng.integers(0, 11, (1, 512, 512)).astype(np.int32))
    np.asarray(edit1(dec_vars, vq, ids1))  # compile
    lats = []
    for _ in range(30):
        t0 = time.perf_counter()
        out = edit1(dec_vars, vq, ids1)
        # device→host transfer included: the edit loop's consumer is a PNG on
        # host, and block_until_ready is unreliable on this platform anyway
        np.asarray(out)
        lats.append((time.perf_counter() - t0) * 1000)
    p50 = float(np.percentile(lats, 50))
    metrics["edit_latency_p50_512"] = round(p50, 2)
    print(json.dumps({"metric": "edit_latency_p50_512", "value": round(p50, 2),
                      "unit": "ms/slice", "vs_baseline": None}))

    # serving-path latency: uint8 on-device quantization (PNG consumers) —
    # 4× smaller device→host transfer
    if over_budget("uint8 latency + batched throughput"):
        return metrics
    edit1_u8 = make_batched_edit_fn(dec, is_lung=True, output_dtype="uint8")
    np.asarray(edit1_u8(dec_vars, vq, ids1))  # compile
    lats = []
    for _ in range(30):
        t0 = time.perf_counter()
        out = edit1_u8(dec_vars, vq, ids1)
        np.asarray(out)
        lats.append((time.perf_counter() - t0) * 1000)
    p50u = float(np.percentile(lats, 50))
    metrics["edit_latency_p50_512_uint8"] = round(p50u, 2)
    print(json.dumps({"metric": "edit_latency_p50_512_uint8",
                      "value": round(p50u, 2),
                      "unit": "ms/slice", "vs_baseline": None}))

    # int8 serving decode (VERDICT r2 item 6): every decoder conv on the
    # MXU's s8×s8→s32 path (ops/quantized_conv.py); v5e's int8 MXU rate is
    # ~2× bf16, accuracy cost pinned in tests/test_quantized_conv.py.
    if over_budget("int8 latency"):
        return metrics
    edit1_i8 = make_batched_edit_fn(dec, is_lung=True, quantize="int8")
    np.asarray(edit1_i8(dec_vars, vq, ids1))  # compile
    lats = []
    for _ in range(30):
        t0 = time.perf_counter()
        out = edit1_i8(dec_vars, vq, ids1)
        np.asarray(out)
        lats.append((time.perf_counter() - t0) * 1000)
    p50i = float(np.percentile(lats, 50))
    metrics["edit_latency_p50_512_int8"] = round(p50i, 2)
    print(json.dumps({"metric": "edit_latency_p50_512_int8",
                      "value": round(p50i, 2),
                      "unit": "ms/slice", "vs_baseline": None}))

    # batched 32-slice editing throughput (BASELINE config #3).
    # best-of-3 repeats: the axon tunnel adds multi-ms scheduling noise that
    # swings a single 5-iteration window by ±30%; peak over short windows is
    # the stable capacity measure on this environment.
    if over_budget("batched throughput"):
        return metrics
    edit32 = make_batched_edit_fn(dec, is_lung=True)
    ids32 = jnp.asarray(rng.integers(0, 11, (32, 512, 512)).astype(np.int32))
    np.asarray(edit32(dec_vars, vq, ids32))
    best = 0.0
    n = 5
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = edit32(dec_vars, vq, ids32)
        # in-order device execution: materializing the last output waits for all
        np.asarray(out)
        dt = time.perf_counter() - t0
        best = max(best, n * 32 / dt)
    metrics["edit_throughput_batched32_512"] = round(best, 1)
    print(json.dumps({"metric": "edit_throughput_batched32_512",
                      "value": round(best, 1),
                      "unit": "slices/sec/chip", "vs_baseline": None}))

    # uint8 serving variant (PNG/display consumers): 4× less host transfer
    if over_budget("batched uint8 throughput"):
        return metrics
    edit32_u8 = make_batched_edit_fn(dec, is_lung=True, output_dtype="uint8")
    np.asarray(edit32_u8(dec_vars, vq, ids32))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = edit32_u8(dec_vars, vq, ids32)
        np.asarray(out)
        dt = time.perf_counter() - t0
        best = max(best, n * 32 / dt)
    metrics["edit_throughput_batched32_512_uint8"] = round(best, 1)
    print(json.dumps({"metric": "edit_throughput_batched32_512_uint8",
                      "value": round(best, 1),
                      "unit": "slices/sec/chip", "vs_baseline": None}))

    # batched int8 throughput (compute-bound regime — where the s8 MXU rate
    # actually shows, if it shows; single-slice is transfer/dispatch-heavy)
    if over_budget("batched int8 throughput"):
        return metrics
    edit32_i8 = make_batched_edit_fn(dec, is_lung=True, quantize="int8")
    np.asarray(edit32_i8(dec_vars, vq, ids32))
    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = edit32_i8(dec_vars, vq, ids32)
        np.asarray(out)
        dt = time.perf_counter() - t0
        best = max(best, n * 32 / dt)
    metrics["edit_throughput_batched32_512_int8"] = round(best, 1)
    print(json.dumps({"metric": "edit_throughput_batched32_512_int8",
                      "value": round(best, 1),
                      "unit": "slices/sec/chip", "vs_baseline": None}))
    return metrics


def main():
    from medical_image_editing_tpu.utils.device_probe import require_default_backend

    require_default_backend(what="bench_edit.py")
    run_edit_benchmarks()


if __name__ == "__main__":
    main()
