"""Edit-latency benchmark (BASELINE.md north-star: p50 per-slice edit latency,
jit-compiled decode at 512²) + batched 32-slice editing throughput. Prints one
JSON line per metric; the driver-facing consolidated line stays in bench.py.

Every phase runs under its own guard: a failing phase loses that one metric
(one truncated stderr line — round 3's int8 OOM dumped a multi-KB XLA
allocation report that flooded the driver's 2KB tail AND threw away the
already-measured p50 metrics; neither can happen again)."""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_editing_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()


def _one_line(exc, limit=160):
    """First line of repr(exc), truncated — XLA errors embed multi-KB dumps."""
    return repr(exc).splitlines()[0][:limit]


def run_edit_benchmarks(budget_s: float = None):
    """Measure + print the editing metrics as JSON lines; returns a
    {metric: value} dict (partial on failures — never raises) so bench.py can
    fold them into its consolidated penultimate line.

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
            print(f"edit bench budget exceeded; skipping {phase}",
                  file=sys.stderr)
            return True
        return False

    def run_phase(name, fn):
        """One metric per phase; a failure costs only that metric."""
        if over_budget(name):
            return
        try:
            value = fn()
        except Exception as e:
            print(f"edit bench phase {name} failed: {_one_line(e)}",
                  file=sys.stderr)
            return
        metrics[name] = value
        print(json.dumps({"metric": name, "value": value,
                          "unit": UNITS[name], "vs_baseline": None}))

    UNITS = {
        "edit_device_ms_512": "ms/slice(device)",
        "edit_device_throughput_batched32_512": "slices/sec/chip(device)",
        "edit_latency_p50_512": "ms/slice",
        "edit_latency_p50_512_uint8": "ms/slice",
        "edit_latency_p50_512_int8": "ms/slice",
        "edit_throughput_batched32_512": "slices/sec/chip",
        "edit_throughput_batched32_512_uint8": "slices/sec/chip",
        "edit_throughput_batched32_512_int8": "slices/sec/chip",
    }

    try:
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
    except Exception as e:  # can't even build — no edit metrics this run
        print(f"edit bench setup failed: {_one_line(e)}", file=sys.stderr)
        return metrics

    rng = np.random.default_rng(0)
    ids1 = jnp.asarray(rng.integers(0, 11, (1, 512, 512)).astype(np.int32))
    ids32 = jnp.asarray(rng.integers(0, 11, (32, 512, 512)).astype(np.int32))

    def latency_p50(**kw):
        """Single-slice p50 (the run_recon hot path, run_recon.py:182-197).
        Device→host transfer included: the edit loop's consumer is a PNG on
        host, and block_until_ready is unreliable on this platform anyway."""
        edit1 = make_batched_edit_fn(dec, is_lung=True, **kw)
        np.asarray(edit1(dec_vars, vq, ids1))  # compile
        lats = []
        for _ in range(30):
            t0 = time.perf_counter()
            out = edit1(dec_vars, vq, ids1)
            np.asarray(out)
            lats.append((time.perf_counter() - t0) * 1000)
        return round(float(np.percentile(lats, 50)), 2)

    def throughput_32(**kw):
        """Batched 32-slice throughput (BASELINE config #3). best-of-3
        repeats: the axon tunnel adds multi-ms scheduling noise that swings a
        single 5-iteration window by ±30%; peak over short windows is the
        stable capacity measure on this environment."""
        edit32 = make_batched_edit_fn(dec, is_lung=True, **kw)
        np.asarray(edit32(dec_vars, vq, ids32))  # compile
        best, n = 0.0, 5
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n):
                out = edit32(dec_vars, vq, ids32)
            # in-order device execution: materializing the last output waits
            # for all
            np.asarray(out)
            best = max(best, n * 32 / (time.perf_counter() - t0))
        return round(best, 1)

    def device_p50(n_chain=20, reps=10, **kw):
        """Device-time per-slice decode (VERDICT r4 weak #3): the wall-clock
        p50 conflates ~45 ms device compute with a ±30% tunnel-RPC tail,
        making rounds incomparable. This chains n_chain decodes inside ONE
        dispatch (`lax.scan` rolled loop — the body executes n_chain times
        on device, no host round trips) and reduces each decode to a scalar,
        so wall/n_chain ≈ device time + RPC/n_chain (<1 ms at n_chain=20).
        Acceptance (VERDICT): consecutive bench runs agree within ~10%."""
        edit1 = make_batched_edit_fn(dec, is_lung=True, **kw)

        def chained(dec_vars, vq_state, ids):
            def body(c, _):
                # thread the carry into the ids (runtime-zero, statically
                # opaque) — without this XLA hoists the loop-invariant
                # decode out of the scan and the "chain" times ONE decode
                ids_dep = ids + (jnp.abs(c) * 1e-30).astype(jnp.int32)
                out = edit1(dec_vars, vq_state, ids_dep)
                return c + jnp.sum(out.astype(jnp.float32)), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_chain)
            return c

        jc = jax.jit(chained)
        assert np.isfinite(float(jc(dec_vars, vq, ids1)))  # compile
        lats = []
        for _ in range(reps):
            t0 = time.perf_counter()
            v = float(jc(dec_vars, vq, ids1))
            lats.append((time.perf_counter() - t0) * 1000 / n_chain)
        assert np.isfinite(v)
        return round(float(np.percentile(lats, 50)), 2)

    def device_throughput_32(n_chain=8, reps=8, **kw):
        """Batched-32 decode, device-time (same chained protocol as
        device_p50; fewer links — each link is 32 slices of work)."""
        edit32 = make_batched_edit_fn(dec, is_lung=True, **kw)

        def chained(dec_vars, vq_state, ids):
            def body(c, _):
                ids_dep = ids + (jnp.abs(c) * 1e-30).astype(jnp.int32)
                out = edit32(dec_vars, vq_state, ids_dep)
                return c + jnp.sum(out.astype(jnp.float32)), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_chain)
            return c

        jc = jax.jit(chained)
        assert np.isfinite(float(jc(dec_vars, vq, ids32)))  # compile
        best = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            v = float(jc(dec_vars, vq, ids32))
            best = max(best, n_chain * 32 / (time.perf_counter() - t0))
        assert np.isfinite(v)
        return round(best, 1)

    run_phase("edit_device_ms_512", lambda: device_p50())
    run_phase("edit_device_throughput_batched32_512",
              lambda: device_throughput_32())

    # serving-path variants: uint8 = on-device [-1,1]→[0,255] quantization
    # (PNG consumers; 4× smaller device→host transfer); int8 = every decoder
    # conv on the MXU's s8×s8→s32 path (ops/quantized_conv.py; VERDICT r2
    # item 6). int8 batched runs microbatch=8 — the monolithic batch-32
    # dispatch OOMs 16 GB HBM (see make_batched_edit_fn docstring).
    run_phase("edit_latency_p50_512", lambda: latency_p50())
    run_phase("edit_latency_p50_512_uint8",
              lambda: latency_p50(output_dtype="uint8"))
    run_phase("edit_latency_p50_512_int8", lambda: latency_p50(quantize="int8"))
    run_phase("edit_throughput_batched32_512", lambda: throughput_32())
    run_phase("edit_throughput_batched32_512_uint8",
              lambda: throughput_32(output_dtype="uint8"))
    run_phase("edit_throughput_batched32_512_int8",
              lambda: throughput_32(quantize="int8", microbatch=8))
    return metrics


def main():
    from medical_image_editing_tpu.utils.device_probe import require_default_backend

    require_default_backend(what="bench_edit.py")
    run_edit_benchmarks()


if __name__ == "__main__":
    main()
