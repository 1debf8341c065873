"""Benchmark harness — prints one JSON line per metric (headline metric LAST).

North-star metric (BASELINE.md): VQ-WNet first-stage training images/sec/chip
at 256², batch 8, flagship config (enc [16,32,64,128,256], dec
[32,64,128,256,512], dict_size 10). `vs_baseline` compares against the
CPU-baseline images/sec measured once on this container's host CPU
(BASELINE.json target: >10× CPU baseline on TPU). Also emits the editing
north-star metrics (BASELINE.md row 3): p50 single-slice edit latency @512²
and batched 32-slice editing throughput.

Timing note: `jax.block_until_ready` does not reliably block on this
environment's axon-tunneled TPU; every measurement forces a device→host
value transfer that depends on the whole step chain instead.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compile cache: the axon tunnel makes TPU compiles minutes-slow on
# bad days; cached executables keep the whole bench inside the driver window.
from medical_image_editing_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

# Measured once with the CPU backend on this container (single core):
# first-stage train step, 256², batch 8, flagship config → 150.4 s/step.
CPU_BASELINE_IMGS_PER_SEC = 0.053

IMAGE_SIZE = 256
BATCH = 8
AUG = {
    "modules": ["RandomHorizontalFlip", "RandomAffine", "RandomGaussianNoise"],
    "RandomHorizontalFlip": {"p": 0.5},
    "RandomAffine": {"degrees": 5.0, "translate": [0.02, 0.02], "p": 0.8},
    "RandomGaussianNoise": {"std": 0.03, "p": 0.5},
}


def build():
    from medical_image_editing_tpu.models import UNetDecoder
    from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ
    from medical_image_editing_tpu.train import create_train_state, make_first_stage_step
    from medical_image_editing_tpu.train.first_stage import FirstStageLossConfig
    from medical_image_editing_tpu.train.state import make_optimizer

    import jax.numpy as jnp

    # bfloat16 compute (params float32) — TPU MXU rate doubles, HBM traffic halves
    enc = EncoderWithVQ(filters=(16, 32, 64, 128, 256), dict_size=10,
                        momentum=0.999, dtype=jnp.bfloat16)
    dec = UNetDecoder(
        out_channels=1,
        filters=(32, 64, 128, 256, 512),
        dropped_skip_layers=(),
        use_pixel_shuffle=False,
        dtype=jnp.bfloat16,
    )
    # init on the host CPU: these one-shot tracing/compile round trips are
    # latency-bound through the axon tunnel; the params transfer to the TPU
    # automatically at the first step dispatch
    with jax.default_device(jax.devices("cpu")[0]):
        x0 = jnp.zeros((BATCH, IMAGE_SIZE, IMAGE_SIZE, 1), jnp.float32)
        enc_vars, vq = enc.init(jax.random.key(0), x0)
        q, *_ = enc(enc_vars, vq, x0, train=False)
        dec_vars = dec.init(
            {"params": jax.random.key(1), "dropblock": jax.random.key(2)}, q,
            train=False,
        )
    enc_vars, vq, dec_vars = jax.device_put(
        (enc_vars, vq, dec_vars), jax.devices()[0]
    )
    enc_tx, dec_tx = make_optimizer(1e-4), make_optimizer(1e-4)
    state = create_train_state(jax.random.key(3), enc_vars, dec_vars, vq, enc_tx, dec_tx)
    # Buffer donation: supported since the 2026-08 host PJRT upgrade (the old
    # plugin raised INVALID_ARGUMENT — tools/bench_donation.py tracks this).
    # The state must be unshared once so no two leaves alias one buffer.
    from medical_image_editing_tpu.train.state import unshare_buffers

    state = unshare_buffers(state)
    step = jax.jit(
        make_first_stage_step(
            enc,
            dec,
            enc_tx,
            dec_tx,
            loss_cfg=FirstStageLossConfig(margin=0.5),
            aug_cfg=AUG,
            dict_size=10,
        ),
        donate_argnums=(0,),
    )
    return state, step


def main():
    import sys

    # A downed axon tunnel makes PJRT plugin init block forever; fail loudly
    # within a bounded budget instead of hanging with no output.
    from medical_image_editing_tpu.utils.device_probe import require_default_backend

    platform = require_default_backend(what="bench.py")
    print(f"default backend: {platform}", file=sys.stderr, flush=True)

    edit_metrics = {}
    try:
        from bench_edit import run_edit_benchmarks

        # run_edit_benchmarks guards each phase internally and returns the
        # partial dict; this outer guard only covers import/setup surprises.
        edit_metrics = run_edit_benchmarks() or {}
    except Exception as e:  # edit metrics are additive — never break the headline
        msg = repr(e).splitlines()[0][:160]  # XLA errors embed multi-KB dumps
        print(f"edit benchmarks failed: {msg}", file=sys.stderr)

    state, step = build()
    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.uniform(-1, 1, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 1)).astype(np.float32)
    )

    # warmup / compile (and validate the value actually materializes); several
    # forced steps — on slow-tunnel days the first dispatches after the
    # compile still carry executable-load/transfer latency
    for _ in range(3):
        state, metrics = step(state, image, jnp.float32(0.0))
        assert np.isfinite(float(metrics["total"]))

    # best-of-3 windows: the axon tunnel adds multi-second scheduling stalls
    # that poison a single window; peak over short windows is the stable
    # capacity measure (same policy as bench_edit.py)
    n_iters = 10
    imgs_per_sec = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state, metrics = step(state, image, jnp.float32(0.0))
        # metrics of the last step depends on the full feedback chain; forcing
        # its value is the only reliable completion barrier on this platform
        assert np.isfinite(float(metrics["total"]))
        dt = time.perf_counter() - t0
        imgs_per_sec = max(imgs_per_sec, n_iters * BATCH / dt)
    # consolidated penultimate line: the driver records only the output tail,
    # so every metric must survive in the last ~2KB (the per-metric lines
    # above can scroll out behind XLA warnings)
    all_metrics = dict(edit_metrics)
    all_metrics["vqwnet_train_images_per_sec_per_chip_256"] = round(imgs_per_sec, 2)
    print(
        json.dumps(
            {"metric": "all_metrics", "value": all_metrics, "unit": "mixed",
             "vs_baseline": None}
        )
    )
    print(
        json.dumps(
            {
                "metric": "vqwnet_train_images_per_sec_per_chip_256",
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / CPU_BASELINE_IMGS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
