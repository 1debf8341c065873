"""Fine-grained buffer-donation experiment on the first-stage step.

History: until the 2026-08 host upgrade, this environment's PJRT plugin raised
`INVALID_ARGUMENT: TPU backend error` on `jax.jit(step, donate_argnums=(0,))`
over the FULL TrainState; variant C isolated the hypothesis that the small/odd
leaves (int32 scalars, typed PRNG key) were the trigger. Post-upgrade, B
passes, and donation is wired into the trainer/bench by default
(`run.donate_buffers`). This tool remains the canary: re-run it after any
runtime change before trusting the default.

Variants:
  A  baseline              no donation
  B  donate full state     the production configuration
  C  donate big subtree    enc/dec vars + VQ buffers + both Adam states only

Donation saves an HBM copy of every donated buffer per step (~2×params of
write traffic) — bounded at a few ms for this model, but free if it works.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from medical_image_editing_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

BATCH, SIZE = 8, 256
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

    enc = EncoderWithVQ(filters=(16, 32, 64, 128, 256), dict_size=10,
                        momentum=0.999, dtype=jnp.bfloat16)
    dec = UNetDecoder(
        out_channels=1, filters=(32, 64, 128, 256, 512),
        dropped_skip_layers=(), use_pixel_shuffle=False, dtype=jnp.bfloat16,
    )
    with jax.default_device(jax.devices("cpu")[0]):
        x0 = jnp.zeros((BATCH, SIZE, SIZE, 1), jnp.float32)
        enc_vars, vq = enc.init(jax.random.key(0), x0)
        q0, *_ = enc(enc_vars, vq, x0, train=False)
        dec_vars = dec.init(
            {"params": jax.random.key(1), "dropblock": jax.random.key(2)}, q0,
            train=False,
        )
    enc_vars, vq, dec_vars = jax.device_put((enc_vars, vq, dec_vars), jax.devices()[0])
    enc_tx, dec_tx = make_optimizer(1e-4), make_optimizer(1e-4)
    state = create_train_state(jax.random.key(3), enc_vars, dec_vars, vq, enc_tx, dec_tx)
    step_fn = make_first_stage_step(
        enc, dec, enc_tx, dec_tx, loss_cfg=FirstStageLossConfig(margin=0.5),
        aug_cfg=AUG, dict_size=10,
    )
    return step_fn, state


def time_loop(run_one, carry, n=10, windows=3):
    """Best-of-N windows (same policy as bench.py): the axon tunnel adds
    multi-second scheduling stalls that poison any single window.

    `run_one(carry) -> (carry, total_loss)` over an opaque carry, so the same
    timing/warmup/assert policy serves the full-state AND split variants."""
    carry, total = run_one(carry)
    assert np.isfinite(float(total))
    best = float("inf")
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n):
            carry, total = run_one(carry)
        assert np.isfinite(float(total))
        best = min(best, (time.perf_counter() - t0) / n * 1000.0)
    return best


def fresh_state(state):
    """Distinct-buffer copy of every leaf, so each variant runs on live
    arrays even after a previous variant donated (and thus deleted) its
    input buffers."""
    from medical_image_editing_tpu.train.state import unshare_buffers

    return unshare_buffers(state)


def main():
    step_fn, state = build()
    rng = np.random.default_rng(0)
    image = jnp.asarray(rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 1)).astype(np.float32))
    w = jnp.float32(0.0)

    # A: baseline
    jstep = jax.jit(step_fn)

    def run_a(s):
        s, m = jstep(s, image, w)
        return s, m["total"]

    dt = time_loop(run_a, fresh_state(state))
    print(f"A no-donation            {dt:8.2f} ms  ({BATCH / dt * 1000:.2f} img/s)")

    # B: full-state donation (the production configuration). Runs on its own
    # copy of the state: donation deletes its input buffers, so later variants
    # must never see B's arrays.
    try:
        jfull = jax.jit(step_fn, donate_argnums=(0,))

        def run_b(s):
            s, m = jfull(s, image, w)
            return s, m["total"]

        dt = time_loop(run_b, fresh_state(state))
        print(f"B donate full state      {dt:8.2f} ms  ({BATCH / dt * 1000:.2f} img/s)")
    except Exception as e:
        print(f"B donate full state      FAILED: {type(e).__name__}: {str(e)[:160]}")

    # C: donate only the big float leaves. Int leaves (optax `count` scalars,
    # step/epoch) and the typed PRNG key are carried undonated — tiny, and
    # int32[] constants can share one cached device buffer, so donating them
    # twice raises "Array has been deleted".
    def _is_big(x):
        return hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) and x.ndim > 0

    try:
        c_state = fresh_state(state)  # live + unaliased buffers for donation
        leaves, treedef = jax.tree.flatten(c_state)
        big_mask = [_is_big(l) for l in leaves]

        def split_step(big, small, image, w):
            it_b, it_s = iter(big), iter(small)
            merged = [next(it_b) if m else next(it_s) for m in big_mask]
            s = jax.tree.unflatten(treedef, merged)
            ns, m = step_fn(s, image, w)
            out = jax.tree.leaves(ns)
            big2 = [l for l, mk in zip(out, big_mask) if mk]
            small2 = [l for l, mk in zip(out, big_mask) if not mk]
            return big2, small2, m

        jsplit = jax.jit(split_step, donate_argnums=(0,))
        big = [l for l, mk in zip(leaves, big_mask) if mk]
        small = [l for l, mk in zip(leaves, big_mask) if not mk]

        def run_c(carry):
            big, small = carry
            big, small, m = jsplit(big, small, image, w)
            return (big, small), m["total"]

        dt = time_loop(run_c, (big, small))
        print(f"C donate big subtree     {dt:8.2f} ms  ({BATCH / dt * 1000:.2f} img/s)")
    except Exception as e:
        print(f"C donate big subtree     FAILED: {type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()
