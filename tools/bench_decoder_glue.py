"""Decoder glue ablations on the real TPU (VERDICT r1 #5).

Measures the flagship decoder's fwd+bwd (params AND input grads, x2 views,
bf16, 256(2), batch 8) with the norm "glue" selectively disabled, to bound
what a fused Pallas StyledResUpBlock-interior kernel could save:

  full            — as trained
  no-IN           — instance_norm -> identity (ResBlock + StyledResUpBlock
                    residual branch + ASPP)
  no-BN           — StyledDenorm's param-free BatchNorm -> identity
  no-IN-no-BN     — both

Also re-tests buffer donation on the full train step (r1 blamed the PJRT
plugin for an InvalidArgument; environments change).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_decoder_glue.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 8
SIZE = 256


def timed(fn, *args, iters=20, warmup=2):
    jfn = jax.jit(fn)
    for _ in range(warmup):
        out = jfn(*args)
    _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters * 1000.0


def _force(out):
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(jax.device_get(jnp.sum(leaf)))


def _tree_probe(tree):
    acc = jnp.float32(0.0)
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            acc = acc + leaf.reshape(-1)[0].astype(jnp.float32)
    return acc * 0.0


def build_decoder():
    from medical_image_editing_tpu.models import UNetDecoder

    return UNetDecoder(
        out_channels=1, filters=(32, 64, 128, 256, 512),
        dropped_skip_layers=(), use_pixel_shuffle=False, dtype=jnp.bfloat16,
    )


def bench_decoder(tag, q):
    dec = build_decoder()
    dec_vars = dec.init(
        {"params": jax.random.key(1), "dropblock": jax.random.key(2)}, q,
        train=False,
    )
    extra = {k: v for k, v in dec_vars.items() if k != "params"}
    mut = list(extra.keys())

    def loss(p, qq):
        dv = {"params": p, **extra}
        r1, _ = dec.apply(dv, qq, True, 0.0, mutable=mut,
                          rngs={"dropblock": jax.random.key(0)})
        r2, _ = dec.apply(dv, qq, True, 0.0, mutable=mut,
                          rngs={"dropblock": jax.random.key(1)})
        return jnp.mean(r1.astype(jnp.float32) ** 2) + jnp.mean(
            r2.astype(jnp.float32) ** 2
        )

    def fb(p, qq):
        v, g = jax.value_and_grad(loss, argnums=(0, 1))(p, qq)
        return v + _tree_probe(g)

    ms = timed(fb, dec_vars["params"], q)
    print(f"{tag:28s} {ms:8.2f} ms")
    return ms


def main():
    from medical_image_editing_tpu.models import blocks
    from flax import linen as nn

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(BATCH, SIZE, SIZE, 16)), jnp.bfloat16)

    base = bench_decoder("full", q)

    real_in = blocks.instance_norm
    blocks.instance_norm = lambda x, eps=1e-5: x
    no_in = bench_decoder("no instance_norm", q)
    blocks.instance_norm = real_in

    class IdentityBN(nn.Module):
        @nn.compact
        def __call__(self, x):
            return x

    real_bn = nn.BatchNorm

    class NoBN:
        def __init__(self, *a, **k):
            pass

        def __call__(self, x):
            return x

    # StyledDenorm resolves nn.BatchNorm at call time
    import flax.linen as fl

    def fake_bn(*a, **k):
        return lambda x: x

    fl_bn = fl.BatchNorm
    fl.BatchNorm = fake_bn
    blocks.nn.BatchNorm = fake_bn
    no_bn = bench_decoder("no SPADE BatchNorm", q)
    blocks.instance_norm = lambda x, eps=1e-5: x
    neither = bench_decoder("no IN + no BN", q)
    blocks.instance_norm = real_in
    fl.BatchNorm = fl_bn
    blocks.nn.BatchNorm = fl_bn

    print(f"\nglue bound: IN {base - no_in:.2f} ms, BN {base - no_bn:.2f} ms, "
          f"both {base - neither:.2f} ms ({(base - neither) / base * 100:.1f}% of decoder)")

    # ---- buffer donation retry on the full step ---------------------------
    from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ
    from medical_image_editing_tpu.train import (
        create_train_state, make_first_stage_step,
    )
    from medical_image_editing_tpu.train.first_stage import FirstStageLossConfig
    from medical_image_editing_tpu.train.state import make_optimizer

    AUG = {
        "modules": ["RandomHorizontalFlip", "RandomAffine", "RandomGaussianNoise"],
        "RandomHorizontalFlip": {"p": 0.5},
        "RandomAffine": {"degrees": 5.0, "translate": [0.02, 0.02], "p": 0.8},
        "RandomGaussianNoise": {"std": 0.03, "p": 0.5},
    }
    enc = EncoderWithVQ(filters=(16, 32, 64, 128, 256), dict_size=10,
                        momentum=0.999, dtype=jnp.bfloat16)
    dec = build_decoder()
    x0 = jnp.zeros((BATCH, SIZE, SIZE, 1), jnp.float32)
    enc_vars, vq = enc.init(jax.random.key(0), x0)
    q0, *_ = enc(enc_vars, vq, x0, train=False)
    dec_vars = dec.init(
        {"params": jax.random.key(1), "dropblock": jax.random.key(2)}, q0,
        train=False,
    )
    enc_tx, dec_tx = make_optimizer(1e-4), make_optimizer(1e-4)
    state = create_train_state(jax.random.key(3), enc_vars, dec_vars, vq,
                               enc_tx, dec_tx)
    step_fn = make_first_stage_step(
        enc, dec, enc_tx, dec_tx, loss_cfg=FirstStageLossConfig(margin=0.5),
        aug_cfg=AUG, dict_size=10,
    )
    image = jnp.asarray(
        rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 1)).astype(np.float32)
    )

    for donate, tag in ((None, "step no-donation"), ((0,), "step donate state")):
        try:
            kw = {"donate_argnums": donate} if donate else {}
            jstep = jax.jit(step_fn, **kw)
            st = state
            st, m = jstep(st, image, jnp.float32(0.0))
            assert np.isfinite(float(m["total"]))
            n = 20
            t0 = time.perf_counter()
            for _ in range(n):
                st, m = jstep(st, image, jnp.float32(0.0))
            assert np.isfinite(float(m["total"]))
            dt = (time.perf_counter() - t0) / n * 1000.0
            print(f"{tag:28s} {dt:8.2f} ms  ({BATCH / dt * 1000:.2f} img/s)")
        except Exception as e:
            print(f"{tag:28s} FAILED: {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
