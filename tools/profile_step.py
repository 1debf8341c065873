"""Per-section profile of the flagship first-stage step (VERDICT r1 item 2).

Times each sub-computation of the 256²/batch-8 training step standalone
(fwd+bwd where it is differentiated in the real step), plus end-to-end
ablations, to account for the step's full wall time. Run on the TPU:

    python tools/profile_step.py

Prints a markdown table for PERF.md.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

BATCH, SIZE, C_EMB, K = 8, 256, 16, 10


def _force(out):
    """jax.block_until_ready does NOT reliably block on the axon-tunneled TPU
    in this environment — force a real device→host transfer instead. The
    device executes in order, so materializing one leaf of the LAST output
    waits for every op enqueued before it."""
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf)


def timeit(fn, *args, iters=30, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    if out is not None:
        _force(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _force(out)
    return (time.perf_counter() - t0) / iters * 1000.0  # ms


def main():
    from bench import AUG, build

    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 1)).astype(np.float32)
    )

    rows = []

    # ---- end-to-end baseline ----
    state, step = build()
    full_ms = timeit(step, state, image, jnp.float32(0.0))
    rows.append(("full step (end-to-end)", full_ms))

    # ---- buffer donation retry ----
    try:
        from medical_image_editing_tpu.train import make_first_stage_step
        from medical_image_editing_tpu.train.first_stage import FirstStageLossConfig
        from medical_image_editing_tpu.train.state import make_optimizer
        from medical_image_editing_tpu.models import UNetDecoder
        from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ

        enc = EncoderWithVQ(filters=(16, 32, 64, 128, 256), dict_size=K,
                            momentum=0.999, dtype=jnp.bfloat16)
        dec = UNetDecoder(out_channels=1, filters=(32, 64, 128, 256, 512),
                          dropped_skip_layers=(), use_pixel_shuffle=False,
                          dtype=jnp.bfloat16)
        enc_tx, dec_tx = make_optimizer(1e-4), make_optimizer(1e-4)
        raw = make_first_stage_step(
            enc, dec, enc_tx, dec_tx,
            loss_cfg=FirstStageLossConfig(margin=0.5), aug_cfg=AUG, dict_size=K,
        )
        donated = jax.jit(raw, donate_argnums=(0,))
        st2 = jax.tree.map(jnp.copy, state)
        st2, m = donated(st2, image, jnp.float32(0.0))  # compile
        float(m["total"])
        t0 = time.perf_counter()
        for _ in range(30):
            st2, m = donated(st2, image, jnp.float32(0.0))
        float(m["total"])
        rows.append(("full step, donate_argnums=(0,)", (time.perf_counter() - t0) / 30 * 1000))
    except Exception as e:
        rows.append((f"donation FAILED: {type(e).__name__}: {str(e)[:90]}", float("nan")))

    # ---- standalone components (shapes as in the real step) ----
    from medical_image_editing_tpu.ops.losses import (
        embedding_loss,
        focal_frequency_loss,
    )
    from medical_image_editing_tpu.ops.augment import (
        forward_transform,
        random_transform,
        reverse_transform,
    )
    from medical_image_editing_tpu.ops.onehot import one_hot

    emb = jnp.asarray(rng.normal(size=(BATCH, SIZE, SIZE, C_EMB)).astype(np.float32))
    oh = jax.nn.one_hot(
        jnp.asarray(rng.integers(0, K, (BATCH, SIZE, SIZE))), K, dtype=jnp.float32
    )
    cb = jnp.asarray(rng.normal(size=(K, C_EMB)).astype(np.float32))

    def embed_loss_total(e1, e2, cbk):
        lc, ld, lr = embedding_loss(e1, oh, e2, oh, cbk, margin=0.5)
        return lc + ld + lr

    g_embed = jax.jit(jax.grad(embed_loss_total, argnums=(0, 1, 2)))
    rows.append(("embed loss fwd+bwd (×1, symmetric pair)", timeit(g_embed, emb, emb, cb)))

    def freq_pair(r1, c1):
        return focal_frequency_loss(r1, c1)

    img1 = jnp.asarray(rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 1)).astype(np.float32))
    g_freq = jax.jit(jax.grad(freq_pair))
    rows.append(("focal-freq loss fwd+bwd (×1 of 2)", timeit(g_freq, img1, image)))

    # augmentation: 2 views
    def aug2(k, x):
        n1, c1, m1 = random_transform(jax.random.fold_in(k, 0), x, AUG)
        n2, c2, m2 = random_transform(jax.random.fold_in(k, 1), x, AUG)
        return n1 + n2 + c1 + c2, m1, m2

    rows.append(("augmentation (2 views)", timeit(jax.jit(aug2), jax.random.key(0), image)))

    # id warp round trip ×2 + one-hot ×2
    _, m1, m2 = jax.jit(aug2)(jax.random.key(0), image)
    ids = jnp.asarray(rng.integers(0, K + 1, (BATCH, SIZE, SIZE)).astype(np.int32))

    def warps(ids_, m1_, m2_):
        r1 = forward_transform(reverse_transform(ids_, m1_), m2_)
        r2 = forward_transform(reverse_transform(ids_, m2_), m1_)
        return one_hot(r1, K + 1)[..., 1:], one_hot(r2, K + 1)[..., 1:]

    rows.append(("id warp round-trip ×2 + one-hot ×2", timeit(jax.jit(warps), ids, m1, m2)))

    # optimizer update standalone (enc+dec trees, adam)
    from medical_image_editing_tpu.train.state import make_optimizer as mo
    import optax

    enc_tx2, dec_tx2 = mo(1e-4), mo(1e-4)
    enc_p = state.enc_vars["params"]
    dec_p = state.dec_vars["params"]
    enc_o = enc_tx2.init(enc_p)
    dec_o = dec_tx2.init(dec_p)

    def opt_update(ep, dp, eo, do, eg, dg):
        eu, eo2 = enc_tx2.update(eg, eo, ep)
        du, do2 = dec_tx2.update(dg, do, dp)
        return optax.apply_updates(ep, eu), optax.apply_updates(dp, du), eo2, do2

    g_enc = jax.tree.map(jnp.ones_like, enc_p)
    g_dec = jax.tree.map(jnp.ones_like, dec_p)
    rows.append(
        ("optimizer update (2 Adams, standalone)",
         timeit(jax.jit(opt_update), enc_p, dec_p, enc_o, dec_o, g_enc, g_dec))
    )

    # VQ assign+EMA ×2 standalone
    from medical_image_editing_tpu.ops.vq import vq_apply

    def vq2(vqs, e):
        q1, c1, i1, vq1 = vq_apply(vqs, e, train=True)
        q2, c2, i2, vq2_ = vq_apply(vq1, e, train=True)
        return q1 + q2, vq2_

    try:
        rows.append(("VQ assign+EMA ×2 (standalone)", timeit(jax.jit(vq2), state.vq, emb)))
    except Exception as e:
        rows.append((f"vq standalone skipped: {str(e)[:60]}", float("nan")))

    # ---- end-to-end ablations (marginal costs under fusion) ----
    def build_step(**kw):
        cfg = dict(margin=0.5)
        cfg.update(kw)
        return jax.jit(
            make_first_stage_step(
                enc, dec, enc_tx, dec_tx,
                loss_cfg=FirstStageLossConfig(**cfg), aug_cfg=AUG, dict_size=K,
            )
        )

    abl = build_step(use_frequency_loss=False)
    rows.append(("ablation: no focal-freq loss", timeit(abl, state, image, jnp.float32(0.0))))
    abl = build_step(use_distance_loss=False, use_regularization_loss=False)
    rows.append(("ablation: no dist/reg loss", timeit(abl, state, image, jnp.float32(0.0))))

    print(f"\n| Section | ms |")
    print("|---|---|")
    for name, ms in rows:
        print(f"| {name} | {ms:.2f} |")


if __name__ == "__main__":
    main()
