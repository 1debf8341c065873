"""Per-section timing of the flagship first-stage step on the real TPU.

VERDICT r1 #2: account for >=95% of the 261 ms step; the ~50 ms bucket
("embed loss, optimizer, misc") needs a breakdown. Method: time each section
as its own jitted fn on the exact tensors/shapes the real step uses (bf16
flagship config from bench.py). `block_until_ready` is unreliable on the
axon tunnel, so every measurement forces a dependent scalar to host.

Usage: python tools/profile_step.py [--iters 20]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

IMAGE_SIZE = 256
BATCH = 8
DICT = 10
AUG = {
    "modules": ["RandomHorizontalFlip", "RandomAffine", "RandomGaussianNoise"],
    "RandomHorizontalFlip": {"p": 0.5},
    "RandomAffine": {"degrees": 5.0, "translate": [0.02, 0.02], "p": 0.8},
    "RandomGaussianNoise": {"std": 0.03, "p": 0.5},
}


def timed(fn, *args, iters=20, warmup=2):
    """Times fn; fn must return something whose scalar sum we can force."""
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
    """Cheap scalar that depends on every float leaf (defeats DCE)."""
    acc = jnp.float32(0.0)
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            acc = acc + leaf.reshape(-1)[0].astype(jnp.float32)
    return acc * 0.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--skip-isolated", action="store_true")
    ap.add_argument("--skip-ablations", action="store_true")
    args = ap.parse_args()
    it = args.iters

    from medical_image_editing_tpu.models import UNetDecoder
    from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ
    from medical_image_editing_tpu.ops.augment import (
        cross_view_transform,
        random_transform,
    )
    from medical_image_editing_tpu.ops.losses import (
        embedding_loss,
        focal_frequency_loss,
    )
    from medical_image_editing_tpu.ops.onehot import one_hot
    from medical_image_editing_tpu.train import (
        create_train_state,
        make_first_stage_step,
    )
    from medical_image_editing_tpu.train.first_stage import FirstStageLossConfig
    from medical_image_editing_tpu.train.state import make_optimizer

    enc = EncoderWithVQ(
        filters=(16, 32, 64, 128, 256), dict_size=DICT, momentum=0.999,
        dtype=jnp.bfloat16,
    )
    dec = UNetDecoder(
        out_channels=1, filters=(32, 64, 128, 256, 512),
        dropped_skip_layers=(), use_pixel_shuffle=False, dtype=jnp.bfloat16,
    )
    x0 = jnp.zeros((BATCH, IMAGE_SIZE, IMAGE_SIZE, 1), jnp.float32)
    enc_vars, vq = enc.init(jax.random.key(0), x0)
    q0, *_ = enc(enc_vars, vq, x0, train=False)
    dec_vars = dec.init(
        {"params": jax.random.key(1), "dropblock": jax.random.key(2)}, q0,
        train=False,
    )
    enc_tx, dec_tx = make_optimizer(1e-4), make_optimizer(1e-4)
    state = create_train_state(
        jax.random.key(3), enc_vars, dec_vars, vq, enc_tx, dec_tx
    )

    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.uniform(-1, 1, (BATCH, IMAGE_SIZE, IMAGE_SIZE, 1)).astype(np.float32)
    )
    results = {}

    # ---- full step -------------------------------------------------------
    step = make_first_stage_step(
        enc, dec, enc_tx, dec_tx,
        loss_cfg=FirstStageLossConfig(margin=0.5), aug_cfg=AUG, dict_size=DICT,
    )

    def full(s, img):
        s2, m = step(s, img, jnp.float32(0.0))
        # force the whole new state (params, opt moments, vq) — returning only
        # the loss lets XLA DCE the backward+optimizer entirely.
        return m["total"] + _tree_probe(s2)

    results["full step"] = timed(full, state, image, iters=it)

    # ---- augmentation (2 views) -----------------------------------------
    def aug2(img, key):
        k1, k2 = jax.random.split(key)
        n1, c1, m1 = random_transform(k1, img, AUG)
        n2, c2, m2 = random_transform(k2, img, AUG)
        return n1 + n2 + c1 + c2, m1, m2

    key = jax.random.key(7)
    results["aug x2"] = timed(aug2, image, key, iters=it)

    # ---- encoder+VQ fwd+bwd x2 (grads wrt enc params only) ---------------
    enc_extra = {k: v for k, v in enc_vars.items() if k != "params"}

    def enc_loss(p, img):
        ev = {"params": p, **enc_extra}
        q1, c1, ids1, vq1, _ = enc(ev, vq, img.astype(jnp.bfloat16), train=True)
        q2, c2, ids2, vq2, _ = enc(ev, vq1, img.astype(jnp.bfloat16), train=True)
        return c1 + c2 + jnp.sum(q1.astype(jnp.float32)) * 1e-6 + jnp.sum(
            q2.astype(jnp.float32)
        ) * 1e-6

    def enc_fb(p, img):
        v, g = jax.value_and_grad(enc_loss)(p, img)
        return v + _tree_probe(g)

    results["encoder+VQ fwd+bwd x2"] = timed(enc_fb, enc_vars["params"], image, iters=it)

    # ---- decoder fwd+bwd x2 ----------------------------------------------
    q_in = q0.astype(jnp.bfloat16)

    dec_extra = {k: v for k, v in dec_vars.items() if k != "params"}
    dec_mut = list(dec_extra.keys())

    def dec_loss(p, q):
        dv = {"params": p, **dec_extra}
        r1, _ = dec.apply(
            dv, q, True, 0.0, mutable=dec_mut, rngs={"dropblock": jax.random.key(0)}
        )
        r2, _ = dec.apply(
            dv, q, True, 0.0, mutable=dec_mut, rngs={"dropblock": jax.random.key(1)}
        )
        return jnp.mean(r1.astype(jnp.float32) ** 2) + jnp.mean(
            r2.astype(jnp.float32) ** 2
        )

    def dec_fb(p, q):
        v, g = jax.value_and_grad(dec_loss)(p, q)
        return v + _tree_probe(g)

    results["decoder fwd+bwd x2"] = timed(dec_fb, dec_vars["params"], q_in, iters=it)

    # ---- warp + one-hot (id cross-view) ----------------------------------
    _, _, mats_a = random_transform(jax.random.key(11), image, AUG)
    _, _, mats_b = random_transform(jax.random.key(12), image, AUG)
    ids = jnp.asarray(
        rng.integers(0, DICT + 1, (BATCH, IMAGE_SIZE, IMAGE_SIZE)), jnp.int32
    )

    def warp_oh(ids_, ma, mb):
        r1 = cross_view_transform(ids_, ma, mb)
        r2 = cross_view_transform(ids_, mb, ma)
        o1 = one_hot(r1, DICT + 1)[..., 1:]
        o2 = one_hot(r2, DICT + 1)[..., 1:]
        return jnp.sum(o1) + jnp.sum(o2)

    results["cross-view warp+onehot x2"] = timed(warp_oh, ids, mats_a, mats_b, iters=it)

    # ---- embedding loss fwd+bwd ------------------------------------------
    e1 = jnp.asarray(
        rng.normal(size=(BATCH, IMAGE_SIZE, IMAGE_SIZE, 16)), jnp.bfloat16
    )
    e2 = jnp.asarray(
        rng.normal(size=(BATCH, IMAGE_SIZE, IMAGE_SIZE, 16)), jnp.bfloat16
    )
    oh1 = one_hot(ids, DICT + 1)[..., 1:]
    oh2 = one_hot(
        jnp.asarray(
            rng.integers(0, DICT + 1, (BATCH, IMAGE_SIZE, IMAGE_SIZE)), jnp.int32
        ),
        DICT + 1,
    )[..., 1:]
    cb = vq.embed

    def emb_loss(a, b):
        lc, ld, lr = embedding_loss(a, oh1, b, oh2, cb, margin=0.5)
        return lc + ld + lr

    def emb_fb(a, b):
        v, g = jax.value_and_grad(emb_loss, argnums=(0, 1))(a, b)
        return v + _tree_probe(g)

    results["embed loss fwd+bwd"] = timed(emb_fb, e1, e2, iters=it)

    # ---- focal frequency x4 fwd+bwd --------------------------------------
    r1 = jnp.asarray(
        rng.normal(size=(BATCH, IMAGE_SIZE, IMAGE_SIZE, 1)), jnp.float32
    )
    t1 = jnp.asarray(
        rng.normal(size=(BATCH, IMAGE_SIZE, IMAGE_SIZE, 1)), jnp.float32
    )

    def ffl_loss(r):
        return focal_frequency_loss(r, t1) + focal_frequency_loss(r * 0.5, t1)

    def ffl_fb(r):
        v, g = jax.value_and_grad(ffl_loss)(r)
        return v + _tree_probe(g)

    results["focal freq x2(pairs) fwd+bwd"] = timed(ffl_fb, r1, iters=it)

    # ---- optimizer update (both trees) ------------------------------------
    zeros_enc = jax.tree.map(jnp.zeros_like, enc_vars["params"])
    zeros_dec = jax.tree.map(jnp.zeros_like, dec_vars["params"])

    def opt_step(ep, dp, eo, do):
        import optax

        eu, eo2 = enc_tx.update(zeros_enc, eo, ep)
        du, do2 = dec_tx.update(zeros_dec, do, dp)
        ep2 = optax.apply_updates(ep, eu)
        dp2 = optax.apply_updates(dp, du)
        return ep2, dp2, eo2, do2

    results["optimizer update (both)"] = timed(
        opt_step, enc_vars["params"], dec_vars["params"],
        state.enc_opt, state.dec_opt, iters=it,
    )

    # ---- dispatch overhead (per jitted call on this tunneled backend) -----
    tiny = jnp.zeros((8,), jnp.float32)

    def bump(x):
        return x + 1.0

    results["dispatch overhead (x+1)"] = timed(bump, tiny, iters=it)

    # ---- marginal ablations of the exact step topology ---------------------
    # full step minus one ingredient; the delta is that ingredient's marginal
    # cost *in situ* (fusion + bwd topology included).
    from medical_image_editing_tpu.train import make_first_stage_step as mk

    def step_timer(cfg):
        st = mk(enc, dec, enc_tx, dec_tx, loss_cfg=cfg, aug_cfg=AUG, dict_size=DICT)

        def f(s, img):
            s2, m = st(s, img, jnp.float32(0.0))
            return m["total"] + _tree_probe(s2)

        return timed(f, state, image, iters=it)

    base_cfg = FirstStageLossConfig(margin=0.5)
    results2 = {}
    results2["no freq loss"] = step_timer(base_cfg._replace(use_frequency_loss=False))
    results2["no recon+freq (dec fwd only)"] = step_timer(
        base_cfg._replace(use_recon_loss=False, use_frequency_loss=False)
    )
    results2["no dist/reg"] = step_timer(
        base_cfg._replace(use_distance_loss=False, use_regularization_loss=False)
    )

    # ---- report -----------------------------------------------------------
    total = results.pop("full step")
    acc = sum(results.values())
    print(f"{'isolated section':38s} {'ms':>8s}")
    for k, v in results.items():
        print(f"{k:38s} {v:8.2f}")
    print(f"{'-'*47}")
    print(f"{'sum of sections':38s} {acc:8.2f}")
    print(f"{'FULL STEP':38s} {total:8.2f}")
    print(f"{'unaccounted':38s} {total - acc:8.2f}  ({(total-acc)/total*100:.1f}%)")
    print()
    print(f"{'step ablation (marginal, in situ)':38s} {'ms':>8s} {'delta':>8s}")
    for k, v in results2.items():
        print(f"{k:38s} {v:8.2f} {total - v:8.2f}")
    print(f"imgs/sec = {BATCH/ (total/1000.0):.2f}")


if __name__ == "__main__":
    main()
