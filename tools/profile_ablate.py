"""In-step ablation profile (honest marginal costs under XLA fusion).

Monkeypatches individual ops out of the first-stage step and measures the
end-to-end step time delta. Complements tools/profile_step.py whose
standalone-component numbers do not compose (different fusion contexts).

    python tools/profile_ablate.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

BATCH, SIZE, K = 8, 256, 10


def run_step_loop(step, state, image, iters=30):
    state, m = step(state, image, jnp.float32(0.0))  # compile
    float(m["total"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, image, jnp.float32(0.0))
    float(m["total"])  # force the whole chain
    return (time.perf_counter() - t0) / iters * 1000.0


def main():
    from bench import AUG

    import medical_image_editing_tpu.train.first_stage as fs
    from medical_image_editing_tpu.models import UNetDecoder
    from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ
    from medical_image_editing_tpu.train import create_train_state
    from medical_image_editing_tpu.train.first_stage import FirstStageLossConfig
    from medical_image_editing_tpu.train.state import make_optimizer

    enc = EncoderWithVQ(filters=(16, 32, 64, 128, 256), dict_size=K,
                        momentum=0.999, dtype=jnp.bfloat16)
    dec = UNetDecoder(out_channels=1, filters=(32, 64, 128, 256, 512),
                      dropped_skip_layers=(), use_pixel_shuffle=False,
                      dtype=jnp.bfloat16)
    x0 = jnp.zeros((BATCH, SIZE, SIZE, 1), jnp.float32)
    enc_vars, vq = enc.init(jax.random.key(0), x0)
    q, *_ = enc(enc_vars, vq, x0, train=False)
    dec_vars = dec.init(
        {"params": jax.random.key(1), "dropblock": jax.random.key(2)}, q, train=False
    )
    enc_tx, dec_tx = make_optimizer(1e-4), make_optimizer(1e-4)
    state = create_train_state(jax.random.key(3), enc_vars, dec_vars, vq,
                               enc_tx, dec_tx)
    rng = np.random.default_rng(0)
    image = jnp.asarray(
        rng.uniform(-1, 1, (BATCH, SIZE, SIZE, 1)).astype(np.float32)
    )

    def build():
        return jax.jit(fs.make_first_stage_step(
            enc, dec, enc_tx, dec_tx,
            loss_cfg=FirstStageLossConfig(margin=0.5), aug_cfg=AUG, dict_size=K,
        ))

    orig = dict(
        embedding_loss=fs.embedding_loss,
        cross_view_transform=fs.cross_view_transform,
        one_hot=fs.one_hot,
        random_transform=fs.random_transform,
        focal_frequency_loss=fs.focal_frequency_loss,
    )

    def restore():
        for k, v in orig.items():
            setattr(fs, k, v)

    rows = []

    rows.append(("FULL step", run_step_loop(build(), state, image)))

    fs.embedding_loss = lambda *a, **k: (jnp.float32(0.0),) * 3
    rows.append(("− embedding loss (cross/dist/reg)", run_step_loop(build(), state, image)))
    restore()

    fs.cross_view_transform = lambda ids, m_src, m_dst: ids
    rows.append(("− id warps (cross-view resamples)", run_step_loop(build(), state, image)))
    restore()

    fs.cross_view_transform = lambda ids, m_src, m_dst: ids
    fs.embedding_loss = lambda *a, **k: (jnp.float32(0.0),) * 3
    fs.one_hot = lambda ids, n: jnp.zeros(ids.shape + (n,), jnp.float32)
    rows.append(("− warps − one-hot − embed loss", run_step_loop(build(), state, image)))
    restore()

    fs.random_transform = lambda key, img, cfg: (
        img, img, jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32),
                                   (img.shape[0], 3, 3)),
    )
    rows.append(("− augmentation (identity views)", run_step_loop(build(), state, image)))
    restore()

    fs.focal_frequency_loss = lambda *a, **k: jnp.float32(0.0)
    rows.append(("− focal-frequency loss", run_step_loop(build(), state, image)))
    restore()

    # decoder ablation: 1×1-conv stub decoder (removes the big conv stack)
    import flax.linen as nn

    class TinyDec(nn.Module):
        dtype: object = jnp.bfloat16

        @nn.compact
        def __call__(self, x, train=False, drop_prob=0.0):
            return nn.Conv(1, (1, 1), dtype=self.dtype)(x)

    tiny = TinyDec()
    tv = tiny.init(jax.random.key(9), q)
    st2 = state.replace(dec_vars=tv, dec_opt=dec_tx.init(tv["params"]))
    step2 = jax.jit(fs.make_first_stage_step(
        enc, tiny, enc_tx, dec_tx,
        loss_cfg=FirstStageLossConfig(margin=0.5), aug_cfg=AUG, dict_size=K,
    ))
    rows.append(("− decoder (1×1 stub)", run_step_loop(step2, st2, image)))

    full = rows[0][1]
    print("\n| Variant | ms | marginal cost of removed part |")
    print("|---|---|---|")
    for name, ms in rows:
        print(f"| {name} | {ms:.1f} | {full - ms:+.1f} |")


if __name__ == "__main__":
    main()
