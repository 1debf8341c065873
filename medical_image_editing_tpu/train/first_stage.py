"""First-stage (self-supervised) training step.

Behavioral spec: reference `src/trainers/single_window_trainer.py:68-159`
(`_train_first_step`):
  1. denorm the batch to [0,1], draw two augmented views (noised+clear+matrices),
     renorm to [-1,1];
  2. encode both views through the shared encoder+VQ (commit losses; the VQ EMA
     update runs on view 1 then view 2, exactly like the reference's sequential
     buffer updates);
  3. warp each view's id map into the *other* view's frame
     (reverse∘forward, nearest) and one-hot with the background channel dropped;
  4. EmbeddingLoss (cross/dist/reg) between quantized embeddings and the warped
     ids of the other view;
  5. decode both quantized embeddings; MSE + focal-frequency (+ optional
     perceptual) reconstruction losses against the clear views;
  6. weighted sum, one backward, separate Adam steps for encoder and decoder
     (manual optimization parity).

TPU-first: steps 1–6 are ONE jitted function (augmentation included — no host
round trips); gradients for encoder and decoder come from a single
`value_and_grad` over both parameter trees; with `axis_name` set, gradients,
VQ statistics and batch stats are `pmean`'d over the data mesh axis — the
equivalents of DDP all-reduce, the reference's VQ collective, and
sync-batchnorm respectively.
"""

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..ops.augment import cross_view_transform, random_transform
from ..ops.losses import embedding_loss, focal_frequency_loss
from ..ops.onehot import one_hot
from ..ops.windowing import denorm, norm
from .state import TrainState, per_device_keys


class FirstStageLossConfig(NamedTuple):
    """Static loss configuration (spec: config sections `loss` / SURVEY.md §5)."""

    w_commit: float = 1.0
    w_cross: float = 1.0
    w_dist: float = 1.0
    w_reg: float = 1.0
    w_recon: float = 1.0
    w_freq: float = 1.0
    w_perceptual: float = 0.0
    margin: float = 1.0
    use_distance_loss: bool = True
    use_regularization_loss: bool = True
    use_recon_loss: bool = True
    use_frequency_loss: bool = True
    use_perceptual_loss: bool = False


def loss_config_from_json(loss_cfg) -> FirstStageLossConfig:
    from ..utils.config import getattr_else_none as g

    w = loss_cfg.loss_weight
    el = loss_cfg.embed_loss
    return FirstStageLossConfig(
        w_commit=float(g(w, "commit", 1.0) or 0.0),
        w_cross=float(g(w, "cross", 1.0) or 0.0),
        w_dist=float(g(w, "dist", 1.0) or 0.0),
        w_reg=float(g(w, "reg", 1.0) or 0.0),
        w_recon=float(g(w, "recon", 1.0) or 0.0),
        w_freq=float(g(w, "freq", 1.0) or 0.0),
        w_perceptual=float(g(w, "perceptual", 0.0) or 0.0),
        margin=float(g(el, "margin", 1.0) or 0.0),
        use_distance_loss=bool(g(el, "use_distance_loss", True)),
        use_regularization_loss=bool(g(el, "use_regularization_loss", True)),
        use_recon_loss=bool(g(loss_cfg, "use_recon_loss", True)),
        use_frequency_loss=bool(g(loss_cfg, "use_frequency_loss", True)),
        use_perceptual_loss=bool(g(loss_cfg, "use_perceptual_loss", False)),
    )


def make_first_stage_step(
    encoder,
    decoder,
    enc_tx: optax.GradientTransformation,
    dec_tx: optax.GradientTransformation,
    *,
    loss_cfg: FirstStageLossConfig,
    aug_cfg: Any,
    dict_size: int,
    axis_name: Optional[str] = None,
    perceptual_fn=None,
    compute_dtype=jnp.float32,
    recon_loss_fn=None,
):
    """Build the jitted first-stage step.

    encoder: models.unet_encoder.EncoderWithVQ
    decoder: models.unet_decoder.UNetDecoder (flax module)
    perceptual_fn: optional callable (recon, target) → scalar (VGG/LPIPS port).
    recon_loss_fn: optional (recon, clear) → (l_recon, l_freq, l_percep)
        override — used by the multi-window trainer to compute losses across
        raw/lung/mediastinal windowings (`multi_window_trainer.py:93-119`).
    Returns step_fn(state, image[B,H,W,C] in [-1,1], drop_prob) → (state', metrics).
    """

    def step_fn(state: TrainState, image, drop_prob=0.0):
        rng, k1, k2, kd1, kd2 = jax.random.split(state.rng, 5)
        k1, k2, kd1, kd2 = per_device_keys(axis_name, k1, k2, kd1, kd2)

        image01 = denorm(image.astype(jnp.float32), 0.0, 1.0)
        noised_1, clear_1, mats_1 = random_transform(k1, image01, aug_cfg)
        noised_2, clear_2, mats_2 = random_transform(k2, image01, aug_cfg)
        noised_1, noised_2 = norm(noised_1), norm(noised_2)
        clear_1, clear_2 = norm(clear_1), norm(clear_2)

        enc_extra = {
            k: v for k, v in state.enc_vars.items() if k != "params"
        }
        dec_extra = {
            k: v for k, v in state.dec_vars.items() if k != "params"
        }

        def loss_fn(enc_params, dec_params):
            enc_vars = {"params": enc_params, **enc_extra}
            dec_vars = {"params": dec_params, **dec_extra}

            q1, commit_1, ids_1, vq_1, enc_upd = encoder(
                enc_vars, state.vq, noised_1.astype(compute_dtype), train=True
            )
            if enc_upd:
                enc_vars = {"params": enc_params, **enc_upd}
            q2, commit_2, ids_2, vq_2, enc_upd2 = encoder(
                enc_vars, vq_1, noised_2.astype(compute_dtype), train=True
            )
            l_commit = commit_1 + commit_2

            # id maps are data: warp round trips under stop_gradient by nature.
            # single composed resample per direction (see cross_view_transform)
            r_ids_1 = cross_view_transform(ids_1, mats_1, mats_2)
            r_ids_2 = cross_view_transform(ids_2, mats_2, mats_1)
            r_oh_1 = one_hot(r_ids_1, dict_size + 1)[..., 1:]
            r_oh_2 = one_hot(r_ids_2, dict_size + 1)[..., 1:]

            l_cross, l_dist, l_reg = embedding_loss(
                q1,
                r_oh_1,
                q2,
                r_oh_2,
                vq_2.embed,
                margin=loss_cfg.margin,
                use_distance_loss=loss_cfg.use_distance_loss,
                use_regularization_loss=loss_cfg.use_regularization_loss,
            )

            mutable = ["batch_stats"] if "batch_stats" in dec_vars else []

            def decode(dvars, x, rng_key):
                if mutable:
                    out, upd = decoder.apply(
                        dvars, x, True, drop_prob,
                        mutable=mutable, rngs={"dropblock": rng_key},
                    )
                    return out, upd
                return decoder.apply(
                    dvars, x, True, drop_prob, rngs={"dropblock": rng_key}
                ), {}

            # BN running stats chain view-1 → view-2 like the encoder above
            # (torch buffers update in place between the two decodes).
            recon_1, dec_upd = decode(dec_vars, q1, kd1)
            if dec_upd:
                dec_vars = {"params": dec_params, **dec_upd}
            recon_2, dec_upd2 = decode(dec_vars, q2, kd2)
            dec_upd = dec_upd2 or dec_upd

            recon_1 = recon_1.astype(jnp.float32)
            recon_2 = recon_2.astype(jnp.float32)

            if recon_loss_fn is not None:
                lr1, lf1, lp1 = recon_loss_fn(recon_1, clear_1)
                lr2, lf2, lp2 = recon_loss_fn(recon_2, clear_2)
                l_recon, l_freq, l_percep = lr1 + lr2, lf1 + lf2, lp1 + lp2
            else:
                if loss_cfg.use_recon_loss:
                    l_recon = jnp.mean((recon_1 - clear_1) ** 2) + jnp.mean(
                        (recon_2 - clear_2) ** 2
                    )
                else:
                    l_recon = jnp.float32(0.0)

                if loss_cfg.use_frequency_loss:
                    l_freq = focal_frequency_loss(
                        recon_1, clear_1
                    ) + focal_frequency_loss(recon_2, clear_2)
                else:
                    l_freq = jnp.float32(0.0)

                if loss_cfg.use_perceptual_loss and perceptual_fn is not None:
                    l_percep = perceptual_fn(recon_1, clear_1) + perceptual_fn(
                        recon_2, clear_2
                    )
                else:
                    l_percep = jnp.float32(0.0)

            total = (
                loss_cfg.w_commit * l_commit
                + loss_cfg.w_cross * l_cross
                + loss_cfg.w_dist * l_dist
                + loss_cfg.w_reg * l_reg
                + loss_cfg.w_recon * l_recon
                + loss_cfg.w_freq * l_freq
                + loss_cfg.w_perceptual * l_percep
            )
            aux = {
                "vq": vq_2,
                "enc_upd": enc_upd2 or enc_upd,
                "dec_upd": dec_upd,
                "metrics": {
                    "total": total,
                    "commit": loss_cfg.w_commit * l_commit,
                    "cross": loss_cfg.w_cross * l_cross,
                    "dist": loss_cfg.w_dist * l_dist,
                    "reg": loss_cfg.w_reg * l_reg,
                    "recon": loss_cfg.w_recon * l_recon,
                    "freq": loss_cfg.w_freq * l_freq,
                    "perceptual": loss_cfg.w_perceptual * l_percep,
                },
            }
            return total, aux

        (total, aux), grads = jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
            state.enc_vars["params"], state.dec_vars["params"]
        )
        enc_grads, dec_grads = grads

        if axis_name is not None:
            enc_grads = jax.lax.pmean(enc_grads, axis_name)
            dec_grads = jax.lax.pmean(dec_grads, axis_name)

        enc_updates, enc_opt = enc_tx.update(
            enc_grads, state.enc_opt, state.enc_vars["params"]
        )
        dec_updates, dec_opt = dec_tx.update(
            dec_grads, state.dec_opt, state.dec_vars["params"]
        )
        enc_params = optax.apply_updates(state.enc_vars["params"], enc_updates)
        dec_params = optax.apply_updates(state.dec_vars["params"], dec_updates)

        enc_vars = {"params": enc_params, **(aux["enc_upd"] or enc_extra)}
        dec_vars = {"params": dec_params, **(aux["dec_upd"] or dec_extra)}

        new_state = state.replace(
            step=state.step + 1,
            rng=rng,
            enc_vars=enc_vars,
            dec_vars=dec_vars,
            vq=aux["vq"],
            enc_opt=enc_opt,
            dec_opt=dec_opt,
        )
        metrics = aux["metrics"]
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)
        return new_state, metrics

    return step_fn


def init_codebook_step(encoder, *, axis_name: Optional[str] = None, num_iters: int = 50):
    """Explicit codebook-initialization phase (reference: in-forward k-means
    trigger, `unet_encoder.py:66-91,111-112`; here a separate jitted fn run
    once before training — SURVEY.md §7 hard parts)."""
    from ..models.unet_encoder import init_codebook_from_batch

    def init_fn(state: TrainState, image):
        rng, k = jax.random.split(state.rng)
        feats = encoder.module.apply(state.enc_vars, image, train=False)
        new_vq = init_codebook_from_batch(
            k, feats, state.vq, axis_name=axis_name, num_iters=num_iters
        )
        return state.replace(rng=rng, vq=new_vq)

    return init_fn
