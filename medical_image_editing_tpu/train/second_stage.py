"""Second-stage (adversarial) training steps.

Behavioral specs:
  UNetDiscriminator path — reference
      `src/trainers/single_window_trainer.py:264-432` (`_train_second_step_unet_dis`):
      encoder frozen in eval (codebook EMA stopped); decoder trained with
      recon (L1 or MSE) + focal-frequency (+perceptual) + adversarial
      −(mean pixel map + mean bottleneck) + optional "unet_perceptual"
      feature-matching against the discriminator's decoder features on the real
      image; then an inner loop of `n_inner_loops` discriminator updates with
      hinge losses on map+bottleneck, a CutMix real/fake composite (one box per
      batch, randomly inverted), hinge on the composite, and a CutMix
      consistency MSE between D(cutmix(image, recon)) and cutmix(D(image),
      D(recon)). NB the reference keeps using the pre-update reconstruction
      inside the discriminator loop (stale by one decoder step) — replicated.
  NLayerDiscriminator path — `:434-539` (`_train_second_step_nl_dis`): same
      shape with scalar PatchGAN logits and no CutMix.

TPU-first: decoder update + the whole discriminator inner loop compile into
ONE jitted step; the inner loop is a `lax.scan` over the discriminator
(params, opt, stats) carry with static length `n_inner_loops` — no retraces,
no host round trips (SURVEY.md §7 "GAN training step shape"). Spectral-norm
power-iteration stats update on every discriminator forward (torch train-mode
parity) and are threaded through the scan carry. With `axis_name`, both
decoder and discriminator grads are `pmean`'d.
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..ops.cutmix import cutmix_coordinates, cutmix_mask, mask_src_tgt
from ..ops.losses import focal_frequency_loss, hinge_d_loss
from .state import TrainState, per_device_keys


class SecondStageLossConfig(NamedTuple):
    """Static loss configuration (config section `loss`, SURVEY.md §5)."""

    w_recon: float = 1.0
    w_freq: float = 1.0
    w_perceptual: float = 0.0
    w_gen: float = 1.0
    w_unet_perceptual: float = 0.0
    w_dis: float = 1.0
    w_cutmix: float = 1.0
    w_consistency: float = 1.0
    use_recon_loss: bool = True
    use_l1_loss: bool = False
    use_frequency_loss: bool = True
    use_perceptual_loss: bool = False
    use_unet_perceptual_loss: bool = True
    n_inner_loops: int = 1
    dis_loss_type: str = "hinge_d_loss"


def second_stage_config_from_json(loss_cfg) -> SecondStageLossConfig:
    from ..utils.config import getattr_else_none as g

    w = loss_cfg.loss_weight
    return SecondStageLossConfig(
        w_recon=float(g(w, "recon", 1.0) or 0.0),
        w_freq=float(g(w, "freq", 1.0) or 0.0),
        w_perceptual=float(g(w, "perceptual", 0.0) or 0.0),
        w_gen=float(g(w, "gen", 1.0) or 0.0),
        w_unet_perceptual=float(g(w, "unet_perceptual", 0.0) or 0.0),
        w_dis=float(g(w, "dis", 1.0) or 0.0),
        w_cutmix=float(g(w, "cutmix", 1.0) or 0.0),
        w_consistency=float(g(w, "consistency", 1.0) or 0.0),
        use_recon_loss=bool(g(loss_cfg, "use_recon_loss", True)),
        use_l1_loss=bool(g(loss_cfg, "use_l1_loss", False)),
        use_frequency_loss=bool(g(loss_cfg, "use_frequency_loss", True)),
        use_perceptual_loss=bool(g(loss_cfg, "use_perceptual_loss", False)),
        use_unet_perceptual_loss=bool(g(loss_cfg, "use_unet_perceptual_loss", False)),
        n_inner_loops=int(g(loss_cfg, "n_inner_loops", 1) or 1),
        dis_loss_type=str(g(loss_cfg, "dis_loss_type", "hinge_d_loss")),
    )


def _split_vars(variables):
    params = variables["params"]
    extra = {k: v for k, v in variables.items() if k != "params"}
    return params, extra


def _apply(module, params, extra, x, train):
    """Apply a flax module, updating its mutable collections when training."""
    variables = {"params": params, **extra}
    mutable = [k for k in extra.keys()] if train else []
    if mutable:
        out, upd = module.apply(variables, x, train, mutable=mutable)
        return out, {**extra, **upd}
    return module.apply(variables, x, train), extra


def unet_perceptual_loss(outputs, targets):
    """Sum of per-feature MSEs, targets gradient-stopped.
    Spec: `src/trainers/base.py` `unet_perceptual_loss`."""
    total = jnp.float32(0.0)
    for o, t in zip(outputs, targets):
        total += jnp.mean(
            (o.astype(jnp.float32) - jax.lax.stop_gradient(t).astype(jnp.float32)) ** 2
        )
    return total


def make_second_stage_step(
    encoder,
    decoder,
    dis,
    dec_tx: optax.GradientTransformation,
    dis_tx: optax.GradientTransformation,
    *,
    loss_cfg: SecondStageLossConfig,
    dis_type: str = "UNetDiscriminator",
    axis_name: Optional[str] = None,
    perceptual_fn=None,
):
    """Returns step_fn(state, image[B,H,W,C] in [-1,1], drop_prob) →
    (state', metrics)."""
    assert loss_cfg.dis_loss_type == "hinge_d_loss", loss_cfg.dis_loss_type
    assert dis_type in {"UNetDiscriminator", "NLayerDiscriminator"}
    is_unet_dis = dis_type == "UNetDiscriminator"

    def recon_losses(recon, image):
        if loss_cfg.use_recon_loss:
            if loss_cfg.use_l1_loss and is_unet_dis:
                l_recon = jnp.mean(jnp.abs(recon - image))
            else:
                l_recon = jnp.mean((recon - image) ** 2)
        else:
            l_recon = jnp.float32(0.0)
        l_freq = (
            focal_frequency_loss(recon, image)
            if loss_cfg.use_frequency_loss
            else jnp.float32(0.0)
        )
        l_percep = (
            perceptual_fn(recon, image)
            if (loss_cfg.use_perceptual_loss and perceptual_fn is not None)
            else jnp.float32(0.0)
        )
        return l_recon, l_freq, l_percep

    def step_fn(state: TrainState, image, drop_prob=0.0):
        rng, k_drop, k_dis = jax.random.split(state.rng, 3)
        k_drop, k_dis = per_device_keys(axis_name, k_drop, k_dis)
        image = image.astype(jnp.float32)

        # frozen encoder, eval mode: no VQ EMA update (spec `:273-275`)
        q, _, ids, _, _ = encoder(state.enc_vars, state.vq, image, train=False)
        q = jax.lax.stop_gradient(q)

        dec_params, dec_extra = _split_vars(state.dec_vars)
        dis_params, dis_extra = _split_vars(state.dis_vars)

        # ---- decoder (generator) update --------------------------------
        def gen_loss_fn(dp):
            dec_vars = {"params": dp, **dec_extra}
            mutable = [k for k in dec_extra.keys()]
            if mutable:
                recon, dec_upd = decoder.apply(
                    dec_vars, q, True, drop_prob,
                    mutable=mutable, rngs={"dropblock": k_drop},
                )
            else:
                recon, dec_upd = (
                    decoder.apply(dec_vars, q, True, drop_prob,
                                  rngs={"dropblock": k_drop}),
                    {},
                )
            recon = recon.astype(jnp.float32)
            l_recon, l_freq, l_percep = recon_losses(recon, image)

            if is_unet_dis:
                (f_map, f_bottle, f_feats), dis_extra1 = _apply(
                    dis, dis_params, dis_extra, recon, True
                )
                l_gen = -(jnp.mean(f_map) + jnp.mean(f_bottle))
                if loss_cfg.use_unet_perceptual_loss:
                    (_, _, r_feats), dis_extra1 = _apply(
                        dis, dis_params, dis_extra1, jax.lax.stop_gradient(image), True
                    )
                    l_unet_percep = unet_perceptual_loss(f_feats, r_feats)
                else:
                    l_unet_percep = jnp.float32(0.0)
            else:
                f_logits, dis_extra1 = _apply(dis, dis_params, dis_extra, recon, True)
                l_gen = -jnp.mean(f_logits)
                l_unet_percep = jnp.float32(0.0)

            total = (
                loss_cfg.w_recon * l_recon
                + loss_cfg.w_freq * l_freq
                + loss_cfg.w_perceptual * l_percep
                + loss_cfg.w_gen * l_gen
                + loss_cfg.w_unet_perceptual * l_unet_percep
            )
            aux = {
                "recon_img": jax.lax.stop_gradient(recon),
                "dec_upd": dec_upd,
                "dis_extra": jax.lax.stop_gradient(dis_extra1),
                "metrics": {
                    "gen_total": total,
                    "recon": loss_cfg.w_recon * l_recon,
                    "freq": loss_cfg.w_freq * l_freq,
                    "perceptual": loss_cfg.w_perceptual * l_percep,
                    "gen": loss_cfg.w_gen * l_gen,
                    "unet_perceptual": loss_cfg.w_unet_perceptual * l_unet_percep,
                },
            }
            return total, aux

        (gen_total, gen_aux), dec_grads = jax.value_and_grad(
            gen_loss_fn, has_aux=True
        )(dec_params)
        if axis_name is not None:
            dec_grads = jax.lax.pmean(dec_grads, axis_name)
        dec_updates, dec_opt = dec_tx.update(dec_grads, state.dec_opt, dec_params)
        dec_params = optax.apply_updates(dec_params, dec_updates)

        recon = gen_aux["recon_img"]  # pre-update recon, as in the reference
        dis_extra_run = gen_aux["dis_extra"]
        h, w_ = image.shape[1], image.shape[2]

        # ---- discriminator inner loop (lax.scan, static length) --------
        def dis_iter(carry, key_i):
            dp, d_extra, d_opt = carry

            def dis_loss_fn(dpp):
                if is_unet_dis:
                    (r_map, r_bottle, _), de1 = _apply(dis, dpp, d_extra, image, True)
                    (f_map, f_bottle, _), de2 = _apply(dis, dpp, de1, recon, True)
                    l_dis = hinge_d_loss(r_map, f_map) + hinge_d_loss(
                        r_bottle, f_bottle
                    )

                    k_box, k_inv = jax.random.split(key_i)
                    coords, _ = cutmix_coordinates(k_box, h, w_)
                    box = cutmix_mask(coords, h, w_)
                    # mask = cutmix(ones, zeros, box) == 1 − box; random invert
                    mask2d = 1.0 - box
                    invert = jax.random.uniform(k_inv) > 0.5
                    mask2d = jnp.where(invert, 1.0 - mask2d, mask2d)

                    cutmix_images = mask_src_tgt(image, recon, mask2d)
                    (c_map, c_bottle, _), de3 = _apply(
                        dis, dpp, de2, cutmix_images, True
                    )
                    m = mask2d[None, :, :, None]
                    l_cutmix = jnp.mean(jax.nn.relu(1.0 + c_bottle)) + jnp.mean(
                        jax.nn.relu(1.0 - (m * 2.0 - 1.0) * c_map)
                    )
                    rf_map = mask_src_tgt(r_map, f_map, mask2d)
                    l_consistency = jnp.mean((c_map - rf_map) ** 2)
                    total = (
                        loss_cfg.w_dis * l_dis
                        + loss_cfg.w_cutmix * l_cutmix
                        + loss_cfg.w_consistency * l_consistency
                    )
                    mets = {
                        "dis_total": total,
                        "dis": loss_cfg.w_dis * l_dis,
                        "cutmix": loss_cfg.w_cutmix * l_cutmix,
                        "consistency": loss_cfg.w_consistency * l_consistency,
                    }
                    return total, (de3, mets)
                else:
                    r_logits, de1 = _apply(dis, dpp, d_extra, image, True)
                    f_logits, de2 = _apply(dis, dpp, de1, recon, True)
                    l_dis = hinge_d_loss(r_logits, f_logits)
                    total = loss_cfg.w_dis * l_dis
                    mets = {
                        "dis_total": total,
                        "dis": total,
                        "cutmix": jnp.float32(0.0),
                        "consistency": jnp.float32(0.0),
                    }
                    return total, (de2, mets)

            (_, (d_extra_new, mets)), d_grads = jax.value_and_grad(
                dis_loss_fn, has_aux=True
            )(dp)
            if axis_name is not None:
                d_grads = jax.lax.pmean(d_grads, axis_name)
            d_updates, d_opt = dis_tx.update(d_grads, d_opt, dp)
            dp = optax.apply_updates(dp, d_updates)
            return (dp, jax.lax.stop_gradient(d_extra_new), d_opt), mets

        keys = jax.random.split(k_dis, loss_cfg.n_inner_loops)
        (dis_params, dis_extra_run, dis_opt), dis_mets = jax.lax.scan(
            dis_iter, (dis_params, dis_extra_run, state.dis_opt), keys
        )
        if axis_name is not None:
            # the discriminator's mutable collections (spectral-norm u/σ,
            # ActNorm data init) update from each device's local shard — keep
            # them replicated like torch DDP's per-forward buffer broadcast
            dis_extra_run = jax.lax.pmean(dis_extra_run, axis_name)
        last_dis_mets = jax.tree.map(lambda a: a[-1], dis_mets)

        metrics = {
            **gen_aux["metrics"],
            **last_dis_mets,
            "total": gen_total + last_dis_mets["dis_total"],
        }
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)

        new_state = state.replace(
            step=state.step + 1,
            rng=rng,
            dec_vars={"params": dec_params, **gen_aux["dec_upd"]}
            if gen_aux["dec_upd"]
            else {"params": dec_params, **dec_extra},
            dis_vars={"params": dis_params, **dis_extra_run},
            dec_opt=dec_opt,
            dis_opt=dis_opt,
        )
        return new_state, metrics

    return step_fn
