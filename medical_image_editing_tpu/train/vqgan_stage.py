"""VQGAN adversarial trainer (VQGAN autoencoder vs UNetDiscriminator).

Behavioral spec: reference `src/trainers/vqgan_unet_dis.py:36-185`
(VQGAN_UNetDis_Trainer.training_step): the generator here is the whole VQGAN
(stored in the trainer's `decoder` field, `src/trainers/base.py:204-222`),
trained with recon/freq(+perceptual) + commit + adversarial (pixel map +
bottleneck) + optional unet-perceptual against the CutMix-consistency
UNetDiscriminator inner loop — the same protocol as the second-stage step but
with the VQ codebook live (EMA updates on).

TPU-first: identical structure to `second_stage.make_second_stage_step` — one
jitted step, `lax.scan` discriminator inner loop — with the VQGAN's VQ state
threaded through `state.vq` and its EMA statistics `pmean`'d under a mesh axis.
"""

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..ops.cutmix import cutmix_coordinates, cutmix_mask, mask_src_tgt
from ..ops.losses import focal_frequency_loss, hinge_d_loss
from .second_stage import (
    SecondStageLossConfig,
    _apply,
    _split_vars,
    unet_perceptual_loss,
)
from .state import TrainState, per_device_keys


def make_vqgan_step(
    vqgan,
    dis,
    dec_tx: optax.GradientTransformation,
    dis_tx: optax.GradientTransformation,
    *,
    loss_cfg: SecondStageLossConfig,
    w_commit: float = 1.0,
    axis_name: Optional[str] = None,
    perceptual_fn=None,
):
    """Returns step_fn(state, image[B,H,W,C] in [-1,1]) → (state', metrics).

    The VQGAN variables live in `state.dec_vars` and its codebook in
    `state.vq` (mirroring the reference trainer's `decoder` field holding the
    whole VQGAN).
    """
    assert loss_cfg.dis_loss_type == "hinge_d_loss"

    def step_fn(state: TrainState, image, drop_prob=0.0):
        del drop_prob  # VQGAN path has no dropblock schedule
        rng, k_drop, k_dis = jax.random.split(state.rng, 3)
        k_drop, k_dis = per_device_keys(axis_name, k_drop, k_dis)
        image = image.astype(jnp.float32)

        dec_params, dec_extra = _split_vars(state.dec_vars)
        dis_params, dis_extra = _split_vars(state.dis_vars)
        h, w_ = image.shape[1], image.shape[2]

        def gen_loss_fn(dp):
            dec_vars = {"params": dp, **dec_extra}
            mutable = [k for k in dec_extra.keys()]
            rngs = {"dropout": k_drop}
            if mutable:
                (recon, commit, ids, emb, new_vq), dec_upd = vqgan.apply(
                    dec_vars, image, state.vq, True, mutable=mutable, rngs=rngs
                )
            else:
                recon, commit, ids, emb, new_vq = vqgan.apply(
                    dec_vars, image, state.vq, True, rngs=rngs
                )
                dec_upd = {}
            recon = recon.astype(jnp.float32)

            l_recon = (
                jnp.mean((recon - image) ** 2)
                if loss_cfg.use_recon_loss
                else jnp.float32(0.0)
            )
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

            (f_map, f_bottle, f_feats), de = _apply(
                dis, dis_params, dis_extra, recon, True
            )
            l_gen = -(jnp.mean(f_map) + jnp.mean(f_bottle))
            if loss_cfg.use_unet_perceptual_loss:
                (_, _, r_feats), de = _apply(
                    dis, dis_params, de, jax.lax.stop_gradient(image), True
                )
                l_upercep = unet_perceptual_loss(f_feats, r_feats)
            else:
                l_upercep = jnp.float32(0.0)

            total = (
                loss_cfg.w_recon * l_recon
                + loss_cfg.w_freq * l_freq
                + loss_cfg.w_perceptual * l_percep
                + w_commit * commit
                + loss_cfg.w_gen * l_gen
                + loss_cfg.w_unet_perceptual * l_upercep
            )
            aux = {
                "recon_img": jax.lax.stop_gradient(recon),
                "vq": new_vq,
                "dec_upd": dec_upd,
                "dis_extra": jax.lax.stop_gradient(de),
                "metrics": {
                    "gen_total": total,
                    "recon": loss_cfg.w_recon * l_recon,
                    "freq": loss_cfg.w_freq * l_freq,
                    "perceptual": loss_cfg.w_perceptual * l_percep,
                    "commit": w_commit * commit,
                    "gen": loss_cfg.w_gen * l_gen,
                    "unet_perceptual": loss_cfg.w_unet_perceptual * l_upercep,
                },
            }
            return total, aux

        (gen_total, aux), dec_grads = jax.value_and_grad(gen_loss_fn, has_aux=True)(
            dec_params
        )
        if axis_name is not None:
            dec_grads = jax.lax.pmean(dec_grads, axis_name)
        dec_updates, dec_opt = dec_tx.update(dec_grads, state.dec_opt, dec_params)
        dec_params = optax.apply_updates(dec_params, dec_updates)

        recon = aux["recon_img"]
        de_run = aux["dis_extra"]

        def dis_iter(carry, key_i):
            dp, d_extra, d_opt = carry

            def dis_loss_fn(dpp):
                (r_map, r_bottle, _), de1 = _apply(dis, dpp, d_extra, image, True)
                (f_map, f_bottle, _), de2 = _apply(dis, dpp, de1, recon, True)
                l_dis = hinge_d_loss(r_map, f_map) + hinge_d_loss(r_bottle, f_bottle)

                k_box, k_inv = jax.random.split(key_i)
                coords, _ = cutmix_coordinates(k_box, h, w_)
                mask2d = 1.0 - cutmix_mask(coords, h, w_)
                invert = jax.random.uniform(k_inv) > 0.5
                mask2d = jnp.where(invert, 1.0 - mask2d, mask2d)

                cmix = mask_src_tgt(image, recon, mask2d)
                (c_map, c_bottle, _), de3 = _apply(dis, dpp, de2, cmix, True)
                m = mask2d[None, :, :, None]
                l_cutmix = jnp.mean(jax.nn.relu(1.0 + c_bottle)) + jnp.mean(
                    jax.nn.relu(1.0 - (m * 2.0 - 1.0) * c_map)
                )
                l_cons = jnp.mean((c_map - mask_src_tgt(r_map, f_map, mask2d)) ** 2)
                total = (
                    loss_cfg.w_dis * l_dis
                    + loss_cfg.w_cutmix * l_cutmix
                    + loss_cfg.w_consistency * l_cons
                )
                mets = {
                    "dis_total": total,
                    "dis": loss_cfg.w_dis * l_dis,
                    "cutmix": loss_cfg.w_cutmix * l_cutmix,
                    "consistency": loss_cfg.w_consistency * l_cons,
                }
                return total, (de3, mets)

            (_, (d_extra_new, mets)), d_grads = jax.value_and_grad(
                dis_loss_fn, has_aux=True
            )(dp)
            if axis_name is not None:
                d_grads = jax.lax.pmean(d_grads, axis_name)
            d_updates, d_opt = dis_tx.update(d_grads, d_opt, dp)
            dp = optax.apply_updates(dp, d_updates)
            return (dp, jax.lax.stop_gradient(d_extra_new), d_opt), mets

        keys = jax.random.split(k_dis, loss_cfg.n_inner_loops)
        (dis_params, de_run, dis_opt), dis_mets = jax.lax.scan(
            dis_iter, (dis_params, de_run, state.dis_opt), keys
        )
        if axis_name is not None:
            # keep the SN power-iteration state replicated (DDP buffer
            # broadcast equivalent — see second_stage.py)
            de_run = jax.lax.pmean(de_run, axis_name)
        last = jax.tree.map(lambda a: a[-1], dis_mets)

        metrics = {**aux["metrics"], **last, "total": gen_total + last["dis_total"]}
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)

        new_state = state.replace(
            step=state.step + 1,
            rng=rng,
            dec_vars={"params": dec_params, **aux["dec_upd"]}
            if aux["dec_upd"]
            else {"params": dec_params, **dec_extra},
            dis_vars={"params": dis_params, **de_run},
            vq=aux["vq"],
            dec_opt=dec_opt,
            dis_opt=dis_opt,
        )
        return new_state, metrics

    return step_fn
