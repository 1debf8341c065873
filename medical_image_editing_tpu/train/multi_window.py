"""Multi-window trainer: every reconstruction loss evaluated simultaneously on
raw, lung-window and mediastinal-window renderings.

Behavioral spec: reference `src/trainers/multi_window_trainer.py` —
  * window converters `to_lung`/`to_mediastinal` = denormalize from the
    dataset window then re-normalize (clamp-free `t_normalize`, so gradients
    flow) into LUNG_WINDOW{1500,−550,2.0} / MEDIASTINAL_WINDOW{400,20,2.0}
    (`src/trainers/base.py:290-314,29-41`);
  * first_step (`:50-207`): first-stage objective with per-window
    recon/freq/perceptual weighted by `recon_weights/freq_weights/
    percep_weights` then averaged over the three windows;
  * second_step (`:208-390`): GAN stage where generator adversarial terms and
    the discriminator's hinge/CutMix/consistency losses are computed per
    window and averaged (single discriminator update, no inner loop);
  * joint_step (`:394-677`): encoder+decoder+discriminator trained in one
    step — first-stage losses + per-window adversarial on both views for the
    generator, then one discriminator update over all window×view pairs.

TPU-first: each mode is one jitted step; the per-window loop is a Python loop
over three traced window functions (unrolled at trace time — three fused loss
evaluations, no dynamic control flow).
"""

from functools import partial
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops.augment import cross_view_transform, random_transform
from ..ops.cutmix import cutmix_coordinates, cutmix_mask, mask_src_tgt
from ..ops.losses import embedding_loss, focal_frequency_loss, hinge_d_loss
from ..ops.onehot import one_hot
from ..ops.windowing import (
    LUNG_WINDOW,
    MEDIASTINAL_WINDOW,
    denorm,
    denormalize,
    norm,
    t_normalize,
)
from .first_stage import FirstStageLossConfig, make_first_stage_step
from .second_stage import SecondStageLossConfig, _apply, _split_vars, unet_perceptual_loss
from .state import TrainState, per_device_keys


def _maybe_remat_dis(dis, use_remat: bool):
    """Optionally rematerialize discriminator generator-pass applications.

    The joint/multi-window generator loss holds 6–12 discriminator forwards
    (windows × views ×(fake[+real])) alive for the backward pass; at 256²
    f32 that overflows a single chip's HBM (observed on v5e). `jax.checkpoint`
    trades those activations for recompute — the standard TPU memory lever.
    """
    if not use_remat:
        return _apply

    @partial(jax.checkpoint, static_argnums=(3,))
    def ckpt(params, extra, x, train):
        return _apply(dis, params, extra, x, train)

    return lambda _dis, params, extra, x, train: ckpt(params, extra, x, train)


def window_fns(dataset_window: Tuple[float, float, float]):
    """[identity, to_lung, to_mediastinal] converters.

    dataset_window: (width, center, scale) of the dataset normalization
    (config `dataset.window_width/center/scale`). Spec: `base.py:290-314`.
    """
    dw, dc, ds = dataset_window

    def to_window(x, wcfg):
        hu = denormalize(x, dw, dc, ds)
        return t_normalize(hu, wcfg.width, wcfg.center, wcfg.scale)

    return [
        lambda x: x,
        lambda x: to_window(x, LUNG_WINDOW),
        lambda x: to_window(x, MEDIASTINAL_WINDOW),
    ]


def make_multiwindow_recon_loss(
    loss_cfg,
    dataset_window,
    recon_weights: Sequence[float],
    freq_weights: Sequence[float],
    percep_weights: Sequence[float],
    perceptual_fn=None,
):
    """(recon, target) → (l_recon, l_freq, l_percep), each the mean over
    windows of the per-window weighted loss. Spec: `multi_window_trainer.py:93-119`."""
    fns = window_fns(dataset_window)
    n = float(len(fns))

    def f(recon, target):
        l_recon = jnp.float32(0.0)
        l_freq = jnp.float32(0.0)
        l_percep = jnp.float32(0.0)
        for i, wf in enumerate(fns):
            r, t = wf(recon), wf(target)
            if loss_cfg.use_recon_loss:
                l_recon += recon_weights[i] * jnp.mean((r - t) ** 2)
            if loss_cfg.use_frequency_loss:
                l_freq += freq_weights[i] * focal_frequency_loss(r, t)
            if loss_cfg.use_perceptual_loss and perceptual_fn is not None:
                l_percep += percep_weights[i] * perceptual_fn(r, t)
        return l_recon / n, l_freq / n, l_percep / n

    return f


def make_multi_window_first_stage_step(
    encoder,
    decoder,
    enc_tx,
    dec_tx,
    *,
    loss_cfg: FirstStageLossConfig,
    aug_cfg: Any,
    dict_size: int,
    dataset_window,
    recon_weights=(1.0, 1.0, 1.0),
    freq_weights=(1.0, 1.0, 1.0),
    percep_weights=(1.0, 1.0, 1.0),
    axis_name: Optional[str] = None,
    perceptual_fn=None,
):
    """first_step with per-window recon losses. Spec: `multi_window_trainer.py:50-207`."""
    recon_loss_fn = make_multiwindow_recon_loss(
        loss_cfg, dataset_window, recon_weights, freq_weights, percep_weights,
        perceptual_fn,
    )
    return make_first_stage_step(
        encoder,
        decoder,
        enc_tx,
        dec_tx,
        loss_cfg=loss_cfg,
        aug_cfg=aug_cfg,
        dict_size=dict_size,
        axis_name=axis_name,
        perceptual_fn=perceptual_fn,
        recon_loss_fn=recon_loss_fn,
    )


def make_multi_window_second_stage_step(
    encoder,
    decoder,
    dis,
    dec_tx: optax.GradientTransformation,
    dis_tx: optax.GradientTransformation,
    *,
    loss_cfg: SecondStageLossConfig,
    dataset_window,
    recon_weights=(1.0, 1.0, 1.0),
    freq_weights=(1.0, 1.0, 1.0),
    percep_weights=(1.0, 1.0, 1.0),
    axis_name: Optional[str] = None,
    perceptual_fn=None,
    use_remat: bool = False,
):
    """GAN second step over three windows (UNetDiscriminator).
    Spec: `multi_window_trainer.py:208-390`."""
    assert loss_cfg.dis_loss_type == "hinge_d_loss"
    # map+bottleneck protocol only (`multi_window_trainer.py:208-392`); a
    # PatchGAN's single logits array would fail the 3-tuple unpack opaquely
    assert type(dis).__name__ != "NLayerDiscriminator", (
        "multi-window GAN steps require UNetDiscriminator"
    )
    fns = window_fns(dataset_window)
    n = float(len(fns))
    _apply_gen = _maybe_remat_dis(dis, use_remat)

    def step_fn(state: TrainState, image, drop_prob=0.0):
        rng, k_drop, k_dis = jax.random.split(state.rng, 3)
        k_drop, k_dis = per_device_keys(axis_name, k_drop, k_dis)
        image = image.astype(jnp.float32)

        q, _, ids, _, _ = encoder(state.enc_vars, state.vq, image, train=False)
        q = jax.lax.stop_gradient(q)

        dec_params, dec_extra = _split_vars(state.dec_vars)
        dis_params, dis_extra = _split_vars(state.dis_vars)
        h, w_ = image.shape[1], image.shape[2]

        def gen_loss_fn(dp):
            dec_vars = {"params": dp, **dec_extra}
            mutable = [k for k in dec_extra.keys()]
            if mutable:
                o_recon, dec_upd = decoder.apply(
                    dec_vars, q, True, drop_prob,
                    mutable=mutable, rngs={"dropblock": k_drop},
                )
            else:
                o_recon, dec_upd = (
                    decoder.apply(dec_vars, q, True, drop_prob,
                                  rngs={"dropblock": k_drop}),
                    {},
                )
            o_recon = o_recon.astype(jnp.float32)

            l_recon = l_freq = l_percep = l_gen = l_upercep = jnp.float32(0.0)
            de = dis_extra
            for i, wf in enumerate(fns):
                r, t = wf(o_recon), wf(image)
                if loss_cfg.use_recon_loss:
                    l_recon += recon_weights[i] * jnp.mean((r - t) ** 2)
                if loss_cfg.use_frequency_loss:
                    l_freq += freq_weights[i] * focal_frequency_loss(r, t)
                if loss_cfg.use_perceptual_loss and perceptual_fn is not None:
                    l_percep += percep_weights[i] * perceptual_fn(r, t)
                (f_map, f_bottle, f_feats), de = _apply_gen(dis, dis_params, de, r, True)
                l_gen += -(jnp.mean(f_map) + jnp.mean(f_bottle))
                if loss_cfg.use_unet_perceptual_loss:
                    (_, _, r_feats), de = _apply_gen(
                        dis, dis_params, de, jax.lax.stop_gradient(t), True
                    )
                    l_upercep += unet_perceptual_loss(f_feats, r_feats)
            l_recon, l_freq, l_percep = l_recon / n, l_freq / n, l_percep / n
            l_gen, l_upercep = l_gen / n, l_upercep / n

            total = (
                loss_cfg.w_recon * l_recon
                + loss_cfg.w_freq * l_freq
                + loss_cfg.w_perceptual * l_percep
                + loss_cfg.w_gen * l_gen
                + loss_cfg.w_unet_perceptual * l_upercep
            )
            aux = {
                "recon_img": jax.lax.stop_gradient(o_recon),
                "dec_upd": dec_upd,
                "dis_extra": jax.lax.stop_gradient(de),
                "metrics": {
                    "gen_total": total,
                    "recon": loss_cfg.w_recon * l_recon,
                    "freq": loss_cfg.w_freq * l_freq,
                    "perceptual": loss_cfg.w_perceptual * l_percep,
                    "gen": loss_cfg.w_gen * l_gen,
                    "unet_perceptual": loss_cfg.w_unet_perceptual * l_upercep,
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

        o_recon = gen_aux["recon_img"]
        de_run = gen_aux["dis_extra"]

        def dis_loss_fn(dpp):
            l_dis = l_cutmix = l_cons = jnp.float32(0.0)
            de = de_run
            keys = jax.random.split(k_dis, len(fns))
            for i, wf in enumerate(fns):
                r, t = wf(o_recon), wf(image)
                (r_map, r_bottle, _), de = _apply_gen(dis, dpp, de, t, True)
                (f_map, f_bottle, _), de = _apply_gen(dis, dpp, de, r, True)
                l_dis += hinge_d_loss(r_map, f_map) + hinge_d_loss(r_bottle, f_bottle)

                k_box, k_inv = jax.random.split(keys[i])
                coords, _ = cutmix_coordinates(k_box, h, w_)
                mask2d = 1.0 - cutmix_mask(coords, h, w_)
                invert = jax.random.uniform(k_inv) > 0.5
                mask2d = jnp.where(invert, 1.0 - mask2d, mask2d)

                cmix = mask_src_tgt(t, r, mask2d)
                (c_map, c_bottle, _), de = _apply_gen(dis, dpp, de, cmix, True)
                m = mask2d[None, :, :, None]
                l_cutmix += jnp.mean(jax.nn.relu(1.0 + c_bottle)) + jnp.mean(
                    jax.nn.relu(1.0 - (m * 2.0 - 1.0) * c_map)
                )
                l_cons += jnp.mean((c_map - mask_src_tgt(r_map, f_map, mask2d)) ** 2)
            l_dis, l_cutmix, l_cons = l_dis / n, l_cutmix / n, l_cons / n
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
            return total, (de, mets)

        (_, (de_run, dis_mets)), dis_grads = jax.value_and_grad(
            dis_loss_fn, has_aux=True
        )(dis_params)
        if axis_name is not None:
            dis_grads = jax.lax.pmean(dis_grads, axis_name)
            # SN power-iteration state replicated (DDP buffer-broadcast
            # equivalent — see second_stage.py)
            de_run = jax.lax.pmean(de_run, axis_name)
        dis_updates, dis_opt = dis_tx.update(dis_grads, state.dis_opt, dis_params)
        dis_params = optax.apply_updates(dis_params, dis_updates)

        metrics = {
            **gen_aux["metrics"],
            **dis_mets,
            "total": gen_total + dis_mets["dis_total"],
        }
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)

        new_state = state.replace(
            step=state.step + 1,
            rng=rng,
            dec_vars={"params": dec_params, **gen_aux["dec_upd"]}
            if gen_aux["dec_upd"]
            else {"params": dec_params, **dec_extra},
            dis_vars={"params": dis_params, **jax.lax.stop_gradient(de_run)},
            dec_opt=dec_opt,
            dis_opt=dis_opt,
        )
        return new_state, metrics

    return step_fn


def make_joint_step(
    encoder,
    decoder,
    dis,
    enc_tx,
    dec_tx,
    dis_tx,
    *,
    first_cfg: FirstStageLossConfig,
    second_cfg: SecondStageLossConfig,
    aug_cfg: Any,
    dict_size: int,
    dataset_window,
    recon_weights=(1.0, 1.0, 1.0),
    freq_weights=(1.0, 1.0, 1.0),
    percep_weights=(1.0, 1.0, 1.0),
    axis_name: Optional[str] = None,
    perceptual_fn=None,
    use_remat: bool = False,
):
    """joint_step: enc+dec+dis in one step. Spec: `multi_window_trainer.py:394-677`.

    Generator pass = first-stage losses (dual views, multi-window recon) plus
    per-window adversarial + unet-perceptual on both views; then one
    discriminator update over all window×view pairs with CutMix consistency
    (one box per window, shared by the two views — `:530-560`).
    """
    assert type(dis).__name__ != "NLayerDiscriminator", (
        "multi-window GAN steps require UNetDiscriminator"
    )
    fns = window_fns(dataset_window)
    n = float(len(fns))
    _apply_gen = _maybe_remat_dis(dis, use_remat)

    def step_fn(state: TrainState, image, drop_prob=0.0):
        rng, k1, k2, kd1, kd2, k_dis = jax.random.split(state.rng, 6)
        k1, k2, kd1, kd2, k_dis = per_device_keys(
            axis_name, k1, k2, kd1, kd2, k_dis
        )
        image01 = denorm(image.astype(jnp.float32), 0.0, 1.0)
        noised_1, clear_1, mats_1 = random_transform(k1, image01, aug_cfg)
        noised_2, clear_2, mats_2 = random_transform(k2, image01, aug_cfg)
        noised_1, noised_2 = norm(noised_1), norm(noised_2)
        clear_1, clear_2 = norm(clear_1), norm(clear_2)

        enc_params, enc_extra = _split_vars(state.enc_vars)
        dec_params, dec_extra = _split_vars(state.dec_vars)
        dis_params, dis_extra = _split_vars(state.dis_vars)
        h, w_ = image.shape[1], image.shape[2]

        def gen_loss_fn(ep, dp):
            enc_vars = {"params": ep, **enc_extra}
            dec_vars = {"params": dp, **dec_extra}

            q1, commit_1, ids_1, vq_1, enc_upd = encoder(
                enc_vars, state.vq, noised_1, train=True
            )
            if enc_upd:
                enc_vars = {"params": ep, **enc_upd}
            q2, commit_2, ids_2, vq_2, enc_upd2 = encoder(
                enc_vars, vq_1, noised_2, train=True
            )
            l_commit = commit_1 + commit_2

            r_ids_1 = cross_view_transform(ids_1, mats_1, mats_2)
            r_ids_2 = cross_view_transform(ids_2, mats_2, mats_1)
            r_oh_1 = one_hot(r_ids_1, dict_size + 1)[..., 1:]
            r_oh_2 = one_hot(r_ids_2, dict_size + 1)[..., 1:]
            l_cross, l_dist, l_reg = embedding_loss(
                q1, r_oh_1, q2, r_oh_2, vq_2.embed,
                margin=first_cfg.margin,
                use_distance_loss=first_cfg.use_distance_loss,
                use_regularization_loss=first_cfg.use_regularization_loss,
            )

            mutable = [k for k in dec_extra.keys()]

            def decode(dvars, x, key):
                if mutable:
                    return decoder.apply(
                        dvars, x, True, drop_prob,
                        mutable=mutable, rngs={"dropblock": key},
                    )
                return decoder.apply(
                    dvars, x, True, drop_prob, rngs={"dropblock": key}
                ), {}

            if use_remat:
                decode = jax.checkpoint(decode)

            # BN running stats chain view-1 → view-2 like the encoder above
            # (torch buffers update in place between the two decodes).
            recon_1, dec_upd = decode(dec_vars, q1, kd1)
            dec_vars_2 = {"params": dp, **dec_upd} if dec_upd else dec_vars
            recon_2, dec_upd2 = decode(dec_vars_2, q2, kd2)
            dec_upd = dec_upd2 or dec_upd
            recon_1 = recon_1.astype(jnp.float32)
            recon_2 = recon_2.astype(jnp.float32)

            l_recon = l_freq = l_percep = l_gen = l_upercep = jnp.float32(0.0)
            de = dis_extra
            # per-window forward ordering matches the reference exactly
            # (`multi_window_trainer.py:451-480`): recon losses for both
            # views, then dis(rec_1), dis(rec_2), then dis(cimg_1),
            # dis(cimg_2) — the spectral-norm power-iteration sequence is
            # part of the observable numerics.
            for i, wf in enumerate(fns):
                r1, t1 = wf(recon_1), wf(clear_1)
                r2, t2 = wf(recon_2), wf(clear_2)
                for r, t in ((r1, t1), (r2, t2)):
                    if first_cfg.use_recon_loss:
                        l_recon += recon_weights[i] * jnp.mean((r - t) ** 2)
                    if first_cfg.use_frequency_loss:
                        l_freq += freq_weights[i] * focal_frequency_loss(r, t)
                    if first_cfg.use_perceptual_loss and perceptual_fn is not None:
                        l_percep += percep_weights[i] * perceptual_fn(r, t)
                (f_map_1, f_bottle_1, f_feats_1), de = _apply_gen(dis, dis_params, de, r1, True)
                (f_map_2, f_bottle_2, f_feats_2), de = _apply_gen(dis, dis_params, de, r2, True)
                l_gen += -(jnp.mean(f_map_1) + jnp.mean(f_bottle_1)) - (
                    jnp.mean(f_map_2) + jnp.mean(f_bottle_2)
                )
                if second_cfg.use_unet_perceptual_loss:
                    (_, _, r_feats_1), de = _apply_gen(
                        dis, dis_params, de, jax.lax.stop_gradient(t1), True
                    )
                    (_, _, r_feats_2), de = _apply_gen(
                        dis, dis_params, de, jax.lax.stop_gradient(t2), True
                    )
                    l_upercep += unet_perceptual_loss(
                        f_feats_1, r_feats_1
                    ) + unet_perceptual_loss(f_feats_2, r_feats_2)
            l_recon, l_freq, l_percep = l_recon / n, l_freq / n, l_percep / n
            l_gen, l_upercep = l_gen / n, l_upercep / n

            total = (
                first_cfg.w_commit * l_commit
                + first_cfg.w_cross * l_cross
                + first_cfg.w_dist * l_dist
                + first_cfg.w_reg * l_reg
                + first_cfg.w_recon * l_recon
                + first_cfg.w_freq * l_freq
                + first_cfg.w_perceptual * l_percep
                + second_cfg.w_gen * l_gen
                + second_cfg.w_unet_perceptual * l_upercep
            )
            aux = {
                "vq": vq_2,
                "enc_upd": enc_upd2 or enc_upd,
                "dec_upd": dec_upd,
                "recons": (jax.lax.stop_gradient(recon_1), jax.lax.stop_gradient(recon_2)),
                "dis_extra": jax.lax.stop_gradient(de),
                "metrics": {
                    "gen_total": total,
                    "commit": first_cfg.w_commit * l_commit,
                    "cross": first_cfg.w_cross * l_cross,
                    "dist": first_cfg.w_dist * l_dist,
                    "reg": first_cfg.w_reg * l_reg,
                    "recon": first_cfg.w_recon * l_recon,
                    "freq": first_cfg.w_freq * l_freq,
                    "perceptual": first_cfg.w_perceptual * l_percep,
                    "gen": second_cfg.w_gen * l_gen,
                    "unet_perceptual": second_cfg.w_unet_perceptual * l_upercep,
                },
            }
            return total, aux

        (gen_total, aux), grads = jax.value_and_grad(
            gen_loss_fn, argnums=(0, 1), has_aux=True
        )(enc_params, dec_params)
        enc_grads, dec_grads = grads
        if axis_name is not None:
            enc_grads = jax.lax.pmean(enc_grads, axis_name)
            dec_grads = jax.lax.pmean(dec_grads, axis_name)
        enc_updates, enc_opt = enc_tx.update(enc_grads, state.enc_opt, enc_params)
        enc_params = optax.apply_updates(enc_params, enc_updates)
        dec_updates, dec_opt = dec_tx.update(dec_grads, state.dec_opt, dec_params)
        dec_params = optax.apply_updates(dec_params, dec_updates)

        recon_1, recon_2 = aux["recons"]
        de_run = aux["dis_extra"]

        def dis_loss_fn(dpp):
            l_dis = l_cutmix = l_cons = jnp.float32(0.0)
            de = de_run
            keys = jax.random.split(k_dis, len(fns))
            # forward ordering per window matches the reference
            # (`multi_window_trainer.py:514-560`): dis(cimg_1), dis(cimg_2),
            # dis(rec_1), dis(rec_2), then the shared-box CutMix composites
            # dis(cmix_1), dis(cmix_2).
            for i, wf in enumerate(fns):
                r1, t1 = wf(recon_1), wf(clear_1)
                r2, t2 = wf(recon_2), wf(clear_2)
                (r_map_1, r_bottle_1, _), de = _apply_gen(dis, dpp, de, t1, True)
                (r_map_2, r_bottle_2, _), de = _apply_gen(dis, dpp, de, t2, True)
                (f_map_1, f_bottle_1, _), de = _apply_gen(dis, dpp, de, r1, True)
                (f_map_2, f_bottle_2, _), de = _apply_gen(dis, dpp, de, r2, True)
                l_dis += (
                    hinge_d_loss(r_map_1, f_map_1)
                    + hinge_d_loss(r_bottle_1, f_bottle_1)
                    + hinge_d_loss(r_map_2, f_map_2)
                    + hinge_d_loss(r_bottle_2, f_bottle_2)
                )

                k_box, k_inv = jax.random.split(keys[i])
                coords, _ = cutmix_coordinates(k_box, h, w_)
                mask2d = 1.0 - cutmix_mask(coords, h, w_)
                invert = jax.random.uniform(k_inv) > 0.5
                mask2d = jnp.where(invert, 1.0 - mask2d, mask2d)
                m = mask2d[None, :, :, None]

                cmix_1 = mask_src_tgt(t1, r1, mask2d)
                cmix_2 = mask_src_tgt(t2, r2, mask2d)
                (c_map_1, c_bottle_1, _), de = _apply_gen(dis, dpp, de, cmix_1, True)
                (c_map_2, c_bottle_2, _), de = _apply_gen(dis, dpp, de, cmix_2, True)
                l_cutmix += (
                    jnp.mean(jax.nn.relu(1.0 + c_bottle_1))
                    + jnp.mean(jax.nn.relu(1.0 + c_bottle_2))
                    + jnp.mean(jax.nn.relu(1.0 - (m * 2.0 - 1.0) * c_map_1))
                    + jnp.mean(jax.nn.relu(1.0 - (m * 2.0 - 1.0) * c_map_2))
                )
                l_cons += jnp.mean(
                    (c_map_1 - mask_src_tgt(r_map_1, f_map_1, mask2d)) ** 2
                ) + jnp.mean((c_map_2 - mask_src_tgt(r_map_2, f_map_2, mask2d)) ** 2)
            l_dis, l_cutmix, l_cons = l_dis / n, l_cutmix / n, l_cons / n
            total = (
                second_cfg.w_dis * l_dis
                + second_cfg.w_cutmix * l_cutmix
                + second_cfg.w_consistency * l_cons
            )
            mets = {
                "dis_total": total,
                "dis": second_cfg.w_dis * l_dis,
                "cutmix": second_cfg.w_cutmix * l_cutmix,
                "consistency": second_cfg.w_consistency * l_cons,
            }
            return total, (de, mets)

        (_, (de_run, dis_mets)), dis_grads = jax.value_and_grad(
            dis_loss_fn, has_aux=True
        )(dis_params)
        if axis_name is not None:
            dis_grads = jax.lax.pmean(dis_grads, axis_name)
            # SN power-iteration state replicated (DDP buffer-broadcast
            # equivalent — see second_stage.py)
            de_run = jax.lax.pmean(de_run, axis_name)
        dis_updates, dis_opt = dis_tx.update(dis_grads, state.dis_opt, dis_params)
        dis_params = optax.apply_updates(dis_params, dis_updates)

        metrics = {
            **aux["metrics"],
            **dis_mets,
            "total": gen_total + dis_mets["dis_total"],
        }
        if axis_name is not None:
            metrics = jax.lax.pmean(metrics, axis_name)

        new_state = state.replace(
            step=state.step + 1,
            rng=rng,
            enc_vars={"params": enc_params, **(aux["enc_upd"] or enc_extra)},
            dec_vars={"params": dec_params, **(aux["dec_upd"] or dec_extra)},
            dis_vars={"params": dis_params, **jax.lax.stop_gradient(de_run)},
            vq=aux["vq"],
            enc_opt=enc_opt,
            dec_opt=dec_opt,
            dis_opt=dis_opt,
        )
        return new_state, metrics

    return step_fn
