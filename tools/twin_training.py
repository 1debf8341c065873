"""Twin-training equivalence experiment: reference torch vs this framework.

VERDICT r2 "Next round" item 1 / Weak #1: all prior parity evidence was
step-level (golden loss values, transplant forwards); nothing pinned the
BASELINE north-star "recon PSNR/SSIM within 0.1 dB of the reference" as a
*training outcome*. This experiment trains BOTH frameworks from the same
initial weights on the same synthetic dataset with the same deterministic
augmentation for N steps, then compares:

  * the per-step total-loss trajectories (pointwise relative deltas),
  * final held-out recon PSNR / SSIM / NMSE (computed by the SAME metric
    code on both frameworks' reconstructions),
  * final codebook-usage entropy.

Reference side: the reference's OWN `SingleWindowTrainer.training_step`
(`/root/reference/src/trainers/single_window_trainer.py:68-159`) executed
verbatim under tests/ref_trainer_env.py's dependency shims — torch CPU, the
trainer's own two Adam optimizers and VQ EMA buffers.

Our side: `make_first_stage_step` jitted on CPU at f32/highest matmul
precision (same platform as torch, so numerics are comparable; nothing here
depends on the TPU).

Matched-determinism choices (each one is a controlled variable, not a
simplification of the objective):
  * identical initial weights — the reference trainer's init is transplanted
    into our TrainState via utils.torch_import (stronger than "same seed");
  * identical batch order — a fixed synthetic dataset sliced identically;
  * deterministic augmentation — RandomHorizontalFlip with p=1.0 fires on
    every sample in both frameworks (kornia semantics pinned in
    tests/test_warp_torch_parity.py), so the equivariance machinery
    (id-map reverse/forward warps, `random_transform.py:93-112`) is
    exercised without cross-framework RNG coupling.

Run:  python tools/twin_training.py [--steps 300] [--size 64] [--out twin.json]
Test: tests/test_twin_training.py runs a shortened variant in the slow tier.
"""

import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("MPLBACKEND", "Agg")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

import numpy as np

LR = 1e-4
LOSS_KEYS = ("total", "commit", "cross", "dist", "reg", "recon", "freq")


def make_dataset(n, size, seed=0):
    """Structured synthetic CT-like slices in [-1, 1]: smooth gradient +
    gaussian blobs (same family as tests/test_learning_dynamics.py) — enough
    structure for the codebook/recon losses to have signal."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size] / size
    imgs = []
    for _ in range(n):
        img = 0.4 * (yy - 0.5) + 0.1 * rng.normal()
        for _ in range(3):
            cy, cx = rng.uniform(0.2, 0.8, 2)
            s, a = rng.uniform(0.03, 0.1), rng.uniform(0.3, 0.9)
            img = img + a * np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s**2)))
        imgs.append(np.clip(img, -1, 1))
    return np.stack(imgs)[..., None].astype(np.float32)


def run_twin(*, steps=300, size=64, batch=4, dict_size=5,
             filters=(4, 8, 16, 32, 64), n_train=32, n_eval=16, seed=0,
             use_flip_aug=True, log_every=25, quiet=False):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp
    import torch

    import ref_trainer_env as env
    from medical_image_editing_tpu.models import UNetDecoder
    from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ
    from medical_image_editing_tpu.ops import metrics as M
    from medical_image_editing_tpu.train import create_train_state
    from medical_image_editing_tpu.train.first_stage import (
        FirstStageLossConfig,
        make_first_stage_step,
    )
    from medical_image_editing_tpu.train.state import make_optimizer
    from medical_image_editing_tpu.utils import torch_import as ti

    ref_trainers = env.load_reference_trainers()

    aug_modules = ("RandomHorizontalFlip",) if use_flip_aug else ()
    torch.manual_seed(seed)
    cfg = env.make_ref_config(
        training_mode="first_step", dict_size=dict_size, filters=list(filters),
        image_size=(size, size), lr=LR, aug_modules=aug_modules, momentum=0.99,
    )
    tr = ref_trainers.SingleWindowTrainer(
        cfg, save_dir_path="/tmp/twin_ref", monitoring_metrics=[]
    )
    tr.encoder.init_embed = True  # codebook transplanted, not k-means'd
    tr.train()
    sd = env.trainer_state_dict(tr)

    # ---- our side: transplant the reference's exact initial weights --------
    jenc = EncoderWithVQ(filters=tuple(filters), dict_size=dict_size, momentum=0.99)
    jdec = UNetDecoder(out_channels=1, filters=tuple(filters),
                       dropped_skip_layers=(), use_pixel_shuffle=False)
    enc_vars = ti.import_unet_encoder(sd, "encoder.")
    vq0 = ti.import_vq_state(sd, "encoder.vq.")
    dec_skel = jdec.init(
        {"params": jax.random.key(0), "dropblock": jax.random.key(1)},
        jnp.zeros((batch, size, size, filters[0])), train=False,
    )
    dec_vars = {"params": ti.import_unet_decoder(sd, "decoder.")["params"],
                "batch_stats": dec_skel["batch_stats"]}
    tx = make_optimizer(LR)
    state = create_train_state(jax.random.key(42), enc_vars, dec_vars, vq0, tx, tx)

    aug_cfg = {"modules": list(aug_modules)}
    if use_flip_aug:
        aug_cfg["RandomHorizontalFlip"] = {"p": 1.0}
    loss_cfg = FirstStageLossConfig(
        w_commit=1.0, w_cross=0.5, w_dist=0.25, w_reg=0.125,
        w_recon=1.0, w_freq=0.5, margin=0.5,
    )
    step = jax.jit(make_first_stage_step(
        jenc, jdec, tx, tx, loss_cfg=loss_cfg, aug_cfg=aug_cfg,
        dict_size=dict_size,
    ))

    data = make_dataset(n_train, size, seed=seed)
    eval_data = make_dataset(n_eval, size, seed=seed + 1)

    # ---- twin training loop -------------------------------------------------
    curves = {k: {"ours": [], "ref": []} for k in LOSS_KEYS}
    t0 = time.time()
    for i in range(steps):
        lo = (i * batch) % n_train
        img = data[lo:lo + batch]
        if img.shape[0] < batch:  # wrap
            img = np.concatenate([img, data[: batch - img.shape[0]]])

        state, m = step(state, jnp.asarray(img), jnp.float32(0.0))

        tbatch = {"image": torch.from_numpy(img.transpose(0, 3, 1, 2).copy())}
        tr.training_step(tbatch, i)
        tr.global_step += 1

        for k in LOSS_KEYS:
            curves[k]["ours"].append(float(m[k]))
            curves[k]["ref"].append(float(tr.logged[k]))
        if not quiet and (i % log_every == 0 or i == steps - 1):
            o, r = curves["total"]["ours"][-1], curves["total"]["ref"][-1]
            print(f"step {i:4d}  total ours={o:9.4f}  ref={r:9.4f}  "
                  f"rel Δ={abs(o - r) / max(abs(r), 1e-9):.2e}", flush=True)

    train_s = time.time() - t0

    # ---- held-out evaluation, SAME metric code for both sides --------------
    def eval_ours():
        q, _, ids, _, _ = jenc(state.enc_vars, state.vq, jnp.asarray(eval_data),
                               train=False)
        recon = jdec.apply(state.dec_vars, q, train=False)
        return np.asarray(recon), np.asarray(ids)

    def eval_ref():
        tr.eval()
        with torch.no_grad():
            x = torch.from_numpy(eval_data.transpose(0, 3, 1, 2).copy())
            q, _, ids = tr.encoder(x)
            recon = tr.decoder(q)
        return (recon.numpy().transpose(0, 2, 3, 1),
                ids.numpy().transpose(0, 2, 1))  # undo ref H<->W id transpose

    rec_o, ids_o = eval_ours()
    rec_r, ids_r = eval_ref()
    tgt = eval_data

    def metrics_for(rec, ids):
        return dict(
            psnr=float(M.psnr(jnp.asarray(rec), jnp.asarray(tgt))),
            ssim=float(M.ssim(jnp.asarray(rec), jnp.asarray(tgt))),
            nmse=float(M.nmse(jnp.asarray(rec), jnp.asarray(tgt))),
            entropy=float(M.label_entropy(jnp.asarray(ids) - 1, dict_size)),
        )

    ours, ref = metrics_for(rec_o, ids_o), metrics_for(rec_r, ids_r)

    tot_o = np.array(curves["total"]["ours"])
    tot_r = np.array(curves["total"]["ref"])
    rel = np.abs(tot_o - tot_r) / np.maximum(np.abs(tot_r), 1e-9)
    tail = max(1, steps // 10)
    result = {
        "config": dict(steps=steps, size=size, batch=batch,
                       dict_size=dict_size, filters=list(filters),
                       n_train=n_train, n_eval=n_eval, lr=LR,
                       aug="hflip_p1" if use_flip_aug else "identity"),
        "train_seconds": round(train_s, 1),
        "trajectory": {
            "total_rel_delta_median": float(np.median(rel)),
            "total_rel_delta_p90": float(np.percentile(rel, 90)),
            "total_rel_delta_max": float(rel.max()),
            "total_first": [float(tot_o[0]), float(tot_r[0])],
            "total_last_mean": [float(tot_o[-tail:].mean()),
                                float(tot_r[-tail:].mean())],
        },
        "final_metrics": {"ours": ours, "reference": ref},
        "deltas": {
            "psnr_db": abs(ours["psnr"] - ref["psnr"]),
            "ssim": abs(ours["ssim"] - ref["ssim"]),
            "nmse": abs(ours["nmse"] - ref["nmse"]),
            "entropy_bits": abs(ours["entropy"] - ref["entropy"]),
        },
        "curves": curves,
    }
    return result


GAN_LOSS_KEYS = ("total", "gen_total", "recon", "freq", "gen",
                 "unet_perceptual", "dis_total", "dis", "cutmix", "consistency")


def _derive_cutmix_boxes(steps, size, n_inner_loops=1, seed_key=42):
    """Replicate make_second_stage_step's per-step RNG chain on the host and
    return the CutMix box + invert flag our step will draw at every step, so
    the reference trainer can be fed the identical boxes (it samples them
    from module-level np/python RNG — `single_window_trainer.py:332-344`).
    Chain (second_stage.py step_fn): state.rng → split(3)[2] = k_dis →
    split(n_inner)[i] → split → (k_box, k_inv)."""
    import jax

    from medical_image_editing_tpu.ops.cutmix import cutmix_coordinates

    rng = jax.random.key(seed_key)
    per_step = []
    for _ in range(steps):
        rng, _k_drop, k_dis = jax.random.split(rng, 3)
        boxes = []
        for key_i in jax.random.split(k_dis, n_inner_loops):
            k_box, k_inv = jax.random.split(key_i)
            ((y0, y1), (x0, x1)), lam = cutmix_coordinates(k_box, size, size)
            invert = bool(jax.random.uniform(k_inv) > 0.5)
            boxes.append(((int(y0), int(y1), int(x0), int(x1)),
                          float(lam), invert))
        per_step.append(boxes)
    return per_step


def run_twin_gan(*, steps=150, size=128, batch=2, dict_size=5,
                 filters=(4, 8, 16, 32, 64), n_train=16, n_eval=8, seed=0,
                 log_every=10, quiet=False):
    """Twin-train the GAN second stage (VERDICT r3 item 5): the reference's
    OWN `_train_second_step_unet_dis` (executed verbatim, torch CPU) vs our
    `make_second_stage_step`, from identical transplanted weights, identical
    batch order, and identical per-step CutMix boxes (the reference's
    module-level RNG is pinned to the boxes our step derives from its own
    key chain). Drift risks specific to this stage — spectral-norm power
    -iteration state, CutMix compositing, inner-loop ordering, the stale
    -recon quirk (`single_window_trainer.py:264-432`) — are all on the path.

    Size is 128 minimum: the reference's Unet_Discriminator arch table has no
    smaller resolution (`unet_discriminator.py:358-369`)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp
    import torch

    import parity_helpers as ph
    import ref_trainer_env as env
    from medical_image_editing_tpu.models import UNetDecoder, UNetDiscriminator
    from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ
    from medical_image_editing_tpu.ops import metrics as M
    from medical_image_editing_tpu.train import create_train_state
    from medical_image_editing_tpu.train.second_stage import (
        SecondStageLossConfig,
        make_second_stage_step,
    )
    from medical_image_editing_tpu.train.state import make_optimizer
    from medical_image_editing_tpu.utils import torch_import as ti

    ref_trainers = env.load_reference_trainers()

    torch.manual_seed(seed)
    cfg = env.make_ref_config(
        training_mode="second_step", dict_size=dict_size,
        filters=list(filters), dis_model="UNetDiscriminator",
        image_size=(size, size), use_l1_loss=True, lr=LR, momentum=0.99,
    )
    with env.grayscale_unet_dis_arch():
        tr = ref_trainers.SingleWindowTrainer(
            cfg, save_dir_path="/tmp/twin_ref_gan", monitoring_metrics=[]
        )
    env.grayscale_unet_dis_arch.fix(tr.dis)
    tr.encoder.init_embed = True  # codebook transplanted, not k-means'd
    tr.train()
    sd = env.trainer_state_dict(tr)
    dis_vars0 = ph.unet_discriminator_params(tr.dis)

    # ---- our side: transplant the reference's exact initial weights --------
    jenc = EncoderWithVQ(filters=tuple(filters), dict_size=dict_size,
                         momentum=0.99)
    jdec = UNetDecoder(out_channels=1, filters=tuple(filters),
                       dropped_skip_layers=(), use_pixel_shuffle=False)
    jdis = UNetDiscriminator(D_ch=8, resolution=size)
    enc_vars = ti.import_unet_encoder(sd, "encoder.")
    vq0 = ti.import_vq_state(sd, "encoder.vq.")
    dec_skel = jdec.init(
        {"params": jax.random.key(0), "dropblock": jax.random.key(1)},
        jnp.zeros((batch, size, size, filters[0])), train=False,
    )
    dec_vars = {"params": ti.import_unet_decoder(sd, "decoder.")["params"],
                "batch_stats": dec_skel["batch_stats"]}
    tx = make_optimizer(LR)
    state = create_train_state(
        jax.random.key(42), enc_vars, dec_vars, vq0, tx, tx,
        dis_vars=dis_vars0, dis_tx=tx,
    )

    loss_cfg = SecondStageLossConfig(
        w_recon=1.0, w_freq=0.5, w_gen=0.25, w_unet_perceptual=0.125,
        w_dis=1.0, w_cutmix=0.5, w_consistency=0.25,
        use_l1_loss=True, use_unet_perceptual_loss=True, n_inner_loops=1,
    )
    step = jax.jit(make_second_stage_step(
        jenc, jdec, jdis, tx, tx, loss_cfg=loss_cfg,
        dis_type="UNetDiscriminator",
    ))

    boxes = _derive_cutmix_boxes(steps, size)
    data = make_dataset(n_train, size, seed=seed)
    eval_data = make_dataset(n_eval, size, seed=seed + 1)

    # ---- twin training loop (reference fed our per-step CutMix boxes) ------
    sw = env.sys.modules["trainers.single_window_trainer"]
    orig_coords, orig_random = sw.cutmix_coordinates, sw.random
    curves = {k: {"ours": [], "ref": []} for k in GAN_LOSS_KEYS}
    t0 = time.time()
    try:
        for i in range(steps):
            lo = (i * batch) % n_train
            img = data[lo:lo + batch]
            if img.shape[0] < batch:
                img = np.concatenate([img, data[: batch - img.shape[0]]])

            state, m = step(state, jnp.asarray(img))

            (y0, y1, x0, x1), lam, invert = boxes[i][0]
            sw.cutmix_coordinates = (
                lambda h, w, alpha=1.0, _b=((y0, y1), (x0, x1)), _l=lam: (_b, _l)
            )
            sw.random = lambda _inv=invert: 0.9 if _inv else 0.1
            tbatch = {"image": torch.from_numpy(img.transpose(0, 3, 1, 2).copy())}
            tr.training_step(tbatch, i)
            tr.global_step += 1

            for k in GAN_LOSS_KEYS:
                curves[k]["ours"].append(float(m[k]))
                curves[k]["ref"].append(float(tr.logged[k]))
            if not quiet and (i % log_every == 0 or i == steps - 1):
                o, r = curves["total"]["ours"][-1], curves["total"]["ref"][-1]
                d, dr = curves["dis_total"]["ours"][-1], curves["dis_total"]["ref"][-1]
                print(f"step {i:4d}  total ours={o:9.4f} ref={r:9.4f} "
                      f"relΔ={abs(o - r) / max(abs(r), 1e-9):.2e} | "
                      f"dis ours={d:8.4f} ref={dr:8.4f}", flush=True)
    finally:
        sw.cutmix_coordinates, sw.random = orig_coords, orig_random
    train_s = time.time() - t0

    # ---- held-out: recon metrics + discriminator statistics, same code -----
    def eval_ours():
        q, *_ = jenc(state.enc_vars, state.vq, jnp.asarray(eval_data),
                     train=False)
        recon = jdec.apply(state.dec_vars, q, train=False)
        d_real = jdis.apply(state.dis_vars, jnp.asarray(eval_data), False)
        d_fake = jdis.apply(state.dis_vars, recon, False)
        return np.asarray(recon), d_real, d_fake

    def eval_ref():
        tr.eval()
        with torch.no_grad():
            x = torch.from_numpy(eval_data.transpose(0, 3, 1, 2).copy())
            q, _, _ = tr.encoder(x)
            recon = tr.decoder(q)
            d_real = tr.dis(x)
            d_fake = tr.dis(recon)
        return (recon.numpy().transpose(0, 2, 3, 1),
                [t.numpy() for t in d_real[:2]],
                [t.numpy() for t in d_fake[:2]])

    rec_o, dro, dfo = eval_ours()
    rec_r, drr, dfr = eval_ref()
    tgt = eval_data

    def dis_stats(d_real, d_fake):
        r_map, r_bottle = np.asarray(d_real[0]), np.asarray(d_real[1])
        f_map, f_bottle = np.asarray(d_fake[0]), np.asarray(d_fake[1])
        return dict(
            real_map_mean=float(r_map.mean()), real_map_std=float(r_map.std()),
            fake_map_mean=float(f_map.mean()), fake_map_std=float(f_map.std()),
            real_bottleneck_mean=float(r_bottle.mean()),
            fake_bottleneck_mean=float(f_bottle.mean()),
        )

    ours = dict(
        psnr=float(M.psnr(jnp.asarray(rec_o), jnp.asarray(tgt))),
        ssim=float(M.ssim(jnp.asarray(rec_o), jnp.asarray(tgt))),
        **dis_stats(dro, dfo),
    )
    ref = dict(
        psnr=float(M.psnr(jnp.asarray(rec_r), jnp.asarray(tgt))),
        ssim=float(M.ssim(jnp.asarray(rec_r), jnp.asarray(tgt))),
        **dis_stats(drr, dfr),
    )

    def _traj(key):
        o = np.array(curves[key]["ours"])
        r = np.array(curves[key]["ref"])
        rel = np.abs(o - r) / np.maximum(np.abs(r), 1e-9)
        return {"median": float(np.median(rel)),
                "p90": float(np.percentile(rel, 90)),
                "max": float(rel.max()),
                "first": [float(o[0]), float(r[0])],
                "last": [float(o[-1]), float(r[-1])]}

    result = {
        "config": dict(steps=steps, size=size, batch=batch,
                       dict_size=dict_size, filters=list(filters),
                       n_train=n_train, n_eval=n_eval, lr=LR,
                       dis="UNetDiscriminator", n_inner_loops=1),
        "train_seconds": round(train_s, 1),
        "trajectory": {k: _traj(k) for k in
                       ("total", "gen_total", "dis_total", "cutmix",
                        "consistency")},
        "final_metrics": {"ours": ours, "reference": ref},
        "deltas": {
            "psnr_db": abs(ours["psnr"] - ref["psnr"]),
            "ssim": abs(ours["ssim"] - ref["ssim"]),
            "real_map_mean": abs(ours["real_map_mean"] - ref["real_map_mean"]),
            "fake_map_mean": abs(ours["fake_map_mean"] - ref["fake_map_mean"]),
            "real_bottleneck_mean": abs(ours["real_bottleneck_mean"]
                                        - ref["real_bottleneck_mean"]),
            "fake_bottleneck_mean": abs(ours["fake_bottleneck_mean"]
                                        - ref["fake_bottleneck_mean"]),
        },
        "curves": curves,
    }
    return result


JOINT_LOSS_KEYS = ("total", "gen_total", "commit", "cross", "dist", "reg",
                   "recon", "freq", "gen", "unet_perceptual",
                   "dis_total", "dis", "cutmix", "consistency")


def _derive_joint_cutmix_boxes(steps, size, n_windows=3, seed_key=42):
    """Replicate make_joint_step's per-step RNG chain on the host: state.rng →
    split(6)[5] = k_dis → split(n_windows)[i] → split → (k_box, k_inv). One
    box per window per step, shared by the two views
    (`multi_window_trainer.py:530-560`)."""
    import jax

    from medical_image_editing_tpu.ops.cutmix import cutmix_coordinates

    rng = jax.random.key(seed_key)
    per_step = []
    for _ in range(steps):
        rng, _k1, _k2, _kd1, _kd2, k_dis = jax.random.split(rng, 6)
        boxes = []
        for key_i in jax.random.split(k_dis, n_windows):
            k_box, k_inv = jax.random.split(key_i)
            ((y0, y1), (x0, x1)), lam = cutmix_coordinates(k_box, size, size)
            invert = bool(jax.random.uniform(k_inv) > 0.5)
            boxes.append(((int(y0), int(y1), int(x0), int(x1)),
                          float(lam), invert))
        per_step.append(boxes)
    return per_step


def run_twin_joint(*, steps=100, size=128, batch=2, dict_size=5,
                   filters=(4, 8, 16, 32, 64), n_train=16, n_eval=8, seed=0,
                   log_every=10, quiet=False):
    """Twin-train the multi-window JOINT step (VERDICT r4 item 7 — the last
    trainer flavor with only step-level value pins): the reference's OWN
    `MultiWindowTrainer._train_joint_step`
    (`/root/reference/src/trainers/multi_window_trainer.py:394-677`) executed
    verbatim (torch CPU, tests/ref_trainer_env.py shims) vs our
    `make_joint_step`, from identical transplanted weights, identical batch
    order, deterministic HFlip(p=1) two-view augmentation, and identical
    per-window CutMix boxes (the reference's module-level RNG pinned to the
    boxes our step derives from its key chain).

    Everything the joint step adds over the GAN twin is on the path: dual
    encoder views + VQ EMA chaining, cross-view id warps, three-window
    recon/freq losses, per-window adversarial + unet-perceptual, and the
    three-window discriminator update with shared-box CutMix consistency.
    Perceptual loss runs the reference's use_perceptual_loss=False config
    (w.perceptual=0; the torchvision-weights channel is env-blocked —
    PERF.md "Missing #1")."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp
    import torch

    import parity_helpers as ph
    import ref_trainer_env as env
    from medical_image_editing_tpu.models import UNetDecoder, UNetDiscriminator
    from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ
    from medical_image_editing_tpu.ops import metrics as M
    from medical_image_editing_tpu.train import create_train_state
    from medical_image_editing_tpu.train.first_stage import FirstStageLossConfig
    from medical_image_editing_tpu.train.multi_window import make_joint_step
    from medical_image_editing_tpu.train.second_stage import SecondStageLossConfig
    from medical_image_editing_tpu.train.state import make_optimizer
    from medical_image_editing_tpu.utils import torch_import as ti

    ref_trainers = env.load_reference_trainers()

    torch.manual_seed(seed)
    cfg = env.make_ref_config(
        training_mode="joint_step", dict_size=dict_size,
        filters=list(filters), dis_model="UNetDiscriminator",
        image_size=(size, size), lr=LR, momentum=0.99,
        aug_modules=("RandomHorizontalFlip",),
    )
    with env.grayscale_unet_dis_arch():
        tr = ref_trainers.MultiWindowTrainer(
            cfg, save_dir_path="/tmp/twin_ref_joint", monitoring_metrics=[]
        )
    env.grayscale_unet_dis_arch.fix(tr.dis)
    tr.encoder.init_embed = True  # codebook transplanted, not k-means'd
    # use_perceptual_loss=False skips construction, but _train_joint_step
    # calls self.perceptual_loss unconditionally (`:467`) — a reference
    # latent crash its shipped joint configs avoid by enabling it; with
    # w.perceptual = 0 a zero stub is loss-equivalent on both sides
    tr.perceptual_loss = lambda a, b: torch.tensor(0.0)
    # reference latent bug #2: `_train_joint_step:475` calls
    # self.calc_unet_perceptual, which exists NOWHERE in the reference —
    # the joint path would crash with use_unet_perceptual_loss=True. The
    # evident intent is TrainerBase.unet_perceptual_loss (the name
    # `_train_second_step:302` uses for the identical computation); bind it.
    tr.calc_unet_perceptual = tr.unet_perceptual_loss
    tr.train()
    sd = env.trainer_state_dict(tr)
    dis_vars0 = ph.unet_discriminator_params(tr.dis)

    # ---- our side: transplant the reference's exact initial weights --------
    dsw = (float(cfg.dataset.window_width), float(cfg.dataset.window_center),
           float(cfg.dataset.window_scale))
    jenc = EncoderWithVQ(filters=tuple(filters), dict_size=dict_size,
                         momentum=0.99)
    jdec = UNetDecoder(out_channels=1, filters=tuple(filters),
                       dropped_skip_layers=(), use_pixel_shuffle=False)
    jdis = UNetDiscriminator(D_ch=8, resolution=size)
    enc_vars = ti.import_unet_encoder(sd, "encoder.")
    vq0 = ti.import_vq_state(sd, "encoder.vq.")
    dec_skel = jdec.init(
        {"params": jax.random.key(0), "dropblock": jax.random.key(1)},
        jnp.zeros((batch, size, size, filters[0])), train=False,
    )
    dec_vars = {"params": ti.import_unet_decoder(sd, "decoder.")["params"],
                "batch_stats": dec_skel["batch_stats"]}
    tx = make_optimizer(LR)
    state = create_train_state(
        jax.random.key(42), enc_vars, dec_vars, vq0, tx, tx,
        dis_vars=dis_vars0, dis_tx=tx,
    )

    w = cfg.loss.loss_weight
    first_cfg = FirstStageLossConfig(
        w_commit=w.commit, w_cross=w.cross, w_dist=w.dist, w_reg=w.reg,
        w_recon=w.recon, w_freq=w.freq, w_perceptual=w.perceptual,
        margin=0.5, use_perceptual_loss=False,
    )
    second_cfg = SecondStageLossConfig(
        w_gen=w.gen, w_unet_perceptual=w.unet_perceptual, w_dis=w.dis,
        w_cutmix=w.cutmix, w_consistency=w.consistency,
        use_unet_perceptual_loss=True,
    )
    aug_cfg = {"modules": ["RandomHorizontalFlip"],
               "RandomHorizontalFlip": {"p": 1.0}}
    step = jax.jit(make_joint_step(
        jenc, jdec, jdis, tx, tx, tx,
        first_cfg=first_cfg, second_cfg=second_cfg, aug_cfg=aug_cfg,
        dict_size=dict_size, dataset_window=dsw,
        recon_weights=tuple(cfg.loss.recon_weights),
        freq_weights=tuple(cfg.loss.freq_weights),
        percep_weights=tuple(cfg.loss.percep_weights),
    ))

    boxes = _derive_joint_cutmix_boxes(steps, size)
    data = make_dataset(n_train, size, seed=seed)
    eval_data = make_dataset(n_eval, size, seed=seed + 1)

    # ---- twin loop (reference fed our per-window CutMix boxes) -------------
    mw = env.sys.modules["trainers.multi_window_trainer"]
    orig_coords, orig_random = mw.cutmix_coordinates, mw.random
    curves = {k: {"ours": [], "ref": []} for k in JOINT_LOSS_KEYS}
    t0 = time.time()
    try:
        for i in range(steps):
            lo = (i * batch) % n_train
            img = data[lo:lo + batch]
            if img.shape[0] < batch:
                img = np.concatenate([img, data[: batch - img.shape[0]]])

            state, m = step(state, jnp.asarray(img))

            # one box per window, consumed in window order (`:530-560`)
            it = iter(boxes[i])
            flags = iter([b[2] for b in boxes[i]])
            mw.cutmix_coordinates = (
                lambda h, w2, alpha=1.0, _it=it: (
                    lambda b: (((b[0][0], b[0][1]), (b[0][2], b[0][3])), b[1])
                )(next(_it))
            )
            mw.random = lambda _f=flags: 0.9 if next(_f) else 0.1
            tbatch = {"image": torch.from_numpy(img.transpose(0, 3, 1, 2).copy())}
            tr.training_step(tbatch, i)
            tr.global_step += 1

            for k in JOINT_LOSS_KEYS:
                curves[k]["ours"].append(float(m[k]))
                curves[k]["ref"].append(float(tr.logged[k]))
            if not quiet and (i % log_every == 0 or i == steps - 1):
                o, r = curves["total"]["ours"][-1], curves["total"]["ref"][-1]
                d, dr = curves["dis_total"]["ours"][-1], curves["dis_total"]["ref"][-1]
                print(f"step {i:4d}  total ours={o:9.4f} ref={r:9.4f} "
                      f"relΔ={abs(o - r) / max(abs(r), 1e-9):.2e} | "
                      f"dis ours={d:8.4f} ref={dr:8.4f}", flush=True)
    finally:
        mw.cutmix_coordinates, mw.random = orig_coords, orig_random
    train_s = time.time() - t0

    # ---- held-out: recon metrics + D statistics, same code both sides ------
    def eval_ours():
        q, *_ = jenc(state.enc_vars, state.vq, jnp.asarray(eval_data),
                     train=False)
        recon = jdec.apply(state.dec_vars, q, train=False)
        d_real = jdis.apply(state.dis_vars, jnp.asarray(eval_data), False)
        d_fake = jdis.apply(state.dis_vars, recon, False)
        return np.asarray(recon), d_real, d_fake

    def eval_ref():
        tr.eval()
        with torch.no_grad():
            x = torch.from_numpy(eval_data.transpose(0, 3, 1, 2).copy())
            q, _, _ = tr.encoder(x)
            recon = tr.decoder(q)
            d_real = tr.dis(x)
            d_fake = tr.dis(recon)
        return (recon.numpy().transpose(0, 2, 3, 1),
                [t.numpy() for t in d_real[:2]],
                [t.numpy() for t in d_fake[:2]])

    rec_o, dro, dfo = eval_ours()
    rec_r, drr, dfr = eval_ref()
    tgt = eval_data

    def stats(rec, d_real, d_fake):
        return dict(
            psnr=float(M.psnr(jnp.asarray(rec), jnp.asarray(tgt))),
            ssim=float(M.ssim(jnp.asarray(rec), jnp.asarray(tgt))),
            real_map_mean=float(np.asarray(d_real[0]).mean()),
            fake_map_mean=float(np.asarray(d_fake[0]).mean()),
        )

    ours, ref = stats(rec_o, dro, dfo), stats(rec_r, drr, dfr)

    def _traj(key):
        o = np.array(curves[key]["ours"])
        r = np.array(curves[key]["ref"])
        rel = np.abs(o - r) / np.maximum(np.abs(r), 1e-9)
        return {"median": float(np.median(rel)),
                "p90": float(np.percentile(rel, 90)),
                "max": float(rel.max()),
                "first": [float(o[0]), float(r[0])],
                "last": [float(o[-1]), float(r[-1])]}

    return {
        "config": dict(steps=steps, size=size, batch=batch,
                       dict_size=dict_size, filters=list(filters),
                       n_train=n_train, n_eval=n_eval, lr=LR,
                       dataset_window=list(dsw),
                       recon_weights=list(cfg.loss.recon_weights),
                       freq_weights=list(cfg.loss.freq_weights)),
        "train_seconds": round(train_s, 1),
        "trajectory": {k: _traj(k) for k in
                       ("total", "gen_total", "dis_total", "cutmix",
                        "consistency", "cross")},
        "final_metrics": {"ours": ours, "reference": ref},
        "deltas": {
            "psnr_db": abs(ours["psnr"] - ref["psnr"]),
            "ssim": abs(ours["ssim"] - ref["ssim"]),
            "real_map_mean": abs(ours["real_map_mean"] - ref["real_map_mean"]),
            "fake_map_mean": abs(ours["fake_map_mean"] - ref["fake_map_mean"]),
        },
        "curves": curves,
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--identity-aug", action="store_true")
    ap.add_argument("--joint", action="store_true",
                    help="twin-train the multi-window JOINT step "
                         "(MultiWindowTrainer._train_joint_step) instead of "
                         "the first stage; --size must be >= 128")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--gan", action="store_true",
                    help="twin-train the GAN second stage (UNetDiscriminator "
                         "+ CutMix) instead of the first stage; --size must "
                         "be >= 128 (reference D arch table)")
    ap.add_argument("--out", default=None, help="write full JSON here")
    args = ap.parse_args()

    if args.joint:
        size = args.size if args.size >= 128 else 128
        res = run_twin_joint(steps=args.steps, size=size,
                             batch=min(args.batch, 2), seed=args.seed)
        if args.out:
            with open(args.out, "w") as f:
                json.dump(res, f, indent=1)
        slim = {k: v for k, v in res.items() if k != "curves"}
        print(json.dumps(slim, indent=1))
        d = res["deltas"]
        print(f"\nJOINT twin: PSNR delta {d['psnr_db']:.4f} dB | SSIM delta "
              f"{d['ssim']:.5f} | D(real) map mean delta "
              f"{d['real_map_mean']:.5f} | D(fake) map mean delta "
              f"{d['fake_map_mean']:.5f}")
        return

    if args.gan:
        size = args.size if args.size >= 128 else 128
        res = run_twin_gan(steps=args.steps, size=size,
                           batch=min(args.batch, 2), seed=args.seed)
        if args.out:
            with open(args.out, "w") as f:
                json.dump(res, f, indent=1)
        slim = {k: v for k, v in res.items() if k != "curves"}
        print(json.dumps(slim, indent=1))
        d = res["deltas"]
        print(f"\nGAN twin: PSNR delta {d['psnr_db']:.4f} dB | SSIM delta "
              f"{d['ssim']:.5f} | D(real) map mean delta "
              f"{d['real_map_mean']:.5f} | D(fake) map mean delta "
              f"{d['fake_map_mean']:.5f}")
        return

    res = run_twin(steps=args.steps, size=args.size, batch=args.batch,
                   seed=args.seed, use_flip_aug=not args.identity_aug)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
    slim = {k: v for k, v in res.items() if k != "curves"}
    print(json.dumps(slim, indent=1))
    d = res["deltas"]
    print(f"\nPSNR delta {d['psnr_db']:.4f} dB (target <= 0.1) | "
          f"SSIM delta {d['ssim']:.5f} | entropy delta {d['entropy_bits']:.4f} bits")


if __name__ == "__main__":
    main()
