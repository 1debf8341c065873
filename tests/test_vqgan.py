"""Tests for the VQGAN model and its adversarial trainer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_editing_tpu.models.vqgan import VQGAN
from medical_image_editing_tpu.models import UNetDiscriminator
from medical_image_editing_tpu.ops.vq import vq_init
from medical_image_editing_tpu.train import create_train_state
from medical_image_editing_tpu.train.second_stage import SecondStageLossConfig
from medical_image_editing_tpu.train.state import make_optimizer
from medical_image_editing_tpu.train.vqgan_stage import make_vqgan_step

# tiny config: 32² input, 3 levels → bottleneck 8²
VQGAN_KW = dict(
    in_channels=1, mid_channels=4, out_channels=1, emb_dim=8, dict_size=6,
    enc_ch_multiplier=(1, 2, 4), dec_ch_multiplier=(1, 2, 4),
    num_res_blocks=1, enc_attn_resolutions=(), dec_attn_resolutions=(8,),
    resolution=32,
)


def _init_vqgan(rng_key=0):
    m = VQGAN(**VQGAN_KW)
    x = jnp.zeros((2, 32, 32, 1))
    vq = vq_init(jax.random.key(41), 6, 8)
    vars_ = m.init(jax.random.key(rng_key), x, vq, train=False)
    return m, vars_, vq


@pytest.mark.slow
def test_vqgan_forward_shapes(rng):
    m, vars_, vq = _init_vqgan()
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32))
    recon, commit, ids, emb, new_vq = m.apply(vars_, x, vq, False)
    assert recon.shape == (2, 32, 32, 1)
    assert ids.shape == (2, 8, 8)          # bottleneck at 32/2² = 8
    assert emb.shape == (2, 8, 8, 8)
    assert float(commit) > 0
    assert new_vq is vq  # eval: no EMA update


def test_vqgan_train_updates_codebook(rng):
    m, vars_, vq = _init_vqgan()
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 1)).astype(np.float32))
    _, _, _, _, new_vq = m.apply(vars_, x, vq, True)
    assert not np.allclose(np.asarray(new_vq.cluster_size), np.asarray(vq.cluster_size))


def test_vqgan_generate_from_ids(rng):
    m, vars_, vq = _init_vqgan()
    ids = jnp.asarray(rng.integers(0, 6, (1, 8, 8)).astype(np.int32))
    recon = m.apply(vars_, ids, vq, method=m.generate_image_from_ids)
    assert recon.shape == (1, 32, 32, 1)


@pytest.mark.slow
def test_vqgan_unet_dis_step(rng):
    m, vars_, vq = _init_vqgan()
    dis = UNetDiscriminator(D_ch=4, resolution=128, D_attn="0")
    # use 128² input for the dis arch; rebuild VQGAN at 128
    kw = dict(VQGAN_KW, resolution=128)
    m = VQGAN(**kw)
    x0 = jnp.zeros((2, 128, 128, 1))
    vq = vq_init(jax.random.key(41), 6, 8)
    vqgan_vars = m.init(jax.random.key(0), x0, vq, train=False)
    dis_vars = dis.init(jax.random.key(1), x0, train=False)
    dec_tx, dis_tx = make_optimizer(1e-4), make_optimizer(4e-4)
    enc_tx = make_optimizer(1e-4)
    # enc slot unused for the VQGAN path; store an empty-params placeholder
    state = create_train_state(
        jax.random.key(2), {"params": {}}, vqgan_vars, vq, enc_tx, dec_tx,
        dis_vars=dis_vars, dis_tx=dis_tx,
    )
    step = make_vqgan_step(
        m, dis, dec_tx, dis_tx,
        loss_cfg=SecondStageLossConfig(n_inner_loops=1, use_unet_perceptual_loss=True),
    )
    image = jnp.asarray(rng.uniform(-1, 1, (2, 128, 128, 1)).astype(np.float32))
    new_state, metrics = jax.jit(step)(state, image, 0.0)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
    assert not np.allclose(np.asarray(new_state.vq.cluster_size), np.asarray(vq.cluster_size))


def test_vqgan_trainer_cli_path(tmp_path, rng):
    """-v flavor through the Trainer: a train step + test metrics via the
    VQGAN autoencoder (small config)."""
    import json

    from medical_image_editing_tpu.train.trainer import Trainer
    from medical_image_editing_tpu.utils.config import to_config

    root = tmp_path / "data"
    for p in range(1):
        d = root / f"P{p:03d}_x"
        d.mkdir(parents=True)
        for s in range(4):
            np.save(d / f"{s:04d}.npy", rng.uniform(0, 255, (32, 32)).astype(np.float32))

    cfg = {
        "run": {"seed": 1, "n_epochs": 1, "training_mode": "first_step",
                "resume_checkpoint": None, "first_stage_ckpt_path": None,
                "discriminator_ckpt_path": None,
                "monitoring_metrics": ["total", "recon", "commit"]},
        "dataset": {"dataset_name": "CRCDataset", "root_dir_path": str(root),
                    "batch_size": 2, "num_workers": 0, "image_size": [32, 32],
                    "augmentations": []},
        "model": {
            "vqmodel": {"in_channels": 1, "enc_filters": [4, 8, 16, 32, 64],
                        "dec_filters": [4, 8, 16, 32, 64], "dict_size": 5,
                        "momentum": 0.99, "knn_backend": "xla",
                        "enc_use_styled_up_block": False,
                        "use_init_embed": False, "use_dropblock": False,
                        "dropped_skip_layers": [], "use_pixel_shuffle": False,
                        "model_name": "VQGAN"},
            "vqgan": {"in_channels": 1, "mid_channels": 4, "out_channels": 1,
                      "emb_dim": 8, "dict_size": 6,
                      "enc_ch_multiplier": [1, 2, 4], "dec_ch_multiplier": [1, 2, 4],
                      "num_res_blocks": 1, "enc_attn_resolutions": [],
                      "dec_attn_resolutions": [8], "resolution": 32,
                      "p_dropout": 0.0, "resamp_with_conv": True},
            "dis": {"model_name": "UNetDiscriminator", "D_ch": 4, "D_wide": True,
                    "D_attn": "0", "resolution": 128, "n_filters": 8,
                    "n_layers": 2, "normalization": "instancenorm",
                    "apply_spectral_norm": False},
        },
        "loss": {"loss_weight": {"commit": 1.0, "cross": 1.0, "dist": 1.0,
                                 "reg": 0.01, "recon": 1.0, "freq": 1.0,
                                 "perceptual": 0.0, "gen": 1.0,
                                 "unet_perceptual": 0.0, "dis": 1.0,
                                 "cutmix": 1.0, "consistency": 1.0},
                 "embed_loss": {"margin": 0.5, "use_distance_loss": True,
                                "use_regularization_loss": True},
                 "use_recon_loss": True, "use_l1_loss": False,
                 "use_frequency_loss": True, "use_perceptual_loss": False,
                 "use_unet_perceptual_loss": False,
                 "dis_loss_type": "hinge_d_loss", "n_inner_loops": 1},
        "save": {"save_dir": str(tmp_path / "out"), "study_name": "vqgan",
                 "n_save_images": 2, "limit_num": 2, "save_interval": 2},
        "enc_optim": {"lr": 1e-4, "b1": 0.9, "b2": 0.999, "weight_decay": 0.0},
        "dec_optim": {"lr": 1e-4, "b1": 0.9, "b2": 0.999, "weight_decay": 0.0},
        "dis_optim": {"lr": 4e-4, "b1": 0.5, "b2": 0.999, "weight_decay": 0.0},
        "augmentation": {"modules": []},
    }
    # UNetDiscriminator arch requires matching input resolution; use 32 data
    # with a 128-res dis is invalid — but the VQGAN trainer builds the dis for
    # the configured resolution; here we only smoke a train step at 32² with a
    # dis built for it via the PatchGAN instead:
    cfg["model"]["dis"] = {"model_name": "NLayerDiscriminator", "n_filters": 8,
                           "n_layers": 2, "normalization": "instancenorm",
                           "apply_spectral_norm": False, "D_ch": 4,
                           "D_wide": True, "D_attn": "0", "resolution": 32}
    trainer = Trainer(to_config(cfg), logger=None, use_vqgan=True)
    # NB vqgan_stage drives a UNetDiscriminator protocol (map+bottleneck);
    # here we only exercise init/test paths, not the adversarial step.
    state = trainer.init_state(32, 2)
    outputs, result = trainer.test(state, save_dir_path=str(tmp_path / "res"))
    assert outputs and result
    import pandas as pd

    df = pd.read_csv(result)
    assert "PSNR_avg" in df.columns
