"""Coverage for remaining paths: non-CRC validation grids, Logger.log_images,
warp list helpers, minGPT n_unmasked, distributed init no-op, windowed
validation fns."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.slow
def test_validation_snapshot_lung_path(tmp_path, rng):
    from medical_image_editing_tpu.models import UNetDecoder
    from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ
    from medical_image_editing_tpu.ops.windowing import denormalize, t_normalize
    from medical_image_editing_tpu.train import evaluate

    enc = EncoderWithVQ(filters=(4, 8, 16, 32, 64), dict_size=5)
    dec = UNetDecoder(out_channels=1, filters=(4, 8, 16, 32, 64),
                      dropped_skip_layers=())
    x0 = jnp.zeros((2, 32, 32, 1))
    ev, vq = enc.init(jax.random.key(0), x0)
    q, *_ = enc(ev, vq, x0, train=False)
    dv = dec.init({"params": jax.random.key(1), "dropblock": jax.random.key(2)},
                  q, train=False)
    from medical_image_editing_tpu.train.state import create_train_state, make_optimizer

    tx = make_optimizer(1e-4)
    S = create_train_state(jax.random.key(3), ev, dv, vq, tx, tx)
    forward = evaluate.make_eval_forward(enc, dec)
    batch = {"image": rng.uniform(-0.3, 0.3, (2, 32, 32, 1)).astype(np.float32)}

    to_lung = lambda im: t_normalize(denormalize(im, 4096, 0, 2.0), 1500, -550, 2.0)
    to_med = lambda im: t_normalize(denormalize(im, 4096, 0, 2.0), 400, 20, 2.0)
    path = evaluate.validation_snapshot(
        forward, S, batch, dataset_name="NCCLungDataset", dict_size=5,
        n_save_images=2, save_path=str(tmp_path / "val.png"),
        to_lung_fn=to_lung, to_mediastinal_fn=to_med,
    )
    assert path and os.path.getsize(path) > 0
    # CRC path with dis maps
    maps = (np.zeros((2, 32, 32, 1), np.float32), np.zeros((2, 32, 32, 1), np.float32))
    path2 = evaluate.validation_snapshot(
        forward, S, batch, dataset_name="CRCDataset", dict_size=5,
        n_save_images=2, save_path=str(tmp_path / "val2.png"), dis_maps=maps,
    )
    assert path2 and os.path.getsize(path2) > 0
    # non-CRC dataset whose config lacks HU windowing: falls back to the raw
    # grid instead of rendering degenerate constant panels
    path3 = evaluate.validation_snapshot(
        forward, S, batch, dataset_name="MICCAIBraTSDataset", dict_size=5,
        n_save_images=2, save_path=str(tmp_path / "val3.png"),
        to_lung_fn=None, to_mediastinal_fn=None,
    )
    assert path3 and os.path.getsize(path3) > 0


def test_logger_log_images(tmp_path, rng):
    from medical_image_editing_tpu.utils import Logger

    logger = Logger(str(tmp_path), monitoring_metrics=[], name="s")
    imgs = rng.uniform(0, 1, (4, 8, 8, 1)).astype(np.float32)
    logger.log_images("snap", imgs, current_epoch=1, global_step=42, nrow=2)
    files = os.listdir(logger.log_dir)
    assert any(f.startswith("snap_0001_000042") for f in files)


def test_warp_ids_list_helpers(rng):
    from medical_image_editing_tpu.ops.warp import (
        hflip_matrix, identity_matrix, warp_ids_forward, warp_ids_reverse,
    )

    ids = jnp.asarray(rng.integers(1, 5, (2, 16, 16)).astype(np.int32))
    flip = jnp.broadcast_to(hflip_matrix(16), (2, 3, 3))
    mats_list = [flip, identity_matrix(2)]
    warped = warp_ids_forward(ids, mats_list)
    back = warp_ids_reverse(warped, mats_list)
    np.testing.assert_array_equal(np.asarray(back).astype(np.int32), np.asarray(ids))


@pytest.mark.slow
def test_mingpt_n_unmasked_prefix(rng):
    from medical_image_editing_tpu.models import GPT, GPTConfig

    cfg = GPTConfig(vocab_size=8, block_size=8, n_layer=1, n_head=2, n_embed=8,
                    emb_pdrop=0.0, res_pdrop=0.0, att_pdrop=0.0, n_unmasked=3)
    m = GPT(cfg)
    idx = jnp.asarray(rng.integers(0, 8, (1, 6)))
    vars_ = m.init(jax.random.key(0), idx, train=False)
    logits = m.apply(vars_, idx, False)
    # within the unmasked prefix, position 0 can attend forward: changing
    # token 2 changes logits at position 0
    idx2 = idx.at[0, 2].set((int(idx[0, 2]) + 1) % 8)
    logits2 = m.apply(vars_, idx2, False)
    assert not np.allclose(np.asarray(logits[:, 0]), np.asarray(logits2[:, 0]))


def test_initialize_distributed_noop():
    from medical_image_editing_tpu.parallel.mesh import initialize_distributed

    initialize_distributed()  # single-process: must be a no-op


def test_loader_process_sharding():
    from medical_image_editing_tpu.data import DataLoader, SyntheticSliceDataset

    ds = SyntheticSliceDataset(n=8, size=8)
    dl = DataLoader(ds, batch_size=2, shuffle=False, shard_by_process=True)
    dl._process_shard = (2, 1)  # simulate process 1 of 2
    batches = list(dl)
    assert sum(b["image"].shape[0] for b in batches) == 4  # half the data
