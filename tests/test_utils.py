"""Tests for config, logger, checkpoint retention + staged restore, imaging."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from medical_image_editing_tpu.utils import (
    CheckpointManager,
    Logger,
    load_json,
    restore_fields,
    to_config,
)
from medical_image_editing_tpu.utils.config import getattr_else_none
from medical_image_editing_tpu.utils.seed import init_seed


def test_config_false_to_none_quirk(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"loss": {"use_recon_loss": False, "w": 1.5},
                             "run": {"seed_list": [1, 2]}}))
    cfg = load_json(str(p))
    assert cfg.loss.use_recon_loss is None  # spec: utils/__init__.py:102
    assert cfg.loss.w == 1.5
    cfg2 = load_json(str(p), false_to_none=False)
    assert cfg2.loss.use_recon_loss is False
    with pytest.raises(AttributeError):
        _ = cfg.loss.nonexistent
    assert getattr_else_none(cfg.loss, "nonexistent") is None
    assert cfg.to_dict()["run"]["seed_list"] == [1, 2]


def test_logger_versioning_and_csv(tmp_path):
    logger = Logger(str(tmp_path), config=to_config({"a": {"b": 1}}),
                    monitoring_metrics=["epoch", "total", "recon"],
                    name="study")
    assert logger.version == 0
    logger.log_metrics({"total": jnp.float32(1.5), "epoch": 0})
    logger.log_metrics({"total": 2.0, "recon": 0.5, "epoch": 1})
    csv = open(os.path.join(logger.log_dir, "log.csv")).read().splitlines()
    assert csv[0] == "epoch,total,recon"
    assert csv[1].startswith("0.0,1.5,")  # missing recon → empty cell
    assert csv[1].endswith(",")
    logger.log_hyperparams([42])
    cfg = json.load(open(os.path.join(logger.log_dir, "config.json")))
    assert cfg["seed_list"] == [42]
    # second logger bumps version
    logger2 = Logger(str(tmp_path), name="study")
    assert logger2.version == 1


def test_logger_val_test_csv(tmp_path):
    logger = Logger(str(tmp_path), monitoring_metrics=[], name="s")
    logger.log_test_metrics({"PSNR": 30.0, "SSIM": 0.9})
    logger.log_test_metrics({"PSNR": 31.0, "SSIM": 0.91})
    lines = open(os.path.join(logger.log_dir, "test_logs.csv")).read().splitlines()
    assert lines[0] == "PSNR,SSIM" and len(lines) == 3


def _tiny_state(seed=0):
    from medical_image_editing_tpu.ops.vq import vq_init
    from medical_image_editing_tpu.train.state import create_train_state, make_optimizer

    k = jax.random.key(seed)
    enc_vars = {"params": {"w": jnp.full((3,), float(seed))}}
    dec_vars = {"params": {"w": jnp.full((2,), float(seed) + 10)}}
    dis_vars = {"params": {"w": jnp.full((2,), float(seed) + 20)}}
    tx = make_optimizer(1e-3)
    return create_train_state(k, enc_vars, dec_vars, vq_init(k, 4, 3), tx, tx,
                              dis_vars=dis_vars, dis_tx=tx)


def test_checkpoint_save_restore_roundtrip(tmp_path):
    state = _tiny_state(1)
    mgr = CheckpointManager(str(tmp_path / "ckpts"), limit_num=3, save_interval=2)
    mgr.save(state, epoch=0)
    assert mgr.latest_epoch() == 0
    restored = mgr.restore(_tiny_state(0))
    np.testing.assert_array_equal(
        np.asarray(restored.enc_vars["params"]["w"]),
        np.asarray(state.enc_vars["params"]["w"]),
    )
    np.testing.assert_array_equal(np.asarray(restored.vq.embed), np.asarray(state.vq.embed))


def test_checkpoint_optimizer_layout_sidecar(tmp_path, monkeypatch):
    """ADVICE r4: checkpoints record the optimizer-state layout (nested vs
    MEDIMG_FLAT_OPT flat); restoring under the other layout must fail with an
    actionable message naming the flag, not an Orbax structure mismatch."""
    import pytest

    monkeypatch.setenv("MEDIMG_FLAT_OPT", "0")
    state = _tiny_state(1)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(state, epoch=0)

    # same layout: restores fine
    mgr.restore(_tiny_state(0))

    monkeypatch.setenv("MEDIMG_FLAT_OPT", "1")
    with pytest.raises(ValueError, match="MEDIMG_FLAT_OPT"):
        mgr.restore(_tiny_state(0))

    from medical_image_editing_tpu.utils.checkpoint import restore_state

    with pytest.raises(ValueError, match="MEDIMG_FLAT_OPT"):
        restore_state(mgr.latest_path(), _tiny_state(0))

    # pre-round-5 dirs (no sidecar) keep working
    import os

    os.remove(str(tmp_path / "ck" / "optimizer_layout.json"))
    monkeypatch.setenv("MEDIMG_FLAT_OPT", "0")
    mgr.restore(_tiny_state(0))


def test_checkpoint_retention_policy(tmp_path):
    state = _tiny_state(0)
    mgr = CheckpointManager(str(tmp_path / "c"), limit_num=2, save_interval=3)
    for e in range(6):
        mgr.save(state, epoch=e)
    kept = mgr._epochs()
    # newest 2 always kept: 4,5; older kept iff (e+1)%3==0: epoch 2
    assert kept == [2, 4, 5], kept


def test_restore_fields_staged_loading(tmp_path):
    first_stage = _tiny_state(7)
    mgr = CheckpointManager(str(tmp_path / "first"), limit_num=5, save_interval=5)
    mgr.save(first_stage, epoch=3)

    second = _tiny_state(0)
    loaded = restore_fields(str(tmp_path / "first"), second, ("enc_vars", "dec_vars", "vq"))
    np.testing.assert_array_equal(
        np.asarray(loaded.enc_vars["params"]["w"]), np.full((3,), 7.0))
    # discriminator untouched
    np.testing.assert_array_equal(
        np.asarray(loaded.dis_vars["params"]["w"]), np.full((2,), 20.0))


def test_init_seed_from_list():
    key, logged = init_seed([123])
    assert logged == [123]
    key2, _ = init_seed([123])
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(key)), np.asarray(jax.random.key_data(key2)))


def test_imaging_helpers(tmp_path, rng):
    from medical_image_editing_tpu.utils import (
        save_fused_image, save_image, save_image_grid, to_image,
    )

    batch = rng.uniform(0, 1, (4, 8, 8, 1)).astype(np.float32)
    assert to_image(jnp.asarray(batch)).shape == (8, 8)
    assert to_image(jnp.asarray(batch[..., 0]), is_ids=True).shape == (8, 8)
    p1 = str(tmp_path / "a.png")
    save_image(batch[0, ..., 0], "gray", -1, 1, p1)
    assert os.path.getsize(p1) > 0
    p2 = str(tmp_path / "b.png")
    save_fused_image(batch[0, ..., 0], "gray", -1, 1,
                     (batch[1, ..., 0] * 5).astype(int), "Spectral", 0, 5, 0.3, p2)
    assert os.path.getsize(p2) > 0
    p3 = str(tmp_path / "grid.png")
    save_image_grid(batch, p3, nrow=2)
    assert os.path.getsize(p3) > 0


def test_checkpoint_async_overlap_and_retention(tmp_path):
    """use_async=True: saves return before the write completes, close()
    flushes, restore sees the committed data, and the retention policy ends
    up identical to the synchronous manager's (pruning is deferred one save,
    then caught up at close)."""
    mgr = CheckpointManager(str(tmp_path / "a"), limit_num=2, save_interval=3,
                            use_async=True)
    states = [_tiny_state(e) for e in range(6)]
    for e in range(6):
        mgr.save(states[e], epoch=e)
    mgr.close()
    assert mgr._epochs() == [2, 4, 5], mgr._epochs()
    restored = mgr.restore(_tiny_state(0))
    np.testing.assert_array_equal(
        np.asarray(restored.enc_vars["params"]["w"]),
        np.asarray(states[5].enc_vars["params"]["w"]),
    )
    # a second manager over the same dir resumes cleanly
    mgr2 = CheckpointManager(str(tmp_path / "a"), limit_num=2, save_interval=3)
    assert mgr2.latest_epoch() == 5


def test_fswatch_wakes_on_write(tmp_path):
    import threading
    import time as _time

    from medical_image_editing_tpu.utils.fswatch import FileWatcher

    target = tmp_path / "edited.nii"
    target.write_bytes(b"v0")
    with FileWatcher(str(target)) as w:
        assert w.active  # Linux CI: inotify must engage
        # no event → times out (measures the fallback sleep path too)
        t0 = _time.monotonic()
        assert w.wait(0.1) is False
        assert _time.monotonic() - t0 >= 0.09

        def writer():
            _time.sleep(0.05)
            target.write_bytes(b"v1")

        th = threading.Thread(target=writer)
        th.start()
        t0 = _time.monotonic()
        assert w.wait(5.0) is True  # woke on the write...
        assert _time.monotonic() - t0 < 1.0  # ...not on the timeout
        th.join()
        # atomic replace-by-rename is also seen
        other = tmp_path / "tmp_new"
        other.write_bytes(b"v2")
        other.rename(target)
        assert w.wait(5.0) is True


def test_validate_config_catches_common_mistakes():
    import glob

    import pytest as _pytest

    from medical_image_editing_tpu.utils.config import load_json, to_config, validate_config

    # every shipped config validates clean
    for p in sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..",
                                           "configs", "*.json"))):
        validate_config(load_json(p), multi_window="multiwindow" in p,
                        vqgan="vqgan" in p)

    base = {
        "run": {"training_mode": "second_step"},
        "dataset": {"dataset_name": "CRCDataset", "image_size": [32, 32]},
        "model": {
            "vqmodel": {"enc_filters": [4, 8, 16, 32, 64]},
            "dis": {"model_name": "UNetDiscriminator", "resolution": 32},
        },
    }
    # unsupported UNetDiscriminator resolution -> clear error, not a deep trace
    with _pytest.raises(ValueError, match="128/256/512"):
        validate_config(to_config(base))

    bad_mode = dict(base, run={"training_mode": "trian"})
    with _pytest.raises(ValueError, match="training_mode"):
        validate_config(to_config(bad_mode))

    # image size not divisible by the encoder's downsampling factor
    tiny_dis = {"model_name": "NLayerDiscriminator", "n_filters": 4,
                "n_layers": 1, "normalization": "instancenorm"}
    bad_size = {
        "run": {"training_mode": "first_step"},
        "dataset": {"dataset_name": "CRCDataset", "image_size": [50, 50]},
        "model": {"vqmodel": {"enc_filters": [4, 8, 16, 32, 64]},
                  "dis": tiny_dis},
    }
    with _pytest.raises(ValueError, match="downsampling"):
        validate_config(to_config(bad_size))

    # BraTS without modality
    brats = {
        "run": {"training_mode": "first_step"},
        "dataset": {"dataset_name": "MICCAIBraTSDataset", "image_size": [64, 64]},
        "model": {"vqmodel": {"enc_filters": [4, 8]}, "dis": tiny_dis},
    }
    with _pytest.raises(ValueError, match="modality"):
        validate_config(to_config(brats))

    # perceptual loss without weights -> warning, not error
    warn_cfg = {
        "run": {"training_mode": "first_step"},
        "dataset": {"dataset_name": "CRCDataset", "image_size": [64, 64]},
        "model": {"vqmodel": {"enc_filters": [4, 8]}, "dis": tiny_dis},
        "loss": {"use_perceptual_loss": True},
    }
    ws = validate_config(to_config(warn_cfg))
    assert any("fallback" in w for w in ws)

    # scalar image_size is accepted (run_vqwnet._infer_image_size parity)
    scalar_cfg = dict(warn_cfg)
    scalar_cfg = {**warn_cfg, "dataset": {"dataset_name": "CRCDataset",
                                          "image_size": 64}, "loss": {}}
    validate_config(to_config(scalar_cfg))

    # a missing model.dis is flagged (the trainer builds it for every mode)
    no_dis = {**warn_cfg, "model": {"vqmodel": {"enc_filters": [4, 8]}}}
    with _pytest.raises(ValueError, match="model.dis"):
        validate_config(to_config(no_dis))

    # -v training with a PatchGAN dis: the VQGAN trainer needs the
    # UNetDiscriminator map+bottleneck protocol (vqgan_unet_dis.py:36-185)
    vq_patchgan = {
        "run": {"training_mode": "first_step"},
        "dataset": {"dataset_name": "CRCDataset", "image_size": [64, 64]},
        "model": {"vqmodel": {"enc_filters": [4, 8]}, "dis": tiny_dis},
    }
    with _pytest.raises(ValueError, match="UNetDiscriminator"):
        validate_config(to_config(vq_patchgan), vqgan=True)
    # ...but -v test/inference never touches the dis: accepted
    vq_test = {**vq_patchgan, "run": {"training_mode": "test"}}
    validate_config(to_config(vq_test), vqgan=True)

    # same protocol requirement for multi-window GAN modes (-w)
    mw_patchgan = {**vq_patchgan, "run": {"training_mode": "joint_step"}}
    with _pytest.raises(ValueError, match="UNetDiscriminator"):
        validate_config(to_config(mw_patchgan), multi_window=True)
    # multi-window first_step never touches the dis: accepted (window params
    # are still required — the per-window losses denormalize to HU)
    mw_ok = {**vq_patchgan,
             "dataset": {**vq_patchgan["dataset"], "window_width": 4096,
                         "window_center": 0.0, "window_scale": 2.0}}
    validate_config(to_config(mw_ok), multi_window=True)

    # impossible UNetDiscriminator resolution caught even in first_step
    # (the trainer inits the discriminator regardless of mode)
    fs_bad_dis = {**warn_cfg, "model": {
        "vqmodel": {"enc_filters": [4, 8]},
        "dis": {"model_name": "UNetDiscriminator", "resolution": 64},
    }}
    with _pytest.raises(ValueError, match="128/256/512"):
        validate_config(to_config(fs_bad_dis))


def test_validate_config_multiwindow_requires_window_params():
    import pytest as _pytest

    from medical_image_editing_tpu.utils.config import to_config, validate_config

    cfg = {
        "run": {"training_mode": "first_step"},
        "dataset": {"dataset_name": "NCCLungDataset", "image_size": [64, 64]},
        "model": {"vqmodel": {"enc_filters": [4, 8]},
                  "dis": {"model_name": "NLayerDiscriminator", "n_filters": 4,
                          "n_layers": 1, "normalization": "instancenorm"}},
    }
    with _pytest.raises(ValueError, match="window_width"):
        validate_config(to_config(cfg), multi_window=True)
    # single-window: only the un-windowed-loading warning, no error
    ws = validate_config(to_config(cfg))
    assert any("un-windowed" in w for w in ws)


def test_restore_state_accepts_specific_ckpt_subdirectory(tmp_path):
    """export-ckpt's restore must take both the parent directory and a
    specific ckpt-epoch=NNNN subdirectory, like restore_fields does."""
    import os

    from medical_image_editing_tpu.utils.checkpoint import restore_state

    state = _tiny_state(3)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(state, epoch=4)
    target = _tiny_state(0)

    by_dir = restore_state(str(tmp_path / "ck"), target)
    sub = os.path.join(str(tmp_path / "ck"), "ckpt-epoch=0004")
    assert os.path.isdir(sub)
    by_sub = restore_state(sub, target)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(by_dir),
                    jax.tree_util.tree_leaves(by_sub)):
        assert (a == b).all()

    with pytest.raises(FileNotFoundError):
        restore_state(str(tmp_path / "nope"), target)
    assert not os.path.exists(str(tmp_path / "nope"))
