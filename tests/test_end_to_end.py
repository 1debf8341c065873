"""End-to-end integration: config JSON → CLI train → test → edit loop
(SURVEY.md §4: tiny synthetic dataset, one epoch, finite loss, result.csv,
edit reproduces a decode from a saved id map)."""

import json
import os

import numpy as np
import pytest


def _make_crc_tree(root, n_patients=2, n_slices=4, size=32, seed=0):
    rng = np.random.default_rng(seed)
    for p in range(n_patients):
        pdir = root / f"P{p:03d}_x"
        pdir.mkdir(parents=True, exist_ok=True)
        for s in range(n_slices):
            np.save(pdir / f"{s:04d}.npy",
                    rng.uniform(0, 255, (size, size)).astype(np.float32))


def _config(tmp_path, data_root, training_mode="first_step", dis="NLayerDiscriminator"):
    return {
        "run": {
            "seed": 1, "seed_list": [1], "n_epochs": 1,
            "visible_devices": 1, "num_gpus": 1, "distributed_backend": None,
            "training_mode": training_mode,
            "resume_checkpoint": None,
            "first_stage_ckpt_path": None, "discriminator_ckpt_path": None,
            "monitoring_metrics": ["epoch", "iteration", "total", "commit",
                                   "cross", "dist", "reg", "recon", "freq"],
            "use_validation_sanity_check": False,
        },
        "dataset": {
            "dataset_name": "CRCDataset", "root_dir_path": str(data_root),
            "batch_size": 2, "num_workers": 0, "image_size": [32, 32],
            "augmentations": [],
        },
        "model": {
            "vqmodel": {
                "in_channels": 1, "enc_filters": [4, 8, 16, 32, 64],
                "dec_filters": [4, 8, 16, 32, 64], "dict_size": 5,
                "momentum": 0.99, "knn_backend": "torch",
                "enc_use_styled_up_block": False, "dec_use_styled_up_block": True,
                "use_init_embed": True, "use_dropblock": False,
                "block_size": 3, "start_value": 0.1, "stop_value": 0.5,
                "nr_steps": 5, "dropped_skip_layers": [],
                "use_pixel_shuffle": False,
            },
            "dis": {
                "model_name": dis, "n_filters": 8, "n_layers": 2,
                "normalization": "instancenorm", "apply_spectral_norm": False,
                "D_ch": 4, "D_wide": True, "D_attn": "0", "resolution": 32,
            },
        },
        "loss": {
            "loss_weight": {
                "commit": 1.0, "cross": 1.0, "dist": 1.0, "reg": 0.01,
                "recon": 1.0, "freq": 1.0, "perceptual": 0.0, "gen": 1.0,
                "unet_perceptual": 0.0, "dis": 1.0, "cutmix": 1.0,
                "consistency": 1.0,
            },
            "embed_loss": {"margin": 0.5, "use_distance_loss": True,
                           "use_regularization_loss": True},
            "use_recon_loss": True, "use_l1_loss": False,
            "use_frequency_loss": True, "use_perceptual_loss": False,
            "perceptual_loss_type": "vgg", "use_unet_perceptual_loss": False,
            "dis_loss_type": "hinge_d_loss", "n_inner_loops": 1,
        },
        "save": {"save_dir": str(tmp_path / "results"), "study_name": "e2e",
                 "n_save_images": 2, "limit_num": 3, "save_interval": 2},
        "enc_optim": {"lr": 1e-4, "b1": 0.9, "b2": 0.999, "weight_decay": 0.0},
        "dec_optim": {"lr": 1e-4, "b1": 0.9, "b2": 0.999, "weight_decay": 0.0},
        "dis_optim": {"lr": 4e-4, "b1": 0.5, "b2": 0.999, "weight_decay": 0.0},
        "augmentation": {
            "modules": ["RandomHorizontalFlip", "RandomAffine"],
            "RandomHorizontalFlip": {"p": 0.5},
            "RandomAffine": {"degrees": 5.0, "translate": [0.02, 0.02],
                             "shear": 0.0, "p": 0.8},
        },
    }


@pytest.fixture
def crc_env(tmp_path):
    data_root = tmp_path / "data"
    _make_crc_tree(data_root)
    cfg = _config(tmp_path, data_root)
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))
    return tmp_path, cfg_path, cfg


@pytest.mark.slow
def test_cli_train_first_stage(crc_env):
    tmp_path, cfg_path, cfg = crc_env
    from medical_image_editing_tpu.cli.run_vqwnet import main

    rc = main(["-c", str(cfg_path), "-m", "train", "--max-steps", "2"])
    assert rc == 0
    run_dir = tmp_path / "results" / "e2e" / "version_0"
    log = (run_dir / "log.csv").read_text().splitlines()
    assert log[0].startswith("epoch,iteration,total")
    assert len(log) >= 3  # header + 2 steps
    # loss values finite
    total = float(log[1].split(",")[2])
    assert np.isfinite(total)
    # checkpoint written
    ckpts = os.listdir(run_dir / "ckpt")
    assert any("ckpt-epoch=" in c for c in ckpts)
    # config dump
    assert (run_dir / "config.json").exists()


def test_trainer_test_mode_result_csv(crc_env):
    tmp_path, cfg_path, cfg = crc_env
    from medical_image_editing_tpu.train.trainer import Trainer
    from medical_image_editing_tpu.utils.config import to_config

    trainer = Trainer(to_config(cfg), logger=None)
    state = trainer.init_state(32, 2)
    outputs, result = trainer.test(state, save_dir_path=str(tmp_path / "testout"))
    assert result and os.path.exists(result)
    import pandas as pd

    df = pd.read_csv(result)
    for col in ("NMSE_avg", "SSIM_avg", "PSNR_avg", "Entropy_avg"):
        assert col in df.columns


def test_trainer_inference_mode_exports(crc_env):
    tmp_path, cfg_path, cfg = crc_env
    cfg["run"]["training_mode"] = "inference"
    from medical_image_editing_tpu.train.trainer import Trainer
    from medical_image_editing_tpu.utils.config import to_config

    trainer = Trainer(to_config(cfg), logger=None)
    state = trainer.init_state(32, 2)
    written = trainer.test(state)
    assert written
    files = os.listdir(written[0])
    assert any(f.startswith("image_") and f.endswith(".nii.gz") for f in files)
    assert any(f.startswith("label_") and f.endswith(".png") for f in files)


@pytest.mark.slow
def test_run_recon_edit_loop(tmp_path, rng):
    """Edit-server round trip: painted id map → decode → PNG outputs."""
    from medical_image_editing_tpu.cli import run_recon as rr
    from medical_image_editing_tpu.utils import nifti

    # build + save a checkpoint so load_model restores something real
    class TinyConfig(rr.LungConfig):
        enc_filters = (4, 8, 16, 32, 64)
        dec_filters = (4, 8, 16, 32, 64)

        def __init__(self):
            self.resume_checkpoint = None
            self.edited_file_path = str(tmp_path / "edited.nii.gz")
            self.save_dir_path = str(tmp_path / "out")

    config = TinyConfig()
    ids = rng.integers(0, 6, (32, 32)).astype(np.float64)  # 0 = background
    nifti.save(np.transpose(ids[::-1, ::-1]), config.edited_file_path)

    encoder, decoder, state = rr.load_model(config)
    edit_fn = rr.make_edit_fn(decoder, state, config)
    loaded = rr.load_edited_map(config.edited_file_path).astype(np.int32)
    np.testing.assert_array_equal(loaded, ids.astype(np.int32))

    recon, id_out = rr.process_edit(edit_fn, config, loaded,
                                    save_dir=config.save_dir_path)
    assert recon.shape == (32, 32)
    assert np.isfinite(recon).all() and np.abs(recon).max() <= 1.0
    # background stays 0, painted ids preserved
    np.testing.assert_array_equal(id_out, loaded * (loaded > 0))
    out_files = os.listdir(config.save_dir_path)
    assert any(f.startswith("recon_") for f in out_files)
    assert any(f.startswith("label_") for f in out_files)

    # determinism: same map → same decode (jit-compiled path is pure)
    recon2, _ = rr.process_edit(edit_fn, config, loaded, save_dir=config.save_dir_path)
    np.testing.assert_allclose(recon, recon2, atol=1e-6)


@pytest.mark.slow
def test_fit_resume_from_checkpoint(crc_env):
    """Checkpoint → resume continues at the saved epoch with identical state
    (SURVEY.md §5 checkpoint/resume capability)."""
    import jax
    import jax.numpy as jnp

    tmp_path, cfg_path, cfg = crc_env
    from medical_image_editing_tpu.train.trainer import Trainer
    from medical_image_editing_tpu.utils.config import to_config
    from medical_image_editing_tpu.utils.logging import Logger

    logger = Logger(str(tmp_path / "resume_run"), config=to_config(cfg),
                    monitoring_metrics=["total"], name="r")
    trainer = Trainer(to_config(cfg), logger=logger)
    state = trainer.fit(max_epochs=1)
    assert int(jax.device_get(state.epoch)) == 1
    ckpt_dir = os.path.join(logger.log_dir, "ckpt")
    assert os.path.isdir(ckpt_dir)

    cfg2 = json.loads(json.dumps(cfg))
    cfg2["run"]["resume_checkpoint"] = ckpt_dir
    cfg2["run"]["n_epochs"] = 2
    logger2 = Logger(str(tmp_path / "resume_run2"), config=to_config(cfg2),
                     monitoring_metrics=["total"], name="r")
    trainer2 = Trainer(to_config(cfg2), logger=logger2)
    state2 = trainer2.fit()
    # resumed from epoch 1, trained epoch 1 → epoch counter at 2
    assert int(jax.device_get(state2.epoch)) == 2
    assert int(jax.device_get(state2.step)) > int(jax.device_get(state.step)) - 1


@pytest.mark.slow
def test_fit_max_steps_mid_epoch_keeps_epoch(crc_env):
    """A max_steps break mid-epoch must NOT advance the epoch counter —
    resuming would otherwise skip the rest of that epoch's data (VERDICT r1
    weak #8). Dataset = 4 batches/epoch; stop after 2."""
    import jax

    tmp_path, cfg_path, cfg = crc_env
    from medical_image_editing_tpu.train.trainer import Trainer
    from medical_image_editing_tpu.utils.config import to_config
    from medical_image_editing_tpu.utils.logging import Logger

    logger = Logger(str(tmp_path / "midstop_run"), config=to_config(cfg),
                    monitoring_metrics=["total"], name="m")
    trainer = Trainer(to_config(cfg), logger=logger)
    state = trainer.fit(max_steps=2)
    assert int(jax.device_get(state.step)) == 2
    assert int(jax.device_get(state.epoch)) == 0
    # a checkpoint is still written (at the unfinished epoch's index)
    ckpts = os.listdir(os.path.join(logger.log_dir, "ckpt"))
    assert any("ckpt-epoch=0000" in c for c in ckpts)


def test_test_step_non_crc_export(tmp_path, rng):
    """Non-CRC test export degrades gracefully to generic PNG export instead of
    raising (reference raises NotImplementedError,
    `single_window_trainer.py:822-823` — fixed equivalent)."""
    import jax
    import jax.numpy as jnp

    from medical_image_editing_tpu.models import UNetDecoder
    from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ
    from medical_image_editing_tpu.train import evaluate
    from medical_image_editing_tpu.train.state import create_train_state, make_optimizer

    enc = EncoderWithVQ(filters=(4, 8, 16, 32, 64), dict_size=5)
    dec = UNetDecoder(out_channels=1, filters=(4, 8, 16, 32, 64),
                      dropped_skip_layers=())
    x0 = jnp.zeros((1, 32, 32, 1))
    ev, vq = enc.init(jax.random.key(0), x0)
    q, *_ = enc(ev, vq, x0, train=False)
    dv = dec.init({"params": jax.random.key(1), "dropblock": jax.random.key(2)},
                  q, train=False)
    tx = make_optimizer(1e-4)
    state = create_train_state(jax.random.key(3), ev, dv, vq, tx, tx)
    fm = evaluate.make_test_metrics_fn(enc, dec, dict_size=5)
    batch = {"image": rng.uniform(-0.5, 0.5, (1, 32, 32, 1)).astype(np.float32)}
    out = evaluate.test_step(
        fm, state, batch, 0, dataset_name="NCCLungDataset", dict_size=5,
        save_dir_path=str(tmp_path / "exp"),
    )
    assert out is not None and np.isfinite(out["PSNR"])
    files = os.listdir(tmp_path / "exp")
    assert {"image_0000.png", "recon_0000.png", "idx_0000.png",
            "fused_0000.png"} <= set(files)


@pytest.mark.slow
def test_cli_train_multiwindow_flag(crc_env):
    """-w flavor through the CLI: multi-window first_step trains."""
    tmp_path, cfg_path, cfg = crc_env
    cfg2 = json.loads(json.dumps(cfg))
    cfg2["dataset"].update({"window_width": 4096, "window_center": 0.0,
                            "window_scale": 2.0})
    cfg2["loss"]["recon_weights"] = [1.0, 1.0, 1.0]
    cfg2["loss"]["freq_weights"] = [1.0, 1.0, 1.0]
    cfg2["loss"]["percep_weights"] = [0.0, 0.0, 0.0]
    cfg2["save"]["study_name"] = "e2e_mw"
    p = tmp_path / "config_mw.json"
    p.write_text(json.dumps(cfg2))
    from medical_image_editing_tpu.cli.run_vqwnet import main

    rc = main(["-c", str(p), "-m", "train", "-w", "--max-steps", "2"])
    assert rc == 0
    log = (tmp_path / "results" / "e2e_mw" / "version_0" / "log.csv").read_text()
    lines = log.splitlines()
    assert len(lines) >= 3
    total = float(lines[1].split(",")[2])
    assert np.isfinite(total)


@pytest.mark.slow
def test_fit_mid_epoch_resume_consumes_only_remaining_batches(crc_env):
    """Preemption mid-epoch: resume replays only the unseen tail of that
    epoch (loader order is a pure function of (seed, epoch)), so the total
    optimizer steps equal one uninterrupted epoch's."""
    import jax

    tmp_path, cfg_path, cfg = crc_env
    from medical_image_editing_tpu.train.trainer import Trainer
    from medical_image_editing_tpu.utils.config import to_config
    from medical_image_editing_tpu.utils.logging import Logger

    # 8 samples, batch 2, drop_last → 4 steps/epoch; preempt after 3
    logger = Logger(str(tmp_path / "mid_run"), config=to_config(cfg),
                    monitoring_metrics=["total"], name="m")
    trainer = Trainer(to_config(cfg), logger=logger)
    state = trainer.fit(max_steps=3)
    assert int(jax.device_get(state.step)) == 3
    assert int(jax.device_get(state.epoch)) == 0
    ckpt_dir = os.path.join(logger.log_dir, "ckpt")

    cfg2 = json.loads(json.dumps(cfg))
    cfg2["run"]["resume_checkpoint"] = ckpt_dir
    logger2 = Logger(str(tmp_path / "mid_run2"), config=to_config(cfg2),
                     monitoring_metrics=["total"], name="m")
    trainer2 = Trainer(to_config(cfg2), logger=logger2)
    state2 = trainer2.fit()  # n_epochs=1: finish epoch 0 only
    assert int(jax.device_get(state2.step)) == 4  # 3 + the single unseen batch
    assert int(jax.device_get(state2.epoch)) == 1


@pytest.mark.slow
def test_fit_periodic_mid_epoch_saves(crc_env, monkeypatch):
    """save.save_every_n_steps triggers mid-epoch checkpoints (preemption
    safety) in addition to the epoch-end save."""
    from medical_image_editing_tpu.train import trainer as trainer_mod
    from medical_image_editing_tpu.train.trainer import Trainer
    from medical_image_editing_tpu.utils.config import to_config
    from medical_image_editing_tpu.utils.logging import Logger

    tmp_path, cfg_path, cfg = crc_env
    cfg = json.loads(json.dumps(cfg))
    cfg["save"]["save_every_n_steps"] = 2

    calls = []
    orig = trainer_mod.CheckpointManager.save

    def spy(self, state, epoch, step=None):
        calls.append(int(jax.device_get(state.step)))
        return orig(self, state, epoch, step=step)

    monkeypatch.setattr(trainer_mod.CheckpointManager, "save", spy)
    import jax

    logger = Logger(str(tmp_path / "periodic_run"), config=to_config(cfg),
                    monitoring_metrics=["total"], name="p")
    Trainer(to_config(cfg), logger=logger).fit(max_epochs=1)
    # 4 steps/epoch: periodic at steps 2 and 4, epoch-end at 4
    assert calls == [2, 4, 4], calls


@pytest.mark.slow
def test_fit_profile_capture(crc_env):
    """run.profile_dir captures a TensorBoard-loadable XLA trace of the
    configured step window during fit."""
    from medical_image_editing_tpu.train.trainer import Trainer
    from medical_image_editing_tpu.utils.config import to_config
    from medical_image_editing_tpu.utils.logging import Logger

    tmp_path, cfg_path, cfg = crc_env
    cfg = json.loads(json.dumps(cfg))
    prof_dir = str(tmp_path / "trace")
    cfg["run"]["profile_dir"] = prof_dir
    cfg["run"]["profile_start_step"] = 2
    cfg["run"]["profile_num_steps"] = 1

    logger = Logger(str(tmp_path / "prof_run"), config=to_config(cfg),
                    monitoring_metrics=["total"], name="pr")
    Trainer(to_config(cfg), logger=logger).fit(max_epochs=1)
    traces = []
    for root, _, names in os.walk(prof_dir):
        traces += [n for n in names if n.endswith((".trace.json.gz", ".xplane.pb"))]
    assert traces, f"no trace files under {prof_dir}"


@pytest.mark.slow
def test_run_recon_serve_loop_inotify(tmp_path, rng):
    """serve() with the inotify watcher: each wait wakes on the editor's next
    write instead of sleeping out the (deliberately huge) poll interval."""
    import threading
    import time

    from medical_image_editing_tpu.cli import run_recon as rr
    from medical_image_editing_tpu.utils import nifti

    class TinyConfig(rr.LungConfig):
        enc_filters = (4, 8, 16, 32, 64)
        dec_filters = (4, 8, 16, 32, 64)

        def __init__(self):
            self.resume_checkpoint = None
            self.edited_file_path = str(tmp_path / "edited.nii.gz")
            self.save_dir_path = str(tmp_path / "out")

    config = TinyConfig()
    ids = rng.integers(0, 6, (32, 32)).astype(np.float64)
    nifti.save(np.transpose(ids[::-1, ::-1]), config.edited_file_path)

    def n_recons():
        try:
            return sum(f.startswith("recon_")
                       for f in os.listdir(config.save_dir_path))
        except FileNotFoundError:
            return 0

    stop = threading.Event()

    def editor():
        # after each processed edit appears, write the next map — every
        # serve() wait must wake on the write, never on the 60 s timeout
        for k in (1, 2):
            while n_recons() < k and not stop.is_set():
                time.sleep(0.05)
            # recon filenames carry second-granularity timestamps (reference
            # naming); space the writes out so outputs don't overwrite
            time.sleep(1.2)
            nifti.save(np.transpose(((ids + k) % 6)[::-1, ::-1]),
                       config.edited_file_path)

    th = threading.Thread(target=editor, daemon=True)
    th.start()
    t0 = time.monotonic()
    # 3 iterations, poll_seconds=60: a dead watcher would sleep ~3 min;
    # the first iteration still pays the CPU jit compile (~1 min budget)
    rr.serve(config, poll_seconds=60.0, max_iters=3, watch="inotify")
    elapsed = time.monotonic() - t0
    stop.set()
    th.join(timeout=5)
    assert n_recons() >= 3, n_recons()  # initial + both mid-wait edits
    assert elapsed < 150.0, elapsed  # compile budget, NOT 3 poll timeouts


def test_http_edit_service(tmp_path, rng):
    """HTTP serving surface: healthz, npy edit round trip (values identical
    to the direct jitted path), PNG format, malformed-input 400."""
    import io
    import threading
    import urllib.error
    import urllib.request
    from http.server import ThreadingHTTPServer

    from medical_image_editing_tpu.cli import run_recon as rr
    from medical_image_editing_tpu.cli.serve_http import EditService, make_handler

    class TinyConfig(rr.LungConfig):
        enc_filters = (4, 8, 16, 32, 64)
        dec_filters = (4, 8, 16, 32, 64)

        def __init__(self):
            self.resume_checkpoint = None
            self.edited_file_path = None
            self.save_dir_path = str(tmp_path / "out")

    service = EditService(TinyConfig())
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            info = json.loads(r.read())
        assert info["status"] == "ok" and info["dict_size"] == 10

        ids = rng.integers(0, 6, (32, 32)).astype(np.int32)
        buf = io.BytesIO(); np.save(buf, ids)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/edit", data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            assert float(r.headers["X-Edit-Ms"]) > 0
            recon = np.load(io.BytesIO(r.read()))
        assert recon.shape == (32, 32) and np.isfinite(recon).all()
        direct, _ = service.edit(ids)
        np.testing.assert_allclose(recon, direct, atol=1e-6)

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/edit?format=png",
            data=buf.getvalue(), method="POST")
        with urllib.request.urlopen(req, timeout=120) as r:
            png = r.read()
        assert png[:8] == b"\x89PNG\r\n\x1a\n"

        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/edit", data=b"not an npy", method="POST")
        try:
            urllib.request.urlopen(bad, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # an empty batch must be a clean client error, not a device dispatch
        ebuf = io.BytesIO(); np.save(ebuf, np.zeros((0, 32, 32), np.int32))
        empty = urllib.request.Request(
            f"http://127.0.0.1:{port}/edit", data=ebuf.getvalue(), method="POST")
        try:
            urllib.request.urlopen(empty, timeout=30)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()


def test_sharded_eval_matches_single_device(crc_env):
    """Data-parallel test(): metrics identical to a single-device run (the
    per-batch metric is a global mean; GSPMD only splits the compute)."""
    import jax

    tmp_path, cfg_path, cfg = crc_env
    from medical_image_editing_tpu.train.trainer import Trainer
    from medical_image_editing_tpu.utils.config import to_config

    multi = Trainer(to_config(cfg), logger=None)
    assert multi.mesh is not None  # conftest's virtual mesh engaged
    state = multi.init_state(32, 2)
    out_multi, _ = multi.test(state, save_dir_path=str(tmp_path / "m"))

    single = Trainer(to_config(cfg), logger=None,
                     devices=jax.devices()[:1])
    out_single, _ = single.test(state, save_dir_path=str(tmp_path / "s"))
    assert len(out_multi) == len(out_single) > 0
    for a, b in zip(out_multi, out_single):
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-5, atol=1e-6)


def test_http_edit_service_spatial_partition(tmp_path, rng):
    """EditService(partition='spatial') serves the GSPMD row-sharded decode
    and returns the same values as the unpartitioned service."""
    from medical_image_editing_tpu.cli import run_recon as rr
    from medical_image_editing_tpu.cli.serve_http import EditService

    class TinyConfig(rr.LungConfig):
        enc_filters = (4, 8, 16, 32, 64)
        dec_filters = (4, 8, 16, 32, 64)

        def __init__(self):
            self.resume_checkpoint = None
            self.edited_file_path = None
            self.save_dir_path = str(tmp_path / "out")

    sharded = EditService(TinyConfig(), partition="spatial")
    assert sharded.partition == "spatial"

    ids = rng.integers(0, 6, (32, 32)).astype(np.int32)
    # compare against the unsharded decode of the SAME (random-init) weights
    from medical_image_editing_tpu.cli.edit_batch import make_batched_edit_fn

    want = np.asarray(
        make_batched_edit_fn(
            sharded.decoder,
            is_lung=True,
            dataset_window=(sharded.config.window_width,
                            sharded.config.window_center,
                            sharded.config.window_scale),
        )(sharded.state.dec_vars, sharded.state.vq, ids[None])
    )[0]
    got, ms = sharded.edit(ids)
    assert ms > 0
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_http_edit_service_data_partition_pads_batch(tmp_path, rng):
    """partition='data' must serve ANY batch size: shard_map needs
    batch % n_devices == 0, so the service pads and slices internally
    (a 1-slice POST on an 8-device mesh previously crashed)."""
    from medical_image_editing_tpu.cli import run_recon as rr
    from medical_image_editing_tpu.cli.serve_http import EditService

    class TinyConfig(rr.LungConfig):
        enc_filters = (4, 8, 16, 32, 64)
        dec_filters = (4, 8, 16, 32, 64)

        def __init__(self):
            self.resume_checkpoint = None
            self.edited_file_path = None
            self.save_dir_path = str(tmp_path / "out")

    service = EditService(TinyConfig(), partition="data")
    assert service._batch_multiple == 8  # conftest's virtual mesh

    for shape in ((32, 32), (3, 32, 32)):  # 1 and 3 both indivisible by 8
        ids = rng.integers(0, 6, shape).astype(np.int32)
        recon, ms = service.edit(ids)
        assert recon.shape == shape
        assert np.isfinite(recon).all() and ms > 0


@pytest.mark.slow
def test_no_double_save_on_max_steps_boundary(crc_env, monkeypatch):
    """max_steps landing exactly on a save_every_n_steps boundary must save
    that step ONCE — a second force=True save to the same path would briefly
    delete the committed checkpoint (preemption-loss window)."""
    tmp_path, cfg_path, cfg = crc_env
    cfg["save"]["save_every_n_steps"] = 2
    cfg_path.write_text(json.dumps(cfg))

    from medical_image_editing_tpu.train import trainer as trainer_mod

    step_saves = []
    orig_cm = trainer_mod.CheckpointManager

    class Counting(orig_cm):
        def save(self, state, epoch, step=None):
            if step is not None:
                step_saves.append(step)
            return super().save(state, epoch, step=step)

    monkeypatch.setattr(trainer_mod, "CheckpointManager", Counting)
    from medical_image_editing_tpu.cli.run_vqwnet import main

    rc = main(["-c", str(cfg_path), "-m", "train", "--max-steps", "2"])
    assert rc == 0
    assert step_saves.count(2) == 1, step_saves


def test_fit_halts_on_non_finite_total(crc_env):
    """Divergence guard: a non-finite 'total' halts fit with a clear error
    (run.halt_on_non_finite, default on); setting it false — which the
    config loader's False→None quirk turns into None — trains on through,
    matching the reference's unguarded behavior."""
    import jax
    import jax.numpy as jnp

    from medical_image_editing_tpu.train.trainer import Trainer, TrainingDivergedError
    from medical_image_editing_tpu.utils.config import to_config
    from medical_image_editing_tpu.utils.logging import Logger

    tmp_path, cfg_path, cfg = crc_env

    def poison(trainer):
        orig = trainer.train_step

        def poisoned(state, image, drop_prob):
            state, metrics = orig(state, image, drop_prob)
            metrics = dict(metrics)
            metrics["total"] = jnp.float32(float("nan"))
            return state, metrics

        trainer.train_step = poisoned

    logger = Logger(str(tmp_path / "nan_run"), config=to_config(cfg),
                    monitoring_metrics=["total"], name="n")
    trainer = Trainer(to_config(cfg), logger=logger)
    poison(trainer)
    with pytest.raises(TrainingDivergedError, match="non-finite 'total' at step 1"):
        trainer.fit(max_steps=2)

    cfg2 = json.loads(json.dumps(cfg))
    cfg2["run"]["halt_on_non_finite"] = False  # → None via the loader quirk
    logger2 = Logger(str(tmp_path / "nan_run2"), config=to_config(cfg2),
                     monitoring_metrics=["total"], name="n")
    trainer2 = Trainer(to_config(cfg2), logger=logger2)
    poison(trainer2)
    state = trainer2.fit(max_steps=1)  # completes despite the NaN total
    assert int(jax.device_get(state.step)) == 1


def test_serve_batch_bucketing(tmp_path, rng):
    """pow2 bucketing bounds the compiled-shape set: a b-slice request
    dispatches the next power of two (rounded to the shard multiple) and the
    response is sliced back to b."""
    from medical_image_editing_tpu.cli import run_recon as rr
    from medical_image_editing_tpu.cli.serve_http import EditService, bucket_batch

    # policy math
    assert [bucket_batch(b, "pow2") for b in (1, 2, 3, 5, 8, 9)] == [1, 2, 4, 8, 8, 16]
    assert bucket_batch(3, "exact") == 3
    assert bucket_batch(3, "pow2", multiple=8) == 8   # compose with shard pad
    assert bucket_batch(3, "exact", multiple=8) == 8

    class TinyConfig(rr.LungConfig):
        enc_filters = (4, 8, 16, 32, 64)
        dec_filters = (4, 8, 16, 32, 64)

        def __init__(self):
            self.resume_checkpoint = None
            self.edited_file_path = None
            self.save_dir_path = str(tmp_path / "out")

    service = EditService(TinyConfig())  # default pow2
    dispatched = []
    inner = service.edit_fn

    def spy(dec_vars, vq, ids):
        dispatched.append(int(ids.shape[0]))
        return inner(dec_vars, vq, ids)

    service.edit_fn = spy
    for b in (3, 5):
        ids = rng.integers(0, 6, (b, 32, 32)).astype(np.int32)
        recon, ms = service.edit(ids)
        assert recon.shape[0] == b
        assert np.isfinite(recon).all()
    assert dispatched == [4, 8]

    exact = EditService(TinyConfig(), batch_bucketing="exact")
    exact.edit_fn = spy
    dispatched.clear()
    exact.edit(rng.integers(0, 6, (3, 32, 32)).astype(np.int32))
    assert dispatched == [3]
