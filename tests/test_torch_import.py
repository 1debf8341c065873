"""Reference-checkpoint importer: torch/Lightning `.ckpt` → our variables.

Each test builds the reference's own torch module, saves a Lightning-shaped
checkpoint (`{'state_dict': {...}, 'epoch': N}` — `run_recon.py:99-100`),
imports it with `utils.torch_import`, and pins forward parity between the
torch model and the imported flax model. This is the migration path for users
bringing *trained* reference models across (VERDICT r1 adoption surface).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import parity_helpers as ph
from parity_helpers import REF_SRC

from medical_image_editing_tpu.utils import torch_import as ti

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason="reference checkout not available"
)

FILTERS = [4, 8, 16, 32, 64]


def _save_ckpt(tmp_path, torch, named_modules, epoch=2):
    """Fake Lightning ckpt: state_dict with attribute-name prefixes."""
    sd = {}
    for prefix, module in named_modules.items():
        for k, v in module.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    path = str(tmp_path / "ref.ckpt")
    torch.save({"state_dict": sd, "epoch": epoch, "global_step": 17}, path)
    return path


@pytest.fixture(scope="module")
def ref(request):
    torch = pytest.importorskip("torch")
    mods = {
        "enc": ph.import_ref_module("unet_encoder"),
        "dec": ph.import_ref_module("unet_decoder"),
        "torch": torch,
    }
    return mods


def test_import_encoder_vq_forward_parity(ref, rng, tmp_path):
    torch = ref["torch"]
    tenc = ref["enc"].UNetEncoder(
        in_channels=1, filters=FILTERS, dict_size=5, use_styled_up_block=False,
        init_embed=True, knn_backend="torch",
    ).eval()
    path = _save_ckpt(tmp_path, torch, {"encoder": tenc})

    sd = ti.load_reference_state_dict(path)
    from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ

    jenc = EncoderWithVQ(filters=tuple(FILTERS), dict_size=5, momentum=0.99)
    x0 = jnp.zeros((1, 32, 32, 1))
    target, _ = jenc.init(jax.random.key(0), x0)
    enc_vars = ti.import_unet_encoder(sd, "encoder.", target_vars=target)
    vq = ti.import_vq_state(sd, "encoder.vq.")

    x = rng.normal(size=(2, 32, 32, 1)).astype(np.float32)
    q_j, commit_j, ids_j, _, _ = jenc(enc_vars, vq, jnp.asarray(x), train=False)
    with torch.no_grad():
        q_t, commit_t, ids_t = tenc(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(q_j), q_t.numpy().transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_array_equal(np.asarray(ids_j), ids_t.numpy())
    np.testing.assert_allclose(float(commit_j), float(commit_t), rtol=1e-4)


@pytest.mark.parametrize("use_pixel_shuffle", [False, True])
def test_import_decoder_eval_parity_with_bn_stats(ref, rng, tmp_path,
                                                  use_pixel_shuffle):
    """Eval-mode parity — requires the SPADE BatchNorm *running stats* to be
    imported, so the torch model first trains its stats on random batches."""
    torch = ref["torch"]
    tdec = ref["dec"].UNetDecoder(
        in_channels=4, out_channels=1, filters=FILTERS, use_dropblock=False,
        dropped_skip_layers=[], use_styled_up_block=True,
        use_pixel_shuffle=use_pixel_shuffle,
    ).train()
    with torch.no_grad():
        for _ in range(2):  # make running_mean/var non-trivial
            tdec(torch.from_numpy(
                rng.normal(size=(2, 4, 32, 32)).astype(np.float32)))
    tdec = tdec.eval()
    path = _save_ckpt(tmp_path, torch, {"decoder": tdec})

    sd = ti.load_reference_state_dict(path)
    from medical_image_editing_tpu.models import UNetDecoder

    jdec = UNetDecoder(
        out_channels=1, filters=tuple(FILTERS), dropped_skip_layers=(),
        use_pixel_shuffle=use_pixel_shuffle,
    )
    x = rng.normal(size=(2, 32, 32, 4)).astype(np.float32)
    target = jdec.init(
        {"params": jax.random.key(0), "dropblock": jax.random.key(1)},
        jnp.asarray(x), train=False,
    )
    dec_vars = ti.import_unet_decoder(sd, "decoder.", target_vars=target)

    out_j = jdec.apply(dec_vars, jnp.asarray(x), False, 0.0)
    with torch.no_grad():
        out_t = tdec(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
    )


def test_import_decoder_last_pixel_shuffle_head(ref, rng, tmp_path):
    torch = ref["torch"]
    tdec = ref["dec"].UNetDecoder(
        in_channels=4, out_channels=1, filters=FILTERS, use_dropblock=False,
        dropped_skip_layers=[], use_styled_up_block=True,
        use_pixel_shuffle=True, use_last_pixel_shuffle=True,
    ).train()
    path = _save_ckpt(tmp_path, torch, {"decoder": tdec})
    sd = ti.load_reference_state_dict(path)

    from medical_image_editing_tpu.models import UNetDecoder

    jdec = UNetDecoder(
        out_channels=1, filters=tuple(FILTERS), dropped_skip_layers=(),
        use_pixel_shuffle=True, use_last_pixel_shuffle=True,
    )
    x = rng.normal(size=(2, 32, 32, 4)).astype(np.float32)
    target = jdec.init(
        {"params": jax.random.key(0), "dropblock": jax.random.key(1)},
        jnp.asarray(x), train=False,
    )
    dec_vars = ti.import_unet_decoder(sd, "decoder.", target_vars=target)
    # train-mode comparison (batch stats) — fresh running stats are trivial
    out_j, _ = jdec.apply(
        dec_vars, jnp.asarray(x), True, 0.0, mutable=["batch_stats"]
    )
    with torch.no_grad():
        out_t = tdec(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
    )


def test_import_encoder_styled_variant_detected_and_checked(ref, tmp_path):
    """The styled-up-block encoder path is detected from the key space. The
    reference's OWN styled encoder is unrunnable (`unet_encoder.py:46` builds
    `up_conv1_1` with the wrong in_channels — any forward crashes, so no
    trained ckpt of it can exist); importing such a ckpt must fail loudly on
    the shape check rather than produce silently-wrong weights. A user's
    locally-fixed styled encoder (correct in_channels) imports cleanly — the
    mapping itself is exercised via the decoder tests (same block type)."""
    torch = ref["torch"]
    tenc = ref["enc"].UNetEncoder(
        in_channels=1, filters=FILTERS, dict_size=5, use_styled_up_block=True,
        init_embed=True, knn_backend="torch",
    )
    path = _save_ckpt(tmp_path, torch, {"encoder": tenc})
    sd = ti.load_reference_state_dict(path)

    from medical_image_editing_tpu.models import UNetEncoder

    jenc = UNetEncoder(filters=tuple(FILTERS), use_styled_up_block=True)
    target = jenc.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)),
                       train=False)
    with pytest.raises(ValueError, match="shape"):
        ti.import_unet_encoder(sd, "encoder.", target_vars=target)
    # without a target the structural mapping itself succeeds (styled blocks
    # + BN stats detected)
    enc_vars = ti.import_unet_encoder(sd, "encoder.")
    assert "StyledResUpBlock_0" in enc_vars["params"]
    assert "batch_stats" in enc_vars


def test_import_encoder_rejects_mismatched_architecture(ref, tmp_path):
    torch = ref["torch"]
    tenc = ref["enc"].UNetEncoder(
        in_channels=1, filters=FILTERS, dict_size=5, use_styled_up_block=False,
        init_embed=True, knn_backend="torch",
    )
    path = _save_ckpt(tmp_path, torch, {"encoder": tenc})
    sd = ti.load_reference_state_dict(path)

    from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ

    wrong = EncoderWithVQ(filters=(8, 16, 32, 64, 128), dict_size=5)
    target, _ = wrong.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
    with pytest.raises(ValueError, match="shape"):
        ti.import_unet_encoder(sd, "encoder.", target_vars=target)

    with pytest.raises(KeyError, match="UNetDecoder"):
        ti.import_unet_decoder(sd, "encoder.")  # encoder keys ≠ decoder keys


@pytest.mark.parametrize(
    "normalization,spectral",
    [("instancenorm", False), ("batchnorm", False), ("actnorm", False),
     ("instancenorm", True)],
)
def test_import_nlayer_discriminator_parity(rng, tmp_path, normalization,
                                            spectral):
    torch = pytest.importorskip("torch")
    disc_mod = ph.import_ref_module("discriminator")
    tdis = disc_mod.NLayerDiscriminator(
        in_channels=1, out_channels=1, n_filters=8, n_layers=2,
        normalization=normalization,
    )
    if spectral:
        # reference apply_spectral_norm (`utils/__init__.py:54-64`)
        for m in tdis.main:
            if isinstance(m, torch.nn.Conv2d):
                torch.nn.utils.spectral_norm(m)
    tdis.train()
    x = rng.normal(size=(2, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        out_t = tdis(torch.from_numpy(x)).numpy()  # inits ActNorm / iterates u
    path = _save_ckpt(tmp_path, torch, {"discriminator": tdis})
    sd = ti.load_reference_state_dict(path)

    from medical_image_editing_tpu.models import NLayerDiscriminator

    jdis = NLayerDiscriminator(
        out_channels=1, n_filters=8, n_layers=2, normalization=normalization,
        apply_spectral_norm=spectral,
    )
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    target = jdis.init(jax.random.key(0), xj, train=False)
    dis_vars = ti.import_nlayer_discriminator(sd, "discriminator.",
                                              target_vars=target)

    if spectral:
        # the ckpt's u is post-forward; torch applies one more power
        # iteration per forward, as does flax: rerun torch once more so both
        # sides have performed the same number of iterations on this u
        with torch.no_grad():
            out_t = tdis(torch.from_numpy(x)).numpy()
    mutable = [k for k in dis_vars if k != "params"]
    out_j = jdis.apply(dis_vars, xj, train=True, mutable=mutable)[0]
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
    )


@pytest.mark.slow
def test_import_unet_discriminator_parity(rng, tmp_path):
    torch = pytest.importorskip("torch")
    ref_unet_dis = ph.import_ref_module("unet_discriminator")
    from test_gan_parity import _build_torch_unet_dis

    tdis = _build_torch_unet_dis(ref_unet_dis).train()
    path = _save_ckpt(tmp_path, torch, {"discriminator": tdis})
    sd = ti.load_reference_state_dict(path)

    from medical_image_editing_tpu.models import UNetDiscriminator

    jdis = UNetDiscriminator(D_ch=8, resolution=128)
    x = rng.normal(size=(2, 128, 128, 3)).astype(np.float32)
    xj = jnp.asarray(x)
    target = jdis.init(jax.random.key(0), xj, train=False)
    dis_vars = ti.import_unet_discriminator(sd, "discriminator.",
                                            target_vars=target)

    (map_j, mid_j, _), _ = jdis.apply(
        dis_vars, xj, train=True, mutable=["batch_stats"]
    )
    with torch.no_grad():
        map_t, mid_t, _ = tdis(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(map_j)[..., 0], map_t.numpy()[:, 0], rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(mid_j), mid_t.numpy(), rtol=1e-3, atol=1e-4
    )


@pytest.mark.slow
def test_import_ckpt_cli_end_to_end(ref, rng, tmp_path):
    """Full migration path: reference Lightning ckpt → `import-ckpt` CLI →
    Orbax dir → staged restore via `run.first_stage_ckpt_path` +
    `run.discriminator_ckpt_path` → eval decode matches torch."""
    import json

    torch = ref["torch"]
    from test_end_to_end import _config

    cfg = _config(tmp_path, tmp_path / "data")  # data dir unused by import
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))

    tenc = ref["enc"].UNetEncoder(
        in_channels=1, filters=FILTERS, dict_size=5, use_styled_up_block=False,
        init_embed=True, knn_backend="torch",
    ).eval()
    tdec = ref["dec"].UNetDecoder(
        in_channels=FILTERS[0], out_channels=1, filters=FILTERS,
        use_dropblock=False, dropped_skip_layers=[], use_styled_up_block=True,
        use_pixel_shuffle=False,
    ).eval()
    disc_mod = ph.import_ref_module("discriminator")
    tdis = disc_mod.NLayerDiscriminator(
        in_channels=1, out_channels=1, n_filters=8, n_layers=2,
        normalization="instancenorm",
    ).eval()
    ckpt = _save_ckpt(
        tmp_path, torch,
        {"encoder": tenc, "decoder": tdec, "discriminator": tdis}, epoch=7,
    )

    from medical_image_editing_tpu.cli.import_ckpt import main

    out = str(tmp_path / "converted")
    rc = main(["-c", str(cfg_path), "--ckpt", ckpt, "--out", out])
    assert rc == 0

    # staged restore through the real trainer surface
    cfg["run"]["first_stage_ckpt_path"] = out
    cfg["run"]["discriminator_ckpt_path"] = out
    from medical_image_editing_tpu.train.trainer import Trainer
    from medical_image_editing_tpu.utils.config import to_config

    trainer = Trainer(to_config(cfg), logger=None)
    state = trainer.init_state(32)

    np.testing.assert_allclose(
        np.asarray(state.vq.embed), tenc.vq.embed.numpy(), rtol=1e-6
    )
    # eval decode parity end to end: ids → codebook lookup → decoder
    from medical_image_editing_tpu.models.unet_encoder import get_embed_from_ids

    ids = rng.integers(0, 5, (1, 32, 32)).astype(np.int32)
    emb_j = get_embed_from_ids(state.vq, jnp.asarray(ids))
    out_j = trainer.decoder.apply(state.dec_vars, emb_j, False, 0.0)
    with torch.no_grad():
        emb_t = tenc.get_embed_from_ids(torch.from_numpy(ids).long())
        out_t = tdec(emb_t).numpy()
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
    )
    # discriminator came across too
    r = trainer.dis.apply(state.dis_vars, jnp.zeros((1, 32, 32, 1)), train=False)
    assert np.all(np.isfinite(np.asarray(r)))


@pytest.mark.slow
def test_lightning_ckpt_file_accepted_directly(ref, rng, tmp_path):
    """`run.first_stage_ckpt_path` / `run.discriminator_ckpt_path` and
    `run_recon`'s `resume_checkpoint` accept a reference Lightning `.ckpt`
    FILE directly (auto-converted in memory; Orbax checkpoints are
    directories, so a plain isfile check disambiguates)."""
    import json
    import types

    torch = ref["torch"]
    from test_end_to_end import _config

    tenc = ref["enc"].UNetEncoder(
        in_channels=1, filters=FILTERS, dict_size=5, use_styled_up_block=False,
        init_embed=True, knn_backend="torch",
    ).eval()
    tdec = ref["dec"].UNetDecoder(
        in_channels=FILTERS[0], out_channels=1, filters=FILTERS,
        use_dropblock=False, dropped_skip_layers=[], use_styled_up_block=True,
        use_pixel_shuffle=False,
    ).eval()
    disc_mod = ph.import_ref_module("discriminator")
    tdis = disc_mod.NLayerDiscriminator(
        in_channels=1, out_channels=1, n_filters=8, n_layers=2,
        normalization="instancenorm",
    ).eval()
    ckpt = _save_ckpt(
        tmp_path, torch,
        {"encoder": tenc, "decoder": tdec, "discriminator": tdis},
    )

    cfg = _config(tmp_path, tmp_path / "data")
    cfg["run"]["first_stage_ckpt_path"] = ckpt     # a FILE, not a dir
    cfg["run"]["discriminator_ckpt_path"] = ckpt
    from medical_image_editing_tpu.train.trainer import Trainer
    from medical_image_editing_tpu.utils.config import to_config

    trainer = Trainer(to_config(cfg), logger=None)
    state = trainer.init_state(32)
    np.testing.assert_allclose(
        np.asarray(state.vq.embed), tenc.vq.embed.numpy(), rtol=1e-6
    )
    assert any(
        k.startswith("Conv_") for k in state.dis_vars["params"]
    )  # discriminator came across

    # serving surface: run_recon.load_model with the .ckpt file
    from medical_image_editing_tpu.cli.run_recon import load_model

    rc_cfg = types.SimpleNamespace(
        in_channels=1, enc_filters=FILTERS, dec_filters=FILTERS, dict_size=5,
        momentum=0.99, use_dropblock=False, block_size=3,
        dropped_skip_layers=[], use_pixel_shuffle=False,
        resume_checkpoint=ckpt,
    )
    _, decoder, rstate = load_model(rc_cfg)
    np.testing.assert_allclose(
        np.asarray(rstate.vq.embed), tenc.vq.embed.numpy(), rtol=1e-6
    )
    out = decoder.apply(
        rstate.dec_vars, jnp.zeros((1, 32, 32, FILTERS[0])), False, 0.0
    )
    assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.slow
def test_import_vqgan_parity(rng, tmp_path):
    torch = pytest.importorskip("torch")
    vqgan_mod = ph.import_ref_module("vqgan")
    # all widths divisible by 32: torch GroupNorm(32, C) requires it
    tvq = vqgan_mod.VQGAN(
        in_channels=1, mid_channels=32, out_channels=1, emb_dim=32,
        dict_size=8, enc_ch_multiplier=[1, 2], dec_ch_multiplier=[1, 2],
        num_res_blocks=1, enc_attn_resolutions=[8], dec_attn_resolutions=[8],
        resolution=16, p_dropout=0.0, resamp_with_conv=True,
        knn_backend="torch",
    ).eval()
    path = _save_ckpt(tmp_path, torch, {"decoder": tvq})
    sd = ti.load_reference_state_dict(path)

    from medical_image_editing_tpu.models.vqgan import VQGAN

    jvq = VQGAN(
        in_channels=1, mid_channels=32, out_channels=1, emb_dim=32,
        dict_size=8, enc_ch_multiplier=(1, 2), dec_ch_multiplier=(1, 2),
        num_res_blocks=1, enc_attn_resolutions=(8,), dec_attn_resolutions=(8,),
        resolution=16,
    )
    from medical_image_editing_tpu.ops.vq import vq_init

    x = rng.normal(size=(1, 16, 16, 1)).astype(np.float32)
    vq0 = vq_init(jax.random.key(1), 8, 32)
    target = jvq.init(jax.random.key(0), jnp.asarray(x), vq0, train=False)
    vars_j, vq_state = ti.import_vqgan(sd, "decoder.", target_vars=target)

    recon_j, commit_j, ids_j, _, _ = jvq.apply(
        vars_j, jnp.asarray(x), vq_state, train=False
    )
    with torch.no_grad():
        recon_t, commit_t, ids_t, _ = tvq(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(recon_j), recon_t.numpy().transpose(0, 2, 3, 1),
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(float(commit_j), float(commit_t), rtol=1e-3)


def test_import_casts_half_precision_to_f32(ref, tmp_path):
    """A reference ckpt saved in fp16 (e.g. model.half()) must import as f32:
    shape-only validation would otherwise let fp16 leaves silently replace f32
    params and break the later Orbax restore against an f32 skeleton."""
    torch = ref["torch"]
    tenc = ref["enc"].UNetEncoder(
        in_channels=1, filters=FILTERS, dict_size=5, use_styled_up_block=False,
        init_embed=True, knn_backend="torch",
    ).half()
    path = _save_ckpt(tmp_path, torch, {"encoder": tenc})

    sd, meta = ti.load_reference_ckpt(path)
    assert meta == {"epoch": 2, "step": 17}
    assert all(v.dtype == np.float32 for v in sd.values())
    enc_vars = ti.import_unet_encoder(sd, "encoder.")
    leaf = enc_vars["params"]["ResBlock_0"]["Conv_0"]["kernel"]
    assert leaf.dtype == jnp.float32


def test_import_vq_state_validates_codebook_shape(ref, tmp_path):
    """dict_size mismatches must fail at import, not as wrong edits or a
    far-away Orbax restore error (encoder conv shapes are independent of
    dict_size, so only the VQ buffers can catch this)."""
    torch = ref["torch"]
    tenc = ref["enc"].UNetEncoder(
        in_channels=1, filters=FILTERS, dict_size=8, use_styled_up_block=False,
        init_embed=True, knn_backend="torch",
    )
    path = _save_ckpt(tmp_path, torch, {"encoder": tenc})
    sd = ti.load_reference_state_dict(path)

    from medical_image_editing_tpu.ops.vq import vq_init

    good = vq_init(jax.random.key(0), 8, FILTERS[0])
    ti.import_vq_state(sd, "encoder.vq.", target=good)  # matching: fine
    bad = vq_init(jax.random.key(0), 5, FILTERS[0])
    with pytest.raises(ValueError, match="dict_size"):
        ti.import_vq_state(sd, "encoder.vq.", target=bad)


def test_import_nlayer_spectral_sigma_is_torch_eval_sigma(rng, tmp_path):
    """The stored SpectralNorm sigma must be torch's actual eval-mode divisor
    u^T.W.v (stored u/v), not a 1.0 placeholder."""
    torch = pytest.importorskip("torch")
    disc_mod = ph.import_ref_module("discriminator")
    tdis = disc_mod.NLayerDiscriminator(
        in_channels=1, out_channels=1, n_filters=8, n_layers=2,
        normalization="instancenorm",
    )
    sn_convs = []
    for m in tdis.main:
        if isinstance(m, torch.nn.Conv2d):
            torch.nn.utils.spectral_norm(m)
            sn_convs.append(m)
    x = rng.normal(size=(2, 1, 32, 32)).astype(np.float32)
    with torch.no_grad():
        for _ in range(3):
            tdis(torch.from_numpy(x))  # a few power iterations on u/v

    path = _save_ckpt(tmp_path, torch, {"discriminator": tdis})
    sd = ti.load_reference_state_dict(path)
    dis_vars = ti.import_nlayer_discriminator(sd, "discriminator.")

    for i, m in enumerate(sn_convs):
        w = m.weight_orig.detach().numpy().reshape(m.weight_orig.shape[0], -1)
        u = m.weight_u.detach().numpy()
        v = m.weight_v.detach().numpy()
        sigma_t = float(u @ (w @ v))
        sigma_j = float(
            dis_vars["batch_stats"][f"SpectralNorm_{i}"][f"Conv_{i}/kernel/sigma"]
        )
        assert sigma_j == pytest.approx(sigma_t, rel=1e-6)
        assert abs(sigma_j - 1.0) > 1e-3  # it is not the old placeholder
