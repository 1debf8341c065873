"""Reverse exporter: our variables → reference-compatible Lightning `.ckpt`.

The hand-back half of the migration bridge (import tests:
`test_torch_import.py`): train here on TPU, give the `.ckpt` to a
collaborator running the reference on GPUs. Each test initializes OUR flax
model, exports with `utils.torch_export`, loads the state_dict into the
reference's OWN torch module with `load_state_dict(strict=True)` (so every
reference key must be produced, with the right shape) and pins forward
parity; the CLI test also closes the loop export → `torch_import` → equal
trees.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import parity_helpers as ph
from parity_helpers import REF_SRC

from medical_image_editing_tpu.utils import torch_export as te
from medical_image_editing_tpu.utils import torch_import as ti

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason="reference checkout not available"
)

FILTERS = [4, 8, 16, 32, 64]


def _strict_load(torch, module, sd):
    module.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    return module


@pytest.fixture(scope="module")
def ref():
    torch = pytest.importorskip("torch")
    return {
        "enc": ph.import_ref_module("unet_encoder"),
        "dec": ph.import_ref_module("unet_decoder"),
        "torch": torch,
    }


def test_export_encoder_vq_strict_load_and_parity(ref, rng):
    torch = ref["torch"]
    from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ

    jenc = EncoderWithVQ(filters=tuple(FILTERS), dict_size=5, momentum=0.99)
    enc_vars, vq = jenc.init(jax.random.key(0), jnp.zeros((1, 32, 32, 1)))
    sd = te.export_unet_encoder(enc_vars, vq)

    tenc = ref["enc"].UNetEncoder(
        in_channels=1, filters=FILTERS, dict_size=5, use_styled_up_block=False,
        init_embed=True, knn_backend="torch",
    )
    _strict_load(torch, tenc, sd).eval()

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
def test_export_decoder_strict_load_and_parity(ref, rng, use_pixel_shuffle):
    torch = ref["torch"]
    from medical_image_editing_tpu.models import UNetDecoder

    jdec = UNetDecoder(
        out_channels=1, filters=tuple(FILTERS), dropped_skip_layers=(),
        use_pixel_shuffle=use_pixel_shuffle,
    )
    x = rng.normal(size=(2, 32, 32, FILTERS[0])).astype(np.float32)
    dec_vars = jdec.init(
        {"params": jax.random.key(0), "dropblock": jax.random.key(1)},
        jnp.asarray(x), train=False,
    )
    sd = te.export_unet_decoder(dec_vars)

    tdec = ref["dec"].UNetDecoder(
        in_channels=FILTERS[0], out_channels=1, filters=FILTERS,
        use_dropblock=False, dropped_skip_layers=[], use_styled_up_block=True,
        use_pixel_shuffle=use_pixel_shuffle,
    )
    _strict_load(torch, tdec, sd).eval()

    out_j = jdec.apply(dec_vars, jnp.asarray(x), False, 0.0)
    with torch.no_grad():
        out_t = tdec(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
    )


def test_export_decoder_last_pixel_shuffle_head(ref, rng):
    torch = ref["torch"]
    from medical_image_editing_tpu.models import UNetDecoder

    jdec = UNetDecoder(
        out_channels=1, filters=tuple(FILTERS), dropped_skip_layers=(),
        use_pixel_shuffle=True, use_last_pixel_shuffle=True,
    )
    x = rng.normal(size=(2, 32, 32, FILTERS[0])).astype(np.float32)
    dec_vars = jdec.init(
        {"params": jax.random.key(0), "dropblock": jax.random.key(1)},
        jnp.asarray(x), train=False,
    )
    sd = te.export_unet_decoder(dec_vars)
    tdec = ref["dec"].UNetDecoder(
        in_channels=FILTERS[0], out_channels=1, filters=FILTERS,
        use_dropblock=False, dropped_skip_layers=[], use_styled_up_block=True,
        use_pixel_shuffle=True, use_last_pixel_shuffle=True,
    )
    _strict_load(torch, tdec, sd).eval()
    out_j = jdec.apply(dec_vars, jnp.asarray(x), False, 0.0)
    with torch.no_grad():
        out_t = tdec(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
    )


@pytest.mark.parametrize(
    "normalization,spectral",
    [("instancenorm", False), ("batchnorm", False), ("actnorm", False),
     ("instancenorm", True)],
)
def test_export_nlayer_discriminator_parity(rng, normalization, spectral):
    torch = pytest.importorskip("torch")
    disc_mod = ph.import_ref_module("discriminator")
    from medical_image_editing_tpu.models import NLayerDiscriminator

    jdis = NLayerDiscriminator(
        out_channels=1, n_filters=8, n_layers=2, normalization=normalization,
        apply_spectral_norm=spectral,
    )
    x = rng.normal(size=(2, 32, 32, 1)).astype(np.float32)
    xj = jnp.asarray(x)
    vars0 = jdis.init(jax.random.key(0), xj, train=False)
    # one train-mode apply realizes the ActNorm data-dependent init (a no-op
    # for the other norms; spectral-norm u advances one power iteration)
    mutable = [k for k in vars0 if k != "params"]
    if mutable:
        _, upd = jdis.apply(vars0, xj, train=True, mutable=mutable)
        vars0 = {**vars0, **upd}
    sd = te.export_nlayer_discriminator(vars0)

    tdis = disc_mod.NLayerDiscriminator(
        in_channels=1, out_channels=1, n_filters=8, n_layers=2,
        normalization=normalization,
    )
    if spectral:
        for m in tdis.main:
            if isinstance(m, torch.nn.Conv2d):
                torch.nn.utils.spectral_norm(m)
    _strict_load(torch, tdis, sd).train()

    # one train forward each, from the same exported state (same number of
    # power iterations on the same u; ActNorm/BN already initialized)
    with torch.no_grad():
        out_t = tdis(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out_j = jdis.apply(vars0, xj, train=True, mutable=mutable)[0] if mutable \
        else jdis.apply(vars0, xj, train=True)
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
    )


@pytest.mark.slow
def test_export_unet_discriminator_parity(rng):
    torch = pytest.importorskip("torch")
    ref_unet_dis = ph.import_ref_module("unet_discriminator")
    from test_gan_parity import _build_torch_unet_dis

    from medical_image_editing_tpu.models import UNetDiscriminator

    jdis = UNetDiscriminator(D_ch=8, resolution=128)
    x = rng.normal(size=(2, 128, 128, 3)).astype(np.float32)
    xj = jnp.asarray(x)
    dis_vars = jdis.init(jax.random.key(0), xj, train=False)
    sd = te.export_unet_discriminator(dis_vars, jdis)

    tdis = _build_torch_unet_dis(ref_unet_dis)
    _strict_load(torch, tdis, sd).train()

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
def test_export_conditional_unet_discriminator_round_trip(rng):
    """Projection-conditional D: export strict-loads into a conditional
    reference D with forward parity on labels, and export→import reproduces
    the variables exactly (`unet_discriminator.py:499-501,605-623`)."""
    torch = pytest.importorskip("torch")
    ref_unet_dis = ph.import_ref_module("unet_discriminator")
    from test_gan_parity import _build_torch_unet_dis

    from medical_image_editing_tpu.models import UNetDiscriminator
    from medical_image_editing_tpu.utils import torch_import as ti

    jdis = UNetDiscriminator(D_ch=8, resolution=128, n_classes=5)
    x = rng.normal(size=(2, 128, 128, 3)).astype(np.float32)
    y = np.array([2, 4], dtype=np.int64)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    dis_vars = jdis.init(jax.random.key(0), xj, train=False, y=yj)
    sd = te.export_unet_discriminator(dis_vars, jdis)

    tdis = _build_torch_unet_dis(ref_unet_dis, n_classes=5)
    _strict_load(torch, tdis, sd).train()

    (map_j, mid_j, _), _ = jdis.apply(
        dis_vars, xj, train=True, y=yj, mutable=["batch_stats"]
    )
    with torch.no_grad():
        map_t, mid_t, _ = tdis(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(y)
        )
    np.testing.assert_allclose(
        np.asarray(map_j)[..., 0], map_t.numpy()[:, 0], rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(mid_j), mid_t.numpy(), rtol=1e-3, atol=1e-4
    )

    # exact export→import round trip, embeddings included
    back = ti.import_unet_discriminator(
        {k: np.asarray(v) for k, v in sd.items()}, prefix="",
        target_vars=dis_vars,
    )
    for coll in ("params", "batch_stats"):
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            back[coll], jax.tree.map(np.asarray, dict(dis_vars[coll])),
        )


@pytest.mark.slow
def test_export_vqgan_strict_load_and_parity(rng):
    torch = pytest.importorskip("torch")
    vqgan_mod = ph.import_ref_module("vqgan")
    from medical_image_editing_tpu.models.vqgan import VQGAN
    from medical_image_editing_tpu.ops.vq import vq_init

    jvq = VQGAN(
        in_channels=1, mid_channels=32, out_channels=1, emb_dim=32,
        dict_size=8, enc_ch_multiplier=(1, 2), dec_ch_multiplier=(1, 2),
        num_res_blocks=1, enc_attn_resolutions=(8,), dec_attn_resolutions=(8,),
        resolution=16,
    )
    x = rng.normal(size=(1, 16, 16, 1)).astype(np.float32)
    vq0 = vq_init(jax.random.key(1), 8, 32)
    vars_j = jvq.init(jax.random.key(0), jnp.asarray(x), vq0, train=False)
    sd = te.export_vqgan(vars_j, vq0, jvq)

    tvq = vqgan_mod.VQGAN(
        in_channels=1, mid_channels=32, out_channels=1, emb_dim=32,
        dict_size=8, enc_ch_multiplier=[1, 2], dec_ch_multiplier=[1, 2],
        num_res_blocks=1, enc_attn_resolutions=[8], dec_attn_resolutions=[8],
        resolution=16, p_dropout=0.0, resamp_with_conv=True,
        knn_backend="torch",
    )
    _strict_load(torch, tvq, sd).eval()

    recon_j, commit_j, ids_j, _, _ = jvq.apply(
        vars_j, jnp.asarray(x), vq0, train=False
    )
    with torch.no_grad():
        recon_t, commit_t, ids_t, _ = tvq(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(recon_j), recon_t.numpy().transpose(0, 2, 3, 1),
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(float(commit_j), float(commit_t), rtol=1e-3)


@pytest.mark.slow
def test_export_ckpt_cli_end_to_end(ref, rng, tmp_path):
    """Full hand-back path: our Orbax checkpoint → `export-ckpt` CLI →
    reference modules strict-load it → decode parity — and the `.ckpt`
    round-trips through `torch_import` to identical arrays."""
    import json

    torch = ref["torch"]
    from test_end_to_end import _config

    cfg = _config(tmp_path, tmp_path / "data")
    cfg_path = tmp_path / "config.json"
    cfg_path.write_text(json.dumps(cfg))

    from medical_image_editing_tpu.train.trainer import Trainer
    from medical_image_editing_tpu.utils.checkpoint import CheckpointManager
    from medical_image_editing_tpu.utils.config import to_config

    trainer = Trainer(to_config(cfg), logger=None)
    state = trainer.init_state(32)
    ckpt_dir = str(tmp_path / "ckpt")
    CheckpointManager(ckpt_dir).save(state, epoch=0)

    from medical_image_editing_tpu.cli.export_ckpt import main

    out = str(tmp_path / "handback.ckpt")
    rc = main(["-c", str(cfg_path), "--ckpt", ckpt_dir, "--out", out])
    assert rc == 0

    blob = torch.load(out, map_location="cpu", weights_only=False)
    sd = blob["state_dict"]
    by_prefix = {}
    for k, v in sd.items():
        name, rest = k.split(".", 1)
        by_prefix.setdefault(name, {})[rest] = v.numpy()

    # the reference's own modules accept it strictly
    tenc = ref["enc"].UNetEncoder(
        in_channels=1, filters=FILTERS, dict_size=5, use_styled_up_block=False,
        init_embed=True, knn_backend="torch",
    )
    _strict_load(torch, tenc, by_prefix["encoder"]).eval()
    tdec = ref["dec"].UNetDecoder(
        in_channels=FILTERS[0], out_channels=1, filters=FILTERS,
        use_dropblock=False, dropped_skip_layers=[], use_styled_up_block=True,
        use_pixel_shuffle=False,
    )
    _strict_load(torch, tdec, by_prefix["decoder"]).eval()
    disc_mod = ph.import_ref_module("discriminator")
    tdis = disc_mod.NLayerDiscriminator(
        in_channels=1, out_channels=1, n_filters=8, n_layers=2,
        normalization="instancenorm",
    )
    _strict_load(torch, tdis, by_prefix["discriminator"]).eval()

    # decode parity: ids → codebook → decoder, torch vs here
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

    # round trip: the exported ckpt re-imports to the same arrays
    rsd = ti.load_reference_state_dict(out)
    vq_rt = ti.import_vq_state(rsd, "encoder.vq.")
    np.testing.assert_array_equal(np.asarray(vq_rt.embed),
                                  np.asarray(state.vq.embed))
    enc_rt = ti.import_unet_encoder(rsd, "encoder.",
                                    target_vars=state.enc_vars)
    chex_like = jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        enc_rt["params"], state.enc_vars["params"],
    )
    del chex_like
    assert int(blob["epoch"]) == int(state.epoch)
