"""FULL-network parity: our UNetEncoder/UNetDecoder vs the reference's own
torch modules with transplanted weights.

Transplant machinery lives in parity_helpers (shared with test_gan_parity);
outputs must match to f32 tolerance — this is the evidence base for
"bit-comparable reconstructions" (BASELINE.json).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import parity_helpers as ph
from parity_helpers import (
    REF_SRC,
    double_conv_params as _double_conv_params,
    res_block_params as _res_block_params,
    styled_up_params,
    up_block_params as _up_block_params,
    _b,
    _k,
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref_networks():
    torch = pytest.importorskip("torch")
    unet_encoder = ph.import_ref_module("unet_encoder")
    unet_decoder = ph.import_ref_module("unet_decoder")
    return unet_encoder, unet_decoder, torch


def _styled_up_params(tsu, use_pixel_shuffle):
    return styled_up_params(tsu, use_pixel_shuffle)


def test_unet_encoder_feature_extraction_parity(ref_networks, rng):
    unet_encoder, _, torch = ref_networks
    from medical_image_editing_tpu.models import UNetEncoder

    filters = [4, 8, 16, 32, 64]
    tenc = unet_encoder.UNetEncoder(
        in_channels=1, filters=filters, dict_size=5, use_styled_up_block=False,
        init_embed=True,
    ).eval()

    params = {}
    for i in range(4):
        params[f"ResBlock_{i}"] = _res_block_params(getattr(tenc, f"down_conv1_{i+1}"))
    params["DoubleConv_0"] = _double_conv_params(tenc.double_conv1)
    # creation order: UpBlock_0 is the deepest (up_conv1_4)
    for j, name in enumerate(["up_conv1_4", "up_conv1_3", "up_conv1_2", "up_conv1_1"]):
        params[f"UpBlock_{j}"] = _up_block_params(getattr(tenc, name))

    jenc = UNetEncoder(filters=tuple(filters))
    x = rng.normal(size=(2, 32, 32, 1)).astype(np.float32)
    out_j = np.asarray(jenc.apply({"params": params}, jnp.asarray(x), train=False))
    with torch.no_grad():
        out_t = tenc.feature_extraction(
            torch.from_numpy(x.transpose(0, 3, 1, 2))
        ).numpy()
    np.testing.assert_allclose(out_j, out_t.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("use_pixel_shuffle", [False, True])
def test_unet_decoder_full_parity(ref_networks, rng, use_pixel_shuffle):
    _, unet_decoder, torch = ref_networks
    from medical_image_editing_tpu.models import UNetDecoder

    filters = [4, 8, 16, 32, 64]
    tdec = unet_decoder.UNetDecoder(
        in_channels=4, out_channels=1, filters=filters,
        use_dropblock=False, dropped_skip_layers=[],
        use_styled_up_block=True, use_pixel_shuffle=use_pixel_shuffle,
    ).train()  # SPADE BatchNorm uses batch stats

    params = {}
    for i in range(4):
        params[f"ResBlock_{i}"] = _res_block_params(getattr(tdec, f"down_conv2_{i+1}"))
    params["DoubleConv_0"] = _double_conv_params(tdec.double_conv2)
    # up_convs creation order in the reference: up_conv2_4 (deepest) first —
    # same as our StyledResUpBlock_0..3
    for j, name in enumerate(["up_conv2_4", "up_conv2_3", "up_conv2_2", "up_conv2_1"]):
        params[f"StyledResUpBlock_{j}"] = _styled_up_params(
            getattr(tdec, name), use_pixel_shuffle
        )
    # head: ASPP (stages c0..c4) + DoubleConv, then 1×1
    aspp = {}
    for i, stage in enumerate(tdec.conv_last[0].stages.children()):
        aspp[f"Conv_{i}"] = {"kernel": _k(stage.conv.weight)}
    params["ASPP_0"] = aspp
    params["DoubleConv_1"] = _double_conv_params(tdec.conv_last[1])
    params["Conv_0"] = {"kernel": _k(tdec.conv1x1.weight), "bias": _b(tdec.conv1x1.bias)}

    jdec = UNetDecoder(
        out_channels=1, filters=tuple(filters), dropped_skip_layers=(),
        use_pixel_shuffle=use_pixel_shuffle,
    )
    x = rng.normal(size=(2, 32, 32, 4)).astype(np.float32)
    variables = jdec.init(
        {"params": jax.random.key(0), "dropblock": jax.random.key(1)},
        jnp.asarray(x), train=False,
    )
    out_j, _ = jdec.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), True, 0.0, mutable=["batch_stats"],
    )
    with torch.no_grad():
        out_t = tdec(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(
        np.asarray(out_j), out_t.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
    )


@pytest.mark.slow
def test_first_stage_full_step_loss_values(ref_networks, rng):
    """Full first-stage training-step composition pinned against the
    reference math (`single_window_trainer.py:68-159`) executed in torch with
    transplanted weights: dual-view encode with SEQUENTIAL VQ EMA (view 2
    sees view 1's updated codebook), warped-id one-hots ([:, 1:] background
    drop), EmbeddingLoss cross/dist/reg against the post-both-updates
    codebook, chained-BN dual decode, MSE + focal-frequency recon terms, and
    the weighted total. Augmentation is pinned to identity (p=0 modules list)
    so both frameworks see the same views — the warp machinery itself is
    covered by tests/test_warp_augment.py."""
    import optax

    unet_encoder, unet_decoder, torch = ref_networks
    from medical_image_editing_tpu.models import UNetDecoder
    from medical_image_editing_tpu.models.unet_encoder import EncoderWithVQ
    from medical_image_editing_tpu.train import create_train_state
    from medical_image_editing_tpu.train.first_stage import (
        FirstStageLossConfig,
        make_first_stage_step,
    )
    from medical_image_editing_tpu.utils import torch_import as ti

    B, S, K = 2, 32, 5
    FILTERS = [4, 8, 16, 32, 64]
    tenc = unet_encoder.UNetEncoder(
        in_channels=1, filters=FILTERS, dict_size=K, use_styled_up_block=False,
        init_embed=True, knn_backend="torch",
    ).train()
    tdec = unet_decoder.UNetDecoder(
        in_channels=FILTERS[0], out_channels=1, filters=FILTERS,
        use_dropblock=False, dropped_skip_layers=[], use_styled_up_block=True,
        use_pixel_shuffle=False,
    ).train()

    sd = {}
    for prefix, mod in (("encoder", tenc), ("decoder", tdec)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = np.array(v.detach().cpu().numpy(), copy=True)

    jenc = EncoderWithVQ(filters=tuple(FILTERS), dict_size=K, momentum=0.99)
    jdec = UNetDecoder(
        out_channels=1, filters=tuple(FILTERS), dropped_skip_layers=(),
        use_pixel_shuffle=False,
    )
    enc_vars = ti.import_unet_encoder(sd, "encoder.")
    vq0 = ti.import_vq_state(sd, "encoder.vq.")
    dec_skel = jdec.init(
        {"params": jax.random.key(0), "dropblock": jax.random.key(1)},
        jnp.zeros((B, S, S, FILTERS[0])), train=False,
    )
    dec_vars = {
        "params": ti.import_unet_decoder(sd, "decoder.")["params"],
        "batch_stats": dec_skel["batch_stats"],
    }

    image = rng.uniform(-1, 1, (B, S, S, 1)).astype(np.float32)

    loss_cfg = FirstStageLossConfig(
        w_commit=1.0, w_cross=0.5, w_dist=0.25, w_reg=0.125,
        w_recon=1.0, w_freq=0.5, margin=0.5,
    )
    tx = optax.sgd(0.0)  # values only; no parameter motion needed
    state = create_train_state(jax.random.key(7), enc_vars, dec_vars, vq0,
                               tx, tx)
    step = make_first_stage_step(
        jenc, jdec, tx, tx, loss_cfg=loss_cfg,
        aug_cfg={"modules": []}, dict_size=K,
    )
    new_state, metrics = jax.jit(step)(state, jnp.asarray(image), 0.0)
    metrics = {k: float(v) for k, v in metrics.items()}

    # --- reference math in torch (identity transforms) ----------------------
    embed_loss_mod = ph.import_ref_functions_module("embed_loss")
    onehot_mod = ph.import_ref_functions_module("onehot")
    import torch.nn.functional as F

    img_t = torch.from_numpy(image.transpose(0, 3, 1, 2))
    # replicate the step's denorm→(identity aug)→norm rounding exactly
    x_t = 2.0 * ((img_t + 1.0) / 2.0) - 1.0
    with torch.no_grad():
        e1, c1, ids1 = tenc(x_t, rank=0)
        e2, c2, ids2 = tenc(x_t, rank=0)  # sequential EMA: sees updated codebook
        l_commit = (c1 + c2).item()

        onehot = onehot_mod.OneHotEncoder(n_classes=K + 1)
        r1 = onehot(ids1.int())[:, 1:, ...]
        r2 = onehot(ids2.int())[:, 1:, ...]
        embed_loss = embed_loss_mod.EmbeddingLoss(
            dict_size=K, margin=0.5,
            use_distance_loss=True, use_regularization_loss=True,
        )
        l_cross, l_dist, l_reg = embed_loss(e1, r1, e2, r2,
                                            tenc.vq.get_codebook())

        rec1 = tdec(e1)
        rec2 = tdec(e2)  # BN running stats chained between the two decodes
        l_recon = (F.mse_loss(rec1, x_t) + F.mse_loss(rec2, x_t)).item()

    from medical_image_editing_tpu.ops.losses import focal_frequency_loss

    clear = np.asarray(x_t.numpy().transpose(0, 2, 3, 1))
    l_freq = float(
        focal_frequency_loss(jnp.asarray(rec1.numpy().transpose(0, 2, 3, 1)),
                             jnp.asarray(clear))
        + focal_frequency_loss(jnp.asarray(rec2.numpy().transpose(0, 2, 3, 1)),
                               jnp.asarray(clear))
    )

    tol = dict(rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(metrics["commit"], 1.0 * l_commit, **tol)
    np.testing.assert_allclose(metrics["cross"], 0.5 * float(l_cross), **tol)
    np.testing.assert_allclose(metrics["dist"], 0.25 * float(l_dist), **tol)
    np.testing.assert_allclose(metrics["reg"], 0.125 * float(l_reg), **tol)
    np.testing.assert_allclose(metrics["recon"], 1.0 * l_recon, **tol)
    np.testing.assert_allclose(metrics["freq"], 0.5 * l_freq, **tol)
    total = (
        1.0 * l_commit + 0.5 * float(l_cross) + 0.25 * float(l_dist)
        + 0.125 * float(l_reg) + 1.0 * l_recon + 0.5 * l_freq
    )
    np.testing.assert_allclose(metrics["total"], total, **tol)
    # VQ EMA advanced identically through BOTH sequential updates
    np.testing.assert_allclose(
        np.asarray(new_state.vq.embed), tenc.vq.embed.numpy(),
        rtol=1e-4, atol=1e-6,
    )
