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
