"""FULL-network parity: our UNetEncoder/UNetDecoder vs the reference's own
torch modules with transplanted weights.

The reference package is imported read-only with stub modules for its missing
deps (utils/kmeans_pytorch — SURVEY.md notes its requirements drift); a fake
'networks' package skips its __init__ (which pulls kornia). Weight transplant
is mechanical OIHW→HWIO; outputs must match to f32 tolerance — this is the
evidence base for "bit-comparable reconstructions" (BASELINE.json).
"""

import importlib
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason="reference checkout not available"
)


@pytest.fixture(scope="module")
def ref_networks():
    torch = pytest.importorskip("torch")
    # stub the reference's unimportable deps
    utils_stub = types.ModuleType("utils")
    utils_stub.get_world_size = lambda: 1
    utils_stub.is_distributed = lambda: False
    sys.modules.setdefault("utils", utils_stub)
    km_stub = types.ModuleType("kmeans_pytorch")
    km_stub.kmeans = None
    sys.modules.setdefault("kmeans_pytorch", km_stub)
    # fake package so `networks.<sub>` imports skip networks/__init__ (kornia)
    pkg = types.ModuleType("networks")
    pkg.__path__ = [os.path.join(REF_SRC, "networks")]
    sys.modules["networks"] = pkg
    unet_encoder = importlib.import_module("networks.unet_encoder")
    unet_decoder = importlib.import_module("networks.unet_decoder")
    return unet_encoder, unet_decoder, torch


def _k(w):  # OIHW → HWIO
    return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))


def _b(b):
    return jnp.asarray(b.detach().numpy())


def _double_conv_params(tdc):
    import torch

    convs = [m for m in tdc.double_conv if isinstance(m, torch.nn.Conv2d)]
    return {
        "Conv_0": {"kernel": _k(convs[0].weight), "bias": _b(convs[0].bias)},
        "Conv_1": {"kernel": _k(convs[1].weight), "bias": _b(convs[1].bias)},
    }


def _res_block_params(trb):
    return {
        "Conv_0": {"kernel": _k(trb.downsample[0].weight)},
        "DoubleConv_0": _double_conv_params(trb.double_conv),
    }


def _up_block_params(tub):
    return {"DoubleConv_0": _double_conv_params(tub.double_conv)}


def _styled_denorm_params(tsd):
    return {
        "Conv_0": {"kernel": _k(tsd.mlp_shared[0].weight), "bias": _b(tsd.mlp_shared[0].bias)},
        "Conv_1": {"kernel": _k(tsd.mlp_gamma.weight), "bias": _b(tsd.mlp_gamma.bias)},
        "Conv_2": {"kernel": _k(tsd.mlp_beta.weight), "bias": _b(tsd.mlp_beta.bias)},
    }


def _styled_up_params(tsu, use_pixel_shuffle):
    p = {}
    if use_pixel_shuffle:
        p["Conv_0"] = {"kernel": _k(tsu.up_sample[0].weight), "bias": _b(tsu.up_sample[0].bias)}
        s_conv_key = "Conv_1"
        conv1_key, conv2_key = "Conv_2", "Conv_3"
    else:
        s_conv_key = "Conv_0"
        conv1_key, conv2_key = "Conv_1", "Conv_2"
    p[s_conv_key] = {"kernel": _k(tsu.conv[0].weight), "bias": _b(tsu.conv[0].bias)}
    p[conv1_key] = {"kernel": _k(tsu.conv1.weight), "bias": _b(tsu.conv1.bias)}
    p[conv2_key] = {"kernel": _k(tsu.conv2.weight), "bias": _b(tsu.conv2.bias)}
    p["StyledDenorm_0"] = _styled_denorm_params(tsu.norm1)
    p["StyledDenorm_1"] = _styled_denorm_params(tsu.norm2)
    return p


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
