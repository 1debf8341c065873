"""Shared weight-transplant machinery for torch-oracle parity tests.

The reference package is imported read-only with stub modules for its missing
deps (utils / kmeans_pytorch — SURVEY.md notes its requirements drift); a fake
'networks' package skips its __init__ (which pulls kornia). Weight transplants
are mechanical OIHW→HWIO (+ spectral-norm u-vector copies); nothing from the
reference is reused as implementation.
"""

import importlib
import os
import sys
import types

import jax.numpy as jnp

REF_SRC = "/root/reference/src"


def import_ref_module(name: str):
    """Import `networks.<name>` from the reference with dep stubs in place."""
    utils_stub = sys.modules.get("utils")
    if utils_stub is None or not hasattr(utils_stub, "get_world_size"):
        utils_stub = types.ModuleType("utils")
        sys.modules["utils"] = utils_stub
    utils_stub.get_world_size = lambda: 1
    utils_stub.is_distributed = lambda: False
    km_stub = types.ModuleType("kmeans_pytorch")
    km_stub.kmeans = None
    sys.modules.setdefault("kmeans_pytorch", km_stub)
    if "networks" not in sys.modules:
        pkg = types.ModuleType("networks")
        pkg.__path__ = [os.path.join(REF_SRC, "networks")]
        sys.modules["networks"] = pkg
    return importlib.import_module(f"networks.{name}")


def _np(t):
    """torch tensor → OWNING numpy copy. `.detach().numpy()` is a view of the
    torch storage, and this environment's CPU jax backend zero-copy-aliases
    numpy inputs in `jnp.asarray` — a later in-place torch update (e.g. the
    spectral-norm u buffers during a forward) would silently mutate the
    transplanted jax array."""
    import numpy as np

    return np.array(t.detach().numpy(), copy=True)


def _k(w):  # OIHW → HWIO
    return jnp.asarray(_np(w).transpose(2, 3, 1, 0))


def _b(b):
    return jnp.asarray(_np(b))


def _lin(w):  # torch Linear (out,in) → flax Dense (in,out)
    return jnp.asarray(_np(w).T)


def double_conv_params(tdc):
    import torch

    convs = [m for m in tdc.double_conv if isinstance(m, torch.nn.Conv2d)]
    return {
        "Conv_0": {"kernel": _k(convs[0].weight), "bias": _b(convs[0].bias)},
        "Conv_1": {"kernel": _k(convs[1].weight), "bias": _b(convs[1].bias)},
    }


def res_block_params(trb):
    return {
        "Conv_0": {"kernel": _k(trb.downsample[0].weight)},
        "DoubleConv_0": double_conv_params(trb.double_conv),
    }


def up_block_params(tub):
    return {"DoubleConv_0": double_conv_params(tub.double_conv)}


def styled_denorm_params(tsd):
    return {
        "Conv_0": {"kernel": _k(tsd.mlp_shared[0].weight), "bias": _b(tsd.mlp_shared[0].bias)},
        "Conv_1": {"kernel": _k(tsd.mlp_gamma.weight), "bias": _b(tsd.mlp_gamma.bias)},
        "Conv_2": {"kernel": _k(tsd.mlp_beta.weight), "bias": _b(tsd.mlp_beta.bias)},
    }


def styled_up_params(tsu, use_pixel_shuffle):
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
    p["StyledDenorm_0"] = styled_denorm_params(tsu.norm1)
    p["StyledDenorm_1"] = styled_denorm_params(tsu.norm2)
    return p


def unet_encoder_params(tenc):
    """Transplant the reference UNetEncoder's feature-extraction weights."""
    params = {}
    for i in range(4):
        params[f"ResBlock_{i}"] = res_block_params(getattr(tenc, f"down_conv1_{i+1}"))
    params["DoubleConv_0"] = double_conv_params(tenc.double_conv1)
    for j, name in enumerate(["up_conv1_4", "up_conv1_3", "up_conv1_2", "up_conv1_1"]):
        params[f"UpBlock_{j}"] = up_block_params(getattr(tenc, name))
    return params


def unet_decoder_params(tdec, use_pixel_shuffle=False):
    """Transplant the reference UNetDecoder's weights."""
    params = {}
    for i in range(4):
        params[f"ResBlock_{i}"] = res_block_params(getattr(tdec, f"down_conv2_{i+1}"))
    params["DoubleConv_0"] = double_conv_params(tdec.double_conv2)
    for j, name in enumerate(["up_conv2_4", "up_conv2_3", "up_conv2_2", "up_conv2_1"]):
        params[f"StyledResUpBlock_{j}"] = styled_up_params(
            getattr(tdec, name), use_pixel_shuffle
        )
    aspp = {}
    for i, stage in enumerate(tdec.conv_last[0].stages.children()):
        aspp[f"Conv_{i}"] = {"kernel": _k(stage.conv.weight)}
    params["ASPP_0"] = aspp
    params["DoubleConv_1"] = double_conv_params(tdec.conv_last[1])
    params["Conv_0"] = {"kernel": _k(tdec.conv1x1.weight), "bias": _b(tdec.conv1x1.bias)}
    return params


# ---------------------------------------------------------------------------
# BigGAN / spectral-norm discriminators
# ---------------------------------------------------------------------------
#
# Spectral-norm u-vector mapping (proof): torch views the weight as
# W_t = (O, N) and stores u (1,O) [BigGAN SN, `biggan/layers.py:55-94`] /
# u (O,) [torch.nn.utils.spectral_norm]; flax SpectralNorm reshapes the HWIO
# kernel to W_f = (N', O) with u (1,O). W_f equals W_t^T with permuted rows, so
# v transforms consistently with that permutation inside each iteration while
# u and sigma are permutation-invariant: copying torch's u into flax's u makes
# every train-mode forward (1 power iteration + normalize) numerically
# identical.


def sn_conv_params(tconv):
    """Reference SNConv2d → our SNConv {params, batch_stats}."""
    p = {"Conv_0": {"kernel": _k(tconv.weight)}}
    if tconv.bias is not None:
        p["Conv_0"]["bias"] = _b(tconv.bias)
    bs = {
        "SpectralNorm_0": {
            "Conv_0/kernel/u": jnp.asarray(_np(tconv.u0)),
            "Conv_0/kernel/sigma": jnp.asarray(_np(tconv.sv0)[0]),
        }
    }
    return p, bs


def sn_dense_params(tlin):
    p = {"Dense_0": {"kernel": _lin(tlin.weight)}}
    if tlin.bias is not None:
        p["Dense_0"]["bias"] = _b(tlin.bias)
    bs = {
        "SpectralNorm_0": {
            "Dense_0/kernel/u": jnp.asarray(_np(tlin.u0)),
            "Dense_0/kernel/sigma": jnp.asarray(_np(tlin.sv0)[0]),
        }
    }
    return p, bs


def dblock_params(tdb):
    p, bs = {}, {}
    p["SNConv_0"], bs["SNConv_0"] = sn_conv_params(tdb.conv1)
    p["SNConv_1"], bs["SNConv_1"] = sn_conv_params(tdb.conv2)
    if tdb.learnable_sc:
        p["SNConv_2"], bs["SNConv_2"] = sn_conv_params(tdb.conv_sc)
    return p, bs


def gblock2_params(tgb):
    p, bs = {}, {}
    p["SNConv_0"], bs["SNConv_0"] = sn_conv_params(tgb.conv1)
    p["SNConv_1"], bs["SNConv_1"] = sn_conv_params(tgb.conv2)
    if tgb.learnable_sc:
        p["SNConv_2"], bs["SNConv_2"] = sn_conv_params(tgb.conv_sc)
    return p, bs


def attention_params(tattn):
    p, bs = {}, {}
    for i, name in enumerate(["theta", "phi", "g", "o"]):
        p[f"SNConv_{i}"], bs[f"SNConv_{i}"] = sn_conv_params(getattr(tattn, name))
    p["gamma"] = jnp.asarray(_np(tattn.gamma))
    return p, bs


def sn_embedding_params(temb):
    """Reference SNEmbedding → our SNEmbed {params, batch_stats}. The u buffer
    copies verbatim: both sides orient the power iteration over the
    (num_embeddings, dim) weight with u (1, num_embeddings) — see the SNEmbed
    docstring for why this is hand-rolled rather than flax SpectralNorm."""
    p = {"embedding": jnp.asarray(_np(temb.weight))}
    bs = {"u": jnp.asarray(_np(temb.u0)), "sigma": jnp.asarray(_np(temb.sv0)[0])}
    return p, bs


def ccbn_params(tc):
    """Reference ccbn (`biggan/layers.py:280-335`) → our CCBN, detecting the
    head flavor from the torch module types (Sequential = self-modulation MLP,
    SNLinear = conditional shared, Embedding = conditional unshared)."""
    import torch

    p, bs = {}, {}
    if isinstance(tc.gain, torch.nn.Sequential):
        p["Dense_0"] = {"kernel": _lin(tc.gain[0].weight), "bias": _b(tc.gain[0].bias)}
        p["Dense_1"] = {"kernel": _lin(tc.gain[2].weight)}
        p["Dense_2"] = {"kernel": _lin(tc.bias[0].weight), "bias": _b(tc.bias[0].bias)}
        p["Dense_3"] = {"kernel": _lin(tc.bias[2].weight)}
    elif isinstance(tc.gain, torch.nn.Embedding):
        p["Embed_0"] = {"embedding": jnp.asarray(_np(tc.gain.weight))}
        p["Embed_1"] = {"embedding": jnp.asarray(_np(tc.bias.weight))}
    else:  # SNLinear heads
        p["SNDense_0"], bs["SNDense_0"] = sn_dense_params(tc.gain)
        p["SNDense_1"], bs["SNDense_1"] = sn_dense_params(tc.bias)
    style = getattr(tc, "norm_style", "bn")
    if style == "bn":
        bs["BatchNorm_0"] = {"mean": _b(tc.stored_mean), "var": _b(tc.stored_var)}
    elif style == "in":
        bs["in_mean"] = _b(tc.stored_mean)
        bs["in_var"] = _b(tc.stored_var)
    return p, bs


def gblock_cond_params(tgb):
    """Reference GBlock (`biggan/layers.py:381-414`) → our GBlockCond."""
    p, bs = {}, {}
    p["CCBN_0"], bs["CCBN_0"] = ccbn_params(tgb.bn1)
    p["SNConv_0"], bs["SNConv_0"] = sn_conv_params(tgb.conv1)
    p["CCBN_1"], bs["CCBN_1"] = ccbn_params(tgb.bn2)
    p["SNConv_1"], bs["SNConv_1"] = sn_conv_params(tgb.conv2)
    if tgb.learnable_sc:
        p["SNConv_2"], bs["SNConv_2"] = sn_conv_params(tgb.conv_sc)
    return p, bs


def biggan_generator_params(tg):
    """Reference Generator (`unet_discriminator.py:109-330`) → our
    BigGANGenerator variables: shared embedding, first SNLinear, the
    GBlock/Attention stages in call order, and the bn→act→SNConv output layer."""
    import torch

    params, stats = {}, {}
    if isinstance(tg.shared, torch.nn.Embedding):
        params["shared_embed"] = {"embedding": jnp.asarray(_np(tg.shared.weight))}
    params["linear_in"], stats["linear_in"] = sn_dense_params(tg.linear)
    i = 0
    for blocklist in tg.blocks:
        for block in blocklist:
            name = f"stage_modules_{i}"
            cls = type(block).__name__
            if cls == "GBlock":
                params[name], stats[name] = gblock_cond_params(block)
            elif cls == "Attention":
                params[name], stats[name] = attention_params(block)
            else:  # pragma: no cover
                raise AssertionError(cls)
            i += 1
    tbn = tg.output_layer[0]
    params["out_bn"] = {"scale": _b(tbn.gain), "bias": _b(tbn.bias)}
    stats["out_bn"] = {"mean": _b(tbn.stored_mean), "var": _b(tbn.stored_var)}
    params["out_conv"], stats["out_conv"] = sn_conv_params(tg.output_layer[2])
    return {"params": params, "batch_stats": stats}


def unet_discriminator_params(tdis):
    """Reference Unet_Discriminator → our UNetDiscriminator variables.

    Walks `tdis.blocks` (spec: `unet_discriminator.py:449-489` construction,
    `:544-630` forward): DBlocks on the down path, GBlock2s on the up path,
    optional Attention attached to a down blocklist, plus `linear_middle`
    (bottleneck) and the final plain 1×1 conv.
    """
    import torch

    params, stats = {}, {}
    n_d = n_g = n_a = 0
    for blocklist in list(tdis.blocks)[:-1]:
        for block in blocklist:
            cls = type(block).__name__
            if cls == "DBlock":
                params[f"DBlock_{n_d}"], stats[f"DBlock_{n_d}"] = dblock_params(block)
                n_d += 1
            elif cls == "GBlock2":
                params[f"GBlock2_{n_g}"], stats[f"GBlock2_{n_g}"] = gblock2_params(block)
                n_g += 1
            elif cls == "Attention":
                params[f"Attention_{n_a}"], stats[f"Attention_{n_a}"] = attention_params(block)
                n_a += 1
            else:  # pragma: no cover
                raise AssertionError(cls)
    last = tdis.blocks[-1]
    assert isinstance(last, torch.nn.Conv2d)
    params["Conv_0"] = {"kernel": _k(last.weight), "bias": _b(last.bias)}
    params["SNDense_0"], stats["SNDense_0"] = sn_dense_params(tdis.linear_middle)
    if hasattr(tdis, "embed_middle"):
        # projection-conditional D (`unet_discriminator.py:499-501`); creation
        # order here: SNEmbed_0 at the bottleneck, SNEmbed_1 at the pixel map
        params["SNEmbed_0"], stats["SNEmbed_0"] = sn_embedding_params(tdis.embed_middle)
        params["SNEmbed_1"], stats["SNEmbed_1"] = sn_embedding_params(tdis.embed)
    return {"params": params, "batch_stats": stats}


def nlayer_discriminator_params(tdis, normalization: str, spectral: bool, train: bool):
    """Reference NLayerDiscriminator (+optional torch spectral_norm) → ours.

    Delegates to the framework's state_dict importer so there is exactly one
    implementation of this layout-sensitive conversion (the tests exercise the
    same code path users run via `import-ckpt`)."""
    import numpy as np

    from medical_image_editing_tpu.utils import torch_import as ti

    sd = {k: np.array(v.detach().cpu().numpy(), copy=True)
          for k, v in tdis.state_dict().items()}
    return ti.import_nlayer_discriminator(sd, prefix="")


# ---------------------------------------------------------------------------
# VQGAN (taming-style autoencoder) — spec `src/networks/vqgan.py`
# ---------------------------------------------------------------------------


def _conv(c):
    p = {"kernel": _k(c.weight)}
    if c.bias is not None:
        p["bias"] = _b(c.bias)
    return p


def _gn(g):
    return {"scale": _b(g.weight), "bias": _b(g.bias)}


def vqgan_resnet_block_params(trb):
    p = {
        "GroupNorm_0": _gn(trb.norm1),
        "Conv_0": _conv(trb.conv1),
        "GroupNorm_1": _gn(trb.norm2),
        "Conv_1": _conv(trb.conv2),
    }
    if hasattr(trb, "nin_shortcut"):
        p["Conv_2"] = _conv(trb.nin_shortcut)
    elif hasattr(trb, "conv_shortcut"):
        p["Conv_2"] = _conv(trb.conv_shortcut)
    return p


def vqgan_attn_block_params(tab):
    return {
        "GroupNorm_0": _gn(tab.norm),
        "Conv_0": _conv(tab.q),
        "Conv_1": _conv(tab.k),
        "Conv_2": _conv(tab.v),
        "Conv_3": _conv(tab.proj_out),
    }


def vqgan_encoder_params(tenc):
    """Reference taming Encoder → our VQGANEncoder params, replicating the
    call-order naming of the compact module (conv_in, per-level blocks/attn/
    downsample, mid, norm_out, conv_out — `vqgan.py:183-281`)."""
    p = {"Conv_0": _conv(tenc.conv_in)}
    n_rb = n_at = n_ds = 0
    n_levels = len(tenc.down)
    for i_level in range(n_levels):
        down = tenc.down[i_level]
        for i_block, blk in enumerate(down.block):
            p[f"ResnetBlock_{n_rb}"] = vqgan_resnet_block_params(blk)
            n_rb += 1
            if len(down.attn) > 0:
                p[f"AttnBlock_{n_at}"] = vqgan_attn_block_params(down.attn[i_block])
                n_at += 1
        if i_level != n_levels - 1:
            p[f"Downsample_{n_ds}"] = {"Conv_0": _conv(down.downsample.conv)}
            n_ds += 1
    p[f"ResnetBlock_{n_rb}"] = vqgan_resnet_block_params(tenc.mid.block_1)
    p[f"AttnBlock_{n_at}"] = vqgan_attn_block_params(tenc.mid.attn_1)
    p[f"ResnetBlock_{n_rb + 1}"] = vqgan_resnet_block_params(tenc.mid.block_2)
    p["GroupNorm_0"] = _gn(tenc.norm_out)
    p["Conv_1"] = _conv(tenc.conv_out)
    return p


def vqgan_decoder_params(tdec):
    """Reference taming Decoder → our VQGANDecoder params (`vqgan.py:284-380`)."""
    p = {"Conv_0": _conv(tdec.conv_in)}
    p["ResnetBlock_0"] = vqgan_resnet_block_params(tdec.mid.block_1)
    p["AttnBlock_0"] = vqgan_attn_block_params(tdec.mid.attn_1)
    p["ResnetBlock_1"] = vqgan_resnet_block_params(tdec.mid.block_2)
    n_rb, n_at, n_us = 2, 1, 0
    n_levels = len(tdec.up)
    for i_level in reversed(range(n_levels)):
        up = tdec.up[i_level]
        for i_block, blk in enumerate(up.block):
            p[f"ResnetBlock_{n_rb}"] = vqgan_resnet_block_params(blk)
            n_rb += 1
            if len(up.attn) > 0:
                p[f"AttnBlock_{n_at}"] = vqgan_attn_block_params(up.attn[i_block])
                n_at += 1
        if i_level != 0:
            p[f"Upsample_{n_us}"] = {"Conv_0": _conv(up.upsample.conv)}
            n_us += 1
    p["GroupNorm_0"] = _gn(tdec.norm_out)
    p["Conv_1"] = _conv(tdec.conv_out)
    return p


def set_torch_vq_buffers(tvq, vq_state):
    """Copy our VQState into a reference VQModule's buffers
    (`vq_module.py:154-157`; embed_avg is stored (C,K) there, (K,C) here)."""
    import numpy as np
    import torch

    tvq.embed.copy_(torch.from_numpy(np.asarray(vq_state.embed)))
    tvq.cluster_size.copy_(torch.from_numpy(np.asarray(vq_state.cluster_size)))
    tvq.embed_avg.copy_(torch.from_numpy(np.asarray(vq_state.embed_avg).T))


def import_ref_functions_module(name: str):
    """Import `functions.<name>` from the reference, skipping the package
    __init__ (which imports the missing `lpips` dependency)."""
    if "functions" not in sys.modules:
        pkg = types.ModuleType("functions")
        pkg.__path__ = [os.path.join(REF_SRC, "functions")]
        sys.modules["functions"] = pkg
    return importlib.import_module(f"functions.{name}")
