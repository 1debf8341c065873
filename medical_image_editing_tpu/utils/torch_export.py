"""Export this framework's weights as a reference-compatible torch checkpoint.

The inverse of `torch_import`: turn flax variable trees + `VQState` back into
a PyTorch-Lightning-shaped `.ckpt` whose `state_dict` the reference's own
modules accept with `load_state_dict(strict=True)` (key spec:
`src/networks/unet_encoder.py:35-58`, `unet_decoder.py:49-107`, `blocks.py`,
`discriminator.py:54-82`, `unet_discriminator.py:449-507`, `vqgan.py`,
`vq/vq_module.py:154-157`). Use case: train on TPU here, hand the model back
to a collaborator running the reference on GPUs (or audit a model in torch
tooling). Architecture variants (pixel-shuffle ups, decoder head, NLayer norm
kind, spectral norm) are detected from the variable trees; only the BigGAN
U-Net discriminator needs its module (for the `D_unet_arch` blocklist
layout).

Round-trip fidelity is pinned by tests: export → reference
`load_state_dict(strict=True)` → forward parity, and export → `torch_import`
→ identical trees.
"""

from typing import Dict, Optional

import numpy as np

from ..ops.vq import VQState

__all__ = [
    "export_unet_encoder",
    "export_vq_state",
    "export_unet_decoder",
    "export_nlayer_discriminator",
    "export_unet_discriminator",
    "export_vqgan",
    "save_lightning_ckpt",
]


def _np(a) -> np.ndarray:
    return np.asarray(a, dtype=np.float32)


def _k(kernel) -> np.ndarray:
    """flax HWIO → torch OIHW."""
    return _np(kernel).transpose(3, 2, 0, 1)


def _conv(out: dict, p: str, cp: dict):
    out[f"{p}.weight"] = _k(cp["kernel"])
    if "bias" in cp:
        out[f"{p}.bias"] = _np(cp["bias"])


def _double_conv(out: dict, p: str, dc: dict):
    _conv(out, f"{p}.double_conv.0", dc["Conv_0"])
    _conv(out, f"{p}.double_conv.3", dc["Conv_1"])


def _res_block(out: dict, p: str, rb: dict):
    out[f"{p}.downsample.0.weight"] = _k(rb["Conv_0"]["kernel"])
    _double_conv(out, f"{p}.double_conv", rb["DoubleConv_0"])


def _bn_stats(out: dict, p: str, st: dict):
    out[f"{p}.running_mean"] = _np(st["mean"])
    out[f"{p}.running_var"] = _np(st["var"])
    out[f"{p}.num_batches_tracked"] = np.zeros((), np.int64)


def _styled_denorm(out: dict, p: str, sp: dict, st: dict):
    _conv(out, f"{p}.mlp_shared.0", sp["Conv_0"])
    _conv(out, f"{p}.mlp_gamma", sp["Conv_1"])
    _conv(out, f"{p}.mlp_beta", sp["Conv_2"])
    _bn_stats(out, f"{p}.param_free_norm", st["BatchNorm_0"])


def _styled_up(out: dict, p: str, sp: dict, st: dict):
    ps = "Conv_3" in sp  # PixelShuffle variant has the extra upsample conv
    if ps:
        _conv(out, f"{p}.up_sample.0", sp["Conv_0"])
        s_conv, conv1, conv2 = "Conv_1", "Conv_2", "Conv_3"
    else:
        s_conv, conv1, conv2 = "Conv_0", "Conv_1", "Conv_2"
    _conv(out, f"{p}.conv.0", sp[s_conv])
    _conv(out, f"{p}.conv1", sp[conv1])
    _conv(out, f"{p}.conv2", sp[conv2])
    for i, norm in enumerate(("norm1", "norm2")):
        _styled_denorm(out, f"{p}.{norm}", sp[f"StyledDenorm_{i}"],
                       st[f"StyledDenorm_{i}"])


# ---------------------------------------------------------------------------
# UNetEncoder / VQ / UNetDecoder
# ---------------------------------------------------------------------------


def export_vq_state(vq: VQState, prefix: str = "vq.") -> Dict[str, np.ndarray]:
    """`embed_avg` back to the reference's (C,K) layout (`vq_module.py:157`)."""
    return {
        f"{prefix}embed": _np(vq.embed),
        f"{prefix}cluster_size": _np(vq.cluster_size),
        f"{prefix}embed_avg": _np(vq.embed_avg).T.copy(),
    }


def export_unet_encoder(enc_vars: dict,
                        vq: Optional[VQState] = None) -> Dict[str, np.ndarray]:
    params = enc_vars["params"]
    stats = enc_vars.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}
    for i in range(4):
        _res_block(out, f"down_conv1_{i + 1}", params[f"ResBlock_{i}"])
    _double_conv(out, "double_conv1", params["DoubleConv_0"])
    for j, n in enumerate((4, 3, 2, 1)):
        if f"UpBlock_{j}" in params:
            _double_conv(out, f"up_conv1_{n}.double_conv",
                         params[f"UpBlock_{j}"]["DoubleConv_0"])
        else:
            _styled_up(out, f"up_conv1_{n}", params[f"StyledResUpBlock_{j}"],
                       stats[f"StyledResUpBlock_{j}"])
    if vq is not None:
        out.update(export_vq_state(vq))
    return out


def export_unet_decoder(dec_vars: dict) -> Dict[str, np.ndarray]:
    params = dec_vars["params"]
    stats = dec_vars.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}
    n_levels = sum(1 for k in params if k.startswith("ResBlock_"))
    for i in range(n_levels):
        _res_block(out, f"down_conv2_{i + 1}", params[f"ResBlock_{i}"])
    _double_conv(out, "double_conv2", params["DoubleConv_0"])
    for j in range(n_levels):
        n = n_levels - j
        _styled_up(out, f"up_conv2_{n}", params[f"StyledResUpBlock_{j}"],
                   stats[f"StyledResUpBlock_{j}"])
    if "ASPP_0" in params:  # residual ASPP head (`unet_decoder.py:101-105`)
        for r, cp in sorted(params["ASPP_0"].items()):
            idx = int(r.split("_")[1])
            out[f"conv_last.0.stages.c{idx}.conv.weight"] = _k(cp["kernel"])
        _double_conv(out, "conv_last.1", params["DoubleConv_1"])
        _conv(out, "conv1x1", params["Conv_0"])
    else:  # multi-scale PixelShuffle head (`:78-91`)
        for j in range(n_levels - 1):
            _conv(out, f"pixel_shuffle2_{n_levels - j}.0", params[f"Conv_{j}"])
        _conv(out, "conv_last", params[f"Conv_{n_levels - 1}"])
    return out


# ---------------------------------------------------------------------------
# discriminators
# ---------------------------------------------------------------------------


def _sn_v_from_u(kernel_oihw: np.ndarray, u: np.ndarray) -> np.ndarray:
    """torch.spectral_norm also stores v; it is recomputed from (W, u) at the
    start of every forward (`v = normalize(Wᵀu)`), so deriving it here keeps
    strict loading happy without changing any forward."""
    w = kernel_oihw.reshape(kernel_oihw.shape[0], -1)
    v = w.T @ u.reshape(-1)
    return (v / (np.linalg.norm(v) + 1e-12)).astype(np.float32)


def export_nlayer_discriminator(dis_vars: dict) -> Dict[str, np.ndarray]:
    """Inverse of `import_nlayer_discriminator`. The reference `main`
    Sequential layout (`discriminator.py:54-82`): conv j sits at index 0 for
    j=0 else 3j−1; norm k at index 3k+3."""
    params = dis_vars["params"]
    stats = dis_vars.get("batch_stats", {})
    actnorm = dis_vars.get("actnorm", {})
    out: Dict[str, np.ndarray] = {}

    convs = sorted(
        (int(k.split("_")[1]) for k in params if k.startswith("Conv_"))
    )
    for j in convs:
        cp = params[f"Conv_{j}"]
        idx = 0 if j == 0 else 3 * j - 1
        sn = f"SpectralNorm_{j}" in stats
        w = _k(cp["kernel"])
        if sn:
            u = _np(stats[f"SpectralNorm_{j}"][f"Conv_{j}/kernel/u"]).reshape(-1)
            out[f"main.{idx}.weight_orig"] = w
            out[f"main.{idx}.weight_u"] = u
            out[f"main.{idx}.weight_v"] = _sn_v_from_u(w, u)
        else:
            out[f"main.{idx}.weight"] = w
        if "bias" in cp:
            out[f"main.{idx}.bias"] = _np(cp["bias"])

    norms = sorted(
        int(k.split("_")[1]) for k in params
        if k.startswith("BatchNorm_") or k.startswith("ActNorm_")
    )
    for k_ in norms:
        idx = 3 * k_ + 3
        if f"BatchNorm_{k_}" in params:
            out[f"main.{idx}.weight"] = _np(params[f"BatchNorm_{k_}"]["scale"])
            out[f"main.{idx}.bias"] = _np(params[f"BatchNorm_{k_}"]["bias"])
            _bn_stats(out, f"main.{idx}", stats[f"BatchNorm_{k_}"])
        else:
            # our ActNorm keeps the data-dependent init as a separate
            # 'actnorm'-collection correction (loc + data_loc,
            # scale * data_scale); torch stores the folded values
            an = actnorm.get(f"ActNorm_{k_}", {})
            loc = _np(params[f"ActNorm_{k_}"]["loc"])
            scale = _np(params[f"ActNorm_{k_}"]["scale"])
            if "data_loc" in an:
                loc = loc + _np(an["data_loc"])
                scale = scale * _np(an["data_scale"])
            c = loc.shape[0]
            out[f"main.{idx}.loc"] = loc.reshape(1, c, 1, 1)
            out[f"main.{idx}.scale"] = scale.reshape(1, c, 1, 1)
            init = bool(np.asarray(an.get("initialized", True)))
            out[f"main.{idx}.initialized"] = np.asarray(
                1 if init else 0, np.uint8
            )
    return out


def _export_sn_conv(out: dict, p: str, cp: dict, st: dict):
    """BigGAN SNConv2d buffers (`biggan/layers.py:55-109`): u0 (1,O), sv0 (1,)."""
    out[f"{p}.weight"] = _k(cp["Conv_0"]["kernel"])
    if "bias" in cp["Conv_0"]:
        out[f"{p}.bias"] = _np(cp["Conv_0"]["bias"])
    sn = st["SpectralNorm_0"]
    out[f"{p}.u0"] = _np(sn["Conv_0/kernel/u"]).reshape(1, -1)
    out[f"{p}.sv0"] = _np(sn["Conv_0/kernel/sigma"]).reshape(1)


def export_unet_discriminator(dis_vars: dict, module) -> Dict[str, np.ndarray]:
    """Inverse of `import_unet_discriminator`. `module` is our
    `UNetDiscriminator` (its resolution/D_ch/D_attn reproduce the reference's
    blocklist layout: one blocklist per arch index with the block at `.0` and
    attention at `.1`, final conv appended last —
    `unet_discriminator.py:449-489`)."""
    from ..models.unet_discriminator import d_unet_arch

    params = dis_vars["params"]
    stats = dis_vars["batch_stats"]
    arch = d_unet_arch(module.resolution, module.D_ch)
    attn_res = {int(r) for r in str(module.D_attn).split("_") if r.isdigit()}

    out: Dict[str, np.ndarray] = {}
    n_d = n_g = n_a = 0
    n_idx = len(arch["out_channels"])
    for index in range(n_idx):
        if arch["downsample"][index]:
            name = f"DBlock_{n_d}"
            n_d += 1
        else:
            name = f"GBlock2_{n_g}"
            n_g += 1
        bp, bst = params[name], stats[name]
        for part, sub in (("conv1", "SNConv_0"), ("conv2", "SNConv_1"),
                          ("conv_sc", "SNConv_2")):
            if sub in bp:
                _export_sn_conv(out, f"blocks.{index}.0.{part}", bp[sub],
                                bst[sub])
        if arch["resolution"][index] in attn_res and index < 5:
            ap, ast = params[f"Attention_{n_a}"], stats[f"Attention_{n_a}"]
            for t, part in enumerate(("theta", "phi", "g", "o")):
                _export_sn_conv(out, f"blocks.{index}.1.{part}",
                                ap[f"SNConv_{t}"], ast[f"SNConv_{t}"])
            # reference gamma is a 0-d tensor (`biggan/layers.py:158`)
            out[f"blocks.{index}.1.gamma"] = _np(ap["gamma"]).reshape(())
            n_a += 1

    _conv(out, f"blocks.{n_idx}", params["Conv_0"])
    dp = params["SNDense_0"]["Dense_0"]
    sn = stats["SNDense_0"]["SpectralNorm_0"]
    out["linear_middle.weight"] = _np(dp["kernel"]).T.copy()
    if "bias" in dp:
        out["linear_middle.bias"] = _np(dp["bias"])
    out["linear_middle.u0"] = _np(sn["Dense_0/kernel/u"]).reshape(1, -1)
    out["linear_middle.sv0"] = _np(sn["Dense_0/kernel/sigma"]).reshape(1)

    # `self.linear` exists in the reference but is never used by forward
    # (`unet_discriminator.py:493` vs `:544-630`) — synthesize placeholders so
    # strict loading succeeds
    in_f = int(arch["out_channels"][-1])
    out_dim = int(getattr(module, "output_dim", 1))
    out["linear.weight"] = np.zeros((out_dim, in_f), np.float32)
    out["linear.bias"] = np.zeros((out_dim,), np.float32)
    out["linear.u0"] = np.ones((1, out_dim), np.float32)
    out["linear.sv0"] = np.ones((1,), np.float32)

    if "SNEmbed_0" in params:
        # projection-conditional D (`unet_discriminator.py:499-501`)
        for ours, ref in (("SNEmbed_0", "embed_middle"), ("SNEmbed_1", "embed")):
            out[f"{ref}.weight"] = _np(params[ours]["embedding"])
            out[f"{ref}.u0"] = _np(stats[ours]["u"]).reshape(1, -1)
            out[f"{ref}.sv0"] = _np(stats[ours]["sigma"]).reshape(1)
    return out


# ---------------------------------------------------------------------------
# VQGAN
# ---------------------------------------------------------------------------


def _gn(out: dict, p: str, gp: dict):
    out[f"{p}.weight"] = _np(gp["scale"])
    out[f"{p}.bias"] = _np(gp["bias"])


def _vqgan_resnet(out: dict, p: str, rp: dict, shortcut_kind: str = "nin"):
    _gn(out, f"{p}.norm1", rp["GroupNorm_0"])
    _conv(out, f"{p}.conv1", rp["Conv_0"])
    _gn(out, f"{p}.norm2", rp["GroupNorm_1"])
    _conv(out, f"{p}.conv2", rp["Conv_1"])
    if "Conv_2" in rp:
        # the reference uses 1×1 `nin_shortcut` (`vqgan.py:92-99` default
        # conv_shortcut=False); a 3×3 kernel means conv_shortcut
        kh = np.asarray(rp["Conv_2"]["kernel"]).shape[0]
        name = "conv_shortcut" if kh == 3 else "nin_shortcut"
        _conv(out, f"{p}.{name}", rp["Conv_2"])


def _vqgan_attn(out: dict, p: str, ap: dict):
    _gn(out, f"{p}.norm", ap["GroupNorm_0"])
    _conv(out, f"{p}.q", ap["Conv_0"])
    _conv(out, f"{p}.k", ap["Conv_1"])
    _conv(out, f"{p}.v", ap["Conv_2"])
    _conv(out, f"{p}.proj_out", ap["Conv_3"])


def export_vqgan(vqgan_vars: dict, vq: VQState, module) -> Dict[str, np.ndarray]:
    """Inverse of `import_vqgan`. `module` is our `VQGAN` (its ch_multiplier /
    num_res_blocks / attn_resolutions / resolution reproduce the taming
    per-level key layout, `vqgan.py:183-380`)."""
    enc = vqgan_vars["params"]["encoder"]
    dec = vqgan_vars["params"]["decoder"]
    out: Dict[str, np.ndarray] = {}

    # encoder: conv_in, levels (blocks + attn + downsample), mid, norm_out
    _conv(out, "encoder.conv_in", enc["Conv_0"])
    n_rb = n_at = n_ds = 0
    n_levels = len(module.enc_ch_multiplier)
    res = int(module.resolution)
    for lv in range(n_levels):
        for b in range(int(module.num_res_blocks)):
            _vqgan_resnet(out, f"encoder.down.{lv}.block.{b}",
                          enc[f"ResnetBlock_{n_rb}"])
            n_rb += 1
            if res in tuple(module.enc_attn_resolutions):
                _vqgan_attn(out, f"encoder.down.{lv}.attn.{b}",
                            enc[f"AttnBlock_{n_at}"])
                n_at += 1
        if lv != n_levels - 1:
            _conv(out, f"encoder.down.{lv}.downsample.conv",
                  enc[f"Downsample_{n_ds}"]["Conv_0"])
            n_ds += 1
            res //= 2
    _vqgan_resnet(out, "encoder.mid.block_1", enc[f"ResnetBlock_{n_rb}"])
    _vqgan_attn(out, "encoder.mid.attn_1", enc[f"AttnBlock_{n_at}"])
    _vqgan_resnet(out, "encoder.mid.block_2", enc[f"ResnetBlock_{n_rb + 1}"])
    _gn(out, "encoder.norm_out", enc["GroupNorm_0"])
    _conv(out, "encoder.conv_out", enc["Conv_1"])

    # decoder: conv_in, mid, levels walked in reverse (`vqgan.py:345`)
    _conv(out, "decoder.conv_in", dec["Conv_0"])
    _vqgan_resnet(out, "decoder.mid.block_1", dec["ResnetBlock_0"])
    _vqgan_attn(out, "decoder.mid.attn_1", dec["AttnBlock_0"])
    _vqgan_resnet(out, "decoder.mid.block_2", dec["ResnetBlock_1"])
    n_rb, n_at, n_us = 2, 1, 0
    n_levels = len(module.dec_ch_multiplier)
    res = int(module.resolution) // (2 ** (n_levels - 1))
    # NOTE: unlike taming, the reference decoder uses num_res_blocks per
    # level, not num_res_blocks+1 (`vqgan.py:333`)
    for lv in reversed(range(n_levels)):
        for b in range(int(module.num_res_blocks)):
            _vqgan_resnet(out, f"decoder.up.{lv}.block.{b}",
                          dec[f"ResnetBlock_{n_rb}"])
            n_rb += 1
            if res in tuple(module.dec_attn_resolutions):
                _vqgan_attn(out, f"decoder.up.{lv}.attn.{b}",
                            dec[f"AttnBlock_{n_at}"])
                n_at += 1
        if lv != 0:
            _conv(out, f"decoder.up.{lv}.upsample.conv",
                  dec[f"Upsample_{n_us}"]["Conv_0"])
            n_us += 1
            res *= 2
    _gn(out, "decoder.norm_out", dec["GroupNorm_0"])
    _conv(out, "decoder.conv_out", dec["Conv_1"])

    out.update(export_vq_state(vq))
    return out


# ---------------------------------------------------------------------------
# checkpoint assembly
# ---------------------------------------------------------------------------


def save_lightning_ckpt(path: str, named: Dict[str, Dict[str, np.ndarray]],
                        epoch: int = 0, step: int = 0) -> str:
    """Write `{'state_dict': {'<name>.<key>': tensor}, 'epoch', 'global_step'}`
    — the shape the reference's own checkpoint consumers expect
    (`run_recon.py:99-111` inference surgery, `base.py:85-114` staged loads).
    NOT a full PyTorch-Lightning training checkpoint: Trainer
    `resume_from_checkpoint` would also need `optimizer_states` etc., which do
    not exist here — a reference-side fine-tune starts fresh optimizers via
    the staged-load paths."""
    import torch

    sd = {}
    for name, entries in named.items():
        for k, v in entries.items():
            sd[f"{name}.{k}"] = torch.from_numpy(np.ascontiguousarray(v))
    torch.save({"state_dict": sd, "epoch": int(epoch),
                "global_step": int(step)}, path)
    return path
