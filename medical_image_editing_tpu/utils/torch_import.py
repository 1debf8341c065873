"""Import reference PyTorch/Lightning checkpoints into this framework.

The reference trains with PyTorch Lightning and saves `.ckpt` files whose
`state_dict` carries `encoder.*` / `decoder.*` / `discriminator.*` key
prefixes (`run_recon.py:99-111`, `trainers/base.py:85-114`). This module
converts such a state_dict — layer by layer, with the OIHW→HWIO / Linear
transposes — into this framework's flax variable trees and `VQState`, so a
user of the reference can bring their *trained models* across, not just the
code surface.

Key-space specs (all reference `src/networks/`):
  * `UNetEncoder` — `unet_encoder.py:35-58` (down_conv1_*, double_conv1,
    up_conv1_*, vq.{embed,cluster_size,embed_avg}).
  * `UNetDecoder` — `unet_decoder.py:49-107` (down_conv2_*, double_conv2,
    up_conv2_*, conv_last, conv1x1, pixel_shuffle2_*).
  * blocks — `blocks.py` (DoubleConv `double_conv.{0,3}`, ResBlock
    `downsample.0`, StyledResUpBlock `up_sample.0/conv.0/conv1/conv2/norm{1,2}`,
    StyledDenorm `mlp_shared.0/mlp_gamma/mlp_beta/param_free_norm`).
  * `NLayerDiscriminator` — `discriminator.py:54-82` (`main.{i}`, optional
    torch spectral_norm `weight_orig`/`weight_u`).
  * `Unet_Discriminator` — `unet_discriminator.py:449-489,544-630`
    (`blocks.{i}.{j}` DBlock/GBlock2/Attention with BigGAN spectral-norm
    buffers `u0`/`sv0`, `linear_middle`, final plain conv).
  * `VQGAN` — `vqgan.py:183-380,402-433` (taming-style `encoder.*` /
    `decoder.*` submodules + `vq.*`).

Every import is strict: all reference keys under the prefix must be consumed
(except `num_batches_tracked` bookkeeping) and, when a target variable tree is
given, the built tree must match it leaf-for-leaf in structure and shape.
"""

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.vq import VQState

__all__ = [
    "load_reference_ckpt",
    "load_reference_state_dict",
    "read_ckpt_meta",
    "is_lightning_ckpt",
    "import_unet_encoder",
    "import_vq_state",
    "import_unet_decoder",
    "import_nlayer_discriminator",
    "import_unet_discriminator",
    "import_vqgan",
    "import_first_stage_fields",
    "import_discriminator_fields",
]


# ---------------------------------------------------------------------------
# loading
# ---------------------------------------------------------------------------


def _load_raw(path: str):
    import torch

    try:
        return torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # Lightning ckpts pickle non-tensor metadata (hparams, loops)
        return torch.load(path, map_location="cpu", weights_only=False)


def load_reference_ckpt(path: str):
    """One-pass load of a reference checkpoint.

    Returns `(state_dict, meta)` where state_dict is a flat
    {key: float32 numpy} dict and meta is {'epoch', 'step'} (zeros for a bare
    `torch.save`d state_dict). Accepts a Lightning `.ckpt` (keys nested under
    'state_dict', `run_recon.py:99-100`) or a bare state_dict. Floating
    tensors are cast to float32 so half-precision exports import into the f32
    parameter trees instead of silently changing training/serving dtypes.
    """
    obj = _load_raw(path)
    meta = {"epoch": 0, "step": 0}
    if isinstance(obj, dict):
        meta = {
            "epoch": int(obj.get("epoch", 0) or 0),
            "step": int(obj.get("global_step", 0) or 0),
        }
        if "state_dict" in obj:
            obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            a = np.array(v.detach().cpu().numpy(), copy=True)
            if np.issubdtype(a.dtype, np.floating):
                a = a.astype(np.float32, copy=False)
            out[str(k)] = a
    return out, meta


def load_reference_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a reference checkpoint into a flat {key: float32 numpy} dict."""
    return load_reference_ckpt(path)[0]


def is_lightning_ckpt(path: str) -> bool:
    """Heuristic that never misfires in practice: reference Lightning
    checkpoints are single `.ckpt` FILES; this framework's Orbax checkpoints
    are directories."""
    import os

    return os.path.isfile(path)


def import_first_stage_fields(path: str, target_state) -> dict:
    """TrainState field updates (`enc_vars`/`dec_vars`/`vq`) from a reference
    Lightning ckpt — the in-memory form of the staged first-stage load
    (`base.py:85-102`), used when `run.first_stage_ckpt_path` (or a serving
    checkpoint) points directly at a `.ckpt` file. Detects whether the
    decoder field holds a UNetDecoder or a whole VQGAN (`base.py:204-237`).
    """
    sd = load_reference_state_dict(path)
    if any(k.startswith("decoder.encoder.conv_in") for k in sd):
        dec_vars, vq = import_vqgan(sd, "decoder.",
                                    target_vars=target_state.dec_vars,
                                    target_vq=target_state.vq)
        return {"dec_vars": dec_vars, "vq": vq}
    out = {}
    if any(k.startswith("encoder.") for k in sd):
        out["enc_vars"] = import_unet_encoder(
            sd, "encoder.", target_vars=target_state.enc_vars
        )
        out["vq"] = import_vq_state(sd, "encoder.vq.", target=target_state.vq)
    if any(k.startswith("decoder.") for k in sd):
        out["dec_vars"] = import_unet_decoder(
            sd, "decoder.", target_vars=target_state.dec_vars
        )
    if not out:
        raise KeyError(
            f"{path}: no encoder./decoder. keys — not a reference checkpoint"
        )
    return out


def import_discriminator_fields(path: str, target_state, dis_type: str) -> dict:
    """`dis_vars` update from a reference Lightning ckpt — the in-memory form
    of the discriminator-only staged load (`base.py:104-114`)."""
    sd = load_reference_state_dict(path)
    if dis_type == "UNetDiscriminator":
        dis = import_unet_discriminator(sd, "discriminator.",
                                        target_vars=target_state.dis_vars)
    else:
        dis = import_nlayer_discriminator(sd, "discriminator.",
                                          target_vars=target_state.dis_vars)
    return {"dis_vars": dis}


def read_ckpt_meta(path: str) -> Dict[str, int]:
    """Training-progress metadata from a Lightning ckpt ({'epoch', 'step'};
    zeros for a bare state_dict). Prefer `load_reference_ckpt` when the
    weights are needed too — it reads the file once."""
    return load_reference_ckpt(path)[1]


class _SD:
    """State-dict view with a key prefix and consumption tracking."""

    def __init__(self, sd: Dict[str, np.ndarray], prefix: str = ""):
        self.sd = sd
        self.prefix = prefix
        self.used = set()

    def __contains__(self, key: str) -> bool:
        return self.prefix + key in self.sd

    def take(self, key: str) -> np.ndarray:
        full = self.prefix + key
        if full not in self.sd:
            raise KeyError(
                f"reference checkpoint is missing '{full}' — wrong prefix, "
                "or the config does not match the checkpointed architecture"
            )
        self.used.add(full)
        return self.sd[full]

    def keys_under_prefix(self):
        return [k for k in self.sd if k.startswith(self.prefix)]

    def assert_consumed(self, what: str):
        left = [
            k for k in self.keys_under_prefix()
            if k not in self.used and not k.endswith("num_batches_tracked")
        ]
        if left:
            raise ValueError(
                f"{what}: {len(left)} reference key(s) were not consumed "
                f"(architecture mismatch?): {sorted(left)[:8]}"
                + (" ..." if len(left) > 8 else "")
            )


# ---------------------------------------------------------------------------
# elementary converters
# ---------------------------------------------------------------------------


def _k(w: np.ndarray):
    """torch Conv2d OIHW → flax HWIO."""
    return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))


def _a(w: np.ndarray):
    return jnp.asarray(w)


def _conv(sd: _SD, p: str, bias: bool = True) -> dict:
    out = {"kernel": _k(sd.take(f"{p}.weight"))}
    if bias:
        out["bias"] = _a(sd.take(f"{p}.bias"))
    return out


def _double_conv(sd: _SD, p: str) -> dict:
    """DoubleConv: convs at Sequential indices 0 and 3 (`blocks.py:44-58`;
    InstanceNorm2d is affine-free, so it holds no weights)."""
    return {"Conv_0": _conv(sd, f"{p}.double_conv.0"),
            "Conv_1": _conv(sd, f"{p}.double_conv.3")}


def _res_block(sd: _SD, p: str) -> dict:
    """ResBlock: bias-free 1×1 identity conv + DoubleConv (`blocks.py:21-36`)."""
    return {
        "Conv_0": {"kernel": _k(sd.take(f"{p}.downsample.0.weight"))},
        "DoubleConv_0": _double_conv(sd, f"{p}.double_conv"),
    }


def _styled_denorm(sd: _SD, p: str) -> Tuple[dict, dict]:
    """StyledDenorm params + the param-free BatchNorm's running stats
    (`blocks.py:64-90`) — the stats matter for eval-mode (serving) parity."""
    params = {
        "Conv_0": _conv(sd, f"{p}.mlp_shared.0"),
        "Conv_1": _conv(sd, f"{p}.mlp_gamma"),
        "Conv_2": _conv(sd, f"{p}.mlp_beta"),
    }
    stats = {"BatchNorm_0": {
        "mean": _a(sd.take(f"{p}.param_free_norm.running_mean")),
        "var": _a(sd.take(f"{p}.param_free_norm.running_var")),
    }}
    return params, stats


def _styled_up(sd: _SD, p: str, use_pixel_shuffle: bool) -> Tuple[dict, dict]:
    """StyledResUpBlock (`blocks.py:93-134`). Flax call-order naming: with
    PixelShuffle the upsample conv is Conv_0 and everything shifts by one."""
    params, stats = {}, {}
    if use_pixel_shuffle:
        params["Conv_0"] = _conv(sd, f"{p}.up_sample.0")
        s_conv, conv1, conv2 = "Conv_1", "Conv_2", "Conv_3"
    else:
        s_conv, conv1, conv2 = "Conv_0", "Conv_1", "Conv_2"
    params[s_conv] = _conv(sd, f"{p}.conv.0")
    params[conv1] = _conv(sd, f"{p}.conv1")
    params[conv2] = _conv(sd, f"{p}.conv2")
    for i, norm in enumerate(("norm1", "norm2")):
        sp, st = _styled_denorm(sd, f"{p}.{norm}")
        params[f"StyledDenorm_{i}"] = sp
        stats[f"StyledDenorm_{i}"] = st
    return params, stats


# ---------------------------------------------------------------------------
# structural validation
# ---------------------------------------------------------------------------


def _check_tree(built, target, where: str):
    """Built variables must match the flax-initialized target leaf-for-leaf."""
    if target is None:
        return
    import jax

    bl = {jax.tree_util.keystr(k): v.shape
          for k, v in jax.tree_util.tree_leaves_with_path(built)}
    tl = {jax.tree_util.keystr(k): v.shape
          for k, v in jax.tree_util.tree_leaves_with_path(target)}
    missing = sorted(set(tl) - set(bl))
    extra = sorted(set(bl) - set(tl))
    if missing or extra:
        raise ValueError(
            f"{where}: imported tree does not match the model "
            f"(missing: {missing[:6]}, extra: {extra[:6]})"
        )
    bad = [f"{k}: ckpt{bl[k]} vs model{tl[k]}" for k in tl if bl[k] != tl[k]]
    if bad:
        raise ValueError(f"{where}: shape mismatches: {bad[:6]}")


# ---------------------------------------------------------------------------
# UNetEncoder / VQ / UNetDecoder
# ---------------------------------------------------------------------------


def import_vq_state(
    sd: Dict[str, np.ndarray],
    prefix: str = "encoder.vq.",
    target: Optional[VQState] = None,
) -> VQState:
    """VQ buffers (`vq_module.py:154-157`). The reference stores `embed_avg`
    as (C,K); our `VQState` keeps (K,C) — transposed on import. With `target`
    (the configured model's VQState) the buffer shapes are validated, so a
    dict_size/embedding-dim mismatch fails here instead of surfacing as wrong
    edits or a far-away Orbax restore error."""
    s = _SD(sd, prefix)
    state = VQState(
        embed=_a(s.take("embed")),
        cluster_size=_a(s.take("cluster_size")),
        embed_avg=_a(s.take("embed_avg").T),
    )
    s.assert_consumed("VQ")
    if target is not None:
        bad = [
            f"{name}: ckpt{tuple(got.shape)} vs model{tuple(want.shape)}"
            for name, got, want in (
                ("embed", state.embed, target.embed),
                ("cluster_size", state.cluster_size, target.cluster_size),
                ("embed_avg", state.embed_avg, target.embed_avg),
            )
            if tuple(got.shape) != tuple(want.shape)
        ]
        if bad:
            raise ValueError(
                "VQ: checkpoint codebook does not match the configured model "
                f"(dict_size/embedding mismatch?): {bad}"
            )
    return state


def import_unet_encoder(
    sd: Dict[str, np.ndarray],
    prefix: str = "encoder.",
    target_vars: Optional[dict] = None,
) -> dict:
    """Reference `UNetEncoder` feature-extraction weights → our flax variables
    (`unet_encoder.py:35-52`). Detects the styled-up-block variant from the
    key space. VQ buffers are imported separately via `import_vq_state`."""
    s = _SD(sd, prefix)
    params = {}
    for i in range(4):
        params[f"ResBlock_{i}"] = _res_block(s, f"down_conv1_{i + 1}")
    params["DoubleConv_0"] = _double_conv(s, "double_conv1")
    styled = "up_conv1_4.conv1.weight" in s
    stats = {}
    for j, n in enumerate((4, 3, 2, 1)):
        if styled:
            ps = f"up_conv1_{n}.up_sample.0.weight" in s
            p, st = _styled_up(s, f"up_conv1_{n}", use_pixel_shuffle=ps)
            params[f"StyledResUpBlock_{j}"] = p
            stats[f"StyledResUpBlock_{j}"] = st
        else:
            params[f"UpBlock_{j}"] = {
                "DoubleConv_0": _double_conv(s, f"up_conv1_{n}.double_conv")
            }
    # VQ buffers are consumed by import_vq_state
    for k in ("embed", "cluster_size", "embed_avg"):
        if f"vq.{k}" in s:
            s.used.add(prefix + f"vq.{k}")
    s.assert_consumed("UNetEncoder")
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    _check_tree(out, target_vars, "UNetEncoder")
    return out


def import_unet_decoder(
    sd: Dict[str, np.ndarray],
    prefix: str = "decoder.",
    target_vars: Optional[dict] = None,
) -> dict:
    """Reference `UNetDecoder` → our flax variables (`unet_decoder.py:49-107`).

    Handles both heads: the default residual-ASPP head (`:101-105`) and the
    multi-scale `use_last_pixel_shuffle` aggregation (`:66-86`); PixelShuffle
    vs nearest upsampling in the up blocks is detected from the key space.
    Includes the SPADE BatchNorm running stats (eval-mode/serving parity).
    """
    s = _SD(sd, prefix)
    n_levels = 0
    while f"down_conv2_{n_levels + 1}.downsample.0.weight" in s:
        n_levels += 1
    if n_levels == 0:
        raise KeyError(
            f"no '{prefix}down_conv2_1.*' keys — not a UNetDecoder checkpoint"
        )
    params, stats = {}, {}
    for i in range(n_levels):
        params[f"ResBlock_{i}"] = _res_block(s, f"down_conv2_{i + 1}")
    params["DoubleConv_0"] = _double_conv(s, "double_conv2")

    for j in range(n_levels):
        n = n_levels - j  # up_conv2_{n_levels} is applied first (`:69-76`)
        ps = f"up_conv2_{n}.up_sample.0.weight" in s
        p, st = _styled_up(s, f"up_conv2_{n}", use_pixel_shuffle=ps)
        params[f"StyledResUpBlock_{j}"] = p
        stats[f"StyledResUpBlock_{j}"] = st

    if "conv1x1.weight" in s:
        # residual ASPP head: conv_last = Sequential(ASPP, DoubleConv)
        aspp = {}
        r = 0
        while f"conv_last.0.stages.c{r}.conv.weight" in s:
            aspp[f"Conv_{r}"] = {
                "kernel": _k(s.take(f"conv_last.0.stages.c{r}.conv.weight"))
            }
            r += 1
        params["ASPP_0"] = aspp
        params["DoubleConv_1"] = _double_conv(s, "conv_last.1")
        params["Conv_0"] = _conv(s, "conv1x1")
    else:
        # multi-scale PixelShuffle head (`:78-91,126-147`): per-level 3×3
        # convs pixel_shuffle2_{n}, deepest first, then the final 1×1
        for j in range(n_levels - 1):
            n = n_levels - j
            params[f"Conv_{j}"] = _conv(s, f"pixel_shuffle2_{n}.0")
        params[f"Conv_{n_levels - 1}"] = _conv(s, "conv_last")

    s.assert_consumed("UNetDecoder")
    out = {"params": params, "batch_stats": stats}
    _check_tree(out, target_vars, "UNetDecoder")
    return out


# ---------------------------------------------------------------------------
# discriminators
# ---------------------------------------------------------------------------


def import_nlayer_discriminator(
    sd: Dict[str, np.ndarray],
    prefix: str = "discriminator.",
    target_vars: Optional[dict] = None,
) -> dict:
    """Reference `NLayerDiscriminator` (+ optional torch `spectral_norm`) →
    our flax variables (`discriminator.py:54-82`, `utils/__init__.py:54-64`).

    Layer kinds are classified from each `main.{i}` key group: `weight_orig`
    ⇒ spectral-norm conv, `running_mean` ⇒ BatchNorm, `loc` ⇒ ActNorm,
    4-D `weight` ⇒ plain conv. torch's spectral_norm stores u as (O,); flax
    SpectralNorm wants (1,O) plus a sigma scalar — derived here from the
    checkpoint's u/v/weight_orig exactly as torch's eval forward computes it
    (flax re-derives the divisor from u at every apply; the stored sigma is
    bookkeeping kept truthful for consistency with the BigGAN sv0 buffers).
    """
    s = _SD(sd, prefix)
    groups: Dict[int, set] = {}
    for k in s.keys_under_prefix():
        rest = k[len(prefix):]
        if not rest.startswith("main."):
            continue
        idx, _, leaf = rest[len("main."):].partition(".")
        groups.setdefault(int(idx), set()).add(leaf)

    params, stats, actnorm = {}, {}, {}
    n_conv = n_norm = 0
    for idx in sorted(groups):
        leaves = groups[idx]
        p = f"main.{idx}"
        if "weight_orig" in leaves:
            w = s.take(f"{p}.weight_orig")
            u = s.take(f"{p}.weight_u")
            cp = {"kernel": _k(w)}
            if "bias" in leaves:
                cp["bias"] = _a(s.take(f"{p}.bias"))
            params[f"Conv_{n_conv}"] = cp
            # Store torch's actual sigma = uᵀ·W_mat·v (stored u/v, exactly what
            # torch's eval forward divides by) instead of a 1.0 placeholder.
            # flax SpectralNorm recomputes sigma from u at every apply (the
            # stored scalar is bookkeeping, not the divisor), so this keeps the
            # checkpoint self-consistent with the BigGAN sv0 imports and
            # truthful for anything that reads the stats.
            w_mat = w.reshape(w.shape[0], -1)
            if "weight_v" in leaves:
                v = s.take(f"{p}.weight_v")
            else:
                wv = w_mat.T @ u
                v = wv / (np.linalg.norm(wv) + 1e-12)
            sigma = float(u @ (w_mat @ v))
            stats[f"SpectralNorm_{n_conv}"] = {
                f"Conv_{n_conv}/kernel/u": _a(u[None, :]),
                f"Conv_{n_conv}/kernel/sigma": jnp.asarray(sigma, jnp.float32),
            }
            n_conv += 1
        elif "running_mean" in leaves:
            params[f"BatchNorm_{n_norm}"] = {
                "scale": _a(s.take(f"{p}.weight")),
                "bias": _a(s.take(f"{p}.bias")),
            }
            stats[f"BatchNorm_{n_norm}"] = {
                "mean": _a(s.take(f"{p}.running_mean")),
                "var": _a(s.take(f"{p}.running_var")),
            }
            n_norm += 1
        elif "loc" in leaves:
            c = int(np.prod(s.sd[prefix + f"{p}.loc"].shape))
            params[f"ActNorm_{n_norm}"] = {
                "loc": _a(s.take(f"{p}.loc").reshape(c)),
                "scale": _a(s.take(f"{p}.scale").reshape(c)),
            }
            actnorm[f"ActNorm_{n_norm}"] = {
                "initialized": jnp.ones((), jnp.bool_),
                "data_loc": jnp.zeros((c,), jnp.float32),
                "data_scale": jnp.ones((c,), jnp.float32),
            }
            if "initialized" in leaves:
                s.used.add(prefix + f"{p}.initialized")
            n_norm += 1
        elif "weight" in leaves:
            params[f"Conv_{n_conv}"] = _conv(s, p, bias="bias" in leaves)
            n_conv += 1
        else:  # pragma: no cover
            raise ValueError(f"unrecognized layer at '{prefix}{p}': {leaves}")

    s.assert_consumed("NLayerDiscriminator")
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    if actnorm:
        out["actnorm"] = actnorm
    _check_tree(out, target_vars, "NLayerDiscriminator")
    return out


def _sn_conv(sd: _SD, p: str) -> Tuple[dict, dict]:
    """BigGAN SNConv2d (`biggan/layers.py:97-109`): weight/bias + power-
    iteration buffers u0 (1,O) and sv0 (1,)."""
    cp = {"Conv_0": {"kernel": _k(sd.take(f"{p}.weight"))}}
    if f"{p}.bias" in sd:
        cp["Conv_0"]["bias"] = _a(sd.take(f"{p}.bias"))
    st = {"SpectralNorm_0": {
        "Conv_0/kernel/u": _a(sd.take(f"{p}.u0")),
        "Conv_0/kernel/sigma": _a(sd.take(f"{p}.sv0")[0]),
    }}
    return cp, st


def import_unet_discriminator(
    sd: Dict[str, np.ndarray],
    prefix: str = "discriminator.",
    target_vars: Optional[dict] = None,
) -> dict:
    """Reference BigGAN `Unet_Discriminator` → our flax variables.

    The reference stores blocks as a ModuleList of blocklists walked in
    forward order (`unet_discriminator.py:449-489,544-630`): DBlocks on the
    down path, then GBlock2s up, with optional Attention inside a blocklist
    and a plain final conv as the last entry. DBlock and GBlock2 share a key
    shape (conv1/conv2[/conv_sc]), so the down/up split is taken from
    `target_vars` (how many DBlock_* the configured model has).
    """
    if target_vars is None:
        raise ValueError(
            "import_unet_discriminator needs target_vars (the flax-initialized "
            "UNetDiscriminator variables) to split DBlocks from GBlock2s"
        )
    s = _SD(sd, prefix)
    groups: Dict[Tuple[int, int], set] = {}
    final_idx = None
    for k in s.keys_under_prefix():
        rest = k[len(prefix):]
        if not rest.startswith("blocks."):
            continue
        parts = rest[len("blocks."):].split(".")
        if len(parts) == 2:  # blocks.{i}.weight — the final plain conv
            final_idx = int(parts[0])
            continue
        groups.setdefault((int(parts[0]), int(parts[1])), set()).add(
            ".".join(parts[2:])
        )
    if final_idx is None:
        raise KeyError(f"no final conv under '{prefix}blocks.*'")

    n_dblocks = sum(
        1 for name in target_vars["params"] if name.startswith("DBlock_")
    )
    params, stats = {}, {}
    n_d = n_g = n_a = 0
    for (i, j) in sorted(groups):
        leaves = groups[(i, j)]
        p = f"blocks.{i}.{j}"
        if "gamma" in leaves:  # SA-GAN Attention (`biggan/layers.py:147-172`)
            ap, ast = {}, {}
            for t, part in enumerate(("theta", "phi", "g", "o")):
                ap[f"SNConv_{t}"], ast[f"SNConv_{t}"] = _sn_conv(s, f"{p}.{part}")
            ap["gamma"] = _a(s.take(f"{p}.gamma"))
            params[f"Attention_{n_a}"], stats[f"Attention_{n_a}"] = ap, ast
            n_a += 1
            continue
        bp, bst = {}, {}
        bp["SNConv_0"], bst["SNConv_0"] = _sn_conv(s, f"{p}.conv1")
        bp["SNConv_1"], bst["SNConv_1"] = _sn_conv(s, f"{p}.conv2")
        if f"{p}.conv_sc.weight" in s:
            bp["SNConv_2"], bst["SNConv_2"] = _sn_conv(s, f"{p}.conv_sc")
        if n_d < n_dblocks:
            params[f"DBlock_{n_d}"], stats[f"DBlock_{n_d}"] = bp, bst
            n_d += 1
        else:
            params[f"GBlock2_{n_g}"], stats[f"GBlock2_{n_g}"] = bp, bst
            n_g += 1

    params["Conv_0"] = _conv(s, f"blocks.{final_idx}")
    dp = {"Dense_0": {"kernel": _a(s.take("linear_middle.weight").T)}}
    if "linear_middle.bias" in s:
        dp["Dense_0"]["bias"] = _a(s.take("linear_middle.bias"))
    params["SNDense_0"] = dp
    stats["SNDense_0"] = {"SpectralNorm_0": {
        "Dense_0/kernel/u": _a(s.take("linear_middle.u0")),
        "Dense_0/kernel/sigma": _a(s.take("linear_middle.sv0")[0]),
    }}

    # `self.linear` is constructed (`unet_discriminator.py:493`) but never
    # used by forward (`:544-630`) — dead weights; consume and discard
    for leaf in ("weight", "bias", "u0", "sv0"):
        if f"linear.{leaf}" in s:
            s.used.add(prefix + f"linear.{leaf}")

    if "embed_middle.weight" in s:
        # projection-conditional D (`unet_discriminator.py:499-501`): SNEmbed_0
        # is the bottleneck embedding, SNEmbed_1 the pixel-map one
        for ours, ref in (("SNEmbed_0", "embed_middle"), ("SNEmbed_1", "embed")):
            params[ours] = {"embedding": _a(s.take(f"{ref}.weight"))}
            stats[ours] = {
                "u": _a(s.take(f"{ref}.u0")),
                "sigma": _a(s.take(f"{ref}.sv0")[0]),
            }

    s.assert_consumed("UNetDiscriminator")
    out = {"params": params, "batch_stats": stats}
    _check_tree(out, target_vars, "UNetDiscriminator")
    return out


# ---------------------------------------------------------------------------
# VQGAN (taming-style autoencoder)
# ---------------------------------------------------------------------------


def _gn(sd: _SD, p: str) -> dict:
    return {"scale": _a(sd.take(f"{p}.weight")), "bias": _a(sd.take(f"{p}.bias"))}


def _vqgan_resnet(sd: _SD, p: str) -> dict:
    """taming ResnetBlock (`vqgan.py:61-122`); shortcut conv is `nin_shortcut`
    (1×1) or `conv_shortcut` (3×3) — either maps to our Conv_2."""
    out = {
        "GroupNorm_0": _gn(sd, f"{p}.norm1"),
        "Conv_0": _conv(sd, f"{p}.conv1"),
        "GroupNorm_1": _gn(sd, f"{p}.norm2"),
        "Conv_1": _conv(sd, f"{p}.conv2"),
    }
    for short in ("nin_shortcut", "conv_shortcut"):
        if f"{p}.{short}.weight" in sd:
            out["Conv_2"] = _conv(sd, f"{p}.{short}")
    return out


def _vqgan_attn(sd: _SD, p: str) -> dict:
    return {
        "GroupNorm_0": _gn(sd, f"{p}.norm"),
        "Conv_0": _conv(sd, f"{p}.q"),
        "Conv_1": _conv(sd, f"{p}.k"),
        "Conv_2": _conv(sd, f"{p}.v"),
        "Conv_3": _conv(sd, f"{p}.proj_out"),
    }


def _vqgan_levels(sd: _SD, kind: str) -> int:
    n = 0
    while f"{kind}.{n}.block.0.conv1.weight" in sd:
        n += 1
    return n


def import_vqgan(
    sd: Dict[str, np.ndarray],
    prefix: str = "decoder.",
    target_vars: Optional[dict] = None,
    target_vq: Optional[VQState] = None,
) -> Tuple[dict, VQState]:
    """Reference `VQGAN` (the trainer's `decoder` field holds the whole
    autoencoder, `base.py:204-222`) → (our flax variables, VQState).

    Mirrors the call-order naming of our compact modules: encoder conv_in,
    per-level blocks/attn/downsample, mid, norm_out, conv_out
    (`vqgan.py:183-281`), then the mirrored decoder (`:284-380`).
    """
    s = _SD(sd, prefix)
    if "encoder.conv_in.weight" not in s:
        raise KeyError(f"no '{prefix}encoder.conv_in.*' — not a VQGAN checkpoint")

    enc = {"Conv_0": _conv(s, "encoder.conv_in")}
    n_rb = n_at = n_ds = 0
    n_levels = _vqgan_levels(s, "encoder.down")
    for lv in range(n_levels):
        b = 0
        while f"encoder.down.{lv}.block.{b}.conv1.weight" in s:
            enc[f"ResnetBlock_{n_rb}"] = _vqgan_resnet(s, f"encoder.down.{lv}.block.{b}")
            n_rb += 1
            if f"encoder.down.{lv}.attn.{b}.norm.weight" in s:
                enc[f"AttnBlock_{n_at}"] = _vqgan_attn(s, f"encoder.down.{lv}.attn.{b}")
                n_at += 1
            b += 1
        if f"encoder.down.{lv}.downsample.conv.weight" in s:
            enc[f"Downsample_{n_ds}"] = {
                "Conv_0": _conv(s, f"encoder.down.{lv}.downsample.conv")
            }
            n_ds += 1
    enc[f"ResnetBlock_{n_rb}"] = _vqgan_resnet(s, "encoder.mid.block_1")
    enc[f"AttnBlock_{n_at}"] = _vqgan_attn(s, "encoder.mid.attn_1")
    enc[f"ResnetBlock_{n_rb + 1}"] = _vqgan_resnet(s, "encoder.mid.block_2")
    enc["GroupNorm_0"] = _gn(s, "encoder.norm_out")
    enc["Conv_1"] = _conv(s, "encoder.conv_out")

    dec = {"Conv_0": _conv(s, "decoder.conv_in")}
    dec["ResnetBlock_0"] = _vqgan_resnet(s, "decoder.mid.block_1")
    dec["AttnBlock_0"] = _vqgan_attn(s, "decoder.mid.attn_1")
    dec["ResnetBlock_1"] = _vqgan_resnet(s, "decoder.mid.block_2")
    n_rb, n_at, n_us = 2, 1, 0
    n_levels = _vqgan_levels(s, "decoder.up")
    for lv in reversed(range(n_levels)):  # taming walks up in reverse (`:345`)
        b = 0
        while f"decoder.up.{lv}.block.{b}.conv1.weight" in s:
            dec[f"ResnetBlock_{n_rb}"] = _vqgan_resnet(s, f"decoder.up.{lv}.block.{b}")
            n_rb += 1
            if f"decoder.up.{lv}.attn.{b}.norm.weight" in s:
                dec[f"AttnBlock_{n_at}"] = _vqgan_attn(s, f"decoder.up.{lv}.attn.{b}")
                n_at += 1
            b += 1
        if f"decoder.up.{lv}.upsample.conv.weight" in s:
            dec[f"Upsample_{n_us}"] = {
                "Conv_0": _conv(s, f"decoder.up.{lv}.upsample.conv")
            }
            n_us += 1
    dec["GroupNorm_0"] = _gn(s, "decoder.norm_out")
    dec["Conv_1"] = _conv(s, "decoder.conv_out")

    vq = import_vq_state(sd, prefix=f"{prefix}vq.", target=target_vq)
    for k in ("embed", "cluster_size", "embed_avg"):
        s.used.add(prefix + f"vq.{k}")
    s.assert_consumed("VQGAN")
    out = {"params": {"encoder": enc, "decoder": dec}}
    _check_tree(out, target_vars, "VQGAN")
    return out, vq
