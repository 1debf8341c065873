"""Perceptual losses: VGG19 feature MSE and an LPIPS-style loss.

Behavioral spec: reference `src/functions/perceptual_loss.py` (VGGLoss — VGG19
features up to relu2_2 (`modules[:8]`, conv_index '22') or relu5_4
(`[:35]`, '54'), 1→3 channel expansion, MSE in feature space with the target
branch gradient-stopped) and `src/functions/lpips_loss.py` (lpips.LPIPS
net='alex', channel expansion, mean).

Weights: no pretrained torchvision/lpips weights exist in this environment
(zero egress; the reference itself has the same fragility — `lpips` is missing
from its requirements.txt, SURVEY.md §2.4). The VGG19/AlexNet feature stacks
are implemented in flax and load weights from `MEDIMG_VGG19_NPZ` /
`MEDIMG_LPIPS_NPZ` if provided; otherwise they fall back to a fixed
random-feature projection (seeded, frozen) with a one-time warning — random
convolutional features are a known-usable perceptual metric and keep the loss
differentiable and config-gated exactly like the reference
(`base.py:271-275`).

The npz format for MEDIMG_VGG19_NPZ: keys `features.{i}.weight` (OIHW) /
`features.{i}.bias` for each torchvision VGG19 conv index i — i.e.
`{k: v.numpy() for k, v in torchvision.models.vgg19(pretrained=True)
 .features.state_dict().items()}` saved with np.savez.
`tools/convert_perceptual_weights.py` produces both npz files on any
machine with internet access.
"""

import os
import warnings

import jax
import jax.numpy as jnp
import numpy as np

# torchvision VGG19 `features` layout as (torchvision_index, kind) with kind
# 'C' = conv(+relu at index+1), 'M' = maxpool. conv_index '22' slices [:8]
# (through relu2_2); '54' → [:35].
_VGG19_LAYOUT = [
    (0, "C"), (2, "C"), (4, "M"), (5, "C"), (7, "C"), (9, "M"),
    (10, "C"), (12, "C"), (14, "C"), (16, "C"), (18, "M"),
    (19, "C"), (21, "C"), (23, "C"), (25, "C"), (27, "M"),
    (28, "C"), (30, "C"), (32, "C"), (34, "C"),
]
_VGG19_CHANNELS = {
    0: 64, 2: 64, 5: 128, 7: 128, 10: 256, 12: 256, 14: 256, 16: 256,
    19: 512, 21: 512, 23: 512, 25: 512, 28: 512, 30: 512, 32: 512, 34: 512,
}

def _vgg_pretrained(stop_index: int) -> bool:
    path = os.environ.get("MEDIMG_VGG19_NPZ", "")
    return bool(path and os.path.exists(path))


def _load_vgg_params(stop_index: int) -> dict:
    """Conv kernels (HWIO) and biases for torchvision indices < stop_index."""
    path = os.environ.get("MEDIMG_VGG19_NPZ", "")
    params = {}
    if path and os.path.exists(path):
        raw = np.load(path)
        for i in _VGG19_CHANNELS:
            if i >= stop_index:
                break
            w = raw[f"features.{i}.weight"]  # OIHW
            b = raw[f"features.{i}.bias"]
            params[i] = (jnp.asarray(w.transpose(2, 3, 1, 0)), jnp.asarray(b))
        return params
    warnings.warn(
        "No pretrained VGG19 weights (set MEDIMG_VGG19_NPZ); using seeded "
        "random-feature VGG for the perceptual loss.",
        stacklevel=2,
    )
    key = jax.random.key(1234)
    in_ch = 3
    for i in _VGG19_CHANNELS:
        if i >= stop_index:
            break
        out_ch = _VGG19_CHANNELS[i]
        key, k = jax.random.split(key)
        w = jax.nn.initializers.he_normal()(k, (3, 3, in_ch, out_ch), jnp.float32)
        params[i] = (w, jnp.zeros((out_ch,), jnp.float32))
        in_ch = out_ch
    return params


def _vgg_features(params: dict, stop_index: int, x):
    """Run the VGG19 feature stack (NHWC, ImageNet-normalized input) through
    torchvision layer indices [0, stop_index)."""
    h = x
    for idx, kind in _VGG19_LAYOUT:
        if idx >= stop_index:
            break
        if kind == "M":
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
        else:
            w, b = params[idx]
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            ) + b
            # torchvision puts each ReLU at idx+1; the reference slices
            # `modules[:8]` / `modules[:35]` END at a conv (relu2_2/relu5_4
            # excluded despite the naming) — apply relu only if its module
            # index is inside the slice.
            if idx + 1 < stop_index:
                h = jax.nn.relu(h)
    return h


def make_vgg_loss(conv_index: str = "22"):
    """(pred, target in [-1,1], (B,H,W,1|3)) → scalar. Spec: `perceptual_loss.py`.

    Parity note: the reference feeds the raw [-1,1] tensors STRAIGHT into
    torchvision VGG19 with no ImageNet mean/std normalization
    (`perceptual_loss.py:44-53`) — unusual, but it is the trained objective;
    replicated exactly so transplanted-weight loss values match.
    """
    stop_index = {"22": 8, "54": 35}[conv_index]
    params = _load_vgg_params(stop_index)

    def loss(pred, target):
        def prep(x):
            x = x.astype(jnp.float32)
            if x.shape[-1] == 1:
                x = jnp.repeat(x, 3, axis=-1)  # channel expansion (`:44-46`)
            return x

        fp = _vgg_features(params, stop_index, prep(pred))
        ft = _vgg_features(params, stop_index, prep(jax.lax.stop_gradient(target)))
        return jnp.mean((fp - ft) ** 2)

    loss.pretrained = _vgg_pretrained(stop_index)
    return loss


# AlexNet feature stack (torchvision `alexnet().features`) — the backbone of
# `lpips.LPIPS(net='alex')` used by the reference (`lpips_loss.py:12`).
# (out_ch, kernel, stride, pad, maxpool_before)
_ALEX_CONVS = [
    (64, 11, 4, 2, False),   # conv1  → relu1 (tap 0)
    (192, 5, 1, 2, True),    # conv2  → relu2 (tap 1)
    (384, 3, 1, 1, True),    # conv3  → relu3 (tap 2)
    (256, 3, 1, 1, False),   # conv4  → relu4 (tap 3)
    (256, 3, 1, 1, False),   # conv5  → relu5 (tap 4)
]
# LPIPS v0.1 scaling layer constants (applies to [-1,1] inputs).
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _load_lpips_alex_params():
    """AlexNet conv kernels + LPIPS linear heads.

    MEDIMG_LPIPS_NPZ = the lpips package's own state_dict saved as npz:

        import lpips, numpy as np
        m = lpips.LPIPS(net='alex')
        np.savez(path, **{k: v.numpy() for k, v in m.state_dict().items()})

    i.e. keys `net.slice{s}.{i}.weight/bias` (convs, OIHW) and
    `lin{i}.model.1.weight` ((1,C,1,1) non-negative heads). Falls back to a
    seeded random AlexNet with uniform heads when unset.
    """
    path = os.environ.get("MEDIMG_LPIPS_NPZ", "")
    convs, lins = [], []
    if path and os.path.exists(path):
        raw = np.load(path)
        conv_keys = sorted(
            (k for k in raw.files if k.startswith("net.slice") and k.endswith(".weight")),
            key=lambda k: (int(k.split(".")[1][5:]), int(k.split(".")[2])),
        )
        if not conv_keys or "lin0.model.1.weight" not in raw.files:
            raise ValueError(
                f"MEDIMG_LPIPS_NPZ={path} is not an lpips state_dict npz "
                "(expected 'net.slice*.weight' convs and 'lin{i}.model.1."
                "weight' heads; found keys like "
                f"{sorted(raw.files)[:4]}...). Re-create it with "
                "tools/convert_perceptual_weights.py."
            )
        for wk in conv_keys:
            bk = wk[:-len("weight")] + "bias"
            w = raw[wk]  # OIHW
            convs.append((jnp.asarray(w.transpose(2, 3, 1, 0)), jnp.asarray(raw[bk])))
        for i in range(5):
            lw = raw[f"lin{i}.model.1.weight"]  # (1,C,1,1)
            lins.append(jnp.asarray(lw.reshape(-1)))
        return convs, lins, True

    warnings.warn(
        "No pretrained LPIPS(alex) weights (set MEDIMG_LPIPS_NPZ); using a "
        "seeded random AlexNet with uniform linear heads.",
        stacklevel=2,
    )
    key = jax.random.key(4321)
    in_ch = 3
    for out_ch, k, _, _, _ in _ALEX_CONVS:
        key, sub = jax.random.split(key)
        w = jax.nn.initializers.he_normal()(sub, (k, k, in_ch, out_ch), jnp.float32)
        convs.append((w, jnp.zeros((out_ch,), jnp.float32)))
        lins.append(jnp.full((out_ch,), 1.0 / out_ch, jnp.float32))
        in_ch = out_ch
    return convs, lins, False


def make_lpips_loss():
    """LPIPS with the AlexNet backbone — matches `lpips.LPIPS(net='alex')`
    (reference `lpips_loss.py`): scaling layer on [-1,1] inputs, AlexNet
    relu1–relu5 taps, per-tap unit channel normalization, squared difference
    through the learned non-negative 1×1 heads, spatial mean, summed over
    taps, mean over batch.
    """
    convs, lins, pretrained = _load_lpips_alex_params()
    shift = jnp.asarray(_LPIPS_SHIFT)
    scale = jnp.asarray(_LPIPS_SCALE)

    def features(x):
        feats = []
        h = x
        for (w, b), (_, _, stride, pad, pool_before) in zip(convs, _ALEX_CONVS):
            if pool_before:
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
                )
            h = jax.lax.conv_general_dilated(
                h, w, (stride, stride), [(pad, pad), (pad, pad)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
            h = jax.nn.relu(h)
            feats.append(h)
        return feats

    def loss(pred, target):
        def prep(x):
            x = x.astype(jnp.float32)
            if x.shape[-1] == 1:
                x = jnp.repeat(x, 3, axis=-1)  # channel expansion (`:16-17`)
            return (x - shift) / scale  # LPIPS ScalingLayer

        fp = features(prep(pred))
        ft = features(prep(jax.lax.stop_gradient(target)))
        total = jnp.float32(0.0)
        for lin, a, b in zip(lins, fp, ft):
            # unit-normalize along channels (lpips normalize_tensor, eps 1e-10)
            a = a / (jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True)) + 1e-10)
            b = b / (jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True)) + 1e-10)
            d = (a - b) ** 2
            # lin head then spatial average (lpips spatial=False path)
            total += jnp.mean(jnp.sum(d * lin[None, None, None, :], axis=-1))
        return total

    loss.pretrained = pretrained
    return loss


def make_perceptual_loss(kind: str = "vgg"):
    """Factory matching `base.py:269-275` perceptual_loss_type dispatch."""
    if kind == "vgg":
        return make_vgg_loss("22")
    if kind == "lpips":
        return make_lpips_loss()
    raise ValueError(f"unknown perceptual_loss_type {kind!r}")
