"""Reconstruction metrics (MSE/"NMSE", PSNR, SSIM) and label-map entropy.

Behavioral spec: the reference uses torchmetrics 0.6.2
(`src/trainers/base.py:9-11,75-77`): `MeanSquaredError` (aliased NMSE),
`PeakSignalNoiseRatio` and `StructuralSimilarityIndexMeasure`, each with
default args — i.e. dynamic data range inferred from the batch — plus
`scipy.stats.entropy(bincounts, base=2)` over codebook ids
(`src/trainers/single_window_trainer.py:796-799`).

All metrics are jit-compatible pure functions over NHWC arrays.
"""

import jax
import jax.numpy as jnp


def nmse(pred, target):
    """Plain MSE — the reference's "NMSE" is `torchmetrics.MeanSquaredError`."""
    return jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)


def _data_range(pred, target):
    """torchmetrics default data_range: inferred from the data."""
    return jnp.maximum(
        jnp.max(pred) - jnp.min(pred), jnp.max(target) - jnp.min(target)
    )


def psnr(pred, target, data_range=None):
    """10·log10(range²/MSE); default range = max−min of target (torchmetrics)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if data_range is None:
        data_range = jnp.max(target) - jnp.min(target)
    mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(data_range**2 / mse)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    g = g / jnp.sum(g)
    return jnp.outer(g, g)


def ssim(pred, target, data_range=None, kernel_size: int = 11, sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03):
    """Gaussian-window SSIM, torchmetrics 0.6.2 defaults. pred/target: (B,H,W,C)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if data_range is None:
        data_range = _data_range(pred, target)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    ch = pred.shape[-1]
    kern = _gaussian_kernel(kernel_size, sigma)
    # depthwise conv: (H,W,1,C) filter with feature_group_count=C
    kern = jnp.tile(kern[:, :, None, None], (1, 1, 1, ch))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=ch,
        )

    mu_p = filt(pred)
    mu_t = filt(target)
    mu_pp = mu_p * mu_p
    mu_tt = mu_t * mu_t
    mu_pt = mu_p * mu_t
    sigma_pp = filt(pred * pred) - mu_pp
    sigma_tt = filt(target * target) - mu_tt
    sigma_pt = filt(pred * target) - mu_pt

    num = (2.0 * mu_pt + c1) * (2.0 * sigma_pt + c2)
    den = (mu_pp + mu_tt + c1) * (sigma_pp + sigma_tt + c2)
    return jnp.mean(num / den)


def label_entropy(ids, dict_size: int):
    """Base-2 entropy of codebook usage.

    Spec: `single_window_trainer.py:796-799` — bincount over ids (which carry
    the +1 background offset) with minlength dict_size+1, background bin
    dropped, `scipy.stats.entropy(counts, base=2)` (normalizes counts to a
    distribution; zero bins contribute 0).
    """
    ids = ids.astype(jnp.int32).reshape(-1)
    counts = jnp.sum(
        ids[:, None] == jnp.arange(1, dict_size + 1, dtype=jnp.int32)[None, :], axis=0
    ).astype(jnp.float32)
    p = counts / jnp.maximum(jnp.sum(counts), 1.0)
    return -jnp.sum(jnp.where(p > 0, p * jnp.log2(jnp.maximum(p, 1e-30)), 0.0))
