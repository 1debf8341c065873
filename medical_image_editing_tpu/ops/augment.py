"""Dual-view augmentation pipeline (the kornia RandomTransform replacement).

Behavioral spec: reference `src/networks/random_transform.py` — a config-driven
list of geometric modules (RandomHorizontalFlip, RandomAffine) whose sampled
3×3 matrices are recorded for later id-map warping, followed by photometric
modules (ColorJitter, RandomGaussianBlur, RandomPosterize, RandomGaussianNoise)
applied only to the "noised" view; returns `(noised, clear)` plus the recorded
transforms. Inputs are in [0,1] (the trainer denorms before augmenting,
`src/trainers/single_window_trainer.py:72-82`).

TPU-first divergences (documented, all quality-neutral or better):
* The reference expands 1→3 channels for kornia and converts back to grayscale
  (`random_transform.py:76-91`); since the ITU-601 grayscale weights sum to 1,
  that round trip is the identity on replicated channels, and ColorJitter's
  hue/saturation are mathematical no-ops on gray images. We therefore stay
  single-channel (3× less HBM traffic) and implement brightness/contrast only.
* Geometric modules are composed into ONE matrix per view and applied with a
  single resampling (instead of one warp per module) — fewer interpolation
  passes, same recorded-matrix contract. `forward_transform`/`reverse_transform`
  likewise warp id maps once with the composed (or inverted) matrix.
* All randomness comes from explicit PRNG keys; every op is jit-safe with
  static shapes (per-sample application masks instead of dynamic batching).
"""

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from .warp import (
    affine_matrix,
    hflip_matrix,
    identity_matrix,
    warp_ids_forward,
    warp_ids_reverse,
    warp_perspective,
)


def _get(cfg: Any, name: str, default=None):
    """Read a field from a dict or namespace-style config."""
    if cfg is None:
        return default
    if isinstance(cfg, dict):
        return cfg.get(name, default)
    return getattr(cfg, name, default)


def _as_range(v, center: float = 0.0):
    """Kornia scalar→range convention: x → (center−x, center+x); pairs pass through."""
    if v is None:
        return None
    if isinstance(v, (tuple, list)):
        return float(v[0]), float(v[1])
    return center - float(v), center + float(v)


def _maybe(key, p: float, batch: int):
    """Per-sample apply mask, kornia batch-wise p semantics."""
    return jax.random.uniform(key, (batch,)) < p


# ---------------------------------------------------------------------------
# geometric
# ---------------------------------------------------------------------------


def sample_geometric_matrices(key, cfg, batch: int, height: int, width: int) -> jax.Array:
    """Sample the composed per-sample (B,3,3) geometric transform.

    Module list and parameters follow the reference config schema
    (`random_transform.py:19-46`): modules applied in config order, each with
    per-sample probability p.
    """
    mats = identity_matrix(batch)
    modules = _get(cfg, "modules", []) or []
    for module in modules:
        key, k_p, k_a, k_b, k_c, k_d = jax.random.split(key, 6)
        if module == "RandomHorizontalFlip":
            mcfg = _get(cfg, "RandomHorizontalFlip")
            apply = _maybe(k_p, float(_get(mcfg, "p", 0.5)), batch)
            flip = jnp.broadcast_to(hflip_matrix(width), (batch, 3, 3))
            step = jnp.where(apply[:, None, None], flip, identity_matrix(batch))
            mats = jnp.einsum("bij,bjk->bik", step, mats)
        elif module == "RandomAffine":
            mcfg = _get(cfg, "RandomAffine")
            apply = _maybe(k_p, float(_get(mcfg, "p", 0.5)), batch)
            deg_lo, deg_hi = _as_range(_get(mcfg, "degrees", 0.0))
            angle = jax.random.uniform(k_a, (batch,), minval=deg_lo, maxval=deg_hi)

            translate = _get(mcfg, "translate")
            if translate is not None:
                tx_f, ty_f = (
                    (float(translate[0]), float(translate[1]))
                    if isinstance(translate, (tuple, list))
                    else (float(translate), float(translate))
                )
                t = jax.random.uniform(k_b, (batch, 2), minval=-1.0, maxval=1.0)
                trans = t * jnp.array([tx_f * width, ty_f * height], jnp.float32)
            else:
                trans = jnp.zeros((batch, 2), jnp.float32)

            scale_rng = _get(mcfg, "scale")
            if scale_rng is not None:
                s = jax.random.uniform(
                    k_c, (batch,), minval=float(scale_rng[0]), maxval=float(scale_rng[1])
                )
                scale = jnp.stack([s, s], axis=-1)
            else:
                scale = jnp.ones((batch, 2), jnp.float32)

            shear_rng = _as_range(_get(mcfg, "shear"))
            if shear_rng is not None:
                shx = jax.random.uniform(
                    k_d, (batch,), minval=shear_rng[0], maxval=shear_rng[1]
                )
                shear = jnp.stack([shx, jnp.zeros_like(shx)], axis=-1)
            else:
                shear = jnp.zeros((batch, 2), jnp.float32)

            aff = jax.vmap(
                lambda a, t_, s_, sh: affine_matrix(a, t_, s_, sh, height, width)
            )(angle, trans, scale, shear)
            step = jnp.where(apply[:, None, None], aff, identity_matrix(batch))
            mats = jnp.einsum("bij,bjk->bik", step, mats)
    return mats


# ---------------------------------------------------------------------------
# photometric
# ---------------------------------------------------------------------------


def _gaussian_blur(x, kernel: int, sigma: float):
    """Separable depthwise gaussian blur, reflect padding (kornia default)."""
    coords = jnp.arange(kernel, dtype=jnp.float32) - (kernel - 1) / 2.0
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    g = g / jnp.sum(g)
    c = x.shape[-1]
    pad = kernel // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    kh = jnp.tile(g[:, None, None, None], (1, 1, 1, c))  # (K,1,1,C)
    kw = jnp.tile(g[None, :, None, None], (1, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        xp, kh, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    out = jax.lax.conv_general_dilated(
        out, kw, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out


def apply_photometric(key, x, cfg) -> jax.Array:
    """Photometric modules in config order, per-sample probability p.

    x: (B,H,W,C) in [0,1]. Spec: `random_transform.py:37-72,87-88`.
    """
    b = x.shape[0]
    modules = _get(cfg, "modules", []) or []
    for module in modules:
        key, k_p, k_a, k_b = jax.random.split(key, 4)
        sel = None
        if module == "ColorJitter":
            # kornia 0.5.1 semantics (the behavior later renamed ColorJiggle;
            # kornia ≥0.6 changed ColorJitter to match torchvision — the
            # reference pins kornia==0.5.1, requirements.txt:21):
            #   brightness: factor ~ U(1−b, 1+b), out = clip(x + (factor−1))
            #               — ADDITIVE, not torchvision's multiplicative
            #   contrast:   factor ~ U(max(0,1−c), 1+c), out = clip(x·factor)
            #               — pure scaling, no mean-centering
            # See docs/augmentation_audit.md for the full semantics audit.
            mcfg = _get(cfg, "ColorJitter")
            apply = _maybe(k_p, float(_get(mcfg, "p", 0.5)), b)
            out = x
            bright = float(_get(mcfg, "brightness", 0.0) or 0.0)
            if bright > 0:
                f = jax.random.uniform(
                    k_a, (b, 1, 1, 1), minval=-bright, maxval=bright
                )
                out = jnp.clip(out + f, 0.0, 1.0)
            contrast = float(_get(mcfg, "contrast", 0.0) or 0.0)
            if contrast > 0:
                f = jax.random.uniform(
                    k_b, (b, 1, 1, 1), minval=max(0.0, 1.0 - contrast), maxval=1.0 + contrast
                )
                out = jnp.clip(out * f, 0.0, 1.0)
            # saturation/hue: no-ops on grayscale inputs (see module docstring)
            sel = out
        elif module == "RandomGaussianBlur":
            mcfg = _get(cfg, "RandomGaussianBlur")
            apply = _maybe(k_p, float(_get(mcfg, "p", 0.5)), b)
            sel = _gaussian_blur(
                x, int(_get(mcfg, "kernel", 3)), float(_get(mcfg, "sigma", 1.0))
            )
        elif module == "RandomPosterize":
            mcfg = _get(cfg, "RandomPosterize")
            apply = _maybe(k_p, float(_get(mcfg, "p", 0.5)), b)
            bits = int(_get(mcfg, "bits", 8))
            levels = 2 ** (8 - bits)
            sel = jnp.floor(x * 255.0 / levels) * levels / 255.0
        elif module == "RandomGaussianNoise":
            mcfg = _get(cfg, "RandomGaussianNoise")
            apply = _maybe(k_p, float(_get(mcfg, "p", 0.5)), b)
            std = float(_get(mcfg, "std", 0.1))
            sel = x + std * jax.random.normal(k_a, x.shape)
        if sel is not None:
            x = jnp.where(apply[:, None, None, None], sel, x)
    return x


# ---------------------------------------------------------------------------
# the RandomTransform equivalent
# ---------------------------------------------------------------------------


def random_transform(key, image, cfg) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One augmented view: (noised, clear, mats).

    image: (B,H,W,C) in [0,1]. `clear` is the geometrically-warped image before
    photometric noise (`random_transform.py:83-91`); `mats` (B,3,3) is the
    composed geometric transform to be used with `forward_transform` /
    `reverse_transform`.
    """
    b, h, w, _ = image.shape
    k_geo, k_phot = jax.random.split(key)
    mats = sample_geometric_matrices(k_geo, cfg, b, h, w)
    clear = warp_perspective(image, mats, method="bilinear")
    noised = apply_photometric(k_phot, clear, cfg)
    return noised, clear, mats


def forward_transform(ids, mats) -> jax.Array:
    """Warp an id map (B,H,W) into the view's frame, nearest interpolation.

    Spec: `random_transform.py:93-104`.
    """
    return warp_ids_forward(ids, [mats])


def reverse_transform(ids, mats) -> jax.Array:
    """Undo the view's warp on an id map, nearest. Spec: `random_transform.py:106-112`."""
    return warp_ids_reverse(ids, [mats])


def cross_view_transform(ids, mats_src, mats_dst) -> jax.Array:
    """Warp an id map from view-src's frame into view-dst's frame in ONE
    nearest resample (matrix `mats_dst · mats_src⁻¹`).

    Semantically equivalent to the reference's
    `forward_transform(reverse_transform(ids, mats_src), mats_dst)`
    (`single_window_trainer.py:91-96`) but with a single nearest-neighbor
    quantization instead of two — strictly less resampling error, and half
    the gather traffic on TPU. Border behavior differs only for pixels whose
    round trip leaves and re-enters the canvas (zero-padded in the two-pass
    form), a measure-zero fringe for the small affine augmentations used here.
    """
    m = jnp.einsum("bij,bjk->bik", mats_dst.astype(jnp.float32),
                   jnp.linalg.inv(mats_src.astype(jnp.float32)))
    return warp_perspective(ids.astype(jnp.float32)[..., None], m, method="nearest")[
        ..., 0
    ]
