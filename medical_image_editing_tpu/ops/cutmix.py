"""CutMix box sampling and pasting.

Behavioral spec: reference `src/utils/__init__.py:192-218`
(`cutmix_coordinates` / `cutmix` / `mask_src_tgt`, from unet-stylegan2).

TPU-first: the reference samples the box on the host with numpy and pastes via
python slicing. Under jit that would force dynamic shapes, so the box is
sampled from an explicit PRNG key and realized as a (H,W) {0,1} mask built from
`broadcasted_iota` comparisons — fully static shapes, fused by XLA into the
surrounding elementwise ops. The mask IS the box; pasting is a `where`.
"""

import jax
import jax.numpy as jnp


def cutmix_coordinates(key, height: int, width: int, alpha: float = 1.0):
    """Sample box corners ((y0,y1),(x0,x1)) and lam. Spec: `utils/__init__.py:192-206`."""
    k1, k2, k3 = jax.random.split(key, 3)
    lam = jax.random.beta(k1, alpha, alpha)
    cx = jax.random.uniform(k2, (), minval=0.0, maxval=width)
    cy = jax.random.uniform(k3, (), minval=0.0, maxval=height)
    w = width * jnp.sqrt(1.0 - lam)
    h = height * jnp.sqrt(1.0 - lam)
    x0 = jnp.round(jnp.maximum(cx - w / 2, 0.0)).astype(jnp.int32)
    x1 = jnp.round(jnp.minimum(cx + w / 2, width)).astype(jnp.int32)
    y0 = jnp.round(jnp.maximum(cy - h / 2, 0.0)).astype(jnp.int32)
    y1 = jnp.round(jnp.minimum(cy + h / 2, height)).astype(jnp.int32)
    return ((y0, y1), (x0, x1)), lam


def cutmix_mask(coords, height: int, width: int, dtype=jnp.float32) -> jax.Array:
    """Box corners → (H,W) mask, 1 inside [y0,y1)×[x0,x1) (python-slice semantics)."""
    ((y0, y1), (x0, x1)), = (coords,)
    rows = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    inside = (rows >= y0) & (rows < y1) & (cols >= x0) & (cols < x1)
    return inside.astype(dtype)


def cutmix(source, target, mask) -> jax.Array:
    """Paste `target` into `source` inside the box. Spec: `utils/__init__.py:209-213`.

    source/target: (B,H,W,C); mask: (H,W) from `cutmix_mask`.
    """
    m = mask[None, :, :, None]
    return source * (1.0 - m) + target * m


def mask_src_tgt(source, target, mask) -> jax.Array:
    """Lerp by mask: src·m + (1−m)·tgt. Spec: `utils/__init__.py:216-218`."""
    m = mask[None, :, :, None] if mask.ndim == 2 else mask
    return source * m + (1.0 - m) * target
