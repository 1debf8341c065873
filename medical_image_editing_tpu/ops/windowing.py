"""CT/MR intensity windowing math.

Behavioral spec: reference `src/utils/__init__.py:17-51` (normalize /
t_normalize / denormalize) and `:81-92` (norm / denorm). These are the HU-window
converters used for single/multi-window training and for the editing loop's
window re-normalization.

All functions are dtype/backend polymorphic: they work on `jnp` arrays inside
jit (device path) and on numpy arrays on the host (preprocessing path), because
they only use arithmetic + `clip`. Unlike the reference's in-place numpy
helpers, everything here is pure (no aliasing surprises under jit).

Quirk preserved from the reference: `t_normalize` does NOT clamp to the window
(reference `src/utils/__init__.py:34` comments the clamp out) — it is the
differentiable path used on reconstructions, so gradients flow outside the
window.
"""

from types import SimpleNamespace

import jax.numpy as jnp

# Reference `src/trainers/base.py:29-41`
LUNG_WINDOW = SimpleNamespace(width=1500, center=-550, scale=2.0)
MEDIASTINAL_WINDOW = SimpleNamespace(width=400, center=20, scale=2.0)


def _window_bounds(width, center):
    # `//` parity with the reference (integer window params).
    vmax = center + width // 2
    vmin = center - width // 2
    return vmin, vmax


def normalize(image, width=1500, center=-550, scale=2.0):
    """HU window → [-scale/2, scale/2], clipping outside the window.

    Spec: reference `src/utils/__init__.py:17-29`.
    """
    vmin, vmax = _window_bounds(width, center)
    image = jnp.clip(image, vmin, vmax) if isinstance(image, jnp.ndarray) else image.clip(vmin, vmax)
    image = (image - vmin) / (vmax - vmin)
    return (image - 0.5) * scale


def t_normalize(image, width=1500, center=-550, scale=2.0):
    """Differentiable windowing: same affine map as `normalize` but no clamp.

    Spec: reference `src/utils/__init__.py:32-42` (clamp deliberately absent).
    """
    vmin, vmax = _window_bounds(width, center)
    image = (image - vmin) / (vmax - vmin)
    return (image - 0.5) * scale


def denormalize(image, width, center, scale):
    """Inverse of `normalize` (modulo clipping). Spec: `src/utils/__init__.py:45-51`."""
    vmin, vmax = _window_bounds(width, center)
    image = image / scale + 0.5
    return image * (vmax - vmin) + vmin


def denorm(array, vmin, vmax):
    """[-1,1] → [vmin,vmax]. Spec: `src/utils/__init__.py:81-86` (made pure)."""
    return (array + 1.0) / 2.0 * (vmax - vmin) + vmin


def norm(array):
    """[0,1] → [-1,1]. Spec: `src/utils/__init__.py:89-92` (made pure)."""
    return array * 2.0 - 1.0


def normalize_intensity(image, vmin=0.0, vmax=255.0):
    """Clamp to [vmin,vmax] then map to [-1,1].

    Spec: reference `src/dataio/transforms.py:52-71` (NormalizeIntensity),
    fused here into one device-side op (runs inside the jitted step rather than
    in a host dataloader worker).
    """
    image = jnp.clip(image, vmin, vmax)
    image = (image - vmin) / (vmax - vmin)
    return image * 2.0 - 1.0
