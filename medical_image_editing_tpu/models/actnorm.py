"""Glow-style ActNorm: per-channel affine with data-dependent initialization.

Behavioral spec: reference `src/networks/actnorm.py` (from taming-transformers)
— learnable loc/scale initialized on the first training batch to whiten per
channel (loc = −mean, scale = 1/(std+1e−6)), optional logdet, and a reverse
transform.

TPU-first: the "initialized" flag and data-dependent assignment become an
explicit mutable 'actnorm' collection (a one-element flag + the captured
stats), updated functionally on the first train-mode apply. Under a data mesh
pass `axis_name` to compute the init stats over the global batch (the torch
version under DDP initialized per-rank from local stats — a quirk; we use the
cross-replica mean which is deterministic and replica-consistent).
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class ActNorm(nn.Module):
    features: int
    logdet: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True, reverse: bool = False):
        squeeze = x.ndim == 2
        if squeeze:
            x = x[:, None, None, :]

        loc = self.param("loc", nn.initializers.zeros, (self.features,))
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        initialized = self.variable(
            "actnorm", "initialized", lambda: jnp.zeros((), jnp.bool_)
        )
        # data-dependent correction, folded multiplicatively/additively into
        # the parameters' effect (parameters stay at their init values; the
        # captured stats live in the 'actnorm' collection)
        data_loc = self.variable(
            "actnorm", "data_loc", lambda: jnp.zeros((self.features,))
        )
        data_scale = self.variable(
            "actnorm", "data_scale", lambda: jnp.ones((self.features,))
        )

        if train and not self.is_initializing():
            mean = jnp.mean(x, axis=(0, 1, 2))
            std = jnp.std(x, axis=(0, 1, 2))
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                std = jax.lax.pmean(std, self.axis_name)
            init_loc = -mean
            init_scale = 1.0 / (std + 1e-6)
            first = jnp.logical_not(initialized.value)
            data_loc.value = jnp.where(first, init_loc, data_loc.value)
            data_scale.value = jnp.where(first, init_scale, data_scale.value)
            initialized.value = jnp.ones((), jnp.bool_)

        eff_loc = loc + jax.lax.stop_gradient(data_loc.value)
        eff_scale = scale * jax.lax.stop_gradient(data_scale.value)

        if reverse:
            h = x / eff_scale - eff_loc
        else:
            h = eff_scale * (x + eff_loc)

        if squeeze:
            h = h[:, 0, 0, :]

        if self.logdet and not reverse:
            height, width = x.shape[1], x.shape[2]
            log_abs = jnp.log(jnp.abs(eff_scale))
            ld = height * width * jnp.sum(log_abs) * jnp.ones((x.shape[0],), x.dtype)
            return h, ld
        return h
