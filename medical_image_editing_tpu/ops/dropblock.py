"""DropBlock2D spatial regularization + linear schedule.

Behavioral spec: reference `src/networks/dropblock.py` (vendored from
miguelvr/dropblock): gamma = drop_prob / block_size²; per-(sample, pixel)
Bernoulli seeds expanded into blocks by a stride-1 max-pool; mean-preserving
rescale by numel/sum of the keep mask; LinearScheduler steps drop_prob once
per epoch (`src/trainers/base.py:185-187`).

TPU-first: the schedule is a pure function of the epoch index (no stateful
`.step()`), the Bernoulli draw comes from an explicit PRNG key, and the
max-pool is `lax.reduce_window` — everything fuses under jit. Layout NHWC.
"""

import jax
import jax.numpy as jnp


def dropblock_schedule(epoch, start_value: float, stop_value: float, nr_steps: int):
    """drop_prob for a given epoch: linspace(start, stop, nr_steps)[min(epoch, n-1)].

    Spec: `dropblock.py:8-22` — values advance once per `.step()` and saturate
    at the last value.
    """
    i = jnp.minimum(epoch, nr_steps - 1).astype(jnp.float32)
    if nr_steps <= 1:
        return jnp.float32(start_value)
    return start_value + (stop_value - start_value) * i / (nr_steps - 1)


def dropblock_2d(key, x, drop_prob, block_size: int, train: bool = True):
    """x: (B,H,W,C). Spec: `dropblock.py:47-94`.

    NB the reference computes the mask even when drop_prob == 0 and then
    returns x unscaled; since drop_prob==0 yields an all-ones keep mask the
    pure computation is equivalent, so no special case is needed under jit
    (drop_prob may be a traced scalar from `dropblock_schedule`).
    """
    if not train:
        return x

    b, h, w, c = x.shape
    gamma = drop_prob / float(block_size**2)
    seeds = (jax.random.uniform(key, (b, h, w, 1)) < gamma).astype(x.dtype)

    pad = block_size // 2
    pooled = jax.lax.reduce_window(
        seeds,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, block_size, block_size, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    if block_size % 2 == 0:
        # torch's symmetric pad of k//2 with even k yields H+1; reference trims
        # the trailing row/col (`dropblock.py:86-87`).
        pooled = pooled[:, :h, :w, :]
    keep = 1.0 - pooled  # (B,H,W,1)

    out = x * keep
    scale = keep.size / jnp.maximum(jnp.sum(keep), 1.0)
    return out * scale
