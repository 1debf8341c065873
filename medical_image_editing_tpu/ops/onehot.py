"""One-hot encoding.

Behavioral spec: reference `src/functions/onehot.py:11-20` (OneHotEncoder) —
channels-last here (NHWC) instead of the reference's channels-second (NCHW).
"""

import jax.numpy as jnp


def one_hot(ids, n_classes, dtype=jnp.float32):
    """Integer id map (B,H,W) → one-hot (B,H,W,K) float.

    The trainer drops the background channel afterwards
    (reference `src/trainers/single_window_trainer.py:98-99` slices `[:, 1:]`);
    callers here slice `[..., 1:]`.
    """
    ids = ids.astype(jnp.int32)
    return (ids[..., None] == jnp.arange(n_classes, dtype=jnp.int32)).astype(dtype)
