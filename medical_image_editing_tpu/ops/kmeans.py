"""Jitted Lloyd k-means for distributed codebook initialization.

Behavioral spec: the reference gathers first-batch encoder embeddings across
GPUs, runs `kmeans_pytorch.kmeans` (Euclidean Lloyd iterations) on rank 0 and
broadcasts the centers (`src/networks/unet_encoder.py:66-91`).

TPU-native replacement: `jax.lax.all_gather` the embeddings over the data axis
(or just use the local batch single-chip), then run a fixed number of jitted
Lloyd iterations on device — argmin assignment (one MXU matmul) + segment mean
via one-hot matmul. The result is computed identically on every replica, so no
broadcast is needed (replicated-by-construction replaces `broadcast`).
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_clusters", "num_iters"))
def kmeans(
    key: jax.Array,
    x: jax.Array,
    num_clusters: int,
    num_iters: int = 50,
) -> Tuple[jax.Array, jax.Array]:
    """Lloyd k-means. x: (N, C) → (ids (N,), centers (K, C)).

    Init: K distinct random points from x (matches kmeans_pytorch's random
    `initialize`). Empty clusters keep their previous center (kmeans_pytorch
    nan-guards the same way via its `nan_to_num` of empty selections).
    """
    n, c = x.shape
    x = x.astype(jnp.float32)
    idx = jax.random.choice(key, n, (num_clusters,), replace=False)
    centers0 = x[idx]

    def step(centers, _):
        # argmin_k ‖x−c_k‖² == argmax_k 2·x·c_k − ‖c_k‖²
        scores = 2.0 * jnp.dot(x, centers.T, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
        scores = scores - jnp.sum(centers**2, axis=1)[None, :]
        ids = jnp.argmax(scores, axis=1)
        onehot = (
            ids[:, None] == jnp.arange(num_clusters, dtype=ids.dtype)[None, :]
        ).astype(jnp.float32)
        counts = jnp.sum(onehot, axis=0)
        sums = jnp.dot(onehot.T, x, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        new_centers = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], centers
        )
        return new_centers, None

    centers, _ = jax.lax.scan(step, centers0, None, length=num_iters)

    scores = 2.0 * jnp.dot(x, centers.T, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
    scores = scores - jnp.sum(centers**2, axis=1)[None, :]
    ids = jnp.argmax(scores, axis=1).astype(jnp.int32)
    return ids, centers
