"""EMA vector quantizer — XLA reference implementation.

Behavioral spec: reference `src/networks/vq/vq_module.py` (VQModule) and
`src/networks/vq/grad_approximation.py` (straight-through estimator).

TPU-first design notes
----------------------
* The codebook is a functional pytree (`VQState`) threaded through the train
  step, not a mutable buffer: `quantized, commit, ids, new_state = vq_apply(...)`.
* Nearest-neighbour assignment is the MXU-friendly form used by the reference's
  torch backend (`vq_module.py:45-62`): maximize `2·x·eᵀ − ‖e‖²` (the `‖x‖²`
  term is constant per query and dropped — the reference keeps it only because
  it returns scores). For K≈10–512 this is one (BHW,C)×(C,K) matmul + argmax.
* Distributed EMA: the reference all-reduces the quantization statistics across
  DDP ranks (`vq_module.py:182-196`). Here the same collective is a
  `jax.lax.psum` over `axis_name` inside `shard_map`/`pmap`. NB the reference
  has an inconsistency: it all-reduces `embed_onehot` *after* having computed
  the (local) `embed_onehot_sum` used for the `cluster_size` EMA, so only
  `embed_sum` is actually averaged across ranks while counts stay local. We
  implement the evidently-intended semantics — *both* statistics averaged over
  the world — which matches the reference in expectation and is stable.
* A fused Pallas kernel for assign + statistics lives in `vq_pallas.py`; this
  module is its semantic reference (mirroring the reference's torch-vs-faiss
  backend seam, `vq_module.py:117-121`).

Layout: NHWC. `ids` are raw 0-based codes of shape (B,H,W); the +1 offset and
H↔W transpose of the reference encoder (`src/networks/unet_encoder.py:114-117`)
are applied by the encoder wrapper, not here.
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class VQState(NamedTuple):
    """Codebook state. Spec: buffers at `vq_module.py:154-157`.

    embed:        (K, C) codebook vectors (reference: `embed` (K,C)).
    cluster_size: (K,)   EMA of per-code assignment counts.
    embed_avg:    (K, C) EMA of per-code embedding sums
                  (reference stores (C,K) `embed_avg`; we keep (K,C) — layout
                  only, the math is identical).
    """

    embed: jax.Array
    cluster_size: jax.Array
    embed_avg: jax.Array


def vq_init(key, dict_size: int, emb_dim: int, dtype=jnp.float32) -> VQState:
    """Random-normal init. Spec: `vq_module.py:153-157`."""
    embed = jax.random.normal(key, (dict_size, emb_dim), dtype)
    return VQState(
        embed=embed,
        cluster_size=jnp.zeros((dict_size,), dtype),
        embed_avg=embed,
    )


def straight_through(quantized, x):
    """Gradient router: forward `quantized`, backward identity to `x`.

    Spec: `grad_approximation.py:7-29` (sum_to_size reduces to identity here —
    shapes always match).
    """
    return x + jax.lax.stop_gradient(quantized - x)


def vq_assign(embed: jax.Array, flat: jax.Array) -> jax.Array:
    """1-NN code assignment. flat: (N, C) queries, embed: (K, C) codebook → (N,) ids.

    L2 argmin via the score form of `vq_module.py:45-62`:
    argmax_k 2·x·e_k − ‖e_k‖² (‖x‖² dropped). The matmul runs on the MXU in
    f32 accumulation.
    """
    scores = 2.0 * jnp.dot(
        flat,
        embed.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) - jnp.sum(embed.astype(jnp.float32) ** 2, axis=1)[None, :]
    return jnp.argmax(scores, axis=1).astype(jnp.int32)


def vq_lookup(state: VQState, ids: jax.Array) -> jax.Array:
    """Codebook gather, ids (...,) int → (..., C). Spec: `vq_module.py:204-207`."""
    return jnp.take(state.embed, ids, axis=0)


def _ema(base, update, momentum):
    """base·m + update·(1−m). Spec: `vq_module.py:132-136`."""
    return base * momentum + update * (1.0 - momentum)


def vq_apply(
    state: VQState,
    x: jax.Array,
    *,
    momentum: float = 0.99,
    eps: float = 1e-5,
    train: bool = True,
    axis_name: Optional[str] = None,
    backend: str = "xla",
) -> Tuple[jax.Array, jax.Array, jax.Array, VQState]:
    """Quantize x (B,H,W,C) against the codebook.

    Returns (quantized_st, commit_loss, ids, new_state) — matching
    `vq_module.py:159-166` forward: quantized with straight-through gradients,
    MSE commit loss, raw ids (B,H,W).

    With `train=True` the EMA codebook update of `vq_module.py:182-200`
    (Laplace-smoothed normalization) is applied; with `axis_name` set the
    statistics are averaged over that mesh axis via `psum` — the TPU-native
    equivalent of the reference's `all_reduce(...)/world_size`.
    """
    # backend seam mirroring the reference's knn_backend ∈ {'torch','faiss'}
    # (`vq_module.py:117-121`): 'xla'/'torch' → this reference path,
    # 'pallas'/'faiss' → the fused TPU kernel in vq_pallas.py.
    if backend in ("pallas", "faiss"):
        from .vq_pallas import vq_apply_fused

        return vq_apply_fused(
            state, x, momentum=momentum, eps=eps, train=train, axis_name=axis_name
        )
    assert backend in ("xla", "torch"), backend

    k, c = state.embed.shape
    b, h, w, cc = x.shape
    assert cc == c, (cc, c)

    flat = jax.lax.stop_gradient(x.reshape(-1, c).astype(jnp.float32))
    ids_flat = vq_assign(state.embed, flat)
    ids = ids_flat.reshape(b, h, w)

    quantized = vq_lookup(state, ids).astype(x.dtype)

    commit_loss = jnp.mean(
        (x.astype(jnp.float32) - jax.lax.stop_gradient(quantized).astype(jnp.float32)) ** 2
    )
    quantized_st = straight_through(jax.lax.stop_gradient(quantized), x)

    if train:
        onehot = (
            ids_flat[:, None] == jnp.arange(k, dtype=jnp.int32)[None, :]
        ).astype(jnp.float32)
        # (K,) assignment counts and (K,C) per-code sums — one MXU matmul.
        onehot_sum = jnp.sum(onehot, axis=0)
        embed_sum = jnp.dot(
            onehot.T,
            flat,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        if axis_name is not None:
            onehot_sum = jax.lax.pmean(onehot_sum, axis_name)
            embed_sum = jax.lax.pmean(embed_sum, axis_name)

        cluster_size = _ema(state.cluster_size, onehot_sum, momentum)
        embed_avg = _ema(state.embed_avg, embed_sum, momentum)

        n = jnp.sum(cluster_size)
        smoothed = n * (cluster_size + eps) / (n + k * eps)
        embed = embed_avg / smoothed[:, None]
        new_state = VQState(embed=embed, cluster_size=cluster_size, embed_avg=embed_avg)
    else:
        new_state = state

    return quantized_st, commit_loss, ids, new_state
