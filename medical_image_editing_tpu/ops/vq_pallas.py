"""Fused Pallas TPU kernel for VQ: assign + lookup + EMA statistics in one pass.

The reference's performance seam here is its optional faiss-gpu brute-force
1-NN backend (`src/networks/vq/vq_module.py:65-129`, selected by
`knn_backend ∈ {'torch','faiss'}` `:117-121`); the torch path is the semantic
spec. SURVEY.md §2.9 maps it to this kernel: for each (TILE_N, C) tile of the
flattened (B·H·W, C) features, one MXU matmul against the (K, C) codebook with
a fused ‖e‖² bias gives the assignment scores; the same tile then produces the
quantized output (onehot·codebook — a second tiny matmul), and the per-code
counts / embedding sums that feed the EMA update are accumulated across the
sequential TPU grid into (1, K) / (K, C) outputs. One HBM read of the
features, everything else stays in VMEM.

`vq_apply_fused` is a drop-in for `ops.vq.vq_apply` (same returns, same
collective hooks) and is cross-checked against it in tests (the XLA path is
the reference implementation, mirroring the torch/faiss seam).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .vq import VQState, _ema, straight_through


def _vq_kernel(flat_ref, embed_ref, esq_ref, ids_ref, quant_ref, counts_ref, sums_ref):
    """One grid step: tile of features → ids, quantized, stats accumulation."""
    i = pl.program_id(0)

    x = flat_ref[:]  # (TILE_N, C) f32
    embed = embed_ref[:]  # (K, C) f32
    esq = esq_ref[:]  # (1, K) f32 — precomputed ‖e_k‖²

    # scores = 2·x·eᵀ − ‖e‖² ; argmax == L2 argmin (vq_module.py:45-62)
    scores = 2.0 * jax.lax.dot_general(
        x, embed,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ) - esq  # (TILE_N, K)

    ids = jnp.argmax(scores, axis=1).astype(jnp.int32)  # (TILE_N,)
    ids_ref[:] = ids[:, None]

    k = embed.shape[0]
    onehot = (
        ids[:, None] == jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], k), 1)
    ).astype(jnp.float32)  # (TILE_N, K)

    # quantized tile: onehot·codebook (gather as a matmul — MXU-friendly)
    quant_ref[:] = jnp.dot(onehot, embed, preferred_element_type=jnp.float32)

    # EMA statistics, accumulated across the sequential grid
    @pl.when(i == 0)
    def _():
        counts_ref[:] = jnp.zeros_like(counts_ref)
        sums_ref[:] = jnp.zeros_like(sums_ref)

    counts_ref[:] += jnp.sum(onehot, axis=0)[None, :]
    sums_ref[:] += jax.lax.dot_general(
        onehot, x,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _pick_tile(n: int, c: int, k: int, tile_n: Optional[int]) -> int:
    """Feature-tile rows per grid step, fitted to the ~16 MB scoped-VMEM stack.

    Per tile row the kernel holds the input and quantized-output blocks
    (double-buffered by the Pallas pipeline) plus the scores/onehot
    intermediates: ≈ 2·2·4C + 2·4K bytes/row; the codebook adds a constant
    ≈ 8KC. A 12 MB budget leaves headroom under the 16 MB limit (at the
    flagship C=16/K=10 point this still selects the full 2048-row tile;
    at VQGAN's C=512 it drops to 1024 — without this, compilation fails
    with a scoped-VMEM OOM, measured at 25.1 MB for tile 2048 × C 512).
    """
    if tile_n is not None:
        return min(tile_n, n)
    budget = 12 * 1024 * 1024 - 8 * k * c
    per_row = 16 * c + 8 * k
    cap = max(8, min(2048, budget // per_row, n))
    for t in range(cap - cap % 8, 0, -8):
        if n % t == 0:
            return t
    for t in range(min(cap, n), 0, -1):  # tiny/odd N fallback
        if n % t == 0:
            return t
    return n


def vq_assign_fused(
    embed: jax.Array, flat: jax.Array, tile_n: Optional[int] = None
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Fused assign: flat (N,C) × embed (K,C) → (ids (N,), quantized (N,C),
    counts (K,), sums (K,C)). The feature tile size auto-adapts to the
    scoped-VMEM budget (see `_pick_tile`); pass `tile_n` to override.
    """
    n, c = flat.shape
    k = embed.shape[0]
    tile = _pick_tile(n, c, k, tile_n)
    assert n % tile == 0, (n, tile)
    # off-TPU (tests, CPU smoke) run the kernel in interpreter mode
    interpret = jax.default_backend() != "tpu"

    flat = flat.astype(jnp.float32)
    embed = embed.astype(jnp.float32)
    esq = jnp.sum(embed * embed, axis=1)[None, :]  # (1, K)

    grid = (n // tile,)
    ids, quant, counts, sums = pl.pallas_call(
        _vq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 1), jnp.int32),
            jax.ShapeDtypeStruct((n, c), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((k, c), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * k * 2,
            bytes_accessed=n * c * 4 * 2 + k * c * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(flat, embed, esq)
    return ids[:, 0], quant, counts[0], sums


def vq_apply_fused(
    state: VQState,
    x: jax.Array,
    *,
    momentum: float = 0.99,
    eps: float = 1e-5,
    train: bool = True,
    axis_name: Optional[str] = None,
    tile_n: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array, VQState]:
    """Drop-in fused replacement for `ops.vq.vq_apply` (same contract)."""
    k, c = state.embed.shape
    b, h, w, cc = x.shape
    assert cc == c

    flat = jax.lax.stop_gradient(x.reshape(-1, c).astype(jnp.float32))
    ids_flat, quant_flat, counts, sums = vq_assign_fused(
        state.embed, flat, tile_n=tile_n
    )
    ids = ids_flat.reshape(b, h, w)
    quantized = quant_flat.reshape(b, h, w, c).astype(x.dtype)

    commit_loss = jnp.mean(
        (x.astype(jnp.float32) - jax.lax.stop_gradient(quantized).astype(jnp.float32))
        ** 2
    )
    quantized_st = straight_through(jax.lax.stop_gradient(quantized), x)

    if train:
        if axis_name is not None:
            counts = jax.lax.pmean(counts, axis_name)
            sums = jax.lax.pmean(sums, axis_name)
        cluster_size = _ema(state.cluster_size, counts, momentum)
        embed_avg = _ema(state.embed_avg, sums, momentum)
        n = jnp.sum(cluster_size)
        smoothed = n * (cluster_size + eps) / (n + k * eps)
        embed = embed_avg / smoothed[:, None]
        new_state = VQState(embed=embed, cluster_size=cluster_size, embed_avg=embed_avg)
    else:
        new_state = state

    return quantized_st, commit_loss, ids, new_state
