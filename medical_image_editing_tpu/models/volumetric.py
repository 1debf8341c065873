"""3-D volumetric VQ-WNet (stretch design — BASELINE.json config #5:
"128³ CT volumes with sharded codebook + spatial partitioning").

No reference counterpart exists (the reference is strictly 2-D slices;
SURVEY.md §5 notes 3-D needs *new* spatial sharding designed from scratch).
Design:

* NDHWC layout; 3×3×3 convs; a 3-level U-Net encoder producing full-resolution
  features quantized by the same functional `VQState` machinery as 2-D (the
  codebook is tiny — replicated, with `pmean`'d EMA statistics; "sharded
  codebook" reduces to sharded *assignment work*, which is what dominates), and
  a mirrored decoder with skip connections and Tanh output.
* Spatial partitioning via GSPMD: the train/eval step annotates activations
  with `with_sharding_constraint(P('data', 'spatial'))` over a 2-D mesh —
  batch over 'data', volume DEPTH over 'spatial' — and XLA's SPMD partitioner
  inserts the halo exchanges 3-D convolutions need at shard boundaries
  automatically (the scaling-book recipe: annotate, let XLA insert
  collectives). No hand-rolled halo code.
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.vq import VQState, vq_apply


def instance_norm_3d(x, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 2, 3), keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class DoubleConv3D(nn.Module):
    features: int
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x):
        for _ in range(2):
            x = nn.Conv(self.features, (3, 3, 3), padding="SAME", dtype=self.dtype)(x)
            x = nn.relu(instance_norm_3d(x))
        return x


class ResBlock3D(nn.Module):
    features: int
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, x):
        identity = instance_norm_3d(
            nn.Conv(self.features, (1, 1, 1), use_bias=False, dtype=self.dtype)(x)
        )
        out = DoubleConv3D(self.features, dtype=self.dtype)(x)
        out = nn.relu(out + identity)
        pooled = nn.max_pool(out, (2, 2, 2), strides=(2, 2, 2))
        return pooled, out


class UpBlock3D(nn.Module):
    features: int
    dtype: Optional[object] = None

    @nn.compact
    def __call__(self, down_input, skip_input):
        x = down_input
        for axis in (1, 2, 3):
            x = jnp.repeat(x, 2, axis=axis)
        x = jnp.concatenate([x, skip_input.astype(x.dtype)], axis=-1)
        return DoubleConv3D(self.features, dtype=self.dtype)(x)


def _blocks(use_remat: bool):
    """Per-block rematerialization seam (the 128³ memory plan, PERF.md):
    `nn.remat` drops each block's internal activations on the forward pass and
    recomputes them during backward — peak HBM then scales with the number of
    LEVELS' boundary tensors instead of every conv's output. `nn.remat`
    renames the wrapped class ("CheckpointResBlock3D"), which would silently
    change param paths AND init RNG streams — so the U-Nets below pass the
    plain classes' auto-names explicitly, keeping remat a runtime choice, not
    a checkpoint-format choice (pinned by
    tests/test_volumetric.py::test_volumetric_remat_matches_plain)."""
    if use_remat:
        return nn.remat(ResBlock3D), nn.remat(DoubleConv3D), nn.remat(UpBlock3D)
    return ResBlock3D, DoubleConv3D, UpBlock3D


def _unet3d_body(mod, x):
    """Shared encoder/decoder U-Net body with remat-stable explicit names
    (matching the auto-names flax would generate without remat)."""
    Res, Double, Up = _blocks(mod.use_remat)
    f = mod.filters
    n = len(f) - 1
    x = x.astype(mod.dtype or x.dtype)
    skips = []
    for i in range(n):
        x, skip = Res(f[i], dtype=mod.dtype, name=f"ResBlock3D_{i}")(x)
        skips.append(skip)
    x = Double(f[n], dtype=mod.dtype, name="DoubleConv3D_0")(x)
    for j, i in enumerate(reversed(range(n))):
        x = Up(f[i], dtype=mod.dtype, name=f"UpBlock3D_{j}")(x, skips[i])
    return x


class VolumetricUNetEncoder(nn.Module):
    """x (B,D,H,W,in) → features (B,D,H,W,filters[0])."""

    filters: Sequence[int] = (8, 16, 32, 64)
    dtype: Optional[object] = None
    use_remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        return _unet3d_body(self, x)


class VolumetricUNetDecoder(nn.Module):
    """Quantized embedding (B,D,H,W,C) → volume reconstruction."""

    out_channels: int = 1
    filters: Sequence[int] = (8, 16, 32, 64)
    dtype: Optional[object] = None
    use_remat: bool = False

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = _unet3d_body(self, x)
        x = nn.Conv(self.out_channels, (1, 1, 1), dtype=self.dtype)(x)
        return jnp.tanh(x.astype(jnp.float32))


def volumetric_forward(
    encoder: VolumetricUNetEncoder,
    decoder: VolumetricUNetDecoder,
    enc_vars,
    dec_vars,
    vq_state: VQState,
    volume,
    *,
    momentum: float = 0.99,
    train: bool = True,
    axis_name: Optional[str] = None,
):
    """encode → VQ (voxels flattened) → decode.

    Returns (recon, commit, ids(B,D,H,W)+1, new_vq). With `axis_name` the EMA
    statistics are pmean'd over the DATA axis only — the 'spatial' axis shards
    voxels of the same replica, whose statistics XLA already sums when the
    flattened assignment is computed under GSPMD.
    """
    feats = encoder.apply(enc_vars, volume, train=train)
    b, d, h, w, c = feats.shape
    q, commit, ids, new_vq = vq_apply(
        vq_state,
        feats.reshape(b, d * h, w, c),  # reuse the 2-D contract
        momentum=momentum,
        train=train,
        axis_name=axis_name,
    )
    q = q.reshape(b, d, h, w, c)
    ids = ids.reshape(b, d, h, w) + 1
    recon = decoder.apply(dec_vars, q, train=train)
    return recon, commit, ids, new_vq
