"""VQGAN alternative autoencoder (taming-transformers style).

Behavioral spec: reference `src/networks/vqgan.py` — swish nonlinearity +
GroupNorm(32, eps 1e-6) (`:10-19`), ResnetBlock (`:61-122`), single-head
spatial AttnBlock with 1/√C scaling (`:125-180`), downsampling Encoder with a
ch-multiplier schedule and mid attention (`:183-281`), mirrored Decoder
(`:284-380`); `VQGAN.forward` = enc → VQ → dec returning
(recon, commit, ids, emb) (`:435-439`); `generate_image_from_ids` decodes a
codebook lookup directly (`:441-446`). Defaults: emb_dim 512, dict 64,
resolution 512 (`:385-400`).

TPU-first: NHWC; attention materializes the (HW×HW) matrix only at the
configured attention resolutions (default ≤16² — a 256×256 MXU matmul); the VQ
codebook is the same functional `VQState` as the U-Net path, with `psum`'d EMA
statistics under a mesh axis. The `ids` the VQGAN returns are raw 0-based
codes at the bottleneck resolution (the reference returns the VQ module's raw
ids here — no +1 offset, unlike UNetEncoder; parity preserved).
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.vq import VQState, vq_apply, vq_lookup


def swish(x):
    return x * jax.nn.sigmoid(x)


def _norm(x):
    # GroupNorm(32, eps 1e-6) per the reference (`vqgan.py:15-19`); for widths
    # not divisible by 32 (tiny test configs) fall back to the largest divisor.
    import math

    c = x.shape[-1]
    groups = 32 if c % 32 == 0 else math.gcd(c, 32)
    return nn.GroupNorm(num_groups=groups, epsilon=1e-6)(x)


class ResnetBlock(nn.Module):
    """GN-swish-conv ×2 with dropout and (1×1 or 3×3) shortcut on channel
    change. Spec: `vqgan.py:61-122`."""

    features: int
    use_conv_shortcut: bool = False
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_ch = x.shape[-1]
        h = nn.Conv(self.features, (3, 3), padding="SAME")(swish(_norm(x)))
        h = swish(_norm(h))
        if self.p_dropout > 0:
            h = nn.Dropout(self.p_dropout, deterministic=not train)(h)
        h = nn.Conv(self.features, (3, 3), padding="SAME")(h)
        if in_ch != self.features:
            k = (3, 3) if self.use_conv_shortcut else (1, 1)
            x = nn.Conv(self.features, k, padding="SAME")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention. Spec: `vqgan.py:125-180`."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = _norm(x)
        q = nn.Conv(c, (1, 1))(hn).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1))(hn).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1))(hn).reshape(b, h * w, c)
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k) * (c ** -0.5), axis=-1
        )
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1))(out)
        return x + out


class Downsample(nn.Module):
    """stride-2: 3×3 conv with asymmetric (0,1) pad, or avg-pool.
    Spec: `vqgan.py:40-58`."""

    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            return nn.Conv(
                x.shape[-1], (3, 3), strides=(2, 2), padding=[(0, 1), (0, 1)]
            )(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class Upsample(nn.Module):
    """2× nearest + optional 3×3 conv. Spec: `vqgan.py:22-37`."""

    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.with_conv:
            x = nn.Conv(x.shape[-1], (3, 3), padding="SAME")(x)
        return x


class VQGANEncoder(nn.Module):
    """Spec: `vqgan.py:183-281`."""

    mid_channels: int
    out_channels: int
    ch_multiplier: Sequence[int]
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    resolution: int
    p_dropout: float = 0.0
    resamp_with_conv: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = nn.Conv(self.mid_channels, (3, 3), padding="SAME")(x)
        curr_res = self.resolution
        n_levels = len(self.ch_multiplier)
        for i_level in range(n_levels):
            block_out = self.mid_channels * self.ch_multiplier[i_level]
            for _ in range(self.num_res_blocks):
                h = ResnetBlock(block_out, p_dropout=self.p_dropout)(h, train)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock()(h)
            if i_level != n_levels - 1:
                h = Downsample(self.resamp_with_conv)(h)
                curr_res //= 2
        h = ResnetBlock(h.shape[-1], p_dropout=self.p_dropout)(h, train)
        h = AttnBlock()(h)
        h = ResnetBlock(h.shape[-1], p_dropout=self.p_dropout)(h, train)
        h = swish(_norm(h))
        return nn.Conv(self.out_channels, (3, 3), padding="SAME")(h)


class VQGANDecoder(nn.Module):
    """Spec: `vqgan.py:284-380`."""

    mid_channels: int
    out_channels: int
    ch_multiplier: Sequence[int]
    num_res_blocks: int
    attn_resolutions: Sequence[int]
    resolution: int
    p_dropout: float = 0.0
    resamp_with_conv: bool = True

    @nn.compact
    def __call__(self, z, train: bool = True):
        n_levels = len(self.ch_multiplier)
        block_in = self.mid_channels * self.ch_multiplier[-1]
        curr_res = self.resolution // 2 ** (n_levels - 1)

        h = nn.Conv(block_in, (3, 3), padding="SAME")(z)
        h = ResnetBlock(block_in, p_dropout=self.p_dropout)(h, train)
        h = AttnBlock()(h)
        h = ResnetBlock(block_in, p_dropout=self.p_dropout)(h, train)

        for i_level in reversed(range(n_levels)):
            block_out = self.mid_channels * self.ch_multiplier[i_level]
            for _ in range(self.num_res_blocks):
                h = ResnetBlock(block_out, p_dropout=self.p_dropout)(h, train)
                if curr_res in self.attn_resolutions:
                    h = AttnBlock()(h)
            if i_level != 0:
                h = Upsample(self.resamp_with_conv)(h)
                curr_res *= 2

        h = swish(_norm(h))
        return nn.Conv(self.out_channels, (3, 3), padding="SAME")(h)


class VQGAN(nn.Module):
    """Constructor surface mirrors `vqgan.py:385-433`; VQ state is external.

    `__call__(variables-bound x, vq_state)` → (recon, commit, ids, emb, vq').
    """

    in_channels: int = 1
    mid_channels: int = 32
    out_channels: int = 1
    emb_dim: int = 512
    dict_size: int = 64
    enc_ch_multiplier: Sequence[int] = (1, 2, 4, 8, 16, 32)
    dec_ch_multiplier: Sequence[int] = (1, 1, 2, 4, 8, 16)
    num_res_blocks: int = 2
    enc_attn_resolutions: Sequence[int] = ()
    dec_attn_resolutions: Sequence[int] = (16,)
    resolution: int = 512
    p_dropout: float = 0.0
    resamp_with_conv: bool = True
    vq_momentum: float = 0.99
    vq_eps: float = 1e-5
    axis_name: Optional[str] = None
    # same backend seam as EncoderWithVQ (reference knn_backend,
    # `vq_module.py:117-121`); the fused Pallas kernel auto-tiles for this
    # model's wide emb_dim (tools/bench_vq.py)
    knn_backend: str = "xla"

    def setup(self):
        self.encoder = VQGANEncoder(
            mid_channels=self.mid_channels,
            out_channels=self.emb_dim,
            ch_multiplier=tuple(self.enc_ch_multiplier),
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=tuple(self.enc_attn_resolutions),
            resolution=self.resolution,
            p_dropout=self.p_dropout,
            resamp_with_conv=self.resamp_with_conv,
        )
        self.decoder = VQGANDecoder(
            mid_channels=self.mid_channels,
            out_channels=self.out_channels,
            ch_multiplier=tuple(self.dec_ch_multiplier),
            num_res_blocks=self.num_res_blocks,
            attn_resolutions=tuple(self.dec_attn_resolutions),
            resolution=self.resolution,
            p_dropout=self.p_dropout,
            resamp_with_conv=self.resamp_with_conv,
        )

    def __call__(
        self, x, vq_state: VQState, train: bool = True
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, VQState]:
        """Spec: `vqgan.py:435-439`."""
        z = self.encoder(x, train)
        emb, commit, ids, new_vq = vq_apply(
            vq_state,
            z,
            momentum=self.vq_momentum,
            eps=self.vq_eps,
            train=train,
            axis_name=self.axis_name,
            backend=self.knn_backend,
        )
        recon = self.decoder(emb, train)
        return recon, commit, ids, emb, new_vq

    def generate_image_from_ids(self, ids, vq_state: VQState, train: bool = False):
        """Decode a painted bottleneck id map. Spec: `vqgan.py:441-446`."""
        emb = vq_lookup(vq_state, ids.astype(jnp.int32))
        return self.decoder(emb, train)
