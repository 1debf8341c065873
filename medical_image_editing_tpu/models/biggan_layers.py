"""BigGAN-style building blocks for the U-Net GAN discriminator.

Behavioral spec: reference `src/networks/biggan/layers.py` (vendored from
ajbrock/BigGAN-PyTorch): spectral-normalized conv/linear (power iteration,
1 step), the SA-GAN non-local Attention block (`:147-172`), `DBlock`
(`:464-506`) and `GBlock2` (`:418-461`) residual blocks.

TPU-first: spectral norm uses `flax.linen.SpectralNorm` — the power-iteration
u/v vectors live in the 'batch_stats' collection and update when
`update_stats=True` (the functional form of the reference's in-forward buffer
mutation, SURVEY.md §7 "spectral norm as state"). Attention's (HW×HW/4) map is
two MXU matmuls; layouts NHWC. Init: orthogonal for conv/linear kernels
(reference D_init='ortho', `unet_discriminator.py:530-542`).
"""

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

_ortho_init = nn.initializers.orthogonal()


class SNConv(nn.Module):
    """Spectral-normalized conv, orthogonal init. Spec: `layers.py:97-109`."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        k = self.kernel_size
        pad = k // 2
        conv = nn.Conv(
            self.features,
            (k, k),
            padding=[(pad, pad), (pad, pad)],
            use_bias=self.use_bias,
            kernel_init=_ortho_init,
        )
        return nn.SpectralNorm(conv)(x, update_stats=train)


class SNDense(nn.Module):
    """Spectral-normalized linear. Spec: `layers.py:113-119`."""

    features: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        dense = nn.Dense(self.features, kernel_init=_ortho_init)
        return nn.SpectralNorm(dense)(x, update_stats=train)


class Attention(nn.Module):
    """SA-GAN non-local block. Spec: `layers.py:147-172`.

    theta: C→C/8 full res; phi: C→C/8 + 2× maxpool; g: C→C/2 + 2× maxpool;
    softmax(θᵀφ) attention; o: C/2→C; out = γ·o + x with learnable scalar γ=0.
    """

    @nn.compact
    def __call__(self, x, train: bool = True):
        b, h, w, c = x.shape
        theta = SNConv(c // 8, 1, use_bias=False)(x, train)
        phi = SNConv(c // 8, 1, use_bias=False)(x, train)
        g = SNConv(c // 2, 1, use_bias=False)(x, train)
        pool = lambda t: nn.max_pool(t, (2, 2), strides=(2, 2))
        phi = pool(phi).reshape(b, (h * w) // 4, c // 8)
        g = pool(g).reshape(b, (h * w) // 4, c // 2)
        theta = theta.reshape(b, h * w, c // 8)
        beta = jax.nn.softmax(
            jnp.einsum("bnc,bmc->bnm", theta, phi), axis=-1
        )  # (B, HW, HW/4)
        o = jnp.einsum("bnm,bmc->bnc", beta, g).reshape(b, h, w, c // 2)
        o = SNConv(c, 1, use_bias=False)(o, train)
        gamma = self.param("gamma", nn.initializers.zeros, ())
        return gamma * o + x


class DBlock(nn.Module):
    """BigGAN discriminator residual block. Spec: `layers.py:464-506`."""

    features: int
    wide: bool = True
    preactivation: bool = False
    downsample: bool = False
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_ch = x.shape[-1]
        hidden = self.features if self.wide else in_ch
        learnable_sc = (in_ch != self.features) or self.downsample

        h = nn.relu(x) if self.preactivation else x
        h = SNConv(hidden, 3)(h, train)
        h = SNConv(self.features, 3)(self.activation(h), train)
        if self.downsample:
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))

        sc = x
        if self.preactivation:
            if learnable_sc:
                sc = SNConv(self.features, 1)(sc, train)
            if self.downsample:
                sc = nn.avg_pool(sc, (2, 2), strides=(2, 2))
        else:
            if self.downsample:
                sc = nn.avg_pool(sc, (2, 2), strides=(2, 2))
            if learnable_sc:
                sc = SNConv(self.features, 1)(sc, train)
        return h + sc


class GBlock2(nn.Module):
    """Decoder-side residual block (no BN variant). Spec: `layers.py:418-461`."""

    features: int
    upsample: bool = False
    skip_connection: bool = True
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x, train: bool = True):
        in_ch = x.shape[-1]
        learnable_sc = (in_ch != self.features) or self.upsample

        h = self.activation(x)
        if self.upsample:
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        h = SNConv(self.features, 3)(h, train)
        h = SNConv(self.features, 3)(self.activation(h), train)
        if learnable_sc:
            x = SNConv(self.features, 1)(x, train)
        return h + x if self.skip_connection else h
