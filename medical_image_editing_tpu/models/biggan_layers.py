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

from .blocks import nearest_upsample

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
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, train: bool = True):
        dense = nn.Dense(self.features, use_bias=self.use_bias, kernel_init=_ortho_init)
        return nn.SpectralNorm(dense)(x, update_stats=train)


class SNEmbed(nn.Module):
    """Spectral-normalized embedding. Spec: `layers.py:125-138`.

    The reference runs its SN base class over the (num_embeddings, dim) weight
    with u of shape (1, num_embeddings) — the *row* count is the "output" dim,
    the opposite orientation from flax `nn.SpectralNorm` (which takes the last
    axis). The one power-iteration step is written out here to keep torch's
    orientation, so a transplanted `u0` reproduces the reference bit-for-bit:
    v = normalize(uW); u' = normalize(vWᵀ); σ = vWᵀu'ᵀ (grad flows through W
    only, u/v are buffers); rows of W/σ are gathered by the integer labels.
    """

    num_embeddings: int
    features: int
    eps: float = 1e-12

    @nn.compact
    def __call__(self, y, train: bool = True):
        w = self.param(
            "embedding", _ortho_init, (self.num_embeddings, self.features)
        )
        u_var = self.variable(
            "batch_stats",
            "u",
            lambda: jax.random.normal(
                self.make_rng("params"), (1, self.num_embeddings)
            ),
        )
        sigma_var = self.variable("batch_stats", "sigma", lambda: jnp.ones(()))

        w_det = jax.lax.stop_gradient(w)
        v = u_var.value @ w_det  # (1, features)
        v = v / jnp.maximum(jnp.linalg.norm(v), self.eps)
        u_new = v @ w_det.T  # (1, num_embeddings)
        u_new = u_new / jnp.maximum(jnp.linalg.norm(u_new), self.eps)
        sigma = jnp.squeeze(v @ w.T @ u_new.T)  # grad through w
        if train and not self.is_initializing():
            u_var.value = u_new
            sigma_var.value = jax.lax.stop_gradient(sigma)
        return jnp.take(w / sigma, y, axis=0)


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


class CCBN(nn.Module):
    """Class-conditional BatchNorm. Spec: `layers.py:280-335` (ccbn).

    Normalizes x (param-free), then modulates with per-sample gain/bias
    computed from the conditioning vector y: out = norm(x)·(1 + gain(y)) +
    bias(y). Head flavors follow the reference Generator's `which_bn` wiring
    (`unet_discriminator.py:194-210`):
      * self_modulation (unconditional G): 2-layer plain-Dense MLP heads,
      * 'sn' (conditional, shared embedding): bias-free SNLinear heads,
      * 'embed' (conditional, unshared): plain Embedding heads on int labels.
    norm_style 'bn' uses batch stats in train / running stats in eval with the
    reference's hardcoded 0.1 momentum (`:322-323` — it ignores the ctor's
    momentum; flax momentum 0.9 ≡ torch 0.1). Divergences (documented): torch
    stores the *unbiased* batch variance in its running buffer while flax
    stores biased (train-mode outputs are identical); the reference's 'gn'
    branch crashes on a `self.normstyle` typo (`:328`) — here it works, with
    groups parsed from 'gn_grp_N' / 'gn_ch_N' / 16 by default (`:262-273`).
    """

    features: int
    linear_type: str = "sn"  # 'sn' | 'embed' (ignored when self_modulation)
    n_classes: int = 0
    norm_style: str = "bn"
    eps: float = 1e-5
    self_modulation: bool = False

    @nn.compact
    def __call__(self, x, y, train: bool = True):
        if self.self_modulation:
            in_dim = y.shape[-1]
            g = nn.Dense(in_dim, kernel_init=_ortho_init)(y)
            g = nn.Dense(self.features, use_bias=False, kernel_init=_ortho_init)(
                nn.relu(g)
            )
            b = nn.Dense(in_dim, kernel_init=_ortho_init)(y)
            b = nn.Dense(self.features, use_bias=False, kernel_init=_ortho_init)(
                nn.relu(b)
            )
        elif self.linear_type == "sn":
            g = SNDense(self.features, use_bias=False)(y, train)
            b = SNDense(self.features, use_bias=False)(y, train)
        elif self.linear_type == "embed":
            g = nn.Embed(self.n_classes, self.features, embedding_init=_ortho_init)(y)
            b = nn.Embed(self.n_classes, self.features, embedding_init=_ortho_init)(y)
        else:  # pragma: no cover
            raise ValueError(f"unknown linear_type {self.linear_type!r}")
        gain = (1.0 + g)[:, None, None, :]
        bias = b[:, None, None, :]

        if self.norm_style == "bn":
            h = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=self.eps,
                use_bias=False,
                use_scale=False,
            )(x)
        elif self.norm_style == "in":
            h = self._instance_norm(x, train)
        elif self.norm_style.startswith("gn"):
            if "ch" in self.norm_style:
                groups = max(x.shape[-1] // int(self.norm_style.split("_")[-1]), 1)
            elif "grp" in self.norm_style:
                groups = int(self.norm_style.split("_")[-1])
            else:
                groups = 16
            h = nn.GroupNorm(
                num_groups=groups, epsilon=self.eps, use_bias=False, use_scale=False
            )(x)
        elif self.norm_style == "nonorm":
            h = x
        else:  # pragma: no cover
            raise ValueError(f"unknown norm_style {self.norm_style!r}")
        return h * gain + bias

    def _instance_norm(self, x, train: bool):
        """F.instance_norm with running stats (`:325-326`): per-sample spatial
        stats in train (running buffers updated with the batch mean of the
        per-instance stats, variance unbiased as torch stores it); running
        stats in eval."""
        ra_mean = self.variable(
            "batch_stats", "in_mean", lambda: jnp.zeros((self.features,))
        )
        ra_var = self.variable(
            "batch_stats", "in_var", lambda: jnp.ones((self.features,))
        )
        if train:
            mean = jnp.mean(x, axis=(1, 2), keepdims=True)  # (B,1,1,C)
            var = jnp.var(x, axis=(1, 2), keepdims=True)
            if not self.is_initializing():
                n = x.shape[1] * x.shape[2]
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = 0.9 * ra_mean.value + 0.1 * jnp.mean(
                    mean, axis=(0, 1, 2)
                )
                ra_var.value = 0.9 * ra_var.value + 0.1 * jnp.mean(
                    unbiased, axis=(0, 1, 2)
                )
        else:
            mean = ra_mean.value[None, None, None, :]
            var = ra_var.value[None, None, None, :]
        return (x - mean) * jax.lax.rsqrt(var + self.eps)


class GBlockCond(nn.Module):
    """BigGAN generator residual block (class-conditional BN). Spec:
    `layers.py:381-414` (GBlock): bn1→act→[2× nearest up]→conv1→bn2→act→conv2
    with a 1×1 shortcut when channels change or upsampling."""

    features: int
    upsample: bool = False
    linear_type: str = "sn"
    n_classes: int = 0
    norm_style: str = "bn"
    self_modulation: bool = False
    activation: Callable = nn.relu

    @nn.compact
    def __call__(self, x, y, train: bool = True):
        in_ch = x.shape[-1]
        learnable_sc = (in_ch != self.features) or self.upsample
        ccbn = lambda feat: CCBN(
            feat,
            linear_type=self.linear_type,
            n_classes=self.n_classes,
            norm_style=self.norm_style,
            self_modulation=self.self_modulation,
        )
        h = self.activation(ccbn(in_ch)(x, y, train))
        if self.upsample:
            h = nearest_upsample(h)
            x = nearest_upsample(x)
        h = SNConv(self.features, 3)(h, train)
        h = self.activation(ccbn(self.features)(h, y, train))
        h = SNConv(self.features, 3)(h, train)
        if learnable_sc:
            x = SNConv(self.features, 1)(x, train)
        return h + x


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
            h = nearest_upsample(h)
            x = nearest_upsample(x)
        h = SNConv(self.features, 3)(h, train)
        h = SNConv(self.features, 3)(self.activation(h), train)
        if learnable_sc:
            x = SNConv(self.features, 1)(x, train)
        return h + x if self.skip_connection else h
