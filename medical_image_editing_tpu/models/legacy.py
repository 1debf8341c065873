"""Legacy model family: VQWNet, StyledVQWNet, VQVNet, vanilla UNet.

These are exported by the reference's `networks/__init__.py` but never
instantiated by any trainer/CLI (SURVEY.md §2.3 — pre-encoder/decoder-split
architectures from the paper's development). Included for API completeness,
as working implementations.

Behavioral specs:
  VQWNet       — `src/networks/vqwnet.py`: monolithic "W": U-Net₁ →
                 full-resolution VQ → DropBlock → U-Net₂ → 1×1 conv → Tanh;
                 `freeze_first_half` stops gradients (and the VQ EMA) through
                 the first U-Net (`:96-152`); returns a dict
                 {recon, embed, commit_loss, ids(+1)};
                 `generate_images_from_ids` decodes the second half only.
  StyledVQWNet — `src/networks/styled_vqwnet.py`: second half uses
                 StyledResUpBlocks. NB the reference's
                 `generate_images_from_ids` references nonexistent
                 `self.up_conv2_*` attributes (`:168-171`, dead code); here it
                 works (document-and-diverge).
  VQVNet       — `src/networks/vqvnet.py`: single U-Net + 1×1 conv → VQ;
                 returns {embed, commit_loss, ids} (no reconstruction).
  UNet         — `src/networks/unet.py`: vanilla milesial U-Net with
                 BatchNorm DoubleConvs and a halved-bottleneck `nearest`
                 upsampling variant.

Id maps carry the same +1 background offset as UNetEncoder where the reference
applies it (VQWNet yes, VQVNet no — it only transposes, which is an NCHW
layout artifact and a no-op here; see unet_encoder.py docstring).
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.dropblock import dropblock_2d
from ..ops.vq import VQState, vq_apply, vq_lookup
from .blocks import DoubleConv, ResBlock, StyledResUpBlock, UpBlock


class _UNetHalf(nn.Module):
    """4-down/4-up U-Net returning full-resolution features (the repeated
    sub-structure of the W nets; spec `vqwnet.py:31-42,59-70`)."""

    filters: Sequence[int]
    styled_up: bool = False
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = self.filters
        skips = []
        for i in range(4):
            x, skip = ResBlock(f[i])(x)
            skips.append(skip)
        x = DoubleConv(f[4])(x)
        for i in reversed(range(4)):
            if self.styled_up:
                x = StyledResUpBlock(f[i], axis_name=self.axis_name)(x, skips[i], train)
            else:
                x = UpBlock(f[i])(x, skips[i])
        return x


class VQWNet(nn.Module):
    out_channels: int = 1
    filters: Sequence[int] = (64, 128, 256, 512, 1024)
    use_dropblock: bool = False
    block_size: int = 30
    freeze_first_half: bool = False
    styled_second_half: bool = False  # True → StyledVQWNet
    vq_momentum: float = 0.99
    vq_eps: float = 1e-5
    axis_name: Optional[str] = None

    def setup(self):
        self.first_half = _UNetHalf(self.filters, axis_name=self.axis_name)
        self.second_half = _UNetHalf(
            self.filters, styled_up=self.styled_second_half, axis_name=self.axis_name
        )
        self.conv_last = nn.Conv(self.out_channels, (1, 1))

    def __call__(self, x, vq_state: VQState, train: bool = True, drop_prob=0.0):
        feats = self.first_half(x, train)
        if self.freeze_first_half:
            feats = jax.lax.stop_gradient(feats)

        emb, commit_loss, ids, new_vq = vq_apply(
            vq_state,
            feats,
            momentum=self.vq_momentum,
            eps=self.vq_eps,
            # frozen first half also freezes the codebook (torch eval parity)
            train=train and not self.freeze_first_half,
            axis_name=self.axis_name,
        )
        if self.freeze_first_half:
            emb = jax.lax.stop_gradient(emb)
        embed = emb

        h = emb
        if self.use_dropblock and train:
            h = dropblock_2d(self.make_rng("dropblock"), h, drop_prob, self.block_size)

        h = self.second_half(h, train)
        h = self.conv_last(h)
        return {
            "recon": jnp.tanh(h),
            "embed": embed,
            "commit_loss": commit_loss,
            "ids": ids + 1,
            "vq_state": new_vq,
        }

    def generate_images_from_ids(self, ids, vq_state: VQState, train: bool = False):
        """Second-half decode from a painted id map (0-based ids).
        Spec: `vqwnet.py:154-176`."""
        emb = vq_lookup(vq_state, ids.astype(jnp.int32))
        h = self.second_half(emb, train)
        h = self.conv_last(h)
        return {"recon": jnp.tanh(h), "ids": ids}


def StyledVQWNet(**kwargs) -> VQWNet:
    """Spec: `src/networks/styled_vqwnet.py` — VQWNet with styled up blocks in
    the second half (and a working generate_images_from_ids, unlike the
    reference's `:168-171`)."""
    return VQWNet(styled_second_half=True, **kwargs)


class VQVNet(nn.Module):
    """Single U-Net + 1×1 conv → VQ; no reconstruction. Spec: `vqvnet.py:11-68`."""

    out_channels: int = 64
    filters: Sequence[int] = (64, 128, 256, 512, 1024)
    vq_momentum: float = 0.99
    vq_eps: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, vq_state: VQState, train: bool = True):
        feats = _UNetHalf(self.filters, axis_name=self.axis_name)(x, train)
        feats = nn.Conv(self.out_channels, (1, 1))(feats)
        emb, commit_loss, ids, new_vq = vq_apply(
            vq_state, feats, momentum=self.vq_momentum, eps=self.vq_eps,
            train=train, axis_name=self.axis_name,
        )
        return {"embed": emb, "commit_loss": commit_loss, "ids": ids,
                "vq_state": new_vq}


class _BNDoubleConv(nn.Module):
    """milesial DoubleConv: (Conv-BN-ReLU)×2 with optional mid_channels."""

    features: int
    mid_features: Optional[int] = None
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        mid = self.mid_features or self.features
        for f in (mid, self.features):
            x = nn.Conv(f, (3, 3), padding="SAME", use_bias=False)(x)
            x = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                axis_name=self.axis_name,
            )(x)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    """Vanilla milesial U-Net. Spec: `src/networks/unet.py:86-120`."""

    out_channels: int = 1
    filters: Sequence[int] = (64, 128, 256, 512, 1024)
    nearest: bool = True
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        f = list(self.filters)
        factor = 2 if self.nearest else 1

        def down(x, features):
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
            return _BNDoubleConv(features, axis_name=self.axis_name)(x, train)

        def up(x, skip, features):
            if self.nearest:
                x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
                x = jnp.concatenate([skip, x], axis=-1)
                return _BNDoubleConv(
                    features, mid_features=x.shape[-1] // 2,
                    axis_name=self.axis_name,
                )(x, train)
            x = nn.ConvTranspose(x.shape[-1] // 2, (2, 2), strides=(2, 2))(x)
            x = jnp.concatenate([skip, x], axis=-1)
            return _BNDoubleConv(features, axis_name=self.axis_name)(x, train)

        x1 = _BNDoubleConv(f[0], axis_name=self.axis_name)(x, train)
        x2 = down(x1, f[1])
        x3 = down(x2, f[2])
        x4 = down(x3, f[3])
        x5 = down(x4, f[4] // factor)
        h = up(x5, x4, f[3] // factor)
        h = up(h, x3, f[2] // factor)
        h = up(h, x2, f[1] // factor)
        h = up(h, x1, f[0])
        return nn.Conv(self.out_channels, (1, 1))(h)
