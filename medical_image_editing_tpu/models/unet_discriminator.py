"""BigGAN-based U-Net GAN discriminator.

Behavioral spec: reference `src/networks/unet_discriminator.py` (from
boschresearch/unetgan): `D_unet_arch` channel tables for 128/256/512
(`:350-383`), a down path of `DBlock`s and an up path of `GBlock2`s with skip
concatenations (`:544-589` wiring), three outputs (`:594-627`):
  * per-pixel decision map (B,H,W,1) from a 1×1 conv,
  * global bottleneck logit via sum-pool + SN linear (`linear_middle`),
  * the list of decoder-side features for the "unet_perceptual"
    feature-matching loss.

Unconditional mode (projection == 0) matches the trainers' usage
(`src/trainers/base.py:241-247`, unconditional=True) and is the default.
Class-conditional projection discrimination (`:499-501` embeddings, `:605-623`
projections) is available via `n_classes > 0`: pass integer labels `y` and the
bottleneck logit gains ⟨embed_middle(y), pooled⟩ while the pixel map gains the
per-pixel channel projection ⟨embed(y), h⟩.

Divergence (documented): the reference defines `output_features` only for
resolution 512, so its forward crashes at 128/256 (`:424-428` vs `:594-595`);
here decoder features are collected for every resolution. Attention placement
follows the reference: only on down-path blocks whose resolution matches
`D_attn` (attention_condition index<5, `:477-481`).
"""

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .biggan_layers import Attention, DBlock, GBlock2, SNDense, SNEmbed

_ortho_init = nn.initializers.orthogonal()


def d_unet_arch(resolution: int, ch: int):
    """Channel schedule per resolution. Spec: `unet_discriminator.py:350-383`."""
    if resolution == 128:
        out_mult = [1, 2, 4, 8, 16, 8, 4, 2, 1, 1]
        down = [True] * 5 + [False] * 5
        up = [False] * 5 + [True] * 5
        res = [64, 32, 16, 8, 4, 8, 16, 32, 64, 128]
        skip_at = {6: 4, 7: 3, 8: 2, 9: 1}
    elif resolution == 256:
        out_mult = [1, 2, 4, 8, 8, 16, 8, 8, 4, 2, 1, 1]
        down = [True] * 6 + [False] * 6
        up = [False] * 6 + [True] * 6
        res = [128, 64, 32, 16, 8, 4, 8, 16, 32, 64, 128, 256]
        skip_at = {7: 5, 8: 4, 9: 3, 10: 2, 11: 1}
    elif resolution == 512:
        out_mult = [1, 2, 4, 8, 8, 8, 16, 8, 8, 8, 4, 2, 1, 1]
        down = [True] * 7 + [False] * 7
        up = [False] * 7 + [True] * 7
        res = [256, 128, 64, 32, 16, 8, 4, 8, 16, 32, 64, 128, 256, 512]
        skip_at = {8: 6, 9: 5, 10: 4, 11: 3, 12: 2, 13: 1}
    else:
        raise ValueError(f"unsupported resolution {resolution}")
    return {
        "out_channels": [m * ch for m in out_mult],
        "downsample": down,
        "upsample": up,
        "resolution": res,
        "skip_at": skip_at,
    }


class UNetDiscriminator(nn.Module):
    """x (B,res,res,C) → (pixel_map (B,res,res,1), bottleneck (B,1), features).

    Constructor surface mirrors `Unet_Discriminator.__init__`
    (`unet_discriminator.py:385-393`): D_ch width, D_wide, D_attn resolutions,
    resolution ∈ {128, 256, 512}.
    """

    D_ch: int = 64
    D_wide: bool = True
    D_attn: str = "64"
    resolution: int = 512
    output_dim: int = 1
    n_classes: int = 0  # 0 = unconditional (trainer usage); >0 = projection-D

    @nn.compact
    def __call__(
        self, x, train: bool = True, *, y=None
    ) -> Tuple[jax.Array, jax.Array, list]:
        # y is keyword-only (the reference's `forward(x, y)` order would shadow
        # the positional train flag every existing trainer call site passes)
        if self.n_classes > 0 and y is None:
            raise ValueError("conditional UNetDiscriminator (n_classes>0) needs labels y")
        arch = d_unet_arch(self.resolution, self.D_ch)
        attn_res = {int(s) for s in str(self.D_attn).split("_")}

        n_down = sum(arch["downsample"])
        residual_features = [x]
        features_out = []
        bottleneck_out = None

        h = x
        for index in range(len(arch["out_channels"])):
            if index in arch["skip_at"]:
                h = jnp.concatenate(
                    [h, residual_features[arch["skip_at"][index]]], axis=-1
                )

            if arch["downsample"][index]:
                h = DBlock(
                    arch["out_channels"][index],
                    wide=self.D_wide,
                    preactivation=index > 0,
                    downsample=True,
                )(h, train)
            else:
                h = GBlock2(
                    arch["out_channels"][index], upsample=True, skip_connection=True
                )(h, train)
                features_out.append(h)

            # attention only on early down blocks (spec `:477-481`)
            if arch["resolution"][index] in attn_res and index < 5:
                h = Attention()(h, train)
                if not arch["downsample"][index]:
                    features_out[-1] = h

            if arch["downsample"][index] and index < n_down - 1:
                residual_features.append(h)

            if index == n_down - 1:
                # global sum pooling + SN linear bottleneck logit (`:600-612`)
                pooled = jnp.sum(nn.relu(h), axis=(1, 2))
                bottleneck_out = SNDense(self.output_dim)(pooled, train)
                if self.n_classes > 0:
                    # projection onto the class embedding (`:608-612`)
                    emb_mid = SNEmbed(self.n_classes, 16 * self.D_ch)(y, train)
                    bottleneck_out = bottleneck_out + jnp.sum(
                        emb_mid * pooled, axis=1, keepdims=True
                    )

        pixel_map = nn.Conv(1, (1, 1), kernel_init=_ortho_init)(h)
        if self.n_classes > 0:
            # per-pixel channel projection onto the class embedding (`:618-623`)
            emb = SNEmbed(self.n_classes, h.shape[-1])(y, train)
            pixel_map = pixel_map + jnp.sum(
                emb[:, None, None, :] * h, axis=-1, keepdims=True
            )
        return pixel_map, bottleneck_out, features_out
