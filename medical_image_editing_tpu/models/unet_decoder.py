"""SPADE-styled U-Net decoder reconstructing the image from the quantized
full-resolution embedding.

Behavioral spec: reference `src/networks/unet_decoder.py` — a second U-Net that
re-encodes the (quantized) embedding down 4 levels and decodes with
`StyledResUpBlock`s where the skip connections act as the SPADE style input
(`:69-76,150-157`); `dropped_skip_layers` zeroes selected skips (`:152-153`);
optional DropBlock on the surviving skips (`:133,155`); two heads:
  * default: residual ASPP head — `out = x + ASPP→DoubleConv(x)`, 1×1 conv,
    Tanh (`:101-105,159-163`);
  * `use_last_pixel_shuffle`: multi-scale aggregation — every up-level output
    is PixelShuffled to full resolution and concatenated before a 1×1 conv
    (`:66-86,126-147`).

DropBlock's drop probability is scheduled per epoch outside the jitted step
(`dropblock_schedule`) and passed in as a traced scalar; the Bernoulli draw
uses the module's 'dropblock' RNG stream.
"""

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.dropblock import dropblock_2d
from .blocks import ASPP, DoubleConv, ResBlock, StyledResUpBlock, pixel_shuffle


class UNetDecoder(nn.Module):
    out_channels: int = 1
    filters: Sequence[int] = (64, 128, 256, 512, 1024)
    use_dropblock: bool = False
    block_size: int = 30
    # default (5, 6) is reference parity: its up loop also enumerates only
    # 0..len(filters)-2, so the stock default drops nothing there either
    # (`unet_decoder.py:28,150-153`); 0 = deepest skip in both.
    dropped_skip_layers: Sequence[int] = (5, 6)
    use_pixel_shuffle: bool = True
    use_last_pixel_shuffle: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[object] = None  # compute dtype; params stay float32

    @nn.compact
    def __call__(self, x, train: bool = True, drop_prob=0.0):
        f = list(self.filters)
        n_levels = len(f) - 1

        x = x.astype(self.dtype or x.dtype)
        skips = []
        for i in range(n_levels):
            x, skip = ResBlock(f[i], dtype=self.dtype)(x)
            skips.append(skip)
        x = DoubleConv(f[n_levels], dtype=self.dtype)(x)
        skips.reverse()

        xs = []
        for i in range(n_levels):
            skip = skips[i]
            if i in self.dropped_skip_layers:
                skip = jnp.zeros_like(skip)
            elif self.use_dropblock and train:
                skip = dropblock_2d(
                    self.make_rng("dropblock"), skip, drop_prob, self.block_size
                )
            level = n_levels - 1 - i  # filters index for this up block
            x = StyledResUpBlock(
                f[level],
                use_pixel_shuffle=self.use_pixel_shuffle,
                axis_name=self.axis_name,
                dtype=self.dtype,
            )(x, skip, train)
            xs.append(x)

        if self.use_last_pixel_shuffle:
            outs = []
            for i, xi in enumerate(xs):
                level = n_levels - 1 - i
                if level > 0:
                    y = nn.Conv((4**level) * f[0], (3, 3), padding="SAME",
                                dtype=self.dtype)(xi)
                    y = pixel_shuffle(y, 2**level)
                else:
                    y = xi
                outs.append(y)
            outs.reverse()
            out = jnp.concatenate(outs, axis=-1)
            out = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(out)
        else:
            head = ASPP(f[0], rates=(2, 6, 12, 18), dtype=self.dtype)(x)
            head = DoubleConv(f[0], dtype=self.dtype)(head)
            out = x + head
            out = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(out)

        # final activation in float32 (the loss dtype)
        return jnp.tanh(out.astype(jnp.float32))
