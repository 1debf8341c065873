"""Pix2Pix-style PatchGAN discriminator.

Behavioral spec: reference `src/networks/discriminator.py` (NLayerDiscriminator,
from taming-transformers): 4×4 convs (stride 2 for the first n_layers, then
stride 1), LeakyReLU(0.2), channel multipliers min(2ⁿ, 8), normalization ∈
{instancenorm, batchnorm, actnorm}, bias disabled under batchnorm, final 4×4
conv to a 1-channel logit map. Optional spectral norm on every conv
(`src/utils/__init__.py:54-64` apply_spectral_norm, used at
`src/trainers/base.py:258-259`) — here `flax.linen.SpectralNorm` with its
power-iteration state in 'batch_stats'.

Init: N(0, 0.02) for conv kernels (`discriminator.py:9-15`).
"""

from typing import Optional

from flax import linen as nn

from .actnorm import ActNorm
from .blocks import instance_norm

_conv_init = nn.initializers.normal(stddev=0.02)


class NLayerDiscriminator(nn.Module):
    out_channels: int = 1
    n_filters: int = 64
    n_layers: int = 3
    normalization: str = "batchnorm"
    apply_spectral_norm: bool = False
    axis_name: Optional[str] = None

    def _conv(self, features, stride, use_bias=True):
        conv = nn.Conv(
            features,
            (4, 4),
            strides=(stride, stride),
            padding=[(1, 1), (1, 1)],
            use_bias=use_bias,
            kernel_init=_conv_init,
        )
        if self.apply_spectral_norm:
            conv = nn.SpectralNorm(conv)
        return conv

    @nn.compact
    def __call__(self, x, train: bool = True):
        assert self.normalization in {"instancenorm", "batchnorm", "actnorm"}
        use_bias = self.normalization != "batchnorm"

        def sn_kwargs():
            return {"update_stats": train} if self.apply_spectral_norm else {}

        def norm(h):
            if self.normalization == "instancenorm":
                return instance_norm(h)
            if self.normalization == "batchnorm":
                return nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,
                    epsilon=1e-5,
                    axis_name=self.axis_name,
                )(h)
            return ActNorm(h.shape[-1], axis_name=self.axis_name)(h, train=train)

        h = self._conv(self.n_filters, 2)(x, **sn_kwargs())
        h = nn.leaky_relu(h, 0.2)

        nf_mult = 1
        for n in range(1, self.n_layers):
            nf_mult = min(2**n, 8)
            h = self._conv(self.n_filters * nf_mult, 2, use_bias)(h, **sn_kwargs())
            h = nn.leaky_relu(norm(h), 0.2)

        nf_mult = min(2**self.n_layers, 8)
        h = self._conv(self.n_filters * nf_mult, 1, use_bias)(h, **sn_kwargs())
        h = nn.leaky_relu(norm(h), 0.2)

        return self._conv(self.out_channels, 1)(h, **sn_kwargs())
