"""Flax modules. NHWC layouts throughout; sync-batch-norm via `axis_name`."""

from .blocks import (
    ASPP,
    DoubleConv,
    ResBlock,
    StyledDenorm,
    StyledResUpBlock,
    UpBlock,
    instance_norm,
    pixel_shuffle,
)
from .unet_encoder import UNetEncoder, EncoderWithVQ
from .unet_decoder import UNetDecoder
from .actnorm import ActNorm
from .discriminator import NLayerDiscriminator
from .biggan_layers import (
    Attention,
    CCBN,
    DBlock,
    GBlock2,
    GBlockCond,
    SNConv,
    SNDense,
    SNEmbed,
)
from .biggan_generator import BigGANGenerator, GDPair, g_arch
from .unet_discriminator import UNetDiscriminator
from .vqgan import VQGAN
from .legacy import UNet, VQVNet, VQWNet, StyledVQWNet
from .mingpt import GPT, GPTConfig, CausalSelfAttention, Block
