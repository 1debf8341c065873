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
from .biggan_layers import Attention, DBlock, GBlock2, SNConv, SNDense
from .unet_discriminator import UNetDiscriminator
from .vqgan import VQGAN
from .legacy import UNet, VQVNet, VQWNet, StyledVQWNet
from .mingpt import GPT, GPTConfig, CausalSelfAttention, Block
