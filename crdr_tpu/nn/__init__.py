from .conv import (Conv2d, ConvTranspose2d, Dense, dcgan_normal_init,
                   pixel_shuffle, torch_conv_weight_init)
from .fourier import fourier_embed
from .interp_ca import InterpChAtt
from .layers import (BaseBlock, BetaCondBaseBlock, BetaCondResidualBottleneckBlocks,
                     ChengNLAM, NLAMResBlock, ResidualBottleneckBlocks, UpConv)
