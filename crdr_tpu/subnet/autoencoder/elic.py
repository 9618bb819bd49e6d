"""ELIC analysis/synthesis transforms (He et al., CVPR 2022) as flax modules.

Architecture contract: reference src/models/subnet/autoencoder/elic_autoencoder.py
:31-119 — 4 stride-2 k5 convs with residual-bottleneck stacks and ChengNLAM after
stages 2 and 4 (encoder); mirrored up-convs in the decoder.  NHWC layout; each
stage is a large dense conv that XLA maps onto the MXU.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from flax import linen as nn

from ...nn import ChengNLAM, Conv2d, ResidualBottleneckBlocks, UpConv
from ...utils.registry import DECODER_REGISTRY, ENCODER_REGISTRY

Array = jax.Array


@ENCODER_REGISTRY.register()
class ElicEncoder(nn.Module):
    in_ch: int = 3
    out_ch: int = 192
    main_ch: int = 192
    block_mid_ch: int = 192
    num_blocks: int = 3
    res_in_res: bool = False

    @property
    def num_downscale(self) -> int:
        return 4

    @property
    def latent_ch(self) -> int:
        return self.out_ch

    def setup(self):
        m, mid = self.main_ch, self.block_mid_ch
        self.conv1 = Conv2d(m, 5, 2, 2)
        self.block1 = ResidualBottleneckBlocks(m, mid, self.num_blocks,
                                               self.res_in_res)
        self.conv2 = Conv2d(m, 5, 2, 2)
        self.block2 = ResidualBottleneckBlocks(m, mid, self.num_blocks,
                                               self.res_in_res)
        self.attn2 = ChengNLAM(m)
        self.conv3 = Conv2d(m, 5, 2, 2)
        self.block3 = ResidualBottleneckBlocks(m, mid, self.num_blocks,
                                               self.res_in_res)
        self.conv4 = Conv2d(self.out_ch, 5, 2, 2)
        self.attn4 = ChengNLAM(self.out_ch)

    def __call__(self, x: Array) -> Array:
        x = self.conv1(x)
        x = self.block1(x)
        x = self.conv2(x)
        x = self.block2(x)
        x = self.attn2(x)
        x = self.conv3(x)
        x = self.block3(x)
        x = self.conv4(x)
        x = self.attn4(x)
        return x


@DECODER_REGISTRY.register()
class ElicDecoder(nn.Module):
    in_ch: int = 192
    out_ch: int = 3
    main_ch: int = 192
    block_mid_ch: int = 192
    num_blocks: int = 3
    use_tanh: bool = True
    pixel_shuffle: bool = False
    res_in_res: bool = False

    def setup(self):
        m, mid = self.main_ch, self.block_mid_ch
        self.attn1 = ChengNLAM(self.in_ch)
        self.conv1 = UpConv(m, 5, self.pixel_shuffle)
        self.block1 = ResidualBottleneckBlocks(m, mid, self.num_blocks,
                                               self.res_in_res)
        self.conv2 = UpConv(m, 5, self.pixel_shuffle)
        self.attn2 = ChengNLAM(m)
        self.block2 = ResidualBottleneckBlocks(m, mid, self.num_blocks,
                                               self.res_in_res)
        self.conv3 = UpConv(m, 5, self.pixel_shuffle)
        self.block3 = ResidualBottleneckBlocks(m, mid, self.num_blocks,
                                               self.res_in_res)
        self.conv4 = UpConv(self.out_ch, 5, self.pixel_shuffle)

    def __call__(self, x: Array) -> Array:
        x = self.attn1(x)
        x = self.conv1(x)
        x = self.block1(x)
        x = self.conv2(x)
        x = self.attn2(x)
        x = self.block2(x)
        x = self.conv3(x)
        x = self.block3(x)
        x = self.conv4(x)
        if self.use_tanh:
            x = jax.numpy.tanh(x)
        return x
