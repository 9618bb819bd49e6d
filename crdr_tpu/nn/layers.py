"""ELIC building blocks and Cheng attention, as flax modules (NHWC).

Architecture contracts (cited into /root/reference):
* ``BaseBlock`` / ``ResidualBottleneckBlocks``: src/models/layer/elic_layers.py:23-53
* ``up_conv``: elic_layers.py:14-21 (ConvTranspose k5 s2 p2 op1, or conv+PixelShuffle)
* ``ChengNLAM`` / ``NLAMResBlock``: src/models/layer/cheng_nlam.py:5-47
* ``BetaCondBaseBlock`` / ``BetaCondResidualBottleneckBlocks``:
  src/models/subnet/autoencoder/elic_interpca_beta_cond_autoencoder.py:42-85
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from flax import linen as nn

from .conv import Conv2d, ConvTranspose2d, pixel_shuffle

Array = jax.Array


class BaseBlock(nn.Module):
    """1x1 -> ReLU -> 3x3 -> ReLU -> 1x1 with residual add."""

    ch: int
    mid_ch: int
    w_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = Conv2d(self.mid_ch, 1, 1, 0, name="conv_0", w_init=self.w_init)(x)
        y = nn.relu(y)
        y = Conv2d(self.mid_ch, 3, 1, 1, name="conv_2", w_init=self.w_init)(y)
        y = nn.relu(y)
        y = Conv2d(self.ch, 1, 1, 0, name="conv_4", w_init=self.w_init)(y)
        return x + y


class ResidualBottleneckBlocks(nn.Module):
    ch: int
    mid_ch: int
    num_blocks: int = 3
    res_in_res: bool = False
    w_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        y = x
        for i in range(self.num_blocks):
            y = BaseBlock(self.ch, self.mid_ch, name=f"block{i}",
                          w_init=self.w_init)(y)
        if self.res_in_res:
            y = x + y
        return y


class UpConv(nn.Module):
    """2x upsampler: ConvTranspose(k5,s2,p2,op1) or Conv(k5)->PixelShuffle(2)."""

    out_ch: int
    kernel_size: int = 5
    use_pixel_shuffle: bool = False
    w_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        assert self.kernel_size == 5, "ELIC uses kernel_size=5"
        if self.use_pixel_shuffle:
            y = Conv2d(self.out_ch * 4, 5, 1, 2, name="conv_0",
                       w_init=self.w_init)(x)
            return pixel_shuffle(y, 2)
        return ConvTranspose2d(self.out_ch, 5, 2, 2, 1, name="deconv",
                               w_init=self.w_init)(x)


class NLAMResBlock(nn.Module):
    """Half-width bottleneck residual block used inside ChengNLAM."""

    ch: int
    w_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        mid = self.ch // 2
        y = Conv2d(mid, 1, 1, 0, name="c1", w_init=self.w_init)(x)
        y = nn.relu(y)
        y = Conv2d(mid, 3, 1, 1, name="c2", w_init=self.w_init)(y)
        y = nn.relu(y)
        y = Conv2d(self.ch, 1, 1, 0, name="c3", w_init=self.w_init)(y)
        return x + y


class ChengNLAM(nn.Module):
    """Cheng CVPR2020 simplified attention: x + trunk(x) * sigmoid(conv(attn(x)))."""

    ch: int
    w_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        trunk = x
        for i in range(3):
            trunk = NLAMResBlock(self.ch, name=f"trunk_block_{i}",
                                 w_init=self.w_init)(trunk)
        attn = x
        for i in range(3):
            attn = NLAMResBlock(self.ch, name=f"attention_block_{i}",
                                w_init=self.w_init)(attn)
        attn = Conv2d(self.ch, 1, 1, 0, name="conv", w_init=self.w_init)(attn)
        return x + trunk * jax.nn.sigmoid(attn)


class BetaCondBaseBlock(nn.Module):
    """BaseBlock with per-conv additive projections of the beta condition feature."""

    ch: int
    mid_ch: int
    cond_ch: int
    w_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: Array, cond: Array) -> Array:
        # cond: [N or 1, 1, 1, cond_ch]
        sc = x
        y = Conv2d(self.mid_ch, 1, 1, 0, name="conv_0", w_init=self.w_init)(x)
        y = nn.relu(y)
        y = y + Conv2d(self.mid_ch, 1, 1, 0, name="proj_1", w_init=self.w_init)(cond)
        y = Conv2d(self.mid_ch, 3, 1, 1, name="conv_2", w_init=self.w_init)(y)
        y = nn.relu(y)
        y = y + Conv2d(self.mid_ch, 1, 1, 0, name="proj_2", w_init=self.w_init)(cond)
        y = Conv2d(self.ch, 1, 1, 0, name="conv_4", w_init=self.w_init)(y)
        y = y + Conv2d(self.ch, 1, 1, 0, name="proj_3", w_init=self.w_init)(cond)
        return y + sc


class BetaCondResidualBottleneckBlocks(nn.Module):
    ch: int
    mid_ch: int
    cond_ch: int
    num_blocks: int = 3
    res_in_res: bool = False
    w_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: Array, cond: Array) -> Array:
        y = x
        for i in range(self.num_blocks):
            y = BetaCondBaseBlock(self.ch, self.mid_ch, self.cond_ch,
                                  name=f"block{i}", w_init=self.w_init)(y, cond)
        if self.res_in_res:
            y = x + y
        return y
