"""Cheng 2020 residual blocks with GDN/IGDN options (reference cheng_resblock.py)."""

from __future__ import annotations

from typing import Optional

import jax
from flax import linen as nn

from .conv import Conv2d, pixel_shuffle
from .norm import GDN

Array = jax.Array


class _Actv(nn.Module):
    kind: Optional[str]
    ch: int

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.kind is None:
            return x
        if self.kind == "relu":
            return nn.relu(x)
        if self.kind == "lrelu":
            return nn.leaky_relu(x, 0.2)
        if self.kind == "gdn":
            return GDN(self.ch, name="gdn")(x)
        if self.kind == "igdn":
            return GDN(self.ch, inverse=True, name="igdn")(x)
        raise ValueError(f"unknown actv {self.kind}")


class ResBlock(nn.Module):
    in_ch: int
    out_ch: int
    actv: Optional[str] = "relu"
    actv2: Optional[str] = None
    downscale: bool = False
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Array:
        stride = 2 if self.downscale else 1
        pad = (self.kernel_size - 1) // 2
        shortcut = x
        if self.downscale or self.in_ch != self.out_ch:
            shortcut = Conv2d(self.out_ch, 1, stride, 0, name="shortcut")(x)
        y = Conv2d(self.out_ch, self.kernel_size, stride, pad, name="conv1")(x)
        y = _Actv(self.actv, self.out_ch, name="actv1")(y)
        y = Conv2d(self.out_ch, self.kernel_size, 1, pad, name="conv2")(y)
        y = _Actv(self.actv2, self.out_ch, name="actv2")(y)
        return y + shortcut


class _UpConvPS(nn.Module):
    """conv(k) -> PixelShuffle(2) (the reference's 'pixelshuffle' up mode)."""

    out_ch: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pad = (self.kernel_size - 1) // 2
        y = Conv2d(self.out_ch * 4, self.kernel_size, 1, pad, name="conv")(x)
        return pixel_shuffle(y, 2)


class _UpConvInterp(nn.Module):
    """conv(k) -> nearest 2x upsample."""

    out_ch: int
    kernel_size: int = 3

    @nn.compact
    def __call__(self, x: Array) -> Array:
        pad = (self.kernel_size - 1) // 2
        y = Conv2d(self.out_ch, self.kernel_size, 1, pad, name="conv")(x)
        n, h, w, c = y.shape
        return jax.image.resize(y, (n, h * 2, w * 2, c), "nearest")


class UpResBlock(nn.Module):
    in_ch: int
    out_ch: int
    kernel_size: int = 3
    actv: str = "relu"
    actv2: Optional[str] = None
    up_type: str = "pixelshuffle"

    @nn.compact
    def __call__(self, x: Array) -> Array:
        up = _UpConvPS if self.up_type == "pixelshuffle" else _UpConvInterp
        pad = (self.kernel_size - 1) // 2
        y = up(self.out_ch, self.kernel_size, name="c1_up")(x)
        y = _Actv(self.actv, self.out_ch, name="actv1")(y)
        y = Conv2d(self.out_ch, self.kernel_size, 1, pad, name="c1_conv")(y)
        if self.actv2:
            y = _Actv(self.actv2, self.out_ch, name="actv2")(y)
        shortcut = up(self.out_ch, 1, name="shortcut_up")(x)
        return y + shortcut
