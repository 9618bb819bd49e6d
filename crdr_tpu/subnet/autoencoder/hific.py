"""HiFiC encoder/generator (Mentzer et al. 2020).

Contract: reference hific_autoencoder.py:22-300 — 7x7 reflect-padded stem, four
stride-2 convs with ChannelNorm, decoder with 9 residual blocks, 4 transposed
convs, optional noise concat, 7x7 output conv.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn import Conv2d, ConvTranspose2d, pixel_shuffle
from ...nn.norm import ChannelNorm2D, InstanceNorm2D
from ...utils.registry import DECODER_REGISTRY, ENCODER_REGISTRY

Array = jax.Array

_ACTV = {"relu": nn.relu, "elu": nn.elu,
         "leaky_relu": lambda x: nn.leaky_relu(x, 0.01)}


def _reflect(x: Array, top: int, bottom: int, left: int, right: int) -> Array:
    return jnp.pad(x, ((0, 0), (top, bottom), (left, right), (0, 0)),
                   mode="reflect")


class _Norm(nn.Module):
    ch: int
    use_norm: bool = True
    channel_norm: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if not self.use_norm:
            return x
        if self.channel_norm:
            return ChannelNorm2D(self.ch, name="norm")(x)
        return InstanceNorm2D(self.ch, name="norm")(x)


@ENCODER_REGISTRY.register()
class HificEncoder(nn.Module):
    in_ch: int = 3
    bottleneck_y: int = 220
    filters: Sequence[int] = (60, 120, 240, 480, 960)
    activation: str = "relu"
    use_norm: bool = True
    channel_norm: bool = True

    @property
    def num_downscale(self) -> int:
        return 4

    @property
    def latent_ch(self) -> int:
        return self.bottleneck_y

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = _ACTV[self.activation]
        f = list(self.filters)
        # 7x7 stem, reflect pad 3
        x = _reflect(x, 3, 3, 3, 3)
        x = Conv2d(f[0], 7, 1, 0, name="conv_block1")(x)
        x = _Norm(f[0], self.use_norm, self.channel_norm, name="norm1")(x)
        x = act(x)
        # 4 stride-2 convs with asymmetric reflect pad (top=1, right=1)
        for i in range(4):
            x = _reflect(x, 1, 0, 0, 1)
            x = Conv2d(f[i + 1], 3, 2, 0, name=f"conv_block{i + 2}")(x)
            x = _Norm(f[i + 1], self.use_norm, self.channel_norm,
                      name=f"norm{i + 2}")(x)
            x = act(x)
        x = _reflect(x, 1, 1, 1, 1)
        x = Conv2d(self.bottleneck_y, 3, 1, 0, name="conv_block_out")(x)
        return x


class HificResidualBlock(nn.Module):
    ch: int
    activation: str = "relu"
    use_norm: bool = True
    channel_norm: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        act = _ACTV[self.activation]
        res = _reflect(x, 1, 1, 1, 1)
        res = Conv2d(self.ch, 3, 1, 0, name="conv1")(res)
        res = _Norm(self.ch, self.use_norm, self.channel_norm, name="norm1")(res)
        res = act(res)
        res = _reflect(res, 1, 1, 1, 1)
        res = Conv2d(self.ch, 3, 1, 0, name="conv2")(res)
        res = _Norm(self.ch, self.use_norm, self.channel_norm, name="norm2")(res)
        return x + res


class _UpLayer(nn.Module):
    out_ch: int
    use_pixelshuffle: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.use_pixelshuffle:
            y = Conv2d(self.out_ch * 4, 3, 1, 1, name="conv")(x)
            return pixel_shuffle(y, 2)
        return ConvTranspose2d(self.out_ch, 3, 2, 1, 1, name="deconv")(x)


@DECODER_REGISTRY.register()
class HificDecoder(nn.Module):
    bottleneck_y: int = 220
    activation: str = "relu"
    n_residual_blocks: int = 9
    filters: Sequence[int] = (960, 480, 240, 120, 60)
    use_norm: bool = True
    channel_norm: bool = True
    use_first_norm: bool = True
    sample_noise: bool = False
    use_tanh: bool = True
    use_pixelshuffle: bool = False
    noise_dim: int = 32

    @nn.compact
    def __call__(self, x: Array, rng: Optional[Array] = None) -> Array:
        act = _ACTV[self.activation]
        f = list(self.filters)
        if self.use_first_norm:
            x = _Norm(self.bottleneck_y, self.use_norm, self.channel_norm,
                      name="first_norm")(x)
        x = _reflect(x, 1, 1, 1, 1)
        x = Conv2d(f[0], 3, 1, 0, name="conv_block_init")(x)
        head = _Norm(f[0], self.use_norm, self.channel_norm, name="init_norm")(x)

        width = f[0]
        if self.sample_noise:
            assert rng is not None, "sample_noise decoder needs an rng"
            n, h, w, _ = head.shape
            z = jax.random.normal(rng, (n, h, w, self.noise_dim), head.dtype)
            head = jnp.concatenate([head, z], axis=-1)
            width = f[0] + self.noise_dim

        y = head
        for m in range(self.n_residual_blocks):
            y = HificResidualBlock(width, self.activation, self.use_norm,
                                   self.channel_norm, name=f"resblock_{m}")(y)
        y = y + head

        for i in range(4):
            y = _UpLayer(f[i + 1], self.use_pixelshuffle,
                         name=f"upconv_block{i + 1}")(y)
            y = _Norm(f[i + 1], self.use_norm, self.channel_norm,
                      name=f"up_norm{i + 1}")(y)
            y = act(y)

        y = _reflect(y, 3, 3, 3, 3)
        y = Conv2d(3, 7, 1, 0, name="conv_block_out")(y)
        if self.use_tanh:
            y = jnp.tanh(y)
        return y
