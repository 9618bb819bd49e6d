"""Minnen & Singh 2020 hyper-encoder/decoder (reference minnen20_hyperprior.py:9-58).

Hyper-decoder runs as two deconv towers (means / scales) whose outputs are
concatenated to ``hyper_out_ch`` = [mu || sigma].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn import Conv2d, ConvTranspose2d
from ...utils.registry import HYPERDECODER_REGISTRY, HYPERENCODER_REGISTRY

Array = jax.Array


@HYPERENCODER_REGISTRY.register()
class Minnen20HyperEncoder(nn.Module):
    bottleneck_y: int = 320
    bottleneck_z: int = 192

    @property
    def num_downscale(self) -> int:
        return 2

    @property
    def latent_ch(self) -> int:
        return self.bottleneck_z

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.relu(Conv2d(320, 3, 1, 1, name="conv1")(x))
        x = nn.relu(Conv2d(256, 5, 2, 2, name="conv2")(x))
        x = Conv2d(self.bottleneck_z, 5, 2, 2, name="conv3")(x)
        return x


class HyperDecoderBlock(nn.Module):
    out_ch: int = 320

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.relu(ConvTranspose2d(192, 5, 2, 2, 1, name="conv1")(x))
        x = nn.relu(ConvTranspose2d(256, 5, 2, 2, 1, name="conv2")(x))
        x = ConvTranspose2d(self.out_ch, 3, 1, 1, 0, name="conv3")(x)
        return x


@HYPERDECODER_REGISTRY.register()
class Minnen20HyperDecoder(nn.Module):
    bottleneck_z: int = 192
    hyper_out_ch: int = 640

    @nn.compact
    def __call__(self, x: Array) -> Array:
        assert self.hyper_out_ch % 2 == 0
        mu = HyperDecoderBlock(self.hyper_out_ch // 2, name="hd_mu")(x)
        std = HyperDecoderBlock(self.hyper_out_ch // 2, name="hd_std")(x)
        return jnp.concatenate([mu, std], axis=-1)
