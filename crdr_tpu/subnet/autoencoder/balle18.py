"""Balle et al. 2018 hyperprior autoencoder (reference balle18_autoencoder.py:11-51)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn import Conv2d, ConvTranspose2d
from ...nn.norm import GDN
from ...utils.registry import DECODER_REGISTRY, ENCODER_REGISTRY

Array = jax.Array


@ENCODER_REGISTRY.register()
class Balle18Encoder(nn.Module):
    in_ch: int = 3
    out_ch: int = 192
    main_ch: int = 192

    @property
    def num_downscale(self) -> int:
        return 4

    @property
    def latent_ch(self) -> int:
        return self.out_ch

    @nn.compact
    def __call__(self, x: Array) -> Array:
        m = self.main_ch
        x = Conv2d(m, 5, 2, 2, name="conv_0")(x)
        x = GDN(m, name="gdn_1")(x)
        x = Conv2d(m, 5, 2, 2, name="conv_2")(x)
        x = GDN(m, name="gdn_3")(x)
        x = Conv2d(m, 5, 2, 2, name="conv_4")(x)
        x = GDN(m, name="gdn_5")(x)
        x = Conv2d(self.out_ch, 5, 2, 2, name="conv_6")(x)
        return x


@DECODER_REGISTRY.register()
class Balle18Decoder(nn.Module):
    in_ch: int = 192
    out_ch: int = 3
    main_ch: int = 192
    use_tanh: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        m = self.main_ch
        x = ConvTranspose2d(m, 5, 2, 2, 1, name="conv_0")(x)
        x = GDN(m, inverse=True, name="igdn_1")(x)
        x = ConvTranspose2d(m, 5, 2, 2, 1, name="conv_2")(x)
        x = GDN(m, inverse=True, name="igdn_3")(x)
        x = ConvTranspose2d(m, 5, 2, 2, 1, name="conv_4")(x)
        x = GDN(m, inverse=True, name="igdn_5")(x)
        x = ConvTranspose2d(self.out_ch, 5, 2, 2, 1, name="conv_6")(x)
        if self.use_tanh:
            x = jnp.tanh(x)
        return x
