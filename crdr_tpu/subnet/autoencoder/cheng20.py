"""Cheng et al. 2020 autoencoder family (+InterpCA variants).

Contract: reference cheng20_autoencoder.py:13-106 and
cheng20_interpca_autoencoder.py:17-74 — GDN/IGDN residual blocks, NLAM after
stages, pixel-shuffle upsampling in the decoder.
"""

from __future__ import annotations

from typing import Dict, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn import ChengNLAM, Conv2d, InterpChAtt, pixel_shuffle
from ...nn.resblock import ResBlock, UpResBlock
from ...utils.registry import DECODER_REGISTRY, ENCODER_REGISTRY

Array = jax.Array


@ENCODER_REGISTRY.register()
class Cheng20Encoder(nn.Module):
    in_ch: int = 3
    out_ch: int = 192
    main_ch: int = 192

    @property
    def num_downscale(self) -> int:
        return 4

    @property
    def latent_ch(self) -> int:
        return self.out_ch

    def setup(self):
        m = self.main_ch
        down = dict(actv="lrelu", actv2="gdn", downscale=True)
        normal = dict(actv="lrelu", actv2="lrelu", downscale=False)
        self.block1 = ResBlock(self.in_ch, m, **down)
        self.block2 = ResBlock(m, m, **normal)
        self.block3 = ResBlock(m, m, **down)
        self.nlam1 = ChengNLAM(m)
        self.block4 = ResBlock(m, m, **normal)
        self.block5 = ResBlock(m, m, **down)
        self.block6 = ResBlock(m, m, **normal)
        self.conv7 = Conv2d(self.out_ch, 3, 2, 1)
        self.nlam2 = ChengNLAM(self.out_ch)

    layer_list = ["block1", "block2", "block3", "nlam1", "block4", "block5",
                  "block6", "conv7", "nlam2"]

    def __call__(self, x: Array) -> Array:
        for name in self.layer_list:
            x = getattr(self, name)(x)
        return x


@DECODER_REGISTRY.register()
class Cheng20Decoder(nn.Module):
    in_ch: int = 192
    out_ch: int = 3
    main_ch: int = 192
    use_tanh: bool = True

    def setup(self):
        m = self.main_ch
        up = dict(actv="lrelu", actv2="igdn")
        normal = dict(actv="lrelu", actv2="lrelu")
        self.nlam0 = ChengNLAM(self.in_ch)
        self.block0 = ResBlock(self.in_ch, m, **normal)
        self.up0 = UpResBlock(m, m, **up)
        self.block1 = ResBlock(m, m, **normal)
        self.up1 = UpResBlock(m, m, **up)
        self.nlam2 = ChengNLAM(m)
        self.block2 = ResBlock(m, m, **normal)
        self.up2 = UpResBlock(m, m, **up)
        self.block3 = ResBlock(m, m, **normal)
        self.up3_conv = Conv2d(self.out_ch * 4, 3, 1, 1)

    layer_list = ["nlam0", "block0", "up0", "block1", "up1", "nlam2", "block2",
                  "up2", "block3", "up3"]

    def _layer(self, name: str, x: Array) -> Array:
        if name == "up3":
            return pixel_shuffle(self.up3_conv(x), 2)
        return getattr(self, name)(x)

    def __call__(self, x: Array) -> Array:
        for name in self.layer_list:
            x = self._layer(name, x)
        if self.use_tanh:
            x = jnp.tanh(x)
        return x


@ENCODER_REGISTRY.register()
class Cheng20InterpCaEncoder(Cheng20Encoder):
    rate_level: int = 5
    ca_kwargs: Dict = None

    def setup(self):
        super().setup()
        ca = dict(self.ca_kwargs or {})
        self.interp_ca = [
            InterpChAtt(self.main_ch if n != "nlam2" and n != "conv7"
                        else self.out_ch,
                        self.rate_level, name=f"interp_ca_{i}", **ca)
            for i, n in enumerate(self.layer_list)
        ]

    def __call__(self, x: Array, rate_ind: Union[float, Array]) -> Array:
        for name, ca in zip(self.layer_list, self.interp_ca):
            x = getattr(self, name)(x)
            x = ca(x, rate_ind)
        return x


@DECODER_REGISTRY.register()
class Cheng20InterpCaDecoder(Cheng20Decoder):
    rate_level: int = 5
    ca_kwargs: Dict = None

    def setup(self):
        super().setup()
        ca = dict(self.ca_kwargs or {})
        self.interp_ca = [
            InterpChAtt(self.in_ch if i < 2 else self.main_ch,
                        self.rate_level, name=f"interp_ca_{i}", **ca)
            for i in range(len(self.layer_list))
        ]

    def __call__(self, x: Array, rate_ind: Union[float, Array]) -> Array:
        for name, ca in zip(self.layer_list, self.interp_ca):
            x = ca(x, rate_ind)
            x = self._layer(name, x)
        if self.use_tanh:
            x = jnp.tanh(x)
        return x
