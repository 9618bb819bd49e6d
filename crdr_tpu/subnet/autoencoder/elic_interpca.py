"""ELIC + InterpCA variable-rate autoencoders.

Contract: reference elic_interpca_autoencoder.py:22-97 — an InterpChAtt after each
of the encoder's 9 named layers, and before each of the decoder's 9 layers.
``forward(x, rate_ind)`` with scalar (or per-batch) continuous rate index.
"""

from __future__ import annotations

from typing import Dict, Union

import jax
from flax import linen as nn

from ...nn import InterpChAtt
from ...utils.registry import DECODER_REGISTRY, ENCODER_REGISTRY
from .elic import ElicDecoder, ElicEncoder

Array = jax.Array


@ENCODER_REGISTRY.register()
class ElicInterpCaEncoder(nn.Module):
    rate_level: int = 5
    in_ch: int = 3
    out_ch: int = 192
    main_ch: int = 192
    block_mid_ch: int = 192
    num_blocks: int = 3
    ca_kwargs: Dict = None

    @property
    def num_downscale(self) -> int:
        return 4

    @property
    def latent_ch(self) -> int:
        return self.out_ch

    def setup(self):
        self.body = ElicEncoder(self.in_ch, self.out_ch, self.main_ch,
                                self.block_mid_ch, self.num_blocks, name="body")
        ca = dict(self.ca_kwargs or {})
        m = self.main_ch
        self.layer_out_ch = [
            ("conv1", m), ("block1", m), ("conv2", m), ("block2", m),
            ("attn2", m), ("conv3", m), ("block3", m), ("conv4", self.out_ch),
            ("attn4", self.out_ch),
        ]
        self.interp_ca = [
            InterpChAtt(ch, self.rate_level, name=f"interp_ca_{i}", **ca)
            for i, (_, ch) in enumerate(self.layer_out_ch)
        ]

    def __call__(self, x: Array, rate_ind: Union[float, Array]) -> Array:
        for (layer_name, _), ca in zip(self.layer_out_ch, self.interp_ca):
            x = getattr(self.body, layer_name)(x)
            x = ca(x, rate_ind)
        return x


@DECODER_REGISTRY.register()
class ElicInterpCaDecoder(nn.Module):
    rate_level: int = 5
    in_ch: int = 192
    out_ch: int = 3
    main_ch: int = 192
    block_mid_ch: int = 192
    num_blocks: int = 3
    use_tanh: bool = True
    pixel_shuffle: bool = False
    ca_kwargs: Dict = None

    def setup(self):
        self.body = ElicDecoder(self.in_ch, self.out_ch, self.main_ch,
                                self.block_mid_ch, self.num_blocks,
                                use_tanh=False, pixel_shuffle=self.pixel_shuffle,
                                name="body")
        ca = dict(self.ca_kwargs or {})
        m = self.main_ch
        self.layer_in_ch = [
            ("attn1", self.in_ch), ("conv1", self.in_ch), ("block1", m),
            ("conv2", m), ("attn2", m), ("block2", m), ("conv3", m),
            ("block3", m), ("conv4", m),
        ]
        self.interp_ca = [
            InterpChAtt(ch, self.rate_level, name=f"interp_ca_{i}", **ca)
            for i, (_, ch) in enumerate(self.layer_in_ch)
        ]

    def __call__(self, x: Array, rate_ind: Union[float, Array]) -> Array:
        for (layer_name, _), ca in zip(self.layer_in_ch, self.interp_ca):
            x = ca(x, rate_ind)
            x = getattr(self.body, layer_name)(x)
        if self.use_tanh:
            x = jax.numpy.tanh(x)
        return x
