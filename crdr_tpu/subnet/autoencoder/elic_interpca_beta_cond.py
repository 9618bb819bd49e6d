"""Stage-3 decoder: ELIC + InterpCA + Fourier beta conditioning.

Contract: reference elic_interpca_beta_cond_autoencoder.py:87-163 — the ELIC
decoder skeleton where the three residual stacks become beta-conditioned blocks;
beta -> Fourier embedding (L=10) -> 2-layer MLP -> [1,1,1,cond_ch] feature added
via 1x1 projections inside each block.  With ``weight_init: True`` every conv and
dense gets DCGAN N(0, 0.02) init.
"""

from __future__ import annotations

from typing import Dict, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn import (BetaCondResidualBottleneckBlocks, ChengNLAM, Dense,
                   InterpChAtt, UpConv, dcgan_normal_init, fourier_embed)
from ...utils.registry import DECODER_REGISTRY

Array = jax.Array


@DECODER_REGISTRY.register()
class ElicInterpCaBetaCondDecoder(nn.Module):
    rate_level: int = 5
    L: int = 10
    max_beta: float = 5.12
    cond_ch: int = 512
    use_pi: bool = True
    include_x: bool = False
    weight_init: bool = False
    in_ch: int = 192
    out_ch: int = 3
    main_ch: int = 192
    block_mid_ch: int = 192
    num_blocks: int = 3
    use_tanh: bool = True
    pixel_shuffle: bool = False
    res_in_res: bool = False
    ca_kwargs: Dict = None

    def setup(self):
        w_init = dcgan_normal_init(0.02) if self.weight_init else None
        b_init = (lambda k, s: jnp.zeros(s, jnp.float32)) if self.weight_init \
            else None
        m, mid, cch = self.main_ch, self.block_mid_ch, self.cond_ch

        self.attn1 = ChengNLAM(self.in_ch, w_init=w_init)
        self.conv1 = UpConv(m, 5, self.pixel_shuffle, w_init=w_init)
        self.block1 = BetaCondResidualBottleneckBlocks(
            m, mid, cch, self.num_blocks, self.res_in_res, w_init=w_init)
        self.conv2 = UpConv(m, 5, self.pixel_shuffle, w_init=w_init)
        self.attn2 = ChengNLAM(m, w_init=w_init)
        self.block2 = BetaCondResidualBottleneckBlocks(
            m, mid, cch, self.num_blocks, self.res_in_res, w_init=w_init)
        self.conv3 = UpConv(m, 5, self.pixel_shuffle, w_init=w_init)
        self.block3 = BetaCondResidualBottleneckBlocks(
            m, mid, cch, self.num_blocks, self.res_in_res, w_init=w_init)
        self.conv4 = UpConv(self.out_ch, 5, self.pixel_shuffle, w_init=w_init)

        ca = dict(self.ca_kwargs or {})
        self.layer_in_ch = [
            ("attn1", self.in_ch), ("conv1", self.in_ch), ("block1", m),
            ("conv2", m), ("attn2", m), ("block2", m), ("conv3", m),
            ("block3", m), ("conv4", m),
        ]
        self.interp_ca = [
            InterpChAtt(ch, self.rate_level, name=f"interp_ca_{i}", **ca)
            for i, (_, ch) in enumerate(self.layer_in_ch)
        ]
        self.mlp_0 = Dense(self.cond_ch, w_init=w_init, b_init=b_init)
        self.mlp_2 = Dense(self.cond_ch, w_init=w_init, b_init=b_init)

    def cond_feature(self, beta: Union[float, Array]) -> Array:
        emb = fourier_embed(beta, self.L, self.max_beta, self.use_pi,
                            self.include_x)  # [1, 2L]
        cond = self.mlp_2(nn.relu(self.mlp_0(emb)))  # [1, cond_ch]
        return cond[:, None, None, :]  # [1, 1, 1, cond_ch]

    def __call__(self, x: Array, rate_ind: Union[float, Array],
                 beta: Union[float, Array]) -> Array:
        cond = self.cond_feature(beta)
        for (layer_name, _), ca in zip(self.layer_in_ch, self.interp_ca):
            x = ca(x, rate_ind)
            layer = getattr(self, layer_name)
            if "block" in layer_name:
                x = layer(x, cond)
            else:
                x = layer(x)
        if self.use_tanh:
            x = jnp.tanh(x)
        return x
