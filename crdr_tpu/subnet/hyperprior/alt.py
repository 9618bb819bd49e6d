"""Alternative hyper-encoders/decoders: Balle18 and Cheng20 variants
(reference balle18_hyperprior.py:9-45, cheng20_hyperprior.py:23-59)."""

from __future__ import annotations

import jax
from flax import linen as nn

from ...nn import Conv2d, ConvTranspose2d
from ...utils.registry import HYPERDECODER_REGISTRY, HYPERENCODER_REGISTRY

Array = jax.Array


@HYPERENCODER_REGISTRY.register()
class Balle18HyperEncoder(nn.Module):
    in_ch: int = 192
    out_ch: int = 192
    main_ch: int = 192

    @property
    def num_downscale(self) -> int:
        return 2

    @property
    def latent_ch(self) -> int:
        return self.out_ch

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.relu(Conv2d(self.main_ch, 3, 1, 1, name="c1")(x))
        x = nn.relu(Conv2d(self.main_ch, 5, 2, 2, name="c2")(x))
        return Conv2d(self.out_ch, 5, 2, 2, name="c3")(x)


@HYPERDECODER_REGISTRY.register()
class Balle18HyperDecoder(nn.Module):
    in_ch: int = 192
    out_ch: int = 384
    main_ch: int = 192

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = nn.relu(ConvTranspose2d(self.main_ch, 5, 2, 2, 1, name="c1")(x))
        x = nn.relu(ConvTranspose2d(self.main_ch, 5, 2, 2, 1, name="c2")(x))
        return Conv2d(self.out_ch, 3, 1, 1, name="c3")(x)


@HYPERENCODER_REGISTRY.register()
class Cheng20HyperEncoder(nn.Module):
    in_ch: int = 192
    out_ch: int = 192
    main_ch: int = 192

    @property
    def num_downscale(self) -> int:
        return 2

    @property
    def latent_ch(self) -> int:
        return self.out_ch

    @nn.compact
    def __call__(self, x: Array) -> Array:
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        m = self.main_ch
        x = lrelu(Conv2d(m, 3, 1, 1, name="c1")(x))
        x = lrelu(Conv2d(m, 3, 1, 1, name="c2")(x))
        x = lrelu(Conv2d(m, 3, 2, 1, name="c3")(x))
        x = lrelu(Conv2d(m, 3, 1, 1, name="c4")(x))
        return Conv2d(self.out_ch, 3, 2, 1, name="c5")(x)


@HYPERDECODER_REGISTRY.register()
class Cheng20HyperDecoder(nn.Module):
    in_ch: int = 192
    out_ch: int = 384
    main_ch: int = 192

    @nn.compact
    def __call__(self, x: Array) -> Array:
        lrelu = lambda v: nn.leaky_relu(v, 0.2)
        m = self.main_ch
        x = lrelu(Conv2d(m, 3, 1, 1, name="c1")(x))
        x = lrelu(ConvTranspose2d(m, 4, 2, 1, 0, name="c2")(x))
        x = lrelu(Conv2d(m, 3, 1, 1, name="c3")(x))
        x = lrelu(ConvTranspose2d(m, 4, 2, 1, 0, name="c4")(x))
        return Conv2d(self.out_ch, 3, 1, 1, name="c5")(x)
