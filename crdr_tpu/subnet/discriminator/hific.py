"""HiFiC spectral-norm patch discriminators (reference hific_discriminator.py:24-57).

Spectral normalization uses flax's power-iteration SpectralNorm; its state lives
in the ``batch_stats`` collection and is updated during D steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn import Conv2d
from ...utils.registry import DISCRIMINATOR_REGISTRY

Array = jax.Array


class _SNConv(nn.Module):
    out_ch: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    use_sn: bool = True

    @nn.compact
    def __call__(self, x: Array, update_stats: bool = True) -> Array:
        conv = Conv2d(self.out_ch, self.kernel_size, self.stride, self.padding,
                      name="conv")
        if self.use_sn:
            return nn.SpectralNorm(conv)(x, update_stats=update_stats)
        return conv(x)


@DISCRIMINATOR_REGISTRY.register()
class HiFiCDiscriminator(nn.Module):
    in_ch: int = 3
    out_ch: int = 1
    main_ch: int = 64
    use_sn: bool = True
    cond: bool = False

    @nn.compact
    def __call__(self, x: Array, train: bool = True, **kwargs) -> Array:
        m = self.main_ch
        pad4 = 2  # ceil((4-1)/2)
        x = nn.leaky_relu(_SNConv(m, 4, 2, pad4, self.use_sn,
                                  name="layer_0")(x, train), 0.2)
        x = nn.leaky_relu(_SNConv(m * 2, 4, 2, pad4, self.use_sn,
                                  name="layer_1")(x, train), 0.2)
        x = nn.leaky_relu(_SNConv(m * 4, 4, 2, pad4, self.use_sn,
                                  name="layer_2")(x, train), 0.2)
        x = nn.leaky_relu(_SNConv(m * 8, 4, 1, pad4, self.use_sn,
                                  name="layer_3")(x, train), 0.2)
        return _SNConv(self.out_ch, 1, 1, 0, self.use_sn,
                       name="layer_4")(x, train)


@DISCRIMINATOR_REGISTRY.register()
class HiFiCConditionalDiscriminator(nn.Module):
    in_ch: int = 3
    out_ch: int = 1
    main_ch: int = 64
    y_ch: int = 192
    latent_nc: int = 12
    use_sn: bool = True
    cond: bool = False

    @nn.compact
    def __call__(self, x: Array, y_hat: Array, train: bool = True,
                 **kwargs) -> Array:
        cond = nn.leaky_relu(Conv2d(self.latent_nc, 1, 1, 0, name="latent_conv")(
            jax.lax.stop_gradient(y_hat)), 0.2)
        n, h, w, c = cond.shape
        cond = jax.image.resize(cond, (n, h * 16, w * 16, c), "nearest")
        inp = jnp.concatenate([x, cond], axis=-1)
        return HiFiCDiscriminator(self.in_ch + self.latent_nc, self.out_ch,
                                  self.main_ch, self.use_sn,
                                  name="model")(inp, train=train)
