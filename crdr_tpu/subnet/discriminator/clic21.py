"""CLIC21 GVAE patch discriminators (+ multi-rate variants).

Contract: reference clic21_gvae_discriminator.py:12-68,
module_list_discriminator.py:14-30 and multirate_clic21_gvae_discriminator.py
:122-284 — conv stacks with 4 stride-2 downscales, channels 64 -> 512, 1-channel
logit map; multi-rate selection by ``rate_ind``.

Note on ``ModuleListDiscriminator``: the reference indexes a python list with a
runtime ``rate_ind``.  Here all sub-discriminators are evaluated under vmap-style
stacking OR (default) via ``jax.lax.switch`` so the jitted training step stays a
single program for any rate index.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...nn import Conv2d
from ...nn.norm import ChannelNorm2D, InstanceNorm2D
from ...utils.registry import DISCRIMINATOR_REGISTRY

Array = jax.Array


class _ConvNormLRelu(nn.Module):
    out_ch: int
    kernel_size: int = 3
    stride: int = 1
    norm_type: str = "BN"

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        pad = self.kernel_size // 2
        x = Conv2d(self.out_ch, self.kernel_size, self.stride, pad,
                   name="conv")(x)
        if self.norm_type == "BN":
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             name="bn")(x)
        elif self.norm_type == "IN":
            x = InstanceNorm2D(self.out_ch, name="in")(x)
        elif self.norm_type == "CN":
            x = ChannelNorm2D(self.out_ch, name="cn")(x)
        elif self.norm_type != "none":
            raise ValueError(f"invalid norm_type {self.norm_type}")
        return nn.leaky_relu(x, 0.2)


class _Clic21Backbone(nn.Module):
    in_ch: int = 3
    main_ch: int = 64
    out_ch: int = 1
    norm_type: str = "BN"
    num_downscale: int = 4
    head: bool = True

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        m = self.main_ch
        x = _ConvNormLRelu(m, 3, 1, "none", name="layer_0")(x, train)
        x = _ConvNormLRelu(m, 3, 2, self.norm_type, name="layer_1")(x, train)
        ch = m
        idx = 2
        for _ in range(self.num_downscale - 1):
            out = min(ch * 2, m * 8)
            x = _ConvNormLRelu(out, 3, 1, self.norm_type,
                               name=f"layer_{idx}")(x, train)
            x = _ConvNormLRelu(out, 3, 2, self.norm_type,
                               name=f"layer_{idx + 1}")(x, train)
            ch = out
            idx += 2
        if self.head:
            x = Conv2d(self.out_ch, 3, 1, 1, name="head")(x)
        return x


@DISCRIMINATOR_REGISTRY.register()
class CLIC21GVAEDiscriminator(nn.Module):
    in_ch: int = 3
    out_ch: int = 1
    main_ch: int = 64
    norm_type: str = "BN"
    num_downscale: int = 4

    @nn.compact
    def __call__(self, x: Array, train: bool = True, **kwargs) -> Array:
        return _Clic21Backbone(self.in_ch, self.main_ch, self.out_ch,
                               self.norm_type, self.num_downscale,
                               name="model")(x, train)


@DISCRIMINATOR_REGISTRY.register()
class CLIC21GVAELatentConditionalDiscriminator(nn.Module):
    """Conditions on y_hat: 1x1 conv -> latent_nc ch -> x16 nearest upsample
    -> concat with the image."""

    in_ch: int = 3
    out_ch: int = 1
    y_ch: int = 192
    latent_nc: int = 12
    main_ch: int = 64
    norm_type: str = "BN"

    @nn.compact
    def __call__(self, x: Array, y_hat: Array, train: bool = True,
                 **kwargs) -> Array:
        cond = _ConvNormLRelu(self.latent_nc, 1, 1, "none", name="latent_conv")(
            jax.lax.stop_gradient(y_hat), train)
        n, h, w, c = cond.shape
        cond = jax.image.resize(cond, (n, h * 16, w * 16, c), "bilinear")
        inp = jnp.concatenate([x, cond], axis=-1)
        return _Clic21Backbone(self.in_ch + self.latent_nc, self.main_ch,
                               self.out_ch, self.norm_type, name="model")(
            inp, train)


@DISCRIMINATOR_REGISTRY.register()
class ModuleListDiscriminator(nn.Module):
    """N independent sub-discriminators, one per rate level, selected by
    rate_ind (used by stage 3; reference module_list_discriminator.py:14-30)."""

    _subd_type: str = "CLIC21GVAEDiscriminator"
    _num_subd: int = 5
    in_ch: int = 3
    out_ch: int = 1
    main_ch: int = 64
    norm_type: str = "none"

    def setup(self):
        cls = DISCRIMINATOR_REGISTRY.get(self._subd_type)
        self.sub_d = [
            cls(in_ch=self.in_ch, out_ch=self.out_ch, main_ch=self.main_ch,
                norm_type=self.norm_type, name=f"subD_{i}")
            for i in range(self._num_subd)
        ]

    def __call__(self, x: Array, rate_ind: Union[int, Array],
                 train: bool = True, **kwargs) -> Array:
        if self.is_initializing():
            # touch every sub-discriminator so all params are created
            outs = [d(x, train=train) for d in self.sub_d]
            return outs[0]
        if isinstance(rate_ind, (int, float)):
            return self.sub_d[int(rate_ind)](x, train=train)
        # traced rate index: evaluate via switch so one program serves all rates
        idx = jnp.asarray(rate_ind).reshape(-1)[0].astype(jnp.int32)
        branches = [
            (lambda v, d=d: d(v, train=train)) for d in self.sub_d
        ]
        return jax.lax.switch(idx, branches, x)


@DISCRIMINATOR_REGISTRY.register()
class SharedBackboneClic21GvaeDiscriminator(nn.Module):
    """Shared backbone + per-rate 3x3 heads
    (reference multirate_clic21_gvae_discriminator.py)."""

    rate_level: int = 5
    in_ch: int = 3
    out_ch: int = 1
    main_ch: int = 64
    norm_type: str = "none"

    def setup(self):
        self.backbone = _Clic21Backbone(self.in_ch, self.main_ch, self.out_ch,
                                        self.norm_type, head=False,
                                        name="backbone")
        self.heads = [Conv2d(self.out_ch, 3, 1, 1, name=f"head_{i}")
                      for i in range(self.rate_level)]

    def __call__(self, x: Array, rate_ind: Union[int, Array],
                 train: bool = True, **kwargs) -> Array:
        feat = self.backbone(x, train)
        if self.is_initializing():
            outs = [h(feat) for h in self.heads]
            return outs[0]
        if isinstance(rate_ind, (int, float)):
            return self.heads[int(rate_ind)](feat)
        idx = jnp.asarray(rate_ind).reshape(-1)[0].astype(jnp.int32)
        return jax.lax.switch(idx, [(lambda f, h=h: h(f)) for h in self.heads],
                              feat)


@DISCRIMINATOR_REGISTRY.register()
class SharedHeadClic21GvaeDiscriminator(nn.Module):
    """Per-rate backbones + one shared 3x3 head (reference
    multirate_clic21_gvae_discriminator.py 'SharedHead' variant)."""

    rate_level: int = 5
    in_ch: int = 3
    out_ch: int = 1
    main_ch: int = 64
    norm_type: str = "none"

    def setup(self):
        self.backbones = [
            _Clic21Backbone(self.in_ch, self.main_ch, self.out_ch,
                            self.norm_type, head=False, name=f"backbone_{i}")
            for i in range(self.rate_level)
        ]
        self.head = Conv2d(self.out_ch, 3, 1, 1, name="head")

    def __call__(self, x: Array, rate_ind: Union[int, Array],
                 train: bool = True, **kwargs) -> Array:
        if self.is_initializing():
            feats = [b(x, train) for b in self.backbones]
            return self.head(feats[0])
        if isinstance(rate_ind, (int, float)):
            return self.head(self.backbones[int(rate_ind)](x, train))
        idx = jnp.asarray(rate_ind).reshape(-1)[0].astype(jnp.int32)
        feat = jax.lax.switch(
            idx, [(lambda v, b=b: b(v, train)) for b in self.backbones], x)
        return self.head(feat)


@DISCRIMINATOR_REGISTRY.register()
class MultirateSeparateClic21GvaeDiscriminator(ModuleListDiscriminator):
    """Fully separate per-rate discriminators (alias of the module-list
    pattern with the CLIC21 backbone as sub-D)."""

    _subd_type: str = "CLIC21GVAEDiscriminator"


@DISCRIMINATOR_REGISTRY.register()
class RateCondClic21GvaeDiscriminator(nn.Module):
    """One-hot rate-conditioned single discriminator: the rate index is
    broadcast as extra input planes (reference 'SharedRateCond' variant)."""

    rate_level: int = 5
    in_ch: int = 3
    out_ch: int = 1
    main_ch: int = 64
    norm_type: str = "none"

    @nn.compact
    def __call__(self, x: Array, rate_ind: Union[int, Array],
                 train: bool = True, **kwargs) -> Array:
        n, h, w, _ = x.shape
        idx = jnp.asarray(rate_ind).reshape(-1)[0].astype(jnp.int32)
        onehot = jax.nn.one_hot(idx, self.rate_level, dtype=x.dtype)
        cond = jnp.broadcast_to(onehot[None, None, None, :],
                                (n, h, w, self.rate_level))
        inp = jnp.concatenate([x, cond], axis=-1)
        return _Clic21Backbone(self.in_ch + self.rate_level, self.main_ch,
                               self.out_ch, self.norm_type, name="model")(
            inp, train)


@DISCRIMINATOR_REGISTRY.register()
class MultirateSharedRateCondClic21GvaeDiscriminator(
        RateCondClic21GvaeDiscriminator):
    """Alias under the reference's class name so any reference config
    resolves unchanged (multirate_clic21_gvae_discriminator.py:252)."""
