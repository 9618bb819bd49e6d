"""Normalization layers: GDN, ChannelNorm2D, InstanceNorm2D (NHWC).

* GDN follows CompressAI's formulation (used by the reference's Balle18/Cheng20
  families, cheng_resblock.py:8): y = x / sqrt(beta + gamma * x^2) with
  non-negative reparameterized beta/gamma (sqrt storage with a 2^-18 pedestal).
* ChannelNorm2D follows HiFiC (reference hific_norm.py:29-59): moments over the
  channel axis, unbiased variance, eps=1e-3, affine.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..entropy.ops import lower_bound

Array = jax.Array

_REPARAM_OFFSET = 2.0 ** -18


class NonNegativeParam:
    """CompressAI NonNegativeParametrizer: store sqrt(x + pedestal), recover
    lower_bound(stored)^2 - pedestal."""

    def __init__(self, minimum: float = 0.0):
        self.pedestal = _REPARAM_OFFSET ** 2
        self.bound = (minimum + _REPARAM_OFFSET ** 2) ** 0.5

    def init(self, x: Array) -> Array:
        return jnp.sqrt(jnp.maximum(x + self.pedestal, self.pedestal))

    def __call__(self, stored: Array) -> Array:
        return lower_bound(stored, self.bound) ** 2 - self.pedestal


class GDN(nn.Module):
    """Generalized divisive normalization: x * (beta + gamma conv x^2)^{-1/2}
    (or ^{+1/2} for the inverse)."""

    ch: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        beta_rp = NonNegativeParam(self.beta_min)
        gamma_rp = NonNegativeParam()
        beta = self.param(
            "beta", lambda k, s: beta_rp.init(jnp.ones(s, jnp.float32)),
            (self.ch,))
        gamma = self.param(
            "gamma",
            lambda k, s: gamma_rp.init(
                self.gamma_init * jnp.eye(self.ch, dtype=jnp.float32)),
            (self.ch, self.ch))
        b = beta_rp(beta)
        g = gamma_rp(gamma)  # [C_out, C_in] (torch conv1x1 weight layout)
        from ..ops.pallas_gdn import pallas_gdn, use_pallas

        if use_pallas():
            return pallas_gdn(x, b, g, inverse=self.inverse)
        norm = jnp.einsum("nhwc,oc->nhwo", x * x, g) + b
        if self.inverse:
            return x * jnp.sqrt(norm)
        return x * jax.lax.rsqrt(norm)


class ChannelNorm2D(nn.Module):
    """HiFiC channel-dimension normalization (unbiased var, eps 1e-3)."""

    ch: int
    eps: float = 1e-3
    affine: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True, ddof=1)
        y = (x - mu) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            gamma = self.param("gamma", lambda k, s: jnp.ones(s, jnp.float32),
                               (self.ch,))
            beta = self.param("beta", lambda k, s: jnp.zeros(s, jnp.float32),
                              (self.ch,))
            y = gamma * y + beta
        return y


class InstanceNorm2D(nn.Module):
    """torch InstanceNorm2d equivalent (biased var, eps 1e-5, affine)."""

    ch: int
    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        mu = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        y = (x - mu) * jax.lax.rsqrt(var + self.eps)
        if self.affine:
            gamma = self.param("gamma", lambda k, s: jnp.ones(s, jnp.float32),
                               (self.ch,))
            beta = self.param("beta", lambda k, s: jnp.zeros(s, jnp.float32),
                              (self.ch,))
            y = gamma * y + beta
        return y


def make_norm(norm_type: Optional[str], ch: int, name: str) -> nn.Module:
    """Factory covering the reference's norm_type switch ('CN'/'IN'/'none')."""
    if norm_type in (None, "none"):
        return None
    if norm_type == "CN":
        return ChannelNorm2D(ch, name=name)
    if norm_type == "IN":
        return InstanceNorm2D(ch, name=name)
    raise ValueError(f"unsupported norm_type: {norm_type}")
