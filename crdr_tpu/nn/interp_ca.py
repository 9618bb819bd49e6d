"""Interpolated Channel Attention — the continuous variable-rate mechanism.

Contract (reference src/models/layer/interp_channel_attention.py:16-73):
per rate level a learned per-channel gain (and optional bias); a fractional
``rate_ind`` linearly interpolates between the floor/ceil level vectors:

    l = floor(ind); r = min(l+1, L-1); alpha = r - ind
    w = weight[l] * alpha + weight[r] * (1 - alpha)
    x = actv(w) * x (+ b)

Softplus activation initialised at log(e-1) so the initial gain is exactly 1.
Parameters are stored as [rate_level, C] (the reference's trailing 1x1 spatial
dims are squeezed at import).
"""

from __future__ import annotations

import math
from typing import Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array


class InterpChAtt(nn.Module):
    ch: int
    rate_level: int
    actv: str = "identity"
    use_interp: bool = False
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: Array, rate_ind: Union[float, Array]) -> Array:
        if self.actv == "softplus":
            w_init_val = math.log(math.e - 1.0)
        else:
            w_init_val = 1.0
        weight = self.param(
            "weight", lambda k, s: jnp.full(s, w_init_val, jnp.float32),
            (self.rate_level, self.ch))
        rate_ind = jnp.asarray(rate_ind, jnp.float32).reshape(-1)  # [N] or [1]

        if self.use_interp:
            w = _interp_rows(weight, rate_ind, self.rate_level)
        else:
            w = jnp.take(weight, rate_ind.astype(jnp.int32), axis=0)

        actv = {"identity": lambda v: v, "relu": nn.relu,
                "softplus": jax.nn.softplus}[self.actv]
        y = actv(w)[:, None, None, :].astype(x.dtype) * x
        if self.use_bias:
            bias = self.param(
                "bias", lambda k, s: jnp.zeros(s, jnp.float32),
                (self.rate_level, self.ch))
            if self.use_interp:
                b = _interp_rows(bias, rate_ind, self.rate_level)
            else:
                b = jnp.take(bias, rate_ind.astype(jnp.int32), axis=0)
            y = y + b[:, None, None, :].astype(x.dtype)
        return y


def _interp_rows(table: Array, ind: Array, rate_level: int) -> Array:
    """Linear interpolation between adjacent rows of [L, C] at fractional ind [N]."""
    l = jnp.floor(ind)
    r = jnp.minimum(l + 1.0, float(rate_level - 1))
    alpha = (r - ind)[:, None]
    wl = jnp.take(table, l.astype(jnp.int32), axis=0)
    wr = jnp.take(table, r.astype(jnp.int32), axis=0)
    return wl * alpha + wr * (1.0 - alpha)
