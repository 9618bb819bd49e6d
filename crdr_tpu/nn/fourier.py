"""Fourier embedding of the realism weight beta (reference: fourier_cond.py:12-37).

beta in [0, max_beta] -> normalize to [-1, 1] -> [sin(x*2^l), cos(x*2^l)] for l < L
(optionally * pi).  The embedding is parameterless and gradient-stopped, matching the
reference's ``.detach()``.
"""

from __future__ import annotations

import math
from typing import Union

import jax
import jax.numpy as jnp

Array = jax.Array


def fourier_embed(beta: Union[float, Array], L: int, max_beta: float,
                  use_pi: bool = True, include_x: bool = False) -> Array:
    """Returns [1, 2L] (or [1, 2L+1] with include_x)."""
    beta = jnp.asarray(beta, jnp.float32).reshape(-1)  # [N], typically [1]
    freq = jnp.exp2(jnp.arange(L, dtype=jnp.float32))
    if use_pi:
        freq = freq * math.pi
    norm = (beta / max_beta - 0.5) * 2.0  # [-1, 1]
    ang = norm[:, None] * freq[None, :]   # [N, L]
    out = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)  # [N, 2L]
    if include_x:
        out = jnp.concatenate([norm[:, None], out], axis=-1)
    return jax.lax.stop_gradient(out)
