"""Quantization / bounding primitives shared by the entropy models.

* ``ste_round``: straight-through rounding (reference ste_round.py:4-5).
* ``lower_bound``: max(x, bound) with CompressAI's LowerBound gradient rule —
  gradients pass when x >= bound OR when the gradient pushes x upward.
* ``standardized_cumulative``: Gaussian CDF via erfc, the exact formulation
  CompressAI uses (0.5 * erfc(-x / sqrt(2))) for likelihood parity.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

Array = jax.Array


def ste_round(x: Array) -> Array:
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


@jax.custom_vjp
def lower_bound(x: Array, bound: float) -> Array:
    return jnp.maximum(x, bound)


def _lower_bound_fwd(x, bound):
    return jnp.maximum(x, bound), (x, bound)


def _lower_bound_bwd(res, g):
    x, bound = res
    pass_through = (x >= bound) | (g < 0)
    return (jnp.where(pass_through, g, 0.0), None)


lower_bound.defvjp(_lower_bound_fwd, _lower_bound_bwd)

_SQRT2 = math.sqrt(2.0)


def standardized_cumulative(x: Array) -> Array:
    """Phi(x) computed as 0.5 * erfc(-x / sqrt(2)) (CompressAI formulation)."""
    return 0.5 * jax.lax.erfc(-x / _SQRT2)


def standardized_quantile(q: float) -> float:
    """Inverse standard-normal CDF (host-side scalar; used to size CDF supports)."""
    from scipy.stats import norm

    return float(norm.ppf(q))


def uniform_noise(key: jax.Array, shape, dtype=jnp.float32) -> Array:
    return jax.random.uniform(key, shape, dtype, -0.5, 0.5)
