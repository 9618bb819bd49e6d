"""Fused GDN as a Pallas TPU kernel.

GDN: y = x * (beta + x^2 @ gamma)^(+-1/2).  XLA emits this as a matmul plus
several elementwise HLOs with HBM round trips between them; the kernel below
computes the whole thing in one VMEM pass per row tile: square on the VPU,
x^2 @ gamma on the MXU, rsqrt + multiply on the VPU, one HBM read and one HBM
write per element.

The wrapper flattens NHWC to (M, C), pads M to the row-tile, and falls back to
plain XLA when Pallas is unavailable (e.g. CPU tests run interpret=True).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

Array = jax.Array

_TILE_M = 256


def _gdn_kernel(x_ref, gamma_ref, beta_ref, out_ref, *, inverse: bool):
    x = x_ref[:]
    norm = jnp.dot(x * x, gamma_ref[:], preferred_element_type=jnp.float32)
    norm = norm + beta_ref[:]
    if inverse:
        out_ref[:] = x * jnp.sqrt(norm)
    else:
        out_ref[:] = x * jax.lax.rsqrt(norm)


@functools.partial(jax.jit, static_argnames=("inverse", "interpret"))
def pallas_gdn(x: Array, beta: Array, gamma: Array, inverse: bool = False,
               interpret: bool = False) -> Array:
    """x: NHWC (or any [..., C]); beta [C]; gamma [C_out, C_in] (torch conv1x1
    layout, as stored by nn.norm.GDN)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    C = x.shape[-1]
    xf = x.reshape(-1, C)
    M = xf.shape[0]
    pad = (-M) % _TILE_M
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    Mp = xf.shape[0]

    # gamma is stored [C_out, C_in]; the contraction x^2 @ gamma^T matches
    # einsum("mc,oc->mo") in nn.norm.GDN
    gamma_t = gamma.T.astype(jnp.float32)
    beta_row = beta.reshape(1, C).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_gdn_kernel, inverse=inverse),
        out_shape=jax.ShapeDtypeStruct((Mp, C), xf.dtype),
        grid=(Mp // _TILE_M,),
        in_specs=[
            pl.BlockSpec((_TILE_M, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_M, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xf, gamma_t, beta_row)

    if pad:
        out = out[:M]
    return out.reshape(orig_shape)


def gdn_reference(x: Array, beta: Array, gamma: Array,
                  inverse: bool = False) -> Array:
    """Plain-XLA GDN (identical math; fallback + test oracle)."""
    norm = jnp.einsum("...c,oc->...o", x * x, gamma) + beta
    return x * (jnp.sqrt(norm) if inverse else jax.lax.rsqrt(norm))


def use_pallas() -> bool:
    """Pallas path opt-in: CRDR_PALLAS=1 and a TPU backend present."""
    if os.environ.get("CRDR_PALLAS", "0") != "1":
        return False
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False
