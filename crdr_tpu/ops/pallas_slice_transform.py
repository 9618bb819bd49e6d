"""Fused Charm SliceTransform as a Pallas TPU kernel (opt-in fast codec mode).

A SliceTransform is conv5x5 -> relu -> conv5x5 -> relu -> conv3x3 on a small
latent grid (H/16 x W/16).  XLA materializes both intermediates in HBM; this
kernel keeps everything in VMEM: each KxK conv is computed as K^2 shifted
matmuls (MXU) over a zero-padded VMEM buffer, with ReLU fused in between.

Compute dtype is bfloat16 with f32 accumulation.  Because BOTH the encoder
scan and the serial decoder use the same transform, self-consistency of the
bitstream is preserved; absolute mu/sigma values differ slightly from the f32
path, so this stays opt-in (CRDR_PALLAS=1) and is not used for
reference-checkpoint parity runs.

The whole latent must fit VMEM (true for Kodak/CLIC-size latents; the wrapper
falls back to plain XLA above ~64x96 latents or when Pallas is unavailable).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

# conservative VMEM budget check: latent positions above this use the XLA path
_MAX_POSITIONS = 64 * 96


def _conv_taps(read, w_ref, H: int, W: int, K: int, cin: int, cout: int):
    """Sum_{t<K*K} read(dy, dx) @ w[t]; ``read`` slices the padded input REF
    (Mosaic lowers ref slices; slicing a loaded value does not lower).
    Returns f32 (H*W, cout)."""
    acc = jnp.zeros((H * W, cout), jnp.float32)
    for t in range(K * K):
        dy, dx = divmod(t, K)
        xs = read(dy, dx).reshape(H * W, cin)
        # explicit DEFAULT precision: the kernel's contract is bf16 compute /
        # f32 accum, and callers trace it under the codec's `highest` scope,
        # which Mosaic rejects for bf16 operands
        acc = acc + jnp.dot(xs, w_ref[t],
                            precision=jax.lax.Precision.DEFAULT,
                            preferred_element_type=jnp.float32)
    return acc


def _fused_kernel(x_ref, w0_ref, b0_ref, w2_ref, b2_ref, w4_ref, b4_ref,
                  out_ref, h0_ref, h1_ref, *, H: int, W: int, cin: int,
                  c0: int, c1: int, cout: int):
    # one grid step = one batch element; blocks carry a leading dim of 1
    # stage 1: conv5x5 (pad 2) + relu -> h0 (padded buffer, border zeroed)
    h0_ref[:] = jnp.zeros_like(h0_ref)
    acc = _conv_taps(lambda dy, dx: x_ref[0, dy:dy + H, dx:dx + W, :],
                     w0_ref, H, W, 5, cin, c0)
    h0 = jax.nn.relu(acc + b0_ref[:]).astype(h0_ref.dtype)
    h0_ref[2:2 + H, 2:2 + W, :] = h0.reshape(H, W, c0)

    # stage 2: conv5x5 (pad 2) + relu -> h1
    h1_ref[:] = jnp.zeros_like(h1_ref)
    acc = _conv_taps(lambda dy, dx: h0_ref[dy:dy + H, dx:dx + W, :],
                     w2_ref, H, W, 5, c0, c1)
    h1 = jax.nn.relu(acc + b2_ref[:]).astype(h1_ref.dtype)
    h1_ref[1:1 + H, 1:1 + W, :] = h1.reshape(H, W, c1)

    # stage 3: conv3x3 (pad 1) -> out (f32)
    acc = _conv_taps(lambda dy, dx: h1_ref[dy:dy + H, dx:dx + W, :],
                     w4_ref, H, W, 3, c1, cout)
    out_ref[0] = (acc + b4_ref[:]).reshape(H, W, cout)


@functools.partial(jax.jit,
                   static_argnames=("interpret",))
def pallas_slice_transform(x: Array, w0: Array, b0: Array, w2: Array,
                           b2: Array, w4: Array, b4: Array,
                           interpret: bool = False) -> Array:
    """x: [N, H, W, Cin].  w0: [5,5,Cin,C0], w2: [5,5,C0,C1], w4: [3,3,C1,Cout].

    Returns [N, H, W, Cout] (f32); the batch rides the Pallas grid (one
    image per step, weights resident).  Matches the composed XLA convs up to
    bf16-compute accuracy.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, H, W, cin = x.shape
    c0 = w0.shape[-1]
    c1 = w2.shape[-1]
    cout = w4.shape[-1]

    cd = jnp.bfloat16
    x_pad = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0))).astype(cd)
    w0f = w0.reshape(25, cin, c0).astype(cd)
    w2f = w2.reshape(25, c0, c1).astype(cd)
    w4f = w4.reshape(9, c1, cout).astype(cd)
    b0r = b0.reshape(1, c0).astype(jnp.float32)
    b2r = b2.reshape(1, c1).astype(jnp.float32)
    b4r = b4.reshape(1, cout).astype(jnp.float32)

    kernel = functools.partial(_fused_kernel, H=H, W=W, cin=cin, c0=c0,
                               c1=c1, cout=cout)
    # grid over the batch: each step streams one image's padded latent into
    # VMEM; weights/biases are whole-block (same every step)
    whole = lambda shape: pl.BlockSpec(shape, lambda n: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(N,),
        out_shape=jax.ShapeDtypeStruct((N, H, W, cout), jnp.float32),
        in_specs=[
            pl.BlockSpec((1, H + 4, W + 4, cin), lambda n: (n, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            whole((25, cin, c0)), whole((1, c0)),
            whole((25, c0, c1)), whole((1, c1)),
            whole((9, c1, cout)), whole((1, cout)),
        ],
        out_specs=pl.BlockSpec((1, H, W, cout), lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((H + 4, W + 4, c0), cd),
            pltpu.VMEM((H + 2, W + 2, c1), cd),
        ],
        interpret=interpret,
    )(x_pad, w0f, b0r, w2f, b2r, w4f, b4r)
    return out


def slice_transform_reference(x, w0, b0, w2, b2, w4, b4):
    """Composed-XLA oracle with the same bf16-compute / f32-accum policy."""
    def conv(v, w, b, pad):
        dn = jax.lax.conv_dimension_numbers(v.shape, w.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            v.astype(jnp.bfloat16), w.astype(jnp.bfloat16), (1, 1),
            [(pad, pad), (pad, pad)], dimension_numbers=dn,
            preferred_element_type=jnp.float32)
        return y + b

    h = jax.nn.relu(conv(x, w0, b0, 2)).astype(jnp.bfloat16)
    h = jax.nn.relu(conv(h, w2, b2, 2)).astype(jnp.bfloat16)
    return conv(h, w4, b4, 1)


def fits_fused(h: int, w: int) -> bool:
    return h * w <= _MAX_POSITIONS
