"""Conv primitives with PyTorch-equivalent semantics, NHWC layout (TPU-native).

The reference computes in NCHW with torch Conv2d/ConvTranspose2d.  On TPU the
native layout is NHWC with HWIO kernels; these modules reproduce torch's output
values exactly (same padding rules, same transposed-conv geometry including
``output_padding``) so that imported reference weights give bit-comparable
activations, while letting XLA tile the convs onto the MXU.

Initialization matches torch defaults (kaiming-uniform a=sqrt(5) == U(±1/sqrt(fan_in)))
so that from-scratch training dynamics are comparable.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array
InitFn = Callable[..., Array]


def _pair(v: Union[int, Tuple[int, int]]) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


def torch_conv_weight_init(fan_in: int) -> InitFn:
    """torch Conv2d/Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def dcgan_normal_init(stddev: float = 0.02) -> InitFn:
    """DCGAN-style N(0, 0.02) init used when ``weight_init: True``
    (reference elic_interpca_beta_cond_autoencoder.py:30-39)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * stddev

    return init


class Conv2d(nn.Module):
    """torch.nn.Conv2d equivalent on NHWC input; kernel stored HWIO.

    Weight import from torch OIHW: ``w.transpose(2, 3, 1, 0)``.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 3
    stride: Union[int, Tuple[int, int]] = 1
    padding: Union[int, Tuple[int, int]] = 0
    use_bias: bool = True
    w_init: Optional[InitFn] = None
    b_init: Optional[InitFn] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        in_ch = x.shape[-1]
        fan_in = in_ch * kh * kw
        w_init = self.w_init or torch_conv_weight_init(fan_in)
        b_init = self.b_init or torch_conv_weight_init(fan_in)
        w = self.param("weight", w_init, (kh, kw, in_ch, self.features))
        dtype = self.dtype or x.dtype
        dn = jax.lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), w.astype(dtype), (sh, sw),
            [(ph, ph), (pw, pw)], dimension_numbers=dn,
        )
        if self.use_bias:
            b = self.param("bias", b_init, (self.features,))
            y = y + b.astype(dtype)
        return y


class ConvTranspose2d(nn.Module):
    """torch.nn.ConvTranspose2d equivalent on NHWC input.

    Implemented as an input-dilated convolution:
    ``lhs_dilation=stride`` with asymmetric padding
    ``(k-1-p, k-1-p+output_padding)``.  The stored kernel is the
    *spatially-flipped* torch kernel in HWIO layout (I=in, O=out), i.e. weight
    import from torch (in, out, kH, kW) is ``w.transpose(2, 3, 0, 1)`` followed by
    ``flip(axis=(0, 1))`` — done once at import so the forward pass is a single
    fused conv.

    Output size: ``(in-1)*stride - 2*padding + kernel + output_padding``,
    identical to torch.
    """

    features: int
    kernel_size: Union[int, Tuple[int, int]] = 5
    stride: Union[int, Tuple[int, int]] = 2
    padding: Union[int, Tuple[int, int]] = 2
    output_padding: Union[int, Tuple[int, int]] = 1
    use_bias: bool = True
    w_init: Optional[InitFn] = None
    b_init: Optional[InitFn] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.stride)
        ph, pw = _pair(self.padding)
        oph, opw = _pair(self.output_padding)
        in_ch = x.shape[-1]
        # torch fan_in for ConvTranspose2d = out_ch * kh * kw (weight dim 1)
        fan_in = self.features * kh * kw
        w_init = self.w_init or torch_conv_weight_init(fan_in)
        b_init = self.b_init or torch_conv_weight_init(fan_in)
        w = self.param("weight", w_init, (kh, kw, in_ch, self.features))
        dtype = self.dtype or x.dtype
        if (kh, kw, sh, sw, ph, pw, oph, opw) == (5, 5, 2, 2, 2, 2, 1, 1):
            # TPU fast path: input-dilated convs lower poorly on the MXU
            # (mostly-zero systolic passes); the exact equivalent below runs a
            # regular 3x3 conv at input resolution with 4x output channels and
            # interleaves the four stride-2 output phases (depth-to-space).
            y = _deconv5s2_phase(x.astype(dtype), w.astype(dtype))
        else:
            dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                                ("NHWC", "HWIO", "NHWC"))
            pads = [(kh - 1 - ph, kh - 1 - ph + oph),
                    (kw - 1 - pw, kw - 1 - pw + opw)]
            y = jax.lax.conv_general_dilated(
                x.astype(dtype), w.astype(dtype), (1, 1), pads,
                lhs_dilation=(sh, sw), dimension_numbers=dn,
            )
        if self.use_bias:
            b = self.param("bias", b_init, (self.features,))
            y = y + b.astype(dtype)
        return y


class Dense(nn.Module):
    """torch.nn.Linear equivalent; weight stored (in, out).

    Weight import from torch (out, in): ``w.T``.
    """

    features: int
    use_bias: bool = True
    w_init: Optional[InitFn] = None
    b_init: Optional[InitFn] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_ch = x.shape[-1]
        w_init = self.w_init or torch_conv_weight_init(in_ch)
        b_init = self.b_init or torch_conv_weight_init(in_ch)
        w = self.param("weight", w_init, (in_ch, self.features))
        y = jnp.dot(x, w.astype(x.dtype))
        if self.use_bias:
            b = self.param("bias", b_init, (self.features,))
            y = y + b.astype(x.dtype)
        return y


def _deconv5s2_phase(x: Array, w: Array) -> Array:
    """Exact phase decomposition of ConvTranspose2d(k=5, s=2, p=2, op=1).

    With our stored (pre-flipped) kernel w[5,5,I,O], output position parity
    selects which taps contribute:
      even phase (per dim): taps w[0], w[2], w[4]  -> 3-tap kernel
      odd  phase (per dim): taps w[1], w[3]        -> [0, w1, w3]
    so the whole op is one 3x3 SAME conv producing 4*O channels followed by a
    2x depth-to-space.  Identical values, MXU-dense.
    """
    O = w.shape[-1]
    zeros_row = jnp.zeros_like(w[:1])
    k_even_r = w[0::2]                                     # [3,5,I,O]
    k_odd_r = jnp.concatenate([zeros_row, w[1::2]], 0)     # [3,5,I,O]

    def split_cols(k):  # [3,5,I,O] -> even/odd col kernels [3,3,I,O]
        zc = jnp.zeros_like(k[:, :1])
        return k[:, 0::2], jnp.concatenate([zc, k[:, 1::2]], 1)

    kee, keo = split_cols(k_even_r)
    koe, koo = split_cols(k_odd_r)
    # channel layout must match pixel_shuffle: c = o*4 + pr*2 + pc
    kern = jnp.stack([kee, keo, koe, koo], axis=-1)        # [3,3,I,O,4]
    kern = kern.reshape(*kern.shape[:3], O * 4)
    dn = jax.lax.conv_dimension_numbers(x.shape, kern.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, kern, (1, 1), [(1, 1), (1, 1)],
                                     dimension_numbers=dn)
    return pixel_shuffle(y, 2)


def pixel_shuffle(x: Array, factor: int) -> Array:
    """NHWC pixel shuffle matching torch.nn.PixelShuffle channel ordering.

    torch PixelShuffle on NCHW maps channel c = c_out * r^2 + r1 * r + r2 to
    spatial offsets (r1, r2); we replicate that ordering on NHWC so imported
    weights behave identically.
    """
    n, h, w, c = x.shape
    r = factor
    assert c % (r * r) == 0
    c_out = c // (r * r)
    x = x.reshape(n, h, w, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # n, h, r1, w, r2, c_out
    return x.reshape(n, h * r, w * r, c_out)
