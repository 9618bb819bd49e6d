"""Shared codec-path helpers: precision scopes, bf16 transform casting, the
rate summary, and checkerboard (de)interleaving.  Split out of comp_model.py
(VERDICT r3 item 8); semantics unchanged.  Reference contracts:
rate summary = -sum log2 p / num_pixel (hyperprior_model.py:60-85)."""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

def _checkerboard_serialize(arr: np.ndarray, num_slices: int) -> np.ndarray:
    """NHWC -> 1D symbol order: per slice, anchor subgrids (A1, A2) then
    non-anchor subgrids (NA1, NA2), each channel-major."""
    parts = []
    for s in np.split(arr, num_slices, axis=-1):
        a1 = s[:, 0::2, 0::2]
        a2 = s[:, 1::2, 1::2]
        na1 = s[:, 0::2, 1::2]
        na2 = s[:, 1::2, 0::2]
        for g in (a1, a2, na1, na2):
            parts.append(g.transpose(0, 3, 1, 2).reshape(-1))
    return np.concatenate(parts)


def _merge_np(a1, a2, na1, na2):
    n, h2, w2, c = a1.shape
    out = np.zeros((n, h2 * 2, w2 * 2, c), a1.dtype)
    out[:, 0::2, 0::2] = a1
    out[:, 1::2, 1::2] = a2
    out[:, 0::2, 1::2] = na1
    out[:, 1::2, 0::2] = na2
    return out



class _NullCtx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _precision_scope(prec: Optional[str]):
    """Context manager setting the default matmul precision during tracing."""
    import contextlib

    if prec is None:
        return contextlib.nullcontext()
    return jax.default_matmul_precision(prec)


def _cast_float_tree(tree, dt):
    """Cast every floating leaf of a pytree to ``dt`` (ints/bools pass
    through).  Used to run the side-local transforms in bf16; XLA dead-code-
    eliminates casts of leaves the traced program never touches."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(dt)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, tree)


def _apply_encode_latents(net, p, x, kw, tdt):
    """Analysis + hyper-analysis, optionally in bf16 (``transform_dtype``).
    y/z always come back f32: everything downstream (z-round, hyper-decode,
    context chain, symbolization) is the precision-pinned codec chain."""
    if tdt is not None:
        p = _cast_float_tree(p, tdt)
        x = x.astype(tdt)
        kw = {k: v.astype(tdt) for k, v in kw.items()}
    y, z = net.apply({"params": p}, x,
                     method=lambda n, xx, rate_ind=None:
                     n.encode_latents(xx, rate_ind), **kw)
    return y.astype(jnp.float32), z.astype(jnp.float32)


def _apply_decode(net, p, y_hat, kw, tdt):
    """Synthesis transform, optionally in bf16 (``transform_dtype``); the
    image comes back f32 so the clamp + uint8 rounding keep their exact f32
    semantics (bf16 cannot represent every value in [0, 255])."""
    if tdt is not None:
        p = _cast_float_tree(p, tdt)
        y_hat = y_hat.astype(tdt)
        kw = {k: v.astype(tdt) for k, v in kw.items()}
    img = net.apply({"params": p}, y_hat,
                    method=lambda n, yy, rate_ind=None, beta=None:
                    n.decode(yy, rate_ind, beta), **kw)
    return img.astype(jnp.float32)


def _rate_summary(out: Dict, num_pixel: int) -> Dict:
    def bits(lik):
        axes = tuple(range(1, lik.ndim))
        return -jnp.sum(jnp.log(lik), axis=axes) / jnp.log(2.0)

    y_bpp = bits(out["likelihoods"]["y"]) / num_pixel
    z_bpp = bits(out["likelihoods"]["z"]) / num_pixel
    y_qbpp = bits(out["q_likelihoods"]["y"]) / num_pixel
    z_qbpp = bits(out["q_likelihoods"]["z"]) / num_pixel
    return {
        "bpp": y_bpp + z_bpp,
        "qbpp": y_qbpp + z_qbpp,
        "y_bpp": y_bpp,
        "z_bpp": z_bpp,
    }


