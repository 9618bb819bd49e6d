"""Uniform-shape checkerboard decode: TWO compiled programs for the whole
slice loop (phase A: channel-context params + anchor indexes; phase B:
anchor reconstruct + spatial delta + non-anchor indexes).

Mirrors ops/charm_uniform.py: the decoded-support lives in a fixed
zero-padded buffer, per-slice weights are zero-padded/stacked with a leading
slice axis and gathered by a traced index, so every slice reuses the same two
XLA programs (the naive loop compiled 3 programs PER slice).  Outputs are
bit-identical to the per-slice computation.

Reconstruction contract (subnet/context_model/checkerboard.py decode path):
  y_a  = (sym_a + mu) * amask
  mu_c = mu + d_mu * (1-amask); sigma_c likewise (spatial 5x5 conv on y_a)
  y_na = (sym_na + mu_c) * (1-amask)
  y    = y_a + y_na + 0.5*tanh(lrp([hyper_mean | support | y]))
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..subnet.context_model.checkerboard import anchor_mask
from .charm_uniform import _slice_transform, pack_charm_weights

Array = jax.Array


def pack_cb_weights(cm_params: Dict, num_slices: int, slice_ch: int,
                    hyper_ch: int, max_support: int) -> Dict[str, np.ndarray]:
    """Charm packing (mean/scale/lrp SliceTransforms share the layout) plus
    the per-slice spatial 5x5 convs (uniform shape already — just stacked)."""
    out = pack_charm_weights(cm_params, num_slices, slice_ch, hyper_ch,
                             max_support)
    ws, bs = [], []
    for i in range(num_slices):
        p = cm_params[f"spatial_transforms_{i}"]
        ws.append(np.asarray(p["weight"], np.float32))
        bs.append(np.asarray(p["bias"], np.float32))
    out["spat_w"] = np.ascontiguousarray(np.stack(ws))
    out["spat_b"] = np.ascontiguousarray(np.stack(bs))
    return out


def _indexes(sigma: Array, scale_table: Array, scale_bound: float) -> Array:
    sigma = jnp.maximum(sigma, scale_bound)
    return jnp.minimum(jnp.searchsorted(scale_table, sigma, side="left"),
                       len(scale_table) - 1).astype(jnp.int32)


def cb_phase_a(packed: Dict[str, Array], slice_idx: Array, hyper_mean: Array,
               hyper_scale: Array, support_buf: Array, sym_na_prev: Array,
               y_a_prev: Array, mu_c_prev: Array, scale_table: Array,
               scale_bound: float, num_slices: int, slice_ch: int,
               max_support: int, actv: str = "relu"
               ) -> Tuple[Array, Array, Array, Array, Array]:
    """For call ``slice_idx = i`` (i in 0..num_slices):

    * if i > 0: finish slice i-1 — non-anchor reconstruct from
      (sym_na_prev, mu_c_prev), add the device-resident anchors, LRP — and
      write it into the support buffer (while it is a support slice);
    * if i < num_slices: (mu_i, sigma_i) from the channel context and the
      rANS indexes for the ANCHOR half (full-grid; host extracts anchors).

    Returns (y_prev, support_buf, mu, sigma, anchor_indexes)."""
    i = jnp.asarray(slice_idx, jnp.int32)
    prev = jnp.maximum(i - 1, 0)
    h, w = hyper_mean.shape[1:3]
    amask = anchor_mask(h, w, hyper_mean.dtype)[None, :, :, None]

    y_prev = y_a_prev + (sym_na_prev + mu_c_prev) * (1.0 - amask)
    lrp_in = jnp.concatenate([hyper_mean, support_buf, y_prev], axis=-1)
    lrp = 0.5 * jnp.tanh(_slice_transform(packed, "lrp", prev, lrp_in, actv))
    y_prev = jnp.where(i > 0, y_prev + lrp, y_prev)

    write = (i >= 1) & (prev < max_support)
    offset = jnp.clip(prev, 0, max_support - 1) * slice_ch
    updated = jax.lax.dynamic_update_slice(support_buf, y_prev,
                                           (0, 0, 0, offset))
    support_buf = jnp.where(write, updated, support_buf)

    cur = jnp.minimum(i, num_slices - 1)
    mean_in = jnp.concatenate([hyper_mean, support_buf], axis=-1)
    scale_in = jnp.concatenate([hyper_scale, support_buf], axis=-1)
    mu = _slice_transform(packed, "mean", cur, mean_in, actv)
    sigma = _slice_transform(packed, "scale", cur, scale_in, actv)
    return y_prev, support_buf, mu, sigma, \
        _indexes(sigma, scale_table, scale_bound)


def cb_phase_b(packed: Dict[str, Array], slice_idx: Array, sym_a: Array,
               mu: Array, sigma: Array, scale_table: Array,
               scale_bound: float) -> Tuple[Array, Array, Array, Array]:
    """Anchors of slice i: reconstruct from (sym_a, mu), run the spatial conv
    for the combined non-anchor params, emit the non-anchor rANS indexes.

    Returns (y_a, mu_c, sigma_c, nonanchor_indexes)."""
    i = jnp.asarray(slice_idx, jnp.int32)
    h, w = mu.shape[1:3]
    amask = anchor_mask(h, w, mu.dtype)[None, :, :, None]

    y_a = (sym_a + mu) * amask
    sw = jnp.take(packed["spat_w"], i, axis=0)
    sb = jnp.take(packed["spat_b"], i, axis=0)
    dn = jax.lax.conv_dimension_numbers(y_a.shape, sw.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    delta = jax.lax.conv_general_dilated(
        y_a, sw, (1, 1), [(2, 2), (2, 2)], dimension_numbers=dn) + sb
    d_mu, d_sigma = jnp.split(delta, 2, axis=-1)
    mu_c = mu + d_mu * (1.0 - amask)
    sigma_c = sigma + d_sigma * (1.0 - amask)
    return y_a, mu_c, sigma_c, _indexes(sigma_c, scale_table, scale_bound)


def cb_reconstruct_last(packed: Dict[str, Array], hyper_mean: Array,
                        support_buf: Array, sym_na: Array, y_a: Array,
                        mu_c: Array, num_slices: int, actv: str = "relu"
                        ) -> Array:
    """Finish the LAST slice outside the loop (the decode chain's tail):
    non-anchor reconstruct + LRP — the ``y_prev`` computation of
    :func:`cb_phase_a` at ``slice_idx == num_slices``, without the dead
    params/indexes work (the checkerboard analog of
    ``charm_uniform.uniform_reconstruct_last``)."""
    h, w = hyper_mean.shape[1:3]
    amask = anchor_mask(h, w, hyper_mean.dtype)[None, :, :, None]
    y_prev = y_a + (sym_na + mu_c) * (1.0 - amask)
    lrp_in = jnp.concatenate([hyper_mean, support_buf, y_prev], axis=-1)
    lrp = 0.5 * jnp.tanh(_slice_transform(
        packed, "lrp", jnp.int32(num_slices - 1), lrp_in, actv))
    return y_prev + lrp


