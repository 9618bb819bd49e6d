"""On-device vectorized rans32 lane decoder (the "device wire" consumer).

Decodes the lane-interleaved streams produced by ``runtime/lane_rans.py``
entirely inside a compiled program: all K lanes advance one symbol per scan
step with dense vector ops — a one-hot (HIGHEST-precision, hence exact for
the <= 2^16 integer CDF values) table expansion, a comparison-count CDF
search, and a masked uint32 state/pointer update.  No host round trips: the
entire Charm autoregressive decode, entropy decoding included, becomes ONE
device dispatch (see BaseModel._decompress_charm_device).

This has no counterpart in the reference, whose decode is host-serial by
construction (minnen20_charm_context_model.py:226-266 pulls symbols from a
CPU rANS stream between every slice).  It is a TPU-first design: the lane
dimension rides the VPU lanes, the table expansion rides the MXU, and the
serial dimension (symbols per lane) is a rolled ``lax.scan``.

Integer-exactness invariants (why this is bit-safe in a float-happy
compiler):
  * CDF values are integers <= 2^16: exact in f32; the one-hot expansion
    uses ``Precision.HIGHEST`` so no bf16 truncation occurs on TPU;
  * slot extraction multiplies a row by a 0/1 mask and sums — a single
    nonzero term, exact at any float precision;
  * state arithmetic stays in uint32 (wrap-free by the rans32 range
    invariants, see csrc/rans.cpp lane section).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array

_HI = jax.lax.Precision.HIGHEST


def init_lane_state(words: Array) -> Tuple[Array, Array]:
    """words: [..., K, W] uint32 (16-bit values).  Returns (states, ptrs):
    lane state seeded from the first two words, read cursor at 2."""
    states = (words[..., 0] << 16) | words[..., 1]
    ptrs = jnp.full(words.shape[:-1], 2, jnp.int32)
    return states, ptrs


def expand_tables(idx: Array, cdf: Array, cdf_len: Array, offset: Array
                  ) -> Tuple[Array, Array, Array]:
    """Per-symbol table rows via an exact one-hot matmul.

    idx: [..., M] int32 in [0, R).  cdf: [R, L] int32, cdf_len/offset: [R].
    Returns (rows [..., M, L] f32, lens [..., M] f32, offs [..., M] f32).
    """
    oh = jax.nn.one_hot(idx, cdf.shape[0], dtype=jnp.float32)
    rows = jnp.matmul(oh, cdf.astype(jnp.float32), precision=_HI)
    lens = jnp.matmul(oh, cdf_len.astype(jnp.float32), precision=_HI)
    offs = jnp.matmul(oh, offset.astype(jnp.float32), precision=_HI)
    return rows, lens, offs


def lane_decode_round(states: Array, ptrs: Array, words: Array,
                      rows: Array, lens: Array, offs: Array, m: int
                      ) -> Tuple[Array, Array, Array]:
    """Decode one autoregressive round of ``m`` symbols across K lanes.

    states/ptrs: [N, K]; words: [N, K, W] uint32 (16-bit values);
    rows: [N, m, L] f32 (from :func:`expand_tables`), lens/offs: [N, m].
    Symbol p goes to lane p % K (the encoder's per-round assignment).
    Returns (values [N, m] int32, states, ptrs).
    """
    n, k = states.shape
    big_l = rows.shape[-1]
    t_steps = -(-m // k)  # ceil
    pad = t_steps * k - m

    def pad_t(x, fill=0.0):
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0))[:x.ndim],
                    constant_values=fill)
        return jnp.moveaxis(x.reshape((n, t_steps, k) + x.shape[2:]), 1, 0)

    rows_t = pad_t(rows)                      # [T, N, K, L]
    lens_t = pad_t(lens, 3.0)                 # len>=3 keeps search sane
    offs_t = pad_t(offs)
    # active[t, j]: symbol t*K + j exists (same for every batch element)
    tj = (jnp.arange(t_steps)[:, None] * k + jnp.arange(k)[None, :])
    active_t = tj < m                         # [T, K]
    pos = jnp.arange(big_l, dtype=jnp.float32)
    w_max = words.shape[-1] - 1

    def step(carry, xs):
        st, pt = carry
        row, ln, off, act = xs
        mod = (st & jnp.uint32(0xFFFF))
        modf = mod.astype(jnp.float32)[..., None]
        # CDF search: s = #{p < len-1 : row[p] <= mod} - 1  (row[0] == 0)
        valid = pos[None, None, :] < (ln[..., None] - 1.0)
        s = jnp.sum(jnp.where((row <= modf) & valid, 1.0, 0.0),
                    axis=-1) - 1.0            # [N, K] f32, exact small int
        sel = jax.nn.one_hot(s.astype(jnp.int32), big_l, dtype=jnp.float32)
        low = jnp.sum(row * sel, axis=-1)     # exact: single nonzero term
        sel1 = jax.nn.one_hot(s.astype(jnp.int32) + 1, big_l,
                              dtype=jnp.float32)
        freq = jnp.sum(row * sel1, axis=-1) - low
        value = (s + off).astype(jnp.int32)
        # uint32 state update + at-most-one-word renorm
        low_u = low.astype(jnp.uint32)
        freq_u = freq.astype(jnp.uint32)
        x_new = freq_u * (st >> 16) + mod - low_u
        need = x_new < jnp.uint32(1 << 16)
        word = jnp.take_along_axis(
            words, jnp.minimum(pt, w_max)[..., None].astype(jnp.int32),
            axis=-1)[..., 0]
        x_ren = jnp.where(need, (x_new << 16) | word, x_new)
        upd = act[None, :]
        st = jnp.where(upd, x_ren, st)
        pt = jnp.where(upd & need, pt + 1, pt)
        return (st, pt), value

    (states, ptrs), vals_t = jax.lax.scan(
        step, (states, ptrs), (rows_t, lens_t, offs_t, active_t))
    vals = jnp.moveaxis(vals_t, 0, 1).reshape(n, t_steps * k)[:, :m]
    return vals, states, ptrs


def apply_fixups(vals: Array, fix_pos: Array, fix_val: Array,
                 fix_active: Array, lo: int | Array, m: int) -> Array:
    """Overlay escape fixups onto one round's decoded values.

    vals: [N, m] int32; fix_pos: [N, F] global flat positions; fix_val:
    [N, F]; fix_active: [N, F] bool (slot used).  Fixups with position in
    [lo, lo + m) land at (pos - lo); others are dropped.
    """
    local = fix_pos - lo
    in_round = fix_active & (local >= 0) & (local < m)
    n = vals.shape[0]
    flat = vals.reshape(-1)
    batch = jnp.arange(n, dtype=fix_pos.dtype)[:, None]
    # out-of-round entries scatter out of bounds -> dropped
    flat_idx = (batch * m + jnp.where(in_round, local, n * m)).reshape(-1)
    out = flat.at[flat_idx].set(fix_val.reshape(-1).astype(vals.dtype),
                                mode="drop")
    return out.reshape(n, m)
