"""Pallas/Mosaic kernel for one lane-rans decode round (opt-in, TPU).

The XLA form (`ops/device_rans.lane_decode_round_instep`) runs T ≈ m/K
tiny steps under ``lax.scan``: per step a one-hot table expansion, a
compare-count CDF search, and a masked uint32 state update.  Even unrolled,
each step round-trips its operands through the XLA buffer machinery.  This
kernel runs the WHOLE round as one Mosaic program: the CDF table, the lane
streams, and the per-symbol indexes live in VMEM for the entire T-step
loop, and the serial state update stays in registers.

Layout choices (everything rides the 128-wide VPU lane dimension):

  * lanes are flattened to ``NK = N * K`` and form the minor (lane) axis of
    every tensor — [Lp, NK] table rows, [W, NK] streams, [1, NK] states;
  * the CDF table is passed PRE-TRANSPOSED and augmented,
    ``cdf_aug_T [Lp, R]`` with row Lp-2 = cdf_len and row Lp-1 = offset, so
    ONE [Lp, R] x [R, NK] matmul per step expands rows, lens and offsets
    together (all values are integers <= 2^16: exact in f32);
  * the uint32 rans32 state update is emulated in int32 — identical low-32
    bit patterns for add/sub/mul/and/or/shift-left, and logical right
    shift as ``(x >> 16) & 0xFFFF`` — so "x < 2^16" is "(x >>l 16) == 0";
  * the renorm word fetch is an exact masked sum over the [W, NK] stream
    buffer (ptr advances by at most one per step).

Bit-exactness: every float op is an exact small-integer computation (the
same contract as ops/device_rans.py); the int32 state emulation reproduces
uint32 bit patterns exactly.  Equality with the XLA forms (and hence the
host C++ coder) is asserted in tests/test_pallas_lane_decode.py via
interpret mode; on hardware the A/B harness re-asserts byte equality
before timing.

No reference counterpart: the reference decodes on the host, serially
(minnen20_charm_context_model.py:226-266).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(idx_ref, words_ref, cdf_ref, st_ref, pt_ref,
            vals_ref, st_out_ref, pt_out_ref, *, t_steps: int, m: int,
            k: int, big_l: int):
    """One decode round: T serial steps over NK lanes (see module doc)."""
    nk = st_ref.shape[-1]
    lp = cdf_ref.shape[0]
    cdf = cdf_ref[:, :]                              # [Lp, R] f32
    # full-width INTEGER row iotas: Mosaic rejects both single-lane column
    # vectors (vector<Nx1>) and float-typed tpu.iota, so build [rows, NK]
    # int32 and convert (exact for these small ranges)
    pos_l = jax.lax.broadcasted_iota(jnp.int32, (lp, nk), 0) \
        .astype(jnp.float32)                                  # [Lp, NK]
    # words_ref is the per-round WINDOW [Tw, NK]: row j holds the word each
    # lane would read after its j-th renorm of this round (built by the
    # caller with one XLA gather).  pt is window-relative, starting at 0.
    pos_w = jax.lax.broadcasted_iota(jnp.int32,
                                     (words_ref.shape[0], nk), 0)
    # lane j of step t decodes flat symbol t*K + (j % K); j // K is the
    # batch element.  active mask depends only on (t, j % K).
    lane_in_k = jax.lax.broadcasted_iota(jnp.int32, (1, nk), 1) % k

    def step(t, carry):
        st, pt = carry                               # [1, NK] int32
        irow = idx_ref[t, :].reshape(1, nk)          # [1, NK] int32
        oh = (jax.lax.broadcasted_iota(jnp.int32, (cdf.shape[1], nk), 0)
              == irow).astype(jnp.float32)           # [R, NK]
        rows = jax.lax.dot_general(
            cdf, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # [Lp, NK]
        ln = rows[big_l:big_l + 1, :]                # [1, NK] (aug row)
        off = rows[big_l + 1:big_l + 2, :]           # [1, NK] (aug row)
        mod_i = st & 0xFFFF                          # [1, NK] int32
        mod_f = mod_i.astype(jnp.float32)
        valid = (pos_l < (ln - 1.0)) & (pos_l < float(big_l))
        s = (jnp.sum(jnp.where((rows <= mod_f) & valid, 1.0, 0.0),
                     axis=0, keepdims=True) - 1.0)   # [1, NK] exact int
        low = jnp.sum(jnp.where(pos_l == s, rows, 0.0), axis=0,
                      keepdims=True)
        hi1 = jnp.sum(jnp.where(pos_l == s + 1.0, rows, 0.0), axis=0,
                      keepdims=True)
        freq_i = (hi1 - low).astype(jnp.int32)
        low_i = low.astype(jnp.int32)
        value = (s + off).astype(jnp.int32)
        # int32-emulated uint32 state update (identical bit patterns)
        hi = (st >> 16) & 0xFFFF
        x_new = freq_i * hi + mod_i - low_i
        need = ((x_new >> 16) & 0xFFFF) == 0         # x_new <u 2^16
        word = jnp.sum(jnp.where(pos_w == pt, words_ref[:, :], 0),
                       axis=0, keepdims=True)        # [1, NK] int32
        x_ren = jnp.where(need, (x_new << 16) | word, x_new)
        act = (t * k + lane_in_k) < m                # [1, NK]
        st = jnp.where(act, x_ren, st)
        pt = jnp.where(act & need, pt + 1, pt)
        vals_ref[pl.ds(t, 1), :] = value
        return st, pt

    st, pt = jax.lax.fori_loop(
        0, t_steps, step, (st_ref[:, :], pt_ref[:, :]))
    st_out_ref[:, :] = st
    pt_out_ref[:, :] = pt


@functools.partial(jax.jit, static_argnames=("m", "interpret"))
def pallas_lane_decode_round(states: Array, ptrs: Array, words: Array,
                             idx: Array, cdf: Array, cdf_len: Array,
                             cdf_off: Array, m: int, interpret: bool = False
                             ) -> Tuple[Array, Array, Array]:
    """Drop-in for ``lane_decode_round_instep`` backed by the Mosaic kernel.

    states [N, K] uint32 / ptrs [N, K] int32 / words [N, K, W] uint32
    (16-bit values) / idx [N, M>=m] int32 / cdf [R, L] int32 / cdf_len,
    cdf_off [R] int32.  Returns (vals [N, m] int32, states, ptrs).
    """
    n, k = states.shape
    nk = n * k
    w = words.shape[-1]
    r, big_l = cdf.shape
    t_steps = -(-m // k)
    lp = _round_up(big_l + 2, 8)          # f32 sublane quantum
    nkp = _round_up(nk, 128)
    pad_nk = nkp - nk

    # augmented, transposed table: [Lp, Rp] f32 with len/off rows; value
    # padding carries 2^17 (> any mod) so it can never win the search, and
    # table-row padding (R -> Rp, lane quantum) is unreachable (idx < R)
    rp = _round_up(r, 128)
    cdf_aug = jnp.full((lp, rp), 131072.0, jnp.float32)
    cdf_aug = cdf_aug.at[:big_l, :r].set(cdf.astype(jnp.float32).T)
    cdf_aug = cdf_aug.at[big_l, :r].set(cdf_len.astype(jnp.float32))
    cdf_aug = cdf_aug.at[big_l + 1, :r].set(cdf_off.astype(jnp.float32))

    # idx in per-step rows: [T, NKp] (pad with row 0; masked inactive)
    idx_p = jnp.pad(idx[:, :m].astype(jnp.int32),
                    ((0, 0), (0, t_steps * k - m)))
    idx_t = jnp.pad(jnp.moveaxis(idx_p.reshape(n, t_steps, k), 1, 0)
                    .reshape(t_steps, nk), ((0, 0), (0, pad_nk)))
    # per-round word WINDOW [Tw, NKp]: each lane renorms at most once per
    # step, so this round touches words[p0 .. p0 + T] only.  One cheap XLA
    # gather here keeps the kernel's fetch a Tw-deep masked sum (Tw ~ T+1,
    # vs the full stream depth W) and the kernel VMEM small.  Index
    # clamping to W-1 reproduces the XLA form's min(pt, w_max) exactly.
    tw = t_steps + 1
    words_flat = words.astype(jnp.int32).reshape(nk, w)
    p0 = ptrs.astype(jnp.int32).reshape(nk)
    wnd_idx = jnp.minimum(p0[:, None] + jnp.arange(tw, dtype=jnp.int32),
                          w - 1)
    wnd = jnp.take_along_axis(words_flat, wnd_idx, axis=1)  # [NK, Tw]
    wnd_t = jnp.pad(jnp.moveaxis(wnd, 0, 1), ((0, 0), (0, pad_nk)))
    st_i = jnp.pad(jax.lax.bitcast_convert_type(states, jnp.int32)
                   .reshape(1, nk), ((0, 0), (0, pad_nk)))  # [1, NKp]
    pt_i = jnp.zeros((1, nkp), jnp.int32)  # window-relative cursor

    kern = functools.partial(_kernel, t_steps=t_steps, m=m, k=k,
                             big_l=big_l)
    vals_t, st_o, pt_o = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((t_steps, nkp), jnp.int32),
            jax.ShapeDtypeStruct((1, nkp), jnp.int32),
            jax.ShapeDtypeStruct((1, nkp), jnp.int32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 3,
        interpret=interpret,
    )(idx_t, wnd_t, cdf_aug, st_i, pt_i)

    vals = jnp.moveaxis(
        vals_t[:, :nk].reshape(t_steps, n, k), 0, 1).reshape(
        n, t_steps * k)[:, :m]
    states_o = jax.lax.bitcast_convert_type(
        st_o[0, :nk].reshape(n, k), jnp.uint32)
    ptrs_o = (p0 + pt_o[0, :nk]).reshape(n, k)  # back to absolute
    return vals, states_o, ptrs_o


def kernel_fits(n: int, k: int, m: int, big_l: int, budget_mb: float = 11.0
                ) -> bool:
    """Static VMEM estimate for one kernel invocation (everything must be
    VMEM-resident).  The dominant terms are the [Lp, NK] f32 row/compare
    temporaries — with the flagship gaussian table (L ~ 3.1k entries) they
    are ~12.8 MB EACH at batch 8, which is why the first on-chip attempt
    OOM'd scoped vmem by 1.09 MB (2026-08-21 log, profile_r5.md).  Callers
    fall back to the XLA in-step path when this returns False; a chunked
    two-pass search would fit but doubles the per-step matmul cost, which
    the measured XLA-path numbers do not justify."""
    nkp = _round_up(n * k, 128)
    t_steps = -(-m // k)
    lp = _round_up(big_l + 2, 8)
    temps = 4 * lp * nkp * 4                 # rows + cmp + two select masks
    seq = (3 * t_steps + 1) * nkp * 4        # idx, vals, window
    table = lp * _round_up(128, 128) * 4
    return (temps + seq + table) < budget_mb * 2**20


def pallas_lanes_enabled() -> bool:
    """Opt-in (CRDR_PALLAS_LANES=1): unlike the instep/unroll defaults this
    changes the program structure, so it stays off until the on-chip A/B
    promotes it."""
    return pallas_lanes_mode() is not None


def pallas_lanes_mode():
    """None (off, default) | "1" (compiled Mosaic, TPU only) | "interp"
    (Pallas interpreter on any backend — CI/equality use).  Same mode
    contract as charm_uniform._fused_mode."""
    import os

    mode = os.environ.get("CRDR_PALLAS_LANES", "0")
    if mode not in ("1", "interp"):
        return None
    if mode == "interp":
        return "interp"
    try:
        return "1" if jax.devices()[0].platform != "cpu" else None
    except Exception:  # noqa: BLE001 — backend probe only
        return None
