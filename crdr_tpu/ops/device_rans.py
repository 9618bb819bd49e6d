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


def _decode_step_core(st, pt, words, row, ln, off, act, pos, w_max):
    """One lane-advance: CDF search + uint32 state update (shared by both
    scan bodies below; every op is exact — see module docstring)."""
    mod = (st & jnp.uint32(0xFFFF))
    modf = mod.astype(jnp.float32)[..., None]
    big_l = row.shape[-1]
    # CDF search: s = #{p < len-1 : row[p] <= mod} - 1  (row[0] == 0)
    valid = pos[None, None, :] < (ln[..., None] - 1.0)
    s = jnp.sum(jnp.where((row <= modf) & valid, 1.0, 0.0),
                axis=-1) - 1.0                # [N, K] f32, exact small int
    sel = jax.nn.one_hot(s.astype(jnp.int32), big_l, dtype=jnp.float32)
    low = jnp.sum(row * sel, axis=-1)         # exact: single nonzero term
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
    return st, pt, value


def lane_decode_round(states: Array, ptrs: Array, words: Array,
                      rows: Array, lens: Array, offs: Array, m: int
                      ) -> Tuple[Array, Array, Array]:
    """Decode one autoregressive round of ``m`` symbols across K lanes.

    states/ptrs: [N, K]; words: [N, K, W] uint32 (16-bit values);
    rows: [N, m, L] f32 (from :func:`expand_tables`), lens/offs: [N, m].
    Symbol p goes to lane p % K (the encoder's per-round assignment).
    Returns (values [N, m] int32, states, ptrs).

    HBM note: the precomputed ``rows`` tensor (N*m*L f32) streams through
    the scan from HBM — for flagship shapes that is hundreds of MB per
    round.  :func:`lane_decode_round_instep` is the bandwidth-lean variant
    (table rows expanded inside the step); this form remains for the
    CRDR_INSTEP_TABLES=0 escape hatch and as the semantics reference.
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
        st, pt, value = _decode_step_core(st, pt, words, row, ln, off, act,
                                          pos, w_max)
        return (st, pt), value

    (states, ptrs), vals_t = jax.lax.scan(
        step, (states, ptrs), (rows_t, lens_t, offs_t, active_t),
        unroll=_scan_unroll())
    vals = jnp.moveaxis(vals_t, 0, 1).reshape(n, t_steps * k)[:, :m]
    return vals, states, ptrs


def lane_decode_round_instep(states: Array, ptrs: Array, words: Array,
                             idx: Array, cdf: Array, cdf_len: Array,
                             cdf_off: Array, m: int
                             ) -> Tuple[Array, Array, Array]:
    """:func:`lane_decode_round` with the table expansion INSIDE the scan
    step — the HBM-traffic fix for the profiler's top line (profile_r4.md:
    the precomputed-rows form streams N*m*L f32 per round from HBM; ~405 MB
    per slice at flagship shapes, ~4 GB per batch-8 Charm decode).

    Here the scan consumes only ``idx`` slices ([T, N, K] int32) and
    expands each step's [N, K, L] rows from the loop-invariant CDF table
    (R*L int32, ~66 KB — VMEM-class) via the SAME exact one-hot matmul
    (:func:`expand_tables`), so the row data lives and dies as a VMEM
    temporary and never round-trips HBM.  Arithmetic is op-for-op identical
    to the precomputed form — same one-hot expansion, same search, same
    state update — so the decoded symbols are bit-identical by
    construction (asserted vs the host C++ coder in tests/test_device_rans
    and vs the precomputed form in tests/test_instep_tables.py).

    idx: [N, M>=m] int32 per-symbol table indexes in flat lane order.
    """
    n, k = states.shape
    big_l = cdf.shape[-1]
    t_steps = -(-m // k)  # ceil
    pad = t_steps * k - m
    idx = idx[:, :m].astype(jnp.int32)
    # pad with row 0 (a valid table row): padded lanes are masked inactive,
    # so their search result and state update are discarded
    idx_p = jnp.pad(idx, ((0, 0), (0, pad)))
    idx_t = jnp.moveaxis(idx_p.reshape(n, t_steps, k), 1, 0)  # [T, N, K]
    tj = (jnp.arange(t_steps)[:, None] * k + jnp.arange(k)[None, :])
    active_t = tj < m                         # [T, K]
    pos = jnp.arange(big_l, dtype=jnp.float32)
    w_max = words.shape[-1] - 1

    def step(carry, xs):
        st, pt = carry
        irow, act = xs
        row, ln, off = expand_tables(irow, cdf, cdf_len, cdf_off)
        st, pt, value = _decode_step_core(st, pt, words, row, ln, off, act,
                                          pos, w_max)
        return (st, pt), value

    (states, ptrs), vals_t = jax.lax.scan(
        step, (states, ptrs), (idx_t, active_t), unroll=_scan_unroll())
    vals = jnp.moveaxis(vals_t, 0, 1).reshape(n, t_steps * k)[:, :m]
    return vals, states, ptrs


def instep_tables_enabled() -> bool:
    """Default ON: the in-step form is bit-identical by construction and
    strictly lighter on HBM; CRDR_INSTEP_TABLES=0 is the A/B escape hatch
    (read at program-build time, like CRDR_FUSED_LOOP)."""
    import os

    return os.environ.get("CRDR_INSTEP_TABLES", "1") == "1"


def _scan_unroll() -> int:
    """Unroll factor for the serial lane scans (CRDR_SCAN_UNROLL, read at
    program-build time).  Unrolling changes NOTHING about the arithmetic —
    the unrolled sub-steps stay sequentially data-dependent in the exact
    original order — so bitstreams are identical by construction.

    Default 1: the r5 on-chip A/B measured unroll=8 neutral-to-NEGATIVE
    (device-wire pipelined 1.598 vs 1.865 Mpix/s in the adjacent-window
    pair, 1.835 vs 1.914 cross-window; serial a wash) — the bigger
    unrolled body appears to cost more in scheduling/pressure than the
    per-iteration loop overhead it saves.  The knob stays for future
    hardware/toolchain revisions."""
    import os

    try:
        return max(1, int(os.environ.get("CRDR_SCAN_UNROLL", "1")))
    except ValueError:
        return 1


def encode_grid(slice_offsets, num_lanes: int) -> "np.ndarray":
    """Static [T, K] grid of flat symbol positions in lane consumption
    order (host-side helper; the grid is baked into the compiled encoder).

    Row t holds the t-th symbol batch: within each autoregressive round
    (``slice_offsets`` boundaries, where lane assignment restarts) symbol
    ``off_s + r*K + j`` goes to row ``r``, lane ``j``.  Entries past a
    round's end are -1 (inactive).  Mirrors the per-lane sequence of
    ``csrc/rans.cpp lane_rans_encode`` pass 2 exactly.
    """
    import numpy as np

    off = np.asarray(slice_offsets, dtype=np.int64)
    k = int(num_lanes)
    rows = []
    for s in range(off.size - 1):
        m = int(off[s + 1] - off[s])
        t = -(-m // k)
        g = (off[s] + np.arange(t, dtype=np.int64)[:, None] * k
             + np.arange(k, dtype=np.int64)[None, :])
        rows.append(np.where(g < off[s + 1], g, -1))
    return np.concatenate(rows, axis=0).astype(np.int32)


def lane_encode_rounds(sym: Array, idx: Array, grid, cdf: Array,
                       cdf_len: Array, offset: Array, fix_cap: int
                       ) -> Tuple[Array, Array, Array, Array, Array]:
    """On-device rans32 lane ENCODER — the bit-exact inverse of
    :func:`lane_decode_round`, producing the same streams as the host
    ``runtime/lane_rans.lane_encode`` (C++), byte for byte.

    sym/idx: [N, M] int32 in flat lane-consumption order; grid: the [T, K]
    position grid from :func:`encode_grid` (numpy or device array — only
    its shape is trace-relevant); cdf [R, L] / cdf_len [R]
    / offset [R]: int32 tables.  Returns ``(words [N, K, T+2] uint16,
    lens [N, K] int32, fix_pos [N, F] int32, fix_val [N, F] int32,
    n_esc [N] int32)`` — ``words[n, k, :lens[n, k]]`` is lane k's stream
    (2 state words + renorm words); escapes past ``fix_cap`` are dropped
    from the fixup arrays but counted in ``n_esc`` (caller falls back to
    the host encoder when ``n_esc > fix_cap``).

    Exactness: everything is integer — gathers for slot resolution, uint32
    state arithmetic (the renorm emits at most ONE word per symbol: the
    state invariant keeps x < 2^32, so a single 16-bit shift always lands
    below freq<<16), and int32 cumsums for stream/fixup compaction.  The
    reverse ``lax.scan`` encodes last-symbol-first exactly like the C++
    coder; ascending grid order then equals the decoder's read order.
    """
    n, m = sym.shape
    t_steps, k = grid.shape
    sym = sym.astype(jnp.int32)
    idx = idx.astype(jnp.int32)
    big_l = cdf.shape[1]

    # per-symbol slot resolution (forward flat order, = C++ pass 1)
    off_s = jnp.take(offset, idx, axis=0)
    maxv = jnp.take(cdf_len, idx, axis=0) - 2
    folded = sym - off_s
    esc = (folded < 0) | (folded >= maxv)
    slot = jnp.where(esc, maxv, folded)
    flat = idx * big_l + slot
    cdf_flat = cdf.reshape(-1)
    low = jnp.take(cdf_flat, flat, axis=0)
    freq = jnp.take(cdf_flat, flat + 1, axis=0) - low

    # lane grids [T, N, K]
    grid = jnp.asarray(grid)
    gpos = jnp.maximum(grid, 0).reshape(-1)
    active = grid >= 0  # [T, K]

    def to_grid(x):
        g = jnp.take(x, gpos, axis=1).reshape(n, t_steps, k)
        return jnp.moveaxis(g, 1, 0)

    low_g = to_grid(low).astype(jnp.uint32)
    freq_g = jnp.where(active[:, None, :], to_grid(freq), 1) \
        .astype(jnp.uint32)  # inactive lanes divide by 1

    init = jnp.full((n, k), 1 << 16, jnp.uint32)  # kLaneL

    def step(state, xs):
        lo, fq, act = xs
        act = act[None, :]
        # renorm: state >= freq << 16  <=>  state >> 16 >= freq (exact)
        emit = act & ((state >> 16) >= fq)
        word = (state & jnp.uint32(0xFFFF)).astype(jnp.int32)
        st1 = jnp.where(emit, state >> 16, state)
        q = st1 // fq
        r = st1 - q * fq
        st2 = (q << 16) + r + lo  # < 2^32: q < 2^16 after renorm
        return jnp.where(act, st2, st1), (word, emit)

    state, (words_t, emit_t) = jax.lax.scan(
        step, init, (low_g, freq_g, active), reverse=True,
        unroll=_scan_unroll())

    # stream compaction: the C++ coder writes emissions reversed, so the
    # word from grid row t lands at 2 + #{emissions at rows < t} (per lane)
    emit_i = emit_t.astype(jnp.int32)
    ecum = jnp.cumsum(emit_i, axis=0)
    pos = 2 + ecum - emit_i
    lens = 2 + ecum[-1]
    cap = t_steps + 2
    bidx = jnp.arange(n, dtype=jnp.int32)[None, :, None]
    kidx = jnp.arange(k, dtype=jnp.int32)[None, None, :]
    oob = n * k * cap
    flatpos = (bidx * k + kidx) * cap + jnp.where(emit_t, pos, oob)
    words = jnp.zeros(n * k * cap, jnp.int32) \
        .at[flatpos.reshape(-1)].set(words_t.reshape(-1), mode="drop") \
        .reshape(n, k, cap)
    words = words.at[:, :, 0].set((state >> 16).astype(jnp.int32))
    words = words.at[:, :, 1].set((state & jnp.uint32(0xFFFF))
                                  .astype(jnp.int32))

    # escape fixups in forward flat order (= C++ pass 1 order)
    esc_i = esc.astype(jnp.int32)
    fcum = jnp.cumsum(esc_i, axis=1)
    fpos = fcum - esc_i
    n_esc = fcum[:, -1]
    bidx2 = jnp.arange(n, dtype=jnp.int32)[:, None]
    foob = n * fix_cap
    fi = (bidx2 * fix_cap
          + jnp.where(esc & (fpos < fix_cap), fpos, foob)).reshape(-1)
    parange = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.int32)[None, :], (n, m)).reshape(-1)
    fix_pos = jnp.zeros(n * fix_cap, jnp.int32) \
        .at[fi].set(parange, mode="drop").reshape(n, fix_cap)
    fix_val = jnp.zeros(n * fix_cap, jnp.int32) \
        .at[fi].set(sym.reshape(-1), mode="drop").reshape(n, fix_cap)
    return words.astype(jnp.uint16), lens, fix_pos, fix_val, n_esc


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
