"""On-device rans32 lane encoder vs the C++ host coder — byte equality.

`ops/device_rans.lane_encode_rounds` must produce the SAME lane streams as
`runtime/lane_rans.lane_encode` (which is itself differential-tested against
an independent from-contract numpy model in test_lane_rans.py): identical
words, lens, and escape fixups, for every (slices, lanes, escapes, batch)
shape.  Byte equality is the whole contract — the device encoder feeds the
same CRDW containers and the same decoders.
"""

import jax
import numpy as np
import pytest

from crdr_tpu.ops.device_rans import encode_grid, lane_encode_rounds
from crdr_tpu.runtime.lane_rans import lane_encode

from test_lane_rans import _random_tables


def _random_case(rng, n_slices, m_per_slice, escape_frac=0.0, batch=1):
    cdfs, cdf_len, offsets = _random_tables(rng)
    rows = cdfs.shape[0]
    slice_off = [0]
    for _ in range(n_slices):
        slice_off.append(slice_off[-1] + m_per_slice)
    n = slice_off[-1]
    idx = rng.integers(0, rows, size=(batch, n)).astype(np.int32)
    max_v = cdf_len[idx] - 2
    v = (offsets[idx]
         + rng.integers(0, np.maximum(max_v, 1))).astype(np.int32)
    if escape_frac:
        esc = rng.random((batch, n)) < escape_frac
        v = np.where(esc, offsets[idx] + max_v
                     + rng.integers(-40, 40, size=(batch, n)),
                     v).astype(np.int32)
    return v, idx, np.asarray(slice_off, np.int64), cdfs, cdf_len, offsets


def _check_case(rng, n_slices, m_per_slice, K, escape_frac=0.0, batch=1,
                fix_cap=64):
    v, idx, off, cdfs, cdf_len, offsets = _random_case(
        rng, n_slices, m_per_slice, escape_frac, batch)
    grid = encode_grid(off, K)  # static: baked into the compiled encoder
    enc = jax.jit(lambda s, i, c, cl, o: lane_encode_rounds(
        s, i, grid, c, cl, o, fix_cap))
    w_d, l_d, fp_d, fv_d, ne_d = jax.tree.map(
        np.asarray, enc(v, idx, cdfs, cdf_len, offsets))
    for b in range(batch):
        w_h, l_h, fp_h, fv_h = lane_encode(
            v[b], idx[b], off, K, cdfs, cdf_len, offsets, fix_cap=1 << 16)
        np.testing.assert_array_equal(l_d[b], l_h)
        for j in range(K):
            np.testing.assert_array_equal(
                w_d[b, j, :l_h[j]].astype(np.uint16), w_h[j, :l_h[j]])
        assert int(ne_d[b]) == fp_h.size
        kept = min(fp_h.size, fix_cap)
        np.testing.assert_array_equal(fp_d[b, :kept], fp_h[:kept])
        np.testing.assert_array_equal(fv_d[b, :kept], fv_h[:kept])
        # slots past n_esc stay zeroed (container packing slices by count)
        assert not fp_d[b, fp_h.size:].any()


def test_device_encode_inrange():
    _check_case(np.random.default_rng(0), 3, 257, K=16)


def test_device_encode_escapes():
    _check_case(np.random.default_rng(1), 4, 129, K=8, escape_frac=0.08)


def test_device_encode_more_lanes_than_symbols():
    _check_case(np.random.default_rng(2), 2, 3, K=32)


def test_device_encode_single_lane():
    _check_case(np.random.default_rng(3), 2, 100, K=1)


def test_device_encode_batched():
    _check_case(np.random.default_rng(4), 3, 65, K=8, escape_frac=0.05,
                batch=3)


def test_device_encode_fixup_overflow_counts():
    """Escapes beyond fix_cap are dropped from the arrays but counted, so
    the caller can detect overflow and fall back to the host encoder."""
    rng = np.random.default_rng(5)
    v, idx, off, cdfs, cdf_len, offsets = _random_case(
        rng, 1, 200, escape_frac=0.5)
    grid = encode_grid(off, 4)
    _, _, fp, fv, ne = jax.tree.map(np.asarray, lane_encode_rounds(
        v, idx, grid, cdfs, cdf_len, offsets, 8))
    assert int(ne[0]) > 8
    w_h, l_h, fp_h, fv_h = lane_encode(
        v[0], idx[0], off, 4, cdfs, cdf_len, offsets, fix_cap=1 << 16)
    np.testing.assert_array_equal(fp[0], fp_h[:8])
    np.testing.assert_array_equal(fv[0], fv_h[:8])


def test_device_encode_fuzz_many_shapes():
    rng = np.random.default_rng(6)
    for _ in range(15):
        ns = int(rng.integers(1, 5))
        m = int(rng.integers(1, 200))
        K = int(rng.integers(1, 64))
        _check_case(rng, ns, m, K, escape_frac=float(rng.random() * 0.1),
                    fix_cap=256)
