"""Lane-interleaved rans32 ("device wire") host coder tests.

The C++ coder (csrc/rans.cpp, lane section) is checked against an
independent numpy decoder written from the documented bit-level contract
(state/renorm/lane-assignment rules), not against the C++ code — a
differential oracle in the spirit of tests/rans_spec_model.py.
"""

import numpy as np
import pytest

from crdr_tpu.runtime import pmf_to_quantized_cdf
from crdr_tpu.runtime.lane_rans import (LaneStreamDecoder, lane_encode,
                                        pack_lane_container,
                                        unpack_lane_container)


# --------------------------------------------------------------------------
# Independent numpy model: decode from the documented contract.
# --------------------------------------------------------------------------
def np_lane_decode(words, lens, indexes_per_slice, cdfs, cdf_lengths,
                   offsets):
    """Forward-decode all slices; returns flat int32 values (escape slots
    decode to escape value; caller applies fixups)."""
    K = words.shape[0]
    state = ((words[:, 0].astype(np.uint64) << 16)
             | words[:, 1].astype(np.uint64))
    ptr = np.full(K, 2, dtype=np.int64)
    out = []
    for idx_flat in indexes_per_slice:
        idx_flat = np.asarray(idx_flat).reshape(-1)
        for p in range(idx_flat.size):
            j = p % K
            x = int(state[j])
            row = cdfs[idx_flat[p]]
            mod = x & 0xFFFF
            # linear scan: largest s with row[s] <= mod
            s = 0
            while s + 1 < cdf_lengths[idx_flat[p]] - 1 and row[s + 1] <= mod:
                s += 1
            low, freq = int(row[s]), int(row[s + 1] - row[s])
            x = freq * (x >> 16) + mod - low
            if x < (1 << 16):
                x = (x << 16) | int(words[j, ptr[j]])
                ptr[j] += 1
            state[j] = x
            out.append(s + int(offsets[idx_flat[p]]))
    return np.asarray(out, dtype=np.int32)


def _random_tables(rng, rows=8, max_sym=12):
    cdf_len = rng.integers(3, max_sym + 2, size=rows).astype(np.int32)
    cols = int(cdf_len.max()) + 1
    cdfs = np.zeros((rows, cols), dtype=np.int32)
    for i in range(rows):
        n = int(cdf_len[i]) - 1  # pmf bins incl. the escape/tail bin
        pmf = rng.random(n).astype(np.float32) + 1e-4
        pmf = pmf / pmf.sum()
        row = pmf_to_quantized_cdf(pmf, 16)  # last entry = escape/tail bin
        assert row.size == cdf_len[i]
        cdfs[i, :row.size] = row
    offsets = rng.integers(-6, 6, size=rows).astype(np.int32)
    return cdfs, cdf_len, offsets


def _encode_decode_case(rng, n_slices, m_per_slice, K, escape_frac=0.0):
    cdfs, cdf_len, offsets = _random_tables(rng)
    rows = cdfs.shape[0]
    vals, idxs, slice_off = [], [], [0]
    for _ in range(n_slices):
        m = m_per_slice
        idx = rng.integers(0, rows, size=m).astype(np.int32)
        max_v = cdf_len[idx] - 2
        v = (offsets[idx]
             + rng.integers(0, np.maximum(max_v, 1))).astype(np.int32)
        if escape_frac:
            esc = rng.random(m) < escape_frac
            v = np.where(esc, offsets[idx] + max_v
                         + rng.integers(-40, 40, size=m), v).astype(np.int32)
        vals.append(v)
        idxs.append(idx)
        slice_off.append(slice_off[-1] + m)
    values = np.concatenate(vals)
    indexes = np.concatenate(idxs)
    words, lens, fix_pos, fix_val = lane_encode(
        values, indexes, slice_off, K, cdfs, cdf_len, offsets)

    # numpy-model decode
    got = np_lane_decode(words, lens, idxs, cdfs, cdf_len, offsets)
    got[fix_pos] = fix_val
    np.testing.assert_array_equal(got, values)

    # C++ streaming decode, slice by slice
    dec = LaneStreamDecoder(words, lens)
    got2 = np.concatenate([dec.decode(i, cdfs, cdf_len, offsets)
                           for i in idxs])
    got2[fix_pos] = fix_val
    np.testing.assert_array_equal(got2, values)
    return words, lens, fix_pos, fix_val


def test_lane_roundtrip_inrange():
    rng = np.random.default_rng(0)
    _encode_decode_case(rng, n_slices=3, m_per_slice=257, K=16)


def test_lane_roundtrip_escapes():
    rng = np.random.default_rng(1)
    words, lens, fix_pos, fix_val = _encode_decode_case(
        rng, n_slices=4, m_per_slice=129, K=8, escape_frac=0.05)
    assert fix_pos.size > 0


def test_lane_more_lanes_than_symbols():
    rng = np.random.default_rng(2)
    _encode_decode_case(rng, n_slices=2, m_per_slice=3, K=32)


def test_lane_single_lane_matches_serial():
    rng = np.random.default_rng(3)
    _encode_decode_case(rng, n_slices=2, m_per_slice=100, K=1)


def test_lane_fuzz_many_shapes():
    rng = np.random.default_rng(4)
    for _ in range(25):
        ns = int(rng.integers(1, 5))
        m = int(rng.integers(1, 200))
        K = int(rng.integers(1, 64))
        _encode_decode_case(rng, ns, m, K,
                            escape_frac=float(rng.random() * 0.1))


def test_lane_deterministic():
    rng = np.random.default_rng(5)
    cdfs, cdf_len, offsets = _random_tables(rng)
    idx = rng.integers(0, cdfs.shape[0], size=500).astype(np.int32)
    v = offsets[idx] + 1
    a = lane_encode(v, idx, [0, 500], 16, cdfs, cdf_len, offsets)
    b = lane_encode(v, idx, [0, 500], 16, cdfs, cdf_len, offsets)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])


def test_lane_container_roundtrip():
    rng = np.random.default_rng(6)
    words, lens, fix_pos, fix_val = _encode_decode_case(
        rng, n_slices=3, m_per_slice=64, K=8, escape_frac=0.1)
    blob = pack_lane_container(words, lens, fix_pos, fix_val)
    w2, l2, fp2, fv2 = unpack_lane_container(blob)
    np.testing.assert_array_equal(l2, lens)
    np.testing.assert_array_equal(fp2, fix_pos)
    np.testing.assert_array_equal(fv2, fix_val)
    for j in range(words.shape[0]):
        np.testing.assert_array_equal(w2[j, :l2[j]], words[j, :lens[j]])


def test_lane_container_magic():
    """Containers are self-describing: CRDW magic + version; a blob without
    it (e.g. a compressai-wire rANS stream) is rejected with a pointer to
    the right wire_format setting."""
    from crdr_tpu.runtime.lane_rans import LANE_MAGIC

    rng = np.random.default_rng(8)
    words, lens, fix_pos, fix_val = _encode_decode_case(
        rng, n_slices=1, m_per_slice=32, K=4, escape_frac=0.0)
    blob = pack_lane_container(words, lens, fix_pos, fix_val)
    assert blob[:len(LANE_MAGIC)] == LANE_MAGIC
    with pytest.raises(ValueError, match="compressai"):
        unpack_lane_container(blob[len(LANE_MAGIC):])  # stripped magic
    with pytest.raises(ValueError, match="compressai"):
        unpack_lane_container(b"\x12\x34" + blob[2:])  # corrupted magic


def test_lane_wrong_indexes_raise():
    rng = np.random.default_rng(7)
    cdfs, cdf_len, offsets = _random_tables(rng)
    idx = np.full(10, cdfs.shape[0] + 3, dtype=np.int32)  # out of range
    with pytest.raises(RuntimeError):
        lane_encode(np.zeros(10, np.int32), idx, [0, 10], 4,
                    cdfs, cdf_len, offsets)
