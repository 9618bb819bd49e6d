"""Round-trip and property tests for the C++ rANS runtime."""

import os

import numpy as np
import pytest

from crdr_tpu.runtime import (RansStreamDecoder, pmf_to_quantized_cdf,
                              rans_decode_with_indexes, rans_encode_with_indexes)


def _gaussian_cdf_table(scales, tail_mass=1e-9):
    """Small helper building CDF rows like GaussianConditionalCodec."""
    from scipy.stats import norm

    mult = -norm.ppf(tail_mass / 2)
    centers = np.ceil(np.asarray(scales) * mult).astype(np.int32)
    lengths = 2 * centers + 1
    maxlen = lengths.max()
    rows = np.zeros((len(scales), maxlen + 2), dtype=np.int32)
    for i, s in enumerate(scales):
        xs = np.abs(np.arange(lengths[i]) - centers[i])
        up = norm.cdf((0.5 - xs) / s)
        lo = norm.cdf((-0.5 - xs) / s)
        pmf = np.concatenate([up - lo, [2 * norm.cdf((-0.5 - centers[i]) / s)]])
        row = pmf_to_quantized_cdf(pmf.astype(np.float32), 16)
        rows[i, :len(row)] = row
    return rows, (lengths + 2).astype(np.int32), (-centers).astype(np.int32)


def test_pmf_to_quantized_cdf_properties():
    pmf = np.array([0.1, 0.4, 0.3, 0.2, 1e-9], dtype=np.float32)
    cdf = pmf_to_quantized_cdf(pmf, 16)
    assert cdf[0] == 0
    assert cdf[-1] == 1 << 16
    assert np.all(np.diff(cdf) >= 1)  # every symbol has nonzero frequency
    # frequencies approximately proportional to pmf
    freqs = np.diff(cdf).astype(np.float64)
    np.testing.assert_allclose(freqs[:4] / (1 << 16), pmf[:4], atol=2e-4)


def test_pmf_tiny_probabilities_get_floor():
    pmf = np.array([1e-12, 0.999, 1e-12, 1e-9], dtype=np.float32)
    cdf = pmf_to_quantized_cdf(pmf, 16)
    assert np.all(np.diff(cdf) >= 1)
    assert cdf[-1] == 1 << 16


def test_rans_roundtrip_inrange():
    rng = np.random.default_rng(0)
    cdfs, lengths, offsets = _gaussian_cdf_table([0.2, 1.0, 5.0, 40.0])
    n = 5000
    indexes = rng.integers(0, 4, n).astype(np.int32)
    scales = np.array([0.2, 1.0, 5.0, 40.0])[indexes]
    symbols = np.round(rng.normal(0, scales)).astype(np.int32)
    stream = rans_encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)
    out = rans_decode_with_indexes(stream, indexes, cdfs, lengths, offsets)
    np.testing.assert_array_equal(out, symbols)
    # compression should be near the entropy: well below raw 32-bit storage
    assert len(stream) < n * 2


def test_rans_roundtrip_escape_symbols():
    """Symbols far outside the CDF support use the bypass path."""
    cdfs, lengths, offsets = _gaussian_cdf_table([0.15])
    symbols = np.array([0, 1, -1, 900, -900, 123456, -123456, 2, 0],
                       dtype=np.int32)
    indexes = np.zeros(len(symbols), dtype=np.int32)
    stream = rans_encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)
    out = rans_decode_with_indexes(stream, indexes, cdfs, lengths, offsets)
    np.testing.assert_array_equal(out, symbols)


def test_rans_empty_and_single():
    cdfs, lengths, offsets = _gaussian_cdf_table([1.0])
    for syms in ([3], [0]):
        symbols = np.array(syms, dtype=np.int32)
        indexes = np.zeros(len(symbols), dtype=np.int32)
        stream = rans_encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)
        out = rans_decode_with_indexes(stream, indexes, cdfs, lengths, offsets)
        np.testing.assert_array_equal(out, symbols)


def test_rans_streaming_decoder_matches_batch():
    """Charm decode contract: one stream encoded at once, decoded slice by
    slice with a persistent decoder state."""
    rng = np.random.default_rng(1)
    cdfs, lengths, offsets = _gaussian_cdf_table([0.3, 2.0, 10.0])
    n = 3000
    indexes = rng.integers(0, 3, n).astype(np.int32)
    symbols = np.round(rng.normal(0, 3, n)).astype(np.int32)
    stream = rans_encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)

    dec = RansStreamDecoder(stream)
    chunks = []
    for start in range(0, n, 700):
        sl = slice(start, min(start + 700, n))
        chunks.append(dec.decode(indexes[sl], cdfs, lengths, offsets))
    dec.close()
    np.testing.assert_array_equal(np.concatenate(chunks), symbols)


def test_rans_deterministic():
    cdfs, lengths, offsets = _gaussian_cdf_table([1.0])
    symbols = np.arange(-5, 6, dtype=np.int32)
    indexes = np.zeros(11, dtype=np.int32)
    s1 = rans_encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)
    s2 = rans_encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)
    assert s1 == s2


# ---------------------------------------------------------------------------
# Cross-validation against the independent from-spec Python model
# (tests/rans_spec_model.py) — two implementations of the shared public
# contract must agree byte-for-byte in both directions.
# ---------------------------------------------------------------------------


def test_spec_model_quantizer_agrees():
    """CDF quantization must match the native quantizer bit-exactly: the
    rANS tables (and every stream) depend on its rounding."""
    from tests import rans_spec_model as spec

    rng = np.random.default_rng(7)
    for _ in range(200):
        n = int(rng.integers(1, 80))
        pmf = (rng.random(n) + 1e-7).astype(np.float64)
        pmf = pmf / pmf.sum()
        tail = float(rng.random() * 1e-2 + 1e-9)
        full = np.concatenate([pmf * (1 - tail), [tail]]).astype(np.float32)
        ours = pmf_to_quantized_cdf(full, 16)
        theirs = np.asarray(spec.quantize_pmf(full), dtype=np.int32)
        np.testing.assert_array_equal(ours, theirs)


def test_spec_model_fuzz_byte_parity():
    """1k random cases: native and from-spec streams agree byte-for-byte and
    each decoder accepts the other's stream (incl. escape/bypass extremes)."""
    from tests import rans_spec_model as spec

    n_checked = 0
    for case in spec.fuzz_cases(1000, seed=42):
        args = (case["indexes"], case["cdfs"], case["cdf_lengths"],
                case["offsets"])
        native = rans_encode_with_indexes(case["symbols"], *args)
        oracle = spec.encode(case["symbols"], *args)
        assert native == oracle, f"{case['name']}: stream bytes differ"
        np.testing.assert_array_equal(
            rans_decode_with_indexes(oracle, *args), case["symbols"],
            err_msg=f"{case['name']}: native decoder rejects oracle stream")
        np.testing.assert_array_equal(
            spec.decode(native, *args), case["symbols"],
            err_msg=f"{case['name']}: oracle decoder rejects native stream")
        n_checked += 1
    assert n_checked == 1000


def test_spec_model_streaming_parity():
    """The oracle's streaming decoder consumes a native stream in random
    slices (the Charm serial-decode access pattern)."""
    from tests import rans_spec_model as spec

    rng = np.random.default_rng(3)
    cdfs, lengths, offsets = _gaussian_cdf_table([0.3, 2.0, 10.0])
    n = 2000
    indexes = rng.integers(0, 3, n).astype(np.int32)
    symbols = np.round(rng.normal(0, 6, n)).astype(np.int32)
    stream = rans_encode_with_indexes(symbols, indexes, cdfs, lengths, offsets)

    dec = spec.Decoder(stream)
    out = []
    start = 0
    while start < n:
        step = int(rng.integers(1, 400))
        sl = slice(start, min(start + step, n))
        out.extend(dec.decode(indexes[sl], cdfs, lengths, offsets))
        start += step
    np.testing.assert_array_equal(np.asarray(out, dtype=np.int32), symbols)


# ---------------------------------------------------------------------------
# CompressAI wire-format cross-validation (fixture captured by
# scripts/capture_rans_vectors.py in a compressai-equipped environment)
# ---------------------------------------------------------------------------

_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                        "compressai_rans_vectors.json")


def test_capture_cases_roundtrip():
    """The shared case generator round-trips through OUR coder regardless of
    whether the CompressAI fixture has been captured yet."""
    from scripts.capture_rans_vectors import make_cases

    for case in make_cases():
        stream = rans_encode_with_indexes(
            case["symbols"], case["indexes"], case["cdfs"],
            case["cdf_lengths"], case["offsets"])
        out = rans_decode_with_indexes(
            stream, case["indexes"], case["cdfs"], case["cdf_lengths"],
            case["offsets"])
        np.testing.assert_array_equal(out, case["symbols"]), case["name"]


def test_compressai_fixture_cross_validation():
    """Byte-level parity with CompressAI streams (SURVEY.md section 7:
    golden tests against CompressAI-produced streams)."""
    if not os.path.exists(_FIXTURE):
        pytest.skip("compressai fixture not captured in this environment "
                    "(run scripts/capture_rans_vectors.py where compressai "
                    "is installed)")
    import json

    from scripts.capture_rans_vectors import make_cases

    with open(_FIXTURE) as f:
        fixture = {row["name"]: bytes.fromhex(row["stream_hex"])
                   for row in json.load(f)}
    for case in make_cases():
        golden = fixture[case["name"]]
        ours = rans_encode_with_indexes(
            case["symbols"], case["indexes"], case["cdfs"],
            case["cdf_lengths"], case["offsets"])
        assert ours == golden, \
            f"{case['name']}: our stream differs from CompressAI's"
        out = rans_decode_with_indexes(
            golden, case["indexes"], case["cdfs"], case["cdf_lengths"],
            case["offsets"])
        np.testing.assert_array_equal(out, case["symbols"])
