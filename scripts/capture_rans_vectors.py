"""Capture CompressAI rANS test vectors for byte-level cross-validation.

Run this in ANY environment where ``compressai`` is installed:

    python scripts/capture_rans_vectors.py \
        -o tests/fixtures/compressai_rans_vectors.json

It generates deterministic (symbols, indexes, cdfs, cdf_lengths, offsets)
cases — including escape/bypass symbols outside the table range — encodes
them with CompressAI's ``RansEncoder.encode_with_indexes`` (the coder the
reference uses, minnen20_charm_context_model.py:12), and writes the exact
output bytes (hex) to the fixture.  ``tests/test_rans.py::
test_compressai_fixture_cross_validation`` then asserts our C++ coder
(crdr_tpu/runtime/csrc/rans.cpp) produces byte-identical streams and decodes
CompressAI's bytes exactly — proving wire-format parity end to end.

The case generator is importable and seed-stable, so the fixture stays valid
across environments.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_cases():
    """Deterministic coder test cases shared by the capture script and the
    cross-validation test.  Returns a list of dicts of int32 numpy arrays."""
    from crdr_tpu.runtime import pmf_to_quantized_cdf

    rng = np.random.default_rng(1234)
    cases = []

    def build_tables(scales, max_sym):
        # gaussian-ish pmfs over [-max_sym, max_sym], one per scale, padded
        # to equal width with tail mass last (CompressAI table layout)
        pmfs = []
        for s in scales:
            xs = np.arange(-max_sym, max_sym + 1, dtype=np.float64)
            p = np.exp(-0.5 * (xs / s) ** 2)
            p = (p / p.sum()).astype(np.float32)
            tail = np.float32(1e-9)
            pmfs.append(np.concatenate([p, [tail]]))
        width = max(p.size for p in pmfs) + 1
        cdfs = np.zeros((len(pmfs), width + 1), np.int32)
        lengths = np.zeros(len(pmfs), np.int32)
        offsets = np.full(len(pmfs), -max_sym, np.int32)
        for i, p in enumerate(pmfs):
            c = pmf_to_quantized_cdf(p[:-1], 16)  # tail handled inside
            cdfs[i, :c.size] = c
            lengths[i] = c.size
        return cdfs, lengths, offsets

    # case 1: in-range symbols, 3 scales
    cdfs, lengths, offsets = build_tables([0.5, 2.0, 8.0], 16)
    n = 512
    indexes = rng.integers(0, 3, n).astype(np.int32)
    symbols = np.clip(rng.normal(0, 3, n).round(), -16, 16).astype(np.int32)
    cases.append(dict(name="in_range", symbols=symbols, indexes=indexes,
                      cdfs=cdfs, cdf_lengths=lengths, offsets=offsets))

    # case 2: escape/bypass symbols far outside the table
    symbols2 = symbols.copy()
    symbols2[::17] = rng.integers(40, 4000, symbols2[::17].size)
    symbols2[::23] = -rng.integers(40, 4000, symbols2[::23].size)
    cases.append(dict(name="bypass", symbols=symbols2, indexes=indexes,
                      cdfs=cdfs, cdf_lengths=lengths, offsets=offsets))

    # case 3: single-scale, long stream (renorm coverage)
    cdfs3, lengths3, offsets3 = build_tables([1.0], 8)
    n3 = 8192
    cases.append(dict(
        name="long", symbols=np.clip(rng.normal(0, 1.5, n3).round(), -8,
                                     8).astype(np.int32),
        indexes=np.zeros(n3, np.int32), cdfs=cdfs3, cdf_lengths=lengths3,
        offsets=offsets3))
    return cases


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-o", "--out",
                   default="tests/fixtures/compressai_rans_vectors.json")
    args = p.parse_args(argv)
    try:
        from compressai import ans
    except ImportError:
        print("compressai is not installed in this environment; run this "
              "script where it is (it only needs the ans extension).",
              file=sys.stderr)
        sys.exit(2)

    enc = ans.RansEncoder()
    fixture = []
    for case in make_cases():
        stream = enc.encode_with_indexes(
            case["symbols"].tolist(), case["indexes"].tolist(),
            case["cdfs"].tolist(), case["cdf_lengths"].tolist(),
            case["offsets"].tolist())
        fixture.append({"name": case["name"],
                        "stream_hex": bytes(stream).hex()})
        print(f"{case['name']}: {len(stream)} bytes")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(fixture, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
