"""Independent, from-spec Python model of the rans64 entropy coder.

This module is an *oracle* for byte-level cross-validation of the native
coder in ``crdr_tpu/runtime/csrc/rans.cpp``.  It is written purely from the
published contract — the rans64 family of the public ryg_rans streaming
arithmetic coder plus CompressAI 1.2.4's wire format conventions (16-bit
probability precision, 4-bit bypass with a base-15 chunk-count prefix,
reverse-order buffered encoding, 32-bit little-endian words; see the contract
comment at the top of rans.cpp and the reference consumer
/root/reference/src/models/subnet/context_model/minnen20_charm_context_model.py:201-224).

It deliberately shares no code or structure with the C++ implementation:

* the coder state is a plain Python int (arbitrary precision) rather than
  uint64 arithmetic;
* the encoder builds a forward list of abstract coding operations and then
  replays it in reverse, emitting words into a grow-only list (the C++ coder
  writes into a pre-sized buffer through a decrementing pointer);
* the decoder resolves symbols with a linear scan of the CDF row (the C++
  decoder binary-searches);
* the CDF quantizer is written against CompressAI's documented semantics
  (float32 round-half-up, integer renormalisation, frequency stealing from
  the least-frequent donor) with numpy float32 scalars.

If the two implementations ever disagree on a byte, one of them deviates
from the shared spec.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence, Tuple

import numpy as np

PRECISION = 16
PROB_SCALE = 1 << PRECISION  # total CDF mass
BYPASS_BITS = 4
BYPASS_MAX = (1 << BYPASS_BITS) - 1  # 15: also the chunk-count continuation mark
STATE_LOWER = 1 << 31  # rans64 renormalisation lower bound
WORD_BITS = 32
WORD_MASK = (1 << WORD_BITS) - 1


# ---------------------------------------------------------------------------
# CDF quantizer
# ---------------------------------------------------------------------------

def quantize_pmf(pmf: Sequence[float], precision: int = PRECISION) -> List[int]:
    """PMF (tail mass last) -> integer CDF of length n+1 summing to 2**precision.

    Semantics per CompressAI's ``pmf_to_quantized_cdf``: scale each
    probability to ``p * 2^precision`` with float32 round-half-up, renormalise
    the integer masses to the exact total by proportional integer scaling,
    accumulate, pin the final entry, then give every empty slot one count
    stolen from the currently least-frequent symbol that can spare it.
    """
    probs = [np.float32(p) for p in pmf]
    n = len(probs)
    if n == 0:
        raise ValueError("empty pmf")
    for p in probs:
        if not (p >= np.float32(0)) or p != p:
            raise ValueError("pmf entries must be non-negative and finite")

    scale = np.float32(1 << precision)
    half = np.float32(0.5)
    masses = [0] + [int(p * scale + half) for p in probs]
    total = sum(masses)
    if total == 0:
        raise ValueError("pmf sums to zero after quantization")

    target = 1 << precision
    masses = [(target * m) // total for m in masses]

    cdf = [0] * (n + 1)
    acc = 0
    for i in range(n + 1):
        acc += masses[i]
        cdf[i] = acc
    cdf[n] = target

    for i in range(n):
        if cdf[i + 1] != cdf[i]:
            continue
        freqs = [cdf[j + 1] - cdf[j] for j in range(n)]
        donors = [(f, j) for j, f in enumerate(freqs) if f > 1]
        if not donors:
            raise ValueError("no donor symbol with frequency > 1")
        donor = min(donors)[1]  # least frequent; earliest index on ties
        if donor < i:
            for j in range(donor + 1, i + 1):
                cdf[j] -= 1
        else:
            for j in range(i + 1, donor + 1):
                cdf[j] += 1
    return cdf


# ---------------------------------------------------------------------------
# Escape mapping
# ---------------------------------------------------------------------------

def _fold_to_raw(value: int, max_value: int) -> Tuple[int, int]:
    """Map an out-of-range value to (coded_slot_value, raw_bypass_payload).

    In-range values map to themselves with no payload (raw < 0 sentinel).
    Out-of-range values are coded as the escape slot ``max_value`` and the
    overshoot is zig-zag folded: negatives to odd raws, overshoots to evens.
    """
    if 0 <= value < max_value:
        return value, -1
    if value < 0:
        return max_value, -2 * value - 1
    return max_value, 2 * (value - max_value)


def _unfold_raw(raw: int, max_value: int) -> int:
    if raw & 1:
        return -(raw >> 1) - 1
    return (raw >> 1) + max_value


def _bypass_chunks(raw: int) -> List[int]:
    """4-bit chunks of ``raw``, least-significant first (empty for raw == 0)."""
    chunks = []
    while raw:
        chunks.append(raw & BYPASS_MAX)
        raw >>= BYPASS_BITS
    return chunks


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def encode(symbols: Sequence[int], indexes: Sequence[int],
           cdfs: Sequence[Sequence[int]], cdf_lengths: Sequence[int],
           offsets: Sequence[int]) -> bytes:
    """Encode symbols against per-symbol CDF rows; returns the byte stream."""
    # Pass 1: forward list of coding operations.
    ops: List[Tuple[str, int, int]] = []
    for sym, idx in zip(symbols, indexes):
        idx = int(idx)
        row = cdfs[idx]
        max_value = int(cdf_lengths[idx]) - 2
        value, raw = _fold_to_raw(int(sym) - int(offsets[idx]), max_value)
        ops.append(("cdf", int(row[value]), int(row[value + 1]) - int(row[value])))
        if raw >= 0:
            chunks = _bypass_chunks(int(raw))
            count = len(chunks)
            while count >= BYPASS_MAX:
                ops.append(("bits", BYPASS_MAX, BYPASS_BITS))
                count -= BYPASS_MAX
            ops.append(("bits", count, BYPASS_BITS))
            for c in chunks:
                ops.append(("bits", c, BYPASS_BITS))

    # Pass 2: replay in reverse onto the rans64 state.
    emitted: List[int] = []  # renormalisation words, in emission order
    x = STATE_LOWER
    for kind, a, b in reversed(ops):
        if kind == "cdf":
            start, freq = a, b
            if x >= ((STATE_LOWER >> PRECISION) << WORD_BITS) * freq:
                emitted.append(x & WORD_MASK)
                x >>= WORD_BITS
            x = (x // freq << PRECISION) + x % freq + start
        else:
            val, nbits = a, b
            if x >= (STATE_LOWER >> nbits) << WORD_BITS:
                emitted.append(x & WORD_MASK)
                x >>= WORD_BITS
            x = (x << nbits) | val

    words = [x & WORD_MASK, (x >> WORD_BITS) & WORD_MASK] + emitted[::-1]
    return b"".join(w.to_bytes(4, "little") for w in words)


# ---------------------------------------------------------------------------
# Decoder (streaming-capable)
# ---------------------------------------------------------------------------

class Decoder:
    """Forward-reading rans64 decoder over a byte stream.

    Instantiate once per stream; ``decode`` may be called repeatedly with
    consecutive index slices (the Charm serial-decode access pattern).
    """

    def __init__(self, stream: bytes):
        if len(stream) < 8:
            raise ValueError("stream too short")
        padded = stream + b"\x00" * (-len(stream) % 4)
        self._words = [int.from_bytes(padded[i:i + 4], "little")
                       for i in range(0, len(padded), 4)]
        self._x = self._words[0] | (self._words[1] << WORD_BITS)
        self._pos = 2

    def _renorm(self) -> None:
        if self._x < STATE_LOWER and self._pos < len(self._words):
            self._x = (self._x << WORD_BITS) | self._words[self._pos]
            self._pos += 1

    def _take_cdf(self, row: Sequence[int], length: int) -> int:
        cum = self._x & (PROB_SCALE - 1)
        value = 0
        while int(row[value + 1]) <= cum:  # linear scan: cdf[v] <= cum < cdf[v+1]
            value += 1
            assert value < length - 1, "cumulative frequency out of range"
        start = int(row[value])
        freq = int(row[value + 1]) - start
        self._x = freq * (self._x >> PRECISION) + cum - start
        self._renorm()
        return value

    def _take_bits(self, nbits: int) -> int:
        val = self._x & ((1 << nbits) - 1)
        self._x >>= nbits
        self._renorm()
        return val

    def decode(self, indexes: Sequence[int], cdfs: Sequence[Sequence[int]],
               cdf_lengths: Sequence[int], offsets: Sequence[int]) -> List[int]:
        out = []
        for idx in indexes:
            idx = int(idx)
            row = cdfs[idx]
            max_value = int(cdf_lengths[idx]) - 2
            value = self._take_cdf(row, cdf_lengths[idx])
            if value == max_value:
                count = 0
                val = self._take_bits(BYPASS_BITS)
                count += val
                while val == BYPASS_MAX:
                    val = self._take_bits(BYPASS_BITS)
                    count += val
                raw = 0
                for j in range(count):
                    raw |= self._take_bits(BYPASS_BITS) << (j * BYPASS_BITS)
                value = _unfold_raw(raw, max_value)
            out.append(value + int(offsets[idx]))
        return out


def decode(stream: bytes, indexes: Sequence[int],
           cdfs: Sequence[Sequence[int]], cdf_lengths: Sequence[int],
           offsets: Sequence[int]) -> List[int]:
    return Decoder(stream).decode(indexes, cdfs, cdf_lengths, offsets)


# ---------------------------------------------------------------------------
# Fuzz-case generator (shared with the cross-validation test)
# ---------------------------------------------------------------------------

def fuzz_cases(n_cases: int, seed: int = 0) -> Iterator[dict]:
    """Random (symbols, indexes, cdfs) cases spanning the coder's envelope:
    tiny/huge alphabets, near-deterministic and flat PMFs, escape values out
    to +/-2^30, empty bypass payloads, and single-symbol streams."""
    rng = np.random.default_rng(seed)
    for case_i in range(n_cases):
        n_rows = int(rng.integers(1, 5))
        rows, lengths, offsets = [], [], []
        for _ in range(n_rows):
            alpha = int(rng.integers(1, 66))
            kind = rng.integers(0, 4)
            if kind == 0:  # flat
                pmf = np.ones(alpha)
            elif kind == 1:  # peaked on a random symbol
                pmf = np.full(alpha, 1e-4)
                pmf[rng.integers(0, alpha)] = 1.0
            elif kind == 2:  # geometric-ish decay
                pmf = 0.5 ** np.arange(alpha, dtype=np.float64)
            else:  # random
                pmf = rng.random(alpha) + 1e-6
            pmf = pmf / pmf.sum()
            tail = float(rng.random() * 1e-2 + 1e-9)
            full = np.concatenate([pmf * (1 - tail), [tail]]).astype(np.float32)
            rows.append(quantize_pmf(full))
            lengths.append(alpha + 2)
            offsets.append(int(rng.integers(-40, 40)))
        cols = max(len(r) for r in rows)
        cdfs = np.zeros((n_rows, cols), dtype=np.int32)
        for i, r in enumerate(rows):
            cdfs[i, :len(r)] = r

        n_sym = int(rng.integers(1, 120))
        indexes = rng.integers(0, n_rows, n_sym).astype(np.int32)
        symbols = np.empty(n_sym, dtype=np.int32)
        for i, idx in enumerate(indexes):
            max_value = lengths[idx] - 2
            mode = rng.integers(0, 10)
            if mode < 7:  # in range
                symbols[i] = rng.integers(0, max(max_value, 1)) + offsets[idx]
            elif mode < 9:  # moderate escape
                symbols[i] = int(rng.integers(-500, 500)) + offsets[idx]
            else:  # extreme escape
                symbols[i] = int(rng.integers(-(1 << 30), 1 << 30))
        yield {
            "name": f"fuzz_{case_i}",
            "symbols": symbols,
            "indexes": indexes,
            "cdfs": cdfs,
            "cdf_lengths": np.asarray(lengths, dtype=np.int32),
            "offsets": np.asarray(offsets, dtype=np.int32),
        }
