// Host-side entropy-coding runtime for crdr_tpu.
//
// A fresh implementation of the 64-bit rANS coder (ryg_rans "rans64" family) with
// the same wire format and escape/bypass scheme as CompressAI 1.2.4's
// rans_interface.cpp (the reference's only native dependency — see
// /root/reference/src/models/subnet/context_model/minnen20_charm_context_model.py:12
// and compressai.ans usage in hyperprior_model.py:150-198):
//
//   * 16-bit probability precision, per-symbol quantized CDF rows;
//   * out-of-range symbols escape to the last CDF slot and are bypass-coded in
//     4-bit chunks with a unary-style chunk-count prefix;
//   * encoding is buffered and performed in reverse so the decoder reads forward;
//   * stream = sequence of 32-bit little-endian words.
//
// Unlike CompressAI's pybind11 interface (python lists), this exposes a flat
// C ABI over int32 arrays for zero-copy numpy interop via ctypes.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr uint32_t kPrecision = 16;
constexpr uint32_t kBypassPrecision = 4;
constexpr uint32_t kMaxBypassVal = (1u << kBypassPrecision) - 1;
constexpr uint64_t kRansL = 1ull << 31;

struct RansSym {
  uint16_t start;
  uint16_t range;
  bool bypass;  // when true, `start` is a raw value of kBypassPrecision bits
};

inline void enc_put(uint64_t &x, uint32_t *&ptr, uint32_t start, uint32_t freq) {
  const uint64_t x_max = ((kRansL >> kPrecision) << 32) * freq;
  if (x >= x_max) {
    *--ptr = static_cast<uint32_t>(x);
    x >>= 32;
  }
  x = ((x / freq) << kPrecision) + (x % freq) + start;
}

inline void enc_put_bits(uint64_t &x, uint32_t *&ptr, uint32_t val,
                         uint32_t nbits) {
  const uint64_t x_max = (kRansL >> nbits) << 32;
  if (x >= x_max) {
    *--ptr = static_cast<uint32_t>(x);
    x >>= 32;
  }
  x = (x << nbits) | val;
}

inline void enc_flush(uint64_t x, uint32_t *&ptr) {
  ptr -= 2;
  ptr[0] = static_cast<uint32_t>(x);
  ptr[1] = static_cast<uint32_t>(x >> 32);
}

struct RansDecState {
  uint64_t x = 0;
  const uint32_t *ptr = nullptr;
  const uint32_t *end = nullptr;
  std::vector<uint32_t> buf;  // owns a word-aligned copy of the stream

  void init(const uint8_t *stream, int64_t len) {
    const size_t nwords = (static_cast<size_t>(len) + 3) / 4;
    buf.assign(nwords, 0);
    std::memcpy(buf.data(), stream, static_cast<size_t>(len));
    ptr = buf.data();
    end = buf.data() + nwords;
    x = static_cast<uint64_t>(ptr[0]) | (static_cast<uint64_t>(ptr[1]) << 32);
    ptr += 2;
  }

  inline uint32_t get() const {
    return static_cast<uint32_t>(x & ((1u << kPrecision) - 1));
  }

  inline void advance(uint32_t start, uint32_t freq) {
    const uint64_t mask = (1u << kPrecision) - 1;
    x = freq * (x >> kPrecision) + (x & mask) - start;
    if (x < kRansL && ptr < end) {
      x = (x << 32) | *ptr++;
    }
  }

  inline uint32_t get_bits(uint32_t nbits) {
    const uint32_t val = static_cast<uint32_t>(x & ((1u << nbits) - 1));
    x >>= nbits;
    if (x < kRansL && ptr < end) {
      x = (x << 32) | *ptr++;
    }
    return val;
  }
};

}  // namespace

extern "C" {

// PMF -> integer CDF with 16-bit total, matching CompressAI's deterministic
// rounding + frequency-stealing normalization (cpp_exts/ops/ops.cpp).  The rANS
// tables — and therefore every encoded bitstream — depend on this rounding.
// Returns 0 on success; out must hold n+1 entries.
int pmf_to_quantized_cdf_c(const float *pmf, int n, int precision,
                           int32_t *out) {
  if (n <= 0) return -1;
  std::vector<uint32_t> cdf(static_cast<size_t>(n) + 1);
  cdf[0] = 0;
  for (int i = 0; i < n; ++i) {
    const float p = pmf[i];
    if (!(p >= 0.f) || p != p) return -2;  // negative or NaN
    cdf[i + 1] =
        static_cast<uint32_t>(p * static_cast<float>(1u << precision) + 0.5f);
  }
  uint64_t total = 0;
  for (int i = 0; i <= n; ++i) total += cdf[i];
  if (total == 0) return -3;
  for (int i = 0; i <= n; ++i) {
    cdf[i] = static_cast<uint32_t>(
        (static_cast<uint64_t>(1u << precision) * cdf[i]) / total);
  }
  for (int i = 1; i <= n; ++i) cdf[i] += cdf[i - 1];
  cdf[n] = 1u << precision;

  for (int i = 0; i < n; ++i) {
    if (cdf[i] != cdf[i + 1]) continue;
    // steal one count from the lowest-frequency symbol with freq > 1
    uint32_t best_freq = ~0u;
    int best = -1;
    for (int j = 0; j < n; ++j) {
      const uint32_t freq = cdf[j + 1] - cdf[j];
      if (freq > 1 && freq < best_freq) {
        best_freq = freq;
        best = j;
      }
    }
    if (best < 0) return -4;
    if (best < i) {
      for (int j = best + 1; j <= i; ++j) cdf[j]--;
    } else {
      for (int j = i + 1; j <= best; ++j) cdf[j]++;
    }
  }
  for (int i = 0; i <= n; ++i) out[i] = static_cast<int32_t>(cdf[i]);
  return 0;
}

// Encode n symbols against per-symbol CDF rows selected by `indexes`.
// cdfs: [cdf_rows, cdf_cols] row-major int32.  Returns byte length written to
// `out` (capacity out_cap), or negative on error (-5: overflow).
int64_t rans_encode_with_indexes(const int32_t *symbols, const int32_t *indexes,
                                 int64_t n, const int32_t *cdfs, int cdf_rows,
                                 int cdf_cols, const int32_t *cdf_lengths,
                                 const int32_t *offsets, uint8_t *out,
                                 int64_t out_cap) {
  std::vector<RansSym> syms;
  syms.reserve(static_cast<size_t>(n) + 16);

  for (int64_t i = 0; i < n; ++i) {
    const int32_t idx = indexes[i];
    if (idx < 0 || idx >= cdf_rows) return -1;
    const int32_t *cdf = cdfs + static_cast<int64_t>(idx) * cdf_cols;
    const int32_t max_value = cdf_lengths[idx] - 2;
    const int64_t folded = static_cast<int64_t>(symbols[i]) - offsets[idx];
    int32_t value;

    // zig-zag fold in 64-bit: for |folded| near INT32_MAX the 2x doubling
    // would overflow int32 (UB); raw_val itself always fits 32 bits.
    uint32_t raw_val = 0;
    if (folded < 0) {
      raw_val = static_cast<uint32_t>(-2 * folded - 1);
      value = max_value;
    } else if (folded >= max_value) {
      raw_val = static_cast<uint32_t>(2 * (folded - max_value));
      value = max_value;
    } else {
      value = static_cast<int32_t>(folded);
    }
    syms.push_back({static_cast<uint16_t>(cdf[value]),
                    static_cast<uint16_t>(cdf[value + 1] - cdf[value]), false});

    if (value == max_value) {
      // chunk-count prefix, then the 4-bit chunks (LSB first).  Count by
      // shifting a copy down (a `raw_val >> (n*4)` probe hits shift-by-32
      // UB — an infinite loop on x86 — once raw_val needs 8 chunks).
      uint32_t n_bypass = 0;
      for (uint32_t v = raw_val; v != 0; v >>= kBypassPrecision) ++n_bypass;
      uint32_t val = n_bypass;
      while (val >= kMaxBypassVal) {
        syms.push_back({static_cast<uint16_t>(kMaxBypassVal), 0, true});
        val -= kMaxBypassVal;
      }
      syms.push_back({static_cast<uint16_t>(val), 0, true});
      for (uint32_t j = 0; j < n_bypass; ++j) {
        syms.push_back({static_cast<uint16_t>(
                            (raw_val >> (j * kBypassPrecision)) & kMaxBypassVal),
                        0, true});
      }
    }
  }

  std::vector<uint32_t> buf(syms.size() + 4);
  uint32_t *ptr = buf.data() + buf.size();
  uint64_t x = kRansL;
  for (auto it = syms.rbegin(); it != syms.rend(); ++it) {
    if (it->bypass) {
      enc_put_bits(x, ptr, it->start, kBypassPrecision);
    } else {
      enc_put(x, ptr, it->start, it->range);
    }
  }
  enc_flush(x, ptr);

  const int64_t nbytes =
      static_cast<int64_t>(buf.data() + buf.size() - ptr) * 4;
  if (nbytes > out_cap) return -5;
  std::memcpy(out, ptr, static_cast<size_t>(nbytes));
  return nbytes;
}

static void decode_symbols(RansDecState &st, const int32_t *indexes, int64_t n,
                           const int32_t *cdfs, int cdf_cols,
                           const int32_t *cdf_lengths, const int32_t *offsets,
                           int32_t *out) {
  for (int64_t i = 0; i < n; ++i) {
    const int32_t idx = indexes[i];
    const int32_t *cdf = cdfs + static_cast<int64_t>(idx) * cdf_cols;
    const int32_t max_value = cdf_lengths[idx] - 2;
    const uint32_t cum = st.get();

    // binary search for the symbol whose [cdf[v], cdf[v+1]) contains cum
    // (the reference coder scans linearly; rows hold up to ~130 entries)
    int32_t lo = 0, hi = cdf_lengths[idx] - 1;
    while (hi - lo > 1) {
      const int32_t mid = (lo + hi) >> 1;
      if (static_cast<uint32_t>(cdf[mid]) <= cum) {
        lo = mid;
      } else {
        hi = mid;
      }
    }
    int32_t value = lo;

    st.advance(static_cast<uint32_t>(cdf[value]),
               static_cast<uint32_t>(cdf[value + 1] - cdf[value]));

    if (value == max_value) {
      uint32_t val = st.get_bits(kBypassPrecision);
      uint32_t n_bypass = val;
      while (val == kMaxBypassVal) {
        val = st.get_bits(kBypassPrecision);
        n_bypass += val;
      }
      uint64_t raw_val = 0;
      for (uint32_t j = 0; j < n_bypass && j * kBypassPrecision < 64; ++j) {
        raw_val |= static_cast<uint64_t>(st.get_bits(kBypassPrecision))
                   << (j * kBypassPrecision);
      }
      const int64_t mag = static_cast<int64_t>(raw_val >> 1);
      const int64_t unfolded = (raw_val & 1) ? -mag - 1 : mag + max_value;
      out[i] = static_cast<int32_t>(unfolded + offsets[idx]);
      continue;
    }
    out[i] = value + offsets[idx];
  }
}

int64_t rans_decode_with_indexes(const uint8_t *stream, int64_t stream_len,
                                 const int32_t *indexes, int64_t n,
                                 const int32_t *cdfs, int cdf_rows, int cdf_cols,
                                 const int32_t *cdf_lengths,
                                 const int32_t *offsets, int32_t *out) {
  if (stream_len < 8) return -1;
  (void)cdf_rows;
  RansDecState st;
  st.init(stream, stream_len);
  decode_symbols(st, indexes, n, cdfs, cdf_cols, cdf_lengths, offsets, out);
  return n;
}

// --- streaming decoder (Charm serial decode) -------------------------------

void *rans_decoder_new(const uint8_t *stream, int64_t len) {
  if (len < 8) return nullptr;
  auto *st = new RansDecState();
  st->init(stream, len);
  return st;
}

void rans_decoder_decode(void *dec, const int32_t *indexes, int64_t n,
                         const int32_t *cdfs, int cdf_rows, int cdf_cols,
                         const int32_t *cdf_lengths, const int32_t *offsets,
                         int32_t *out) {
  (void)cdf_rows;
  auto *st = static_cast<RansDecState *>(dec);
  decode_symbols(*st, indexes, n, cdfs, cdf_cols, cdf_lengths, offsets, out);
}

void rans_decoder_free(void *dec) { delete static_cast<RansDecState *>(dec); }

}  // extern "C"

// ===========================================================================
// Lane-interleaved rans32 — the "device" wire format.
//
// K independent 32-bit rANS streams (16-bit probability precision, 16-bit
// renormalization words) per image.  Symbols are assigned to lanes by
// `local_flat_position % K`, with the assignment restarting at every slice
// boundary, so a vectorized decoder advances all K lanes by one symbol per
// step — this is what lets the TPU decode the stream as dense [K]-wide
// vector ops inside a single compiled program (see ops/device_rans.py).
//
// Out-of-range symbols do NOT bypass-code inline (data-dependent extra reads
// would break the fixed one-read-per-symbol vector decode); the encoder
// writes the escape slot into the stream and records (flat position, value)
// in a fixup side channel that rides the container and is scattered over the
// decoded plane on device.  CDF tables / lengths / offsets are the SAME
// 16-bit-precision tables the CompressAI-compatible coder uses.
//
// Invariants (checked by tests/test_lane_rans.py against an independent
// numpy model):
//   * state in [2^16, 2^32) after init/renorm; exactly 0 or 1 word read per
//     decoded symbol; at most 2 words emitted per encoded symbol;
//   * lane stream layout: [state_hi16, state_lo16, renorm words...];
//   * decode consumption order within a slice = ascending flat position.

namespace {

constexpr uint32_t kLaneL = 1u << 16;  // lower renorm bound = 2^16

struct LaneSym {
  uint16_t low;
  uint16_t freq_m1;  // freq - 1 (freq can be 2^16 on degenerate rows)
};

}  // namespace

extern "C" {

// Returns the number of fixups (>= 0) or a negative error:
//   -1 lane word buffer overflow, -2 fixup overflow, -3 zero-frequency slot,
//   -4 bad arguments.
// out_words is [K, lane_cap] row-major uint16; out_lens[K] = words used.
int64_t lane_rans_encode(const int32_t *values, const int32_t *indexes,
                         int64_t n, const int64_t *slice_off, int n_slices,
                         int K, const int32_t *cdfs, int cdf_rows,
                         int cdf_cols, const int32_t *cdf_lengths,
                         const int32_t *offsets, uint16_t *out_words,
                         int64_t lane_cap, int32_t *out_lens,
                         int64_t *fix_pos, int32_t *fix_val,
                         int64_t fix_cap) {
  if (K <= 0 || n_slices <= 0 || slice_off[0] != 0 || slice_off[n_slices] != n)
    return -4;

  // Pass 1 (forward, lane-independent): resolve every symbol to its CDF slot
  // and collect escapes in deterministic flat order.
  std::vector<LaneSym> slots(static_cast<size_t>(n));
  int64_t n_fix = 0;
  for (int64_t p = 0; p < n; ++p) {
    const int32_t idx = indexes[p];
    if (idx < 0 || idx >= cdf_rows) return -4;
    const int32_t max_value = cdf_lengths[idx] - 2;
    int64_t folded = static_cast<int64_t>(values[p]) - offsets[idx];
    if (folded < 0 || folded >= max_value) {
      if (n_fix >= fix_cap) return -2;
      fix_pos[n_fix] = p;
      fix_val[n_fix] = values[p];
      ++n_fix;
      folded = max_value;  // escape slot
    }
    const int32_t *row = cdfs + static_cast<int64_t>(idx) * cdf_cols;
    const int64_t low = row[folded];
    const int64_t freq = static_cast<int64_t>(row[folded + 1]) - low;
    if (freq <= 0 || freq > (1 << 16)) return -3;  // non-monotone CDF row
    slots[p].low = static_cast<uint16_t>(low);
    slots[p].freq_m1 = static_cast<uint16_t>(freq - 1);
  }

  // Pass 2: per-lane reverse encode.
  std::vector<int64_t> seq;     // lane's positions, consumption order
  std::vector<uint16_t> emit;   // renorm words, encode order
  for (int j = 0; j < K; ++j) {
    seq.clear();
    for (int s = 0; s < n_slices; ++s) {
      for (int64_t p = slice_off[s] + j; p < slice_off[s + 1]; p += K)
        seq.push_back(p);
    }
    uint32_t state = kLaneL;
    emit.clear();
    for (auto it = seq.rbegin(); it != seq.rend(); ++it) {
      const LaneSym &sym = slots[static_cast<size_t>(*it)];
      const uint32_t freq = static_cast<uint32_t>(sym.freq_m1) + 1u;
      while (static_cast<uint64_t>(state) >=
             (static_cast<uint64_t>(freq) << 16)) {
        emit.push_back(static_cast<uint16_t>(state & 0xFFFFu));
        state >>= 16;
      }
      state = ((state / freq) << 16) + (state % freq) + sym.low;
    }
    const int64_t len = 2 + static_cast<int64_t>(emit.size());
    if (len > lane_cap) return -1;
    uint16_t *w = out_words + static_cast<int64_t>(j) * lane_cap;
    w[0] = static_cast<uint16_t>(state >> 16);
    w[1] = static_cast<uint16_t>(state & 0xFFFFu);
    for (size_t t = 0; t < emit.size(); ++t)
      w[2 + t] = emit[emit.size() - 1 - t];
    out_lens[j] = static_cast<int32_t>(len);
  }
  return n_fix;
}

// --- streaming host decoder (CPU fallback for the device wire) -------------

namespace {

struct LaneDecState {
  std::vector<uint32_t> state;    // [K]
  std::vector<uint16_t> words;    // [K * cap]
  std::vector<int64_t> ptr;       // [K] read cursor into the lane row
  int64_t cap = 0;
  int K = 0;
};

}  // namespace

void *lane_decoder_new(const uint16_t *words, const int32_t *lens, int K,
                       int64_t lane_cap) {
  auto *st = new LaneDecState();
  st->K = K;
  st->cap = lane_cap;
  st->words.assign(words, words + static_cast<int64_t>(K) * lane_cap);
  st->state.resize(K);
  st->ptr.resize(K);
  for (int j = 0; j < K; ++j) {
    if (lens[j] < 2) {
      delete st;
      return nullptr;
    }
    const uint16_t *w = words + static_cast<int64_t>(j) * lane_cap;
    st->state[j] = (static_cast<uint32_t>(w[0]) << 16) | w[1];
    st->ptr[j] = 2;
  }
  return st;
}

// Decode the next `m` symbols (one slice's worth; lane assignment restarts
// here, matching the encoder's per-slice restart).  Escape slots decode to
// (max_value + offset); the caller overlays fixups.
void lane_decoder_decode(void *dec, const int32_t *indexes, int64_t m,
                         const int32_t *cdfs, int cdf_rows, int cdf_cols,
                         const int32_t *cdf_lengths, const int32_t *offsets,
                         int32_t *out) {
  (void)cdf_rows;
  auto *st = static_cast<LaneDecState *>(dec);
  for (int64_t p = 0; p < m; ++p) {
    const int j = static_cast<int>(p % st->K);
    uint32_t x = st->state[j];
    const int32_t idx = indexes[p];
    const int32_t *row = cdfs + static_cast<int64_t>(idx) * cdf_cols;
    const uint32_t mod = x & 0xFFFFu;
    int32_t lo = 0, hi = cdf_lengths[idx] - 1;
    while (lo + 1 < hi) {  // row[s] <= mod < row[s+1]
      const int32_t mid = (lo + hi) / 2;
      if (static_cast<uint32_t>(row[mid]) <= mod)
        lo = mid;
      else
        hi = mid;
    }
    const uint32_t low = static_cast<uint32_t>(row[lo]);
    const uint32_t freq = static_cast<uint32_t>(row[lo + 1]) - low;
    x = freq * (x >> 16) + mod - low;
    if (x < kLaneL) {
      const uint16_t *w = st->words.data() + static_cast<int64_t>(j) * st->cap;
      x = (x << 16) | w[st->ptr[j]++];
    }
    st->state[j] = x;
    out[p] = lo + offsets[idx];
  }
}

void lane_decoder_free(void *dec) { delete static_cast<LaneDecState *>(dec); }

}  // extern "C"
