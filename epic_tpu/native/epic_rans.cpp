// epic_rans.cpp — host-side entropy coding backend for the epic_tpu framework.
//
// A 64-bit range-asymmetric-numeral-system (rANS) coder with per-symbol CDF
// table selection ("encode/decode with indexes") and escape+bypass coding for
// out-of-range symbols, plus a fixed-point PMF→CDF quantizer.
//
// This is a from-scratch implementation of the *semantics* the reference
// framework gets from CompressAI's C++ backend (see
// /root/reference/src/entropy_models/entropy_models.py:14,48-52 for the
// Python-visible API surface): byte-exact round-trip of
// (symbols, indexes, cdf tables, cdf lengths, offsets). The bitstream format
// is our own; it only needs to be self-consistent between this encoder and
// decoder. Designed for batched operation: entire slices / image batches are
// encoded in one call, parallelized across messages with std::thread.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC epic_rans.cpp -o libepic_rans.so
//
// rANS math (precision P, 64-bit state, 32-bit renormalization):
//   encode(start, freq):  x' = (x / freq) << P | (x % freq) + start
//   decode:               cf = x & mask; find s: cdf[s] <= cf < cdf[s+1]
//                         x' = freq * (x >> P) + cf - start
// Encoder walks the message in reverse so the decoder reads forward.

#include <cstdint>
#include <cstring>
#include <vector>
#include <thread>
#include <algorithm>
#include <cmath>
#include <atomic>
#include <functional>
#include <numeric>

namespace {

constexpr uint64_t RANS_L = 1ull << 31;   // lower bound of normalized interval
constexpr int BYPASS_NIBBLE = 4;          // raw bits per bypass chunk

struct Op {
    // One encode step: either a cdf-interval op or a raw-bits (bypass) op.
    uint32_t start;
    uint32_t freq;     // freq == 0 marks a raw-bits op: emit `bits` of width `n`
    uint32_t bits;
    uint32_t nbits;
};

class RansEncState {
public:
    uint64_t x = RANS_L;
    std::vector<uint32_t> out;  // emitted 32-bit words (reverse order)

    inline void put(uint32_t start, uint32_t freq, int precision) {
        const uint64_t x_max = ((RANS_L >> precision) << 32) * freq;
        while (x >= x_max) { out.push_back(static_cast<uint32_t>(x)); x >>= 32; }
        x = ((x / freq) << precision) + (x % freq) + start;
    }

    inline void put_bits(uint32_t val, int nbits) {
        const uint64_t x_max = (RANS_L >> nbits) << 32;
        while (x >= x_max) { out.push_back(static_cast<uint32_t>(x)); x >>= 32; }
        x = (x << nbits) | val;
    }

    // Final state flush: two 32-bit words.
    void flush() {
        out.push_back(static_cast<uint32_t>(x));
        out.push_back(static_cast<uint32_t>(x >> 32));
    }
};

class RansDecState {
public:
    uint64_t x = 0;
    const uint32_t* ptr;
    const uint32_t* end;

    void init(const uint32_t* words, size_t nwords) {
        // Words were emitted in reverse; the flushed state is the LAST two.
        ptr = words;
        end = words + nwords;
        x = static_cast<uint64_t>(*(end - 1)) << 32 | *(end - 2);
        end -= 2;
        // remaining words are consumed from end-1 downward
    }

    inline uint32_t peek(int precision) const {
        return static_cast<uint32_t>(x & ((1u << precision) - 1));
    }

    inline void advance(uint32_t start, uint32_t freq, int precision) {
        x = freq * (x >> precision) + (x & ((1u << precision) - 1)) - start;
        if (x < RANS_L && end > ptr) { --end; x = (x << 32) | *end; }
    }

    inline uint32_t get_bits(int nbits) {
        uint32_t val = static_cast<uint32_t>(x & ((1u << nbits) - 1));
        x >>= nbits;
        if (x < RANS_L && end > ptr) { --end; x = (x << 32) | *end; }
        return val;
    }
};

// Append the ops for one symbol (forward/decoder order) to `ops`.
// Row layout matches the reference CDF buffers: row i holds cdf_length[i]
// monotone entries in [0, 2^P]; the pmf covers cdf_length-2 symbol values and
// the final interval [cdf[L-2], cdf[L-1]] is the escape/tail slot
// (reference: entropy_models.py:175-183 row construction, +2 tail slots).
inline void ops_for_symbol(int32_t value, const uint32_t* cdf, int32_t cdf_len,
                           int32_t offset, std::vector<Op>& ops) {
    const int32_t max_sym = cdf_len - 2;  // index of the escape slot
    // 64-bit zig-zag: int32 symbols with |value - offset| near 2^31 would
    // wrap in 32-bit arithmetic and round-trip silently corrupted.
    int64_t raw = static_cast<int64_t>(value) - offset;
    uint64_t ov = 0;
    bool escape = false;
    int32_t slot;
    if (raw < 0) {
        escape = true;
        ov = 2ull * static_cast<uint64_t>(-(raw + 1)) + 1ull;  // negatives odd
        slot = max_sym;
    } else if (raw >= max_sym) {
        escape = true;
        ov = 2ull * static_cast<uint64_t>(raw - max_sym);      // non-neg even
        slot = max_sym;
    } else {
        slot = static_cast<int32_t>(raw);
    }
    ops.push_back({cdf[slot], cdf[slot + 1] - cdf[slot], 0, 0});
    if (escape) {
        // little-endian nibbles, each followed by a 1-bit continuation flag
        while (true) {
            uint32_t nib = static_cast<uint32_t>(
                ov & ((1ull << BYPASS_NIBBLE) - 1));
            ov >>= BYPASS_NIBBLE;
            uint32_t more = ov > 0 ? 1u : 0u;
            ops.push_back({0, 0, nib, BYPASS_NIBBLE});
            ops.push_back({0, 0, more, 1});
            if (!more) break;
        }
    }
}

// Encode one message into a byte vector.
void encode_one(const int32_t* symbols, const int32_t* indexes, int64_t n,
                const uint32_t* cdfs, int64_t cdf_stride,
                const int32_t* cdf_lengths, const int32_t* offsets,
                int precision, std::vector<uint8_t>& out_bytes) {
    std::vector<Op> ops;
    ops.reserve(static_cast<size_t>(n) + 16);
    for (int64_t i = 0; i < n; ++i) {
        const int32_t idx = indexes[i];
        ops_for_symbol(symbols[i], cdfs + idx * cdf_stride, cdf_lengths[idx],
                       offsets[idx], ops);
    }
    RansEncState enc;
    for (auto it = ops.rbegin(); it != ops.rend(); ++it) {
        if (it->freq != 0) enc.put(it->start, it->freq, precision);
        else enc.put_bits(it->bits, static_cast<int>(it->nbits));
    }
    enc.flush();
    // Emitted words are in reverse order already; store them as little-endian
    // bytes in emission order — the decoder indexes from the back.
    out_bytes.resize(enc.out.size() * 4);
    std::memcpy(out_bytes.data(), enc.out.data(), out_bytes.size());
}

// Encode one message, recording per-boundary decode-prefix sizes.
//
// seg_ends[k] (ascending, seg_ends[nseg-1] == n) are cumulative symbol
// counts. rANS is a stack: the encoder walks ops in reverse, so the words a
// decoder consumes while decoding symbols [0, seg_ends[k]) are exactly the
// flush words plus the words the encoder emits while processing ops below
// that boundary. prefix_bytes[k] = bytes of the stream (counted from its
// transmission front = buffer END, where the flushed state lives) needed to
// decode through boundary k. This is what makes ONE stream per image
// progressively transmittable with exact per-level byte accounting
// (reference keeps per-shell messages instead and pays an 8-byte flush per
// message, functions_encode.py:172-196).
void encode_seg_one(const int32_t* symbols, const int32_t* indexes, int64_t n,
                    const int64_t* seg_ends, int32_t nseg,
                    const uint32_t* cdfs, int64_t cdf_stride,
                    const int32_t* cdf_lengths, const int32_t* offsets,
                    int precision, std::vector<uint8_t>& out_bytes,
                    int64_t* prefix_bytes) {
    std::vector<Op> ops;
    ops.reserve(static_cast<size_t>(n) + 16);
    std::vector<int64_t> boundary_ops(static_cast<size_t>(nseg));
    {
        int32_t k = 0;
        for (int64_t i = 0; i < n; ++i) {
            while (k < nseg && seg_ends[k] == i)
                boundary_ops[static_cast<size_t>(k++)] =
                    static_cast<int64_t>(ops.size());
            const int32_t idx = indexes[i];
            ops_for_symbol(symbols[i], cdfs + idx * cdf_stride,
                           cdf_lengths[idx], offsets[idx], ops);
        }
        while (k < nseg)
            boundary_ops[static_cast<size_t>(k++)] =
                static_cast<int64_t>(ops.size());
    }
    RansEncState enc;
    std::vector<int64_t> snap(static_cast<size_t>(nseg), 0);
    int32_t bk = nseg - 1;
    const int64_t t = static_cast<int64_t>(ops.size());
    for (int64_t j = t - 1; j >= 0; --j) {
        while (bk >= 0 && boundary_ops[static_cast<size_t>(bk)] == j + 1)
            snap[static_cast<size_t>(bk--)] =
                static_cast<int64_t>(enc.out.size());
        const Op& op = ops[static_cast<size_t>(j)];
        if (op.freq != 0) enc.put(op.start, op.freq, precision);
        else enc.put_bits(op.bits, static_cast<int>(op.nbits));
    }
    while (bk >= 0)
        snap[static_cast<size_t>(bk--)] = static_cast<int64_t>(enc.out.size());
    const int64_t pre_flush = static_cast<int64_t>(enc.out.size());
    enc.flush();
    for (int32_t k = 0; k < nseg; ++k)
        prefix_bytes[k] = 4 * (2 + pre_flush - snap[static_cast<size_t>(k)]);
    out_bytes.resize(enc.out.size() * 4);
    std::memcpy(out_bytes.data(), enc.out.data(), out_bytes.size());
}

// Decode one message.
void decode_one(const uint8_t* data, int64_t nbytes,
                const int32_t* indexes, int64_t n,
                const uint32_t* cdfs, int64_t cdf_stride,
                const int32_t* cdf_lengths, const int32_t* offsets,
                int precision, int32_t* symbols_out) {
    std::vector<uint32_t> words(static_cast<size_t>(nbytes / 4));
    std::memcpy(words.data(), data, static_cast<size_t>(nbytes));
    RansDecState dec;
    dec.init(words.data(), words.size());
    for (int64_t i = 0; i < n; ++i) {
        const int32_t idx = indexes[i];
        const uint32_t* cdf = cdfs + idx * cdf_stride;
        const int32_t cdf_len = cdf_lengths[idx];
        const int32_t max_sym = cdf_len - 2;
        const uint32_t cf = dec.peek(precision);
        // Linear scan is fine: tables are short (<= ~1500 entries) and the
        // common case hits early; binary search for longer rows.
        int32_t s;
        if (cdf_len > 32) {
            const uint32_t* hi =
                std::upper_bound(cdf + 1, cdf + cdf_len, cf);
            s = static_cast<int32_t>(hi - cdf) - 1;
        } else {
            s = 0;
            while (cdf[s + 1] <= cf) ++s;
        }
        dec.advance(cdf[s], cdf[s + 1] - cdf[s], precision);
        int64_t value;
        if (s == max_sym) {
            uint64_t ov = 0; int shift = 0;
            while (true) {
                uint64_t nib = dec.get_bits(BYPASS_NIBBLE);
                uint32_t more = dec.get_bits(1);
                ov |= nib << shift;
                shift += BYPASS_NIBBLE;
                if (!more) break;
            }
            if (ov & 1u) value = -static_cast<int64_t>(ov >> 1) - 1;
            else value = static_cast<int64_t>(ov >> 1) + max_sym;
        } else {
            value = s;
        }
        symbols_out[i] = static_cast<int32_t>(value + offsets[idx]);
    }
}

// Read a signed symbol of width 1/2/4 bytes at flat position i.
inline int32_t read_sym_w(const void* base, int32_t width, int64_t i) {
    switch (width) {
        case 1: return static_cast<const int8_t*>(base)[i];
        case 2: return static_cast<const int16_t*>(base)[i];
        default: return static_cast<const int32_t*>(base)[i];
    }
}

// Decode ONE symbol from a rANS state (shared by decode_one /
// stream decode / the shell decoder).
inline int32_t decode_symbol(RansDecState& st, const uint32_t* cdf,
                             int32_t cdf_len, int32_t offset,
                             int precision) {
    const int32_t max_sym = cdf_len - 2;
    const uint32_t cf = st.peek(precision);
    int32_t s;
    if (cdf_len > 32) {
        const uint32_t* hi = std::upper_bound(cdf + 1, cdf + cdf_len, cf);
        s = static_cast<int32_t>(hi - cdf) - 1;
    } else {
        s = 0;
        while (cdf[s + 1] <= cf) ++s;
    }
    st.advance(cdf[s], cdf[s + 1] - cdf[s], precision);
    int64_t value;
    if (s == max_sym) {
        uint64_t ov = 0; int shift = 0;
        while (true) {
            uint64_t nib = st.get_bits(BYPASS_NIBBLE);
            uint32_t more = st.get_bits(1);
            ov |= nib << shift;
            shift += BYPASS_NIBBLE;
            if (!more) break;
        }
        if (ov & 1u) value = -static_cast<int64_t>(ov >> 1) - 1;
        else value = static_cast<int64_t>(ov >> 1) + max_sym;
    } else {
        value = s;
    }
    return static_cast<int32_t>(value + offset);
}

void parallel_for(int64_t count, int64_t max_threads,
                  const std::function<void(int64_t)>& fn) {
    if (count <= 1 || max_threads <= 1) {
        for (int64_t i = 0; i < count; ++i) fn(i);
        return;
    }
    int64_t nthreads = std::min<int64_t>(count, max_threads);
    std::vector<std::thread> threads;
    threads.reserve(static_cast<size_t>(nthreads));
    std::atomic<int64_t> next{0};
    for (int64_t t = 0; t < nthreads; ++t) {
        threads.emplace_back([&]() {
            while (true) {
                int64_t i = next.fetch_add(1);
                if (i >= count) break;
                fn(i);
            }
        });
    }
    for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

// Quantize a float PMF (length n) to an integer CDF with `precision` bits of
// total mass. Writes n+1 entries to cdf_out: cdf[0]=0, cdf[n]=2^precision,
// every symbol gets frequency >= 1. Returns 0 on success.
// (TPU-native counterpart of the reference's C++ pmf_to_quantized_cdf,
// reference call site: entropy_models.py:61-64.)
int epic_pmf_to_quantized_cdf(const float* pmf, int32_t n, int32_t precision,
                              uint32_t* cdf_out) {
    if (n <= 0 || precision <= 0 || precision > 30) return -1;
    const uint32_t total = 1u << precision;
    double sum = 0.0;
    std::vector<double> p(static_cast<size_t>(n));
    for (int32_t i = 0; i < n; ++i) {
        double v = pmf[i];
        if (!(v > 0.0) || std::isnan(v)) v = 0.0;
        p[static_cast<size_t>(i)] = v;
        sum += v;
    }
    std::vector<uint32_t> freq(static_cast<size_t>(n), 1);
    if (sum > 0.0) {
        uint64_t acc = 0;
        for (int32_t i = 0; i < n; ++i) {
            uint32_t f = static_cast<uint32_t>(
                std::lround(p[static_cast<size_t>(i)] / sum *
                            static_cast<double>(total)));
            if (f < 1) f = 1;
            freq[static_cast<size_t>(i)] = f;
            acc += f;
        }
        // Fix the rounding drift by adjusting the largest frequencies.
        int64_t diff = static_cast<int64_t>(total) - static_cast<int64_t>(acc);
        while (diff != 0) {
            if (diff > 0) {
                auto it = std::max_element(freq.begin(), freq.end());
                *it += static_cast<uint32_t>(std::min<int64_t>(diff, total));
                diff = static_cast<int64_t>(total) -
                       static_cast<int64_t>(
                           std::accumulate(freq.begin(), freq.end(), 0ull));
            } else {
                // steal from the largest freq that stays >= 1
                auto it = std::max_element(freq.begin(), freq.end());
                if (*it <= 1) return -2;  // cannot normalize
                uint32_t take = static_cast<uint32_t>(
                    std::min<int64_t>(-diff, static_cast<int64_t>(*it) - 1));
                *it -= take;
                diff += take;
            }
        }
    } else {
        // Degenerate PMF: uniform.
        uint32_t base = total / static_cast<uint32_t>(n);
        uint32_t rem = total - base * static_cast<uint32_t>(n);
        for (int32_t i = 0; i < n; ++i)
            freq[static_cast<size_t>(i)] = base + (static_cast<uint32_t>(i) < rem);
    }
    cdf_out[0] = 0;
    for (int32_t i = 0; i < n; ++i) cdf_out[i + 1] = cdf_out[i] + freq[static_cast<size_t>(i)];
    return cdf_out[n] == total ? 0 : -3;
}

// Batched PMF→CDF: m rows, each row i has pmf_lengths[i] valid entries in
// pmf[i*pmf_stride ...]; writes pmf_lengths[i]+1 entries into
// cdf_out[i*cdf_stride ...] (callers zero-pad the rest).
int epic_pmf_to_quantized_cdf_batch(const float* pmf, int64_t pmf_stride,
                                    const int32_t* pmf_lengths, int32_t m,
                                    int32_t precision, uint32_t* cdf_out,
                                    int64_t cdf_stride, int32_t nthreads) {
    std::atomic<int> err{0};
    parallel_for(m, nthreads, [&](int64_t i) {
        int r = epic_pmf_to_quantized_cdf(pmf + i * pmf_stride, pmf_lengths[i],
                                          precision, cdf_out + i * cdf_stride);
        if (r != 0) err.store(r);
    });
    return err.load();
}

// Encode one message of n symbols. Returns the number of bytes written to
// `out` (capacity `out_capacity`), or -1 if the output did not fit.
int64_t epic_rans_encode(const int32_t* symbols, const int32_t* indexes,
                         int64_t n, const uint32_t* cdfs, int64_t cdf_stride,
                         const int32_t* cdf_lengths, const int32_t* offsets,
                         int32_t precision, uint8_t* out,
                         int64_t out_capacity) {
    std::vector<uint8_t> bytes;
    encode_one(symbols, indexes, n, cdfs, cdf_stride, cdf_lengths, offsets,
               precision, bytes);
    if (static_cast<int64_t>(bytes.size()) > out_capacity) return -1;
    std::memcpy(out, bytes.data(), bytes.size());
    return static_cast<int64_t>(bytes.size());
}

// Decode one message of n symbols.
int32_t epic_rans_decode(const uint8_t* data, int64_t nbytes,
                         const int32_t* indexes, int64_t n,
                         const uint32_t* cdfs, int64_t cdf_stride,
                         const int32_t* cdf_lengths, const int32_t* offsets,
                         int32_t precision, int32_t* symbols_out) {
    if (nbytes < 8 || (nbytes % 4) != 0) return -1;
    decode_one(data, nbytes, indexes, n, cdfs, cdf_stride, cdf_lengths,
               offsets, precision, symbols_out);
    return 0;
}

// Segmented encode: one message with nseg cumulative boundaries; returns the
// byte count (or -1 if out_capacity was exceeded) and fills prefix_bytes[k]
// with the stream prefix (from the transmission front) needed to decode
// symbols [0, seg_ends[k]).
int64_t epic_rans_encode_seg(const int32_t* symbols, const int32_t* indexes,
                             int64_t n, const int64_t* seg_ends, int32_t nseg,
                             const uint32_t* cdfs, int64_t cdf_stride,
                             const int32_t* cdf_lengths,
                             const int32_t* offsets, int32_t precision,
                             uint8_t* out, int64_t out_capacity,
                             int64_t* prefix_bytes) {
    std::vector<uint8_t> bytes;
    encode_seg_one(symbols, indexes, n, seg_ends, nseg, cdfs, cdf_stride,
                   cdf_lengths, offsets, precision, bytes, prefix_bytes);
    if (static_cast<int64_t>(bytes.size()) > out_capacity) return -1;
    std::memcpy(out, bytes.data(), bytes.size());
    return static_cast<int64_t>(bytes.size());
}

// Batched segmented encode: m messages, each with the SAME number of
// boundaries nseg. seg_ends is [m, nseg] (cumulative symbol counts local to
// each message); prefix_bytes is [m, nseg]. Parallel across messages.
int32_t epic_rans_encode_seg_batch(
    const int32_t* symbols, const int32_t* indexes, const int64_t* msg_offsets,
    const int64_t* msg_lengths, int32_t m, const int64_t* seg_ends,
    int32_t nseg, const uint32_t* cdfs, int64_t cdf_stride,
    const int32_t* cdf_lengths, const int32_t* offsets, int32_t precision,
    uint8_t* out, int64_t per_msg_capacity, int64_t* out_lengths,
    int64_t* prefix_bytes, int32_t nthreads) {
    std::atomic<int> err{0};
    parallel_for(m, nthreads, [&](int64_t i) {
        int64_t r = epic_rans_encode_seg(
            symbols + msg_offsets[i], indexes + msg_offsets[i], msg_lengths[i],
            seg_ends + i * nseg, nseg, cdfs, cdf_stride, cdf_lengths, offsets,
            precision, out + i * per_msg_capacity, per_msg_capacity,
            prefix_bytes + i * nseg);
        out_lengths[i] = r;
        if (r < 0) err.store(-1);
    });
    return err.load();
}

// Batched encode: m messages. Message i covers
// symbols[msg_offsets[i] : msg_offsets[i] + msg_lengths[i]] (same for
// indexes). Outputs are written contiguously per-message into `out`
// (each message gets `per_msg_capacity` bytes at out + i*per_msg_capacity);
// actual byte counts land in out_lengths[i] (-1 if it did not fit).
// Parallel across messages.
int32_t epic_rans_encode_batch(const int32_t* symbols, const int32_t* indexes,
                               const int64_t* msg_offsets,
                               const int64_t* msg_lengths, int32_t m,
                               const uint32_t* cdfs, int64_t cdf_stride,
                               const int32_t* cdf_lengths,
                               const int32_t* offsets, int32_t precision,
                               uint8_t* out, int64_t per_msg_capacity,
                               int64_t* out_lengths, int32_t nthreads) {
    std::atomic<int> err{0};
    parallel_for(m, nthreads, [&](int64_t i) {
        int64_t r = epic_rans_encode(
            symbols + msg_offsets[i], indexes + msg_offsets[i], msg_lengths[i],
            cdfs, cdf_stride, cdf_lengths, offsets, precision,
            out + i * per_msg_capacity, per_msg_capacity);
        out_lengths[i] = r;
        if (r < 0) err.store(-1);
    });
    return err.load();
}

// Batched decode: mirrors epic_rans_encode_batch. data_offsets/data_lengths
// locate each message's bytes inside `data`.
int32_t epic_rans_decode_batch(const uint8_t* data, const int64_t* data_offsets,
                               const int64_t* data_lengths,
                               const int32_t* indexes,
                               const int64_t* msg_offsets,
                               const int64_t* msg_lengths, int32_t m,
                               const uint32_t* cdfs, int64_t cdf_stride,
                               const int32_t* cdf_lengths,
                               const int32_t* offsets, int32_t precision,
                               int32_t* symbols_out, int32_t nthreads) {
    std::atomic<int> err{0};
    parallel_for(m, nthreads, [&](int64_t i) {
        int32_t r = epic_rans_decode(
            data + data_offsets[i], data_lengths[i], indexes + msg_offsets[i],
            msg_lengths[i], cdfs, cdf_stride, cdf_lengths, offsets, precision,
            symbols_out + msg_offsets[i]);
        if (r != 0) err.store(r);
    });
    return err.load();
}

// -- stateful streaming decoder ---------------------------------------
// Semantics of the reference's RansDecoder.set_stream/decode_stream
// (used by the buffered single-stream codec, reference cnn.py:303-345):
// one rANS state persists across chunk decodes so entropy parameters for
// chunk k+1 can be computed from chunk k's decoded symbols.

struct EpicRansStream {
    std::vector<uint32_t> words;
    RansDecState st;
};

void* epic_rans_stream_new(const uint8_t* data, int64_t nbytes) {
    if (nbytes < 8 || (nbytes % 4) != 0) return nullptr;
    auto* s = new EpicRansStream();
    s->words.resize(static_cast<size_t>(nbytes / 4));
    std::memcpy(s->words.data(), data, static_cast<size_t>(nbytes));
    s->st.init(s->words.data(), s->words.size());
    return s;
}

int32_t epic_rans_stream_decode(void* handle, const int32_t* indexes,
                                int64_t n, const uint32_t* cdfs,
                                int64_t cdf_stride,
                                const int32_t* cdf_lengths,
                                const int32_t* offsets, int32_t precision,
                                int32_t* symbols_out) {
    if (handle == nullptr) return -1;
    auto* s = static_cast<EpicRansStream*>(handle);
    for (int64_t i = 0; i < n; ++i) {
        const int32_t idx = indexes[i];
        const uint32_t* cdf = cdfs + idx * cdf_stride;
        const int32_t cdf_len = cdf_lengths[idx];
        const int32_t max_sym = cdf_len - 2;
        const uint32_t cf = s->st.peek(precision);
        int32_t sym;
        if (cdf_len > 32) {
            const uint32_t* hi = std::upper_bound(cdf + 1, cdf + cdf_len, cf);
            sym = static_cast<int32_t>(hi - cdf) - 1;
        } else {
            sym = 0;
            while (cdf[sym + 1] <= cf) ++sym;
        }
        s->st.advance(cdf[sym], cdf[sym + 1] - cdf[sym], precision);
        int64_t value;
        if (sym == max_sym) {
            uint64_t ov = 0; int shift = 0;
            while (true) {
                uint64_t nib = s->st.get_bits(BYPASS_NIBBLE);
                uint32_t more = s->st.get_bits(1);
                ov |= nib << shift;
                shift += BYPASS_NIBBLE;
                if (!more) break;
            }
            if (ov & 1u) value = -static_cast<int64_t>(ov >> 1) - 1;
            else value = static_cast<int64_t>(ov >> 1) + max_sym;
        } else {
            value = sym;
        }
        symbols_out[i] = static_cast<int32_t>(value + offsets[idx]);
    }
    return 0;
}

void epic_rans_stream_free(void* handle) {
    delete static_cast<EpicRansStream*>(handle);
}

// Advance m INDEPENDENT streams by one chunk each, in parallel across
// host threads (each stream's state is its own; chunk i covers
// indexes[msg_offsets[i] : msg_offsets[i] + msg_lengths[i]]). This is the
// decoder-side mirror of the batched encoders: one C call per SLICE for
// the whole image batch instead of one per (image, slice).
int32_t epic_rans_stream_decode_batch(
    void* const* handles, int32_t m, const int32_t* indexes,
    const int64_t* msg_offsets, const int64_t* msg_lengths,
    const uint32_t* cdfs, int64_t cdf_stride, const int32_t* cdf_lengths,
    const int32_t* offsets, int32_t precision, int32_t* symbols_out,
    int32_t nthreads) {
    std::atomic<int> err{0};
    parallel_for(m, nthreads, [&](int64_t i) {
        int32_t r = epic_rans_stream_decode(
            handles[i], indexes + msg_offsets[i], msg_lengths[i], cdfs,
            cdf_stride, cdf_lengths, offsets, precision,
            symbols_out + msg_offsets[i]);
        if (r != 0) err.store(r);
    });
    return err.load();
}

// -- shell-bucketed single-stream codec --------------------------------
// The progressive codec's y-stream per image is [base slices in grid
// order] ++ [progressive symbols STABLY sorted by shell id]. Deriving the
// permutation host-side (numpy argsort + take_along_axis + concats) was
// the measured bottleneck of the pipelined sweep (~1.9s/sweep of numpy on
// the 1-core TPU-VM host). These entry points take the UNSORTED flat
// arrays exactly as fetched from the device (int8 symbols, uint8 CDF
// indexes, int8 shell ids) and do the counting walk in C — the stable
// bucket order is identical to np.argsort(kind='stable'), so the emitted
// bytes are bit-identical to the former host pack.

int32_t epic_rans_encode_shell_batch(
    const void* base_sym, int32_t base_width, const uint8_t* base_idx,
    int64_t nb,
    const void* prog_sym, int32_t prog_width, const uint8_t* prog_idx,
    const int8_t* sid, int64_t np_,
    int32_t nq, int32_t m,
    const uint32_t* cdfs, int64_t cdf_stride, const int32_t* cdf_lengths,
    const int32_t* offsets, int32_t precision,
    uint8_t* out, int64_t per_msg_capacity, int64_t* out_lengths,
    int64_t* prefix_bytes /* [m, nq+1] */, int32_t nthreads) {
    std::atomic<int> err{0};
    parallel_for(m, nthreads, [&](int64_t b) {
        const int8_t* sid_b = sid + b * np_;
        const uint8_t* bidx = base_idx + b * nb;
        const uint8_t* pidx = prog_idx + b * np_;
        std::vector<int64_t> heads(static_cast<size_t>(nq) + 1, 0);
        for (int64_t i = 0; i < np_; ++i) {
            const int s = sid_b[i];
            if (s >= 0 && s < nq) ++heads[static_cast<size_t>(s) + 1];
        }
        for (int j = 1; j <= nq; ++j) heads[j] += heads[j - 1];
        const int64_t coded = heads[static_cast<size_t>(nq)];
        std::vector<int64_t> segs(static_cast<size_t>(nq) + 1);
        segs[0] = nb;
        for (int j = 1; j <= nq; ++j) segs[static_cast<size_t>(j)] =
            nb + heads[static_cast<size_t>(j)];
        std::vector<int64_t> pos(heads.begin(), heads.end() - 1);
        std::vector<int32_t> tmp_sym(static_cast<size_t>(nb + coded));
        std::vector<int32_t> tmp_idx(static_cast<size_t>(nb + coded));
        const void* bs = static_cast<const uint8_t*>(base_sym)
            + b * nb * base_width;
        for (int64_t i = 0; i < nb; ++i) {
            tmp_sym[static_cast<size_t>(i)] = read_sym_w(bs, base_width, i);
            tmp_idx[static_cast<size_t>(i)] = bidx[i];
        }
        const void* ps = static_cast<const uint8_t*>(prog_sym)
            + b * np_ * prog_width;
        for (int64_t i = 0; i < np_; ++i) {
            const int s = sid_b[i];
            if (s >= 0 && s < nq) {
                const int64_t p = nb + pos[static_cast<size_t>(s)]++;
                tmp_sym[static_cast<size_t>(p)] =
                    read_sym_w(ps, prog_width, i);
                tmp_idx[static_cast<size_t>(p)] = pidx[i];
            }
        }
        std::vector<uint8_t> bytes;
        encode_seg_one(tmp_sym.data(), tmp_idx.data(), nb + coded,
                       segs.data(), nq + 1, cdfs, cdf_stride, cdf_lengths,
                       offsets, precision, bytes,
                       prefix_bytes + b * (nq + 1));
        if (static_cast<int64_t>(bytes.size()) > per_msg_capacity) {
            out_lengths[b] = -1;
            err.store(-1);
            return;
        }
        std::memcpy(out + b * per_msg_capacity, bytes.data(), bytes.size());
        out_lengths[b] = static_cast<int64_t>(bytes.size());
    });
    return err.load();
}

// Advance m independent streams through shells [j0, j1), writing each
// decoded symbol at its ORIGINAL flat grid position into an int16 canvas
// [m, np_] — no host-side order array, no scatter. Values that do not fit
// int16 (escape-coded outliers) are appended to the overflow list for the
// caller to patch after widening its canvas. Returns the overflow count
// (>= 0) or a negative error (-1 bad handle, -3 overflow list full — the
// stream state is then mid-message and NOT reusable).
int32_t epic_rans_stream_decode_shell_batch(
    void* const* handles, int32_t m,
    const uint8_t* idx_flat, const int8_t* sid, int64_t np_,
    int32_t j0, int32_t j1, int32_t nq,
    const uint32_t* cdfs, int64_t cdf_stride, const int32_t* cdf_lengths,
    const int32_t* offsets, int32_t precision,
    int16_t* canvas,
    int64_t* overflow_pos, int32_t* overflow_val, int32_t overflow_cap,
    int32_t nthreads) {
    std::atomic<int> err{0};
    std::atomic<int32_t> novf{0};
    parallel_for(m, nthreads, [&](int64_t b) {
        if (handles[b] == nullptr) { err.store(-1); return; }
        auto* s = static_cast<EpicRansStream*>(handles[b]);
        const int8_t* sid_b = sid + b * np_;
        const uint8_t* idx_b = idx_flat + b * np_;
        std::vector<int64_t> heads(static_cast<size_t>(nq) + 1, 0);
        for (int64_t i = 0; i < np_; ++i) {
            const int v = sid_b[i];
            if (v >= 0 && v < nq) ++heads[static_cast<size_t>(v) + 1];
        }
        for (int j = 1; j <= nq; ++j) heads[j] += heads[j - 1];
        const int64_t count = heads[static_cast<size_t>(j1)]
            - heads[static_cast<size_t>(j0)];
        std::vector<int64_t> order(static_cast<size_t>(count));
        std::vector<int64_t> pos(static_cast<size_t>(nq), 0);
        for (int j = j0; j < j1; ++j)
            pos[static_cast<size_t>(j)] = heads[static_cast<size_t>(j)]
                - heads[static_cast<size_t>(j0)];
        for (int64_t i = 0; i < np_; ++i) {
            const int v = sid_b[i];
            if (v >= j0 && v < j1)
                order[static_cast<size_t>(pos[static_cast<size_t>(v)]++)] = i;
        }
        for (int64_t k = 0; k < count; ++k) {
            const int64_t i = order[static_cast<size_t>(k)];
            const int32_t idx = idx_b[i];
            const int32_t value = decode_symbol(
                s->st, cdfs + idx * cdf_stride, cdf_lengths[idx],
                offsets[idx], precision);
            if (value >= -32768 && value <= 32767) {
                canvas[b * np_ + i] = static_cast<int16_t>(value);
            } else {
                const int32_t slot = novf.fetch_add(1);
                if (slot >= overflow_cap) { err.store(-3); return; }
                overflow_pos[slot] = b * np_ + i;
                overflow_val[slot] = value;
            }
        }
    });
    const int e = err.load();
    return e != 0 ? e : novf.load();
}

}  // extern "C"
