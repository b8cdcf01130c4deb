// Native host-side feature ops for recom_tpu.
//
// The TPU host analogue of the reference's CPU-pinned feature ops: the
// reference keeps string parsing/hashing on CPU TF ops (cuda_emitter.cc
// SetFCBeginToCPU pins string producers to host) and stages everything
// through one ConcatInputs blob.  Our host path replaces the Python hash
// loop with batched C++ (FarmHash Fingerprint64, same public-domain
// algorithm as oracle/hashing.py — the two are cross-checked bit-for-bit in
// tests/test_hashing.py).
//
// Exposed as a plain C ABI for ctypes; built JIT by recom_tpu/native/build.py
// with g++ -O3 and MD5-cached in the engine cache dir (the reference's
// nvcc+MD5 kernel-cache pattern, cuda_emitter.cc:86-111, applied to host
// code).

#include <charconv>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <limits>
#include <thread>
#include <vector>

#if defined(__AVX512F__) && defined(__AVX512BW__)
#include <immintrin.h>
#define RECOM_AVX512 1
#endif

namespace {

constexpr uint64_t k0 = 0xc3a5c85c97cb3127ULL;
constexpr uint64_t k1 = 0xb492b66fbe98f273ULL;
constexpr uint64_t k2 = 0x9ae16a3b2f90404fULL;

inline uint64_t Fetch64(const uint8_t* p) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  return v;  // little-endian hosts only (x86/arm LE)
}

inline uint32_t Fetch32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

inline uint64_t Rotate(uint64_t v, int n) {
  return (v >> n) | (v << (64 - n));
}

inline uint64_t ShiftMix(uint64_t v) { return v ^ (v >> 47); }

inline uint64_t HashLen16(uint64_t u, uint64_t v, uint64_t mul) {
  uint64_t a = (u ^ v) * mul;
  a ^= (a >> 47);
  uint64_t b = (v ^ a) * mul;
  b ^= (b >> 47);
  b *= mul;
  return b;
}

inline __attribute__((always_inline)) uint64_t HashLen0to16(
    const uint8_t* s, size_t len) {
  if (len >= 8) {
    uint64_t mul = k2 + len * 2;
    uint64_t a = Fetch64(s) + k2;
    uint64_t b = Fetch64(s + len - 8);
    uint64_t c = Rotate(b, 37) * mul + a;
    uint64_t d = (Rotate(a, 25) + b) * mul;
    return HashLen16(c, d, mul);
  }
  if (len >= 4) {
    uint64_t mul = k2 + len * 2;
    uint64_t a = Fetch32(s);
    return HashLen16(len + (a << 3), Fetch32(s + len - 4), mul);
  }
  if (len > 0) {
    uint8_t a = s[0];
    uint8_t b = s[len >> 1];
    uint8_t c = s[len - 1];
    uint32_t y = static_cast<uint32_t>(a) + (static_cast<uint32_t>(b) << 8);
    uint32_t z = static_cast<uint32_t>(len) + (static_cast<uint32_t>(c) << 2);
    return ShiftMix(y * k2 ^ z * k0) * k2;
  }
  return k2;
}

uint64_t HashLen17to32(const uint8_t* s, size_t len) {
  uint64_t mul = k2 + len * 2;
  uint64_t a = Fetch64(s) * k1;
  uint64_t b = Fetch64(s + 8);
  uint64_t c = Fetch64(s + len - 8) * mul;
  uint64_t d = Fetch64(s + len - 16) * k2;
  return HashLen16(Rotate(a + b, 43) + Rotate(c, 30) + d,
                   a + Rotate(b + k2, 18) + c, mul);
}

uint64_t HashLen33to64(const uint8_t* s, size_t len) {
  uint64_t mul = k2 + len * 2;
  uint64_t a = Fetch64(s) * k2;
  uint64_t b = Fetch64(s + 8);
  uint64_t c = Fetch64(s + len - 8) * mul;
  uint64_t d = Fetch64(s + len - 16) * k2;
  uint64_t y = Rotate(a + b, 43) + Rotate(c, 30) + d;
  uint64_t z = HashLen16(y, a + Rotate(b + k2, 18) + c, mul);
  uint64_t e = Fetch64(s + 16) * mul;
  uint64_t f = Fetch64(s + 24);
  uint64_t g = (y + Fetch64(s + len - 32)) * mul;
  uint64_t h = (z + Fetch64(s + len - 24)) * mul;
  return HashLen16(Rotate(e + f, 43) + Rotate(g, 30) + h,
                   e + Rotate(f + a, 18) + g, mul);
}

struct U64Pair {
  uint64_t first, second;
};

U64Pair WeakHashLen32WithSeeds(const uint8_t* s, uint64_t a, uint64_t b) {
  uint64_t w = Fetch64(s);
  uint64_t x = Fetch64(s + 8);
  uint64_t y = Fetch64(s + 16);
  uint64_t z = Fetch64(s + 24);
  a += w;
  b = Rotate(b + a + z, 21);
  uint64_t c = a;
  a += x;
  a += y;
  b += Rotate(a, 44);
  return {a + z, b + c};
}

uint64_t Hash64Long(const uint8_t* s, size_t len);

// Hot-loop form: the <=16B case (the common piece/feature size) inlines at
// every call site; longer strings take one call into the cold body.  The
// split keeps the hash-bound prep loops free of a big-function call per
// element (Hash64 was too large for gcc to inline, costing ~2x on the
// fixed-string and split+hash kernels).
inline __attribute__((always_inline)) uint64_t Hash64(const uint8_t* s,
                                                      size_t len) {
  if (__builtin_expect(len <= 16, 1)) return HashLen0to16(s, len);
  return Hash64Long(s, len);
}

uint64_t Hash64Long(const uint8_t* s, size_t len) {
  if (len <= 32) return HashLen17to32(s, len);
  if (len <= 64) return HashLen33to64(s, len);

  const uint64_t seed = 81;
  uint64_t x = seed;
  uint64_t y = seed * k1 + 113;
  uint64_t z = ShiftMix(y * k2 + 113) * k2;
  U64Pair v = {0, 0};
  U64Pair w = {0, 0};
  x = x * k2 + Fetch64(s);

  const uint8_t* end = s + ((len - 1) / 64) * 64;
  const uint8_t* last64 = end + ((len - 1) & 63) - 63;
  do {
    x = Rotate(x + y + v.first + Fetch64(s + 8), 37) * k1;
    y = Rotate(y + v.second + Fetch64(s + 48), 42) * k1;
    x ^= w.second;
    y += v.first + Fetch64(s + 40);
    z = Rotate(z + w.first, 33) * k1;
    v = WeakHashLen32WithSeeds(s, v.second * k1, x + w.first);
    w = WeakHashLen32WithSeeds(s + 32, z + w.second, y + Fetch64(s + 16));
    uint64_t t = z;
    z = x;
    x = t;
    s += 64;
  } while (s != end);

  uint64_t mul = k1 + ((z & 0xff) << 1);
  s = last64;
  w.first += ((len - 1) & 63);
  v.first += w.first;
  w.first += v.first;
  x = Rotate(x + y + v.first + Fetch64(s + 8), 37) * mul;
  y = Rotate(y + v.second + Fetch64(s + 48), 42) * mul;
  x ^= w.second * 9;
  y += v.first * 9 + Fetch64(s + 40);
  z = Rotate(z + w.first, 33) * mul;
  v = WeakHashLen32WithSeeds(s, v.second * mul, x + w.first);
  w = WeakHashLen32WithSeeds(s + 32, z + w.second, y + Fetch64(s + 16));
  uint64_t t = z;
  z = x;
  x = t;
  return HashLen16(HashLen16(v.first, w.first, mul) + ShiftMix(y) * k0 + z,
                   HashLen16(v.second, w.second, mul) + x, mul);
}

// decimal formatting matching Python str(int) for int64
inline size_t FormatInt(int64_t value, uint8_t* buf) {
  uint8_t tmp[24];
  size_t n = 0;
  bool neg = value < 0;
  uint64_t u = neg ? (~static_cast<uint64_t>(value)) + 1ULL
                   : static_cast<uint64_t>(value);
  do {
    tmp[n++] = static_cast<uint8_t>('0' + (u % 10));
    u /= 10;
  } while (u);
  size_t len = 0;
  if (neg) buf[len++] = '-';
  while (n) buf[len++] = tmp[--n];
  return len;
}

inline int64_t MaxNativeThreads() {
  // RECOM_TPU_NATIVE_THREADS: cap for intra-call column threading
  // (0/1 = serial).  Read once.
  static int64_t cap = [] {
    const char* e = std::getenv("RECOM_TPU_NATIVE_THREADS");
    long v = e ? std::strtol(e, nullptr, 10) : 4;
    if (v < 1) v = 1;
    if (v > 16) v = 16;
    return static_cast<int64_t>(v);
  }();
  return cap;
}

template <typename Fn>
void ParallelColumns(int64_t n_cols, int64_t min_per_thread, Fn fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t want = n_cols / min_per_thread;
  int64_t n_threads = want < 1 ? 1 : want;
  if (n_threads > MaxNativeThreads()) n_threads = MaxNativeThreads();
  if (hw && n_threads > static_cast<int64_t>(hw)) n_threads = hw;
  if (n_threads <= 1) {
    for (int64_t c = 0; c < n_cols; ++c) fn(c);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int64_t t = 0; t < n_threads; ++t) {
    threads.emplace_back([=]() {
      for (int64_t c = t; c < n_cols; c += n_threads) fn(c);
    });
  }
  for (auto& th : threads) th.join();
}

inline size_t FixedLen(const uint8_t* p, int64_t width) {
  // numpy 'S<width>' entries are NUL-padded on the right
  int64_t n = width;
  while (n > 0 && p[n - 1] == 0) --n;
  return static_cast<size_t>(n);
}

// Reciprocal modulo: hash % num_buckets costs a ~30-cycle divq per element
// in the inner loops; with the divisor fixed per column a 64x64->128
// multiply + <=2 corrections gives the same result in ~6 cycles.
// q = floor(M*h / 2^64) with M = floor((2^64-1)/d) satisfies
// h/d - 2 <= q <= h/d, so the while loop runs at most twice.
struct FastMod {
  uint64_t m, d;
  explicit FastMod(uint64_t div) : m(~0ULL / div), d(div) {}
  inline uint64_t operator()(uint64_t h) const {
    uint64_t q = static_cast<uint64_t>(
        (static_cast<unsigned __int128>(m) * h) >> 64);
    uint64_t r = h - q * d;
    while (r >= d) r -= d;
    return r;
  }
};

#ifdef RECOM_AVX512
// FixedLen via 64-byte reverse probes: rows are typically half NUL pad,
// so the first chunk from the end decides.
inline size_t FixedLenSimd(const uint8_t* p, int64_t width) {
  int64_t off = width;
  while (off > 0) {
    const int64_t chunk = off >= 64 ? 64 : off;
    off -= chunk;
    const __mmask64 loadm =
        chunk == 64 ? ~0ULL : ((1ULL << chunk) - 1);
    const __m512i v = _mm512_maskz_loadu_epi8(loadm, p + off);
    const __mmask64 nz = _mm512_test_epi8_mask(v, v);
    if (nz)
      return static_cast<size_t>(off + 64 - __builtin_clzll(nz));
  }
  return 0;
}
#endif

#if defined(RECOM_AVX512) && defined(__AVX512DQ__) && defined(__AVX512CD__)
#define RECOM_AVX512_H8 1
// 8-lane FarmHash Fingerprint64 for pieces of <= 16 bytes — the feature /
// list-piece sizes that dominate host prep (model E: 8-char tokens).  The
// scalar short-string hash is a ~25-cycle serial dependency chain per
// element; with vpmullq (AVX512DQ) the same math runs 8 lanes wide in
// ~35 vector ops, measured ~4x on the fixed-string kernel.  Bit-exact vs
// the scalar path by construction (same adds/rotates/multiplies mod 2^64,
// verified element-for-element by the width 1..64 x batch 1..19 sweep in
// tests/test_native.py::test_hash_fixed_multi_out_simd_sweep, which
// straddles the 8-lane/scalar tail boundary with empty and full-width
// rows).

// qlo: first 8 bytes of each piece.  Lanes with len < 8 MUST have bytes
//      >= len zeroed (numpy 'S' pad provides this for fixed columns; the
//      split path masks explicitly).  Lanes with len >= 8 must be the
//      UNMASKED first 8 bytes.
// qhi: bytes [len-8, len) for lanes with len >= 8 (ignored below 8).
// len: per-lane length, 0..16.
inline __m512i Hash8Short(__m512i qlo, __m512i qhi, __m512i len) {
  const __m512i vk0 = _mm512_set1_epi64(static_cast<int64_t>(k0));
  const __m512i vk2 = _mm512_set1_epi64(static_cast<int64_t>(k2));
  const __m512i v1 = _mm512_set1_epi64(1);
  const __m512i v4 = _mm512_set1_epi64(4);
  const __m512i v8 = _mm512_set1_epi64(8);
  const __m512i m32 = _mm512_set1_epi64(0xffffffffLL);
  const __m512i mul = _mm512_add_epi64(vk2, _mm512_add_epi64(len, len));
  const __mmask8 ge8 = _mm512_cmp_epu64_mask(len, v8, _MM_CMPINT_NLT);
  const __mmask8 ge4 = _mm512_cmp_epu64_mask(len, v4, _MM_CMPINT_NLT);
  const __mmask8 ge1 = _mm512_cmp_epu64_mask(len, v1, _MM_CMPINT_NLT);
  // len >= 8:  a = Fetch64(s) + k2; b = Fetch64(s + len - 8)
  //            u = Rotate(b,37)*mul + a;  v = (Rotate(a,25) + b) * mul
  const __m512i a8 = _mm512_add_epi64(qlo, vk2);
  const __m512i u8 = _mm512_add_epi64(
      _mm512_mullo_epi64(_mm512_ror_epi64(qhi, 37), mul), a8);
  const __m512i v8p = _mm512_mullo_epi64(
      _mm512_add_epi64(_mm512_ror_epi64(a8, 25), qhi), mul);
  // 4 <= len < 8:  u = len + (Fetch32(s) << 3); v = Fetch32(s + len - 4)
  // (pad bytes >= len are zero, so both 32-bit windows come from qlo)
  const __m512i a4 = _mm512_and_si512(qlo, m32);
  const __m512i sh4 =
      _mm512_slli_epi64(_mm512_sub_epi64(len, v4), 3);
  const __m512i b4 = _mm512_and_si512(_mm512_srlv_epi64(qlo, sh4), m32);
  const __m512i u4 = _mm512_add_epi64(len, _mm512_slli_epi64(a4, 3));
  // select HashLen16 inputs by class, then one shared HashLen16(u, v, mul)
  const __m512i u = _mm512_mask_mov_epi64(u4, ge8, u8);
  const __m512i v = _mm512_mask_mov_epi64(b4, ge8, v8p);
  __m512i x = _mm512_mullo_epi64(_mm512_xor_si512(u, v), mul);
  x = _mm512_xor_si512(x, _mm512_srli_epi64(x, 47));
  __m512i y = _mm512_mullo_epi64(_mm512_xor_si512(v, x), mul);
  y = _mm512_xor_si512(y, _mm512_srli_epi64(y, 47));
  y = _mm512_mullo_epi64(y, mul);
  // 1 <= len < 4:  ShiftMix(y1*k2 ^ z1*k0) * k2 with
  //   y1 = s[0] + (s[len>>1] << 8);  z1 = len + (s[len-1] << 2)
  const __m512i mbyte = _mm512_set1_epi64(0xff);
  const __m512i sa = _mm512_and_si512(qlo, mbyte);
  const __m512i shb = _mm512_slli_epi64(_mm512_srli_epi64(len, 1), 3);
  const __m512i sb =
      _mm512_and_si512(_mm512_srlv_epi64(qlo, shb), mbyte);
  const __m512i shc =
      _mm512_slli_epi64(_mm512_sub_epi64(len, v1), 3);
  const __m512i sc =
      _mm512_and_si512(_mm512_srlv_epi64(qlo, shc), mbyte);
  const __m512i y1 = _mm512_add_epi64(sa, _mm512_slli_epi64(sb, 8));
  const __m512i z1 = _mm512_add_epi64(len, _mm512_slli_epi64(sc, 2));
  __m512i h13 = _mm512_xor_si512(_mm512_mullo_epi64(y1, vk2),
                                 _mm512_mullo_epi64(z1, vk0));
  h13 = _mm512_xor_si512(h13, _mm512_srli_epi64(h13, 47));
  h13 = _mm512_mullo_epi64(h13, vk2);
  // blend: len >= 4 -> HashLen16 result; 1..3 -> h13; 0 -> k2
  __m512i h = _mm512_mask_mov_epi64(h13, ge4, y);
  return _mm512_mask_mov_epi64(vk2, ge1, h);
}

// unsigned 64x64 -> high 64 via 32-bit partial products (no vpmulhuq
// exists); standard 4-product schoolbook with exact carries.
inline __m512i MulHi64(__m512i a, __m512i b) {
  const __m512i m32 = _mm512_set1_epi64(0xffffffffLL);
  const __m512i a1 = _mm512_srli_epi64(a, 32);
  const __m512i b1 = _mm512_srli_epi64(b, 32);
  const __m512i t00 = _mm512_mul_epu32(a, b);
  const __m512i t01 = _mm512_mul_epu32(a, b1);
  const __m512i t10 = _mm512_mul_epu32(a1, b);
  const __m512i t11 = _mm512_mul_epu32(a1, b1);
  // mid = carry(t00) + lo(t01) + lo(t10): <= 3*(2^32-1), fits 64 exactly
  const __m512i mid = _mm512_add_epi64(
      _mm512_add_epi64(_mm512_srli_epi64(t00, 32),
                       _mm512_and_si512(t01, m32)),
      _mm512_and_si512(t10, m32));
  return _mm512_add_epi64(
      _mm512_add_epi64(t11, _mm512_srli_epi64(mid, 32)),
      _mm512_add_epi64(_mm512_srli_epi64(t01, 32),
                       _mm512_srli_epi64(t10, 32)));
}

// 8-lane FastMod (same reciprocal + <=2 corrections as the scalar struct).
inline __m512i Mod8(__m512i h, __m512i vm, __m512i vd) {
  const __m512i q = MulHi64(h, vm);
  __m512i r = _mm512_sub_epi64(h, _mm512_mullo_epi64(q, vd));
  __mmask8 ge = _mm512_cmp_epu64_mask(r, vd, _MM_CMPINT_NLT);
  r = _mm512_mask_sub_epi64(r, ge, r, vd);
  ge = _mm512_cmp_epu64_mask(r, vd, _MM_CMPINT_NLT);
  return _mm512_mask_sub_epi64(r, ge, r, vd);
}

// store 8 id lanes (values < 2^31) narrowed to the output element type
template <typename T>
inline void StoreIds8(__m512i r, T* o) {
  if (sizeof(T) == 1) {
    _mm_storel_epi64(reinterpret_cast<__m128i*>(o),
                     _mm512_cvtepi64_epi8(r));
  } else if (sizeof(T) == 2) {
    _mm_storeu_si128(reinterpret_cast<__m128i*>(o),
                     _mm512_cvtepi64_epi16(r));
  } else {
    _mm256_storeu_si256(reinterpret_cast<__m256i*>(o),
                        _mm512_cvtepi64_epi32(r));
  }
}
#endif  // RECOM_AVX512_H8

}  // namespace

extern "C" {

uint64_t rt_farmhash64(const uint8_t* data, int64_t len) {
  return Hash64(data, static_cast<size_t>(len));
}

// Hash n variable-length byte strings (concatenated buffer + n+1 offsets).
void rt_hash_bytes_batch(const uint8_t* buf, const int64_t* offsets,
                         int64_t n, int64_t num_buckets, int64_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    uint64_t h = Hash64(buf + offsets[i],
                        static_cast<size_t>(offsets[i + 1] - offsets[i]));
    out[i] = static_cast<int64_t>(h % static_cast<uint64_t>(num_buckets));
  }
}

// Hash n fixed-width (numpy 'S<width>', NUL-padded) byte strings.
void rt_hash_fixed_batch(const uint8_t* buf, int64_t width, int64_t n,
                         int64_t num_buckets, int64_t* out) {
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* p = buf + i * width;
    uint64_t h = Hash64(p, FixedLen(p, width));
    out[i] = static_cast<int64_t>(h % static_cast<uint64_t>(num_buckets));
  }
}

// Hash n int64 values via their decimal-string form (TF feature_column
// hash_bucket semantics for integer dtypes).
void rt_hash_int_batch(const int64_t* vals, int64_t n, int64_t num_buckets,
                       int64_t* out) {
  uint8_t buf[24];
  for (int64_t i = 0; i < n; ++i) {
    size_t len = FormatInt(vals[i], buf);
    uint64_t h = Hash64(buf, len);
    out[i] = static_cast<int64_t>(h % static_cast<uint64_t>(num_buckets));
  }
}

// Max number of delimiter-separated pieces over n fixed-width rows
// (empty rows count 0 pieces; empty strings between delimiters DO count,
// matching tf.strings.split semantics).
int64_t rt_split_count_max(const uint8_t* buf, int64_t width, int64_t n,
                           uint8_t delim) {
  int64_t maxp = 0;
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* p = buf + i * width;
    size_t len = FixedLen(p, width);
    if (len == 0) continue;
    int64_t pieces = 1;
    for (size_t j = 0; j < len; ++j)
      if (p[j] == delim) ++pieces;
    if (pieces > maxp) maxp = pieces;
  }
  return maxp;
}

// Split each fixed-width row by `delim`, hash every piece, write ids into
// out[i*rowlen .. ] padded with -1.  Pieces beyond rowlen are dropped
// (caller sizes rowlen via rt_split_count_max, so this only triggers under
// explicit truncation).  Returns the max piece count seen.
int64_t rt_split_hash_pad(const uint8_t* buf, int64_t width, int64_t n,
                          uint8_t delim, int64_t num_buckets, int64_t rowlen,
                          int32_t* out) {
  int64_t maxp = 0;
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* p = buf + i * width;
    size_t len = FixedLen(p, width);
    int32_t* row = out + i * rowlen;
    int64_t cnt = 0;
    if (len > 0) {
      size_t start = 0;
      for (size_t j = 0; j <= len; ++j) {
        if (j == len || p[j] == delim) {
          if (cnt < rowlen) {
            uint64_t h = Hash64(p + start, j - start);
            row[cnt] = static_cast<int32_t>(
                h % static_cast<uint64_t>(num_buckets));
          }
          ++cnt;
          start = j + 1;
        }
      }
    }
    if (cnt > maxp) maxp = cnt;
    for (int64_t j = cnt < rowlen ? cnt : rowlen; j < rowlen; ++j)
      row[j] = -1;
  }
  return maxp;
}

// ---------------------------------------------------------------------
// Multi-column entry points: one call per column GROUP instead of one per
// column.  At serving batch sizes the per-column C++ work is ~10us, so the
// Python/ctypes crossing dominates a per-column API; these take pointer
// arrays and loop columns natively.  Column loops parallelize across a
// few std::threads once the group is big enough to amortize spawn cost
// (ctypes released the GIL for the call, so these threads own the cores).

// vals: n_cols pointers, each to [batch] int64.  out: [n_cols, batch] i32.
void rt_hash_int_multi(const int64_t** vals, const int64_t* buckets,
                       int64_t n_cols, int64_t batch, int32_t* out) {
  ParallelColumns(n_cols, 8, [=](int64_t c) {
    uint8_t buf[24];
    const int64_t* v = vals[c];
    const uint64_t nb = static_cast<uint64_t>(buckets[c]);
    int32_t* o = out + c * batch;
    for (int64_t i = 0; i < batch; ++i) {
      size_t len = FormatInt(v[i], buf);
      o[i] = static_cast<int32_t>(Hash64(buf, len) % nb);
    }
  });
}

// bufs: n_cols pointers to fixed-width (numpy 'S<w>') buffers; widths[c]
// per column.  out: [n_cols, batch] int32.
void rt_hash_fixed_multi(const uint8_t** bufs, const int64_t* widths,
                         const int64_t* buckets, int64_t n_cols,
                         int64_t batch, int32_t* out) {
  ParallelColumns(n_cols, 8, [=](int64_t c) {
    const uint8_t* buf = bufs[c];
    const int64_t w = widths[c];
    const uint64_t nb = static_cast<uint64_t>(buckets[c]);
    int32_t* o = out + c * batch;
    for (int64_t i = 0; i < batch; ++i) {
      const uint8_t* p = buf + i * w;
      o[i] = static_cast<int32_t>(Hash64(p, FixedLen(p, w)) % nb);
    }
  });
}

int64_t rt_split_scan_multi(const uint8_t** bufs, const int64_t* widths,
                            const uint8_t* delims, int64_t n_cols,
                            int64_t batch, int64_t* out_max_len);

// Max piece count over several delimited fixed-width columns in one pass.
int64_t rt_split_count_multi(const uint8_t** bufs, const int64_t* widths,
                             const uint8_t* delims, int64_t n_cols,
                             int64_t batch) {
#ifdef RECOM_AVX512
  // the SIMD scan (popcount per 64B compare mask) counts pieces ~4x
  // faster than the scalar per-byte loop; the max piece LENGTH it also
  // tracks is simply ignored here
  int64_t ml = 0;
  return rt_split_scan_multi(bufs, widths, delims, n_cols, batch, &ml);
#else
  std::vector<int64_t> maxs(n_cols, 0);
  ParallelColumns(n_cols, 4, [&, bufs, widths, delims](int64_t c) {
    maxs[c] = rt_split_count_max(bufs[c], widths[c], batch, delims[c]);
  });
  int64_t maxp = 0;
  for (int64_t m : maxs)
    if (m > maxp) maxp = m;
  return maxp;
#endif
}

// One-pass scan for DEVICE-hash staging (runtime/wire.py device_hash):
// per delimited column group, record both the max piece COUNT (sizes the
// rowlen bucket) and the max piece LENGTH (gates the device kernel's
// 64-byte straight-line FarmHash — longer pieces fall back to host
// hashing for the request).  Returns max pieces; *out_max_len gets the
// max piece byte length.
int64_t rt_split_scan_multi(const uint8_t** bufs, const int64_t* widths,
                            const uint8_t* delims, int64_t n_cols,
                            int64_t batch, int64_t* out_max_len) {
  std::vector<int64_t> maxp(n_cols, 0), maxl(n_cols, 0);
  ParallelColumns(n_cols, 4, [&, bufs, widths, delims](int64_t c) {
    const uint8_t* buf = bufs[c];
    const int64_t width = widths[c];
    const uint8_t delim = delims[c];
    int64_t mp = 0, ml = 0;
#ifdef RECOM_AVX512
    // ONE forward masked pass per row over the full 'S' width (no
    // separate reverse length probe — the row length falls out of the
    // nonzero mask, and NUL pad bytes can never BE the delimiter, so
    // delimiter counting needs no length gate).  Piece count = delimiter
    // popcount + 1; the max piece LENGTH is tracked O(1) per chunk by
    // carrying the delimiter-free run across chunk boundaries (run ending
    // at a chunk's first delimiter = carry + ctz; restart after its last
    // = chunk-1-msb), with the TAIL piece computed exactly from the last
    // nonzero and last delimiter positions (the carry would otherwise
    // include the NUL pad).  Gaps strictly INSIDE one chunk are <= 62
    // bytes and are not measured — ml is therefore EXACT above 62 and may
    // underreport below, which is gate-safe: the only consumer compares
    // ml against the 64-byte device-hash piece cap (>= 62), so
    // "reported <= cap" still implies "true max <= cap".  This replaced a
    // per-delimiter bit-iteration loop + reverse probe that together cost
    // ~0.4ms of the dev-hash arm's rowlen stage at model E batch 512.
    const __m512i vd = _mm512_set1_epi8(static_cast<char>(delim));
    for (int64_t i = 0; i < batch; ++i) {
      const uint8_t* p = buf + i * width;
      int64_t delims = 0;
      int64_t lastnz = -1, last_delim = -1;
      int64_t run = 0;                   // current delimiter-free run
      for (int64_t base = 0; base < width; base += 64) {
        const int64_t chunk = width - base >= 64 ? 64 : width - base;
        const __mmask64 loadm =
            chunk == 64 ? ~0ULL
                        : ((1ULL << static_cast<unsigned>(chunk)) - 1);
        const __m512i v = _mm512_maskz_loadu_epi8(loadm, p + base);
        const uint64_t nz = _mm512_test_epi8_mask(v, v);
        if (nz) lastnz = base + 63 - __builtin_clzll(nz);
        const uint64_t m = _mm512_cmpeq_epi8_mask(v, vd) & loadm;
        if (m == 0) {
          run += chunk;
          continue;
        }
        delims += __builtin_popcountll(m);
        const int64_t head = run + __builtin_ctzll(m);
        if (head > ml) ml = head;
        const int64_t msb = base + 63 - __builtin_clzll(m);
        run = base + chunk - 1 - msb;
        last_delim = msb;
      }
      if (lastnz < 0) continue;          // empty row: 0 pieces
      const int64_t tail = lastnz - last_delim;  // last piece length
      if (tail > ml) ml = tail;
      const int64_t pieces = delims + 1;
      if (pieces > mp) mp = pieces;
    }
#else
    for (int64_t i = 0; i < batch; ++i) {
      const uint8_t* p = buf + i * width;
      size_t len = FixedLen(p, width);
      if (len == 0) continue;
      int64_t pieces = 1;
      size_t start = 0;
      for (size_t j = 0; j <= len; ++j) {
        if (j == len || p[j] == delim) {
          const int64_t pl = static_cast<int64_t>(j - start);
          if (pl > ml) ml = pl;
          if (j < len) ++pieces;
          start = j + 1;
        }
      }
      if (pieces > mp) mp = pieces;
    }
#endif
    maxp[c] = mp;
    maxl[c] = ml;
  });
  int64_t p = 0, l = 0;
  for (int64_t c = 0; c < n_cols; ++c) {
    if (maxp[c] > p) p = maxp[c];
    if (maxl[c] > l) l = maxl[c];
  }
  *out_max_len = l;
  return p;
}

// Split+hash for several columns; out: [n_cols, batch, rowlen] int32,
// -1 padded.  Returns max piece count seen (diagnostic).
int64_t rt_split_hash_multi(const uint8_t** bufs, const int64_t* widths,
                            const uint8_t* delims, const int64_t* buckets,
                            int64_t n_cols, int64_t batch, int64_t rowlen,
                            int32_t* out) {
  // split+hash is ~5x the work of a plain hash column: thread earlier
  std::vector<int64_t> maxs(n_cols, 0);
  ParallelColumns(n_cols, 4, [&, bufs, widths, delims, buckets](int64_t c) {
    maxs[c] = rt_split_hash_pad(bufs[c], widths[c], batch, delims[c],
                                buckets[c], rowlen,
                                out + c * batch * rowlen);
  });
  int64_t maxp = 0;
  for (int64_t m : maxs)
    if (m > maxp) maxp = m;
  return maxp;
}

// ---------------------------------------------------------------------
// Direct-write ("wire") variants: each column writes into its own
// destination pointer at a caller-chosen element width (1/2/4 bytes).
// These are the single-blob staging path (the reference's ConcatInputs,
// concat_inputs_ops.cc:42-77): host prep packs every column's ids into one
// contiguous byte blob so exactly ONE array crosses to the device per step.

namespace {

inline void WriteElem(uint8_t* dst, int64_t elem, int64_t i, int32_t v) {
  switch (elem) {
    case 1:
      reinterpret_cast<int8_t*>(dst)[i] = static_cast<int8_t>(v);
      break;
    case 2:
      reinterpret_cast<int16_t*>(dst)[i] = static_cast<int16_t>(v);
      break;
    default:
      reinterpret_cast<int32_t*>(dst)[i] = v;
  }
}

}  // namespace

// TF Bucketize per column group, with optional fused post-bucketize LUT.
//
// EXACT float64 upper_bound semantics at float32 speed: the Python plan
// builder converts each f64 boundary b to ceil32(b) — the smallest f32
// whose f64 value is >= b.  Because inputs x are f32 (exact in f64),
//   b <= (double)x  <=>  ceil32(b) <= x,
// so every comparison below runs in f32 yet reproduces the oracle's
// (oracle/reference.py Bucketize) f64 upper_bound bit-for-bit.
//
// xs: n_cols pointers to float32[batch]; bounds32: [n_cols, kmax] ceil32
// boundaries padded +inf, kmax a power of two; counts[c] = true boundary
// count; inv_ds[c]/b0 = slope/intercept of the affine index guess;
// affine[c] = 1 when the plan builder verified the guess is within a few
// steps of exact for EVERY input (near-uniform boundaries) — then the
// search is O(1): guess + local fix-up.  affine[c] = 0 falls back to a
// branchless (cmov) binary search over the +inf-padded power-of-two array.
// luts: n_cols pointers to int32[counts[c]+1] or null (identity).
// Column c writes to out + c*stride*elem (stride in ELEMENTS).
// NaN input -> count (matches np.searchsorted/oracle).
extern "C++" {
namespace {

// per-column bodies specialized on the output element type and the LUT
// presence so the inner loop carries no per-element dispatch at all
template <typename T, bool kLut>
void BucketizeColAffine(const float* x, const float* b, int32_t k, float b0,
                        float inv_d, const int32_t* lut, int64_t batch,
                        T* o) {
  const float fk = static_cast<float>(k);
  for (int64_t i = 0; i < batch; ++i) {
    const float v = x[i];
    int32_t id;
    if (v != v) {
      id = k;  // NaN -> count
    } else {
      int32_t e;
      if (!(v >= b0)) {
        e = 0;
      } else {
        float g = (v - b0) * inv_d + 1.0f;
        e = g >= fk ? k : static_cast<int32_t>(g);
      }
      while (e > 0 && b[e - 1] > v) --e;
      while (e < k && b[e] <= v) ++e;
      id = e;
    }
    if (kLut) id = lut[id];
    o[i] = static_cast<T>(id);
  }
}

// branchless variant for columns whose affine guess is within ONE step of
// exact at every boundary (flag 2, near-uniform boundaries): the two
// conditional fix-ups become flag adds, no unpredictable branches.
// Safety: when v >= b[0], the guess e is always >= 1, and b has at least
// one +inf pad past k, so b[e] and b[e-1] stay in bounds.
template <typename T, bool kLut>
void BucketizeColAffine1(const float* x, const float* b, int32_t k,
                         float b0, float inv_d, const int32_t* lut,
                         int64_t batch, T* o) {
  const float fk = static_cast<float>(k);
  for (int64_t i = 0; i < batch; ++i) {
    const float v = x[i];
    int32_t id;
    if (v != v) {
      id = k;  // NaN -> count
    } else if (!(v >= b0)) {
      id = 0;
    } else {
      float g = (v - b0) * inv_d + 1.0f;
      int32_t e = g >= fk ? k : static_cast<int32_t>(g);
      // guard e < k: for v == +inf, b[e]=b[k]=+inf pad and +inf <= +inf
      // would bump e past k (and read lut[k+1]); & evaluates both sides
      // branchlessly and b[k] is always readable (kmax > k)
      e += (e < k) & (b[e] <= v);
      e -= b[e - 1] > v;   // e >= 1 here
      id = e;
    }
    if (kLut) id = lut[id];
    o[i] = static_cast<T>(id);
  }
}

#ifdef RECOM_AVX512
// Small-k flag-2 kernel: when the whole padded boundary row fits one zmm
// (k < 16, kmax <= 16), both fix-up probes become vpermps lane selects
// (~3 cycles) instead of vpgatherdps (~20+) — measured ~2x on model E's
// 880 x 10-boundary columns.  The masked load fault-suppresses lanes
// past kmax (AVX-512 guarantee) and pads them +inf; lanes >= kmax are
// never selected (e <= k < kmax) so their content is immaterial anyway.
template <typename T, bool kLut>
void BucketizeColAffine1SimdSmall(const float* x, const float* b, int32_t k,
                                  int64_t kmax, float b0, float inv_d,
                                  const int32_t* lut, int64_t batch, T* o) {
  const __m512 vb0 = _mm512_set1_ps(b0);
  const __m512 vinv = _mm512_set1_ps(inv_d);
  const __m512 vone = _mm512_set1_ps(1.0f);
  const __m512 vfk = _mm512_set1_ps(static_cast<float>(k));
  const __m512i vk = _mm512_set1_epi32(k);
  const __m512i vzero = _mm512_setzero_si512();
  const __m512i vone_i = _mm512_set1_epi32(1);
  // the row is +inf-padded out to kmax: with kmax >= 16 the first 16
  // entries are plainly loadable; shorter rows use a fault-suppressed
  // masked load padded +inf
  const __m512 vinf = _mm512_set1_ps(std::numeric_limits<float>::infinity());
  const __m512 vb =
      kmax >= 16
          ? _mm512_loadu_ps(b)
          : _mm512_mask_loadu_ps(
                vinf,
                static_cast<__mmask16>(
                    (1u << static_cast<unsigned>(kmax)) - 1u),
                b);
  int64_t i = 0;
  for (; i + 16 <= batch; i += 16) {
    const __m512 v = _mm512_loadu_ps(x + i);
    const __mmask16 nan_m = _mm512_cmp_ps_mask(v, v, _CMP_UNORD_Q);
    const __mmask16 below_m = _mm512_cmp_ps_mask(v, vb0, _CMP_LT_OQ);
    // UNFUSED mul-then-add, matching the plan-time guess validation
    // (wire.py computes g in numpy with two roundings; a fused FMA can
    // land one ulp across an integer boundary and push the guess outside
    // the proven error bound).  -ffp-contract=off guards the scalar
    // paths; explicit intrinsics must not reintroduce the fusion.
    const __m512 g =
        _mm512_add_ps(_mm512_mul_ps(_mm512_sub_ps(v, vb0), vinv), vone);
    const __mmask16 hi_m = _mm512_cmp_ps_mask(g, vfk, _CMP_GE_OQ);
    __m512i e = _mm512_cvttps_epi32(g);
    e = _mm512_mask_mov_epi32(e, hi_m, vk);
    e = _mm512_min_epi32(_mm512_max_epi32(e, vone_i), vk);
    // fix-up 1: e += (e < k) & (b[e] <= v)
    const __m512 be = _mm512_permutexvar_ps(e, vb);
    const __mmask16 lt_k = _mm512_cmplt_epi32_mask(e, vk);
    const __mmask16 inc =
        _mm512_mask_cmp_ps_mask(lt_k, be, v, _CMP_LE_OQ);
    e = _mm512_mask_add_epi32(e, inc, e, vone_i);
    // fix-up 2: e -= (b[e-1] > v)   (e >= 1 here)
    const __m512i em1 = _mm512_sub_epi32(e, vone_i);
    const __m512 bem1 = _mm512_permutexvar_ps(em1, vb);
    const __mmask16 dec = _mm512_cmp_ps_mask(bem1, v, _CMP_GT_OQ);
    e = _mm512_mask_sub_epi32(e, dec, e, vone_i);
    e = _mm512_mask_mov_epi32(e, below_m, vzero);
    e = _mm512_mask_mov_epi32(e, nan_m, vk);
    if (kLut) e = _mm512_i32gather_epi32(e, lut, 4);
    if (sizeof(T) == 1) {
      _mm_storeu_si128(reinterpret_cast<__m128i*>(o + i),
                       _mm512_cvtepi32_epi8(e));
    } else if (sizeof(T) == 2) {
      _mm256_storeu_si256(reinterpret_cast<__m256i*>(o + i),
                          _mm512_cvtepi32_epi16(e));
    } else {
      _mm512_storeu_si512(reinterpret_cast<void*>(o + i), e);
    }
  }
  if (i < batch)
    BucketizeColAffine1<T, kLut>(x + i, b, k, b0, inv_d, lut, batch - i,
                                 o + i);
}

// Flag-3 kernel: boundaries proven EXACTLY b0 + i*step in float32 (plan
// detection, runtime/wire.py), so both fix-up probes compute the
// boundary value with one FMA each — NO memory probes at all.  This is
// the model-E shape (uniform integer grids, 100 boundaries/column):
// measured ~2x over the gather kernel at 880 columns x batch 512.
template <typename T, bool kLut>
void BucketizeColAffineExactSimd(const float* x, const float* b, int32_t k,
                                 float b0, float inv_d, float step,
                                 const int32_t* lut, int64_t batch, T* o) {
  const __m512 vb0 = _mm512_set1_ps(b0);
  const __m512 vinv = _mm512_set1_ps(inv_d);
  const __m512 vstep = _mm512_set1_ps(step);
  const __m512 vone = _mm512_set1_ps(1.0f);
  const __m512 vfk = _mm512_set1_ps(static_cast<float>(k));
  const __m512i vk = _mm512_set1_epi32(k);
  const __m512i vzero = _mm512_setzero_si512();
  const __m512i vone_i = _mm512_set1_epi32(1);
  int64_t i = 0;
  for (; i + 16 <= batch; i += 16) {
    const __m512 v = _mm512_loadu_ps(x + i);
    const __mmask16 nan_m = _mm512_cmp_ps_mask(v, v, _CMP_UNORD_Q);
    const __mmask16 below_m = _mm512_cmp_ps_mask(v, vb0, _CMP_LT_OQ);
    // UNFUSED mul-then-add, matching the plan-time guess validation
    // (wire.py computes g in numpy with two roundings; a fused FMA can
    // land one ulp across an integer boundary and push the guess outside
    // the proven error bound).  -ffp-contract=off guards the scalar
    // paths; explicit intrinsics must not reintroduce the fusion.
    const __m512 g =
        _mm512_add_ps(_mm512_mul_ps(_mm512_sub_ps(v, vb0), vinv), vone);
    const __mmask16 hi_m = _mm512_cmp_ps_mask(g, vfk, _CMP_GE_OQ);
    __m512i e = _mm512_cvttps_epi32(g);
    e = _mm512_mask_mov_epi32(e, hi_m, vk);
    e = _mm512_min_epi32(_mm512_max_epi32(e, vone_i), vk);
    // fix-up 1: e += (e < k) & (b[e] <= v), with b[e] = fma(e, step, b0)
    const __m512 be =
        _mm512_fmadd_ps(_mm512_cvtepi32_ps(e), vstep, vb0);
    const __mmask16 lt_k = _mm512_cmplt_epi32_mask(e, vk);
    const __mmask16 inc =
        _mm512_mask_cmp_ps_mask(lt_k, be, v, _CMP_LE_OQ);
    e = _mm512_mask_add_epi32(e, inc, e, vone_i);
    // fix-up 2: e -= (b[e-1] > v)
    const __m512i em1 = _mm512_sub_epi32(e, vone_i);
    const __m512 bem1 =
        _mm512_fmadd_ps(_mm512_cvtepi32_ps(em1), vstep, vb0);
    const __mmask16 dec = _mm512_cmp_ps_mask(bem1, v, _CMP_GT_OQ);
    e = _mm512_mask_sub_epi32(e, dec, e, vone_i);
    e = _mm512_mask_mov_epi32(e, below_m, vzero);
    e = _mm512_mask_mov_epi32(e, nan_m, vk);
    if (kLut) e = _mm512_i32gather_epi32(e, lut, 4);
    if (sizeof(T) == 1) {
      _mm_storeu_si128(reinterpret_cast<__m128i*>(o + i),
                       _mm512_cvtepi32_epi8(e));
    } else if (sizeof(T) == 2) {
      _mm256_storeu_si256(reinterpret_cast<__m256i*>(o + i),
                          _mm512_cvtepi32_epi16(e));
    } else {
      _mm512_storeu_si512(reinterpret_cast<void*>(o + i), e);
    }
  }
  if (i < batch)
    BucketizeColAffine1<T, kLut>(x + i, b, k, b0, inv_d, lut, batch - i,
                                 o + i);
}

// 16-lane AVX-512 flag-2 kernel: same math as BucketizeColAffine1 (affine
// guess exact to +-1 at every probe), lane masks instead of branches, two
// vgatherdps fix-up probes.  Semantics identical to the scalar version —
// cross-checked element-for-element in tests/test_native.py.
template <typename T, bool kLut>
void BucketizeColAffine1Simd(const float* x, const float* b, int32_t k,
                             float b0, float inv_d, const int32_t* lut,
                             int64_t batch, T* o) {
  const __m512 vb0 = _mm512_set1_ps(b0);
  const __m512 vinv = _mm512_set1_ps(inv_d);
  const __m512 vone = _mm512_set1_ps(1.0f);
  const __m512 vfk = _mm512_set1_ps(static_cast<float>(k));
  const __m512i vk = _mm512_set1_epi32(k);
  const __m512i vzero = _mm512_setzero_si512();
  const __m512i vone_i = _mm512_set1_epi32(1);
  int64_t i = 0;
  for (; i + 16 <= batch; i += 16) {
    const __m512 v = _mm512_loadu_ps(x + i);
    const __mmask16 nan_m = _mm512_cmp_ps_mask(v, v, _CMP_UNORD_Q);
    const __mmask16 below_m = _mm512_cmp_ps_mask(v, vb0, _CMP_LT_OQ);
    // UNFUSED mul-then-add, matching the plan-time guess validation
    // (wire.py computes g in numpy with two roundings; a fused FMA can
    // land one ulp across an integer boundary and push the guess outside
    // the proven error bound).  -ffp-contract=off guards the scalar
    // paths; explicit intrinsics must not reintroduce the fusion.
    const __m512 g =
        _mm512_add_ps(_mm512_mul_ps(_mm512_sub_ps(v, vb0), vinv), vone);
    const __mmask16 hi_m = _mm512_cmp_ps_mask(g, vfk, _CMP_GE_OQ);
    __m512i e = _mm512_cvttps_epi32(g);
    e = _mm512_mask_mov_epi32(e, hi_m, vk);
    // below/NaN lanes carry garbage e (overwritten at the end); clamp
    // into [1, k] so the two gather probes stay in bounds (b has a +inf
    // pad past k, kmax > k guaranteed by the caller)
    e = _mm512_min_epi32(_mm512_max_epi32(e, vone_i), vk);
    // fix-up 1: e += (e < k) & (b[e] <= v)
    const __m512 be = _mm512_i32gather_ps(e, b, 4);
    const __mmask16 lt_k = _mm512_cmplt_epi32_mask(e, vk);
    const __mmask16 inc =
        _mm512_mask_cmp_ps_mask(lt_k, be, v, _CMP_LE_OQ);
    e = _mm512_mask_add_epi32(e, inc, e, vone_i);
    // fix-up 2: e -= (b[e-1] > v)   (e >= 1 here)
    const __m512i em1 = _mm512_sub_epi32(e, vone_i);
    const __m512 bem1 = _mm512_i32gather_ps(em1, b, 4);
    const __mmask16 dec = _mm512_cmp_ps_mask(bem1, v, _CMP_GT_OQ);
    e = _mm512_mask_sub_epi32(e, dec, e, vone_i);
    e = _mm512_mask_mov_epi32(e, below_m, vzero);
    e = _mm512_mask_mov_epi32(e, nan_m, vk);
    if (kLut) e = _mm512_i32gather_epi32(e, lut, 4);
    if (sizeof(T) == 1) {
      _mm_storeu_si128(reinterpret_cast<__m128i*>(o + i),
                       _mm512_cvtepi32_epi8(e));
    } else if (sizeof(T) == 2) {
      _mm256_storeu_si256(reinterpret_cast<__m256i*>(o + i),
                          _mm512_cvtepi32_epi16(e));
    } else {
      _mm512_storeu_si512(reinterpret_cast<void*>(o + i), e);
    }
  }
  if (i < batch)
    BucketizeColAffine1<T, kLut>(x + i, b, k, b0, inv_d, lut, batch - i,
                                 o + i);
}
#endif  // RECOM_AVX512

template <typename T, bool kLut>
void BucketizeColSearch(const float* x, const float* b, int32_t k,
                        int64_t kmax, const int32_t* lut, int64_t batch,
                        T* o) {
  for (int64_t i = 0; i < batch; ++i) {
    const float v = x[i];
    int32_t id;
    if (v != v) {
      id = k;
    } else {
      // branchless upper_bound: +inf padding keeps every probe in
      // bounds; cmov per level, no mispredicts
      int32_t idx = 0;
      for (int32_t step = static_cast<int32_t>(kmax) >> 1; step; step >>= 1)
        idx += (b[idx + step - 1] <= v) ? step : 0;
      // v == +inf also counts the +inf padding; clamp to true k
      id = idx > k ? k : idx;
    }
    if (kLut) id = lut[id];
    o[i] = static_cast<T>(id);
  }
}

template <typename T>
void BucketizeCol(const float* x, const float* b, int32_t k, int64_t kmax,
                  float b0, float inv_d, float step, uint8_t aff,
                  const int32_t* lut, int64_t batch, T* o) {
  if (aff == 3 && k > 0) {             // exact-affine boundaries: no probes
#ifdef RECOM_AVX512
    if (lut)
      BucketizeColAffineExactSimd<T, true>(x, b, k, b0, inv_d, step, lut,
                                           batch, o);
    else
      BucketizeColAffineExactSimd<T, false>(x, b, k, b0, inv_d, step,
                                            nullptr, batch, o);
#else
    if (lut)
      BucketizeColAffine1<T, true>(x, b, k, b0, inv_d, lut, batch, o);
    else
      BucketizeColAffine1<T, false>(x, b, k, b0, inv_d, nullptr, batch, o);
#endif
  } else if (aff == 2 && k > 0) {      // guess exact to +-1: branchless
#ifdef RECOM_AVX512
    if (k < 16) {                      // boundary row's head fits one zmm
      if (lut)
        BucketizeColAffine1SimdSmall<T, true>(x, b, k, kmax, b0, inv_d,
                                              lut, batch, o);
      else
        BucketizeColAffine1SimdSmall<T, false>(x, b, k, kmax, b0, inv_d,
                                               nullptr, batch, o);
    } else if (lut)
      BucketizeColAffine1Simd<T, true>(x, b, k, b0, inv_d, lut, batch, o);
    else
      BucketizeColAffine1Simd<T, false>(x, b, k, b0, inv_d, nullptr, batch,
                                        o);
#else
    if (lut)
      BucketizeColAffine1<T, true>(x, b, k, b0, inv_d, lut, batch, o);
    else
      BucketizeColAffine1<T, false>(x, b, k, b0, inv_d, nullptr, batch, o);
#endif
  } else if (aff && k > 0) {           // guess within a few steps: loops
    if (lut)
      BucketizeColAffine<T, true>(x, b, k, b0, inv_d, lut, batch, o);
    else
      BucketizeColAffine<T, false>(x, b, k, b0, inv_d, nullptr, batch, o);
  } else {
    if (lut)
      BucketizeColSearch<T, true>(x, b, k, kmax, lut, batch, o);
    else
      BucketizeColSearch<T, false>(x, b, k, kmax, nullptr, batch, o);
  }
}

}  // namespace
}  // extern "C++"

void rt_bucketize_multi(const float** xs, const float* bounds32, int64_t kmax,
                        const int32_t* counts, const float* inv_ds,
                        const float* steps, const uint8_t* affine,
                        const int32_t** luts, int64_t n_cols, int64_t batch,
                        uint8_t* out, int64_t stride, int64_t elem) {
  ParallelColumns(n_cols, 64, [=](int64_t c) {
#ifdef RECOM_AVX512
    // request feeds are cold (fresh per request): start the next column's
    // 2KB stream while this one computes — the per-column stream-restart
    // latency is otherwise a large share of the 880-column sweep
    if (c + 1 < n_cols) {
      const char* nx = reinterpret_cast<const char*>(xs[c + 1]);
      // capped like rt_hash_fixed_multi_out: an uncapped batch*4 sweep
      // at large batches floods the prefetch queue and can evict the
      // CURRENT column's working set (ADVICE r04)
      for (int64_t off = 0; off < batch * 4 && off < 16384; off += 64)
        _mm_prefetch(nx + off, _MM_HINT_T0);
    }
#endif
    const float* x = xs[c];
    const float* b = bounds32 + c * kmax;
    const int32_t k = counts[c];
    const float step = steps ? steps[c] : 0.0f;
    const int32_t* lut = luts ? luts[c] : nullptr;
    uint8_t* o = out + c * stride * elem;
    switch (elem) {
      case 1:
        BucketizeCol<int8_t>(x, b, k, kmax, b[0], inv_ds[c], step,
                             affine[c], lut, batch,
                             reinterpret_cast<int8_t*>(o));
        break;
      case 2:
        BucketizeCol<int16_t>(x, b, k, kmax, b[0], inv_ds[c], step,
                              affine[c], lut, batch,
                              reinterpret_cast<int16_t*>(o));
        break;
      default:
        BucketizeCol<int32_t>(x, b, k, kmax, b[0], inv_ds[c], step,
                              affine[c], lut, batch,
                              reinterpret_cast<int32_t*>(o));
    }
  });
}

// Hash int64 columns; column c writes to out + c*stride*elem.  TF
// ignore_value semantics folded in: input -1 writes id -1.
// luts (optional, per column): precomputed hash ids for values
// [0, lut_size) — TF's int hash is hash(decimal string), a pure function
// of the value, so small non-negative ids (the common categorical case)
// become one table load instead of format+hash+mod.
extern "C++" {
namespace {

template <typename T>
void HashIntColT(const int64_t* v, uint64_t nb, const int32_t* lut,
                 int64_t lut_size, int64_t batch, T* o) {
  uint8_t buf[24];
  const FastMod mod(nb);
  int64_t i = 0;
#if defined(RECOM_AVX512) && defined(__AVX512VL__)
  // 8-lane LUT path: int features overwhelmingly land in [0, lut_size)
  // (the plan precomputes hash(str(v)) there) — gather the ids and only
  // drop to the scalar format+hash loop when a block has any
  // out-of-range lane (a -1 missing value or a large id)
  if (lut) {
    const __m512i vlo = _mm512_setzero_si512();
    const __m512i vhi = _mm512_set1_epi64(lut_size);
    for (; i + 8 <= batch; i += 8) {
      const __m512i x =
          _mm512_loadu_si512(reinterpret_cast<const void*>(v + i));
      const __mmask8 in_lo = _mm512_cmp_epi64_mask(x, vlo, _MM_CMPINT_NLT);
      const __mmask8 in_hi = _mm512_cmp_epi64_mask(x, vhi, _MM_CMPINT_LT);
      if ((in_lo & in_hi) != 0xff) break;    // tail loop handles the rest
      const __m256i idx = _mm512_cvtepi64_epi32(x);
      const __m256i ids = _mm256_i32gather_epi32(lut, idx, 4);
      if (sizeof(T) == 1) {
        _mm_storel_epi64(reinterpret_cast<__m128i*>(o + i),
                         _mm256_cvtepi32_epi8(ids));
      } else if (sizeof(T) == 2) {
        _mm_storeu_si128(reinterpret_cast<__m128i*>(o + i),
                         _mm256_cvtepi32_epi16(ids));
      } else {
        _mm256_storeu_si256(reinterpret_cast<__m256i*>(o + i), ids);
      }
    }
  }
#endif
  for (; i < batch; ++i) {
    const int64_t x = v[i];
    if (lut && static_cast<uint64_t>(x) < static_cast<uint64_t>(lut_size)) {
      o[i] = static_cast<T>(lut[x]);
      continue;
    }
    if (x == -1) {
      o[i] = static_cast<T>(-1);
      continue;
    }
    size_t len = FormatInt(x, buf);
    o[i] = static_cast<T>(static_cast<int32_t>(mod(Hash64(buf, len))));
  }
}

}  // namespace
}  // extern "C++"

void rt_hash_int_multi_out(const int64_t** vals, const int64_t* buckets,
                           const int32_t** luts, int64_t lut_size,
                           int64_t n_cols, int64_t batch, uint8_t* out,
                           int64_t stride, int64_t elem) {
  ParallelColumns(n_cols, 8, [=](int64_t c) {
    const int64_t* v = vals[c];
    const uint64_t nb = static_cast<uint64_t>(buckets[c]);
    const int32_t* lut = luts ? luts[c] : nullptr;
    uint8_t* o = out + c * stride * elem;
    switch (elem) {
      case 1:
        HashIntColT<int8_t>(v, nb, lut, lut_size, batch,
                            reinterpret_cast<int8_t*>(o));
        break;
      case 2:
        HashIntColT<int16_t>(v, nb, lut, lut_size, batch,
                             reinterpret_cast<int16_t*>(o));
        break;
      default:
        HashIntColT<int32_t>(v, nb, lut, lut_size, batch,
                             reinterpret_cast<int32_t*>(o));
    }
  });
}

// Hash fixed-width string columns; column c writes to out + c*stride*elem.
extern "C++" {
namespace {

inline size_t FixedLenHot(const uint8_t* p, int64_t width) {
#ifdef RECOM_AVX512
  return FixedLenSimd(p, width);
#else
  return FixedLen(p, width);
#endif
}

// Templated on the output element so the loop carries no per-element
// dispatch; 4-way unrolled so four independent FarmHash dependency chains
// are in flight (the hash is latency-bound: ~25-cycle serial chain over
// ~12 uops — the OoO window covers all four bodies).
template <typename T>
void HashFixedColT(const uint8_t* buf, int64_t w, uint64_t nb, int64_t batch,
                   T* o) {
  const FastMod mod(nb);
  int64_t i = 0;
#ifdef RECOM_AVX512_H8
  // 8-lane SIMD hash for the short widths that dominate feature columns.
  // Row lengths come straight from the NUL pad via per-lane lzcnt.
  if (w >= 1 && w <= 16 && batch >= 16) {
    const __m512i vm = _mm512_set1_epi64(static_cast<int64_t>(mod.m));
    const __m512i vd = _mm512_set1_epi64(static_cast<int64_t>(nb));
    const __m512i v8 = _mm512_set1_epi64(8);
    if (w == 8) {
      // 8 rows = one contiguous 64-byte load, one lane per row
      for (; i + 8 <= batch; i += 8) {
        const __m512i q = _mm512_loadu_si512(
            reinterpret_cast<const void*>(buf + i * 8));
        const __m512i len = _mm512_sub_epi64(
            v8, _mm512_srli_epi64(_mm512_lzcnt_epi64(q), 3));
        StoreIds8<T>(Mod8(Hash8Short(q, q, len), vm, vd), o + i);
      }
    } else if (w < 8) {
      // gather 8B at each row start; bytes >= w belong to the NEXT row,
      // so mask to the column width before the lzcnt.  The gather on the
      // final rows would read past the buffer: stop `tail` rows early.
      const __m512i vwmask =
          _mm512_set1_epi64(static_cast<int64_t>((1ULL << (8 * w)) - 1));
      const __m512i lanes = _mm512_setr_epi64(0, 1, 2, 3, 4, 5, 6, 7);
      const __m512i voffs =
          _mm512_mullo_epi64(lanes, _mm512_set1_epi64(w));
      const int64_t tail = 7 + (8 + w - 1) / w;
      for (; i + tail <= batch; i += 8) {
        const __m512i idx =
            _mm512_add_epi64(_mm512_set1_epi64(i * w), voffs);
        const __m512i q = _mm512_and_si512(
            _mm512_i64gather_epi64(idx, buf, 1), vwmask);
        const __m512i len = _mm512_sub_epi64(
            v8, _mm512_srli_epi64(_mm512_lzcnt_epi64(q), 3));
        StoreIds8<T>(Mod8(Hash8Short(q, q, len), vm, vd), o + i);
      }
    } else {
      // 8 < w <= 16: two windows per row cover every byte ([0,8) and
      // [w-8,w)); all gathers stay inside the row, no read-ahead.
      const __m512i lanes = _mm512_setr_epi64(0, 1, 2, 3, 4, 5, 6, 7);
      const __m512i voffs =
          _mm512_mullo_epi64(lanes, _mm512_set1_epi64(w));
      const __m512i vw = _mm512_set1_epi64(w);
      for (; i + 8 <= batch; i += 8) {
        const __m512i idx =
            _mm512_add_epi64(_mm512_set1_epi64(i * w), voffs);
        const __m512i qlo = _mm512_i64gather_epi64(idx, buf, 1);
        const __m512i qtop = _mm512_i64gather_epi64(
            _mm512_add_epi64(idx, _mm512_set1_epi64(w - 8)), buf, 1);
        const __mmask8 topz =
            _mm512_cmp_epu64_mask(qtop, _mm512_setzero_si512(),
                                  _MM_CMPINT_EQ);
        // top window non-empty: len = w - pad(qtop); else the whole
        // used prefix sits in qlo (its own pad bytes are NUL)
        const __m512i len_top = _mm512_sub_epi64(
            vw, _mm512_srli_epi64(_mm512_lzcnt_epi64(qtop), 3));
        const __m512i len_lo = _mm512_sub_epi64(
            v8, _mm512_srli_epi64(_mm512_lzcnt_epi64(qlo), 3));
        const __m512i len =
            _mm512_mask_mov_epi64(len_top, topz, len_lo);
        // hi window [len-8, len) for len >= 8 lanes (offset clamps to
        // the row start for shorter lanes, harmlessly)
        const __m512i offhi = _mm512_add_epi64(
            idx, _mm512_sub_epi64(_mm512_max_epu64(len, v8), v8));
        const __m512i qhi = _mm512_i64gather_epi64(offhi, buf, 1);
        StoreIds8<T>(Mod8(Hash8Short(qlo, qhi, len), vm, vd), o + i);
      }
    }
  }
#endif
  for (; i + 4 <= batch; i += 4) {
    const uint8_t* p0 = buf + i * w;
    const uint8_t* p1 = p0 + w;
    const uint8_t* p2 = p1 + w;
    const uint8_t* p3 = p2 + w;
    const size_t l0 = FixedLenHot(p0, w);
    const size_t l1 = FixedLenHot(p1, w);
    const size_t l2 = FixedLenHot(p2, w);
    const size_t l3 = FixedLenHot(p3, w);
    const uint64_t h0 = Hash64(p0, l0);
    const uint64_t h1 = Hash64(p1, l1);
    const uint64_t h2 = Hash64(p2, l2);
    const uint64_t h3 = Hash64(p3, l3);
    o[i + 0] = static_cast<T>(static_cast<int32_t>(mod(h0)));
    o[i + 1] = static_cast<T>(static_cast<int32_t>(mod(h1)));
    o[i + 2] = static_cast<T>(static_cast<int32_t>(mod(h2)));
    o[i + 3] = static_cast<T>(static_cast<int32_t>(mod(h3)));
  }
  for (; i < batch; ++i) {
    const uint8_t* p = buf + i * w;
    o[i] = static_cast<T>(
        static_cast<int32_t>(mod(Hash64(p, FixedLenHot(p, w)))));
  }
}

}  // namespace
}  // extern "C++"

void rt_hash_fixed_multi_out(const uint8_t** bufs, const int64_t* widths,
                             const int64_t* buckets, int64_t n_cols,
                             int64_t batch, uint8_t* out, int64_t stride,
                             int64_t elem) {
  ParallelColumns(n_cols, 8, [=](int64_t c) {
#ifdef RECOM_AVX512
    if (c + 1 < n_cols) {
      const char* nx = reinterpret_cast<const char*>(bufs[c + 1]);
      const int64_t nbytes = widths[c + 1] * batch;
      for (int64_t off = 0; off < nbytes && off < 16384; off += 64)
        _mm_prefetch(nx + off, _MM_HINT_T0);
    }
#endif
    const uint8_t* buf = bufs[c];
    const int64_t w = widths[c];
    const uint64_t nb = static_cast<uint64_t>(buckets[c]);
    uint8_t* o = out + c * stride * elem;
    switch (elem) {
      case 1:
        HashFixedColT<int8_t>(buf, w, nb, batch,
                              reinterpret_cast<int8_t*>(o));
        break;
      case 2:
        HashFixedColT<int16_t>(buf, w, nb, batch,
                               reinterpret_cast<int16_t*>(o));
        break;
      default:
        HashFixedColT<int32_t>(buf, w, nb, batch,
                               reinterpret_cast<int32_t*>(o));
    }
  });
}

extern "C++" {
namespace {

// split+hash one column; returns max pieces.  Templated on the output
// element type so the hot loop has no per-element width dispatch.
template <typename T>
int64_t SplitHashPadT(const uint8_t* buf, int64_t width, int64_t n,
                      uint8_t delim, int64_t num_buckets, int64_t rowlen,
                      T* dst) {
  int64_t maxp = 0;
  const FastMod mod(static_cast<uint64_t>(num_buckets));
#ifdef RECOM_AVX512

  // Two-phase per row: (1) collect delimiter positions from 64-byte
  // compare masks, (2) hash the pieces 4-way unrolled so four independent
  // FarmHash chains are in flight.
  const __m512i vd = _mm512_set1_epi8(static_cast<char>(delim));
  int32_t starts[256];
  int32_t ends[256];
  const int64_t kcap =
      rowlen < static_cast<int64_t>(sizeof(starts) / sizeof(starts[0]))
          ? rowlen
          : static_cast<int64_t>(sizeof(starts) / sizeof(starts[0]));
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* p = buf + i * width;
    // rows are cold per request: pull row i+8 while hashing row i
    _mm_prefetch(reinterpret_cast<const char*>(p + 8 * width),
                 _MM_HINT_T0);
    _mm_prefetch(reinterpret_cast<const char*>(p + 8 * width + 64),
                 _MM_HINT_T0);
    const size_t len = FixedLenSimd(p, width);
    T* row = dst + i * rowlen;
    int64_t cnt = 0;
    if (len > 0) {
      int32_t start = 0;
      for (size_t base = 0; base < len; base += 64) {
        const size_t chunk = len - base >= 64 ? 64 : len - base;
        const __mmask64 loadm =
            chunk == 64 ? ~0ULL : ((1ULL << chunk) - 1);
        const __m512i v = _mm512_maskz_loadu_epi8(loadm, p + base);
        uint64_t mm = _mm512_mask_cmpeq_epi8_mask(loadm, v, vd);
        while (mm) {
          const int32_t j =
              static_cast<int32_t>(base + __builtin_ctzll(mm));
          mm &= mm - 1;
          if (cnt < kcap) {
            starts[cnt] = start;
            ends[cnt] = j;
          } else if (cnt < rowlen) {
            row[cnt] = static_cast<T>(static_cast<int32_t>(
                mod(Hash64(p + start, static_cast<size_t>(j - start)))));
          }
          ++cnt;
          start = j + 1;
        }
      }
      if (cnt < kcap) {
        starts[cnt] = start;
        ends[cnt] = static_cast<int32_t>(len);
      } else if (cnt < rowlen) {
        row[cnt] = static_cast<T>(static_cast<int32_t>(
            mod(Hash64(p + start, len - static_cast<size_t>(start)))));
      }
      ++cnt;
      const int64_t np = cnt < kcap ? cnt : kcap;
      int64_t k = 0;
      for (; k + 4 <= np; k += 4) {
        const uint64_t h0 =
            Hash64(p + starts[k + 0],
                   static_cast<size_t>(ends[k + 0] - starts[k + 0]));
        const uint64_t h1 =
            Hash64(p + starts[k + 1],
                   static_cast<size_t>(ends[k + 1] - starts[k + 1]));
        const uint64_t h2 =
            Hash64(p + starts[k + 2],
                   static_cast<size_t>(ends[k + 2] - starts[k + 2]));
        const uint64_t h3 =
            Hash64(p + starts[k + 3],
                   static_cast<size_t>(ends[k + 3] - starts[k + 3]));
        row[k + 0] = static_cast<T>(static_cast<int32_t>(mod(h0)));
        row[k + 1] = static_cast<T>(static_cast<int32_t>(mod(h1)));
        row[k + 2] = static_cast<T>(static_cast<int32_t>(mod(h2)));
        row[k + 3] = static_cast<T>(static_cast<int32_t>(mod(h3)));
      }
      for (; k < np; ++k)
        row[k] = static_cast<T>(static_cast<int32_t>(
            mod(Hash64(p + starts[k],
                       static_cast<size_t>(ends[k] - starts[k])))));
    }
    for (int64_t j = cnt < rowlen ? cnt : rowlen; j < rowlen; ++j)
      row[j] = static_cast<T>(-1);
    if (cnt > maxp) maxp = cnt;
  }
  return maxp;
#else
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* p = buf + i * width;
    size_t len = FixedLen(p, width);
    T* row = dst + i * rowlen;
    int64_t cnt = 0;
    if (len > 0) {
      size_t start = 0;
      for (size_t j = 0; j <= len; ++j) {
        if (j == len || p[j] == delim) {
          if (cnt < rowlen) {
            uint64_t h = Hash64(p + start, j - start);
            row[cnt] = static_cast<T>(static_cast<int32_t>(mod(h)));
          }
          ++cnt;
          start = j + 1;
        }
      }
    }
    for (int64_t j = cnt < rowlen ? cnt : rowlen; j < rowlen; ++j)
      row[j] = static_cast<T>(-1);
    if (cnt > maxp) maxp = cnt;
  }
  return maxp;
#endif
}

int64_t SplitHashPadElem(const uint8_t* buf, int64_t width, int64_t n,
                         uint8_t delim, int64_t num_buckets, int64_t rowlen,
                         uint8_t* dst, int64_t elem) {
  switch (elem) {
    case 1:
      return SplitHashPadT<int8_t>(buf, width, n, delim, num_buckets,
                                   rowlen, reinterpret_cast<int8_t*>(dst));
    case 2:
      return SplitHashPadT<int16_t>(buf, width, n, delim, num_buckets,
                                    rowlen,
                                    reinterpret_cast<int16_t*>(dst));
    default:
      return SplitHashPadT<int32_t>(buf, width, n, delim, num_buckets,
                                    rowlen,
                                    reinterpret_cast<int32_t*>(dst));
  }
}

}  // namespace
}  // extern "C++"

// Split+hash several delimited columns; column c writes [batch, rowlen]
// ids (-1 padded) at out + c*stride*elem (stride in elements — the view's
// padded batch * rowlen).  Returns max piece count.
int64_t rt_split_hash_multi_out(const uint8_t** bufs, const int64_t* widths,
                                const uint8_t* delims, const int64_t* buckets,
                                int64_t n_cols, int64_t batch, int64_t rowlen,
                                uint8_t* out, int64_t stride, int64_t elem) {
  std::vector<int64_t> maxs(n_cols, 0);
  ParallelColumns(n_cols, 4, [&, bufs, widths, delims, buckets](int64_t c) {
    maxs[c] = SplitHashPadElem(bufs[c], widths[c], batch, delims[c],
                               buckets[c], rowlen, out + c * stride * elem,
                               elem);
  });
  int64_t maxp = 0;
  for (int64_t m : maxs)
    if (m > maxp) maxp = m;
  return maxp;
}

// ---------------------------------------------------------------------
// Criteo TSV parsing: label \t I1..I13 (decimal, may be empty) \t C1..C26
// (hex, may be empty) per line.  The data-ingestion hot loop for DLRM
// training (models/criteo.py read_criteo_tsv's Python loop replaced by
// one call per file chunk).  Missing fields and short lines parse as 0,
// matching the Python reader; unparsable content also yields 0 (the
// Python reader raises there — the native path is tolerant by design,
// equivalence is tested on well-formed data).

extern "C++" {
namespace {

inline double ParseF64Field(const char* p, int64_t n) {
  double v = 0.0;
  if (n > 0) std::from_chars(p, p + n, v);
  return v;
}

inline int64_t ParseDecField(const char* p, int64_t n) {
  int64_t v = 0;
  if (n > 0) std::from_chars(p, p + n, v);
  return v;
}

inline int64_t ParseHexField(const char* p, int64_t n) {
  // Python int(field, 16) semantics for plain hex tokens (both cases);
  // leading '-' supported; anything else -> best-effort prefix parse
  bool neg = n > 0 && p[0] == '-';
  int64_t i = neg ? 1 : 0;
  uint64_t v = 0;
  for (; i < n; ++i) {
    const char ch = p[i];
    uint64_t d;
    if (ch >= '0' && ch <= '9') d = ch - '0';
    else if (ch >= 'a' && ch <= 'f') d = ch - 'a' + 10;
    else if (ch >= 'A' && ch <= 'F') d = ch - 'A' + 10;
    else break;
    v = v * 16 + d;
  }
  return neg ? -static_cast<int64_t>(v) : static_cast<int64_t>(v);
}

}  // namespace
}  // extern "C++"

// Parse up to max_lines COMPLETE lines from buf[0..len).  Writes
// labels[line] f32, dense[(f)*stride + line] f32 (13 raw columns — the
// log1p transform is vectorized in numpy by the caller), cats[(f)*stride
// + line] int64 (26 columns).  A trailing line without '\n' is NOT
// consumed (the caller carries it into the next chunk).  *consumed gets
// the number of bytes parsed.  Returns the number of lines parsed.
int64_t rt_parse_criteo(const uint8_t* buf, int64_t len, int64_t max_lines,
                        int64_t stride, float* labels, float* dense,
                        int64_t* cats, int64_t* consumed) {
  int64_t line = 0;
  int64_t pos = 0;
  while (pos < len && line < max_lines) {
    int64_t eol = pos;
    while (eol < len && buf[eol] != '\n') ++eol;
    if (eol >= len) break;               // incomplete trailing line
    const char* base = reinterpret_cast<const char*>(buf);
    int64_t f = 0;
    int64_t s = pos;
    for (int64_t j = pos; j <= eol && f < 40; ++j) {
      if (j == eol || buf[j] == '\t') {
        int64_t flen = j - s;
        if (flen > 0 && base[s + flen - 1] == '\r') --flen;  // CRLF
        if (f == 0) {
          labels[line] =
              static_cast<float>(ParseDecField(base + s, flen));
        } else if (f < 14) {
          dense[(f - 1) * stride + line] =
              static_cast<float>(ParseF64Field(base + s, flen));
        } else {
          cats[(f - 14) * stride + line] = ParseHexField(base + s, flen);
        }
        ++f;
        s = j + 1;
      }
    }
    if (f == 0) labels[line] = 0.0f;     // empty line
    for (int64_t k = f < 1 ? 1 : f; k < 14; ++k)
      dense[(k - 1) * stride + line] = 0.0f;
    for (int64_t k = f < 14 ? 14 : f; k < 40; ++k)
      cats[(k - 14) * stride + line] = 0;
    ++line;
    pos = eol + 1;
  }
  *consumed = pos;
  return line;
}

// Copy n_cols float32 columns (xs[c]: [batch]) into out + c*stride floats —
// the staging copy for dense features and raw bucketize floats (one call
// for the whole class instead of a Python fill loop per column).
void rt_copy_f32_multi(const float** xs, int64_t n_cols, int64_t batch,
                       float* out, int64_t stride) {
  for (int64_t c = 0; c < n_cols; ++c) {
#ifdef RECOM_AVX512
    if (c + 1 < n_cols) {
      const char* nx = reinterpret_cast<const char*>(xs[c + 1]);
      // capped like rt_hash_fixed_multi_out: an uncapped batch*4 sweep
      // at large batches floods the prefetch queue and can evict the
      // CURRENT column's working set (ADVICE r04)
      for (int64_t off = 0; off < batch * 4 && off < 16384; off += 64)
        _mm_prefetch(nx + off, _MM_HINT_T0);
    }
#endif
    std::memcpy(out + c * stride, xs[c], batch * sizeof(float));
  }
}

// Stage 'S'-layout string columns into a zeroed [n_cols, Bp, w_out] u8
// view for device-side hashing (wire device_hash): column c's rows copy
// at their natural width widths[c] (<= w_out), w_out - widths[c] NUL pad
// bytes per row left untouched.  One call per class instead of a Python
// strided-copy loop per column (~3us numpy overhead each at 70 columns).
// Verbatim column staging for device-hash wire views (runtime/wire.py
// _fill_verbatim): column c's numpy 'S' buffer (widths[c] bytes/row,
// batch rows) copies byte-for-byte to dst + c*stride — ONE memcpy — and
// the slack [batch*widths[c], stride) is zeroed so the view is fully
// defined even over an uninitialized (np.empty) blob.  Replaces a Python
// per-column loop (~2us/column of slicing overhead at model-E scale).
void rt_copy_verbatim_multi(const uint8_t** bufs, const int64_t* widths,
                            int64_t n_cols, int64_t batch, uint8_t* dst,
                            int64_t stride) {
  for (int64_t c = 0; c < n_cols; ++c) {
    int64_t n = batch * widths[c];
    if (n > stride) n = stride;
    std::memcpy(dst + c * stride, bufs[c], static_cast<size_t>(n));
    if (n < stride)
      std::memset(dst + c * stride + n, 0,
                  static_cast<size_t>(stride - n));
  }
}

void rt_copy_bytes_multi(const uint8_t** bufs, const int64_t* widths,
                         int64_t n_cols, int64_t batch, uint8_t* out,
                         int64_t stride_rows, int64_t w_out) {
  for (int64_t c = 0; c < n_cols; ++c) {
    const uint8_t* src = bufs[c];
    const int64_t w = widths[c];
    uint8_t* dst = out + c * stride_rows * w_out;
    if (w == w_out) {
      std::memcpy(dst, src, static_cast<size_t>(batch) * w);
      continue;
    }
    for (int64_t i = 0; i < batch; ++i)
      std::memcpy(dst + i * w_out, src + i * w, w);
  }
}

}  // extern "C"
