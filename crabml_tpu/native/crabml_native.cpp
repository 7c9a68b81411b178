// crabml-tpu native layer: GGUF container probe, bit-exact ggml dequant
// codecs, and the single-pass multithreaded repack from raw ggml blocks to
// the Pallas kernel plane layout (ops/pallas/gemm_quant.py docstring).
//
// This is the C++ counterpart the reference implements in Rust
// (crabml-core/src/gguf.rs, crabml-core/src/cpu/buf/*): the container and
// codec layer is native, while the compute path stays JAX/Pallas. Exposed
// through a plain C ABI consumed via ctypes (no pybind11 in this image).
//
// Layout contract with gemm_quant.repack (the Python reference
// implementation, kept as fallback + test oracle):
//   q plane idx with pbits: (m/TM, kpad/P, TM) u8/i8,
//     packed[mt, s*TKp + b, tm] = OR_p  sub(p)<<p*pbits,
//     sub(p) = (val(row=mt*TM+tm, kcol=s*tk + p*TKp + b) >> bit_base) & mask
//   dsub/msub: (m/TM, S, G, TM) f32 or bf16,
//     dsub[mt, s, g, tm] = scale(row, group = s*G + g)
// Rows are NATURAL k order; kpad zero-pads (zero scales) to a tk multiple.
//
// Build: g++ -O3 -shared -fPIC -pthread -o libcrabml_native.so crabml_native.cpp

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cmath>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

constexpr int TM = 256;

// ---------------------------------------------------------------------------
// f16 -> f32 (bit-exact, matches numpy)
// ---------------------------------------------------------------------------

float f16_to_f32(uint16_t h) {
  uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t man = h & 0x3FF;
  uint32_t bits;
  if (exp == 0) {
    if (man == 0) {
      bits = sign;
    } else {  // subnormal: normalize
      int shift = 0;
      while (!(man & 0x400)) {
        man <<= 1;
        shift++;
      }
      man &= 0x3FF;
      bits = sign | ((127 - 15 - shift + 1) << 23) | (man << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7F800000u | (man << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
  }
  float out;
  std::memcpy(&out, &bits, 4);
  return out;
}

uint16_t f32_to_bf16(float f) {
  uint32_t bits;
  std::memcpy(&bits, &f, 4);
  // round-to-nearest-even, matching ml_dtypes/numpy astype
  uint32_t lsb = (bits >> 16) & 1;
  uint32_t rounded = bits + 0x7FFFu + lsb;
  return (uint16_t)(rounded >> 16);
}

// ---------------------------------------------------------------------------
// per-scheme row decoders: raw blocks of one row -> vals (int, biased as the
// kernel expects: w = (val - off) * dsub + msub), dsub/msub per gr elements.
// Bit conventions mirror quant/planar.py + gemm_quant._extract_vals_scales.
// ---------------------------------------------------------------------------

struct RowOut {
  int16_t* vals;   // k entries
  float* dsub;     // k/gr entries
  float* msub;     // k/gr entries or nullptr
};

// Q8_0: {d f16, qs i8[32]} (buf_q8_0.rs:8-13)
void row_q8_0(const uint8_t* src, int k, RowOut o) {
  int nb = k / 32;
  for (int b = 0; b < nb; b++) {
    const uint8_t* blk = src + b * 34;
    o.dsub[b] = f16_to_f32(*(const uint16_t*)blk);
    const int8_t* qs = (const int8_t*)(blk + 2);
    for (int i = 0; i < 32; i++) o.vals[b * 32 + i] = qs[i];
  }
}

// Q8_1: {d f16, s f16, qs i8[32]} (buf_q8_1.rs:75-78)
void row_q8_1(const uint8_t* src, int k, RowOut o) {
  int nb = k / 32;
  for (int b = 0; b < nb; b++) {
    const uint8_t* blk = src + b * 36;
    o.dsub[b] = f16_to_f32(*(const uint16_t*)blk);
    const int8_t* qs = (const int8_t*)(blk + 4);
    for (int i = 0; i < 32; i++) o.vals[b * 32 + i] = qs[i];
  }
}

// Q4_0: {d f16, qs u8[16]} nibbles lo=elems 0..15, hi=elems 16..31
void row_q4_0(const uint8_t* src, int k, RowOut o) {
  int nb = k / 32;
  for (int b = 0; b < nb; b++) {
    const uint8_t* blk = src + b * 18;
    o.dsub[b] = f16_to_f32(*(const uint16_t*)blk);
    const uint8_t* qs = blk + 2;
    for (int i = 0; i < 16; i++) {
      o.vals[b * 32 + i] = qs[i] & 0xF;
      o.vals[b * 32 + 16 + i] = qs[i] >> 4;
    }
  }
}

// Q4_1: {d f16, m f16, qs u8[16]}
void row_q4_1(const uint8_t* src, int k, RowOut o) {
  int nb = k / 32;
  for (int b = 0; b < nb; b++) {
    const uint8_t* blk = src + b * 20;
    o.dsub[b] = f16_to_f32(*(const uint16_t*)blk);
    o.msub[b] = f16_to_f32(*(const uint16_t*)(blk + 2));
    const uint8_t* qs = blk + 4;
    for (int i = 0; i < 16; i++) {
      o.vals[b * 32 + i] = qs[i] & 0xF;
      o.vals[b * 32 + 16 + i] = qs[i] >> 4;
    }
  }
}

// Q5_0: {d f16, qh u8[4], qs u8[16]}; 5th bit j of qh (LSB-first)
void row_q5_0(const uint8_t* src, int k, RowOut o) {
  int nb = k / 32;
  for (int b = 0; b < nb; b++) {
    const uint8_t* blk = src + b * 22;
    o.dsub[b] = f16_to_f32(*(const uint16_t*)blk);
    uint32_t qh;
    std::memcpy(&qh, blk + 2, 4);
    const uint8_t* qs = blk + 6;
    for (int i = 0; i < 16; i++) {
      o.vals[b * 32 + i] = (qs[i] & 0xF) | (((qh >> i) & 1) << 4);
      o.vals[b * 32 + 16 + i] = (qs[i] >> 4) | (((qh >> (16 + i)) & 1) << 4);
    }
  }
}

// Q5_1: {d f16, m f16, qh u8[4], qs u8[16]}
void row_q5_1(const uint8_t* src, int k, RowOut o) {
  int nb = k / 32;
  for (int b = 0; b < nb; b++) {
    const uint8_t* blk = src + b * 24;
    o.dsub[b] = f16_to_f32(*(const uint16_t*)blk);
    o.msub[b] = f16_to_f32(*(const uint16_t*)(blk + 2));
    uint32_t qh;
    std::memcpy(&qh, blk + 4, 4);
    const uint8_t* qs = blk + 8;
    for (int i = 0; i < 16; i++) {
      o.vals[b * 32 + i] = (qs[i] & 0xF) | (((qh >> i) & 1) << 4);
      o.vals[b * 32 + 16 + i] = (qs[i] >> 4) | (((qh >> (16 + i)) & 1) << 4);
    }
  }
}

// Q2_K: {scales u8[16], qs u8[64], d f16, dmin f16}; 2-bit vals, gr=16.
// elem e of superblock: half h=e/128, byte (h*32 + e%32), shift 2*((e%128)/32)
void row_q2_k(const uint8_t* src, int k, RowOut o) {
  int nsb = k / 256;
  for (int s = 0; s < nsb; s++) {
    const uint8_t* blk = src + s * 84;
    const uint8_t* scales = blk;
    const uint8_t* qs = blk + 16;
    float d = f16_to_f32(*(const uint16_t*)(blk + 80));
    float dmin = f16_to_f32(*(const uint16_t*)(blk + 82));
    for (int g = 0; g < 16; g++) {
      o.dsub[s * 16 + g] = d * (float)(scales[g] & 0xF);
      o.msub[s * 16 + g] = -dmin * (float)(scales[g] >> 4);
    }
    for (int e = 0; e < 256; e++) {
      int h = e / 128, r = e % 128;
      o.vals[s * 256 + e] = (qs[h * 32 + (r % 32)] >> (2 * (r / 32))) & 3;
    }
  }
}

// Q3_K: {hmask u8[32], qs u8[64], scales u8[12] 6-bit packed, d f16};
// vals = 2-bit | hbit<<2 (kernel subtracts off=4); gr=16.
void row_q3_k(const uint8_t* src, int k, RowOut o) {
  int nsb = k / 256;
  for (int s = 0; s < nsb; s++) {
    const uint8_t* blk = src + s * 110;
    const uint8_t* hm = blk;
    const uint8_t* qs = blk + 32;
    const uint8_t* sc = blk + 96;
    float d = f16_to_f32(*(const uint16_t*)(blk + 108));
    // 6-bit scale unpack (util.rs:19-27 layout, matches codecs._q3k_scales)
    for (int j = 0; j < 16; j++) {
      int is;
      if (j < 8) {
        is = (sc[j] & 0xF) | (((sc[j % 4 + 8] >> (2 * (j / 4))) & 3) << 4);
      } else {
        is = (sc[j - 8] >> 4) | (((sc[j % 4 + 8] >> (2 * (j / 4))) & 3) << 4);
      }
      o.dsub[s * 16 + j] = d * (float)(is - 32);
    }
    for (int e = 0; e < 256; e++) {
      int h = e / 128, r = e % 128;
      int lo = (qs[h * 32 + (r % 32)] >> (2 * (r / 32))) & 3;
      int hb = (hm[e % 32] >> (e / 32)) & 1;
      o.vals[s * 256 + e] = lo | (hb << 2);
    }
  }
}

// get_scale_min_k4 (util.rs:19-27)
inline void k4_scale_min(const uint8_t* q, int j, int* sc, int* mn) {
  if (j < 4) {
    *sc = q[j] & 63;
    *mn = q[j + 4] & 63;
  } else {
    *sc = (q[j + 4] & 0xF) | ((q[j - 4] >> 6) << 4);
    *mn = (q[j + 4] >> 4) | ((q[j] >> 6) << 4);
  }
}

// Q4_K: {d f16, dmin f16, scales u8[12], qs u8[128]}; gr=32.
void row_q4_k(const uint8_t* src, int k, RowOut o) {
  int nsb = k / 256;
  for (int s = 0; s < nsb; s++) {
    const uint8_t* blk = src + s * 144;
    float d = f16_to_f32(*(const uint16_t*)blk);
    float dmin = f16_to_f32(*(const uint16_t*)(blk + 2));
    const uint8_t* scales = blk + 4;
    const uint8_t* qs = blk + 16;
    for (int j = 0; j < 8; j++) {
      int sc, mn;
      k4_scale_min(scales, j, &sc, &mn);
      o.dsub[s * 8 + j] = d * (float)sc;
      o.msub[s * 8 + j] = -dmin * (float)mn;
    }
    // per 64-chunk: lo nibbles = elems 0..31, hi = 32..63
    for (int c = 0; c < 4; c++) {
      const uint8_t* q = qs + c * 32;
      for (int i = 0; i < 32; i++) {
        o.vals[s * 256 + c * 64 + i] = q[i] & 0xF;
        o.vals[s * 256 + c * 64 + 32 + i] = q[i] >> 4;
      }
    }
  }
}

// Q5_K: {d, dmin, scales u8[12], qh u8[32], qs u8[128]}; gr=32.
void row_q5_k(const uint8_t* src, int k, RowOut o) {
  int nsb = k / 256;
  for (int s = 0; s < nsb; s++) {
    const uint8_t* blk = src + s * 176;
    float d = f16_to_f32(*(const uint16_t*)blk);
    float dmin = f16_to_f32(*(const uint16_t*)(blk + 2));
    const uint8_t* scales = blk + 4;
    const uint8_t* qh = blk + 16;
    const uint8_t* qs = blk + 48;
    for (int j = 0; j < 8; j++) {
      int sc, mn;
      k4_scale_min(scales, j, &sc, &mn);
      o.dsub[s * 8 + j] = d * (float)sc;
      o.msub[s * 8 + j] = -dmin * (float)mn;
    }
    for (int c = 0; c < 4; c++) {
      const uint8_t* q = qs + c * 32;
      for (int i = 0; i < 32; i++) {
        int e0 = c * 64 + i, e1 = c * 64 + 32 + i;
        int b0 = (qh[e0 % 32] >> (e0 / 32)) & 1;
        int b1 = (qh[e1 % 32] >> (e1 / 32)) & 1;
        o.vals[s * 256 + e0] = (q[i] & 0xF) | (b0 << 4);
        o.vals[s * 256 + e1] = (q[i] >> 4) | (b1 << 4);
      }
    }
  }
}

// Q6_K: {ql u8[128], qh u8[64], scales i8[16], d f16}; vals biased 0..63
// (kernel subtracts off=32); gr=16.
void row_q6_k(const uint8_t* src, int k, RowOut o) {
  int nsb = k / 256;
  for (int s = 0; s < nsb; s++) {
    const uint8_t* blk = src + s * 210;
    const uint8_t* ql = blk;
    const uint8_t* qh = blk + 128;
    const int8_t* sc = (const int8_t*)(blk + 192);
    float d = f16_to_f32(*(const uint16_t*)(blk + 208));
    for (int g = 0; g < 16; g++) o.dsub[s * 16 + g] = d * (float)sc[g];
    // per 128-chunk: ql byte j = elems j | j+64<<4; qh byte e%32, shift 2*(e/32 % 4)
    for (int h = 0; h < 2; h++) {
      const uint8_t* qlh = ql + h * 64;
      const uint8_t* qhh = qh + h * 32;
      for (int i = 0; i < 64; i++) {
        int lo0 = qlh[i] & 0xF, lo1 = qlh[i] >> 4;
        int e0 = i, e1 = i + 64;  // within the 128-chunk
        int hi0 = (qhh[e0 % 32] >> (2 * (e0 / 32))) & 3;
        int hi1 = (qhh[e1 % 32] >> (2 * (e1 / 32))) & 3;
        o.vals[s * 256 + h * 128 + e0] = lo0 | (hi0 << 4);
        o.vals[s * 256 + h * 128 + e1] = lo1 | (hi1 << 4);
      }
    }
  }
}

struct SchemeInfo {
  int gr;
  float off;
  int plane_bits[2];  // 0 = unused
  bool has_min;
  int row_bytes_per_k_num, row_bytes_per_k_den;  // bytes per row = k*num/den
  void (*decode)(const uint8_t*, int, RowOut);
};

// ggml type ids (gguf.rs:84-108)
SchemeInfo scheme_for(int t) {
  switch (t) {
    case 8:  return {32, 0.f, {8, 0}, false, 34, 32, row_q8_0};   // Q8_0
    case 9:  return {32, 0.f, {8, 0}, false, 36, 32, row_q8_1};   // Q8_1
    case 2:  return {32, 8.f, {4, 0}, false, 18, 32, row_q4_0};   // Q4_0
    case 3:  return {32, 0.f, {4, 0}, true, 20, 32, row_q4_1};    // Q4_1
    case 6:  return {32, 16.f, {4, 1}, false, 22, 32, row_q5_0};  // Q5_0
    case 7:  return {32, 0.f, {4, 1}, true, 24, 32, row_q5_1};    // Q5_1
    case 10: return {16, 0.f, {2, 0}, true, 84, 256, row_q2_k};   // Q2_K
    case 11: return {16, 4.f, {2, 1}, false, 110, 256, row_q3_k}; // Q3_K
    case 12: return {32, 0.f, {4, 0}, true, 144, 256, row_q4_k};  // Q4_K
    case 13: return {32, 0.f, {4, 1}, true, 176, 256, row_q5_k};  // Q5_K
    case 14: return {16, 32.f, {4, 2}, false, 210, 256, row_q6_k};// Q6_K
    default: return {0, 0.f, {0, 0}, false, 0, 1, nullptr};
  }
}

void store_scale(void* dst, int64_t idx, float v, int is_bf16) {
  if (is_bf16) {
    ((uint16_t*)dst)[idx] = f32_to_bf16(v);
  } else {
    ((float*)dst)[idx] = v;
  }
}

// ---------------------------------------------------------------------------
// ggml block ENCODERS (quantize) — the native counterpart of
// quant/codecs.py's quantize_* (reference: buf_*::quantize + util.rs scale
// searches). Needed because the K-quant searches are per-element greedy
// loops: Python does ~minutes/GB, this does ~GB/minute — which is what
// makes requantize_gguf and full-size synthetic GGUF construction usable.
// Semantics follow ggml (sequential f32 accumulation, nearest_i32 rounding);
// outputs round-trip within the reference error budgets and are validated
// against the numpy encoders in tests/test_native.py.
// ---------------------------------------------------------------------------

uint16_t f32_to_f16(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  uint32_t sign = (x >> 16) & 0x8000u;
  uint32_t mant = x & 0x007FFFFFu;
  uint32_t e8 = (x >> 23) & 0xFF;
  int32_t exp = (int32_t)e8 - 127 + 15;
  if (e8 == 0xFF) return (uint16_t)(sign | 0x7C00u | (mant ? (0x200u | (mant >> 13)) : 0));
  if (exp >= 31) return (uint16_t)(sign | 0x7C00u);
  if (exp <= 0) {
    if (exp < -10) return (uint16_t)sign;
    mant |= 0x00800000u;
    int shift = 14 - exp;
    uint32_t sub = mant >> shift;
    uint32_t rem = mant & ((1u << shift) - 1);
    uint32_t half = 1u << (shift - 1);
    if (rem > half || (rem == half && (sub & 1))) sub++;
    return (uint16_t)(sign | sub);
  }
  uint32_t out = sign | ((uint32_t)exp << 10) | (mant >> 13);
  uint32_t rem = mant & 0x1FFFu;
  if (rem > 0x1000u || (rem == 0x1000u && (out & 1))) out++;  // RNE (may carry)
  return (uint16_t)out;
}

inline float f16_round(float v) { return f16_to_f32(f32_to_f16(v)); }

// ggml's magic-number round-to-nearest-even (util.rs:10-16)
inline int nearest_i32(float x) {
  float f = x + 12582912.0f;
  int32_t i;
  std::memcpy(&i, &f, 4);
  return (i & 0x007FFFFF) - 0x00400000;
}

inline int clampi(int v, int lo, int hi) { return v < lo ? lo : (v > hi ? hi : v); }

// make_qkx1_quants (util.rs:154-216): scale+min search for one sub-block.
void make_qkx1_quants(int nmax, const float* x, int n, int ntry,
                      float* out_scale, float* out_min) {
  float mn = x[0], mx = x[0];
  for (int i = 1; i < n; i++) {
    mn = std::min(mn, x[i]);
    mx = std::max(mx, x[i]);
  }
  if (mx == mn) {
    *out_scale = 0.f;
    *out_min = 0.f;
    return;
  }
  if (mn > 0) mn = 0.f;
  float iscale = nmax / (mx - mn);
  float scale = 1.0f / iscale;
  std::vector<int> L(n, 0);
  for (int it = 0; it < ntry; it++) {
    float sumlx = 0.f;
    int suml2 = 0;
    bool did_change = false;
    for (int i = 0; i < n; i++) {
      int l = clampi(nearest_i32(iscale * (x[i] - mn)), 0, nmax);
      if (l != L[i]) {
        did_change = true;
        L[i] = l;
      }
      sumlx += (x[i] - mn) * l;
      suml2 += l * l;
    }
    scale = suml2 ? sumlx / suml2 : 0.f;
    float sum = 0.f;
    for (int i = 0; i < n; i++) sum += x[i] - scale * L[i];
    mn = sum / n;
    if (mn > 0) mn = 0.f;
    iscale = scale != 0.f ? 1.0f / scale : 0.f;
    if (!did_change) break;
  }
  *out_scale = scale;
  *out_min = -mn;
}

// make_qx_quants (util.rs:29-152) with rmse_type=1, for one sub-block.
// Fills L with values in [0, 2*nmax); returns the scale.
float make_qx_quants(int nmax, const float* x, int n, int* L) {
  float amax = 0.f, maxv = 0.f;
  for (int i = 0; i < n; i++) {
    float ax = std::fabs(x[i]);
    if (ax > amax) {
      amax = ax;
      maxv = x[i];
    }
  }
  if (amax == 0.f) {
    for (int i = 0; i < n; i++) L[i] = 0;
    return 0.f;
  }
  float iscale = -nmax / maxv;
  float sumlx = 0.f, suml2 = 0.f;
  for (int i = 0; i < n; i++) {
    int l = clampi(nearest_i32(iscale * x[i]), -nmax, nmax - 1);
    L[i] = l + nmax;
    float w = x[i] * x[i];
    sumlx += w * x[i] * l;
    suml2 += w * l * l;
  }
  float scale = sumlx / suml2;
  float best = scale * sumlx;
  for (int it = 0; it < 3; it++) {
    float isc = 1.0f / scale;
    bool changed = false;
    float slx = 0.f, sl2 = 0.f;
    std::vector<int> ln(n);
    for (int i = 0; i < n; i++) {
      int l = clampi(nearest_i32(isc * x[i]), -nmax, nmax - 1);
      ln[i] = l;
      if (l + nmax != L[i]) changed = true;
      float w = x[i] * x[i];
      slx += w * x[i] * l;
      sl2 += w * l * l;
    }
    if (!changed || sl2 == 0.f || slx * slx <= best * sl2) break;
    for (int i = 0; i < n; i++) L[i] = ln[i] + nmax;
    sumlx = slx;
    suml2 = sl2;
    scale = sumlx / suml2;
    best = scale * sumlx;
  }
  for (int itry = 0; itry < 5; itry++) {
    int n_changed = 0;
    for (int i = 0; i < n; i++) {
      float w = x[i] * x[i];
      int l = L[i] - nmax;
      float slx = sumlx - w * x[i] * l;
      if (slx > 0) {
        float sl2 = suml2 - w * (float)l * (float)l;
        int new_l = clampi(nearest_i32(x[i] * sl2 / slx), -nmax, nmax - 1);
        if (new_l != l) {
          slx += w * x[i] * new_l;
          sl2 += w * (float)new_l * (float)new_l;
          if (sl2 > 0 && slx * slx * suml2 > sumlx * sumlx * sl2) {
            L[i] = new_l + nmax;
            sumlx = slx;
            suml2 = sl2;
            scale = sumlx / suml2;
            best = scale * sumlx;
            n_changed++;
          }
        }
      }
    }
    if (!n_changed) break;
  }
  return scale;
}

// make_q3_quants (util.rs:218-284) with do_rmse=true; scale only.
float make_q3_quants(int nmax, const float* x, int n) {
  float amax = 0.f, maxv = 0.f;
  for (int i = 0; i < n; i++) {
    float ax = std::fabs(x[i]);
    if (ax > amax) {
      amax = ax;
      maxv = x[i];
    }
  }
  if (amax == 0.f) return 0.f;
  float iscale = -nmax / maxv;
  std::vector<int> L(n);
  float sumlx = 0.f, suml2 = 0.f;
  for (int i = 0; i < n; i++) {
    int l = clampi(nearest_i32(iscale * x[i]), -nmax, nmax - 1);
    L[i] = l;
    float w = x[i] * x[i];
    sumlx += w * x[i] * l;
    suml2 += w * l * l;
  }
  for (int itry = 0; itry < 5; itry++) {
    int n_changed = 0;
    for (int i = 0; i < n; i++) {
      float w = x[i] * x[i];
      int l = L[i];
      float slx = sumlx - w * x[i] * l;
      if (slx > 0) {
        float sl2 = suml2 - w * (float)l * (float)l;
        int new_l = clampi(nearest_i32(x[i] * sl2 / slx), -nmax, nmax - 1);
        if (new_l != l) {
          slx += w * x[i] * new_l;
          sl2 += w * (float)new_l * (float)new_l;
          if (sl2 > 0 && slx * slx * suml2 > sumlx * sumlx * sl2) {
            L[i] = new_l;
            sumlx = slx;
            suml2 = sl2;
            n_changed++;
          }
        }
      }
    }
    if (!n_changed) break;
  }
  return suml2 > 0 ? sumlx / suml2 : 0.f;
}

// --- simple 32-elem block encoders ---------------------------------------

void enc_q8_0(const float* x, uint8_t* dst) {  // 34 B / 32 elems
  float amax = 0.f;
  for (int i = 0; i < 32; i++) amax = std::max(amax, std::fabs(x[i]));
  float d = amax / 127.0f;
  float id = d != 0.f ? 1.0f / d : 0.f;
  *(uint16_t*)dst = f32_to_f16(d);
  int8_t* qs = (int8_t*)(dst + 2);
  for (int i = 0; i < 32; i++) qs[i] = (int8_t)std::roundf(x[i] * id);
}

void enc_q8_1(const float* x, uint8_t* dst) {  // 36 B
  float amax = 0.f;
  for (int i = 0; i < 32; i++) amax = std::max(amax, std::fabs(x[i]));
  float d = amax / 127.0f;
  float id = d != 0.f ? 1.0f / d : 0.f;
  int8_t* qs = (int8_t*)(dst + 4);
  float sum = 0.f;
  for (int i = 0; i < 32; i++) {
    qs[i] = (int8_t)std::roundf(x[i] * id);
    sum += qs[i];
  }
  *(uint16_t*)dst = f32_to_f16(d);
  *(uint16_t*)(dst + 2) = f32_to_f16(d * sum);
}

void enc_q4_0(const float* x, uint8_t* dst) {  // 18 B
  float amax = 0.f, maxv = 0.f;
  for (int i = 0; i < 32; i++) {
    float ax = std::fabs(x[i]);
    if (ax > amax) {
      amax = ax;
      maxv = x[i];
    }
  }
  float d = maxv / -8.0f;
  float id = d != 0.f ? 1.0f / d : 0.f;
  *(uint16_t*)dst = f32_to_f16(d);
  uint8_t q[32];
  for (int i = 0; i < 32; i++)
    q[i] = (uint8_t)clampi((int)(x[i] * id + 8.5f), 0, 15);
  for (int i = 0; i < 16; i++) dst[2 + i] = q[i] | (q[16 + i] << 4);
}

void enc_q4_1(const float* x, uint8_t* dst) {  // 20 B
  float mn = x[0], mx = x[0];
  for (int i = 1; i < 32; i++) {
    mn = std::min(mn, x[i]);
    mx = std::max(mx, x[i]);
  }
  float d = (mx - mn) / 15.0f;
  float id = d != 0.f ? 1.0f / d : 0.f;
  *(uint16_t*)dst = f32_to_f16(d);
  *(uint16_t*)(dst + 2) = f32_to_f16(mn);
  uint8_t q[32];
  for (int i = 0; i < 32; i++)
    q[i] = (uint8_t)clampi((int)((x[i] - mn) * id + 0.5f), 0, 15);
  for (int i = 0; i < 16; i++) dst[4 + i] = q[i] | (q[16 + i] << 4);
}

void enc_q5_0(const float* x, uint8_t* dst) {  // 22 B
  float amax = 0.f, maxv = 0.f;
  for (int i = 0; i < 32; i++) {
    float ax = std::fabs(x[i]);
    if (ax > amax) {
      amax = ax;
      maxv = x[i];
    }
  }
  float d = maxv / -16.0f;
  float id = d != 0.f ? 1.0f / d : 0.f;
  *(uint16_t*)dst = f32_to_f16(d);
  uint8_t q[32];
  uint32_t qh = 0;
  for (int i = 0; i < 32; i++) {
    q[i] = (uint8_t)clampi((int)(x[i] * id + 16.5f), 0, 31);
    qh |= (uint32_t)((q[i] >> 4) & 1) << i;
  }
  std::memcpy(dst + 2, &qh, 4);
  for (int i = 0; i < 16; i++) dst[6 + i] = (q[i] & 0xF) | ((q[16 + i] & 0xF) << 4);
}

void enc_q5_1(const float* x, uint8_t* dst) {  // 24 B
  float mn = x[0], mx = x[0];
  for (int i = 1; i < 32; i++) {
    mn = std::min(mn, x[i]);
    mx = std::max(mx, x[i]);
  }
  float d = (mx - mn) / 31.0f;
  float id = d != 0.f ? 1.0f / d : 0.f;
  *(uint16_t*)dst = f32_to_f16(d);
  *(uint16_t*)(dst + 2) = f32_to_f16(mn);
  uint8_t q[32];
  uint32_t qh = 0;
  for (int i = 0; i < 32; i++) {
    q[i] = (uint8_t)clampi((int)((x[i] - mn) * id + 0.5f), 0, 31);
    qh |= (uint32_t)((q[i] >> 4) & 1) << i;
  }
  std::memcpy(dst + 4, &qh, 4);
  for (int i = 0; i < 16; i++) dst[8 + i] = (q[i] & 0xF) | ((q[16 + i] & 0xF) << 4);
}

void enc_q8_k(const float* x, uint8_t* dst) {  // 292 B / 256 elems
  float amax = 0.f, maxv = 0.f;
  for (int i = 0; i < 256; i++) {
    float ax = std::fabs(x[i]);
    if (ax > amax) {
      amax = ax;
      maxv = x[i];
    }
  }
  float iscale = amax != 0.f ? -127.0f / maxv : 0.f;
  float d = iscale != 0.f ? 1.0f / iscale : 0.f;
  std::memcpy(dst, &d, 4);
  int8_t* qs = (int8_t*)(dst + 4);
  int16_t* bsums = (int16_t*)(dst + 260);
  for (int g = 0; g < 16; g++) {
    int sum = 0;
    for (int i = 0; i < 16; i++) {
      int q = clampi(nearest_i32(iscale * x[g * 16 + i]), -128, 127);
      qs[g * 16 + i] = (int8_t)q;
      sum += q;
    }
    bsums[g] = (int16_t)sum;
  }
}

// --- K-quant superblock encoders (256 elems each) -------------------------

void enc_q2_k(const float* x, uint8_t* dst) {  // 84 B
  float scales[16], mins[16];
  for (int j = 0; j < 16; j++)
    make_qkx1_quants(3, x + 16 * j, 16, 5, &scales[j], &mins[j]);
  float max_scale = 0.f, max_min = 0.f;
  for (int j = 0; j < 16; j++) {
    max_scale = std::max(max_scale, scales[j]);
    max_min = std::max(max_min, mins[j]);
  }
  uint8_t* bs = dst;  // scales u8[16]
  std::memset(dst, 0, 84);
  float d = 0.f, dmin = 0.f;
  if (max_scale > 0) {
    float isc = 15.0f / max_scale;
    for (int j = 0; j < 16; j++) bs[j] |= (uint8_t)nearest_i32(isc * scales[j]);
    d = f16_round(max_scale / 15.0f);
  }
  if (max_min > 0) {
    float isc = 15.0f / max_min;
    for (int j = 0; j < 16; j++) bs[j] |= (uint8_t)(nearest_i32(isc * mins[j]) << 4);
    dmin = f16_round(max_min / 15.0f);
  }
  uint8_t L[256];
  std::memset(L, 0, 256);
  for (int j = 0; j < 16; j++) {
    float dj = d * (float)(bs[j] & 0xF);
    if (dj == 0.f) continue;
    float dm = dmin * (float)(bs[j] >> 4);
    for (int i = 0; i < 16; i++)
      L[16 * j + i] = (uint8_t)clampi(nearest_i32((x[16 * j + i] + dm) / dj), 0, 3);
  }
  uint8_t* qs = dst + 16;
  for (int half = 0; half < 2; half++)
    for (int i = 0; i < 32; i++)
      qs[half * 32 + i] = L[half * 128 + i] | (L[half * 128 + 32 + i] << 2) |
                          (L[half * 128 + 64 + i] << 4) | (L[half * 128 + 96 + i] << 6);
  *(uint16_t*)(dst + 80) = f32_to_f16(d);
  *(uint16_t*)(dst + 82) = f32_to_f16(dmin);
}

void enc_q3_k(const float* x, uint8_t* dst) {  // 110 B
  std::memset(dst, 0, 110);
  float scales[16];
  for (int j = 0; j < 16; j++) scales[j] = make_q3_quants(4, x + 16 * j, 16);
  float max_scale = 0.f, max_abs = 0.f;
  for (int j = 0; j < 16; j++) {
    float a = std::fabs(scales[j]);
    if (a > max_abs) {
      max_abs = a;
      max_scale = scales[j];
    }
  }
  uint8_t* sfield = dst + 96;
  float d = 0.f;
  if (max_scale != 0.f) {
    float isc = -32.0f / max_scale;
    for (int j = 0; j < 16; j++) {
      int l = clampi(nearest_i32(isc * scales[j]), -32, 31) + 32;
      if (j < 8)
        sfield[j] |= (uint8_t)(l & 0xF);
      else
        sfield[j - 8] |= (uint8_t)((l & 0xF) << 4);
      sfield[8 + j % 4] |= (uint8_t)((l >> 4) << (2 * (j / 4)));
    }
    d = f16_round(1.0f / isc);
  }
  int L[256];
  std::memset(L, 0, sizeof(L));
  for (int j = 0; j < 16; j++) {
    int sc = j < 8 ? (sfield[j] & 0xF) : (sfield[j - 8] >> 4);
    sc = (sc | (((sfield[8 + j % 4] >> (2 * (j / 4))) & 3) << 4)) - 32;
    float dj = d * (float)sc;
    if (dj == 0.f) continue;
    for (int i = 0; i < 16; i++)
      L[16 * j + i] = clampi(nearest_i32(x[16 * j + i] / dj), -4, 3) + 4;
  }
  uint8_t* hm = dst;
  uint8_t* qs = dst + 32;
  for (int e = 0; e < 256; e++) {
    if (L[e] > 3) {
      hm[e % 32] |= (uint8_t)(1u << (e / 32));
      L[e] -= 4;
    }
  }
  for (int half = 0; half < 2; half++)
    for (int i = 0; i < 32; i++)
      qs[half * 32 + i] =
          (uint8_t)(L[half * 128 + i] | (L[half * 128 + 32 + i] << 2) |
                    (L[half * 128 + 64 + i] << 4) | (L[half * 128 + 96 + i] << 6));
  *(uint16_t*)(dst + 108) = f32_to_f16(d);
}

// pack 8 6-bit (scale, min) pairs into 12 bytes (inverse of get_scale_min_k4)
void pack_k4_scales(const uint8_t* ls, const uint8_t* lm, uint8_t* sf) {
  std::memset(sf, 0, 12);
  for (int j = 0; j < 8; j++) {
    int s = ls[j], m = lm[j];
    if (j < 4) {
      sf[j] = (uint8_t)s;
      sf[j + 4] = (uint8_t)m;
    } else {
      sf[j + 4] = (uint8_t)((s & 0xF) | ((m & 0xF) << 4));
      sf[j - 4] |= (uint8_t)((s >> 4) << 6);
      sf[j] |= (uint8_t)((m >> 4) << 6);
    }
  }
}

void enc_q45_k(const float* x, uint8_t* dst, bool q5) {  // 144/176 B
  int nmax = q5 ? 31 : 15;
  float scales[8], mins[8];
  for (int j = 0; j < 8; j++)
    make_qkx1_quants(nmax, x + 32 * j, 32, 5, &scales[j], &mins[j]);
  float max_scale = 0.f, max_min = 0.f;
  for (int j = 0; j < 8; j++) {
    max_scale = std::max(max_scale, scales[j]);
    max_min = std::max(max_min, mins[j]);
  }
  float inv_scale = max_scale > 0 ? 63.0f / max_scale : 0.f;
  float inv_min = max_min > 0 ? 63.0f / max_min : 0.f;
  uint8_t ls[8], lm[8];
  for (int j = 0; j < 8; j++) {
    ls[j] = (uint8_t)std::min(nearest_i32(inv_scale * scales[j]), 63);
    lm[j] = (uint8_t)std::min(nearest_i32(inv_min * mins[j]), 63);
  }
  uint8_t sfield[12];
  pack_k4_scales(ls, lm, sfield);
  float d = f16_round(max_scale / 63.0f);
  float dmin = f16_round(max_min / 63.0f);
  int L[256];
  std::memset(L, 0, sizeof(L));
  for (int j = 0; j < 8; j++) {
    int sc, mn;
    k4_scale_min(sfield, j, &sc, &mn);
    float dj = d * (float)sc;
    if (dj == 0.f) continue;
    float dm = dmin * (float)mn;
    for (int i = 0; i < 32; i++)
      L[32 * j + i] = clampi(nearest_i32((x[32 * j + i] + dm) / dj), 0, nmax);
  }
  *(uint16_t*)dst = f32_to_f16(d);
  *(uint16_t*)(dst + 2) = f32_to_f16(dmin);
  std::memcpy(dst + 4, sfield, 12);
  if (!q5) {
    uint8_t* qs = dst + 16;
    for (int c = 0; c < 4; c++)
      for (int i = 0; i < 32; i++)
        qs[32 * c + i] = (uint8_t)(L[64 * c + i] | (L[64 * c + 32 + i] << 4));
  } else {
    uint8_t* qh = dst + 16;
    uint8_t* ql = dst + 48;
    std::memset(qh, 0, 32);
    for (int c = 0; c < 4; c++)
      for (int i = 0; i < 32; i++) {
        int l1 = L[64 * c + i], l2 = L[64 * c + 32 + i];
        if (l1 > 15) {
          qh[i] |= (uint8_t)(1u << (2 * c));
          l1 -= 16;
        }
        if (l2 > 15) {
          qh[i] |= (uint8_t)(1u << (2 * c + 1));
          l2 -= 16;
        }
        ql[32 * c + i] = (uint8_t)(l1 | (l2 << 4));
      }
  }
}

void enc_q6_k(const float* x, uint8_t* dst) {  // 210 B
  std::memset(dst, 0, 210);
  float scales[16];
  int Lsub[16];
  for (int j = 0; j < 16; j++) scales[j] = make_qx_quants(32, x + 16 * j, 16, Lsub);
  float max_abs = 0.f, max_scale = 0.f;
  for (int j = 0; j < 16; j++) {
    float a = std::fabs(scales[j]);
    if (a > max_abs) {
      max_abs = a;
      max_scale = scales[j];
    }
  }
  if (max_abs == 0.f) return;  // all-zero superblock stays zero
  float iscale = -128.0f / max_scale;
  float d = f16_round(1.0f / iscale);
  int8_t* bs = (int8_t*)(dst + 192);
  for (int j = 0; j < 16; j++)
    bs[j] = (int8_t)std::min(nearest_i32(iscale * scales[j]), 127);
  int L[256];
  std::memset(L, 0, sizeof(L));
  for (int j = 0; j < 16; j++) {
    float dj = d * (float)bs[j];
    if (dj == 0.f) continue;
    for (int i = 0; i < 16; i++)
      L[16 * j + i] = clampi(nearest_i32(x[16 * j + i] / dj), -32, 31) + 32;
  }
  uint8_t* ql = dst;
  uint8_t* qh = dst + 128;
  for (int half = 0; half < 2; half++) {
    const int* Lh = L + 128 * half;
    for (int i = 0; i < 32; i++) {
      int q1 = Lh[i], q2 = Lh[32 + i], q3 = Lh[64 + i], q4 = Lh[96 + i];
      ql[64 * half + i] = (uint8_t)((q1 & 0xF) | ((q3 & 0xF) << 4));
      ql[64 * half + 32 + i] = (uint8_t)((q2 & 0xF) | ((q4 & 0xF) << 4));
      qh[32 * half + i] =
          (uint8_t)((q1 >> 4) | ((q2 >> 4) << 2) | ((q3 >> 4) << 4) | ((q4 >> 4) << 6));
    }
  }
  *(uint16_t*)(dst + 208) = f32_to_f16(d);
}

struct EncInfo {
  int block_elems;
  int block_bytes;
  void (*enc)(const float*, uint8_t*);
};

EncInfo enc_for(int t) {
  switch (t) {
    case 2:  return {32, 18, enc_q4_0};
    case 3:  return {32, 20, enc_q4_1};
    case 6:  return {32, 22, enc_q5_0};
    case 7:  return {32, 24, enc_q5_1};
    case 8:  return {32, 34, enc_q8_0};
    case 9:  return {32, 36, enc_q8_1};
    case 10: return {256, 84, enc_q2_k};
    case 11: return {256, 110, enc_q3_k};
    case 12: return {256, 144, [](const float* x, uint8_t* d) { enc_q45_k(x, d, false); }};
    case 13: return {256, 176, [](const float* x, uint8_t* d) { enc_q45_k(x, d, true); }};
    case 14: return {256, 210, enc_q6_k};
    case 15: return {256, 292, enc_q8_k};  // Q8_K
    default: return {0, 0, nullptr};
  }
}

}  // namespace

extern "C" {

// Repack raw ggml blocks (row-major, m rows of k elements) straight into the
// Pallas kernel plane layout. Returns 0 on success.
//   q0/q1:   (m/TM, kpad/P, TM) u8 planes (q1 null for single-plane schemes)
//   dsub/msub: (m/TM, S, G, TM) f32 or bf16 (msub null unless has_min)
int crabml_repack(int ggml_type, const uint8_t* src, int64_t m, int64_t k,
                  int tk, int n_threads, int scale_is_bf16,
                  uint8_t* q0, uint8_t* q1, void* dsub, void* msub) {
  SchemeInfo s = scheme_for(ggml_type);
  if (!s.decode || m % TM || k % (s.row_bytes_per_k_den == 256 ? 256 : 32))
    return -1;
  int64_t S = (k + tk - 1) / tk;
  int64_t kpad = S * tk;
  int G = tk / s.gr;
  int64_t MT = m / TM;
  int64_t row_bytes = k * s.row_bytes_per_k_num / s.row_bytes_per_k_den;
  uint8_t* qplanes[2] = {q0, q1};

  auto work = [&](int64_t mt0, int64_t mt1) {
    std::vector<int16_t> vals(TM * kpad, 0);
    std::vector<float> drow(TM * (kpad / s.gr), 0.f);
    std::vector<float> mrow;
    if (s.has_min) mrow.assign(TM * (kpad / s.gr), 0.f);
    for (int64_t mt = mt0; mt < mt1; mt++) {
      // decode TM rows (zero-padded tails stay zero)
      if (kpad != k) {
        std::fill(vals.begin(), vals.end(), 0);
        std::fill(drow.begin(), drow.end(), 0.f);
        if (s.has_min) std::fill(mrow.begin(), mrow.end(), 0.f);
      }
      for (int tm = 0; tm < TM; tm++) {
        RowOut o;
        o.vals = vals.data() + (int64_t)tm * kpad;
        o.dsub = drow.data() + (int64_t)tm * (kpad / s.gr);
        o.msub = s.has_min ? mrow.data() + (int64_t)tm * (kpad / s.gr) : nullptr;
        s.decode(src + (mt * TM + tm) * row_bytes, (int)k, o);
      }
      // pack q planes
      int bit_base = 0;
      for (int pi = 0; pi < 2 && s.plane_bits[pi]; pi++) {
        int pbits = s.plane_bits[pi];
        if (pbits == 8) {
          int8_t* out = (int8_t*)qplanes[pi] + mt * kpad * TM;
          for (int64_t kk = 0; kk < kpad; kk++)
            for (int tm = 0; tm < TM; tm++)
              out[kk * TM + tm] = (int8_t)vals[(int64_t)tm * kpad + kk];
          bit_base += 8;
          continue;
        }
        int P = 8 / pbits;
        int TKp = tk / P;
        int mask = (1 << pbits) - 1;
        uint8_t* out = qplanes[pi] + mt * (kpad / P) * TM;
        for (int64_t ss = 0; ss < S; ss++) {
          for (int b = 0; b < TKp; b++) {
            uint8_t* orow = out + (ss * TKp + b) * TM;
            for (int tm = 0; tm < TM; tm++) {
              const int16_t* vrow = vals.data() + (int64_t)tm * kpad + ss * tk;
              unsigned byte = 0;
              for (int p = 0; p < P; p++)
                byte |= (unsigned)(((vrow[p * TKp + b]) >> bit_base) & mask)
                        << (p * pbits);
              orow[tm] = (uint8_t)byte;
            }
          }
        }
        bit_base += pbits;
      }
      // scales: (mt, s, g, tm)
      for (int64_t ss = 0; ss < S; ss++)
        for (int g = 0; g < G; g++)
          for (int tm = 0; tm < TM; tm++) {
            int64_t src_i = (int64_t)tm * (kpad / s.gr) + ss * G + g;
            int64_t dst_i = ((mt * S + ss) * G + g) * TM + tm;
            store_scale(dsub, dst_i, drow[src_i], scale_is_bf16);
            if (s.has_min) store_scale(msub, dst_i, mrow[src_i], scale_is_bf16);
          }
    }
  };

  n_threads = std::max(1, std::min<int>(n_threads, (int)MT));
  if (n_threads == 1) {
    work(0, MT);
  } else {
    std::vector<std::thread> ts;
    int64_t per = (MT + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
      int64_t a = t * per, b = std::min(MT, a + per);
      if (a < b) ts.emplace_back(work, a, b);
    }
    for (auto& th : ts) th.join();
  }
  return 0;
}

// Block-quantize `n` f32 elements into ggml blocks of `ggml_type` — the
// native counterpart of codecs.quantize (reference encoders in buf_*.rs +
// util.rs scale searches). n must be a multiple of the scheme's block size.
// Threaded over block ranges. Returns 0 on success.
int crabml_quantize(int ggml_type, const float* src, int64_t n, uint8_t* dst,
                    int n_threads) {
  EncInfo e = enc_for(ggml_type);
  if (!e.enc || n % e.block_elems) return -1;
  int64_t nb = n / e.block_elems;
  auto work = [&](int64_t b0, int64_t b1) {
    for (int64_t b = b0; b < b1; b++)
      e.enc(src + b * e.block_elems, dst + b * e.block_bytes);
  };
  n_threads = std::max(1, std::min<int>(n_threads, (int)std::min<int64_t>(nb, 64)));
  if (n_threads == 1) {
    work(0, nb);
  } else {
    std::vector<std::thread> ts;
    int64_t per = (nb + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
      int64_t a = t * per, b = std::min(nb, a + per);
      if (a < b) ts.emplace_back(work, a, b);
    }
    for (auto& th : ts) th.join();
  }
  return 0;
}

// Synthesize pseudo-random Gaussian-ish weights (xorshift + Irwin-Hall sum
// of 4 uniforms, std `sigma`) and quantize them straight into ggml blocks —
// lets a full-size (multi-GB) GGUF be constructed without materializing the
// f32 tensor on the Python side. Deterministic in (seed, block index).
int crabml_synth_quantize(int ggml_type, uint64_t seed, int64_t n, float sigma,
                          uint8_t* dst, int n_threads) {
  EncInfo e = enc_for(ggml_type);
  if (!e.enc || n % e.block_elems) return -1;
  int64_t nb = n / e.block_elems;
  auto work = [&](int64_t b0, int64_t b1) {
    std::vector<float> x(e.block_elems);
    for (int64_t b = b0; b < b1; b++) {
      uint64_t s = seed ^ (0x9E3779B97F4A7C15ull * (uint64_t)(b + 1));
      for (int i = 0; i < e.block_elems; i++) {
        // 4 xorshift64* uniforms in [0,1) summed: mean 2, var 1/3
        float acc = 0.f;
        for (int r = 0; r < 4; r++) {
          s ^= s >> 12;
          s ^= s << 25;
          s ^= s >> 27;
          acc += (float)((s * 0x2545F4914F6CDD1Dull) >> 40) * (1.0f / 16777216.0f);
        }
        x[i] = (acc - 2.0f) * (1.7320508f * sigma);  // unit-var, scaled
      }
      e.enc(x.data(), dst + b * e.block_bytes);
    }
  };
  n_threads = std::max(1, std::min<int>(n_threads, (int)std::min<int64_t>(nb, 64)));
  if (n_threads == 1) {
    work(0, nb);
  } else {
    std::vector<std::thread> ts;
    int64_t per = (nb + n_threads - 1) / n_threads;
    for (int t = 0; t < n_threads; t++) {
      int64_t a = t * per, b = std::min(nb, a + per);
      if (a < b) ts.emplace_back(work, a, b);
    }
    for (auto& th : ts) th.join();
  }
  return 0;
}

// Bit-exact f32 dequantization of n rows of k elements (validation path and
// norm-weight loads) — the analogue of each buf_*::dequantize.
int crabml_dequant(int ggml_type, const uint8_t* src, int64_t m, int64_t k,
                   float* dst) {
  SchemeInfo s = scheme_for(ggml_type);
  if (!s.decode) return -1;
  int64_t row_bytes = k * s.row_bytes_per_k_num / s.row_bytes_per_k_den;
  std::vector<int16_t> vals(k);
  std::vector<float> drow(k / s.gr), mrow(s.has_min ? k / s.gr : 0);
  for (int64_t r = 0; r < m; r++) {
    RowOut o{vals.data(), drow.data(), s.has_min ? mrow.data() : nullptr};
    s.decode(src + r * row_bytes, (int)k, o);
    for (int64_t i = 0; i < k; i++) {
      float w = ((float)vals[i] - s.off) * drow[i / s.gr];
      if (s.has_min) w += mrow[i / s.gr];
      dst[r * k + i] = w;
    }
  }
  return 0;
}

// Light-weight GGUF container probe: validates magic/version and returns
// (version, n_tensors, n_kv) — the native analogue of GGUFHeader::decode
// (gguf.rs:521-570). Full metadata parsing stays in Python (small data).
int crabml_gguf_probe(const uint8_t* buf, int64_t len, uint32_t* version,
                      uint64_t* n_tensors, uint64_t* n_kv) {
  if (len < 24) return -1;
  uint32_t magic;
  std::memcpy(&magic, buf, 4);
  if (magic != 0x46554747u) return -2;
  std::memcpy(version, buf + 4, 4);
  if (*version == 1) {
    uint32_t t, kv;
    std::memcpy(&t, buf + 8, 4);
    std::memcpy(&kv, buf + 12, 4);
    *n_tensors = t;
    *n_kv = kv;
  } else {
    std::memcpy(n_tensors, buf + 8, 8);
    std::memcpy(n_kv, buf + 16, 8);
  }
  return 0;
}

}  // extern "C"
