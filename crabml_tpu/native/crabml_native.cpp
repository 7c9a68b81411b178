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
