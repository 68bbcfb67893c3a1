// Quantization codecs + TPU SoA repack.
//
// Formats and element orders follow the GGUF on-disk block layouts
// (reference ggml/src/ggml-common.h:219-335, semantics ggml-quants.c);
// the numerics intentionally match omni_tpu/core/quants.py so the two
// implementations validate each other bit-for-bit (dequant + the
// order-independent quantizers).

#include "omni_native.h"
#include "common.hpp"
#include "iq_grids.h"

#include <algorithm>
#include <cmath>

using namespace on;

namespace {

constexpr int QK = 32;    // legacy block
constexpr int QKK = 256;  // K-quant superblock

struct Traits { int block_size; int type_size; };

Traits traits(int t) {
    switch (t) {
        case 0:  return {1, 4};        // F32
        case 1:  return {1, 2};        // F16
        case 2:  return {32, 18};      // Q4_0
        case 3:  return {32, 20};      // Q4_1
        case 6:  return {32, 22};      // Q5_0
        case 7:  return {32, 24};      // Q5_1
        case 8:  return {32, 34};      // Q8_0
        case 10: return {256, 84};     // Q2_K
        case 11: return {256, 110};    // Q3_K
        case 12: return {256, 144};    // Q4_K
        case 13: return {256, 176};    // Q5_K
        case 14: return {256, 210};    // Q6_K
        case 16: return {256, 66};     // IQ2_XXS
        case 17: return {256, 74};     // IQ2_XS
        case 18: return {256, 98};     // IQ3_XXS
        case 19: return {256, 50};     // IQ1_S
        case 20: return {32, 18};      // IQ4_NL
        case 21: return {256, 110};    // IQ3_S
        case 22: return {256, 82};     // IQ2_S
        case 23: return {256, 136};    // IQ4_XS
        case 29: return {256, 56};     // IQ1_M
        case 30: return {1, 2};        // BF16
        case 34: return {256, 54};     // TQ1_0
        case 35: return {256, 66};     // TQ2_0
        case 39: return {32, 17};      // MXFP4
        default: return {0, 0};
    }
}

// ---- get_scale_min_k4 (Q4_K/Q5_K packed 6-bit scales) --------------------
inline void scale_min_k4(const uint8_t *s, uint8_t sc[8], uint8_t mn[8]) {
    for (int j = 0; j < 4; ++j) {
        sc[j] = s[j] & 63;
        mn[j] = s[j + 4] & 63;
        sc[j + 4] = (s[j + 8] & 0x0F) | ((s[j] >> 2) & 0x30);
        mn[j + 4] = (s[j + 8] >> 4) | ((s[j + 4] >> 2) & 0x30);
    }
}

inline void pack_scale_min_k4(const uint8_t sc[8], const uint8_t mn[8],
                              uint8_t *out) {
    for (int j = 0; j < 4; ++j) {
        out[j] = (uint8_t)(sc[j] | ((sc[j + 4] >> 4) << 6));
        out[j + 4] = (uint8_t)(mn[j] | ((mn[j + 4] >> 4) << 6));
        out[j + 8] = (uint8_t)((sc[j + 4] & 0x0F) | ((mn[j + 4] & 0x0F) << 4));
    }
}

// ---- per-block dequantizers (one block -> block_size floats) -------------

void deq_q4_0(const uint8_t *b, float *y) {
    float d = fp16v(b);
    for (int j = 0; j < 16; ++j) {
        y[j] = d * (float)((int)(b[2 + j] & 0xF) - 8);
        y[j + 16] = d * (float)((int)(b[2 + j] >> 4) - 8);
    }
}

void deq_q4_1(const uint8_t *b, float *y) {
    float d = fp16v(b), m = fp16v(b + 2);
    for (int j = 0; j < 16; ++j) {
        y[j] = d * (float)(b[4 + j] & 0xF) + m;
        y[j + 16] = d * (float)(b[4 + j] >> 4) + m;
    }
}

void deq_q5_0(const uint8_t *b, float *y) {
    float d = fp16v(b);
    uint32_t qh;
    std::memcpy(&qh, b + 2, 4);
    for (int j = 0; j < 16; ++j) {
        int lo0 = b[6 + j] & 0xF, lo1 = b[6 + j] >> 4;
        int h0 = (qh >> j) & 1, h1 = (qh >> (j + 16)) & 1;
        y[j] = d * (float)((lo0 | (h0 << 4)) - 16);
        y[j + 16] = d * (float)((lo1 | (h1 << 4)) - 16);
    }
}

void deq_q5_1(const uint8_t *b, float *y) {
    float d = fp16v(b), m = fp16v(b + 2);
    uint32_t qh;
    std::memcpy(&qh, b + 4, 4);
    for (int j = 0; j < 16; ++j) {
        int lo0 = b[8 + j] & 0xF, lo1 = b[8 + j] >> 4;
        int h0 = (qh >> j) & 1, h1 = (qh >> (j + 16)) & 1;
        y[j] = d * (float)(lo0 | (h0 << 4)) + m;
        y[j + 16] = d * (float)(lo1 | (h1 << 4)) + m;
    }
}

void deq_q8_0(const uint8_t *b, float *y) {
    float d = fp16v(b);
    const int8_t *q = (const int8_t *)(b + 2);
    for (int j = 0; j < 32; ++j) y[j] = d * (float)q[j];
}

void deq_q2_k(const uint8_t *b, float *y) {
    const uint8_t *scales = b, *qs = b + 16;
    float d = fp16v(b + 80), dmin = fp16v(b + 82);
    // elems: per 32-byte group g2 (0,1), shifts 0/2/4/6 give 32 elems each
    for (int g2 = 0; g2 < 2; ++g2) {
        for (int s = 0; s < 4; ++s) {
            int base = g2 * 128 + s * 32;
            for (int j = 0; j < 32; ++j) {
                int e = base + j;
                int g16 = e / 16;
                float dl = d * (float)(scales[g16] & 0xF);
                float ml = dmin * (float)(scales[g16] >> 4);
                int q = (qs[g2 * 32 + j] >> (2 * s)) & 3;
                y[e] = dl * (float)q - ml;
            }
        }
    }
}

void unpack_scales_q3k(const uint8_t *s, int8_t sc[16]) {
    uint8_t lo[16], hi[16];
    for (int j = 0; j < 8; ++j) { lo[j] = s[j] & 0xF; lo[j + 8] = s[j] >> 4; }
    for (int sh = 0; sh < 4; ++sh)
        for (int j = 0; j < 4; ++j)
            hi[sh * 4 + j] = (s[8 + j] >> (2 * sh)) & 3;
    for (int j = 0; j < 16; ++j)
        sc[j] = (int8_t)((lo[j] | (hi[j] << 4))) - 32;
}

void deq_q3_k(const uint8_t *b, float *y) {
    const uint8_t *hmask = b, *qs = b + 32;
    int8_t sc[16];
    unpack_scales_q3k(b + 96, sc);
    float d = fp16v(b + 108);
    for (int g2 = 0; g2 < 2; ++g2) {
        for (int s = 0; s < 4; ++s) {
            int base = g2 * 128 + s * 32;
            for (int j = 0; j < 32; ++j) {
                int e = base + j;
                int hbit = (hmask[j] >> (e / 32)) & 1;  // shift index = e/32
                int ql = (qs[g2 * 32 + j] >> (2 * s)) & 3;
                int q = ql - ((hbit ^ 1) << 2);
                y[e] = d * (float)sc[e / 16] * (float)q;
            }
        }
    }
}

void deq_q4_k(const uint8_t *b, float *y) {
    float d = fp16v(b), dmin = fp16v(b + 2);
    uint8_t sc[8], mn[8];
    scale_min_k4(b + 4, sc, mn);
    const uint8_t *qs = b + 16;
    for (int g = 0; g < 4; ++g) {  // 32-byte nibble groups
        for (int j = 0; j < 32; ++j) {
            int e0 = g * 64 + j, e1 = g * 64 + 32 + j;
            uint8_t byte = qs[g * 32 + j];
            float dl0 = d * (float)sc[e0 / 32], ml0 = dmin * (float)mn[e0 / 32];
            float dl1 = d * (float)sc[e1 / 32], ml1 = dmin * (float)mn[e1 / 32];
            y[e0] = dl0 * (float)(byte & 0xF) - ml0;
            y[e1] = dl1 * (float)(byte >> 4) - ml1;
        }
    }
}

void deq_q5_k(const uint8_t *b, float *y) {
    float d = fp16v(b), dmin = fp16v(b + 2);
    uint8_t sc[8], mn[8];
    scale_min_k4(b + 4, sc, mn);
    const uint8_t *qh = b + 16, *qs = b + 48;
    for (int g = 0; g < 4; ++g) {
        for (int j = 0; j < 32; ++j) {
            int e0 = g * 64 + j, e1 = g * 64 + 32 + j;
            uint8_t byte = qs[g * 32 + j];
            int h0 = (qh[j] >> (e0 / 32)) & 1;
            int h1 = (qh[j] >> (e1 / 32)) & 1;
            int q0 = (byte & 0xF) | (h0 << 4);
            int q1 = (byte >> 4) | (h1 << 4);
            y[e0] = d * (float)sc[e0 / 32] * (float)q0 - dmin * (float)mn[e0 / 32];
            y[e1] = d * (float)sc[e1 / 32] * (float)q1 - dmin * (float)mn[e1 / 32];
        }
    }
}

inline int q6k_elem(const uint8_t *ql, const uint8_t *qh, int e) {
    // lo: 64-byte nibble groups; hi: 32-byte groups, shifts 0/2/4/6
    int half = e / 128, r = e % 128;
    uint8_t lo = (r < 64) ? (ql[half * 64 + r] & 0xF) : (ql[half * 64 + r - 64] >> 4);
    int hs = (e % 128) / 32;  // shift index within half
    uint8_t hb = (qh[half * 32 + (e % 32)] >> (2 * hs)) & 3;
    return (int)(lo | (hb << 4)) - 32;
}

void deq_q6_k(const uint8_t *b, float *y) {
    const uint8_t *ql = b, *qh = b + 128;
    const int8_t *scales = (const int8_t *)(b + 192);
    float d = fp16v(b + 208);
    for (int e = 0; e < 256; ++e)
        y[e] = d * (float)scales[e / 16] * (float)q6k_elem(ql, qh, e);
}

// ---- per-block quantizers -------------------------------------------------

void q_q8_0(const float *x, uint8_t *b) {
    float amax = 0;
    for (int j = 0; j < 32; ++j) amax = std::max(amax, std::fabs(x[j]));
    float d = amax / 127.0f;
    uint16_t h = f32_to_f16(d);
    std::memcpy(b, &h, 2);
    float inv = safe_inv(d);
    for (int j = 0; j < 32; ++j)
        ((int8_t *)(b + 2))[j] = (int8_t)round_half_away(x[j] * inv);
}

void q_q4_0(const float *x, uint8_t *b) {
    int im = 0;
    for (int j = 1; j < 32; ++j)
        if (std::fabs(x[j]) > std::fabs(x[im])) im = j;
    float d = x[im] / -8.0f;
    uint16_t h = f32_to_f16(d);
    std::memcpy(b, &h, 2);
    float inv = safe_inv(d);
    uint8_t q[32];
    for (int j = 0; j < 32; ++j) {
        float v = std::trunc(x[j] * inv + 8.5f);
        q[j] = (uint8_t)std::min(15.0f, std::max(0.0f, v));
    }
    for (int j = 0; j < 16; ++j) b[2 + j] = q[j] | (q[j + 16] << 4);
}

void q_q4_1(const float *x, uint8_t *b) {
    float mn = x[0], mx = x[0];
    for (int j = 1; j < 32; ++j) { mn = std::min(mn, x[j]); mx = std::max(mx, x[j]); }
    float d = (mx - mn) / 15.0f;
    uint16_t hd = f32_to_f16(d), hm = f32_to_f16(mn);
    std::memcpy(b, &hd, 2);
    std::memcpy(b + 2, &hm, 2);
    float inv = safe_inv(d);
    uint8_t q[32];
    for (int j = 0; j < 32; ++j) {
        float v = std::trunc((x[j] - mn) * inv + 0.5f);
        q[j] = (uint8_t)std::min(15.0f, std::max(0.0f, v));
    }
    for (int j = 0; j < 16; ++j) b[4 + j] = q[j] | (q[j + 16] << 4);
}

void q_q5_0(const float *x, uint8_t *b) {
    int im = 0;
    for (int j = 1; j < 32; ++j)
        if (std::fabs(x[j]) > std::fabs(x[im])) im = j;
    float d = x[im] / -16.0f;
    uint16_t h = f32_to_f16(d);
    std::memcpy(b, &h, 2);
    float inv = safe_inv(d);
    uint8_t q[32];
    uint32_t qh = 0;
    for (int j = 0; j < 32; ++j) {
        float v = std::trunc(x[j] * inv + 16.5f);
        q[j] = (uint8_t)std::min(31.0f, std::max(0.0f, v));
        qh |= (uint32_t)(q[j] >> 4) << j;
    }
    std::memcpy(b + 2, &qh, 4);
    for (int j = 0; j < 16; ++j)
        b[6 + j] = (q[j] & 0xF) | ((q[j + 16] & 0xF) << 4);
}

void q_q5_1(const float *x, uint8_t *b) {
    float mn = x[0], mx = x[0];
    for (int j = 1; j < 32; ++j) { mn = std::min(mn, x[j]); mx = std::max(mx, x[j]); }
    float d = (mx - mn) / 31.0f;
    uint16_t hd = f32_to_f16(d), hm = f32_to_f16(mn);
    std::memcpy(b, &hd, 2);
    std::memcpy(b + 2, &hm, 2);
    float inv = safe_inv(d);
    uint8_t q[32];
    uint32_t qh = 0;
    for (int j = 0; j < 32; ++j) {
        float v = std::trunc((x[j] - mn) * inv + 0.5f);
        q[j] = (uint8_t)std::min(31.0f, std::max(0.0f, v));
        qh |= (uint32_t)(q[j] >> 4) << j;
    }
    std::memcpy(b + 4, &qh, 4);
    for (int j = 0; j < 16; ++j)
        b[8 + j] = (q[j] & 0xF) | ((q[j + 16] & 0xF) << 4);
}

void q_q2_k(const float *x, uint8_t *b) {
    float scf[16], mf[16];
    for (int g = 0; g < 16; ++g) {
        float mn = 0, mx = x[g * 16];
        mn = std::min(0.0f, x[g * 16]);
        for (int j = 1; j < 16; ++j) {
            mn = std::min(mn, x[g * 16 + j]);
            mx = std::max(mx, x[g * 16 + j]);
        }
        mn = std::min(mn, 0.0f);
        scf[g] = (mx - mn) / 3.0f;
        mf[g] = -mn;
    }
    float dmax = 0, mmax = 0;
    for (int g = 0; g < 16; ++g) { dmax = std::max(dmax, scf[g]); mmax = std::max(mmax, mf[g]); }
    float d = dmax / 15.0f, dmin = mmax / 15.0f;
    float invd = safe_inv(d), invm = safe_inv(dmin);
    uint8_t sc4[16], m4[16];
    for (int g = 0; g < 16; ++g) {
        sc4[g] = (uint8_t)std::min(15.0f, std::max(0.0f, round_half_away(scf[g] * invd)));
        m4[g] = (uint8_t)std::min(15.0f, std::max(0.0f, round_half_away(mf[g] * invm)));
        b[g] = sc4[g] | (m4[g] << 4);
    }
    float d16 = f16_to_f32(f32_to_f16(d)), dm16 = f16_to_f32(f32_to_f16(dmin));
    uint8_t q[256];
    for (int g = 0; g < 16; ++g) {
        float dl = d16 * (float)sc4[g], ml = dm16 * (float)m4[g];
        float inv = safe_inv(dl);
        for (int j = 0; j < 16; ++j) {
            float v = round_half_away((x[g * 16 + j] + ml) * inv);
            q[g * 16 + j] = (uint8_t)std::min(3.0f, std::max(0.0f, v));
        }
    }
    for (int g2 = 0; g2 < 2; ++g2)
        for (int j = 0; j < 32; ++j) {
            uint8_t byte = 0;
            for (int s = 0; s < 4; ++s) byte |= q[g2 * 128 + s * 32 + j] << (2 * s);
            b[16 + g2 * 32 + j] = byte;
        }
    uint16_t hd = f32_to_f16(d), hm = f32_to_f16(dmin);
    std::memcpy(b + 80, &hd, 2);
    std::memcpy(b + 82, &hm, 2);
}

float fit_subblock_scale(const float *xs, int n, int qmin, int qmax) {
    float amax = 0;
    for (int j = 0; j < n; ++j) amax = std::max(amax, std::fabs(xs[j]));
    float s = amax / (float)std::max(-qmin, qmax);
    for (int it = 0; it < 3; ++it) {
        float inv = safe_inv(s);
        float num = 0, den = 0;
        for (int j = 0; j < n; ++j) {
            float q = round_half_away(xs[j] * inv);
            q = std::min((float)qmax, std::max((float)qmin, q));
            num += xs[j] * q;
            den += q * q;
        }
        if (den > 0) s = num / std::max(den, 1e-30f);
    }
    return s;
}

void q_q3_k(const float *x, uint8_t *b) {
    float sf[16];
    for (int g = 0; g < 16; ++g) sf[g] = fit_subblock_scale(x + g * 16, 16, -4, 3);
    float amax = 0;
    for (int g = 0; g < 16; ++g) amax = std::max(amax, std::fabs(sf[g]));
    float d = amax / 31.0f;
    float inv = safe_inv(d);
    int8_t sc[16];
    for (int g = 0; g < 16; ++g) {
        float v = round_half_away(sf[g] * inv);
        sc[g] = (int8_t)std::min(31.0f, std::max(-32.0f, v));
    }
    float d16 = f16_to_f32(f32_to_f16(d));
    uint8_t qp[256];
    for (int g = 0; g < 16; ++g) {
        float dl = d16 * (float)sc[g];
        float invl = safe_inv(dl);
        for (int j = 0; j < 16; ++j) {
            float v = round_half_away(x[g * 16 + j] * invl);
            int q = (int)std::min(3.0f, std::max(-4.0f, v));
            qp[g * 16 + j] = (uint8_t)(q + 4);
        }
    }
    // hmask: bit (e/32) of byte (e%32); set bit = "no subtract"
    for (int j = 0; j < 32; ++j) {
        uint8_t byte = 0;
        for (int sh = 0; sh < 8; ++sh) byte |= ((qp[sh * 32 + j] >> 2) & 1) << sh;
        b[j] = byte;
    }
    for (int g2 = 0; g2 < 2; ++g2)
        for (int j = 0; j < 32; ++j) {
            uint8_t byte = 0;
            for (int s = 0; s < 4; ++s)
                byte |= (qp[g2 * 128 + s * 32 + j] & 3) << (2 * s);
            b[32 + g2 * 32 + j] = byte;
        }
    // pack 16 6-bit signed scales into 12 bytes
    uint8_t u[16];
    for (int g = 0; g < 16; ++g) u[g] = (uint8_t)((int)sc[g] + 32);
    for (int j = 0; j < 8; ++j) b[96 + j] = (u[j] & 0xF) | ((u[j + 8] & 0xF) << 4);
    for (int j = 0; j < 4; ++j) {
        uint8_t byte = 0;
        for (int sh = 0; sh < 4; ++sh) byte |= (u[sh * 4 + j] >> 4) << (2 * sh);
        b[104 + j] = byte;
    }
    uint16_t hd = f32_to_f16(d);
    std::memcpy(b + 108, &hd, 2);
}

void kquant_scale_min(const float *x, int qmax_v, float *dp, float *dminp,
                      uint8_t sc6[8], uint8_t m6[8], uint8_t q[256]) {
    float scf[8], mf[8];
    for (int g = 0; g < 8; ++g) {
        float mn = std::min(0.0f, x[g * 32]), mx = x[g * 32];
        for (int j = 1; j < 32; ++j) {
            mn = std::min(mn, x[g * 32 + j]);
            mx = std::max(mx, x[g * 32 + j]);
        }
        mn = std::min(mn, 0.0f);
        scf[g] = (mx - mn) / (float)qmax_v;
        mf[g] = -mn;
    }
    float dmax = 0, mmax = 0;
    for (int g = 0; g < 8; ++g) { dmax = std::max(dmax, scf[g]); mmax = std::max(mmax, mf[g]); }
    float d = dmax / 63.0f, dmin = mmax / 63.0f;
    float invd = safe_inv(d), invm = safe_inv(dmin);
    for (int g = 0; g < 8; ++g) {
        sc6[g] = (uint8_t)std::min(63.0f, std::max(0.0f, round_half_away(scf[g] * invd)));
        m6[g] = (uint8_t)std::min(63.0f, std::max(0.0f, round_half_away(mf[g] * invm)));
    }
    float d16 = f16_to_f32(f32_to_f16(d)), dm16 = f16_to_f32(f32_to_f16(dmin));
    for (int g = 0; g < 8; ++g) {
        float dl = d16 * (float)sc6[g], ml = dm16 * (float)m6[g];
        float inv = safe_inv(dl);
        for (int j = 0; j < 32; ++j) {
            float v = round_half_away((x[g * 32 + j] + ml) * inv);
            q[g * 32 + j] = (uint8_t)std::min((float)qmax_v, std::max(0.0f, v));
        }
    }
    *dp = d;
    *dminp = dmin;
}

void q_q4_k(const float *x, uint8_t *b) {
    float d, dmin;
    uint8_t sc6[8], m6[8], q[256];
    kquant_scale_min(x, 15, &d, &dmin, sc6, m6, q);
    uint16_t hd = f32_to_f16(d), hm = f32_to_f16(dmin);
    std::memcpy(b, &hd, 2);
    std::memcpy(b + 2, &hm, 2);
    pack_scale_min_k4(sc6, m6, b + 4);
    for (int g = 0; g < 4; ++g)
        for (int j = 0; j < 32; ++j)
            b[16 + g * 32 + j] = q[g * 64 + j] | (q[g * 64 + 32 + j] << 4);
}

void q_q5_k(const float *x, uint8_t *b) {
    float d, dmin;
    uint8_t sc6[8], m6[8], q[256];
    kquant_scale_min(x, 31, &d, &dmin, sc6, m6, q);
    uint16_t hd = f32_to_f16(d), hm = f32_to_f16(dmin);
    std::memcpy(b, &hd, 2);
    std::memcpy(b + 2, &hm, 2);
    pack_scale_min_k4(sc6, m6, b + 4);
    for (int j = 0; j < 32; ++j) {
        uint8_t byte = 0;
        for (int sh = 0; sh < 8; ++sh) byte |= (q[sh * 32 + j] >> 4) << sh;
        b[16 + j] = byte;
    }
    for (int g = 0; g < 4; ++g)
        for (int j = 0; j < 32; ++j)
            b[48 + g * 32 + j] = (q[g * 64 + j] & 0xF) | ((q[g * 64 + 32 + j] & 0xF) << 4);
}

void q_q6_k(const float *x, uint8_t *b) {
    float sf[16];
    for (int g = 0; g < 16; ++g) sf[g] = fit_subblock_scale(x + g * 16, 16, -32, 31);
    float amax = 0;
    for (int g = 0; g < 16; ++g) amax = std::max(amax, std::fabs(sf[g]));
    float d = amax / 127.0f;
    float inv = safe_inv(d);
    int8_t sc[16];
    for (int g = 0; g < 16; ++g) {
        float v = round_half_away(sf[g] * inv);
        sc[g] = (int8_t)std::min(127.0f, std::max(-128.0f, v));
    }
    float d16 = f16_to_f32(f32_to_f16(d));
    uint8_t qp[256];
    for (int g = 0; g < 16; ++g) {
        float dl = d16 * (float)sc[g];
        float invl = safe_inv(dl);
        for (int j = 0; j < 16; ++j) {
            float v = round_half_away(x[g * 16 + j] * invl);
            int q = (int)std::min(31.0f, std::max(-32.0f, v));
            qp[g * 16 + j] = (uint8_t)(q + 32);
        }
    }
    // ql: per 128-half, byte r<64: (elem r lo4) | (elem r+64 lo4)<<4
    for (int half = 0; half < 2; ++half)
        for (int r = 0; r < 64; ++r)
            b[half * 64 + r] = (qp[half * 128 + r] & 0xF) |
                               ((qp[half * 128 + 64 + r] & 0xF) << 4);
    // qh: per 128-half, 32 bytes; shifts 0/2/4/6 <- elem groups of 32
    for (int half = 0; half < 2; ++half)
        for (int j = 0; j < 32; ++j) {
            uint8_t byte = 0;
            for (int s = 0; s < 4; ++s)
                byte |= (qp[half * 128 + s * 32 + j] >> 4) << (2 * s);
            b[128 + half * 32 + j] = byte;
        }
    std::memcpy(b + 192, sc, 16);
    uint16_t hd = f32_to_f16(d);
    std::memcpy(b + 208, &hd, 2);
}

// ---- i-quants (codebook formats; semantics ggml-quants.c:2275-2390) ----

const int8_t IQ4NL_KVALUES[16] = {-127, -104, -83, -65, -49, -35, -22, -10,
                                  1, 13, 25, 38, 53, 69, 89, 113};

inline uint8_t iq_sign8(uint32_t f) {
    // odd-parity completion of the 7-bit sign field (ksigns_iq2xs law)
    uint8_t i = (uint8_t)(f & 127);
    return (uint8_t)(i | ((__builtin_popcount(i) & 1) << 7));
}

void deq_iq4_nl(const uint8_t *b, float *y) {
    float d = fp16v(b);
    const uint8_t *qs = b + 2;
    for (int j = 0; j < 16; ++j) {
        y[j] = d * IQ4NL_KVALUES[qs[j] & 0x0F];
        y[j + 16] = d * IQ4NL_KVALUES[qs[j] >> 4];
    }
}

void deq_iq4_xs(const uint8_t *b, float *y) {
    float d = fp16v(b);
    uint16_t sh;
    std::memcpy(&sh, b + 2, 2);
    const uint8_t *sl = b + 4;
    const uint8_t *qs = b + 8;
    for (int g = 0; g < 8; ++g) {
        int ls = ((sl[g / 2] >> (4 * (g & 1))) & 0x0F) |
                 (((sh >> (2 * g)) & 3) << 4);
        float dl = d * (float)(ls - 32);
        const uint8_t *q = qs + 16 * g;
        for (int j = 0; j < 16; ++j) {
            y[32 * g + j] = dl * IQ4NL_KVALUES[q[j] & 0x0F];
            y[32 * g + j + 16] = dl * IQ4NL_KVALUES[q[j] >> 4];
        }
    }
}

void deq_iq2_xxs(const uint8_t *b, float *y) {
    float d = fp16v(b);
    const uint8_t *q = b + 2;
    for (int g = 0; g < 8; ++g) {
        const uint8_t *a8 = q + 8 * g;  // 4 grid indices
        uint32_t aux;
        std::memcpy(&aux, a8 + 4, 4);  // signs + 4-bit scale
        float db = d * (0.5f + (float)(aux >> 28)) * 0.25f;
        for (int l = 0; l < 4; ++l) {
            uint64_t grid = IQ2XXS_GRID[a8[l]];
            uint8_t signs = iq_sign8(aux >> (7 * l));
            for (int j = 0; j < 8; ++j) {
                float mag = (float)((grid >> (8 * j)) & 0xFF);
                y[32 * g + 8 * l + j] =
                    db * mag * (((signs >> j) & 1) ? -1.f : 1.f);
            }
        }
    }
}

void deq_iq3_xxs(const uint8_t *b, float *y) {
    float d = fp16v(b);
    const uint8_t *qs = b + 2;
    const uint8_t *gas = qs + 64;
    for (int g = 0; g < 8; ++g) {
        uint32_t aux;
        std::memcpy(&aux, gas + 4 * g, 4);
        float db = d * (0.5f + (float)(aux >> 28)) * 0.5f;
        for (int l = 0; l < 4; ++l) {
            uint32_t g1 = IQ3XXS_GRID[qs[8 * g + 2 * l]];
            uint32_t g2 = IQ3XXS_GRID[qs[8 * g + 2 * l + 1]];
            uint8_t signs = iq_sign8(aux >> (7 * l));
            for (int j = 0; j < 4; ++j) {
                y[32 * g + 8 * l + j] = db * (float)((g1 >> (8 * j)) & 0xFF) *
                                        (((signs >> j) & 1) ? -1.f : 1.f);
                y[32 * g + 8 * l + j + 4] =
                    db * (float)((g2 >> (8 * j)) & 0xFF) *
                    (((signs >> (j + 4)) & 1) ? -1.f : 1.f);
            }
        }
    }
}

void deq_iq2_xs(const uint8_t *b, float *y) {
    // per u16 entry: 9-bit iq2xs_grid index + explicit 7-bit sign field;
    // one 4-bit subscale per 16 elements, db = d*(0.5+s)*0.25
    float d = fp16v(b);
    const uint8_t *qsb = b + 2;
    const uint8_t *sc = b + 2 + 64;
    for (int g = 0; g < 16; ++g) {  // 16-element half-groups
        int s = (sc[g / 2] >> (4 * (g & 1))) & 0x0F;
        float db = d * (0.5f + (float)s) * 0.25f;
        for (int l = 0; l < 2; ++l) {
            uint16_t q;
            std::memcpy(&q, qsb + 2 * (2 * g + l), 2);
            uint64_t grid = IQ2XS_GRID[q & 511];
            uint8_t signs = iq_sign8((uint32_t)(q >> 9));
            for (int j = 0; j < 8; ++j) {
                float mag = (float)((grid >> (8 * j)) & 0xFF);
                y[16 * g + 8 * l + j] =
                    db * mag * (((signs >> j) & 1) ? -1.f : 1.f);
            }
        }
    }
}

void deq_iq2_s(const uint8_t *b, float *y) {
    // 10-bit grid indices (2 high bits in qh), EXPLICIT sign bytes,
    // 4-bit subscale per 16 elements: db = d*(0.5+s)*0.25
    float d = fp16v(b);
    const uint8_t *qs = b + 2;
    const uint8_t *sgn = b + 2 + 32;
    const uint8_t *qh = b + 2 + 64;
    const uint8_t *sc = b + 2 + 72;
    for (int e = 0; e < 32; ++e) {  // one grid entry = 8 elements
        int g = e / 4;              // 32-element group (shares a qh byte)
        int half = e / 2;           // 16-element half-group index
        float sub = (sc[half / 2] >> (4 * (half & 1))) & 0x0F;
        float db = d * (0.5f + sub) * 0.25f;
        int idx = qs[e] | (((qh[g] >> (2 * (e & 3))) & 3) << 8);
        uint64_t grid = IQ2S_GRID[idx];
        for (int j = 0; j < 8; ++j) {
            float mag = (float)((grid >> (8 * j)) & 0xFF);
            y[8 * e + j] = db * mag * (((sgn[e] >> j) & 1) ? -1.f : 1.f);
        }
    }
}

void deq_iq3_s(const uint8_t *b, float *y) {
    // 9-bit grid indices (one high bit per entry in qh), explicit sign
    // bytes, 4-bit subscale per 32 elements: db = d*(1+2s)
    float d = fp16v(b);
    const uint8_t *qs = b + 2;
    const uint8_t *qh = b + 2 + 64;
    const uint8_t *sgn = b + 2 + 72;
    const uint8_t *sc = b + 2 + 104;
    for (int e = 0; e < 64; ++e) {  // one grid entry = 4 elements
        int g = e / 8;              // 32-element group
        float sub = (sc[g / 2] >> (4 * (g & 1))) & 0x0F;
        float db = d * (1.0f + 2.0f * sub);
        int idx = qs[e] | (((qh[g] >> (e & 7)) & 1) << 8);
        uint32_t grid = IQ3S_GRID[idx];
        uint8_t sbyte = sgn[e / 2];
        int sbase = 4 * (e & 1);
        for (int j = 0; j < 4; ++j) {
            float mag = (float)((grid >> (8 * j)) & 0xFF);
            y[4 * e + j] = db * mag *
                           (((sbyte >> (sbase + j)) & 1) ? -1.f : 1.f);
        }
    }
}

constexpr float IQ1_DELTA = 0.125f;  // IQ1S_DELTA (shared by IQ1_M)

void deq_iq1_s(const uint8_t *b, float *y) {
    // 11-bit indices into the ternary iq1s_grid; per-32-group 3-bit scale
    // dl = d*(2s+1), signed delta from qh bit 15
    float d = fp16v(b);
    const uint8_t *qs = b + 2;
    for (int g = 0; g < 8; ++g) {  // 32-element groups, one u16 qh each
        uint16_t qh;
        std::memcpy(&qh, b + 2 + 32 + 2 * g, 2);
        float dl = d * (float)(2 * ((qh >> 12) & 7) + 1);
        float delta = (qh & 0x8000) ? -IQ1_DELTA : IQ1_DELTA;
        for (int l = 0; l < 4; ++l) {
            int idx = qs[4 * g + l] | (((qh >> (3 * l)) & 7) << 8);
            uint64_t grid = IQ1S_GRID[idx];
            for (int j = 0; j < 8; ++j) {
                int8_t v = (int8_t)((grid >> (8 * j)) & 0xFF);
                y[32 * g + 8 * l + j] = dl * ((float)v + delta);
            }
        }
    }
}

void deq_iq1_m(const uint8_t *b, float *y) {
    // iq1s_grid indices with 3-bit highs in qh nibbles (nibble bit 3 =
    // delta sign); f16 super-scale scattered over the scale words' top
    // nibbles; 3-bit subscale per 16 elements: dl = d*(2s+1)
    const uint8_t *qs = b;
    const uint8_t *qh = b + 32;
    uint16_t sw[4];
    std::memcpy(sw, b + 48, 8);
    uint16_t d16 = (uint16_t)(((sw[0] & 0xF000) >> 12) |
                              ((sw[1] & 0xF000) >> 8) |
                              ((sw[2] & 0xF000) >> 4) |
                              (sw[3] & 0xF000));
    float d = fp16v((const uint8_t *)&d16);
    for (int e = 0; e < 32; ++e) {  // one grid entry = 8 elements
        int half = e / 2;           // 16-element half-group
        int sub = (sw[half / 4] >> (3 * (half & 3))) & 7;
        float dl = d * (float)(2 * sub + 1);
        uint8_t nib = (qh[e / 2] >> (4 * (e & 1))) & 0x0F;
        float delta = (nib & 0x08) ? -IQ1_DELTA : IQ1_DELTA;
        int idx = qs[e] | ((nib & 7) << 8);
        uint64_t grid = IQ1S_GRID[idx];
        for (int j = 0; j < 8; ++j) {
            int8_t v = (int8_t)((grid >> (8 * j)) & 0xFF);
            y[8 * e + j] = dl * ((float)v + delta);
        }
    }
}

// TQ1_0: 5 trits per byte base 3; trit_k = ((q*3^k mod 256)*3)>>8 - 1
void deq_tq1_0(const uint8_t *b, float *y) {
    const uint8_t *qs = b;           // 48 base-243 bytes
    const uint8_t *qh = b + 48;      // 4 bytes, 4 trits each
    float d = fp16v(b + 52);
    static const uint8_t pow3[5] = {1, 3, 9, 27, 81};
    int o = 0;
    for (int k = 0; k < 5; ++k)      // planes of 32 over qs[0..31]
        for (int j = 0; j < 32; ++j)
            y[o++] = d * (float)((int)(((uint16_t)(uint8_t)(qs[j] * pow3[k]) * 3) >> 8) - 1);
    for (int k = 0; k < 5; ++k)      // planes of 16 over qs[32..47]
        for (int j = 0; j < 16; ++j)
            y[o++] = d * (float)((int)(((uint16_t)(uint8_t)(qs[32 + j] * pow3[k]) * 3) >> 8) - 1);
    for (int k = 0; k < 4; ++k)      // planes of 4 over qh
        for (int j = 0; j < 4; ++j)
            y[o++] = d * (float)((int)(((uint16_t)(uint8_t)(qh[j] * pow3[k]) * 3) >> 8) - 1);
}

// TQ2_0: 4 trits per byte as 2-bit fields (0..2 -> -1..1), planes of 32
void deq_tq2_0(const uint8_t *b, float *y) {
    const uint8_t *qs = b;
    float d = fp16v(b + 64);
    int o = 0;
    for (int g = 0; g < 2; ++g)
        for (int k = 0; k < 4; ++k)
            for (int j = 0; j < 32; ++j)
                y[o++] = d * (float)(((qs[32 * g + j] >> (2 * k)) & 3) - 1);
}

// MXFP4: e8m0 scale byte + 32 nibble-packed e2m1 values (pre-doubled
// codebook, scale = 2^(e-127)/2 — ggml_e8m0_to_fp32_half convention)
static const float MXFP4_KVALUES[16] = {0, 1, 2, 3, 4, 6, 8, 12,
                                        0, -1, -2, -3, -4, -6, -8, -12};

void deq_mxfp4(const uint8_t *b, float *y) {
    uint32_t e = b[0], bits;
    bits = e < 2 ? (0x00200000u << e) : ((e - 1u) << 23);
    float d;
    std::memcpy(&d, &bits, 4);
    const uint8_t *qs = b + 1;
    for (int j = 0; j < 16; ++j) {
        y[j] = d * MXFP4_KVALUES[qs[j] & 0x0F];
        y[j + 16] = d * MXFP4_KVALUES[qs[j] >> 4];
    }
}

void q_tq1_0(const float *x, uint8_t *b) {
    float amax = 0;
    for (int j = 0; j < 256; ++j) amax = std::max(amax, std::fabs(x[j]));
    float inv = safe_inv(amax);
    uint8_t t[256];
    for (int j = 0; j < 256; ++j)
        t[j] = (uint8_t)((int8_t)round_half_away(x[j] * inv) + 1);
    static const uint16_t p5[5] = {81, 27, 9, 3, 1};
    for (int j = 0; j < 32; ++j) {
        uint16_t acc = 0;
        for (int k = 0; k < 5; ++k) acc += t[32 * k + j] * p5[k];
        b[j] = (uint8_t)((acc * 256 + 242) / 243);
    }
    for (int j = 0; j < 16; ++j) {
        uint16_t acc = 0;
        for (int k = 0; k < 5; ++k) acc += t[160 + 16 * k + j] * p5[k];
        b[32 + j] = (uint8_t)((acc * 256 + 242) / 243);
    }
    for (int j = 0; j < 4; ++j) {
        uint16_t acc = 0;
        for (int k = 0; k < 4; ++k) acc += t[240 + 4 * k + j] * p5[k];
        b[48 + j] = (uint8_t)((acc * 256 + 242) / 243);
    }
    uint16_t h = f32_to_f16(amax);
    std::memcpy(b + 52, &h, 2);
}

void q_tq2_0(const float *x, uint8_t *b) {
    float amax = 0;
    for (int j = 0; j < 256; ++j) amax = std::max(amax, std::fabs(x[j]));
    float inv = safe_inv(amax);
    for (int g = 0; g < 2; ++g)
        for (int j = 0; j < 32; ++j) {
            uint8_t byte = 0;
            for (int k = 0; k < 4; ++k) {
                uint8_t t = (uint8_t)((int8_t)round_half_away(
                                          x[(4 * g + k) * 32 + j] * inv) + 1);
                byte |= (uint8_t)(t << (2 * k));
            }
            b[32 * g + j] = byte;
        }
    uint16_t h = f32_to_f16(amax);
    std::memcpy(b + 64, &h, 2);
}

void q_mxfp4(const float *x, uint8_t *b) {
    float amax = 0;
    for (int j = 0; j < 32; ++j) amax = std::max(amax, std::fabs(x[j]));
    uint8_t e = amax > 0
        ? (uint8_t)(int)(std::floor(std::log2(amax)) - 2.0f + 127.0f) : 0;
    uint32_t bits = e < 2 ? (0x00200000u << e) : ((uint32_t)(e - 1u) << 23);
    float d;
    std::memcpy(&d, &bits, 4);
    uint8_t q[32];
    for (int j = 0; j < 32; ++j) {
        float best = std::fabs(d * MXFP4_KVALUES[0] - x[j]);
        int bi = 0;
        for (int k = 1; k < 16; ++k) {
            float err = std::fabs(d * MXFP4_KVALUES[k] - x[j]);
            if (err < best) { best = err; bi = k; }
        }
        q[j] = (uint8_t)bi;
    }
    b[0] = e;
    for (int j = 0; j < 16; ++j) b[1 + j] = q[j] | (uint8_t)(q[16 + j] << 4);
}

using DeqFn = void (*)(const uint8_t *, float *);
using QFn = void (*)(const float *, uint8_t *);

DeqFn deq_fn(int t) {
    switch (t) {
        case 2: return deq_q4_0;
        case 3: return deq_q4_1;
        case 6: return deq_q5_0;
        case 7: return deq_q5_1;
        case 8: return deq_q8_0;
        case 10: return deq_q2_k;
        case 11: return deq_q3_k;
        case 12: return deq_q4_k;
        case 13: return deq_q5_k;
        case 14: return deq_q6_k;
        case 16: return deq_iq2_xxs;
        case 17: return deq_iq2_xs;
        case 18: return deq_iq3_xxs;
        case 19: return deq_iq1_s;
        case 20: return deq_iq4_nl;
        case 21: return deq_iq3_s;
        case 22: return deq_iq2_s;
        case 23: return deq_iq4_xs;
        case 29: return deq_iq1_m;
        case 34: return deq_tq1_0;
        case 35: return deq_tq2_0;
        case 39: return deq_mxfp4;
        default: return nullptr;
    }
}

QFn q_fn(int t) {
    switch (t) {
        case 2: return q_q4_0;
        case 3: return q_q4_1;
        case 6: return q_q5_0;
        case 7: return q_q5_1;
        case 8: return q_q8_0;
        case 10: return q_q2_k;
        case 11: return q_q3_k;
        case 12: return q_q4_k;
        case 13: return q_q5_k;
        case 14: return q_q6_k;
        case 34: return q_tq1_0;
        case 35: return q_tq2_0;
        case 39: return q_mxfp4;
        default: return nullptr;
    }
}

}  // namespace

extern "C" {

int on_version(void) { return 1; }

int on_dequantize(int t, const uint8_t *blocks, int64_t n_elems, float *out,
                  int n_threads) {
    if (t == 0) {  // F32
        std::memcpy(out, blocks, (size_t)n_elems * 4);
        return 0;
    }
    if (t == 1) {  // F16
        parallel_for(n_elems, n_threads, [&](int64_t lo, int64_t hi) {
            for (int64_t i = lo; i < hi; ++i) out[i] = fp16v(blocks + 2 * i);
        });
        return 0;
    }
    if (t == 30) {  // BF16
        parallel_for(n_elems, n_threads, [&](int64_t lo, int64_t hi) {
            for (int64_t i = lo; i < hi; ++i) {
                uint16_t h;
                std::memcpy(&h, blocks + 2 * i, 2);
                uint32_t bits = (uint32_t)h << 16;
                std::memcpy(out + i, &bits, 4);
            }
        });
        return 0;
    }
    Traits tr = traits(t);
    DeqFn fn = deq_fn(t);
    if (!fn || tr.block_size == 0 || n_elems % tr.block_size) return -1;
    int64_t nb = n_elems / tr.block_size;
    parallel_for(nb, n_threads, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i)
            fn(blocks + i * tr.type_size, out + i * tr.block_size);
    });
    return 0;
}

int on_quantize(int t, const float *x, int64_t n_elems, uint8_t *out,
                int n_threads) {
    if (t == 0) {
        std::memcpy(out, x, (size_t)n_elems * 4);
        return 0;
    }
    if (t == 1) {
        parallel_for(n_elems, n_threads, [&](int64_t lo, int64_t hi) {
            for (int64_t i = lo; i < hi; ++i) {
                uint16_t h = f32_to_f16(x[i]);
                std::memcpy(out + 2 * i, &h, 2);
            }
        });
        return 0;
    }
    Traits tr = traits(t);
    QFn fn = q_fn(t);
    if (!fn || tr.block_size == 0 || n_elems % tr.block_size) return -1;
    int64_t nb = n_elems / tr.block_size;
    parallel_for(nb, n_threads, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i)
            fn(x + i * tr.block_size, out + i * tr.type_size);
    });
    return 0;
}

// ---- repack: planes are [k', n] row-major with row stride n ---------------

int on_repack_q8_0(const uint8_t *blocks, int64_t n, int64_t k, int8_t *q,
                   float *d, int n_threads) {
    if (k % 32) return -1;
    int64_t nb = k / 32;  // blocks per row
    parallel_for(n, n_threads, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            const uint8_t *row = blocks + i * nb * 34;
            for (int64_t b = 0; b < nb; ++b) {
                const uint8_t *blk = row + b * 34;
                d[b * n + i] = fp16v(blk);
                const int8_t *src = (const int8_t *)(blk + 2);
                for (int j = 0; j < 32; ++j) q[(b * 32 + j) * n + i] = src[j];
            }
        }
    });
    return 0;
}

int on_repack_q4_k(const uint8_t *blocks, int64_t n, int64_t k, uint8_t *q,
                   int8_t *sc, int8_t *mn, float *d, float *dm,
                   int n_threads) {
    if (k % 256) return -1;
    int64_t nsb = k / 256;
    parallel_for(n, n_threads, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            const uint8_t *row = blocks + i * nsb * 144;
            for (int64_t s = 0; s < nsb; ++s) {
                const uint8_t *blk = row + s * 144;
                d[s * n + i] = fp16v(blk);
                dm[s * n + i] = fp16v(blk + 2);
                uint8_t s8[8], m8[8];
                scale_min_k4(blk + 4, s8, m8);
                for (int g = 0; g < 8; ++g) {
                    sc[(s * 8 + g) * n + i] = (int8_t)s8[g];
                    mn[(s * 8 + g) * n + i] = (int8_t)m8[g];
                }
                // unpack to element order then re-pack superblock halves:
                // plane byte r (0..127) = elem r lo-nibble | elem r+128 hi
                uint8_t e[256];
                const uint8_t *qs = blk + 16;
                for (int g = 0; g < 4; ++g)
                    for (int j = 0; j < 32; ++j) {
                        e[g * 64 + j] = qs[g * 32 + j] & 0xF;
                        e[g * 64 + 32 + j] = qs[g * 32 + j] >> 4;
                    }
                for (int r = 0; r < 128; ++r)
                    q[(s * 128 + r) * n + i] = e[r] | (e[128 + r] << 4);
            }
        }
    });
    return 0;
}

int on_repack_q5_k(const uint8_t *blocks, int64_t n, int64_t k, uint8_t *q,
                   int8_t *sc, int8_t *mn, float *d, float *dm, uint8_t *qh,
                   int n_threads) {
    if (k % 256) return -1;
    int64_t nsb = k / 256;
    parallel_for(n, n_threads, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            const uint8_t *row = blocks + i * nsb * 176;
            for (int64_t s = 0; s < nsb; ++s) {
                const uint8_t *blk = row + s * 176;
                d[s * n + i] = fp16v(blk);
                dm[s * n + i] = fp16v(blk + 2);
                uint8_t s8[8], m8[8];
                scale_min_k4(blk + 4, s8, m8);
                for (int g = 0; g < 8; ++g) {
                    sc[(s * 8 + g) * n + i] = (int8_t)s8[g];
                    mn[(s * 8 + g) * n + i] = (int8_t)m8[g];
                }
                const uint8_t *qhb = blk + 16, *qs = blk + 48;
                uint8_t e[256], hbit[256];
                for (int g = 0; g < 4; ++g)
                    for (int j = 0; j < 32; ++j) {
                        int e0 = g * 64 + j, e1 = g * 64 + 32 + j;
                        e[e0] = qs[g * 32 + j] & 0xF;
                        e[e1] = qs[g * 32 + j] >> 4;
                        hbit[e0] = (qhb[j] >> (e0 / 32)) & 1;
                        hbit[e1] = (qhb[j] >> (e1 / 32)) & 1;
                    }
                for (int r = 0; r < 128; ++r)
                    q[(s * 128 + r) * n + i] = e[r] | (e[128 + r] << 4);
                // qh plane: byte j of the row covers elems 8j..8j+7, bit b
                // = elem 8j+b (little bitorder), original element order
                for (int j = 0; j < 32; ++j) {
                    uint8_t byte = 0;
                    for (int bb = 0; bb < 8; ++bb)
                        byte |= hbit[j * 8 + bb] << bb;
                    qh[(s * 32 + j) * n + i] = byte;
                }
            }
        }
    });
    return 0;
}

// legacy 32-block nibble formats share the superblock-half q packing with
// Q4_K: plane byte r of superblock s = elem r lo-nibble | elem r+128 hi
static void pack_sb_halves(const uint8_t *e, int64_t s, int64_t n,
                           int64_t i, uint8_t *q) {
    for (int r = 0; r < 128; ++r)
        q[(s * 128 + r) * n + i] = e[r] | (e[128 + r] << 4);
}

int on_repack_q4_01(int t, const uint8_t *blocks, int64_t n, int64_t k,
                    uint8_t *q, float *d, float *m, int n_threads) {
    // t: 2 = Q4_0 (d only), 3 = Q4_1 (d + m)
    const int ts = t == 2 ? 18 : 20;
    const int off = t == 2 ? 2 : 4;
    if (k % 256) return -1;
    int64_t nb = k / 32, nsb = k / 256;
    parallel_for(n, n_threads, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            const uint8_t *row = blocks + i * nb * ts;
            for (int64_t b = 0; b < nb; ++b) {
                const uint8_t *blk = row + b * ts;
                d[b * n + i] = fp16v(blk);
                if (m) m[b * n + i] = fp16v(blk + 2);
            }
            for (int64_t s = 0; s < nsb; ++s) {
                uint8_t e[256];
                for (int g = 0; g < 8; ++g) {
                    const uint8_t *qs = row + (s * 8 + g) * ts + off;
                    for (int j = 0; j < 16; ++j) {
                        e[g * 32 + j] = qs[j] & 0xF;
                        e[g * 32 + 16 + j] = qs[j] >> 4;
                    }
                }
                pack_sb_halves(e, s, n, i, q);
            }
        }
    });
    return 0;
}

int on_repack_q5_01(int t, const uint8_t *blocks, int64_t n, int64_t k,
                    uint8_t *q, uint8_t *qh, float *d, float *m,
                    int n_threads) {
    // t: 6 = Q5_0 (d only), 7 = Q5_1 (d + m)
    const int ts = t == 6 ? 22 : 24;
    const int off = t == 6 ? 2 : 4;  // offset of the qh u32
    if (k % 256) return -1;
    int64_t nb = k / 32, nsb = k / 256;
    parallel_for(n, n_threads, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            const uint8_t *row = blocks + i * nb * ts;
            for (int64_t b = 0; b < nb; ++b) {
                const uint8_t *blk = row + b * ts;
                d[b * n + i] = fp16v(blk);
                if (m) m[b * n + i] = fp16v(blk + 2);
            }
            for (int64_t s = 0; s < nsb; ++s) {
                uint8_t e[256], hbit[256];
                for (int g = 0; g < 8; ++g) {
                    const uint8_t *blk = row + (s * 8 + g) * ts;
                    uint32_t bits;
                    std::memcpy(&bits, blk + off, 4);
                    const uint8_t *qs = blk + off + 4;
                    for (int j = 0; j < 16; ++j) {
                        e[g * 32 + j] = qs[j] & 0xF;
                        e[g * 32 + 16 + j] = qs[j] >> 4;
                        hbit[g * 32 + j] = (bits >> j) & 1;
                        hbit[g * 32 + 16 + j] = (bits >> (16 + j)) & 1;
                    }
                }
                pack_sb_halves(e, s, n, i, q);
                for (int j = 0; j < 32; ++j) {
                    uint8_t byte = 0;
                    for (int bb = 0; bb < 8; ++bb)
                        byte |= hbit[j * 8 + bb] << bb;
                    qh[(s * 32 + j) * n + i] = byte;
                }
            }
        }
    });
    return 0;
}

int on_repack_i8_plane(int t, const uint8_t *blocks, int64_t n, int64_t k,
                       int8_t *q, float *d, int n_threads) {
    // int8 VALUE-plane formats: 20 = IQ4_NL (codebook applied), 39 = MXFP4
    const int ts = t == 20 ? 18 : 17;
    if (k % 32) return -1;
    int64_t nb = k / 32;
    parallel_for(n, n_threads, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            const uint8_t *row = blocks + i * nb * ts;
            for (int64_t b = 0; b < nb; ++b) {
                const uint8_t *blk = row + b * ts;
                const uint8_t *qs;
                if (t == 20) {
                    d[b * n + i] = fp16v(blk);
                    qs = blk + 2;
                    for (int j = 0; j < 16; ++j) {
                        q[(b * 32 + j) * n + i] = IQ4NL_KVALUES[qs[j] & 0xF];
                        q[(b * 32 + 16 + j) * n + i] =
                            IQ4NL_KVALUES[qs[j] >> 4];
                    }
                } else {
                    uint32_t e = blk[0];
                    uint32_t bits = e < 2 ? (0x00200000u << e)
                                          : ((e - 1u) << 23);
                    std::memcpy(d + b * n + i, &bits, 4);
                    qs = blk + 1;
                    for (int j = 0; j < 16; ++j) {
                        q[(b * 32 + j) * n + i] =
                            (int8_t)MXFP4_KVALUES[qs[j] & 0xF];
                        q[(b * 32 + 16 + j) * n + i] =
                            (int8_t)MXFP4_KVALUES[qs[j] >> 4];
                    }
                }
            }
        }
    });
    return 0;
}

int on_repack_iq4_xs(const uint8_t *blocks, int64_t n, int64_t k, int8_t *q,
                     int8_t *sc, float *d, int n_threads) {
    if (k % 256) return -1;
    int64_t nsb = k / 256;
    const int ts = 136;  // 2 d + 2 scales_h + 4 scales_l + 128 qs
    parallel_for(n, n_threads, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            const uint8_t *row = blocks + i * nsb * ts;
            for (int64_t s = 0; s < nsb; ++s) {
                const uint8_t *blk = row + s * ts;
                d[s * n + i] = fp16v(blk);
                uint16_t sh;
                std::memcpy(&sh, blk + 2, 2);
                const uint8_t *sl = blk + 4;
                for (int g = 0; g < 8; ++g) {
                    int lo4 = (g & 1) ? (sl[g >> 1] >> 4)
                                      : (sl[g >> 1] & 0xF);
                    int hi2 = (sh >> (2 * g)) & 3;
                    sc[(s * 8 + g) * n + i] =
                        (int8_t)((lo4 | (hi2 << 4)) - 32);
                }
                const uint8_t *qs = blk + 8;
                for (int g = 0; g < 8; ++g)
                    for (int j = 0; j < 16; ++j) {
                        q[(s * 256 + g * 32 + j) * n + i] =
                            IQ4NL_KVALUES[qs[g * 16 + j] & 0xF];
                        q[(s * 256 + g * 32 + 16 + j) * n + i] =
                            IQ4NL_KVALUES[qs[g * 16 + j] >> 4];
                    }
            }
        }
    });
    return 0;
}

// Q2_K: packed 2-bit superblock-local quarter plane + per-16 scale/min
// (kernels/qformats.py _pack_sb_quarters layout)
int on_repack_q2_k(const uint8_t *blocks, int64_t n, int64_t k, uint8_t *q,
                   int8_t *sc, int8_t *mn, float *d, float *dm,
                   int n_threads) {
    if (k % 256) return -1;
    int64_t nsb = k / 256;
    const int ts = 84;  // 16 scales + 64 qs + 2 d + 2 dmin
    parallel_for(n, n_threads, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            const uint8_t *row = blocks + i * nsb * ts;
            for (int64_t s = 0; s < nsb; ++s) {
                const uint8_t *blk = row + s * ts;
                const uint8_t *qs = blk + 16;
                d[s * n + i] = fp16v(blk + 80);
                dm[s * n + i] = fp16v(blk + 82);
                for (int g = 0; g < 16; ++g) {
                    sc[(s * 16 + g) * n + i] = (int8_t)(blk[g] & 0xF);
                    mn[(s * 16 + g) * n + i] = (int8_t)(blk[g] >> 4);
                }
                for (int r = 0; r < 64; ++r) {
                    uint8_t byte = 0;
                    for (int j = 0; j < 4; ++j) {
                        int e = j * 64 + r;  // quarter j, row r
                        int c = e / 128, si = (e % 128) / 32, jj = e % 32;
                        byte |= (uint8_t)(((qs[c * 32 + jj] >> (2 * si)) & 3)
                                          << (2 * j));
                    }
                    q[(s * 64 + r) * n + i] = byte;
                }
            }
        }
    });
    return 0;
}

// Q3_K: (q+4) as a 2-bit quarter plane + Q5_K-style high-bit plane;
// 6-bit signed scales unpacked to int8 (per-16 groups)
int on_repack_q3_k(const uint8_t *blocks, int64_t n, int64_t k, uint8_t *q,
                   int8_t *sc, uint8_t *qh, float *d, int n_threads) {
    if (k % 256) return -1;
    int64_t nsb = k / 256;
    const int ts = 110;  // 32 hmask + 64 qs + 12 scales + 2 d
    parallel_for(n, n_threads, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            const uint8_t *row = blocks + i * nsb * ts;
            for (int64_t s = 0; s < nsb; ++s) {
                const uint8_t *blk = row + s * ts;
                const uint8_t *hm = blk, *qs = blk + 32, *scl = blk + 96;
                d[s * n + i] = fp16v(blk + 108);
                for (int g = 0; g < 16; ++g) {
                    int lo4 = (scl[g % 8] >> (4 * (g / 8))) & 0xF;
                    int hi2 = (scl[8 + (g % 4)] >> (2 * (g / 4))) & 3;
                    sc[(s * 16 + g) * n + i] =
                        (int8_t)((lo4 | (hi2 << 4)) - 32);
                }
                uint8_t qplus[256];
                for (int e = 0; e < 256; ++e) {
                    int c = e / 128, si = (e % 128) / 32, jj = e % 32;
                    uint8_t ql = (qs[c * 32 + jj] >> (2 * si)) & 3;
                    uint8_t h = (hm[e % 32] >> (e / 32)) & 1;
                    qplus[e] = ql + (uint8_t)(h << 2);
                }
                for (int r = 0; r < 64; ++r) {
                    uint8_t byte = 0;
                    for (int j = 0; j < 4; ++j)
                        byte |= (uint8_t)((qplus[j * 64 + r] & 3) << (2 * j));
                    q[(s * 64 + r) * n + i] = byte;
                }
                for (int t_ = 0; t_ < 32; ++t_) {
                    uint8_t byte = 0;
                    for (int b_ = 0; b_ < 8; ++b_)
                        byte |= (uint8_t)((qplus[t_ * 8 + b_] >> 2) << b_);
                    qh[(s * 32 + t_) * n + i] = byte;
                }
            }
        }
    });
    return 0;
}

int on_repack_q6_k(const uint8_t *blocks, int64_t n, int64_t k, int8_t *q,
                   int8_t *sc, float *d, int n_threads) {
    if (k % 256) return -1;
    int64_t nsb = k / 256;
    parallel_for(n, n_threads, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; ++i) {
            const uint8_t *row = blocks + i * nsb * 210;
            for (int64_t s = 0; s < nsb; ++s) {
                const uint8_t *blk = row + s * 210;
                d[s * n + i] = fp16v(blk + 208);
                const int8_t *scales = (const int8_t *)(blk + 192);
                for (int g = 0; g < 16; ++g) sc[(s * 16 + g) * n + i] = scales[g];
                for (int e = 0; e < 256; ++e)
                    q[(s * 256 + e) * n + i] =
                        (int8_t)q6k_elem(blk, blk + 128, e);
            }
        }
    });
    return 0;
}

}  // extern "C"
