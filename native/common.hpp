// Shared helpers: f16 conversion (bit-exact with numpy's IEEE half) and a
// minimal parallel_for used by the codecs and the repack data loader.
#pragma once

#include <cmath>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace on {

inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;  // +-0
        } else {  // subnormal: value = man * 2^-24; normalize to 1.frac*2^e
            int shift = 0;
            while (!(man & 0x400)) { man <<= 1; ++shift; }
            man &= 0x3FF;
            bits = sign | ((uint32_t)(127 - 14 - shift) << 23) | (man << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000u | (man << 13);  // inf/nan
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float f;
    std::memcpy(&f, &bits, 4);
    return f;
}

inline uint16_t f32_to_f16(float f) {
    // round-to-nearest-even, matching numpy .astype(np.float16)
    uint32_t x;
    std::memcpy(&x, &f, 4);
    uint32_t sign = (x >> 16) & 0x8000u;
    uint32_t absx = x & 0x7FFFFFFFu;
    if (absx >= 0x7F800000u) {  // inf/nan
        uint32_t man = (absx > 0x7F800000u) ? 0x200u : 0;  // quiet nan
        return (uint16_t)(sign | 0x7C00u | man | ((absx >> 13) & 0x3FFu));
    }
    if (absx >= 0x477FF000u) {  // overflow threshold (65520) -> inf
        if (absx > 0x477FEFFFu) return (uint16_t)(sign | 0x7C00u);
    }
    int32_t e = (int32_t)((absx >> 23) & 0xFF) - 127 + 15;
    uint32_t man = absx & 0x7FFFFFu;
    if (e >= 31) return (uint16_t)(sign | 0x7C00u);
    if (e <= 0) {  // subnormal half
        if (e < -10) return (uint16_t)sign;  // underflow to 0
        man |= 0x800000u;
        uint32_t shift = (uint32_t)(14 - e);
        uint32_t half = man >> shift;
        uint32_t rem = man & ((1u << shift) - 1);
        uint32_t halfway = 1u << (shift - 1);
        if (rem > halfway || (rem == halfway && (half & 1))) ++half;
        return (uint16_t)(sign | half);
    }
    uint32_t half = (uint32_t)(e << 10) | (man >> 13);
    uint32_t rem = man & 0x1FFFu;
    if (rem > 0x1000u || (rem == 0x1000u && (half & 1))) ++half;
    return (uint16_t)(sign | half);
}

inline float fp16v(const uint8_t *p) {
    uint16_t h;
    std::memcpy(&h, p, 2);
    return f16_to_f32(h);
}

// numpy-style round half away from zero (ggml roundf semantics)
inline float round_half_away(float x) {
    return x >= 0 ? std::floor(x + 0.5f) : -std::floor(-x + 0.5f);
}

inline float safe_inv(float d) { return d != 0.0f ? 1.0f / d : 0.0f; }

inline void parallel_for(int64_t n, int n_threads,
                         const std::function<void(int64_t, int64_t)> &fn) {
    if (n_threads <= 1 || n < 2) {
        fn(0, n);
        return;
    }
    int nt = (int)std::min<int64_t>(n_threads, n);
    std::vector<std::thread> ts;
    ts.reserve(nt);
    int64_t chunk = (n + nt - 1) / nt;
    for (int t = 0; t < nt; ++t) {
        int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back(fn, lo, hi);
    }
    for (auto &th : ts) th.join();
}

}  // namespace on
