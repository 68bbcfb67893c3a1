// Audio host preprocessing: WAV decode + resample (role of the reference's
// vendored miniaudio, tools/omni/audition.cpp:42) and the Whisper log-mel
// spectrogram (contract of tools/mtmd/mtmd-audio.cpp log_mel_spectrogram,
// mirrored by omni_tpu/omni/audio.py).

#include "omni_native.h"
#include "common.hpp"

#include <algorithm>
#include <cmath>
#include <cstdio>
#include <cstdlib>
#include <vector>

using namespace on;

namespace {

constexpr int SAMPLE_RATE = 16000;
constexpr int N_FFT = 400;
constexpr int HOP = 160;
constexpr int N_BINS = N_FFT / 2 + 1;  // 201

// real DFT over 400 samples with precomputed twiddles (400 is not a
// radix-2 size; a table-driven direct DFT at 201 bins is ~80k MAC per
// frame = trivial at 100 frames/s)
struct DftTables {
    std::vector<float> cosv, sinv;  // [N_BINS][N_FFT]
    std::vector<float> hann;        // [N_FFT]
    DftTables() {
        cosv.resize((size_t)N_BINS * N_FFT);
        sinv.resize((size_t)N_BINS * N_FFT);
        hann.resize(N_FFT);
        for (int j = 0; j < N_FFT; ++j)
            hann[j] = 0.5f * (1.0f - std::cos(2.0 * M_PI * j / N_FFT));
        for (int b = 0; b < N_BINS; ++b)
            for (int j = 0; j < N_FFT; ++j) {
                double a = 2.0 * M_PI * b * j / N_FFT;
                cosv[(size_t)b * N_FFT + j] = (float)std::cos(a);
                sinv[(size_t)b * N_FFT + j] = (float)std::sin(a);
            }
    }
};

const DftTables &tables() {
    static DftTables t;
    return t;
}

}  // namespace

extern "C" {

int on_log_mel(const float *samples, int64_t n_samples,
               const float *mel_filters, int n_mel, int64_t n_frames,
               float *out, int n_threads) {
    if (n_frames <= 0 || n_mel <= 0) return -1;
    const auto &tb = tables();
    const int pad = N_FFT / 2;

    // padded signal: reflect head (samples[1..pad] reversed), zeros tail
    std::vector<float> padded((size_t)(pad + n_samples + pad + N_FFT), 0.0f);
    for (int j = 0; j < pad; ++j) {
        int64_t src = std::min<int64_t>(pad - j, n_samples - 1);
        padded[j] = (src >= 1) ? samples[src] : (n_samples ? samples[0] : 0.0f);
    }
    std::copy(samples, samples + n_samples, padded.begin() + pad);

    parallel_for(n_frames, n_threads, [&](int64_t lo, int64_t hi) {
        std::vector<float> frame(N_FFT), power(N_BINS);
        for (int64_t f = lo; f < hi; ++f) {
            const float *src = padded.data() + f * HOP;
            for (int j = 0; j < N_FFT; ++j) frame[j] = src[j] * tb.hann[j];
            for (int b = 0; b < N_BINS; ++b) {
                const float *cv = tb.cosv.data() + (size_t)b * N_FFT;
                const float *sv = tb.sinv.data() + (size_t)b * N_FFT;
                float re = 0, im = 0;
                for (int j = 0; j < N_FFT; ++j) {
                    re += frame[j] * cv[j];
                    im -= frame[j] * sv[j];
                }
                power[b] = re * re + im * im;
            }
            for (int m = 0; m < n_mel; ++m) {
                const float *w = mel_filters + (size_t)m * N_BINS;
                float acc = 0;
                for (int b = 0; b < N_BINS; ++b) acc += power[b] * w[b];
                out[f * n_mel + m] = std::log10(std::max(acc, 1e-10f));
            }
        }
    });

    // global max-8 floor + (x+4)/4 normalization
    float mx = out[0];
    for (int64_t i = 1; i < n_frames * n_mel; ++i) mx = std::max(mx, out[i]);
    float floor_v = mx - 8.0f;
    for (int64_t i = 0; i < n_frames * n_mel; ++i)
        out[i] = (std::max(out[i], floor_v) + 4.0f) / 4.0f;
    return 0;
}

int on_read_wav_mono_16k(const char *path, float **out, int64_t *n) {
    FILE *f = std::fopen(path, "rb");
    if (!f) return -1;
    auto rd_u32 = [&](uint32_t &v) { return std::fread(&v, 4, 1, f) == 1; };
    auto rd_u16 = [&](uint16_t &v) { return std::fread(&v, 2, 1, f) == 1; };

    uint32_t riff, wave_sz, wave;
    if (!rd_u32(riff) || !rd_u32(wave_sz) || !rd_u32(wave) ||
        riff != 0x46464952u /*RIFF*/ || wave != 0x45564157u /*WAVE*/) {
        std::fclose(f);
        return -2;
    }
    uint16_t fmt = 0, channels = 0, bits = 0;
    uint32_t rate = 0;
    std::vector<uint8_t> data;
    while (true) {
        uint32_t id, sz;
        if (!rd_u32(id) || !rd_u32(sz)) break;
        if (id == 0x20746d66u /*"fmt "*/) {
            uint32_t brate;
            uint16_t balign;
            rd_u16(fmt);
            rd_u16(channels);
            rd_u32(rate);
            rd_u32(brate);
            rd_u16(balign);
            rd_u16(bits);
            if (sz > 16) std::fseek(f, sz - 16, SEEK_CUR);
        } else if (id == 0x61746164u /*"data"*/) {
            data.resize(sz);
            if (std::fread(data.data(), 1, sz, f) != sz) {
                std::fclose(f);
                return -3;
            }
        } else {
            std::fseek(f, (long)(sz + (sz & 1)), SEEK_CUR);
        }
        if (!data.empty() && rate) break;
    }
    std::fclose(f);
    if (data.empty() || !rate || !channels) return -4;

    int64_t n_in = 0;
    std::vector<float> mono;
    auto mix = [&](auto get, int bytes_per) {
        n_in = (int64_t)data.size() / bytes_per / channels;
        mono.resize(n_in);
        for (int64_t i = 0; i < n_in; ++i) {
            float acc = 0;
            for (int c = 0; c < channels; ++c)
                acc += get(data.data() + ((i * channels + c) * bytes_per));
            mono[i] = acc / channels;
        }
    };
    if (fmt == 3 && bits == 32) {
        mix([](const uint8_t *p) { float v; std::memcpy(&v, p, 4); return v; }, 4);
    } else if (fmt == 1 && bits == 16) {
        mix([](const uint8_t *p) {
            int16_t v;
            std::memcpy(&v, p, 2);
            return (float)v / 32768.0f;
        }, 2);
    } else if (fmt == 1 && bits == 32) {
        mix([](const uint8_t *p) {
            int32_t v;
            std::memcpy(&v, p, 4);
            return (float)v / 2147483648.0f;
        }, 4);
    } else if (fmt == 1 && bits == 24) {
        mix([](const uint8_t *p) {
            int32_t v = (int32_t)((uint32_t)p[0] << 8 | (uint32_t)p[1] << 16 |
                                  (uint32_t)p[2] << 24) >> 8;
            return (float)v / 8388608.0f;
        }, 3);
    } else if (fmt == 1 && bits == 8) {
        mix([](const uint8_t *p) { return ((float)*p - 128.0f) / 128.0f; }, 1);
    } else {
        return -5;
    }

    int64_t n_out;
    float *res;
    if ((int)rate == SAMPLE_RATE) {
        n_out = n_in;
        res = (float *)std::malloc((size_t)n_out * 4);
        std::copy(mono.begin(), mono.end(), res);
    } else {
        // linear resample, matching np.interp edge clamping
        n_out = (int64_t)((double)n_in * SAMPLE_RATE / rate);
        res = (float *)std::malloc((size_t)std::max<int64_t>(n_out, 1) * 4);
        double step = (double)rate / SAMPLE_RATE;
        for (int64_t i = 0; i < n_out; ++i) {
            double t = i * step;
            int64_t i0 = (int64_t)t;
            if (i0 >= n_in - 1) {
                res[i] = mono[n_in - 1];
            } else {
                double frac = t - i0;
                res[i] = (float)(mono[i0] * (1.0 - frac) + mono[i0 + 1] * frac);
            }
        }
    }
    *out = res;
    *n = n_out;
    return 0;
}

int on_write_wav(const char *path, const float *samples, int64_t n, int rate) {
    FILE *f = std::fopen(path, "wb");
    if (!f) return -1;
    uint32_t data_sz = (uint32_t)(n * 2);
    uint32_t riff_sz = 36 + data_sz;
    uint16_t u16;
    uint32_t u32;
    std::fwrite("RIFF", 1, 4, f);
    std::fwrite(&riff_sz, 4, 1, f);
    std::fwrite("WAVEfmt ", 1, 8, f);
    u32 = 16; std::fwrite(&u32, 4, 1, f);
    u16 = 1; std::fwrite(&u16, 2, 1, f);   // PCM
    u16 = 1; std::fwrite(&u16, 2, 1, f);   // mono
    u32 = (uint32_t)rate; std::fwrite(&u32, 4, 1, f);
    u32 = (uint32_t)rate * 2; std::fwrite(&u32, 4, 1, f);
    u16 = 2; std::fwrite(&u16, 2, 1, f);
    u16 = 16; std::fwrite(&u16, 2, 1, f);
    std::fwrite("data", 1, 4, f);
    std::fwrite(&data_sz, 4, 1, f);
    for (int64_t i = 0; i < n; ++i) {
        float v = std::min(1.0f, std::max(-1.0f, samples[i]));
        int16_t s = (int16_t)(v * 32767.0f);
        std::fwrite(&s, 2, 1, f);
    }
    std::fclose(f);
    return 0;
}

void on_free(void *p) { std::free(p); }

}  // extern "C"
