/* omni_native: TPU-host native runtime layer (C API, ctypes-consumed).
 *
 * Plays the role the reference implements natively in C/C++ for its host
 * runtime (see SURVEY.md §2.1): the GGUF data loader (mmap + tensor
 * directory, reference ggml/src/gguf.cpp + src/llama-mmap.cpp), the
 * quantization codecs (reference ggml/src/ggml-quants.c), the load-time
 * repack into the TPU SoA planes consumed by the Pallas kernels, and the
 * audio host-preprocessing (WAV decode + Whisper log-mel, reference
 * vendor/miniaudio.h + tools/mtmd/mtmd-audio.cpp).
 *
 * All functions return 0 on success, negative on error, and are
 * deterministic: bit-exact with the Python/numpy reference codecs in
 * omni_tpu.core.quants (order-independent formats) — tested side by side.
 */

#ifndef OMNI_NATIVE_H
#define OMNI_NATIVE_H

#include <stdint.h>
#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

#define ON_API __attribute__((visibility("default")))

/* ---- version / capability ------------------------------------------- */
ON_API int on_version(void);

/* ---- quant codecs ----------------------------------------------------
 * ggml_type uses the GGUF enum (F32=0, F16=1, Q4_0=2, ..., Q6_K=14).
 * blocks: raw block bytes; n_elems must be a multiple of the block size.
 */
ON_API int on_dequantize(int ggml_type, const uint8_t *blocks,
                         int64_t n_elems, float *out, int n_threads);
ON_API int on_quantize(int ggml_type, const float *x, int64_t n_elems,
                       uint8_t *out, int n_threads);

/* ---- TPU SoA repack ---------------------------------------------------
 * Input: GGUF block bytes of a [n, k] row-major weight.
 * Output planes are K-major ([k', n], row stride n) matching
 * omni_tpu.kernels.qformats exactly.
 */
ON_API int on_repack_q8_0(const uint8_t *blocks, int64_t n, int64_t k,
                          int8_t *q, float *d, int n_threads);
ON_API int on_repack_q4_k(const uint8_t *blocks, int64_t n, int64_t k,
                          uint8_t *q, int8_t *sc, int8_t *mn,
                          float *d, float *dm, int n_threads);
ON_API int on_repack_q5_k(const uint8_t *blocks, int64_t n, int64_t k,
                          uint8_t *q, int8_t *sc, int8_t *mn,
                          float *d, float *dm, uint8_t *qh, int n_threads);
ON_API int on_repack_q6_k(const uint8_t *blocks, int64_t n, int64_t k,
                          int8_t *q, int8_t *sc, float *d, int n_threads);
/* legacy 32-block formats: t selects the variant (Q4_0=2/Q4_1=3,
 * Q5_0=6/Q5_1=7); m is NULL for the d-only variants */
ON_API int on_repack_q4_01(int t, const uint8_t *blocks, int64_t n,
                           int64_t k, uint8_t *q, float *d, float *m,
                           int n_threads);
ON_API int on_repack_q5_01(int t, const uint8_t *blocks, int64_t n,
                           int64_t k, uint8_t *q, uint8_t *qh, float *d,
                           float *m, int n_threads);
/* int8 VALUE-plane formats (codebook applied at repack): IQ4_NL=20,
 * MXFP4=39 */
ON_API int on_repack_i8_plane(int t, const uint8_t *blocks, int64_t n,
                              int64_t k, int8_t *q, float *d,
                              int n_threads);
ON_API int on_repack_iq4_xs(const uint8_t *blocks, int64_t n, int64_t k,
                            int8_t *q, int8_t *sc, float *d,
                            int n_threads);

/* ---- GGUF loader (mmap) ----------------------------------------------- */
typedef struct on_gguf on_gguf;

ON_API on_gguf *on_gguf_open(const char *path);
ON_API void on_gguf_close(on_gguf *g);
ON_API int64_t on_gguf_n_tensors(const on_gguf *g);
ON_API uint32_t on_gguf_version(const on_gguf *g);
ON_API int64_t on_gguf_data_offset(const on_gguf *g);
/* Per-tensor queries by index (0..n_tensors-1). name stays valid until
 * close. shape is logical [d0..d3] with trailing 1s (ne order). */
ON_API const char *on_gguf_tensor_name(const on_gguf *g, int64_t i);
ON_API int on_gguf_tensor_type(const on_gguf *g, int64_t i);
ON_API int on_gguf_tensor_ndims(const on_gguf *g, int64_t i);
ON_API void on_gguf_tensor_shape(const on_gguf *g, int64_t i, int64_t out[4]);
ON_API int64_t on_gguf_tensor_nbytes(const on_gguf *g, int64_t i);
ON_API const uint8_t *on_gguf_tensor_data(const on_gguf *g, int64_t i);

/* ---- audio host preprocessing ----------------------------------------- */
/* Whisper log-mel: samples[n] f32 mono 16 kHz -> out[n_frames * n_mel].
 * mel_filters: [n_mel, 201] row-major. Contract identical to
 * omni_tpu.omni.audio.log_mel_spectrogram (hann 400 periodic, hop 160,
 * reflect head pad, power spectrum, log10 clamp, max-8 floor, (x+4)/4). */
ON_API int on_log_mel(const float *samples, int64_t n_samples,
                      const float *mel_filters, int n_mel,
                      int64_t n_frames, float *out, int n_threads);

/* WAV decode (PCM8/16/24/32/f32, any rate/channels) + mono mix + linear
 * resample to 16 kHz. *out is malloc'd; free with on_free. */
ON_API int on_read_wav_mono_16k(const char *path, float **out, int64_t *n);
ON_API int on_write_wav(const char *path, const float *samples, int64_t n,
                        int rate);
ON_API void on_free(void *p);

#ifdef __cplusplus
}
#endif

#endif /* OMNI_NATIVE_H */
