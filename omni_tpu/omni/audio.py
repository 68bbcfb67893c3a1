"""Host-side audio preprocessing: Whisper log-mel spectrogram.

Numeric contract from the reference (/root/reference/tools/mtmd/
mtmd-audio.cpp log_mel_spectrogram, used by the APM via
tools/omni/audition.cpp): 16 kHz mono, Hann window 400, hop 160,
reflect-pad 200 at both ends, power spectrum, mel filterbank loaded from
the APM GGUF (tensor), log10 clamped at 1e-10, max-8 floor, (x+4)/4
normalization — applied per chunk, which is what the streaming engine does
per 1-second input.

Pure numpy (host preprocessing, never on-device — mirrors the reference
running this on CPU threads).
"""

from __future__ import annotations

import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160


def hann_window(n: int = N_FFT) -> np.ndarray:
    # periodic Hann, as torch.hann_window(window_periodic=True) / whisper
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))).astype(np.float32)


def log_mel_spectrogram(
    samples: np.ndarray,
    mel_filters: np.ndarray,  # [n_mel, n_fft//2 + 1]
    n_frames: int | None = None,
) -> np.ndarray:
    """[n_samples] f32 -> [n_frames, n_mel] f32 normalized log-mel.

    n_frames defaults to round(n_samples / HOP) (100 per second)."""
    samples = np.asarray(samples, np.float32)
    n_samples = len(samples)
    if n_frames is None:
        n_frames = int(round(n_samples / HOP))

    import os

    if os.environ.get("OMNI_NATIVE", "1") != "0":
        from .. import native_ext

        out = native_ext.log_mel(samples, mel_filters, n_frames)
        if out is not None:
            return out

    pad = N_FFT // 2
    padded = np.concatenate([
        samples[1 : pad + 1][::-1],  # reflect head
        samples,
        np.zeros(pad + N_FFT, np.float32),  # zeros tail (stand-in for 30 s pad)
    ])

    window = hann_window()
    idx = np.arange(n_frames)[:, None] * HOP + np.arange(N_FFT)[None, :]
    frames = padded[idx] * window  # [n_frames, N_FFT]
    spec = np.fft.rfft(frames, n=N_FFT, axis=-1)
    power = (spec.real ** 2 + spec.imag ** 2).astype(np.float32)  # [T, 201]

    mel = power @ mel_filters.T  # [T, n_mel]
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


def load_wav_mono_16k(path: str) -> np.ndarray:
    """Minimal WAV reader (PCM16/PCM32/float32) + linear resample to 16 kHz.
    Plays the role of the reference's vendored miniaudio decode
    (tools/omni/audition.cpp:42)."""
    import os
    import wave

    if os.environ.get("OMNI_NATIVE", "1") != "0":
        from .. import native_ext

        out = native_ext.read_wav_mono_16k(path)
        if out is not None:
            return out

    with wave.open(path, "rb") as w:
        n = w.getnframes()
        raw = w.readframes(n)
        ch = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
    if width == 2:
        x = np.frombuffer(raw, np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, np.int32).astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    if rate != SAMPLE_RATE:
        t_out = np.arange(int(len(x) * SAMPLE_RATE / rate)) * (rate / SAMPLE_RATE)
        x = np.interp(t_out, np.arange(len(x)), x).astype(np.float32)
    return x


def write_wav(path: str, samples: np.ndarray, rate: int = 24000) -> None:
    import wave

    x = np.clip(np.asarray(samples, np.float32), -1.0, 1.0)
    pcm = (x * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
