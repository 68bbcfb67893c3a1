"""HiFiGAN2 (HiFT) vocoder: mel → 24 kHz waveform.

Contract from the reference (/root/reference/tools/omni/token2wav/
token2wav-impl.{h,cpp} hg2_*): NSF-HiFiGAN with iSTFT head:

- F0 predictor: 5 × (conv k3 same + ELU) over mel, linear → |f0| per frame.
- Sine source (sine_gen2): f0 upsampled ×480 (nearest), harmonics 1..9,
  per-frame mean phase increment, cumulative phase, linear interp back up,
  sin × 0.1 gated by voiced mask (f0 > 10); merged to 1 channel by
  linear(9→1) + tanh (source_nsf linear); noise branch is zeroed.
- Generator: conv_pre(k7) → [up ×8, ×5, ×3 transposed convs k=2s pad=s/2]
  with source STFT (n_fft 16, hop 4) injected at each scale through
  source_down convs (stride 15/3/1) + a resblock, each stage followed by 3
  parallel snake resblocks averaged; leaky_relu slopes 0.1 (last 0.01);
  conv_post(k7) → 18 ch = [log-mag(9) | raw-phase(9)];
  magnitude = clamp(exp(mag), ≤1e2); phase = sin(raw); real/imag =
  mag·cos(phase)/mag·sin(phase); iSTFT (hann 16, hop 4, OLA window²-norm);
  clamp ±0.99. 480 samples per mel frame total (4·8·5·3).

Streaming: source prefix overwritten with cached source (8 mel frames =
3840 samples) for phase continuity; crossfade handled by the caller.
"""

from __future__ import annotations

import dataclasses

import functools

import jax
import jax.numpy as jnp
import numpy as np

N_FFT = 16
HOP = 4
F_BINS = 9
SAMPLES_PER_MEL = 480
SR = 24000
HARMONICS = 9  # harmonic_num 8 + fundamental
SINE_AMP = 0.1
VOICED_THRESHOLD = 10.0
LRELU = 0.1
AUDIO_LIMIT = 0.99
MEL_CACHE = 8
SOURCE_CACHE = MEL_CACHE * SAMPLES_PER_MEL


def _conv1d(x, w, b, stride=1, pad=0, dilation=1):
    """x [T, C], w [Cout, Cin, K]."""
    y = jax.lax.conv_general_dilated(
        x[None], w, (stride,), padding=[(pad, pad)], rhs_dilation=(dilation,),
        dimension_numbers=("NTC", "OIT", "NTC"))[0]
    return y + b if b is not None else y


def _deconv1d(x, w, b, stride, pad):
    """Transposed conv, torch ConvTranspose1d semantics; w [Cin, Cout, K].
    Identity: correlate the stride-dilated input with the K-flipped,
    IO-swapped kernel under (k-1-pad) padding."""
    k = w.shape[-1]
    wk = jnp.flip(jnp.swapaxes(w, 0, 1), axis=-1)  # [Cout, Cin, K]
    y = jax.lax.conv_general_dilated(
        x[None], wk, (1,), padding=[(k - 1 - pad,) * 2], lhs_dilation=(stride,),
        dimension_numbers=("NTC", "OIT", "NTC"))[0]
    return y + b if b is not None else y


def _snake(x, alpha):
    ax = x * alpha
    return x + jnp.sin(ax) ** 2 / (alpha + 1e-9)


def f0_predict(p: dict, mel: jax.Array) -> jax.Array:
    """mel [T, 80] -> f0 [T] (non-negative)."""
    h = mel
    for i in range(5):
        h = jax.nn.elu(_conv1d(h, p[f"f0_conv{i}_w"], p[f"f0_conv{i}_b"], pad=1))
    f0 = _lin_rows(h, p["f0_lin_w"], p["f0_lin_b"])
    return jnp.abs(f0[:, 0])


def _lin_rows(x, w, b):
    out = jnp.einsum("tc,nc->tn", x, w, preferred_element_type=jnp.float32)
    return out + b


def sine_source(p: dict, f0: jax.Array) -> jax.Array:
    """f0 [Tm] -> merged source [Tm*480] (sine_gen2 + NSF linear/tanh)."""
    tm = f0.shape[0]
    harm = jnp.arange(1, HARMONICS + 1, dtype=jnp.float32)
    # per-frame mean normalized frequency (rad per sample / 2π), [Tm, 9]
    rad = f0[:, None] * harm[None, :] / SR
    phase_frames = jnp.cumsum(rad, axis=0) * 2.0 * np.pi  # [Tm, 9]
    delta = jnp.diff(phase_frames, axis=0, append=phase_frames[-1:] * 0)
    delta = delta.at[-1].set(delta[-2] if tm > 1 else delta[-1])
    ramp = jnp.arange(SAMPLES_PER_MEL, dtype=jnp.float32) / SAMPLES_PER_MEL
    phase_up = (phase_frames[:, None, :] + delta[:, None, :] * ramp[None, :, None])
    phase_up = phase_up.reshape(tm * SAMPLES_PER_MEL, HARMONICS) * SAMPLES_PER_MEL

    f0_up = jnp.repeat(f0, SAMPLES_PER_MEL)
    uv = (f0_up > VOICED_THRESHOLD).astype(jnp.float32)
    sines = jnp.sin(phase_up) * SINE_AMP * uv[:, None]
    merged = jnp.tanh(_lin_rows(sines, p["nsf_lin_w"], p["nsf_lin_b"])[:, 0])
    return merged


def stft16(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """x [T] -> (real [F, T/HOP], imag) with centered hann-16 frames."""
    pad = N_FFT // 2
    xp = jnp.concatenate([x[1 : pad + 1][::-1], x, x[-pad - 1 : -1][::-1]])
    n_frames = x.shape[0] // HOP
    idx = jnp.arange(n_frames)[:, None] * HOP + jnp.arange(N_FFT)[None, :]
    win = _hann(N_FFT)
    frames = xp[idx] * win
    n = jnp.arange(N_FFT, dtype=jnp.float32)
    k = jnp.arange(F_BINS, dtype=jnp.float32)
    ang = 2.0 * np.pi / N_FFT * k[:, None] * n[None, :]
    real = frames @ jnp.cos(ang).T  # [T', F]
    imag = -(frames @ jnp.sin(ang).T)
    return real.T, imag.T


def istft16(real: jax.Array, imag: jax.Array) -> jax.Array:
    """real/imag [F, T'] -> wave [T'*HOP] via irfft + window²-normalized OLA."""
    f, t = real.shape
    n = jnp.arange(N_FFT, dtype=jnp.float32)
    k = jnp.arange(F_BINS, dtype=jnp.float32)
    ang = 2.0 * np.pi / N_FFT * k[:, None] * n[None, :]
    cos_t, sin_t = jnp.cos(ang), jnp.sin(ang)
    # irfft with hermitian symmetry: weight k=0 and nyquist once, others twice
    w_k = jnp.concatenate([jnp.ones(1), 2 * jnp.ones(F_BINS - 2), jnp.ones(1)])
    frames = (jnp.einsum("ft,fn->tn", real * w_k[:, None], cos_t)
              - jnp.einsum("ft,fn->tn", imag * w_k[:, None], sin_t)) / N_FFT
    win = _hann(N_FFT)
    frames = frames * win

    out_len = t * HOP + N_FFT
    pos = jnp.arange(t) * HOP
    y = jnp.zeros(out_len).at[pos[:, None] + jnp.arange(N_FFT)[None, :]].add(frames)
    norm = jnp.zeros(out_len).at[pos[:, None] + jnp.arange(N_FFT)[None, :]].add(
        jnp.broadcast_to(win * win, (t, N_FFT)))
    y = y / jnp.maximum(norm, 1e-8)
    pad = N_FFT // 2
    return y[pad : pad + t * HOP]


def _hann(n):
    return 0.5 * (1.0 - jnp.cos(2.0 * np.pi * jnp.arange(n) / n))


def _resblock(p: dict, idx: str, x: jax.Array) -> jax.Array:
    convs1 = p[f"rb{idx}_c1"]
    convs2 = p[f"rb{idx}_c2"]
    a1 = p[f"rb{idx}_a1"]
    a2 = p[f"rb{idx}_a2"]
    for i in range(len(convs1)):
        w1, b1 = convs1[i]
        w2, b2 = convs2[i]
        # HiFiGAN dilation convention: convs1 use 1,3,5 by position (when
        # k>1), convs2 always 1 — static, so the whole vocoder can jit
        d1 = (1, 3, 5)[i] if w1.shape[-1] > 1 else 1
        d2 = 1
        xt = _snake(x, a1[i])
        xt = _conv1d(xt, w1, b1, pad=(w1.shape[-1] - 1) // 2 * d1, dilation=d1)
        xt = _snake(xt, a2[i])
        xt = _conv1d(xt, w2, b2, pad=(w2.shape[-1] - 1) // 2 * d2, dilation=d2)
        x = x + xt
    return x


def decode(p: dict, mel: jax.Array, source: jax.Array) -> jax.Array:
    """mel [T, 80] + source [T*480] -> wave [T*480]."""
    s_real, s_imag = stft16(source)  # [F, Ts], Ts = T*120
    s_stft = jnp.concatenate([s_real, s_imag], axis=0).T  # [Ts, 18]

    x = _conv1d(mel, p["conv_pre_w"], p["conv_pre_b"], pad=3)
    ups = [(8, 4, 15, 7), (5, 3, 3, 1), (3, 2, 1, 0)]
    for stage, (stride, dpad, s_stride, s_pad) in enumerate(ups):
        x = jnp.where(x >= 0, x, (LRELU if stage < 2 else LRELU) * x)
        x = _deconv1d(x, p[f"up{stage}_w"], p[f"up{stage}_b"], stride, dpad)
        si = _conv1d(s_stft, p[f"sd{stage}_w"], p[f"sd{stage}_b"],
                     stride=s_stride, pad=s_pad)
        si = _resblock(p, f"s{stage}", si)
        x = x + si
        acc = None
        for j in range(3):
            y = _resblock(p, f"{stage * 3 + j}", x)
            acc = y if acc is None else acc + y
        x = acc / 3.0

    x = jnp.where(x >= 0, x, 0.01 * x)
    post = _conv1d(x, p["conv_post_w"], p["conv_post_b"], pad=3)  # [Ts, 18]
    mag = jnp.clip(jnp.exp(post[:, :F_BINS]), max=1e2)
    phase = jnp.sin(post[:, F_BINS:])
    real = (mag * jnp.cos(phase)).T
    imag = (mag * jnp.sin(phase)).T
    wave = istft16(real, imag)
    return jnp.clip(wave, -AUDIO_LIMIT, AUDIO_LIMIT)


@functools.partial(jax.jit)
def vocode(p: dict, mel: jax.Array, cached_source: jax.Array | None = None
           ) -> tuple[jax.Array, jax.Array]:
    """Full vocoder pass. cached_source (prefix samples) overwrites the
    start of the generated source for streaming phase continuity.
    Returns (wave [T*480], source [T*480])."""
    f0 = f0_predict(p, mel)
    src = sine_source(p, f0)
    if cached_source is not None:
        n = cached_source.shape[0]
        src = jnp.concatenate([cached_source, src[n:]])
    wave = decode(p, mel, src)
    return wave, src


# ---------------------------------------------------------------------------
# loading
# ---------------------------------------------------------------------------

def load_hifigan_params(reader) -> dict:
    from ...core import quants

    names = set(reader.tensors)

    def get(name, required=True):
        if name not in names:
            if required:
                raise KeyError(f"hifigan tensor missing: {name}")
            return None
        ti = reader.tensors[name]
        return jnp.asarray(quants.dequantize(ti.data, ti.ggml_type, ti.shape))

    def find(*cands, required=True):
        for c in cands:
            if c in names:
                return get(c)
        if required:
            raise KeyError(f"hifigan tensor missing: {cands}")
        return None

    p = {
        "conv_pre_w": find("conv_pre.weight"), "conv_pre_b": find("conv_pre.bias"),
        "conv_post_w": find("conv_post.weight"), "conv_post_b": find("conv_post.bias"),
        "f0_lin_w": find("f0_predictor.proj.weight", "f0_predictor.linear.weight"),
        "f0_lin_b": find("f0_predictor.proj.bias", "f0_predictor.linear.bias"),
        "nsf_lin_w": find("m_source.l_linear.weight", "source_nsf.linear.weight"),
        "nsf_lin_b": find("m_source.l_linear.bias", "source_nsf.linear.bias"),
    }
    for i in range(5):
        p[f"f0_conv{i}_w"] = find(f"f0_predictor.condnet.{i*2}.weight",
                                  f"f0_predictor.conv{i}.weight")
        p[f"f0_conv{i}_b"] = find(f"f0_predictor.condnet.{i*2}.bias",
                                  f"f0_predictor.conv{i}.bias")
    for s in range(3):
        p[f"up{s}_w"] = find(f"ups.{s}.weight")
        p[f"up{s}_b"] = find(f"ups.{s}.bias")
        p[f"sd{s}_w"] = find(f"source_downs.{s}.weight")
        p[f"sd{s}_b"] = find(f"source_downs.{s}.bias")
        _load_resblock(p, f"s{s}", f"source_resblocks.{s}", reader, get, names)
    for r in range(9):
        _load_resblock(p, f"{r}", f"resblocks.{r}", reader, get, names)
    return p


def _load_resblock(p, key, prefix, reader, get, names):
    c1, c2, a1, a2 = [], [], [], []
    i = 0
    while f"{prefix}.convs1.{i}.weight" in names:
        w = get(f"{prefix}.convs1.{i}.weight")
        b = get(f"{prefix}.convs1.{i}.bias")
        # dilation is recoverable from the checkpoint convention 1,3,5
        c1.append((w, b))
        w2 = get(f"{prefix}.convs2.{i}.weight")
        b2 = get(f"{prefix}.convs2.{i}.bias")
        c2.append((w2, b2))
        a1.append(get(f"{prefix}.activations1.{i}.alpha",
                      ) if f"{prefix}.activations1.{i}.alpha" in names
                  else get(f"{prefix}.activations.{2*i}.alpha"))
        a2.append(get(f"{prefix}.activations2.{i}.alpha",
                      ) if f"{prefix}.activations2.{i}.alpha" in names
                  else get(f"{prefix}.activations.{2*i+1}.alpha"))
        i += 1
    p[f"rb{key}_c1"] = c1
    p[f"rb{key}_c2"] = c2
    p[f"rb{key}_a1"] = [a.reshape(-1) for a in a1]
    p[f"rb{key}_a2"] = [a.reshape(-1) for a in a2]
