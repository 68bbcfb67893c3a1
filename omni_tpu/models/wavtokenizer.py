"""WavTokenizer decoder — GGUF arch "wavtokenizer-dec" (OuteTTS vocoder).

Counterpart of llm_build_wavtokenizer_dec (src/llama-model.cpp:16628) +
the spectral tail of tools/tts/tts.cpp (embd_to_audio, :201-280): audio
codebook tokens -> embedding -> conv1d -> posnet (ResNet blocks with
GroupNorm+SiLU, one single-head conv-attention block, final GroupNorm) ->
token-wise LayerNorm -> ConvNeXt stack (depthwise conv, LN, pointwise
GELU FFN, learned gamma) -> spec head [T, n_embd=2*(n_fft/2+1)] of
log-magnitudes and phases -> inverse STFT with Hann overlap-add.

TPU-first: the whole decoder is one jitted [T]-token pass (convs via
lax.conv_general_dilated, "same" padding like ggml_conv_1d_ph); the ISTFT
is jnp.fft.irfft over all frames at once plus a fold matmul-free
overlap-add. 24 kHz output like the reference."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

N_FFT = 1280  # tts.cpp:206-209 (fixed for WavTokenizer large)
N_HOP = 320


@dataclasses.dataclass(frozen=True)
class WavTokConfig:
    n_embd: int = 1282          # spec head width = 2*(n_fft/2 + 1)
    n_embd_features: int = 512  # codebook embedding width
    n_embd_posnet: int = 768
    n_embd_convnext: int = 768
    n_ff: int = 2304
    n_posnet: int = 6
    n_convnext: int = 12
    n_groups: int = 32
    group_eps: float = 1e-6
    ln_eps: float = 1e-6
    n_vocab: int = 4096

    @staticmethod
    def from_gguf(kv: dict[str, Any]) -> "WavTokConfig":
        arch = kv.get("general.architecture", "wavtokenizer-dec")
        g = lambda key, default: kv.get(f"{arch}.{key}", default)
        return WavTokConfig(
            n_embd=int(g("embedding_length", 1282)),
            n_embd_features=int(g("features_length", 512)),
            n_embd_posnet=int(g("posnet.embedding_length", 768)),
            n_embd_convnext=int(g("convnext.embedding_length", 768)),
            n_ff=int(g("feed_forward_length", 2304)),
            n_posnet=int(g("posnet.block_count", 6)),
            n_convnext=int(g("convnext.block_count", 12)),
            n_groups=int(g("attention.group_norm_groups", 32)),
            group_eps=float(g("attention.group_norm_epsilon", 1e-6)),
            ln_eps=float(g("attention.layer_norm_epsilon", 1e-6)),
            n_vocab=int(g("vocab_size", 4096)),
        )


def _conv1d_same(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """x [C_in, T], w [C_out, C_in, K] -> [C_out, T] (ggml_conv_1d_ph)."""
    out = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(1,), padding="SAME",
        dimension_numbers=("NCH", "OIH", "NCH"))[0]
    return out + b[:, None]


def _dwconv1d_same(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """Depthwise: x [C, T], w [C, 1, K] (ggml_conv_1d_dw_ph)."""
    c = x.shape[0]
    out = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(1,), padding="SAME",
        dimension_numbers=("NCH", "OIH", "NCH"), feature_group_count=c)[0]
    return out + b[:, None]


def _group_norm(x: jax.Array, w, b, n_groups: int, eps: float) -> jax.Array:
    """x [C, T] grouped over channels (LLM_NORM_GROUP)."""
    c, t = x.shape
    xg = x.reshape(n_groups, c // n_groups * t)
    mu = xg.mean(-1, keepdims=True)
    var = ((xg - mu) ** 2).mean(-1, keepdims=True)
    xg = (xg - mu) * jax.lax.rsqrt(var + eps)
    return xg.reshape(c, t) * w[:, None] + b[:, None]


def _layer_norm(x: jax.Array, w, b, eps: float) -> jax.Array:
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def forward(params: dict, cfg: WavTokConfig,
            codes: jax.Array) -> jax.Array:
    """[T] codebook tokens -> spec embeddings [T, n_embd]
    (log-magnitudes | phases)."""
    x = params["token_embd"][codes].astype(jnp.float32).T  # [C_feat, T]
    x = _conv1d_same(x, params["conv1d"], params["conv1d_b"])

    silu = lambda v: v * jax.nn.sigmoid(v)
    for li, lp in enumerate(params["posnet"]):
        res = x
        # layer kind is structural (key presence), so it stays static
        # under jit
        if "conv1" in lp:
            h = _group_norm(x, lp["norm1"], lp["norm1_b"], cfg.n_groups,
                            cfg.group_eps)
            h = _conv1d_same(silu(h), lp["conv1"], lp["conv1_b"])
            h = _group_norm(h, lp["norm2"], lp["norm2_b"], cfg.n_groups,
                            cfg.group_eps)
            x = res + _conv1d_same(silu(h), lp["conv2"], lp["conv2_b"])
        elif "attn_q" in lp:
            h = _group_norm(x, lp["attn_norm"], lp["attn_norm_b"],
                            cfg.n_groups, cfg.group_eps)
            q = _conv1d_same(h, lp["attn_q"], lp["attn_q_b"])  # [C, T]
            k = _conv1d_same(h, lp["attn_k"], lp["attn_k_b"])
            v = _conv1d_same(h, lp["attn_v"], lp["attn_v_b"])
            scores = (q.T @ k) / np.sqrt(cfg.n_embd_posnet)  # [Tq, Tk]
            p = jax.nn.softmax(scores, axis=-1)
            h = (p @ v.T).T  # [C, T]
            x = res + _conv1d_same(h, lp["attn_o"], lp["attn_o_b"])
        else:  # final group norm
            x = _group_norm(x, lp["norm"], lp["norm_b"], cfg.n_groups,
                            cfg.group_eps)

    xt = x.T  # [T, C]
    xt = _layer_norm(xt, params["tok_norm"], params["tok_norm_b"],
                     cfg.ln_eps)
    for lp in params["convnext"]:
        h = _dwconv1d_same(xt.T, lp["dw"], lp["dw_b"]).T  # [T, C]
        h = _layer_norm(h, lp["norm"], lp["norm_b"], cfg.ln_eps)
        h = jax.nn.gelu(h @ lp["pw1"].T + lp["pw1_b"], approximate=True)
        h = h @ lp["pw2"].T + lp["pw2_b"]
        xt = xt + h * lp["gamma"]

    xt = _layer_norm(xt, params["output_norm"], params["output_norm_b"],
                     cfg.ln_eps)
    return xt @ params["output"].T + params["output_b"]


def embd_to_audio(embd: np.ndarray) -> np.ndarray:
    """[T, n_embd] spec (log-mag | phase halves) -> mono f32 audio
    (tts.cpp embd_to_audio: exp-clamped magnitudes, irfft n_fft=1280,
    Hann overlap-add with window-envelope normalisation, hop 320)."""
    embd = np.asarray(embd, np.float32)
    t, n_embd = embd.shape
    half = n_embd // 2
    mag = np.minimum(np.exp(embd[:, :half]), 1e2)
    phi = embd[:, half:]
    spec = mag * np.cos(phi) + 1j * mag * np.sin(phi)  # [T, n_fft/2+1]
    frames = np.fft.irfft(spec, n=N_FFT, axis=-1)  # [T, n_fft]

    n = np.arange(N_FFT)
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / N_FFT)  # periodic
    frames = frames * hann[None, :]

    n_pad = (N_FFT - N_HOP) // 2
    n_out = (t - 1) * N_HOP + N_FFT
    audio = np.zeros(n_out, np.float32)
    env = np.zeros(n_out, np.float32)
    hann2 = (hann * hann).astype(np.float32)
    for l in range(t):
        s = l * N_HOP
        audio[s:s + N_FFT] += frames[l]
        env[s:s + N_FFT] += hann2
    audio = audio[n_pad:n_out - n_pad] / np.maximum(
        env[n_pad:n_out - n_pad], 1e-8)
    return audio


def decode_audio(params: dict, cfg: WavTokConfig,
                 codes: np.ndarray) -> np.ndarray:
    """Codebook tokens -> 24 kHz mono audio."""
    spec = np.asarray(jax.jit(forward, static_argnums=(1,))(
        params, cfg, jnp.asarray(codes, jnp.int32)))
    return embd_to_audio(spec)


def load_params(reader, cfg: WavTokConfig) -> dict:
    """GGUF arch "wavtokenizer-dec" -> pytree (llama-arch.cpp:1897-1919
    names; posnet layer kinds follow the fixed 0/1=res 2=attn 3/4=res
    5=norm pattern of llm_build_wavtokenizer_dec)."""
    from ..kernels import load_quantized

    def get(name, required=True):
        if name not in reader.tensors:
            if required:
                raise KeyError(f"missing tensor {name}")
            return None
        ti = reader.tensors[name]
        return jnp.asarray(load_quantized(ti.data, ti.ggml_type, ti.shape,
                                          False, dtype=jnp.float32),
                           jnp.float32)

    params = {
        "token_embd": get("token_embd.weight"),
        "tok_norm": get("token_embd_norm.weight"),
        "tok_norm_b": get("token_embd_norm.bias"),
        "conv1d": get("conv1d.weight"),
        "conv1d_b": get("conv1d.bias"),
        "output_norm": get("output_norm.weight"),
        "output_norm_b": get("output_norm.bias"),
        "output": get("output.weight"),
        "output_b": get("output.bias"),
        "posnet": [],
        "convnext": [],
    }
    for i in range(cfg.n_posnet):
        p = f"posnet.{i}."
        if f"{p}attn_q.weight" in reader.tensors:
            params["posnet"].append({
                "attn_norm": get(p + "attn_norm.weight"),
                "attn_norm_b": get(p + "attn_norm.bias"),
                "attn_q": get(p + "attn_q.weight"),
                "attn_q_b": get(p + "attn_q.bias"),
                "attn_k": get(p + "attn_k.weight"),
                "attn_k_b": get(p + "attn_k.bias"),
                "attn_v": get(p + "attn_v.weight"),
                "attn_v_b": get(p + "attn_v.bias"),
                "attn_o": get(p + "attn_output.weight"),
                "attn_o_b": get(p + "attn_output.bias"),
            })
        elif f"{p}conv1.weight" in reader.tensors:
            params["posnet"].append({
                "norm1": get(p + "norm1.weight"),
                "norm1_b": get(p + "norm1.bias"),
                "conv1": get(p + "conv1.weight"),
                "conv1_b": get(p + "conv1.bias"),
                "norm2": get(p + "norm2.weight"),
                "norm2_b": get(p + "norm2.bias"),
                "conv2": get(p + "conv2.weight"),
                "conv2_b": get(p + "conv2.bias"),
            })
        else:
            params["posnet"].append({
                "norm": get(p + "norm.weight"),
                "norm_b": get(p + "norm.bias"),
            })
    for i in range(cfg.n_convnext):
        p = f"convnext.{i}."
        params["convnext"].append({
            "dw": get(p + "dw.weight"),
            "dw_b": get(p + "dw.bias"),
            "norm": get(p + "norm.weight"),
            "norm_b": get(p + "norm.bias"),
            "pw1": get(p + "pw1.weight"),
            "pw1_b": get(p + "pw1.bias"),
            "pw2": get(p + "pw2.weight"),
            "pw2_b": get(p + "pw2.bias"),
            "gamma": get(p + "gamma.weight"),
        })
    return params
