"""APM: Whisper-style streaming audio encoder (MiniCPM-o 4.5 audio path).

Architecture contract from the reference
(/root/reference/tools/omni/audition.cpp:341-705 build_whisper; shapes per
tools/omni/convert/model.txt:56-77): conv1(k3,s1,same)+GELU →
conv2(k3,s2,same)+GELU → +pos-embed (offset by frames already cached) →
24 pre-LN transformer layers (d=1024, 16 heads, k_proj bias-free, GELU MLP)
→ final LN → projector linear1(1024→4096)+ReLU+linear2(4096→4096) →
AvgPool1d(k=5, s=5) over time. 1 s of 16 kHz audio ⇒ 100 mel frames ⇒ 50
conv frames ⇒ 10 LLM-space tokens.

Streaming: an explicit per-layer K/V cache of 1500 conv frames
(audition.cpp:394-506) lets each 1 s chunk attend over up to 30 s of
context with FULL (non-causal) attention inside the cached window. The
cache is a static-shape pytree scanned through jit; `n_cached` is the
position-embedding offset. GELU is the tanh approximation (ggml_gelu).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.gguf import GGUFReader
from ..kernels.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    n_layers: int = 24
    d_model: int = 1024
    n_heads: int = 16
    n_audio_ctx: int = 1500
    n_mels: int = 80
    d_out: int = 4096
    pool: int = 5
    eps: float = 1e-6  # audition.cpp:82

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @staticmethod
    def from_gguf(kv: dict[str, Any]) -> "WhisperConfig":
        return WhisperConfig(
            n_layers=int(kv.get("encoder_layers", 24)),
            d_model=int(kv.get("d_model", 1024)),
            n_heads=int(kv.get("encoder_attention_heads", 16)),
            n_mels=int(kv.get("n_mel", 80)),
            n_audio_ctx=int(kv.get("n_audio_ctx", 1500)),
            d_out=int(kv.get("audio_projection_dim", 4096)),
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class WhisperState:
    """Streaming encoder cache (one per audio session)."""

    k: jax.Array  # [L, n_audio_ctx, H, Dh]
    v: jax.Array
    n_cached: jax.Array  # [] int32, conv frames already cached

    @staticmethod
    def create(cfg: WhisperConfig, dtype=jnp.float32) -> "WhisperState":
        shape = (cfg.n_layers, cfg.n_audio_ctx, cfg.n_heads, cfg.head_dim)
        return WhisperState(
            k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
            n_cached=jnp.int32(0),
        )


def load_params(reader: GGUFReader) -> dict:
    """APM GGUF (converter naming, tools/omni/convert/convert_apm.py) ->
    parameter pytree. All dense f32/f16 -> f32 (encoder is small)."""

    def get(name, required=True):
        if name not in reader.tensors:
            if required:
                raise KeyError(f"APM tensor missing: {name}")
            return None
        ti = reader.tensors[name]
        from ..core import quants

        # any GGUF dtype (f32/f16/bf16/quantized) -> f32
        return jnp.asarray(quants.dequantize(ti.data, ti.ggml_type, ti.shape)
                           .astype(np.float32))

    p = {
        "conv1_w": get("encoder.conv1.weight"),  # [1024, 80, 3]
        "conv1_b": get("encoder.conv1.bias").reshape(-1),
        "conv2_w": get("encoder.conv2.weight"),  # [1024, 1024, 3]
        "conv2_b": get("encoder.conv2.bias").reshape(-1),
        "pos": get("encoder.positional_embedding"),  # [1500, 1024]
        "ln_post_w": get("encoder.ln_post.weight"),
        "ln_post_b": get("encoder.ln_post.bias"),
        "proj1_w": get("audio_projector.linear1.weight"),
        "proj1_b": get("audio_projector.linear1.bias"),
        "proj2_w": get("audio_projector.linear2.weight"),
        "proj2_b": get("audio_projector.linear2.bias"),
        "layers": [],
    }
    i = 0
    while f"encoder.blocks.{i}.attn_ln.weight" in reader.tensors:
        b = f"encoder.blocks.{i}."
        p["layers"].append({
            "attn_ln_w": get(b + "attn_ln.weight"),
            "attn_ln_b": get(b + "attn_ln.bias"),
            "wq": get(b + "attn.query.weight"), "bq": get(b + "attn.query.bias"),
            "wk": get(b + "attn.key.weight"),  # no bias (whisper convention)
            "wv": get(b + "attn.value.weight"), "bv": get(b + "attn.value.bias"),
            "wo": get(b + "attn.out.weight"), "bo": get(b + "attn.out.bias"),
            "mlp_ln_w": get(b + "mlp_ln.weight"),
            "mlp_ln_b": get(b + "mlp_ln.bias"),
            "w1": get(b + "mlp.0.weight"), "b1": get(b + "mlp.0.bias"),
            "w2": get(b + "mlp.2.weight"), "b2": get(b + "mlp.2.bias"),
        })
        i += 1
    return p


def mel_filters_from_gguf(kv: dict[str, Any]) -> np.ndarray:
    """[n_mel, n_fft_bins] filterbank stored as a flat KV array."""
    n_mel = int(kv["n_mel"])
    flt = np.asarray(kv["filters"], np.float32)
    return flt.reshape(n_mel, -1)


def _conv1d_same(x: jax.Array, w: jax.Array, b: jax.Array, stride: int) -> jax.Array:
    """x [T, Cin], w [Cout, Cin, K] -> [T', Cout] with 'same' padding
    (ggml_conv_1d_ph, pad = K//2)."""
    out = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(stride,), padding=[(w.shape[-1] // 2,) * 2],
        dimension_numbers=("NTC", "OIT", "NTC"),
    )[0]
    return out + b


def _gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=True)  # ggml_gelu = tanh approx


def _lin(x, w, b=None):
    out = jnp.einsum("td,nd->tn", x, w, preferred_element_type=jnp.float32)
    return out + b if b is not None else out


@functools.partial(jax.jit, static_argnames=('cfg',))
def encode_chunk(
    params: dict, cfg: WhisperConfig, mel: jax.Array, state: WhisperState
) -> tuple[jax.Array, WhisperState]:
    """One streaming chunk: mel [T_mel, n_mels] -> (embeds [T_mel//10, 4096],
    updated state). T_mel must be even (conv stride 2)."""
    x = _gelu(_conv1d_same(mel, params["conv1_w"], params["conv1_b"], 1))
    x = _gelu(_conv1d_same(x, params["conv2_w"], params["conv2_b"], 2))
    t = x.shape[0]  # conv frames this chunk

    off = state.n_cached
    pos = jax.lax.dynamic_slice_in_dim(params["pos"], off, t, axis=0)
    h = x + pos

    scale = 1.0 / float(np.sqrt(cfg.head_dim))
    n_valid = off + t
    S = cfg.n_audio_ctx
    valid = jnp.arange(S) < n_valid  # [S]

    new_k, new_v = [], []
    for li, lp in enumerate(params["layers"]):
        hn = layer_norm(h, lp["attn_ln_w"], lp["attn_ln_b"], cfg.eps)
        q = _lin(hn, lp["wq"], lp["bq"]).reshape(t, cfg.n_heads, cfg.head_dim)
        k = _lin(hn, lp["wk"]).reshape(t, cfg.n_heads, cfg.head_dim)
        v = _lin(hn, lp["wv"], lp["bv"]).reshape(t, cfg.n_heads, cfg.head_dim)
        kc = jax.lax.dynamic_update_slice_in_dim(state.k[li], k.astype(state.k.dtype), off, axis=0)
        vc = jax.lax.dynamic_update_slice_in_dim(state.v[li], v.astype(state.v.dtype), off, axis=0)
        new_k.append(kc)
        new_v.append(vc)
        scores = jnp.einsum("thd,shd->hts", q, kc,
                            preferred_element_type=jnp.float32) * scale
        scores = jnp.where(valid[None, None, :], scores, -1e30)
        att = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("hts,shd->thd", att, vc,
                         preferred_element_type=jnp.float32)
        h = h + _lin(out.reshape(t, cfg.d_model), lp["wo"], lp["bo"])

        hn = layer_norm(h, lp["mlp_ln_w"], lp["mlp_ln_b"], cfg.eps)
        h = h + _lin(_gelu(_lin(hn, lp["w1"], lp["b1"])), lp["w2"], lp["b2"])

    h = layer_norm(h, params["ln_post_w"], params["ln_post_b"], cfg.eps)
    h = _lin(jax.nn.relu(_lin(h, params["proj1_w"], params["proj1_b"])),
             params["proj2_w"], params["proj2_b"])
    # AvgPool1d(k=5, s=5) over time
    n_out = t // cfg.pool
    h = h[: n_out * cfg.pool].reshape(n_out, cfg.pool, -1).mean(axis=1)

    state = WhisperState(
        k=jnp.stack(new_k), v=jnp.stack(new_v), n_cached=n_valid
    )
    return h, state
