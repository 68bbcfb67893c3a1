"""EmbeddingGemma — bidirectional Gemma3 encoder, GGUF arch
"gemma-embedding" (reference llm_build_gemma_embedding,
src/llama-model.cpp:11412, hparams at :1224).

Gemma3 block anatomy with NON-CAUSAL attention and no KV cache: sandwich
RMS norms (attn_norm/post_attention_norm, ffn_norm/post_ffw_norm),
per-head RMS q/k norms, NEOX rope with the 5:1 local/global pattern
(set_swa_pattern(6): il % 6 < 5 is a local layer roping at base 10000
with a SYMMETRIC sliding window |i-j| <= n_swa/2; every 6th layer is
global at the trained base), Q pre-scaled by 1/sqrt(head_dim) with
kq_scale 1, GELU-gated FFN, sqrt(d)-scaled embeddings. The optional
sentence-transformers dense_2/dense_3 projections apply after pooling
(llama-graph.cpp:1887 build_dense_out).

TPU shape: one jit over the full padded [T, D] sequence — prefill-only,
so everything is batched MXU matmuls; no scan, no cache.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

POOL_NONE, POOL_MEAN, POOL_CLS, POOL_LAST = 0, 1, 2, 3


@dataclasses.dataclass(frozen=True)
class GemmaEmbedConfig:
    n_layers: int
    d_model: int
    n_heads: int
    n_kv_heads: int
    head_dim: int
    d_ff: int
    n_vocab: int
    n_ctx: int = 2048
    rms_eps: float = 1e-6
    rope_base: float = 1_000_000.0   # global layers
    rope_base_swa: float = 10_000.0  # local layers
    swa_window: int = 512
    swa_every: int = 6               # set_swa_pattern(6)
    pooling: int = POOL_MEAN
    dense_2: bool = False
    dense_3: bool = False

    @staticmethod
    def from_gguf(kv: dict[str, Any]) -> "GemmaEmbedConfig":
        a = "gemma-embedding"
        g = lambda key, default: kv.get(f"{a}.{key}", default)
        d = int(g("embedding_length", 256))
        nh = int(g("attention.head_count", 8))
        return GemmaEmbedConfig(
            n_layers=int(g("block_count", 2)),
            d_model=d,
            n_heads=nh,
            n_kv_heads=int(g("attention.head_count_kv", nh)),
            head_dim=int(g("attention.key_length", 256)),
            d_ff=int(g("feed_forward_length", 4 * d)),
            n_vocab=int(g("vocab_size", 256)),
            n_ctx=int(g("context_length", 2048)),
            rms_eps=float(g("attention.layer_norm_rms_epsilon", 1e-6)),
            rope_base=float(g("rope.freq_base", 1_000_000.0)),
            swa_window=int(g("attention.sliding_window", 512)),
            pooling=int(g("pooling_type", POOL_MEAN)),
            dense_2=bool(g("dense_2_feat_in", 0)),
            dense_3=bool(g("dense_3_feat_in", 0)),
        )


def _rms(x, w, eps):
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)) * w


def _rope_neox(x, pos, base):
    """[T, H, Dh] NEOX rope (rotate halves)."""
    t, h, dh = x.shape
    half = dh // 2
    freq = base ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    ang = pos[:, None].astype(jnp.float32) * freq[None, :]  # [T, half]
    cos, sin = jnp.cos(ang)[:, None, :], jnp.sin(ang)[:, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)


@functools.partial(jax.jit, static_argnames=("cfg",))
def forward(params: dict, cfg: GemmaEmbedConfig, tokens: jax.Array,
            mask: jax.Array) -> jax.Array:
    """tokens [T] int32, mask [T] bool (valid positions) -> hidden [T, D]."""
    t = tokens.shape[0]
    pos = jnp.arange(t, dtype=jnp.int32)
    x = params["token_embd"][tokens].astype(jnp.float32)
    x = x * jnp.sqrt(float(cfg.d_model))  # inp_scaled

    valid = mask[None, :] & mask[:, None]  # [Tq, Tk] bidirectional
    dist = pos[None, :] - pos[:, None]
    half = cfg.swa_window // 2
    swa_ok = (jnp.abs(dist) <= half) & valid  # SYMMETRIC window

    q_scale = cfg.head_dim ** -0.5  # f_attention_scale, kq_scale = 1
    rep = cfg.n_heads // cfg.n_kv_heads
    for il, lp in enumerate(params["layers"]):
        local = il % cfg.swa_every < cfg.swa_every - 1
        base = cfg.rope_base_swa if local else cfg.rope_base
        amask = swa_ok if local else valid

        h = _rms(x, lp["attn_norm"], cfg.rms_eps)
        q = (h @ lp["wq"].T).reshape(t, cfg.n_heads, cfg.head_dim)
        k = (h @ lp["wk"].T).reshape(t, cfg.n_kv_heads, cfg.head_dim)
        v = (h @ lp["wv"].T).reshape(t, cfg.n_kv_heads, cfg.head_dim)
        q = _rope_neox(_rms(q, lp["q_norm"], cfg.rms_eps), pos, base)
        k = _rope_neox(_rms(k, lp["k_norm"], cfg.rms_eps), pos, base)
        if rep > 1:
            k = jnp.repeat(k, rep, axis=1)
            v = jnp.repeat(v, rep, axis=1)
        scores = jnp.einsum("qhd,khd->hqk", q * q_scale, k)
        scores = jnp.where(amask[None], scores, -1e30)
        att = jax.nn.softmax(scores, axis=-1)
        o = jnp.einsum("hqk,khd->qhd", att, v).reshape(t, -1)
        o = o @ lp["wo"].T
        o = _rms(o, lp["post_attention_norm"], cfg.rms_eps)
        x = x + o

        h = _rms(x, lp["ffn_norm"], cfg.rms_eps)
        ff = (jax.nn.gelu(h @ lp["w_gate"].T, approximate=True)
              * (h @ lp["w_up"].T)) @ lp["w_down"].T
        x = x + _rms(ff, lp["post_ffw_norm"], cfg.rms_eps)

    return _rms(x, params["output_norm"], cfg.rms_eps)


def encode(params: dict, cfg: GemmaEmbedConfig, tokens) -> jax.Array:
    """Pooled, densed, L2-normalized embedding (server /embeddings
    contract; build_dense_out llama-graph.cpp:1887)."""
    import numpy as np

    toks = jnp.asarray(np.asarray(tokens, np.int32))
    hidden = forward(params, cfg, toks, jnp.ones(toks.shape[0], bool))
    if cfg.pooling == POOL_CLS:
        vec = hidden[0]
    elif cfg.pooling == POOL_LAST:
        vec = hidden[-1]
    else:
        vec = jnp.mean(hidden, axis=0)
    if params.get("dense_2") is not None:
        vec = vec @ params["dense_2"].T
    if params.get("dense_3") is not None:
        vec = vec @ params["dense_3"].T
    return vec / jnp.maximum(jnp.linalg.norm(vec), 1e-12)


def load_params(reader) -> dict:
    """GGUF arch "gemma-embedding" -> forward() pytree. GGUF RMS-norm
    weights carry the Gemma +1 shift on disk (converter GemmaModel);
    dense_2/dense_3 are the optional sentence-transformers projections."""
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
        "output_norm": get("output_norm.weight"),
        "dense_2": get("dense_2.weight", required=False),
        "dense_3": get("dense_3.weight", required=False),
        "layers": [],
    }
    i = 0
    while f"blk.{i}.attn_q.weight" in reader.tensors:
        p = f"blk.{i}."
        params["layers"].append({
            "attn_norm": get(p + "attn_norm.weight"),
            "wq": get(p + "attn_q.weight"),
            "wk": get(p + "attn_k.weight"),
            "wv": get(p + "attn_v.weight"),
            "wo": get(p + "attn_output.weight"),
            "q_norm": get(p + "attn_q_norm.weight"),
            "k_norm": get(p + "attn_k_norm.weight"),
            "post_attention_norm": get(p + "post_attention_norm.weight"),
            "ffn_norm": get(p + "ffn_norm.weight"),
            "post_ffw_norm": get(p + "post_ffw_norm.weight"),
            "w_gate": get(p + "ffn_gate.weight"),
            "w_up": get(p + "ffn_up.weight"),
            "w_down": get(p + "ffn_down.weight"),
        })
        i += 1
    return params
