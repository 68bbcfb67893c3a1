"""T5 encoder-decoder arch — GGUF archs "t5" / "t5encoder".

Counterpart of the reference's llm_build_t5_enc / llm_build_t5_dec
(src/llama-model.cpp:13931/14032) and llama_relative_position_bucket
(src/llama-graph.cpp:1988): RMS ("T5LayerNorm") norms, UNscaled attention
(scale 1.0 — folded into init), learned relative-position bucket biases
(shared from layer 0, bidirectional buckets in the encoder, unidirectional
in the decoder), decoder cross-attention over the encoder output, and
relu (t5) or gated-gelu (flan-t5) FFNs. Head width d_kv is independent of
d_model/n_heads. Tokenization is the UGM engine (tokenizer/ugm.py) with
the precompiled charsmap.

TPU-first: encode() is one jitted pass; decode() evaluates a full decoder
prefix (bias matrices are O(T^2) gathers, fine for enc-dec lengths);
stepwise generation carries a DecCache of per-layer self-attention K/V
plus the precomputed cross K/V (computed ONCE from the encoder output —
the standard enc-dec serving split)."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..kernels.norms import rms_norm

MAX_DISTANCE = 128  # llama-graph.cpp:1990 (fixed for all shipped T5s)


@dataclasses.dataclass(frozen=True)
class T5Config:
    n_enc_layers: int
    n_dec_layers: int
    d_model: int
    n_heads: int
    d_kv: int
    d_ff: int
    n_buckets: int = 32
    rms_eps: float = 1e-6
    n_vocab: int = 256
    decoder_start: int = 0

    @staticmethod
    def from_gguf(kv: dict[str, Any]) -> "T5Config":
        arch = kv.get("general.architecture", "t5")
        g = lambda key, default: kv.get(f"{arch}.{key}", default)
        n = int(g("block_count", 2))
        return T5Config(
            n_enc_layers=n,
            n_dec_layers=int(g("decoder_block_count", n)),
            d_model=int(g("embedding_length", 256)),
            n_heads=int(g("attention.head_count", 8)),
            d_kv=int(g("attention.key_length", 64)),
            d_ff=int(g("feed_forward_length", 1024)),
            n_buckets=int(g("attention.relative_buckets_count", 32)),
            rms_eps=float(g("attention.layer_norm_rms_epsilon", 1e-6)),
            n_vocab=int(g("vocab_size", 256)),
            decoder_start=int(g("decoder_start_token_id", 0)),
        )


def rel_bucket(q_pos: jax.Array, k_pos: jax.Array, n_buckets: int,
               bidirectional: bool) -> jax.Array:
    """[Tq], [Tk] -> [Tq, Tk] bucket ids (llama_relative_position_bucket /
    HF T5Attention._relative_position_bucket: rp = key - query)."""
    rp = k_pos[None, :] - q_pos[:, None]
    nb = n_buckets
    out = jnp.zeros_like(rp)
    if bidirectional:
        nb = nb // 2
        out = out + (rp > 0).astype(jnp.int32) * nb
        rp = jnp.abs(rp)
    else:
        rp = -jnp.minimum(rp, 0)
    max_exact = nb // 2
    large = (max_exact + (jnp.log(jnp.maximum(rp, 1) / max_exact)
                          / np.log(MAX_DISTANCE / max_exact)
                          * (nb - max_exact))).astype(jnp.int32)
    large = jnp.minimum(large, nb - 1)
    return out + jnp.where(rp < max_exact, rp, large)


def _attn(lp: dict, pfx: str, cfg: T5Config, hn: jax.Array,
          kv_src: jax.Array, bias: jax.Array | None,
          mask: jax.Array | None) -> jax.Array:
    """Unscaled multi-head attention. hn [Tq, d]; kv_src [Tk, d];
    bias [H, Tq, Tk] or None; mask [Tq, Tk] bool or None."""
    h, dk = cfg.n_heads, cfg.d_kv
    tq, tk = hn.shape[0], kv_src.shape[0]
    q = (hn @ lp[pfx + "q"].T).reshape(tq, h, dk)
    k = (kv_src @ lp[pfx + "k"].T).reshape(tk, h, dk)
    v = (kv_src @ lp[pfx + "v"].T).reshape(tk, h, dk)
    scores = jnp.einsum("qhd,khd->hqk", q, k,
                        preferred_element_type=jnp.float32)
    if bias is not None:
        scores = scores + bias
    if mask is not None:
        scores = jnp.where(mask[None], scores, -1e30)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hqk,khd->qhd", p.astype(v.dtype), v)
    return out.reshape(tq, h * dk) @ lp[pfx + "o"].T


def _ffn(lp: dict, hn: jax.Array) -> jax.Array:
    if lp.get("ffn_gate") is not None:  # flan: gated gelu
        g = jax.nn.gelu(hn @ lp["ffn_gate"].T, approximate=True)
        return (g * (hn @ lp["ffn_up"].T)) @ lp["ffn_down"].T
    return jax.nn.relu(hn @ lp["ffn_up"].T) @ lp["ffn_down"].T


def _pos_bias(rel_b: jax.Array, q_pos, k_pos, n_buckets,
              bidirectional) -> jax.Array:
    """rel_b [n_buckets, H] -> [H, Tq, Tk] additive score bias."""
    buckets = rel_bucket(q_pos, k_pos, n_buckets, bidirectional)
    return rel_b[buckets].transpose(2, 0, 1)


def encode(params: dict, cfg: T5Config, tokens: jax.Array) -> jax.Array:
    """[T] -> encoder hidden states [T, d] (llm_build_t5_enc)."""
    t = tokens.shape[0]
    pos = jnp.arange(t, dtype=jnp.int32)
    x = params["token_embd"][tokens].astype(jnp.float32)
    rel_b = params["enc_layers"][0]["attn_rel_b"]
    bias = _pos_bias(rel_b, pos, pos, cfg.n_buckets, bidirectional=True)
    for lp in params["enc_layers"]:
        hn = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        x = x + _attn(lp, "attn_", cfg, hn, hn, bias, None)
        hn = rms_norm(x, lp["ffn_norm"], cfg.rms_eps)
        x = x + _ffn(lp, hn)
    return rms_norm(x, params["enc_output_norm"], cfg.rms_eps)


def decode(params: dict, cfg: T5Config, dec_tokens: jax.Array,
           enc_out: jax.Array) -> jax.Array:
    """Full-prefix decoder pass: [Td] tokens + [Te, d] encoder output ->
    logits [Td, V] (llm_build_t5_dec)."""
    td, te = dec_tokens.shape[0], enc_out.shape[0]
    pos = jnp.arange(td, dtype=jnp.int32)
    epos = jnp.arange(te, dtype=jnp.int32)
    x = params["token_embd"][dec_tokens].astype(jnp.float32)
    rel_b = params["dec_layers"][0]["attn_rel_b"]
    bias = _pos_bias(rel_b, pos, pos, cfg.n_buckets, bidirectional=False)
    causal = pos[None, :] <= pos[:, None]
    enc_f = enc_out.astype(jnp.float32)
    for lp in params["dec_layers"]:
        hn = rms_norm(x, lp["attn_norm"], cfg.rms_eps)
        x = x + _attn(lp, "attn_", cfg, hn, hn, bias, causal)
        hn = rms_norm(x, lp["cross_attn_norm"], cfg.rms_eps)
        x = x + _attn(lp, "cross_attn_", cfg, hn, enc_f, None, None)
        hn = rms_norm(x, lp["ffn_norm"], cfg.rms_eps)
        x = x + _ffn(lp, hn)
    hidden = rms_norm(x, params["dec_output_norm"], cfg.rms_eps)
    head = params.get("output")
    if head is None:
        head = params["token_embd"]
    return hidden @ head.T.astype(hidden.dtype)


def generate_greedy(params: dict, cfg: T5Config, enc_tokens: jax.Array,
                    n_new: int, eos_id: int | None = None) -> list[int]:
    """Greedy enc-dec generation (full-prefix re-eval per step — exact,
    used by tests and the CLI encode/translate path)."""
    enc_out = encode(params, cfg, enc_tokens)
    dec = [cfg.decoder_start]
    for _ in range(n_new):
        logits = decode(params, cfg, jnp.asarray(dec, jnp.int32), enc_out)
        nxt = int(jnp.argmax(logits[-1]))
        dec.append(nxt)
        if eos_id is not None and nxt == eos_id:
            break
    return dec[1:]


def load_params(reader, cfg: T5Config) -> dict:
    """GGUF arch "t5"/"t5encoder" -> pytree (enc.blk.N.* / dec.blk.N.*
    names, llama-arch.cpp:1524-1556)."""
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
        "enc_output_norm": get("enc.output_norm.weight"),
        "enc_layers": [],
    }
    for i in range(cfg.n_enc_layers):
        p = f"enc.blk.{i}."
        params["enc_layers"].append({
            "attn_norm": get(p + "attn_norm.weight"),
            "attn_q": get(p + "attn_q.weight"),
            "attn_k": get(p + "attn_k.weight"),
            "attn_v": get(p + "attn_v.weight"),
            "attn_o": get(p + "attn_o.weight"),
            "attn_rel_b": get(p + "attn_rel_b.weight", required=i == 0),
            "ffn_norm": get(p + "ffn_norm.weight"),
            "ffn_gate": get(p + "ffn_gate.weight", required=False),
            "ffn_up": get(p + "ffn_up.weight"),
            "ffn_down": get(p + "ffn_down.weight"),
        })
    if "dec.output_norm.weight" in reader.tensors:
        params["dec_output_norm"] = get("dec.output_norm.weight")
        params["dec_layers"] = []
        for i in range(cfg.n_dec_layers):
            p = f"dec.blk.{i}."
            params["dec_layers"].append({
                "attn_norm": get(p + "attn_norm.weight"),
                "attn_q": get(p + "attn_q.weight"),
                "attn_k": get(p + "attn_k.weight"),
                "attn_v": get(p + "attn_v.weight"),
                "attn_o": get(p + "attn_o.weight"),
                "attn_rel_b": get(p + "attn_rel_b.weight",
                                  required=i == 0),
                "cross_attn_norm": get(p + "cross_attn_norm.weight"),
                "cross_attn_q": get(p + "cross_attn_q.weight"),
                "cross_attn_k": get(p + "cross_attn_k.weight"),
                "cross_attn_v": get(p + "cross_attn_v.weight"),
                "cross_attn_o": get(p + "cross_attn_o.weight"),
                "ffn_norm": get(p + "ffn_norm.weight"),
                "ffn_gate": get(p + "ffn_gate.weight", required=False),
                "ffn_up": get(p + "ffn_up.weight"),
                "ffn_down": get(p + "ffn_down.weight"),
            })
    out = get("output.weight", required=False)
    if out is not None:
        params["output"] = out
    return params
