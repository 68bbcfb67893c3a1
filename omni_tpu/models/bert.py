"""BERT-style bidirectional encoder for embeddings and rerank.

Counterpart of the reference's BERT support (llm_build_bert in
src/llama-model.cpp + build_pooling, src/llama-graph.cpp): learned
absolute positions + token-type embeddings, post-norm transformer blocks
with biased LayerNorms, biased q/k/v/o and ffn projections, GELU, and
CLS/MEAN/RANK pooling.  The reference uses this for embedding models
(bge, nomic, e5) and cross-encoder rerankers (the cls head).

TPU-first: the whole encoder is ONE jittable function over a padded
[T, d] bucket with a validity mask — no KV cache (encoders re-read the
full sequence), bf16 matmuls on the MXU with f32 LayerNorm statistics.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from ..kernels.norms import layer_norm

POOL_NONE, POOL_MEAN, POOL_CLS, POOL_LAST, POOL_RANK = 0, 1, 2, 3, 4


@dataclasses.dataclass(frozen=True)
class BertConfig:
    n_layers: int
    d_model: int
    d_ff: int
    n_heads: int
    n_vocab: int
    n_ctx: int = 512
    n_types: int = 2
    ln_eps: float = 1e-12
    pooling: int = POOL_CLS
    act: str = "gelu"

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @staticmethod
    def from_gguf(kv: dict[str, Any]) -> "BertConfig":
        arch = kv.get("general.architecture", "bert")
        g = lambda key, default=None: kv.get(f"{arch}.{key}", default)
        return BertConfig(
            n_layers=int(g("block_count")),
            d_model=int(g("embedding_length")),
            d_ff=int(g("feed_forward_length")),
            n_heads=int(g("attention.head_count")),
            n_vocab=int(g("vocab_size")),
            n_ctx=int(g("context_length", 512)),
            n_types=int(g("token_type_count", 2)),
            ln_eps=float(g("attention.layer_norm_epsilon", 1e-12)),
            pooling=int(g("pooling_type", POOL_CLS)),
            act=str(g("activation", "gelu")),
        )


def load_params(reader) -> dict:
    """GGUF arch "bert" -> parameter pytree (reference tensor names,
    convert_hf_to_gguf.py BertModel)."""
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
        "token_types": get("token_types.weight", required=False),
        "position_embd": get("position_embd.weight"),
        "embd_norm": get("token_embd_norm.weight"),
        "embd_norm_b": get("token_embd_norm.bias"),
        # rank / classification heads (LLM_TENSOR_CLS{,_OUT})
        "cls": get("cls.weight", required=False),
        "cls_b": get("cls.bias", required=False),
        "cls_out": get("cls.output.weight", required=False),
        "cls_out_b": get("cls.output.bias", required=False),
        "layers": [],
    }
    i = 0
    while f"blk.{i}.attn_q.weight" in reader.tensors:
        p = f"blk.{i}."
        params["layers"].append({
            "wq": get(p + "attn_q.weight"), "bq": get(p + "attn_q.bias"),
            "wk": get(p + "attn_k.weight"), "bk": get(p + "attn_k.bias"),
            "wv": get(p + "attn_v.weight"), "bv": get(p + "attn_v.bias"),
            "wo": get(p + "attn_output.weight"),
            "bo": get(p + "attn_output.bias"),
            "attn_out_norm": get(p + "attn_output_norm.weight"),
            "attn_out_norm_b": get(p + "attn_output_norm.bias"),
            "w_up": get(p + "ffn_up.weight"), "b_up": get(p + "ffn_up.bias"),
            "w_down": get(p + "ffn_down.weight"),
            "b_down": get(p + "ffn_down.bias"),
            "out_norm": get(p + "layer_output_norm.weight"),
            "out_norm_b": get(p + "layer_output_norm.bias"),
        })
        i += 1
    return params


def forward(params: dict, cfg: BertConfig, tokens: jax.Array,
            valid: jax.Array, token_types: jax.Array | None = None,
            ) -> jax.Array:
    """Full bidirectional encode of one padded sequence.

    tokens [T] int32 (padded), valid [T] bool -> hidden states [T, d]
    f32. Attention is bidirectional but masked to valid positions, so a
    padded bucket produces exactly the unpadded result — the bucket-
    compile discipline the decode engine uses (runtime/context.py).
    """
    t = tokens.shape[0]
    x = params["token_embd"][tokens]
    x = x + params["position_embd"][:t]
    if params.get("token_types") is not None:
        tt = (token_types if token_types is not None
              else jnp.zeros((t,), jnp.int32))
        x = x + params["token_types"][tt]
    x = layer_norm(x, params["embd_norm"], params["embd_norm_b"], cfg.ln_eps)

    bias_mask = jnp.where(valid, 0.0, -jnp.inf)[None, None, :]  # [1,1,T]
    h, dh = cfg.n_heads, cfg.head_dim
    # HF "gelu" is the exact erf form; "gelu_new"/"gelu_pytorch_tanh" the
    # tanh approximation (jax.nn.gelu's default is the APPROXIMATE one)
    act = (lambda z: jax.nn.gelu(z, approximate=cfg.act != "gelu"))
    for lp in params["layers"]:
        q = (x @ lp["wq"].T + lp["bq"]).reshape(t, h, dh)
        k = (x @ lp["wk"].T + lp["bk"]).reshape(t, h, dh)
        v = (x @ lp["wv"].T + lp["bv"]).reshape(t, h, dh)
        scores = jnp.einsum("qhd,khd->hqk", q, k) / dh ** 0.5
        p = jax.nn.softmax(scores + bias_mask, axis=-1)
        attn = jnp.einsum("hqk,khd->qhd", p, v).reshape(t, cfg.d_model)
        attn = attn @ lp["wo"].T + lp["bo"]
        x = layer_norm(x + attn, lp["attn_out_norm"], lp["attn_out_norm_b"],
                       cfg.ln_eps)
        ff = act(x @ lp["w_up"].T + lp["b_up"]) @ lp["w_down"].T + lp["b_down"]
        x = layer_norm(x + ff, lp["out_norm"], lp["out_norm_b"], cfg.ln_eps)
    return x


def pool(params: dict, cfg: BertConfig, hidden: jax.Array,
         valid: jax.Array) -> jax.Array:
    """build_pooling semantics: MEAN averages valid positions, CLS takes
    position 0, RANK feeds CLS through the cls (dense+tanh) and
    cls.output heads to a scalar score."""
    if cfg.pooling == POOL_MEAN:
        w = valid.astype(jnp.float32)
        emb = (hidden * w[:, None]).sum(0) / jnp.maximum(w.sum(), 1.0)
    elif cfg.pooling in (POOL_CLS, POOL_RANK):
        emb = hidden[0]
    elif cfg.pooling == POOL_LAST:
        emb = hidden[jnp.maximum(valid.astype(jnp.int32).sum() - 1, 0)]
    else:
        return hidden
    if cfg.pooling == POOL_RANK:
        if params.get("cls") is not None:
            emb = jnp.tanh(params["cls"] @ emb
                           + (params["cls_b"]
                              if params.get("cls_b") is not None else 0.0))
        if params.get("cls_out") is not None:
            emb = (params["cls_out"] @ emb
                   + (params["cls_out_b"]
                      if params.get("cls_out_b") is not None else 0.0))
    return emb


def encode(params: dict, cfg: BertConfig, tokens, token_types=None,
           normalize: bool = True):
    """Host-facing embed: pads to the next power-of-two bucket (compile
    reuse), runs the jitted forward+pool, L2-normalizes (the server
    /embedding contract)."""
    import numpy as np

    n = len(tokens)
    bucket = max(8, 1 << (n - 1).bit_length())
    toks = np.zeros(bucket, np.int32)
    toks[:n] = tokens
    tt = np.zeros(bucket, np.int32)
    if token_types is not None:
        tt[:n] = token_types
    valid = np.arange(bucket) < n
    out = _encode_jit(params, cfg, jnp.asarray(toks), jnp.asarray(valid),
                      jnp.asarray(tt))
    out = np.asarray(out, np.float32)
    if normalize and cfg.pooling in (POOL_MEAN, POOL_CLS, POOL_LAST):
        out = out / max(float(np.linalg.norm(out)), 1e-12)
    return out


@functools.partial(jax.jit, static_argnums=1)
def _encode_jit(params, cfg: BertConfig, toks, valid, tt):
    return pool(params, cfg, forward(params, cfg, toks, valid, tt), valid)
