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
    # --- embedding-family variants (one llm_build_bert graph serves
    # bert / nomic-bert / nomic-bert-moe / jina-bert-v2 / jina-bert-v3;
    # neo-bert is its own pre-norm RMS graph, llm_build_neo_bert) ---
    variant: str = "bert"
    rope_base: float = 10000.0   # nomic/v3/neo rope instead of positions
    max_alibi: float = 0.0       # jina v2: ALiBi(8)
    moe_every: int = 0           # nomic-moe: MoE on layers il%n == 1
    n_experts: int = 0
    n_experts_used: int = 0

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
            ln_eps=float(g("attention.layer_norm_epsilon",
                           g("attention.layer_norm_rms_epsilon", 1e-12))),
            pooling=int(g("pooling_type", POOL_CLS)),
            act=str(g("activation", "gelu")),
            variant=arch,
            rope_base=float(g("rope.freq_base", 10000.0)),
            # loader-hardcoded for jina v2 (llama-model.cpp:831)
            max_alibi=8.0 if arch == "jina-bert-v2" else 0.0,
            moe_every=int(g("moe_every_n_layers", 0) or 0),
            n_experts=int(g("expert_count", 0) or 0),
            n_experts_used=int(g("expert_used_count", 0) or 0),
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
        # rope variants (nomic/jina-v3/neo) have no learned positions
        "position_embd": get("position_embd.weight", required=False),
        "embd_norm": get("token_embd_norm.weight", required=False),
        "embd_norm_b": get("token_embd_norm.bias", required=False),
        # neo_bert final encoder norm (output_norm_enc, RMS)
        "out_norm": get("output_norm.weight", required=False),
        # rank / classification heads (LLM_TENSOR_CLS{,_OUT})
        "cls": get("cls.weight", required=False),
        "cls_b": get("cls.bias", required=False),
        "cls_out": get("cls.output.weight", required=False),
        "cls_out_b": get("cls.output.bias", required=False),
        "layers": [],
    }
    i = 0
    while (f"blk.{i}.attn_q.weight" in reader.tensors
           or f"blk.{i}.attn_qkv.weight" in reader.tensors):
        p = f"blk.{i}."
        fused = f"{p}attn_qkv.weight" in reader.tensors
        lp = {
            "wqkv": get(p + "attn_qkv.weight", required=fused)
            if fused else None,
            "bqkv": get(p + "attn_qkv.bias", required=False),
            "wq": get(p + "attn_q.weight", required=not fused),
            "bq": get(p + "attn_q.bias", required=False),
            "wk": get(p + "attn_k.weight", required=not fused),
            "bk": get(p + "attn_k.bias", required=False),
            "wv": get(p + "attn_v.weight", required=not fused),
            "bv": get(p + "attn_v.bias", required=False),
            "wo": get(p + "attn_output.weight"),
            "bo": get(p + "attn_output.bias", required=False),
            # jina v2 optional full-width biased q/k LayerNorms
            "q_norm": get(p + "attn_q_norm.weight", required=False),
            "q_norm_b": get(p + "attn_q_norm.bias", required=False),
            "k_norm": get(p + "attn_k_norm.weight", required=False),
            "k_norm_b": get(p + "attn_k_norm.bias", required=False),
            # jina-v2-code second post-attention norm (ATTN_NORM_2)
            "attn_norm_2": get(p + "attn_norm_2.weight", required=False),
            "attn_norm_2_b": get(p + "attn_norm_2.bias", required=False),
            "attn_out_norm": get(p + "attn_output_norm.weight",
                                 required=False),
            "attn_out_norm_b": get(p + "attn_output_norm.bias",
                                   required=False),
            # neo_bert pre-norm RMS weights
            "attn_norm": get(p + "attn_norm.weight", required=False),
            "ffn_norm": get(p + "ffn_norm.weight", required=False),
            "w_up": get(p + "ffn_up.weight", required=False),
            "b_up": get(p + "ffn_up.bias", required=False),
            "w_gate": get(p + "ffn_gate.weight", required=False),
            "w_down": get(p + "ffn_down.weight", required=False),
            "b_down": get(p + "ffn_down.bias", required=False),
            "out_norm": get(p + "layer_output_norm.weight",
                            required=False),
            "out_norm_b": get(p + "layer_output_norm.bias",
                              required=False),
            # nomic-moe routed up/down-only experts
            "gate_inp": get(p + "ffn_gate_inp.weight", required=False),
            "up_exps": get(p + "ffn_up_exps.weight", required=False),
            "down_exps": get(p + "ffn_down_exps.weight", required=False),
        }
        params["layers"].append(lp)
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
    from ..kernels.rope import apply_rope

    t = tokens.shape[0]
    var = cfg.variant
    rope = var in ("nomic-bert", "nomic-bert-moe", "jina-bert-v3",
                   "neo-bert")
    # neo-bert ropes adjacent pairs (LLAMA_ROPE_TYPE_NORM,
    # llama-model.cpp:20112); nomic/jina-v3 are NEOX (:20124-20126)
    neox = var != "neo-bert"
    x = params["token_embd"][tokens]
    if params.get("position_embd") is not None:
        x = x + params["position_embd"][:t]
    if params.get("token_types") is not None:
        tt = (token_types if token_types is not None
              else jnp.zeros((t,), jnp.int32))
        x = x + params["token_types"][tt]
    if params.get("embd_norm") is not None:
        x = layer_norm(x, params["embd_norm"], params["embd_norm_b"],
                       cfg.ln_eps)

    bias_mask = jnp.where(valid, 0.0, -jnp.inf)[None, None, :]  # [1,1,T]
    if cfg.max_alibi > 0.0:  # jina v2 bidirectional ALiBi
        from ..kernels.attention import alibi_slopes

        slopes = jnp.asarray(alibi_slopes(cfg.n_heads, cfg.max_alibi))
        pos = jnp.arange(t)
        dist = -jnp.abs(pos[:, None] - pos[None, :]).astype(jnp.float32)
        bias_mask = bias_mask + slopes[:, None, None] * dist[None]
    h, dh = cfg.n_heads, cfg.head_dim
    pos_ids = jnp.arange(t, dtype=jnp.int32)
    # HF "gelu" is the exact erf form; "gelu_new"/"gelu_pytorch_tanh" the
    # tanh approximation (jax.nn.gelu's default is the APPROXIMATE one)
    act = (lambda z: jax.nn.gelu(z, approximate=cfg.act != "gelu"))
    for li, lp in enumerate(params["layers"]):
        xin = x
        hn = x
        if var == "neo-bert":  # pre-norm RMS (llm_build_neo_bert)
            hn = xin * jax.lax.rsqrt(
                jnp.mean(jnp.square(xin), -1, keepdims=True)
                + cfg.ln_eps) * lp["attn_norm"]
        if lp.get("wqkv") is not None:
            qkv = hn @ lp["wqkv"].T
            if lp.get("bqkv") is not None:
                qkv = qkv + lp["bqkv"]
            d = cfg.d_model
            q = qkv[:, :d].reshape(t, h, dh)
            k = qkv[:, d:2 * d].reshape(t, h, dh)
            v = qkv[:, 2 * d:].reshape(t, h, dh)
        else:
            q = (hn @ lp["wq"].T + lp["bq"]).reshape(t, h, dh)
            k = (hn @ lp["wk"].T + lp["bk"]).reshape(t, h, dh)
            v = (hn @ lp["wv"].T + lp["bv"]).reshape(t, h, dh)
        if lp.get("q_norm") is not None:  # jina v2 full-width LN
            q = layer_norm(q.reshape(t, -1), lp["q_norm"],
                           lp["q_norm_b"], cfg.ln_eps).reshape(t, h, dh)
            k = layer_norm(k.reshape(t, -1), lp["k_norm"],
                           lp["k_norm_b"], cfg.ln_eps).reshape(t, h, dh)
        if rope:
            q = apply_rope(q, pos_ids, cfg.rope_base, neox=neox)
            k = apply_rope(k, pos_ids, cfg.rope_base, neox=neox)
        scores = jnp.einsum("qhd,khd->hqk", q, k) / dh ** 0.5
        p = jax.nn.softmax(scores + bias_mask, axis=-1)
        attn = jnp.einsum("hqk,khd->qhd", p, v).reshape(t, cfg.d_model)
        attn = attn @ lp["wo"].T
        if lp.get("bo") is not None:
            attn = attn + lp["bo"]

        if var == "neo-bert":
            x = xin + attn
            hn2 = x * jax.lax.rsqrt(
                jnp.mean(jnp.square(x), -1, keepdims=True)
                + cfg.ln_eps) * lp["ffn_norm"]
            # fused SwiGLU up [2F, d] (LLM_FFN_SWIGLU SEQ)
            gu = hn2 @ lp["w_up"].T
            f = gu.shape[-1] // 2
            x = x + (jax.nn.silu(gu[:, :f]) * gu[:, f:]) @ lp["w_down"].T
            continue

        x = layer_norm(x + attn, lp["attn_out_norm"],
                       lp["attn_out_norm_b"], cfg.ln_eps)
        if lp.get("attn_norm_2") is not None:  # jina-v2-code
            x = layer_norm(x + xin, lp["attn_norm_2"],
                           lp["attn_norm_2_b"], cfg.ln_eps)
        if (cfg.moe_every > 0 and li % cfg.moe_every == 1
                and lp.get("gate_inp") is not None):
            # nomic-moe: up/down-only GELU experts, softmax top-k
            # WITHOUT weight renorm (build_moe_ffn norm_w=false)
            logits = x @ lp["gate_inp"].T
            probs = jax.nn.softmax(logits, axis=-1)
            wsel, idx = jax.lax.top_k(probs, cfg.n_experts_used)
            ue = lp["up_exps"][idx]        # [T, K, F, D]
            de = lp["down_exps"][idx]      # [T, K, D, F]
            u = act(jnp.einsum("td,tkfd->tkf", x, ue))
            ff = jnp.einsum("tkf,tkdf->tkd", u, de)
            ff = jnp.einsum("tk,tkd->td", wsel, ff)
        elif var == "jina-bert-v2":
            # gated GELU (gate tensor) or fused GEGLU (up holds gate|up)
            if lp.get("w_gate") is not None:
                ff = ((act(x @ lp["w_gate"].T) * (x @ lp["w_up"].T))
                      @ lp["w_down"].T)
            else:
                gu = x @ lp["w_up"].T
                f = gu.shape[-1] // 2
                ff = (act(gu[:, :f]) * gu[:, f:]) @ lp["w_down"].T
            ff = ff + lp["b_down"]
        elif var == "nomic-bert":
            # SwiGLU (silu par, no biases)
            ff = ((jax.nn.silu(x @ lp["w_gate"].T) * (x @ lp["w_up"].T))
                  @ lp["w_down"].T)
        else:  # bert / v3 / nomic-moe dense layers: biased GELU
            ff = (act(x @ lp["w_up"].T + lp["b_up"]) @ lp["w_down"].T
                  + lp["b_down"])
        x = layer_norm(x + ff, lp["out_norm"], lp["out_norm_b"],
                       cfg.ln_eps)
    if var == "neo-bert":  # final encoder RMS norm (output_norm_enc)
        x = x * jax.lax.rsqrt(
            jnp.mean(jnp.square(x), -1, keepdims=True)
            + cfg.ln_eps) * params["out_norm"]
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
