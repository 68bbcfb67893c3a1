"""Embedding-BERT family parity (reference llm_build_bert variants +
llm_build_neo_bert, src/llama-model.cpp:7872-8175): nomic-bert (rope +
SwiGLU), nomic-bert-moe (routed up/down-only GELU experts every 2nd
layer), jina-bert-v2 (bidirectional ALiBi + fused GEGLU + qk norms),
jina-bert-v3 (XLMRoberta naming + rope), neo-bert (pre-norm RMS +
rope-NORM + fused SwiGLU).

The HF modeling code for these is trust_remote_code (not importable
here), so each test fabricates a checkpoint in the real HF tensor
naming, converts it through convert_llm, and checks the engine against
an independent numpy oracle composed per the reference graph.
"""
import math

import numpy as np
import pytest

import np_oracle as orc
from omni_tpu.core.dtypes import GGMLType
from omni_tpu.core.gguf import GGUFReader
from omni_tpu.models import bert

D, H, F, V, L = 32, 4, 48, 64, 2


def _erf_gelu(x):
    return 0.5 * x * (1.0 + np.vectorize(math.erf)(
        (x / math.sqrt(2.0)).astype(np.float64))).astype(np.float32)


def _r(rng, *shape, s=0.25):
    return (rng.standard_normal(shape) * s).astype(np.float32)


def _ln_w(rng, n):
    return (1.0 + 0.1 * rng.standard_normal(n)).astype(np.float32)


def _convert(state, config, tmp_path, arch, name):
    from omni_tpu.convert.hf_to_gguf import convert_llm

    path = tmp_path / f"{name}.gguf"
    convert_llm(state, config, path, arch=arch, qtype=GGMLType.F32)
    reader = GGUFReader(path)
    assert reader.kv["general.architecture"] == arch
    return bert.BertConfig.from_gguf(reader.kv), bert.load_params(reader)


def _run(cfg, params, toks):
    import jax.numpy as jnp

    return np.asarray(bert.forward(
        params, cfg, jnp.asarray(toks), jnp.ones(len(toks), bool)))


def _attn_rope(x, st, p, pos, fused_bias=False, neox=True, base=10000.0):
    """Shared fused-Wqkv rope attention oracle step (nomic/neo)."""
    t = x.shape[0]
    wqkv = st[p + ("attn.Wqkv.weight" if p.startswith("encoder")
                   else "qkv.weight")]
    qkv = x @ wqkv.T
    if fused_bias:
        qkv = qkv + st[p + "attn.Wqkv.bias"]
    q = qkv[:, :D].reshape(t, H, D // H)
    k = qkv[:, D:2 * D].reshape(t, H, D // H)
    v = qkv[:, 2 * D:].reshape(t, H, D // H)
    q = orc.rope(q, pos, base=base, neox=neox)
    k = orc.rope(k, pos, base=base, neox=neox)
    return orc.attention(q, k, v, causal=False).reshape(t, D)


def test_nomic_bert_matches_oracle(tmp_path):
    rng = np.random.default_rng(0)
    st = {"embeddings.word_embeddings.weight": _r(rng, V, D),
          "embeddings.token_type_embeddings.weight": _r(rng, 2, D),
          "emb_ln.weight": _ln_w(rng, D),
          "emb_ln.bias": _r(rng, D, s=0.05)}
    for i in range(L):
        p = f"encoder.layers.{i}."
        st[p + "attn.Wqkv.weight"] = _r(rng, 3 * D, D)
        st[p + "attn.out_proj.weight"] = _r(rng, D, D)
        st[p + "norm1.weight"] = _ln_w(rng, D)
        st[p + "norm1.bias"] = _r(rng, D, s=0.05)
        st[p + "norm2.weight"] = _ln_w(rng, D)
        st[p + "norm2.bias"] = _r(rng, D, s=0.05)
        st[p + "mlp.fc11.weight"] = _r(rng, F, D)   # up
        st[p + "mlp.fc12.weight"] = _r(rng, F, D)   # gate
        st[p + "mlp.fc2.weight"] = _r(rng, D, F)
    config = dict(n_layer=L, n_embd=D, n_head=H, n_inner=F, vocab_size=V,
                  n_positions=8192, max_trained_positions=2048,
                  type_vocab_size=2, layer_norm_epsilon=1e-12,
                  rotary_emb_base=1000.0, activation_function="swiglu",
                  model_type="nomic_bert")
    cfg, params = _convert(st, config, tmp_path, "nomic-bert", "nomic")
    assert cfg.n_ctx == 2048 and cfg.rope_base == 1000.0

    toks = np.array([1, 5, 9, 30, 2], np.int32)
    pos = np.arange(len(toks))
    x = (st["embeddings.word_embeddings.weight"][toks]
         + st["embeddings.token_type_embeddings.weight"][0])
    x = orc.layer_norm(x, st["emb_ln.weight"], st["emb_ln.bias"], 1e-12)
    for i in range(L):
        p = f"encoder.layers.{i}."
        attn = _attn_rope(x, st, p, pos, base=1000.0)
        attn = attn @ st[p + "attn.out_proj.weight"].T
        x = orc.layer_norm(x + attn, st[p + "norm1.weight"],
                           st[p + "norm1.bias"], 1e-12)
        ff = (orc.silu(x @ st[p + "mlp.fc12.weight"].T)
              * (x @ st[p + "mlp.fc11.weight"].T)
              ) @ st[p + "mlp.fc2.weight"].T
        x = orc.layer_norm(x + ff, st[p + "norm2.weight"],
                           st[p + "norm2.bias"], 1e-12)
    np.testing.assert_allclose(_run(cfg, params, toks), x, atol=2e-4)


def test_nomic_bert_moe_matches_oracle(tmp_path):
    rng = np.random.default_rng(1)
    E, K = 4, 2
    st = {"embeddings.word_embeddings.weight": _r(rng, V, D),
          "embeddings.token_type_embeddings.weight": _r(rng, 2, D),
          "emb_ln.weight": _ln_w(rng, D),
          "emb_ln.bias": _r(rng, D, s=0.05)}
    for i in range(L):
        p = f"encoder.layers.{i}."
        st[p + "attn.Wqkv.weight"] = _r(rng, 3 * D, D)
        st[p + "attn.Wqkv.bias"] = _r(rng, 3 * D, s=0.05)
        st[p + "attn.out_proj.weight"] = _r(rng, D, D)
        st[p + "attn.out_proj.bias"] = _r(rng, D, s=0.05)
        st[p + "norm1.weight"] = _ln_w(rng, D)
        st[p + "norm1.bias"] = _r(rng, D, s=0.05)
        st[p + "norm2.weight"] = _ln_w(rng, D)
        st[p + "norm2.bias"] = _r(rng, D, s=0.05)
        if i % 2 == 1:  # MoE layer (moe_every_n_layers=2)
            st[p + "mlp.router.layer.weight"] = _r(rng, E, D)
            st[p + "mlp.experts.mlp.w1"] = _r(rng, E, F, D)
            st[p + "mlp.experts.mlp.w2"] = _r(rng, E, F, D)
        else:  # dense biased GELU
            st[p + "mlp.fc1.weight"] = _r(rng, F, D)
            st[p + "mlp.fc1.bias"] = _r(rng, F, s=0.05)
            st[p + "mlp.fc2.weight"] = _r(rng, D, F)
            st[p + "mlp.fc2.bias"] = _r(rng, D, s=0.05)
    config = dict(n_layer=L, n_embd=D, n_head=H, n_inner=F, vocab_size=V,
                  n_positions=2048, max_trained_positions=2048,
                  type_vocab_size=2, layer_norm_epsilon=1e-12,
                  rotary_emb_base=10000.0, activation_function="gelu",
                  moe_every_n_layers=2, num_experts=E, moe_top_k=K,
                  model_type="nomic_bert")
    cfg, params = _convert(st, config, tmp_path, "nomic-bert-moe", "nmoe")
    assert cfg.n_ctx == 512 and cfg.moe_every == 2

    toks = np.array([3, 7, 11, 2], np.int32)
    pos = np.arange(len(toks))
    x = (st["embeddings.word_embeddings.weight"][toks]
         + st["embeddings.token_type_embeddings.weight"][0])
    x = orc.layer_norm(x, st["emb_ln.weight"], st["emb_ln.bias"], 1e-12)
    for i in range(L):
        p = f"encoder.layers.{i}."
        attn = _attn_rope(x, st, p, pos, fused_bias=True)
        attn = (attn @ st[p + "attn.out_proj.weight"].T
                + st[p + "attn.out_proj.bias"])
        x = orc.layer_norm(x + attn, st[p + "norm1.weight"],
                           st[p + "norm1.bias"], 1e-12)
        if i % 2 == 1:
            logits = x @ st[p + "mlp.router.layer.weight"].T
            probs = np.exp(logits - logits.max(-1, keepdims=True))
            probs = probs / probs.sum(-1, keepdims=True)
            idx = np.argsort(-probs, axis=-1)[:, :2]
            ff = np.zeros_like(x)
            for t in range(x.shape[0]):
                for e in idx[t]:
                    u = _erf_gelu(st[p + "mlp.experts.mlp.w1"][e] @ x[t])
                    dn = st[p + "mlp.experts.mlp.w2"][e].T @ u
                    ff[t] += probs[t, e] * dn  # NO weight renorm
        else:
            ff = (_erf_gelu(x @ st[p + "mlp.fc1.weight"].T
                            + st[p + "mlp.fc1.bias"])
                  @ st[p + "mlp.fc2.weight"].T + st[p + "mlp.fc2.bias"])
        x = orc.layer_norm(x + ff, st[p + "norm2.weight"],
                           st[p + "norm2.bias"], 1e-12)
    np.testing.assert_allclose(_run(cfg, params, toks), x, atol=2e-4)


def test_jina_bert_v2_matches_oracle(tmp_path):
    rng = np.random.default_rng(2)
    st = {"embeddings.word_embeddings.weight": _r(rng, V, D),
          "embeddings.token_type_embeddings.weight": _r(rng, 2, D),
          "embeddings.LayerNorm.weight": _ln_w(rng, D),
          "embeddings.LayerNorm.bias": _r(rng, D, s=0.05)}
    for i in range(L):
        p = f"encoder.layer.{i}."
        for w_ in ("query", "key", "value"):
            st[p + f"attention.self.{w_}.weight"] = _r(rng, D, D)
            st[p + f"attention.self.{w_}.bias"] = _r(rng, D, s=0.05)
        st[p + "attention.self.layer_norm_q.weight"] = _ln_w(rng, D)
        st[p + "attention.self.layer_norm_q.bias"] = _r(rng, D, s=0.05)
        st[p + "attention.self.layer_norm_k.weight"] = _ln_w(rng, D)
        st[p + "attention.self.layer_norm_k.bias"] = _r(rng, D, s=0.05)
        st[p + "attention.output.dense.weight"] = _r(rng, D, D)
        st[p + "attention.output.dense.bias"] = _r(rng, D, s=0.05)
        st[p + "attention.output.LayerNorm.weight"] = _ln_w(rng, D)
        st[p + "attention.output.LayerNorm.bias"] = _r(rng, D, s=0.05)
        st[p + "mlp.gated_layers.weight"] = _r(rng, 2 * F, D)
        st[p + "mlp.wo.weight"] = _r(rng, D, F)
        st[p + "mlp.wo.bias"] = _r(rng, D, s=0.05)
        st[p + "mlp.layernorm.weight"] = _ln_w(rng, D)
        st[p + "mlp.layernorm.bias"] = _r(rng, D, s=0.05)
    config = dict(num_hidden_layers=L, hidden_size=D,
                  num_attention_heads=H, intermediate_size=F,
                  vocab_size=V, type_vocab_size=2, layer_norm_eps=1e-12,
                  max_position_embeddings=8192, hidden_act="gelu",
                  model_type="bert", feed_forward_type="geglu")
    cfg, params = _convert(st, config, tmp_path, "jina-bert-v2", "jina2")
    assert cfg.max_alibi == 8.0

    toks = np.array([4, 8, 12, 33, 2, 9], np.int32)
    t = len(toks)
    slopes = orc.alibi_slopes(H, 8.0)
    x = (st["embeddings.word_embeddings.weight"][toks]
         + st["embeddings.token_type_embeddings.weight"][0])
    x = orc.layer_norm(x, st["embeddings.LayerNorm.weight"],
                       st["embeddings.LayerNorm.bias"], 1e-12)
    for i in range(L):
        p = f"encoder.layer.{i}."
        q = (x @ st[p + "attention.self.query.weight"].T
             + st[p + "attention.self.query.bias"])
        k = (x @ st[p + "attention.self.key.weight"].T
             + st[p + "attention.self.key.bias"])
        v = (x @ st[p + "attention.self.value.weight"].T
             + st[p + "attention.self.value.bias"])
        q = orc.layer_norm(q, st[p + "attention.self.layer_norm_q.weight"],
                           st[p + "attention.self.layer_norm_q.bias"],
                           1e-12)
        k = orc.layer_norm(k, st[p + "attention.self.layer_norm_k.weight"],
                           st[p + "attention.self.layer_norm_k.bias"],
                           1e-12)
        attn = orc.attention(q.reshape(t, H, D // H),
                             k.reshape(t, H, D // H),
                             v.reshape(t, H, D // H),
                             causal=False, alibi_bias=slopes).reshape(t, D)
        attn = (attn @ st[p + "attention.output.dense.weight"].T
                + st[p + "attention.output.dense.bias"])
        x = orc.layer_norm(x + attn,
                           st[p + "attention.output.LayerNorm.weight"],
                           st[p + "attention.output.LayerNorm.bias"],
                           1e-12)
        gu = x @ st[p + "mlp.gated_layers.weight"].T
        ff = (_erf_gelu(gu[:, :F]) * gu[:, F:]) @ st[p + "mlp.wo.weight"].T
        ff = ff + st[p + "mlp.wo.bias"]
        x = orc.layer_norm(x + ff, st[p + "mlp.layernorm.weight"],
                           st[p + "mlp.layernorm.bias"], 1e-12)
    np.testing.assert_allclose(_run(cfg, params, toks), x, atol=2e-4)


def test_jina_bert_v3_matches_oracle(tmp_path):
    rng = np.random.default_rng(3)
    # jina v3 parametrizes lora'd weights: base lives under
    # .parametrizations.weight.original
    st = {"embeddings.word_embeddings.parametrizations.weight.original":
          _r(rng, V, D),
          "embeddings.token_type_embeddings.weight": _r(rng, 1, D),
          "embeddings.LayerNorm.weight": _ln_w(rng, D),
          "embeddings.LayerNorm.bias": _r(rng, D, s=0.05)}
    for i in range(L):
        p = f"encoder.layer.{i}."
        for hf in ("attention.self.query", "attention.self.key",
                   "attention.self.value", "attention.output.dense",
                   "intermediate.dense", "output.dense"):
            shp = ((F, D) if hf == "intermediate.dense"
                   else (D, F) if hf == "output.dense" else (D, D))
            st[p + hf + ".parametrizations.weight.original"] = _r(rng, *shp)
            st[p + hf + ".bias"] = _r(rng, shp[0], s=0.05)
        for hf in ("attention.output.LayerNorm", "output.LayerNorm"):
            st[p + hf + ".weight"] = _ln_w(rng, D)
            st[p + hf + ".bias"] = _r(rng, D, s=0.05)
    config = dict(num_hidden_layers=L, hidden_size=D,
                  num_attention_heads=H, intermediate_size=F,
                  vocab_size=V, type_vocab_size=1, layer_norm_eps=1e-12,
                  max_position_embeddings=8194, hidden_act="gelu",
                  rotary_emb_base=20000.0, model_type="xlm-roberta",
                  lora_adaptations=["retrieval.query"])
    cfg, params = _convert(st, config, tmp_path, "jina-bert-v3", "jina3")
    assert cfg.rope_base == 20000.0

    def w(p, hf):
        return st[p + hf + ".parametrizations.weight.original"]

    toks = np.array([6, 2, 19, 44], np.int32)
    t = len(toks)
    pos = np.arange(t)
    x = (w("embeddings.", "word_embeddings")[toks]
         + st["embeddings.token_type_embeddings.weight"][0])
    x = orc.layer_norm(x, st["embeddings.LayerNorm.weight"],
                       st["embeddings.LayerNorm.bias"], 1e-12)
    for i in range(L):
        p = f"encoder.layer.{i}."
        q = (x @ w(p, "attention.self.query").T
             + st[p + "attention.self.query.bias"]).reshape(t, H, D // H)
        k = (x @ w(p, "attention.self.key").T
             + st[p + "attention.self.key.bias"]).reshape(t, H, D // H)
        v = (x @ w(p, "attention.self.value").T
             + st[p + "attention.self.value.bias"]).reshape(t, H, D // H)
        q = orc.rope(q, pos, base=20000.0, neox=True)
        k = orc.rope(k, pos, base=20000.0, neox=True)
        attn = orc.attention(q, k, v, causal=False).reshape(t, D)
        attn = (attn @ w(p, "attention.output.dense").T
                + st[p + "attention.output.dense.bias"])
        x = orc.layer_norm(x + attn,
                           st[p + "attention.output.LayerNorm.weight"],
                           st[p + "attention.output.LayerNorm.bias"],
                           1e-12)
        ff = _erf_gelu(x @ w(p, "intermediate.dense").T
                       + st[p + "intermediate.dense.bias"])
        ff = ff @ w(p, "output.dense").T + st[p + "output.dense.bias"]
        x = orc.layer_norm(x + ff, st[p + "output.LayerNorm.weight"],
                           st[p + "output.LayerNorm.bias"], 1e-12)
    np.testing.assert_allclose(_run(cfg, params, toks), x, atol=2e-4)


def test_neo_bert_matches_oracle(tmp_path):
    rng = np.random.default_rng(4)
    FW = 2 * F // 3  # converter writes 2/3 intermediate as n_ff
    st = {"model.encoder.weight": _r(rng, V, D),
          "model.layer_norm.weight": _ln_w(rng, D),
          "decoder.weight": _r(rng, V, D)}  # LM head: dropped
    for i in range(L):
        p = f"model.transformer_encoder.{i}."
        st[p + "attention_norm.weight"] = _ln_w(rng, D)
        st[p + "qkv.weight"] = _r(rng, 3 * D, D)
        st[p + "wo.weight"] = _r(rng, D, D)
        st[p + "ffn_norm.weight"] = _ln_w(rng, D)
        st[p + "ffn.w12.weight"] = _r(rng, 2 * FW, D)
        st[p + "ffn.w3.weight"] = _r(rng, D, FW)
    config = dict(num_hidden_layers=L, hidden_size=D,
                  num_attention_heads=H, intermediate_size=F,
                  vocab_size=V, norm_eps=1e-6, max_length=1024,
                  model_type="neobert")
    cfg, params = _convert(st, config, tmp_path, "neo-bert", "neo")
    assert cfg.pooling == bert.POOL_CLS and cfg.d_ff == FW

    toks = np.array([10, 3, 27, 50, 1], np.int32)
    t = len(toks)
    pos = np.arange(t)
    x = st["model.encoder.weight"][toks]
    for i in range(L):
        p = f"model.transformer_encoder.{i}."
        hn = orc.rms_norm(x, st[p + "attention_norm.weight"], 1e-6)
        qkv = hn @ st[p + "qkv.weight"].T
        q = orc.rope(qkv[:, :D].reshape(t, H, D // H), pos, neox=False)
        k = orc.rope(qkv[:, D:2 * D].reshape(t, H, D // H), pos,
                     neox=False)
        v = qkv[:, 2 * D:].reshape(t, H, D // H)
        attn = orc.attention(q, k, v, causal=False).reshape(t, D)
        x = x + attn @ st[p + "wo.weight"].T
        hn = orc.rms_norm(x, st[p + "ffn_norm.weight"], 1e-6)
        gu = hn @ st[p + "ffn.w12.weight"].T
        x = x + (orc.silu(gu[:, :FW]) * gu[:, FW:]
                 ) @ st[p + "ffn.w3.weight"].T
    x = orc.rms_norm(x, st["model.layer_norm.weight"], 1e-6)
    np.testing.assert_allclose(_run(cfg, params, toks), x, atol=2e-4)


def test_variant_padded_bucket_invariance(tmp_path):
    """encode() pads to a bucket; rope/ALiBi variants must mask padding
    exactly like plain BERT does."""
    rng = np.random.default_rng(5)
    st = {"embeddings.word_embeddings.weight": _r(rng, V, D),
          "embeddings.token_type_embeddings.weight": _r(rng, 2, D),
          "emb_ln.weight": _ln_w(rng, D),
          "emb_ln.bias": _r(rng, D, s=0.05)}
    for i in range(L):
        p = f"encoder.layers.{i}."
        st[p + "attn.Wqkv.weight"] = _r(rng, 3 * D, D)
        st[p + "attn.out_proj.weight"] = _r(rng, D, D)
        st[p + "norm1.weight"] = _ln_w(rng, D)
        st[p + "norm1.bias"] = _r(rng, D, s=0.05)
        st[p + "norm2.weight"] = _ln_w(rng, D)
        st[p + "norm2.bias"] = _r(rng, D, s=0.05)
        st[p + "mlp.fc11.weight"] = _r(rng, F, D)
        st[p + "mlp.fc12.weight"] = _r(rng, F, D)
        st[p + "mlp.fc2.weight"] = _r(rng, D, F)
    config = dict(n_layer=L, n_embd=D, n_head=H, n_inner=F, vocab_size=V,
                  n_positions=8192, max_trained_positions=2048,
                  type_vocab_size=2, layer_norm_epsilon=1e-12,
                  rotary_emb_base=10000.0, activation_function="swiglu",
                  model_type="nomic_bert", pooling_type=1)
    cfg, params = _convert(st, config, tmp_path, "nomic-bert", "nomicpad")
    assert cfg.pooling == bert.POOL_MEAN

    import jax.numpy as jnp

    toks = np.array([1, 5, 9, 30, 2], np.int32)
    exact = np.asarray(bert.pool(
        params, cfg,
        bert.forward(params, cfg, jnp.asarray(toks),
                     jnp.ones(len(toks), bool)),
        jnp.ones(len(toks), bool)))
    exact = exact / np.linalg.norm(exact)
    padded = bert.encode(params, cfg, toks)
    np.testing.assert_allclose(padded, exact, atol=1e-5)


def test_convert_hf_cli_detects_bert_variants():
    from omni_tpu.cli.convert_hf import detect_arch

    assert detect_arch({"architectures": ["NomicBertModel"],
                        "moe_every_n_layers": 2}) == "nomic-bert-moe"
    assert detect_arch({"architectures": ["NomicBertModel"]}) == \
        "nomic-bert"
    assert detect_arch({"architectures": ["JinaBertModel"]}) == \
        "jina-bert-v2"
    assert detect_arch({"architectures": ["XLMRobertaModel"],
                        "lora_adaptations": ["x"]}) == "jina-bert-v3"
    assert detect_arch({"architectures": ["XLMRobertaModel"]}) == "bert"
    assert detect_arch({"architectures": ["NeoBERTLMHead"]}) == "neo-bert"
