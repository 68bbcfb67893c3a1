"""Arch parity (batch 3) vs the numpy graph oracle:

- grovemoe (qwen3moe shape + adjugate chunk experts: selection on
  sigmoid(logits) / weights on softmax(logits); the chunk experts
  transform the MAIN MoE's output, ids = expert ids // group size,
  output added scaled by expert_group_scale)

Reference graph: /root/reference/src/llama-model.cpp llm_build_grovemoe
+ the GROVEMOE branches in llama-graph.cpp build_moe_ffn (:948, :958)."""

import numpy as np

from omni_tpu.core import GGUFReader
from omni_tpu.models import qwen3
from omni_tpu.runtime import Batch, Context

import np_oracle as O

RNG = np.random.default_rng
D, NH, NKV, HD, FF, V = 32, 4, 2, 8, 64, 64


def w(rng, *shape, s=0.08):
    return (rng.standard_normal(shape) * s).astype(np.float32)


def engine(tmp_path, st, cfg, arch, toks):
    from omni_tpu.convert.hf_to_gguf import convert_llm

    path = tmp_path / f"{arch}.gguf"
    convert_llm(st, cfg, path, arch=arch)
    reader = GGUFReader(path)
    ecfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader)
    ctx = Context(ecfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    return np.asarray(logits), ecfg


def test_grovemoe_parity(tmp_path):
    rng = RNG(11)
    E, K, EFF, CHF, GRP, n_l = 4, 2, 32, 16, 2, 2
    scale = 0.05
    st = {"model.embed_tokens.weight": w(rng, V, D),
          "model.norm.weight": 1 + w(rng, D, s=0.02),
          "lm_head.weight": w(rng, V, D)}
    for i in range(n_l):
        p = f"model.layers.{i}."
        st[p + "input_layernorm.weight"] = 1 + w(rng, D, s=0.02)
        st[p + "post_attention_layernorm.weight"] = 1 + w(rng, D, s=0.02)
        st[p + "self_attn.q_proj.weight"] = w(rng, NH * HD, D)
        st[p + "self_attn.k_proj.weight"] = w(rng, NKV * HD, D)
        st[p + "self_attn.v_proj.weight"] = w(rng, NKV * HD, D)
        st[p + "self_attn.o_proj.weight"] = w(rng, D, NH * HD)
        st[p + "self_attn.q_norm.weight"] = 1 + w(rng, HD, s=0.05)
        st[p + "self_attn.k_norm.weight"] = 1 + w(rng, HD, s=0.05)
        st[p + "mlp.gate.weight"] = w(rng, E, D, s=0.8)
        for e in range(E):
            ep = p + f"mlp.experts.{e}."
            st[ep + "gate_proj.weight"] = w(rng, EFF, D)
            st[ep + "up_proj.weight"] = w(rng, EFF, D)
            st[ep + "down_proj.weight"] = w(rng, D, EFF)
        for e in range(E // GRP):
            ep = p + f"mlp.chunk_experts.{e}."
            st[ep + "gate_proj.weight"] = w(rng, CHF, D)
            st[ep + "up_proj.weight"] = w(rng, CHF, D)
            st[ep + "down_proj.weight"] = w(rng, D, CHF)
    cfg = dict(vocab_size=V, hidden_size=D, intermediate_size=FF,
               num_hidden_layers=n_l, num_attention_heads=NH,
               num_key_value_heads=NKV, head_dim=HD, rms_norm_eps=1e-6,
               num_experts=E, num_experts_per_tok=K,
               moe_intermediate_size=EFF, experts_per_group=GRP,
               expert_group_scale=scale,
               max_position_embeddings=64, tie_word_embeddings=False)
    toks = RNG(12).integers(2, V, 9).astype(np.int32)
    t = len(toks)
    pos = np.arange(t)

    h = st["model.embed_tokens.weight"][toks].astype(np.float32)
    for i in range(n_l):
        p = f"model.layers.{i}."
        hn = O.rms_norm(h, st[p + "input_layernorm.weight"])
        q = (hn @ st[p + "self_attn.q_proj.weight"].T).reshape(t, NH, HD)
        k = (hn @ st[p + "self_attn.k_proj.weight"].T).reshape(t, NKV, HD)
        v = (hn @ st[p + "self_attn.v_proj.weight"].T).reshape(t, NKV, HD)
        q = O.rope(O.rms_norm(q, st[p + "self_attn.q_norm.weight"]), pos,
                   neox=True)
        k = O.rope(O.rms_norm(k, st[p + "self_attn.k_norm.weight"]), pos,
                   neox=True)
        attn = O.attention(q, k, v)
        h = h + attn.reshape(t, -1) @ st[p + "self_attn.o_proj.weight"].T
        hn2 = O.rms_norm(h, st[p + "post_attention_layernorm.weight"])

        logits = hn2 @ st[p + "mlp.gate.weight"].T
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        sig = 1 / (1 + np.exp(-logits))
        ffn = np.zeros_like(hn2)
        for ti in range(t):
            top = np.argsort(-sig[ti])[:K]
            ws = probs[ti][top]
            ws = ws / ws.sum()
            out1 = np.zeros(D, np.float32)
            for j, e in enumerate(top):
                ep = p + f"mlp.experts.{e}."
                g = st[ep + "gate_proj.weight"] @ hn2[ti]
                u = st[ep + "up_proj.weight"] @ hn2[ti]
                out1 += ws[j] * (st[ep + "down_proj.weight"]
                                 @ (g / (1 + np.exp(-g)) * u))
            # adjugate: chunk ids = top ids // GRP, weights = softmax
            # probs at the CHUNK id positions (get_rows quirk), renormed
            k2 = min(K, E // GRP)
            ch = top[:k2] // GRP
            w2 = probs[ti][ch]
            w2 = w2 / w2.sum()
            out2 = np.zeros(D, np.float32)
            for j, c in enumerate(ch):
                ep = p + f"mlp.chunk_experts.{c}."
                g = st[ep + "gate_proj.weight"] @ out1
                u = st[ep + "up_proj.weight"] @ out1
                out2 += w2[j] * (st[ep + "down_proj.weight"]
                                 @ (g / (1 + np.exp(-g)) * u))
            ffn[ti] = out1 + scale * out2
        h = h + ffn
    ref = O.rms_norm(h, st["model.norm.weight"]) @ st["lm_head.weight"].T

    ours, ecfg = engine(tmp_path, st, cfg, "grovemoe", toks)
    assert ecfg.moe_gating == "grove"
    assert ecfg.n_group_experts == GRP
    assert abs(ecfg.moe_grove_scale - scale) < 1e-9
    np.testing.assert_allclose(ours, ref, atol=0.03)


def test_cli_autodetect():
    from omni_tpu.cli.convert_hf import _HF_ARCH_MAP

    assert _HF_ARCH_MAP.get("GroveMoeForCausalLM") == "grovemoe"
