"""Arch-parity tests for the llama-shaped fills whose HF modeling code
is not shipped locally (trust_remote_code archs) — verified against the
independent numpy oracle in np_oracle.py, composed per the reference
graphs (/root/reference/src/llama-model.cpp llm_build_*):

- plamo (parallel residual, shared norm, NeoX rope, q/o GQA shuffle)
- refact (MQA + ALiBi + RMS + SwiGLU)
- jais (GPT-2 topology + ALiBi + biased SwiGLU + muP scales + 1/d scale)
- codeshell (StarCoder fused-QKV topology + NeoX rope + GELU)
- chatglm (RMS + half-dim NORM rope + fused qkv + disk-fused SwiGLU)
- deepseek v1 (llama + softmax MoE + shared experts + leading dense)
- bailingmoe (fused qkv + MoE + norm_head)
- gptj (HF transformers oracle: parallel residual + partial NORM rope)
"""

import numpy as np
import pytest

from omni_tpu.core import GGUFReader
from omni_tpu.models import qwen3
from omni_tpu.runtime import Batch, Context

import np_oracle as O

RNG = np.random.default_rng

D, NH, NKV, HD, FF, V, L, T = 32, 4, 2, 8, 64, 64, 2, 8


def w(rng, *shape, s=0.08):
    return (rng.standard_normal(shape) * s).astype(np.float32)


def engine_logits(tmp_path, state, config, arch, toks):
    from omni_tpu.convert.hf_to_gguf import convert_llm

    path = tmp_path / f"{arch}.gguf"
    convert_llm(state, config, path, arch=arch)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader)
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    return np.asarray(logits), cfg


def check(ours, ref, atol=0.03):
    np.testing.assert_allclose(ours, ref, atol=atol)
    for i in range(ref.shape[0]):
        top2 = np.sort(ref[i])[-2:]
        if top2[1] - top2[0] > atol:
            assert np.argmax(ours[i]) == np.argmax(ref[i]), i


def test_plamo_parity(tmp_path):
    """llm_build_plamo: shared attn_norm feeds attention AND ffn, both
    add to the layer input; HF q-head order is q-per-group-major (the
    converter's shuffle re-groups it kv-major)."""
    rng = RNG(0)
    st, cfg = {}, dict(
        vocab_size=V, hidden_size=D, intermediate_size=FF,
        num_hidden_layers=L, num_attention_heads=NH,
        num_key_value_heads=NKV, rms_norm_eps=1e-6,
        tie_word_embeddings=False)
    st["model.embed_tokens.weight"] = w(rng, V, D)
    st["model.norm.weight"] = 1 + w(rng, D, s=0.02)
    st["lm_head.weight"] = w(rng, V, D)
    for i in range(L):
        p = f"model.layers.layers.{i}."
        st[p + "norm.weight"] = 1 + w(rng, D, s=0.02)
        st[p + "self_attn.q_proj.weight"] = w(rng, NH * HD, D)
        st[p + "self_attn.k_proj.weight"] = w(rng, NKV * HD, D)
        st[p + "self_attn.v_proj.weight"] = w(rng, NKV * HD, D)
        st[p + "self_attn.o_proj.weight"] = w(rng, D, NH * HD)
        st[p + "mlp.gate_proj.weight"] = w(rng, FF, D)
        st[p + "mlp.up_proj.weight"] = w(rng, FF, D)
        st[p + "mlp.down_proj.weight"] = w(rng, D, FF)
    toks = RNG(1).integers(2, V, T).astype(np.int32)
    pos = np.arange(T)

    # numpy oracle in the HF layout: q head h reads kv group h % NKV
    # (q-per-group-major), attention + ffn parallel on the shared norm
    h = st["model.embed_tokens.weight"][toks].astype(np.float32)
    for i in range(L):
        p = f"model.layers.layers.{i}."
        hn = O.rms_norm(h, st[p + "norm.weight"])
        q = (hn @ st[p + "self_attn.q_proj.weight"].T).reshape(T, NH, HD)
        k = (hn @ st[p + "self_attn.k_proj.weight"].T).reshape(T, NKV, HD)
        v = (hn @ st[p + "self_attn.v_proj.weight"].T).reshape(T, NKV, HD)
        q = O.rope(q, pos, neox=True)
        k = O.rope(k, pos, neox=True)
        # HF order: kv group = h % NKV -> tile, not repeat
        kx = np.tile(k, (1, NH // NKV, 1))
        vx = np.tile(v, (1, NH // NKV, 1))
        attn = O.attention(q, kx, vx)
        attn_out = attn.reshape(T, -1) @ st[p + "self_attn.o_proj.weight"].T
        ffn = O.swiglu_ffn(hn, st[p + "mlp.gate_proj.weight"],
                           st[p + "mlp.up_proj.weight"],
                           st[p + "mlp.down_proj.weight"])
        h = h + attn_out + ffn
    ref = O.rms_norm(h, st["model.norm.weight"]) @ st["lm_head.weight"].T

    ours, ecfg = engine_logits(tmp_path, st, cfg, "plamo", toks)
    assert ecfg.parallel_residual and ecfg.rope_neox
    check(ours, ref)


def test_refact_parity(tmp_path):
    """llm_build_refact: MQA, ALiBi(8) instead of rope, RMS norms,
    SwiGLU with the llama-style 2/3*4d rounded ff width."""
    rng = RNG(2)
    d, nh = 32, 4
    ff = 256 * ((int(2 * 4 * d / 3) + 255) // 256)  # 256
    hd = d // nh
    st = {"transformer.wte.weight": w(rng, V, d),
          "transformer.ln_f.weight": 1 + w(rng, d, s=0.02),
          "lm_head.weight": w(rng, V, d)}
    for i in range(L):
        p = f"transformer.h.{i}."
        st[p + "ln_1.weight"] = 1 + w(rng, d, s=0.02)
        st[p + "ln_2.weight"] = 1 + w(rng, d, s=0.02)
        st[p + "attn.q.weight"] = w(rng, d, d)
        st[p + "attn.kv.weight"] = w(rng, 2 * hd, d)
        st[p + "attn.c_proj.weight"] = w(rng, d, d)
        st[p + "mlp.gate_up_proj.weight"] = w(rng, 2 * ff, d)
        st[p + "mlp.linear_3.weight"] = w(rng, d, ff)
    cfg = dict(n_embd=d, n_head=nh, n_layer=L, vocab_size=V,
               n_positions=64, layer_norm_epsilon=1e-6)
    toks = RNG(3).integers(2, V, T).astype(np.int32)

    slopes = O.alibi_slopes(nh, 8.0)
    h = st["transformer.wte.weight"][toks].astype(np.float32)
    for i in range(L):
        p = f"transformer.h.{i}."
        hn = O.rms_norm(h, st[p + "ln_1.weight"])
        q = (hn @ st[p + "attn.q.weight"].T).reshape(T, nh, hd)
        kv = hn @ st[p + "attn.kv.weight"].T
        k = kv[:, :hd].reshape(T, 1, hd)
        v = kv[:, hd:].reshape(T, 1, hd)
        attn = O.attention(q, k, v, alibi_bias=slopes)
        h = h + attn.reshape(T, -1) @ st[p + "attn.c_proj.weight"].T
        hn2 = O.rms_norm(h, st[p + "ln_2.weight"])
        gu = st[p + "mlp.gate_up_proj.weight"]
        h = h + O.swiglu_ffn(hn2, gu[:ff], gu[ff:],
                             st[p + "mlp.linear_3.weight"])
    ref = (O.rms_norm(h, st["transformer.ln_f.weight"])
           @ st["lm_head.weight"].T)

    ours, ecfg = engine_logits(tmp_path, st, cfg, "refact", toks)
    assert ecfg.max_alibi_bias == 8.0 and not ecfg.use_rope
    assert ecfg.n_kv_heads == 1
    check(ours, ref)


def test_jais_parity(tmp_path):
    """llm_build_jais: Conv1D fused qkv + ALiBi + biased LayerNorms +
    biased SwiGLU (c_fc=up, c_fc2=gate) + muP scales + kq 1/d."""
    rng = RNG(4)
    d, nh, ff = 32, 4, 48
    hd = d // nh
    st = {"transformer.wte.weight": w(rng, V, d),
          "transformer.ln_f.weight": 1 + w(rng, d, s=0.02),
          "transformer.ln_f.bias": w(rng, d, s=0.02)}
    for i in range(L):
        p = f"transformer.h.{i}."
        st[p + "ln_1.weight"] = 1 + w(rng, d, s=0.02)
        st[p + "ln_1.bias"] = w(rng, d, s=0.02)
        st[p + "ln_2.weight"] = 1 + w(rng, d, s=0.02)
        st[p + "ln_2.bias"] = w(rng, d, s=0.02)
        st[p + "attn.c_attn.weight"] = w(rng, d, 3 * d)  # Conv1D [in,out]
        st[p + "attn.c_attn.bias"] = w(rng, 3 * d, s=0.02)
        st[p + "attn.c_proj.weight"] = w(rng, d, d)
        st[p + "attn.c_proj.bias"] = w(rng, d, s=0.02)
        st[p + "mlp.c_fc.weight"] = w(rng, d, ff)
        st[p + "mlp.c_fc.bias"] = w(rng, ff, s=0.02)
        st[p + "mlp.c_fc2.weight"] = w(rng, d, ff)
        st[p + "mlp.c_fc2.bias"] = w(rng, ff, s=0.02)
        st[p + "mlp.c_proj.weight"] = w(rng, ff, d)
        st[p + "mlp.c_proj.bias"] = w(rng, d, s=0.02)
    cfg = dict(n_embd=d, n_head=nh, n_layer=L, vocab_size=V,
               n_inner=ff, n_positions=64, layer_norm_epsilon=1e-5,
               activation_function="swiglu",
               position_embedding_type="alibi",
               mup_embeddings_scale=3.0, mup_output_alpha=1.5,
               mup_width_scale=0.5)
    toks = RNG(5).integers(2, V, T).astype(np.int32)

    slopes = O.alibi_slopes(nh, 8.0)
    wte = st["transformer.wte.weight"] * 3.0
    h = wte[toks].astype(np.float32)
    for i in range(L):
        p = f"transformer.h.{i}."
        hn = O.layer_norm(h, st[p + "ln_1.weight"], st[p + "ln_1.bias"])
        qkv = hn @ st[p + "attn.c_attn.weight"] + st[p + "attn.c_attn.bias"]
        q = qkv[:, :d].reshape(T, nh, hd)
        k = qkv[:, d:2 * d].reshape(T, nh, hd)
        v = qkv[:, 2 * d:].reshape(T, nh, hd)
        attn = O.attention(q, k, v, scale=1.0 / hd, alibi_bias=slopes)
        h = h + (attn.reshape(T, -1) @ st[p + "attn.c_proj.weight"]
                 + st[p + "attn.c_proj.bias"])
        hn2 = O.layer_norm(h, st[p + "ln_2.weight"], st[p + "ln_2.bias"])
        g = hn2 @ st[p + "mlp.c_fc2.weight"] + st[p + "mlp.c_fc2.bias"]
        u = hn2 @ st[p + "mlp.c_fc.weight"] + st[p + "mlp.c_fc.bias"]
        h = h + (O.silu(g) * u @ st[p + "mlp.c_proj.weight"]
                 + st[p + "mlp.c_proj.bias"])
    hfin = O.layer_norm(h, st["transformer.ln_f.weight"],
                        st["transformer.ln_f.bias"])
    ref = hfin @ (st["transformer.wte.weight"] * (1.5 * 0.5)).T

    ours, ecfg = engine_logits(tmp_path, st, cfg, "jais", toks)
    assert ecfg.attn_scale == 1.0 / hd and not ecfg.use_rope
    check(ours, ref)


def test_codeshell_parity(tmp_path):
    """llm_build_codeshell: StarCoder GQA fused c_attn + biased
    LayerNorms + NeoX rope + un-gated GELU, tied head."""
    rng = RNG(6)
    d, nh, nkv, ff = 32, 4, 2, 48
    hd = d // nh
    st = {"transformer.wte.weight": w(rng, V, d),
          "transformer.ln_f.weight": 1 + w(rng, d, s=0.02),
          "transformer.ln_f.bias": w(rng, d, s=0.02)}
    for i in range(L):
        p = f"transformer.h.{i}."
        st[p + "ln_1.weight"] = 1 + w(rng, d, s=0.02)
        st[p + "ln_1.bias"] = w(rng, d, s=0.02)
        st[p + "attn.c_attn.weight"] = w(rng, d + 2 * nkv * hd, d)
        st[p + "attn.c_attn.bias"] = w(rng, d + 2 * nkv * hd, s=0.02)
        st[p + "attn.c_proj.weight"] = w(rng, d, d)
        st[p + "attn.c_proj.bias"] = w(rng, d, s=0.02)
        st[p + "ln_2.weight"] = 1 + w(rng, d, s=0.02)
        st[p + "ln_2.bias"] = w(rng, d, s=0.02)
        st[p + "mlp.c_fc.weight"] = w(rng, ff, d)
        st[p + "mlp.c_fc.bias"] = w(rng, ff, s=0.02)
        st[p + "mlp.c_proj.weight"] = w(rng, d, ff)
        st[p + "mlp.c_proj.bias"] = w(rng, d, s=0.02)
    cfg = dict(n_embd=d, n_head=nh, num_query_groups=nkv, n_layer=L,
               vocab_size=V, n_inner=ff, n_positions=64,
               layer_norm_epsilon=1e-5, tie_word_embeddings=True)
    toks = RNG(7).integers(2, V, T).astype(np.int32)
    pos = np.arange(T)

    h = st["transformer.wte.weight"][toks].astype(np.float32)
    for i in range(L):
        p = f"transformer.h.{i}."
        hn = O.layer_norm(h, st[p + "ln_1.weight"], st[p + "ln_1.bias"])
        qkv = hn @ st[p + "attn.c_attn.weight"].T + st[p + "attn.c_attn.bias"]
        q = qkv[:, :d].reshape(T, nh, hd)
        k = qkv[:, d:d + nkv * hd].reshape(T, nkv, hd)
        v = qkv[:, d + nkv * hd:].reshape(T, nkv, hd)
        q = O.rope(q, pos, neox=True)
        k = O.rope(k, pos, neox=True)
        attn = O.attention(q, k, v)
        h = h + (attn.reshape(T, -1) @ st[p + "attn.c_proj.weight"].T
                 + st[p + "attn.c_proj.bias"])
        hn2 = O.layer_norm(h, st[p + "ln_2.weight"], st[p + "ln_2.bias"])
        h = h + O.ungated_ffn(hn2, st[p + "mlp.c_fc.weight"],
                              st[p + "mlp.c_proj.weight"],
                              b_up=st[p + "mlp.c_fc.bias"],
                              b_down=st[p + "mlp.c_proj.bias"])
    hfin = O.layer_norm(h, st["transformer.ln_f.weight"],
                        st["transformer.ln_f.bias"])
    ref = hfin @ st["transformer.wte.weight"].T

    ours, ecfg = engine_logits(tmp_path, st, cfg, "codeshell", toks)
    assert ecfg.norm_bias and ecfg.use_rope and ecfg.act == "gelu"
    check(ours, ref)


def test_chatglm_parity(tmp_path):
    """llm_build_chatglm: RMS norms, fused biased qkv, NORM rope over
    the first head_dim/2 columns, disk-fused SwiGLU (dense_h_to_4h)."""
    rng = RNG(8)
    d, nh, nkv, ff = 32, 4, 2, 48
    hd = d // nh
    st = {"transformer.embedding.word_embeddings.weight": w(rng, V, d),
          "transformer.encoder.final_layernorm.weight":
              1 + w(rng, d, s=0.02),
          "transformer.output_layer.weight": w(rng, V, d)}
    for i in range(L):
        p = f"transformer.encoder.layers.{i}."
        st[p + "input_layernorm.weight"] = 1 + w(rng, d, s=0.02)
        st[p + "post_attention_layernorm.weight"] = 1 + w(rng, d, s=0.02)
        st[p + "self_attention.query_key_value.weight"] = \
            w(rng, (nh + 2 * nkv) * hd, d)
        st[p + "self_attention.query_key_value.bias"] = \
            w(rng, (nh + 2 * nkv) * hd, s=0.02)
        st[p + "self_attention.dense.weight"] = w(rng, d, d)
        st[p + "mlp.dense_h_to_4h.weight"] = w(rng, 2 * ff, d)
        st[p + "mlp.dense_4h_to_h.weight"] = w(rng, d, ff)
    cfg = dict(hidden_size=d, num_attention_heads=nh,
               multi_query_group_num=nkv, num_layers=L, vocab_size=V,
               ffn_hidden_size=ff, seq_length=64,
               layernorm_epsilon=1e-5, rope_ratio=1.0)
    toks = RNG(9).integers(2, V, T).astype(np.int32)
    pos = np.arange(T)

    h = st["transformer.embedding.word_embeddings.weight"][toks].astype(
        np.float32)
    for i in range(L):
        p = f"transformer.encoder.layers.{i}."
        hn = O.rms_norm(h, st[p + "input_layernorm.weight"])
        qkv = (hn @ st[p + "self_attention.query_key_value.weight"].T
               + st[p + "self_attention.query_key_value.bias"])
        q = qkv[:, :nh * hd].reshape(T, nh, hd)
        k = qkv[:, nh * hd:(nh + nkv) * hd].reshape(T, nkv, hd)
        v = qkv[:, (nh + nkv) * hd:].reshape(T, nkv, hd)
        q = O.rope(q, pos, neox=False, rot_dim=hd // 2)
        k = O.rope(k, pos, neox=False, rot_dim=hd // 2)
        attn = O.attention(q, k, v)
        h = h + attn.reshape(T, -1) @ st[p + "self_attention.dense.weight"].T
        hn2 = O.rms_norm(h, st[p + "post_attention_layernorm.weight"])
        gu = hn2 @ st[p + "mlp.dense_h_to_4h.weight"].T
        h = h + (O.silu(gu[:, :ff]) * gu[:, ff:]
                 ) @ st[p + "mlp.dense_4h_to_h.weight"].T
    ref = (O.rms_norm(h, st["transformer.encoder.final_layernorm.weight"])
           @ st["transformer.output_layer.weight"].T)

    ours, ecfg = engine_logits(tmp_path, st, cfg, "chatglm", toks)
    assert not ecfg.rope_neox and ecfg.rope_dim == hd // 2
    check(ours, ref)


def _moe_llama_state(rng, arch_prefix="model."):
    """llama attention + MoE layer-1 state shared by deepseek/bailing."""
    st = {arch_prefix + "embed_tokens.weight": w(rng, V, D),
          arch_prefix + "norm.weight": 1 + w(rng, D, s=0.02),
          "lm_head.weight": w(rng, V, D)}
    return st


def test_deepseek_v1_parity(tmp_path):
    """llm_build_deepseek: llama attention + softmax MoE (norm_w=false)
    with shared experts and a leading dense layer."""
    rng = RNG(10)
    E, K, EFF = 4, 2, 32
    st = _moe_llama_state(rng)
    for i in range(L):
        p = f"model.layers.{i}."
        st[p + "input_layernorm.weight"] = 1 + w(rng, D, s=0.02)
        st[p + "post_attention_layernorm.weight"] = 1 + w(rng, D, s=0.02)
        st[p + "self_attn.q_proj.weight"] = w(rng, NH * HD, D)
        st[p + "self_attn.k_proj.weight"] = w(rng, NKV * HD, D)
        st[p + "self_attn.v_proj.weight"] = w(rng, NKV * HD, D)
        st[p + "self_attn.o_proj.weight"] = w(rng, D, NH * HD)
        if i == 0:  # leading dense layer
            st[p + "mlp.gate_proj.weight"] = w(rng, FF, D)
            st[p + "mlp.up_proj.weight"] = w(rng, FF, D)
            st[p + "mlp.down_proj.weight"] = w(rng, D, FF)
        else:
            st[p + "mlp.gate.weight"] = w(rng, E, D, s=0.8)
            for e in range(E):
                ep = p + f"mlp.experts.{e}."
                st[ep + "gate_proj.weight"] = w(rng, EFF, D)
                st[ep + "up_proj.weight"] = w(rng, EFF, D)
                st[ep + "down_proj.weight"] = w(rng, D, EFF)
            sp = p + "mlp.shared_experts."
            st[sp + "gate_proj.weight"] = w(rng, EFF, D)
            st[sp + "up_proj.weight"] = w(rng, EFF, D)
            st[sp + "down_proj.weight"] = w(rng, D, EFF)
    cfg = dict(vocab_size=V, hidden_size=D, intermediate_size=FF,
               num_hidden_layers=L, num_attention_heads=NH,
               num_key_value_heads=NKV, rms_norm_eps=1e-6,
               n_routed_experts=E, num_experts_per_tok=K,
               moe_intermediate_size=EFF, n_shared_experts=1,
               first_k_dense_replace=1, norm_topk_prob=False,
               max_position_embeddings=64, tie_word_embeddings=False)
    toks = RNG(11).integers(2, V, T).astype(np.int32)
    pos = np.arange(T)

    h = st["model.embed_tokens.weight"][toks].astype(np.float32)
    for i in range(L):
        p = f"model.layers.{i}."
        hn = O.rms_norm(h, st[p + "input_layernorm.weight"])
        q = (hn @ st[p + "self_attn.q_proj.weight"].T).reshape(T, NH, HD)
        k = (hn @ st[p + "self_attn.k_proj.weight"].T).reshape(T, NKV, HD)
        v = (hn @ st[p + "self_attn.v_proj.weight"].T).reshape(T, NKV, HD)
        q = O.rope(q, pos, neox=True)  # HF half-split layout
        k = O.rope(k, pos, neox=True)
        attn = O.attention(q, k, v)
        h = h + attn.reshape(T, -1) @ st[p + "self_attn.o_proj.weight"].T
        hn2 = O.rms_norm(h, st[p + "post_attention_layernorm.weight"])
        if i == 0:
            h = h + O.swiglu_ffn(hn2, st[p + "mlp.gate_proj.weight"],
                                 st[p + "mlp.up_proj.weight"],
                                 st[p + "mlp.down_proj.weight"])
        else:
            ge = np.stack([st[p + f"mlp.experts.{e}.gate_proj.weight"]
                           for e in range(4)])
            ue = np.stack([st[p + f"mlp.experts.{e}.up_proj.weight"]
                           for e in range(4)])
            de = np.stack([st[p + f"mlp.experts.{e}.down_proj.weight"]
                           for e in range(4)])
            moe = O.moe(hn2, st[p + "mlp.gate.weight"], ge, ue, de,
                        k=2, norm_w=False)
            sp = p + "mlp.shared_experts."
            sh = O.swiglu_ffn(hn2, st[sp + "gate_proj.weight"],
                              st[sp + "up_proj.weight"],
                              st[sp + "down_proj.weight"])
            h = h + moe + sh
    ref = O.rms_norm(h, st["model.norm.weight"]) @ st["lm_head.weight"].T

    ours, ecfg = engine_logits(tmp_path, st, cfg, "deepseek", toks)
    assert not ecfg.rope_neox and ecfg.n_expert_shared == 1
    assert not ecfg.moe_norm_w
    check(ours, ref)


def test_bailingmoe_parity(tmp_path):
    """llm_build_bailingmoe: fused query_key_value de-fuse + NORM rope +
    softmax MoE (norm from config) + shared experts + norm_head."""
    rng = RNG(12)
    E, K, EFF = 4, 2, 32
    st = {"model.word_embeddings.weight": w(rng, V, D),
          "model.norm.weight": 1 + w(rng, D, s=0.02),
          "lm_head.weight": w(rng, V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        st[p + "input_layernorm.weight"] = 1 + w(rng, D, s=0.02)
        st[p + "post_attention_layernorm.weight"] = 1 + w(rng, D, s=0.02)
        st[p + "attention.query_key_value.weight"] = \
            w(rng, (NH + 2 * NKV) * HD, D)
        st[p + "attention.dense.weight"] = w(rng, D, NH * HD)
        st[p + "mlp.gate.weight"] = w(rng, E, D, s=0.8)
        for e in range(E):
            ep = p + f"mlp.experts.{e}."
            st[ep + "gate_proj.weight"] = w(rng, EFF, D)
            st[ep + "up_proj.weight"] = w(rng, EFF, D)
            st[ep + "down_proj.weight"] = w(rng, D, EFF)
        sp = p + "mlp.shared_experts."
        st[sp + "gate_proj.weight"] = w(rng, EFF, D)
        st[sp + "up_proj.weight"] = w(rng, EFF, D)
        st[sp + "down_proj.weight"] = w(rng, D, EFF)
    cfg = dict(vocab_size=V, hidden_size=D,
               intermediate_size=FF, num_hidden_layers=L,
               num_attention_heads=NH, num_key_value_heads=NKV,
               rms_norm_eps=1e-6, num_experts=E, num_experts_per_tok=K,
               moe_intermediate_size=EFF, num_shared_experts=1,
               first_k_dense_replace=0, norm_topk_prob=True,
               norm_head=True, max_position_embeddings=64,
               tie_word_embeddings=False)
    toks = RNG(13).integers(2, V, T).astype(np.int32)
    pos = np.arange(T)

    h = st["model.word_embeddings.weight"][toks].astype(np.float32)
    for i in range(L):
        p = f"model.layers.{i}."
        hn = O.rms_norm(h, st[p + "input_layernorm.weight"])
        qkv = hn @ st[p + "attention.query_key_value.weight"].T
        q = qkv[:, :NH * HD].reshape(T, NH, HD)
        k = qkv[:, NH * HD:(NH + NKV) * HD].reshape(T, NKV, HD)
        v = qkv[:, (NH + NKV) * HD:].reshape(T, NKV, HD)
        q = O.rope(q, pos, neox=True)  # HF half-split layout
        k = O.rope(k, pos, neox=True)
        attn = O.attention(q, k, v)
        h = h + attn.reshape(T, -1) @ st[p + "attention.dense.weight"].T
        hn2 = O.rms_norm(h, st[p + "post_attention_layernorm.weight"])
        ge = np.stack([st[p + f"mlp.experts.{e}.gate_proj.weight"]
                       for e in range(E)])
        ue = np.stack([st[p + f"mlp.experts.{e}.up_proj.weight"]
                       for e in range(E)])
        de = np.stack([st[p + f"mlp.experts.{e}.down_proj.weight"]
                       for e in range(E)])
        moe = O.moe(hn2, st[p + "mlp.gate.weight"], ge, ue, de,
                    k=K, norm_w=True)
        sp = p + "mlp.shared_experts."
        sh = O.swiglu_ffn(hn2, st[sp + "gate_proj.weight"],
                          st[sp + "up_proj.weight"],
                          st[sp + "down_proj.weight"])
        h = h + moe + sh
    head = st["lm_head.weight"].astype(np.float32)
    head = head / (np.sqrt((head ** 2).sum(0, keepdims=True)) + 1e-7)
    ref = O.rms_norm(h, st["model.norm.weight"]) @ head.T

    ours, ecfg = engine_logits(tmp_path, st, cfg, "bailingmoe", toks)
    assert not ecfg.rope_neox and ecfg.moe_norm_w
    check(ours, ref)


def test_gptj_logits_match_transformers(tmp_path):
    """GPT-J vs the HF eager oracle: parallel residual on one shared
    ln_1, partial NORM rotary (rotary_dim), biased GELU FFN + LM head."""
    torch = pytest.importorskip("torch")
    from transformers import GPTJConfig, GPTJForCausalLM

    torch.manual_seed(0)
    hcfg = GPTJConfig(
        vocab_size=V, n_embd=32, n_layer=2, n_head=4, rotary_dim=4,
        n_inner=48, n_positions=64, attn_implementation="eager",
        tie_word_embeddings=False)
    model = GPTJForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    toks = RNG(14).integers(2, V, T).astype(np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))
                    ).logits[0].numpy()
    ours, ecfg = engine_logits(tmp_path, sd, hcfg.to_dict(), "gptj", toks)
    assert ecfg.parallel_residual and not ecfg.rope_neox
    assert ecfg.rope_dim == 4
    check(ours, ref, atol=0.02)
