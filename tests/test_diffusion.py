"""Diffusion-LM archs (llada / dream / llada_moe): non-causal attention
parity vs the numpy graph oracle, and the masked-diffusion generation
driver (reference examples/diffusion/diffusion-cli.cpp semantics)."""

import numpy as np

from omni_tpu.core import GGUFReader
from omni_tpu.models import qwen3
from omni_tpu.runtime import Batch, Context

import np_oracle as O

RNG = np.random.default_rng
D, NH, NKV, HD, FF, V, L, T = 32, 4, 2, 8, 64, 64, 2, 8


def w(rng, *shape, s=0.08):
    return (rng.standard_normal(shape) * s).astype(np.float32)


def engine(tmp_path, st, cfg, arch, toks):
    from omni_tpu.convert.hf_to_gguf import convert_llm

    path = tmp_path / f"{arch}.gguf"
    convert_llm(st, cfg, path, arch=arch)
    reader = GGUFReader(path)
    ecfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert ecfg.causal is False
    params = qwen3.load_params(reader)
    ctx = Context(ecfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    return np.asarray(logits), ecfg, reader


def check(ours, ref, atol=0.03):
    np.testing.assert_allclose(ours, ref, atol=atol)


def test_llada_noncausal_parity(tmp_path):
    rng = RNG(0)
    st = {"model.transformer.wte.weight": w(rng, V, D),
          "model.transformer.ln_f.weight": 1 + w(rng, D, s=0.02),
          "model.transformer.ff_out.weight": w(rng, V, D)}
    for i in range(L):
        p = f"model.transformer.blocks.{i}."
        st[p + "attn_norm.weight"] = 1 + w(rng, D, s=0.02)
        st[p + "ff_norm.weight"] = 1 + w(rng, D, s=0.02)
        st[p + "q_proj.weight"] = w(rng, NH * HD, D)
        st[p + "k_proj.weight"] = w(rng, NKV * HD, D)
        st[p + "v_proj.weight"] = w(rng, NKV * HD, D)
        st[p + "attn_out.weight"] = w(rng, D, NH * HD)
        st[p + "ff_proj.weight"] = w(rng, FF, D)
        st[p + "up_proj.weight"] = w(rng, FF, D)
        st[p + "ff_out.weight"] = w(rng, D, FF)
    cfg = dict(d_model=D, n_heads=NH, n_kv_heads=NKV, n_layers=L,
               mlp_hidden_size=FF, vocab_size=V, max_sequence_length=64,
               rms_norm_eps=1e-5, mask_token_id=V - 1)
    toks = RNG(1).integers(2, V, T).astype(np.int32)
    pos = np.arange(T)

    h = st["model.transformer.wte.weight"][toks].astype(np.float32)
    for i in range(L):
        p = f"model.transformer.blocks.{i}."
        hn = O.rms_norm(h, st[p + "attn_norm.weight"], eps=1e-5)
        q = (hn @ st[p + "q_proj.weight"].T).reshape(T, NH, HD)
        k = (hn @ st[p + "k_proj.weight"].T).reshape(T, NKV, HD)
        v = (hn @ st[p + "v_proj.weight"].T).reshape(T, NKV, HD)
        q = O.rope(q, pos, neox=True)  # HF half-split layout
        k = O.rope(k, pos, neox=True)
        attn = O.attention(q, k, v, causal=False)
        h = h + attn.reshape(T, -1) @ st[p + "attn_out.weight"].T
        hn2 = O.rms_norm(h, st[p + "ff_norm.weight"], eps=1e-5)
        h = h + O.swiglu_ffn(hn2, st[p + "ff_proj.weight"],
                             st[p + "up_proj.weight"],
                             st[p + "ff_out.weight"])
    ref = (O.rms_norm(h, st["model.transformer.ln_f.weight"], eps=1e-5)
           @ st["model.transformer.ff_out.weight"].T)

    ours, ecfg, reader = engine(tmp_path, st, cfg, "llada", toks)
    assert not ecfg.rope_neox
    assert reader.kv["llada.diffusion.shift_logits"] is True
    assert reader.kv["tokenizer.ggml.mask_token_id"] == V - 1
    check(ours, ref)

    # non-causal must differ from causal on the same weights
    import dataclasses
    ctx = Context(dataclasses.replace(ecfg, causal=True),
                  qwen3.load_params(reader), qwen3.forward, qwen3.embed,
                  n_ctx=32)
    causal_lg, _ = ctx.decode(Batch(tokens=toks))
    assert np.abs(np.asarray(causal_lg) - ref).max() > 0.05


def test_dream_noncausal_parity(tmp_path):
    """dream = qwen2 graph (biased qkv, NeoX rope) without causality."""
    rng = RNG(2)
    st = {"model.embed_tokens.weight": w(rng, V, D),
          "model.norm.weight": 1 + w(rng, D, s=0.02),
          "lm_head.weight": w(rng, V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        st[p + "input_layernorm.weight"] = 1 + w(rng, D, s=0.02)
        st[p + "post_attention_layernorm.weight"] = 1 + w(rng, D, s=0.02)
        for nm, rows in (("q_proj", NH * HD), ("k_proj", NKV * HD),
                         ("v_proj", NKV * HD)):
            st[p + f"self_attn.{nm}.weight"] = w(rng, rows, D)
            st[p + f"self_attn.{nm}.bias"] = w(rng, rows, s=0.02)
        st[p + "self_attn.o_proj.weight"] = w(rng, D, NH * HD)
        st[p + "mlp.gate_proj.weight"] = w(rng, FF, D)
        st[p + "mlp.up_proj.weight"] = w(rng, FF, D)
        st[p + "mlp.down_proj.weight"] = w(rng, D, FF)
    cfg = dict(vocab_size=V, hidden_size=D, intermediate_size=FF,
               num_hidden_layers=L, num_attention_heads=NH,
               num_key_value_heads=NKV, rms_norm_eps=1e-6,
               mask_token_id=5, max_position_embeddings=64,
               tie_word_embeddings=False)
    toks = RNG(3).integers(2, V, T).astype(np.int32)
    pos = np.arange(T)

    h = st["model.embed_tokens.weight"][toks].astype(np.float32)
    for i in range(L):
        p = f"model.layers.{i}."
        hn = O.rms_norm(h, st[p + "input_layernorm.weight"])
        q = (hn @ st[p + "self_attn.q_proj.weight"].T
             + st[p + "self_attn.q_proj.bias"]).reshape(T, NH, HD)
        k = (hn @ st[p + "self_attn.k_proj.weight"].T
             + st[p + "self_attn.k_proj.bias"]).reshape(T, NKV, HD)
        v = (hn @ st[p + "self_attn.v_proj.weight"].T
             + st[p + "self_attn.v_proj.bias"]).reshape(T, NKV, HD)
        q = O.rope(q, pos, neox=True)
        k = O.rope(k, pos, neox=True)
        attn = O.attention(q, k, v, causal=False)
        h = h + attn.reshape(T, -1) @ st[p + "self_attn.o_proj.weight"].T
        hn2 = O.rms_norm(h, st[p + "post_attention_layernorm.weight"])
        h = h + O.swiglu_ffn(hn2, st[p + "mlp.gate_proj.weight"],
                             st[p + "mlp.up_proj.weight"],
                             st[p + "mlp.down_proj.weight"])
    ref = O.rms_norm(h, st["model.norm.weight"]) @ st["lm_head.weight"].T

    ours, ecfg, reader = engine(tmp_path, st, cfg, "dream", toks)
    assert ecfg.rope_neox
    assert reader.kv["dream.diffusion.shift_logits"] is False
    check(ours, ref)


def test_llada_moe_noncausal_parity(tmp_path):
    """llada_moe: per-head q/k RMS norms + softmax MoE without top-k
    renorm, non-causal."""
    rng = RNG(4)
    E, K, EFF = 4, 2, 32
    st = {"model.embed_tokens.weight": w(rng, V, D),
          "model.norm.weight": 1 + w(rng, D, s=0.02),
          "lm_head.weight": w(rng, V, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        st[p + "input_layernorm.weight"] = 1 + w(rng, D, s=0.02)
        st[p + "post_attention_layernorm.weight"] = 1 + w(rng, D, s=0.02)
        st[p + "self_attn.q_proj.weight"] = w(rng, NH * HD, D)
        st[p + "self_attn.k_proj.weight"] = w(rng, NKV * HD, D)
        st[p + "self_attn.v_proj.weight"] = w(rng, NKV * HD, D)
        st[p + "self_attn.o_proj.weight"] = w(rng, D, NH * HD)
        st[p + "self_attn.q_norm.weight"] = 1 + w(rng, HD, s=0.02)
        st[p + "self_attn.k_norm.weight"] = 1 + w(rng, HD, s=0.02)
        st[p + "mlp.gate.weight"] = w(rng, E, D, s=0.8)
        for e in range(E):
            ep = p + f"mlp.experts.{e}."
            st[ep + "gate_proj.weight"] = w(rng, EFF, D)
            st[ep + "up_proj.weight"] = w(rng, EFF, D)
            st[ep + "down_proj.weight"] = w(rng, D, EFF)
    cfg = dict(vocab_size=V, hidden_size=D, intermediate_size=FF,
               num_hidden_layers=L, num_attention_heads=NH,
               num_key_value_heads=NKV, rms_norm_eps=1e-6,
               num_experts=E, num_experts_per_tok=K,
               expert_intermediate_size=EFF,
               max_position_embeddings=64, tie_word_embeddings=False)
    toks = RNG(5).integers(2, V, T).astype(np.int32)
    pos = np.arange(T)

    h = st["model.embed_tokens.weight"][toks].astype(np.float32)
    for i in range(L):
        p = f"model.layers.{i}."
        hn = O.rms_norm(h, st[p + "input_layernorm.weight"])
        q = (hn @ st[p + "self_attn.q_proj.weight"].T).reshape(T, NH, HD)
        k = (hn @ st[p + "self_attn.k_proj.weight"].T).reshape(T, NKV, HD)
        v = (hn @ st[p + "self_attn.v_proj.weight"].T).reshape(T, NKV, HD)
        q = O.rms_norm(q, st[p + "self_attn.q_norm.weight"])
        k = O.rms_norm(k, st[p + "self_attn.k_norm.weight"])
        q = O.rope(q, pos, neox=True)
        k = O.rope(k, pos, neox=True)
        attn = O.attention(q, k, v, causal=False)
        h = h + attn.reshape(T, -1) @ st[p + "self_attn.o_proj.weight"].T
        hn2 = O.rms_norm(h, st[p + "post_attention_layernorm.weight"])
        ge = np.stack([st[p + f"mlp.experts.{e}.gate_proj.weight"]
                       for e in range(E)])
        ue = np.stack([st[p + f"mlp.experts.{e}.up_proj.weight"]
                       for e in range(E)])
        de = np.stack([st[p + f"mlp.experts.{e}.down_proj.weight"]
                       for e in range(E)])
        h = h + O.moe(hn2, st[p + "mlp.gate.weight"], ge, ue, de,
                      k=K, norm_w=False)
    ref = O.rms_norm(h, st["model.norm.weight"]) @ st["lm_head.weight"].T

    ours, ecfg, _ = engine(tmp_path, st, cfg, "llada_moe", toks)
    assert not ecfg.moe_norm_w
    check(ours, ref)


def test_diffusion_example_generates():
    """The masked-diffusion driver unmasks everything and is
    deterministic under greedy confidence selection."""
    import pathlib
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]
                           / "examples"))
    import diffusion

    out1 = diffusion.main(["--steps", "6", "--n-gen", "10"])
    out2 = diffusion.main(["--steps", "6", "--n-gen", "10"])
    np.testing.assert_array_equal(out1, out2)
