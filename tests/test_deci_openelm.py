"""Deci (per-layer GQA + attention-free / linear-attention / FFN-free
layers) and OpenELM (per-layer head counts + FFN widths) — numpy-oracle
parity per the reference graphs (llm_build_deci / llm_build_openelm)."""

import numpy as np

from omni_tpu.core import GGMLType, GGUFReader
from omni_tpu.models import qwen3
from omni_tpu.runtime import Batch, Context

import np_oracle as O

RNG = np.random.default_rng
D, V, T = 32, 64, 8


def w(rng, *shape, s=0.08):
    return (rng.standard_normal(shape) * s).astype(np.float32)


def engine(tmp_path, st, cfg, arch, toks):
    from omni_tpu.convert.hf_to_gguf import convert_llm

    path = tmp_path / f"{arch}.gguf"
    convert_llm(st, cfg, path, arch=arch, qtype=GGMLType.F32)
    reader = GGUFReader(path)
    ecfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader)
    ctx = Context(ecfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    return np.asarray(logits), ecfg


def test_deci_parity(tmp_path):
    """4 layers: GQA(kv=2), linear-attention, attention-free, MHA with
    no FFN — the Nemotron-51B/253B block-config variants."""
    rng = RNG(0)
    NH, HD = 4, 8
    blocks = [
        {"attention": {"n_heads_in_group": 2, "replace_with_linear": False},
         "ffn": {"ffn_mult": 2.0}},
        {"attention": {"n_heads_in_group": None, "replace_with_linear": True},
         "ffn": {"ffn_mult": 2.0}},
        {"attention": {"n_heads_in_group": None,
                       "replace_with_linear": False},
         "ffn": {"ffn_mult": 2.0}},
        {"attention": {"n_heads_in_group": 1, "replace_with_linear": False},
         "ffn": {"ffn_mult": None}},
    ]
    ff = 256 * ((int(2 * 2.0 * D / 3) + 255) // 256)  # 256
    st = {"model.embed_tokens.weight": w(rng, V, D),
          "model.norm.weight": 1 + w(rng, D, s=0.02),
          "lm_head.weight": w(rng, V, D)}
    for i, bc in enumerate(blocks):
        p = f"model.layers.{i}."
        g_ = bc["attention"]["n_heads_in_group"]
        if g_ is not None:
            nk = NH // g_
            st[p + "input_layernorm.weight"] = 1 + w(rng, D, s=0.02)
            st[p + "self_attn.q_proj.weight"] = w(rng, NH * HD, D)
            st[p + "self_attn.k_proj.weight"] = w(rng, nk * HD, D)
            st[p + "self_attn.v_proj.weight"] = w(rng, nk * HD, D)
            st[p + "self_attn.o_proj.weight"] = w(rng, D, NH * HD)
        elif bc["attention"]["replace_with_linear"]:
            st[p + "input_layernorm.weight"] = 1 + w(rng, D, s=0.02)
            st[p + "self_attn.linear_attn.weight"] = w(rng, D, D)
        if bc["ffn"]["ffn_mult"] is not None:
            st[p + "post_attention_layernorm.weight"] = \
                1 + w(rng, D, s=0.02)
            st[p + "mlp.gate_proj.weight"] = w(rng, ff, D)
            st[p + "mlp.up_proj.weight"] = w(rng, ff, D)
            st[p + "mlp.down_proj.weight"] = w(rng, D, ff)
    cfg = dict(vocab_size=V, hidden_size=D, num_hidden_layers=4,
               num_attention_heads=NH, block_configs=blocks,
               rms_norm_eps=1e-6, max_position_embeddings=64,
               rope_theta=10000.0, tie_word_embeddings=False)
    toks = RNG(1).integers(2, V, T).astype(np.int32)
    pos = np.arange(T)

    h = st["model.embed_tokens.weight"][toks].astype(np.float32)
    for i, bc in enumerate(blocks):
        p = f"model.layers.{i}."
        g_ = bc["attention"]["n_heads_in_group"]
        if g_ is not None:
            nk = NH // g_
            hn = O.rms_norm(h, st[p + "input_layernorm.weight"])
            q = (hn @ st[p + "self_attn.q_proj.weight"].T).reshape(T, NH, HD)
            k = (hn @ st[p + "self_attn.k_proj.weight"].T).reshape(T, nk, HD)
            v = (hn @ st[p + "self_attn.v_proj.weight"].T).reshape(T, nk, HD)
            q = O.rope(q, pos, neox=True)  # HF half-split layout
            k = O.rope(k, pos, neox=True)
            attn = O.attention(q, k, v)
            h = h + attn.reshape(T, -1) @ st[p + "self_attn.o_proj.weight"].T
        elif bc["attention"]["replace_with_linear"]:
            hn = O.rms_norm(h, st[p + "input_layernorm.weight"])
            h = h + hn @ st[p + "self_attn.linear_attn.weight"].T
        if bc["ffn"]["ffn_mult"] is not None:
            hn2 = O.rms_norm(h, st[p + "post_attention_layernorm.weight"])
            h = h + O.swiglu_ffn(hn2, st[p + "mlp.gate_proj.weight"],
                                 st[p + "mlp.up_proj.weight"],
                                 st[p + "mlp.down_proj.weight"])
    ref = O.rms_norm(h, st["model.norm.weight"]) @ st["lm_head.weight"].T

    ours, ecfg = engine(tmp_path, st, cfg, "deci", toks)
    assert ecfg.layer_heads == ((4, 2), (4, 0), (0, 0), (4, 4))
    assert not ecfg.rope_neox
    np.testing.assert_allclose(ours, ref, atol=0.03)


def test_openelm_parity(tmp_path):
    """Per-layer q/kv head counts + FFN widths, fused qkv/gate_up
    de-fuse, per-head q/k RMS norms, NeoX rope."""
    rng = RNG(2)
    HD = 8
    heads = [2, 4]
    kvs = [1, 2]
    mults = [1.0, 2.0]
    div = 32
    ffs = [max(div, int(m * D + div / 2) // div * div) for m in mults]
    st = {"transformer.token_embeddings.weight": w(rng, V, D),
          "transformer.norm.weight": 1 + w(rng, D, s=0.02)}
    for i in range(2):
        p = f"transformer.layers.{i}."
        nh, nk, ff = heads[i], kvs[i], ffs[i]
        st[p + "attn_norm.weight"] = 1 + w(rng, D, s=0.02)
        st[p + "attn.qkv_proj.weight"] = w(rng, (nh + 2 * nk) * HD, D)
        st[p + "attn.q_norm.weight"] = 1 + w(rng, HD, s=0.1)
        st[p + "attn.k_norm.weight"] = 1 + w(rng, HD, s=0.1)
        st[p + "attn.out_proj.weight"] = w(rng, D, nh * HD)
        st[p + "ffn_norm.weight"] = 1 + w(rng, D, s=0.02)
        st[p + "ffn.proj_1.weight"] = w(rng, 2 * ff, D)
        st[p + "ffn.proj_2.weight"] = w(rng, D, ff)
    cfg = dict(vocab_size=V, model_dim=D, num_transformer_layers=2,
               head_dim=HD, num_query_heads=heads, num_kv_heads=kvs,
               ffn_multipliers=mults, ffn_dim_divisor=div,
               rope_freq_constant=10000.0, max_context_length=64)
    toks = RNG(3).integers(2, V, T).astype(np.int32)
    pos = np.arange(T)

    h = st["transformer.token_embeddings.weight"][toks].astype(np.float32)
    for i in range(2):
        p = f"transformer.layers.{i}."
        nh, nk, ff = heads[i], kvs[i], ffs[i]
        hn = O.rms_norm(h, st[p + "attn_norm.weight"], eps=1e-6)
        qkv = hn @ st[p + "attn.qkv_proj.weight"].T
        q = qkv[:, : nh * HD].reshape(T, nh, HD)
        k = qkv[:, nh * HD: (nh + nk) * HD].reshape(T, nk, HD)
        v = qkv[:, (nh + nk) * HD:].reshape(T, nk, HD)
        q = O.rms_norm(q, st[p + "attn.q_norm.weight"], eps=1e-6)
        k = O.rms_norm(k, st[p + "attn.k_norm.weight"], eps=1e-6)
        q = O.rope(q, pos, neox=True)
        k = O.rope(k, pos, neox=True)
        attn = O.attention(q, k, v)
        h = h + attn.reshape(T, -1) @ st[p + "attn.out_proj.weight"].T
        hn2 = O.rms_norm(h, st[p + "ffn_norm.weight"], eps=1e-6)
        gu = hn2 @ st[p + "ffn.proj_1.weight"].T
        h = h + (O.silu(gu[:, :ff]) * gu[:, ff:]) \
            @ st[p + "ffn.proj_2.weight"].T
    ref = (O.rms_norm(h, st["transformer.norm.weight"], eps=1e-6)
           @ st["transformer.token_embeddings.weight"].T)  # tied head

    ours, ecfg = engine(tmp_path, st, cfg, "openelm", toks)
    assert ecfg.layer_heads == ((2, 1), (4, 2))
    assert ecfg.rope_neox
    np.testing.assert_allclose(ours, ref, atol=0.03)
