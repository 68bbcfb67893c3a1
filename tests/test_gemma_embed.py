"""EmbeddingGemma (GGUF arch "gemma-embedding") parity tests — reference
llm_build_gemma_embedding (src/llama-model.cpp:11412): bidirectional
gemma3 blocks, symmetric SWA on 5-of-6 layers with per-layer rope base,
q scaled by 1/sqrt(head_dim), sqrt(d) embedding scale, sandwich norms,
and the sentence-transformers dense_2/dense_3 post-pooling projections
(llama-graph.cpp:1887 build_dense_out)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from omni_tpu.models import gemma_embed

D, H, HKV, DH, F, V, NL = 32, 4, 2, 8, 48, 64, 7  # layer 5 is global
SWA = 8  # symmetric window: |i-j| <= 4
EPS = 1e-6


def _rms(x, w, eps=EPS):
    return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w


def _rope(x, pos, base):
    half = DH // 2
    freq = base ** (-np.arange(half) / half)
    ang = pos[:, None] * freq[None]
    cos, sin = np.cos(ang)[:, None], np.sin(ang)[:, None]
    x1, x2 = x[..., :half], x[..., half:]
    return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)


def make_hf_state(seed=3):
    rng = np.random.default_rng(seed)
    w = lambda *s, sc=0.1: (rng.standard_normal(s) * sc).astype(np.float32)
    sd = {"model.embed_tokens.weight": w(V, D, sc=0.5),
          "model.norm.weight": w(D, sc=0.2),
          "2_Dense.linear.weight": w(24, D, sc=0.2),
          "3_Dense.linear.weight": w(D, 24, sc=0.2)}
    for i in range(NL):
        p = f"model.layers.{i}."
        sd.update({
            p + "input_layernorm.weight": w(D, sc=0.2),
            p + "post_attention_layernorm.weight": w(D, sc=0.2),
            p + "pre_feedforward_layernorm.weight": w(D, sc=0.2),
            p + "post_feedforward_layernorm.weight": w(D, sc=0.2),
            p + "self_attn.q_proj.weight": w(H * DH, D, sc=0.2),
            p + "self_attn.k_proj.weight": w(HKV * DH, D, sc=0.2),
            p + "self_attn.v_proj.weight": w(HKV * DH, D, sc=0.2),
            p + "self_attn.o_proj.weight": w(D, H * DH, sc=0.2),
            p + "self_attn.q_norm.weight": w(DH, sc=0.2),
            p + "self_attn.k_norm.weight": w(DH, sc=0.2),
            p + "mlp.gate_proj.weight": w(F, D, sc=0.2),
            p + "mlp.up_proj.weight": w(F, D, sc=0.2),
            p + "mlp.down_proj.weight": w(D, F, sc=0.2),
        })
    return sd


def oracle_forward(sd, tokens):
    """Numpy bidirectional gemma3 (norm weights used HF-style: GGUF holds
    w+1, the graph multiplies by (1+w_hf) — oracle adds 1 explicitly)."""
    t = len(tokens)
    pos = np.arange(t, dtype=np.float64)
    x = sd["model.embed_tokens.weight"][tokens] * math.sqrt(D)
    dist = np.abs(pos[None, :] - pos[:, None])
    for i in range(NL):
        p = f"model.layers.{i}."
        local = i % 6 < 5
        base = 10000.0 if local else 1_000_000.0
        amask = dist <= SWA // 2 if local else np.ones((t, t), bool)

        h = _rms(x, 1 + sd[p + "input_layernorm.weight"])
        q = (h @ sd[p + "self_attn.q_proj.weight"].T).reshape(t, H, DH)
        k = (h @ sd[p + "self_attn.k_proj.weight"].T).reshape(t, HKV, DH)
        v = (h @ sd[p + "self_attn.v_proj.weight"].T).reshape(t, HKV, DH)
        q = _rope(_rms(q, 1 + sd[p + "self_attn.q_norm.weight"]), pos, base)
        k = _rope(_rms(k, 1 + sd[p + "self_attn.k_norm.weight"]), pos, base)
        k = np.repeat(k, H // HKV, 1)
        v = np.repeat(v, H // HKV, 1)
        sc = np.einsum("qhd,khd->hqk", q / math.sqrt(DH), k)
        sc = np.where(amask[None], sc, -1e30)
        att = np.exp(sc - sc.max(-1, keepdims=True))
        att /= att.sum(-1, keepdims=True)
        o = np.einsum("hqk,khd->qhd", att, v).reshape(t, -1)
        o = o @ sd[p + "self_attn.o_proj.weight"].T
        x = x + _rms(o, 1 + sd[p + "post_attention_layernorm.weight"])

        h = _rms(x, 1 + sd[p + "pre_feedforward_layernorm.weight"])
        g = h @ sd[p + "mlp.gate_proj.weight"].T
        gelu = 0.5 * g * (1 + np.tanh(0.7978845608028654
                                      * (g + 0.044715 * g ** 3)))
        ff = (gelu * (h @ sd[p + "mlp.up_proj.weight"].T)
              ) @ sd[p + "mlp.down_proj.weight"].T
        x = x + _rms(ff, 1 + sd[p + "post_feedforward_layernorm.weight"])
    return _rms(x, 1 + sd["model.norm.weight"])


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.core.gguf import GGUFReader

    sd = make_hf_state()
    config = {"hidden_size": D, "num_hidden_layers": NL,
              "num_attention_heads": H, "num_key_value_heads": HKV,
              "head_dim": DH, "intermediate_size": F, "vocab_size": V,
              "rms_norm_eps": EPS, "rope_theta": 1_000_000.0,
              "sliding_window": SWA, "pooling_type": 1}
    path = tmp_path_factory.mktemp("gembed") / "ge.gguf"
    convert_llm(sd, config, str(path), arch="gemma-embedding")
    reader = GGUFReader(str(path))
    cfg = gemma_embed.GemmaEmbedConfig.from_gguf(reader.kv)
    params = gemma_embed.load_params(reader)
    return sd, cfg, params


def test_config(converted):
    _, cfg, _ = converted
    assert (cfg.n_layers, cfg.head_dim, cfg.n_kv_heads) == (NL, DH, HKV)
    assert cfg.swa_window == SWA and cfg.pooling == 1
    assert cfg.dense_2 and cfg.dense_3


def test_hidden_states_match_oracle(converted):
    sd, cfg, params = converted
    toks = np.array([1, 5, 9, 30, 2, 17, 44, 25, 60, 11], np.int32)
    ref = oracle_forward(sd, toks)
    got = np.asarray(gemma_embed.forward(
        params, cfg, jnp.asarray(toks), jnp.ones(len(toks), bool)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_encode_mean_pool_and_dense(converted):
    sd, cfg, params = converted
    toks = np.array([4, 2, 42], np.int32)
    ref = oracle_forward(sd, toks).mean(axis=0)
    ref = ref @ sd["2_Dense.linear.weight"].T
    ref = ref @ sd["3_Dense.linear.weight"].T
    ref = ref / np.linalg.norm(ref)
    got = np.asarray(gemma_embed.encode(params, cfg, toks))
    assert got.shape == (D,)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_padding_invariance(converted):
    """Masked tail positions must not leak into valid hidden states."""
    _, cfg, params = converted
    toks = np.array([7, 3, 19], np.int32)
    a = np.asarray(gemma_embed.forward(
        params, cfg, jnp.asarray(toks), jnp.ones(3, bool)))
    padded = np.concatenate([toks, [0, 0, 0]]).astype(np.int32)
    m = np.array([1, 1, 1, 0, 0, 0], bool)
    b = np.asarray(gemma_embed.forward(
        params, cfg, jnp.asarray(padded), jnp.asarray(m)))[:3]
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_cli_autodetect():
    from omni_tpu.cli.convert_hf import detect_arch

    assert detect_arch({"architectures": ["Gemma3TextModel"],
                        "sliding_window": SWA}) == "gemma-embedding"
