"""LFM2-MoE (GGUF arch "lfm2moe") parity test — reference llm_build_lfm2
with build_moe_feed_forward (src/llama-model.cpp, LLM_ARCH_LFM2MOE
hparams at :2026): lfm2's hybrid shortconv/attention mixers with a
sigmoid-routed top-k SwiGLU expert FFN after `num_dense_layers` dense
leads; expert selection biased by expert_bias, weights renormalized.

Oracle: token-by-token numpy straight from the HF Lfm2MoeForCausalLM
checkpoint layout (not importable from transformers here — fabricated
state in the real tensor naming, converted through convert_llm)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_tpu.models import lfm2

C, NH, HKV, DH, V = 32, 4, 2, 8, 64
FF, FFE, NE, K = 48, 24, 4, 2
NL, NDENSE = 4, 1
TYPES = ["conv", "full_attention", "conv", "full_attention"]
EPS = 1e-5
LCACHE = 3


def _rms(x, w, eps=EPS):
    return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w


def make_hf_state(seed=5):
    rng = np.random.default_rng(seed)
    w = lambda *s, sc=0.15: (rng.standard_normal(s) * sc).astype(np.float32)
    sd = {"model.embed_tokens.weight": w(V, C, sc=0.5),
          "model.embedding_norm.weight": w(C, sc=0.2) + 1.0}
    for i in range(NL):
        p = f"model.layers.{i}."
        sd[p + "operator_norm.weight"] = w(C, sc=0.2) + 1.0
        sd[p + "ffn_norm.weight"] = w(C, sc=0.2) + 1.0
        if TYPES[i] == "conv":
            sd[p + "conv.in_proj.weight"] = w(3 * C, C)
            sd[p + "conv.out_proj.weight"] = w(C, C)
            sd[p + "conv.conv.weight"] = w(C, 1, LCACHE)
        else:
            sd[p + "self_attn.q_proj.weight"] = w(NH * DH, C)
            sd[p + "self_attn.k_proj.weight"] = w(HKV * DH, C)
            sd[p + "self_attn.v_proj.weight"] = w(HKV * DH, C)
            sd[p + "self_attn.out_proj.weight"] = w(C, NH * DH)
            sd[p + "self_attn.q_layernorm.weight"] = w(DH, sc=0.2) + 1.0
            sd[p + "self_attn.k_layernorm.weight"] = w(DH, sc=0.2) + 1.0
        if i >= NDENSE:
            sd[p + "feed_forward.gate.weight"] = w(NE, C)
            sd[p + "feed_forward.expert_bias"] = w(NE, sc=0.3)
            for x in range(NE):
                e = p + f"feed_forward.experts.{x}."
                sd[e + "w1.weight"] = w(FFE, C)
                sd[e + "w2.weight"] = w(C, FFE)
                sd[e + "w3.weight"] = w(FFE, C)
        else:
            sd[p + "feed_forward.w1.weight"] = w(FF, C)
            sd[p + "feed_forward.w2.weight"] = w(C, FF)
            sd[p + "feed_forward.w3.weight"] = w(FF, C)
    return sd


def _rope(x, pos, base=1e6):
    half = DH // 2
    freq = base ** (-np.arange(half) / half)
    ang = pos * freq
    cos, sin = np.cos(ang), np.sin(ang)
    x1, x2 = x[..., :half], x[..., half:]
    return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)


def oracle_forward(sd, tokens):
    t_all = len(tokens)
    conv_state = {i: np.zeros((LCACHE - 1, C), np.float32)
                  for i in range(NL) if TYPES[i] == "conv"}
    kv = {i: ([], []) for i in range(NL) if TYPES[i] == "full_attention"}
    rows = []
    for ti in range(t_all):
        x = sd["model.embed_tokens.weight"][tokens[ti]].copy()
        for i in range(NL):
            p = f"model.layers.{i}."
            hn = _rms(x, sd[p + "operator_norm.weight"])
            if TYPES[i] == "conv":
                bcx = sd[p + "conv.in_proj.weight"] @ hn
                b, c, xx = bcx[:C], bcx[C:2 * C], bcx[2 * C:]
                bx = b * xx
                full = np.concatenate([conv_state[i], bx[None]], 0)
                kern = sd[p + "conv.conv.weight"][:, 0, :]  # [C, L]
                y = sum(full[j] * kern[:, j] for j in range(LCACHE))
                conv_state[i] = full[1:]
                mix = sd[p + "conv.out_proj.weight"] @ (c * y)
            else:
                import ml_dtypes

                bf16 = lambda a: a.astype(ml_dtypes.bfloat16).astype(
                    np.float32)  # the KV cache stores bf16
                q = (sd[p + "self_attn.q_proj.weight"] @ hn).reshape(NH, DH)
                k = (sd[p + "self_attn.k_proj.weight"] @ hn).reshape(HKV, DH)
                v = (sd[p + "self_attn.v_proj.weight"] @ hn).reshape(HKV, DH)
                q = _rope(_rms(q, sd[p + "self_attn.q_layernorm.weight"]), ti)
                k = _rope(_rms(k, sd[p + "self_attn.k_layernorm.weight"]), ti)
                kv[i][0].append(bf16(k))
                kv[i][1].append(bf16(v))
                ks = np.stack(kv[i][0])  # [T, HKV, DH]
                vs = np.stack(kv[i][1])
                q = bf16(q)  # _attn casts q to bf16 for the batched dot
                out = np.zeros((NH, DH), np.float32)
                for h in range(NH):
                    kh = ks[:, h * HKV // NH]
                    vh = vs[:, h * HKV // NH]
                    sc = kh @ q[h] / np.sqrt(DH)
                    a = np.exp(sc - sc.max())
                    a /= a.sum()
                    out[h] = a @ vh
                mix = sd[p + "self_attn.out_proj.weight"] @ out.reshape(-1)
            x = x + mix
            hn2 = _rms(x, sd[p + "ffn_norm.weight"])
            if i >= NDENSE:
                probs = 1 / (1 + np.exp(-(sd[p + "feed_forward.gate.weight"]
                                          @ hn2)))
                sel = probs + sd[p + "feed_forward.expert_bias"]
                top = np.argsort(-sel)[:K]
                wts = probs[top]
                wts = wts / wts.sum()
                ff = np.zeros(C, np.float32)
                for j, e in enumerate(top):
                    ep = p + f"feed_forward.experts.{e}."
                    g = sd[ep + "w1.weight"] @ hn2
                    u = sd[ep + "w3.weight"] @ hn2
                    act = g / (1 + np.exp(-g)) * u
                    ff += wts[j] * (sd[ep + "w2.weight"] @ act)
            else:
                g = sd[p + "feed_forward.w1.weight"] @ hn2
                u = sd[p + "feed_forward.w3.weight"] @ hn2
                ff = sd[p + "feed_forward.w2.weight"] @ (g / (1 + np.exp(-g))
                                                         * u)
            x = x + ff
        hid = _rms(x, sd["model.embedding_norm.weight"])
        rows.append(hid @ sd["model.embed_tokens.weight"].T)
    return np.stack(rows)


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.core.gguf import GGUFReader

    sd = make_hf_state()
    config = {"hidden_size": C, "num_hidden_layers": NL,
              "num_attention_heads": NH, "num_key_value_heads": HKV,
              "intermediate_size": FF, "moe_intermediate_size": FFE,
              "num_experts": NE, "num_experts_per_tok": K,
              "num_dense_layers": NDENSE, "conv_L_cache": LCACHE,
              "layer_types": TYPES, "vocab_size": V, "norm_eps": EPS,
              "rope_theta": 1e6, "tie_word_embeddings": True}
    path = tmp_path_factory.mktemp("lfm2moe") / "m.gguf"
    convert_llm(sd, config, str(path), arch="lfm2moe")
    reader = GGUFReader(str(path))
    cfg = lfm2.Lfm2Config.from_gguf(reader.kv)
    params = lfm2.load_params(reader, cfg)
    return sd, cfg, params


def test_config(converted):
    _, cfg, _ = converted
    assert cfg.n_experts == NE and cfg.n_experts_used == K
    assert cfg.n_dense_lead == NDENSE and cfg.d_ff_exp == FFE
    assert cfg.kv_heads == (0, HKV, 0, HKV)


def test_logits_match_scalar_oracle(converted):
    sd, cfg, params = converted
    toks = np.array([3, 11, 7, 29, 13, 41], np.int64)
    ref = oracle_forward(sd, toks)
    fwd = jax.jit(lfm2.forward, static_argnums=(1,))
    cache = lfm2.make_cache(cfg, kv_size=32, n_seqs=2)
    logits, cache = fwd(params, cfg, jnp.asarray(toks, jnp.int32), cache, 0)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-4, atol=2e-4)


def test_prefill_equals_stepwise(converted):
    _, cfg, params = converted
    toks = np.array([9, 1, 33, 60, 17], np.int64)
    fwd = jax.jit(lfm2.forward, static_argnums=(1,))
    cache_a = lfm2.make_cache(cfg, kv_size=32, n_seqs=2)
    la, _ = fwd(params, cfg, jnp.asarray(toks, jnp.int32), cache_a, 0)
    cache_b = lfm2.make_cache(cfg, kv_size=32, n_seqs=2)
    rows = []
    for t in toks:
        lg, cache_b = fwd(params, cfg, jnp.asarray([t], jnp.int32),
                          cache_b, 0)
        rows.append(np.asarray(lg[0]))
    np.testing.assert_allclose(np.asarray(la), np.stack(rows), rtol=1e-3,
                               atol=1e-4)


def test_cli_autodetect():
    from omni_tpu.cli.convert_hf import _HF_ARCH_MAP

    assert _HF_ARCH_MAP.get("Lfm2MoeForCausalLM") == "lfm2moe"
