"""RWKV6Qwen2 (QRWKV) GGUF-loadable arch tests (reference
llm_build_rwkv6qwen2, src/llama-model.cpp:15574 + ggml_gated_linear_attn,
ggml-cpu/ops.cpp:9393).

Oracle: token-by-token numpy GLA straight from the HF checkpoint layout
(model.layers.*.self_attn.time_maa_* with the lora blocks in r,k,v,w,g
order). The production path converts through convert_llm(arch=
"rwkv6qwen2") — exercising the exporter's rkvwg->wkvrg block permutation,
transposes and lerp fusion — loads the GGUF and must match.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_tpu.models import rwkv6

C, D, NL, V = 32, 8, 3, 64     # H=4 heads
HKV = 2                        # GQA: 2 kv heads repeated to 4
W_MIX, W_DECAY = 8, 16
FF = 48
EPS = 1e-6


def _rms(x, w, eps=EPS):
    return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w


def make_hf_state(seed=1):
    rng = np.random.default_rng(seed)
    w = lambda *s, sc=0.1: (rng.standard_normal(s) * sc).astype(np.float32)
    sd = {
        "model.embed_tokens.weight": w(V, C, sc=0.5),
        "model.norm.weight": w(C, sc=0.2) + 1.0,
        "lm_head.weight": w(V, C, sc=0.3),
    }
    for i in range(NL):
        p = f"model.layers.{i}."
        a = p + "self_attn."
        sd.update({
            p + "input_layernorm.weight": w(C, sc=0.2) + 1.0,
            p + "post_attention_layernorm.weight": w(C, sc=0.2) + 1.0,
            a + "time_maa_x": w(1, 1, C, sc=0.4),
            a + "time_maa_w": w(1, 1, C, sc=0.4),
            a + "time_maa_k": w(1, 1, C, sc=0.4),
            a + "time_maa_v": w(1, 1, C, sc=0.4),
            a + "time_maa_r": w(1, 1, C, sc=0.4),
            a + "time_maa_g": w(1, 1, C, sc=0.4),
            # lora blocks stored in r,k,v,w,g order (RWKV6Qwen2Model)
            a + "time_maa_w1": w(C, 5 * W_MIX, sc=0.3),
            a + "time_maa_w2": w(5, W_MIX, C, sc=0.3),
            a + "time_decay": w(1, 1, C, sc=0.5) - 4.0,
            a + "time_decay_w1": w(C, W_DECAY, sc=0.3),
            a + "time_decay_w2": w(W_DECAY, C, sc=0.3),
            a + "q_proj.weight": w(C, C, sc=0.2),
            a + "q_proj.bias": w(C, sc=0.1),
            a + "k_proj.weight": w(HKV * D, C, sc=0.2),
            a + "k_proj.bias": w(HKV * D, sc=0.1),
            a + "v_proj.weight": w(HKV * D, C, sc=0.2),
            a + "v_proj.bias": w(HKV * D, sc=0.1),
            a + "gate.weight": w(C, C, sc=0.2),
            a + "o_proj.weight": w(C, C, sc=0.2),
            p + "mlp.gate_proj.weight": w(FF, C, sc=0.2),
            p + "mlp.up_proj.weight": w(FF, C, sc=0.2),
            p + "mlp.down_proj.weight": w(C, FF, sc=0.2),
        })
    return sd


def oracle_forward(sd, tokens):
    """Token-loop numpy QRWKV: lerp tower with HF r,k,v,w,g block order,
    qkv biases, GQA repeat, k*(1-w), GLA recurrence reading the UPDATED
    state with r scaled by D^-0.5, sigmoid gate, SwiGLU FFN."""
    h = C // D
    out_rows = []
    att_prev = [np.zeros(C, np.float32) for _ in range(NL)]
    wkv = [np.zeros((h, D, D), np.float32) for _ in range(NL)]
    for tok in tokens:
        x = sd["model.embed_tokens.weight"][tok].copy()
        for i in range(NL):
            p = f"model.layers.{i}."
            a = p + "self_attn."
            xa = _rms(x, sd[p + "input_layernorm.weight"])
            sx = att_prev[i] - xa
            att_prev[i] = xa
            xxx = xa + sx * sd[a + "time_maa_x"].reshape(-1)
            t5 = np.tanh(xxx @ sd[a + "time_maa_w1"]).reshape(5, W_MIX)
            xs = {}
            for bi, s in enumerate("rkvwg"):  # HF block order
                m = t5[bi] @ sd[a + "time_maa_w2"][bi]
                xs[s] = xa + sx * (sd[a + f"time_maa_{s}"].reshape(-1) + m)
            r = sd[a + "q_proj.weight"] @ xs["r"] + sd[a + "q_proj.bias"]
            k = sd[a + "k_proj.weight"] @ xs["k"] + sd[a + "k_proj.bias"]
            v = sd[a + "v_proj.weight"] @ xs["v"] + sd[a + "v_proj.bias"]
            g = 1.0 / (1.0 + np.exp(-(sd[a + "gate.weight"] @ xs["g"])))
            ww = (np.tanh(xs["w"] @ sd[a + "time_decay_w1"])
                  @ sd[a + "time_decay_w2"])
            wdec = np.exp(-np.exp(sd[a + "time_decay"].reshape(-1) + ww))
            # GQA repeat kv heads
            k = np.repeat(k.reshape(HKV, 1, D), h // HKV, 1).reshape(C)
            v = np.repeat(v.reshape(HKV, 1, D), h // HKV, 1).reshape(C)
            out = np.zeros(C, np.float32)
            scale = D ** -0.5
            for hh in range(h):
                rs = r[hh * D:(hh + 1) * D] * scale
                ks = k[hh * D:(hh + 1) * D] * (1.0 - wdec[hh * D:(hh + 1) * D])
                vs = v[hh * D:(hh + 1) * D]
                ws = wdec[hh * D:(hh + 1) * D]
                S = wkv[i][hh]
                for ii in range(D):
                    for j in range(D):
                        S[ii, j] = S[ii, j] * ws[ii] + ks[ii] * vs[j]
                        out[hh * D + j] += rs[ii] * S[ii, j]
            out = out * g
            x = x + sd[a + "o_proj.weight"] @ out

            xf = _rms(x, sd[p + "post_attention_layernorm.weight"])
            gt = sd[p + "mlp.gate_proj.weight"] @ xf
            up = sd[p + "mlp.up_proj.weight"] @ xf
            x = x + sd[p + "mlp.down_proj.weight"] @ (gt / (1 + np.exp(-gt))
                                                      * up)
        hid = _rms(x, sd["model.norm.weight"])
        out_rows.append(hid @ sd["lm_head.weight"].T)
    return np.stack(out_rows)


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.core.gguf import GGUFReader

    sd = make_hf_state()
    config = {"hidden_size": C, "num_hidden_layers": NL,
              "num_attention_heads": C // D, "num_key_value_heads": HKV,
              "intermediate_size": FF, "vocab_size": V,
              "rms_norm_eps": EPS, "lora_rank_tokenshift": W_MIX,
              "lora_rank_decay": W_DECAY}
    path = tmp_path_factory.mktemp("qrwkv") / "qrwkv.gguf"
    convert_llm(sd, config, str(path), arch="rwkv6qwen2")
    reader = GGUFReader(str(path))
    cfg = rwkv6.RWKV6Config.from_gguf(reader.kv)
    params = rwkv6.load_params(reader)
    return sd, cfg, params


def test_config_from_gguf(converted):
    _, cfg, _ = converted
    assert cfg.arch == "rwkv6qwen2"
    assert (cfg.d_model, cfg.head_size, cfg.n_kv_heads) == (C, D, HKV)
    assert cfg.d_ff == FF and cfg.rescale_every == 0


def test_gguf_logits_match_scalar_oracle(converted):
    sd, cfg, params = converted
    toks = np.array([3, 11, 7, 29, 13, 5, 41, 2], np.int64)
    ref = oracle_forward(sd, toks)
    fwd = jax.jit(rwkv6.forward, static_argnums=(1,))
    cache = rwkv6.make_cache(cfg, 2)
    logits, cache = fwd(params, cfg, jnp.asarray(toks, jnp.int32), cache, 0)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-4, atol=2e-4)
    assert int(cache.pos[0]) == len(toks)


def test_prefill_equals_stepwise(converted):
    _, cfg, params = converted
    toks = np.array([9, 1, 33, 60, 17, 25], np.int64)
    fwd = jax.jit(rwkv6.forward, static_argnums=(1,))

    cache_a = rwkv6.make_cache(cfg, 2)
    la, cache_a = fwd(params, cfg, jnp.asarray(toks, jnp.int32), cache_a, 0)

    cache_b = rwkv6.make_cache(cfg, 2)
    rows = []
    for t in toks:
        lg, cache_b = fwd(params, cfg, jnp.asarray([t], jnp.int32),
                          cache_b, 0)
        rows.append(np.asarray(lg[0]))
    np.testing.assert_allclose(np.asarray(la), np.stack(rows), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(cache_a.ssm[:, 0]),
                               np.asarray(cache_b.ssm[:, 0]), rtol=1e-3,
                               atol=1e-4)


def test_cli_autodetect():
    from omni_tpu.cli.convert_hf import _HF_ARCH_MAP

    assert _HF_ARCH_MAP.get("RWKV6Qwen2ForCausalLM") == "rwkv6qwen2"
