"""Nemotron-H hybrid arch (reference llm_build_nemotron_h): per-layer
dispatch between Mamba2, NoPE attention, and relu^2 FFN single-sublayer
blocks.

Oracle: attention + FFN layers and all wiring (norm -> block -> residual,
per-layer type vectors) are verified against an independent numpy
forward; the Mamba2 mixer math itself reuses ssm._ssm2_step, which is
HF-oracle-verified by test_recurrent.py::test_mamba2_gguf_logits_match_
transformers and the granite-hybrid HF parity test."""

import numpy as np

import jax
import jax.numpy as jnp

from omni_tpu.core import GGMLType, GGUFReader
from omni_tpu.models import nemotron_h, ssm as ssm_mod

import np_oracle as O

C, NH, NKV, HD, FF, V = 32, 4, 2, 8, 48, 64
D_INNER, D_STATE, N_SSM_HEAD, D_CONV = 32, 8, 4, 4
PATTERN = "-*M-"  # ffn, attention, mamba2, ffn


def make_hf_state(seed=0):
    rng = np.random.default_rng(seed)

    def w(*shape, sc=0.08):
        return (rng.standard_normal(shape) * sc).astype(np.float32)

    st = {"backbone.embeddings.weight": w(V, C, sc=0.4),
          "backbone.norm_f.weight": 1 + w(C, sc=0.1),
          "lm_head.weight": w(V, C, sc=0.2)}
    for i, kind in enumerate(PATTERN):
        p = f"backbone.layers.{i}."
        st[p + "norm.weight"] = 1 + w(C, sc=0.1)
        m = p + "mixer."
        if kind == "M":
            conv_ch = D_INNER + 2 * D_STATE  # x | B | C (n_group=1)
            st[m + "in_proj.weight"] = w(
                2 * D_INNER + 2 * D_STATE + N_SSM_HEAD, C)
            st[m + "conv1d.weight"] = w(conv_ch, 1, D_CONV)
            st[m + "conv1d.bias"] = w(conv_ch, sc=0.02)
            st[m + "dt_bias"] = w(N_SSM_HEAD, sc=0.3)
            st[m + "A_log"] = w(N_SSM_HEAD, sc=0.3)
            st[m + "D"] = w(N_SSM_HEAD, sc=0.3) + 1.0
            st[m + "norm.weight"] = 1 + w(D_INNER, sc=0.1)
            st[m + "out_proj.weight"] = w(C, D_INNER)
        elif kind == "*":
            st[m + "q_proj.weight"] = w(NH * HD, C)
            st[m + "k_proj.weight"] = w(NKV * HD, C)
            st[m + "v_proj.weight"] = w(NKV * HD, C)
            st[m + "o_proj.weight"] = w(C, NH * HD)
        else:
            st[m + "up_proj.weight"] = w(FF, C)
            st[m + "down_proj.weight"] = w(C, FF)
    return st


CONFIG = dict(hidden_size=C, num_hidden_layers=len(PATTERN),
              num_attention_heads=NH, num_key_value_heads=NKV,
              head_dim=HD, hybrid_override_pattern=PATTERN,
              intermediate_size=FF, mamba_num_heads=N_SSM_HEAD,
              mamba_head_dim=D_INNER // N_SSM_HEAD,
              conv_kernel=D_CONV, ssm_state_size=D_STATE, n_groups=1,
              layer_norm_epsilon=1e-5, vocab_size=V,
              tie_word_embeddings=False)


def _convert(tmp_path, st):
    from omni_tpu.convert.hf_to_gguf import convert_llm

    path = tmp_path / "nh.gguf"
    convert_llm(st, CONFIG, path, arch="nemotron_h", qtype=GGMLType.F32)
    reader = GGUFReader(path)
    cfg = nemotron_h.NemotronHConfig.from_gguf(reader.kv)
    return reader, cfg


def oracle(st, cfg, params, toks):
    """numpy for attention/ffn/wiring; the mamba2 mixer reuses the
    HF-verified _ssm2_step primitive on the loaded GGUF weights."""
    T = len(toks)
    h = st["backbone.embeddings.weight"][toks].astype(np.float32)
    mamba_li = 0
    for i, kind in enumerate(PATTERN):
        p = f"backbone.layers.{i}."
        m = p + "mixer."
        hn = (h / np.sqrt((h * h).mean(-1, keepdims=True) + 1e-5)
              * st[p + "norm.weight"])
        if kind == "*":
            q = (hn @ st[m + "q_proj.weight"].T).reshape(T, NH, HD)
            k = (hn @ st[m + "k_proj.weight"].T).reshape(T, NKV, HD)
            v = (hn @ st[m + "v_proj.weight"].T).reshape(T, NKV, HD)
            attn = O.attention(q, k, v)  # NoPE, causal
            mix = attn.reshape(T, -1) @ st[m + "o_proj.weight"].T
        elif kind == "-":
            u = hn @ st[m + "up_proj.weight"].T
            mix = np.square(np.maximum(u, 0.0)) @ st[m + "down_proj.weight"].T
        else:
            lp = params["layers"][i]
            conv0 = jnp.zeros((cfg.d_conv - 1, cfg.ssm_cfg.conv_channels))
            ssm0 = jnp.zeros((cfg.d_inner, cfg.d_state))

            def step(carry, h_t, lp=lp):
                c, s = carry
                y, c, s = ssm_mod._ssm2_step(lp, cfg.ssm_cfg, h_t, c, s)
                return (c, s), y

            _, mix = jax.lax.scan(step, (conv0, ssm0),
                                  jnp.asarray(hn, jnp.float32))
            mix = np.asarray(mix)
            mamba_li += 1
        h = h + mix
    hid = (h / np.sqrt((h * h).mean(-1, keepdims=True) + 1e-5)
           * st["backbone.norm_f.weight"])
    return hid @ st["lm_head.weight"].T


def test_nemotron_h_gguf_matches_oracle(tmp_path):
    st = make_hf_state()
    reader, cfg = _convert(tmp_path, st)
    assert cfg.layer_type(0) == "ffn" and cfg.layer_type(1) == "attn"
    assert cfg.layer_type(2) == "mamba" and cfg.layer_type(3) == "ffn"
    params = nemotron_h.load_params(reader, cfg)
    toks = np.array([3, 9, 17, 40, 8, 2], np.int32)
    ref = oracle(st, cfg, params, toks)
    cache = nemotron_h.make_cache(cfg, kv_size=32)
    logits, _ = nemotron_h.forward(params, cfg, jnp.asarray(toks), cache, 0)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=6e-3)


def test_nemotron_h_prefill_equals_stepwise(tmp_path):
    st = make_hf_state(seed=1)
    reader, cfg = _convert(tmp_path, st)
    params = nemotron_h.load_params(reader, cfg)
    toks = np.array([5, 11, 30, 7, 22, 9], np.int32)

    cache = nemotron_h.make_cache(cfg, kv_size=32)
    full, _ = nemotron_h.forward(params, cfg, jnp.asarray(toks), cache, 0)

    cache = nemotron_h.make_cache(cfg, kv_size=32)
    outs = []
    for chunk in (toks[:2], toks[2:3], toks[3:]):
        lg, cache = nemotron_h.forward(params, cfg, jnp.asarray(chunk),
                                       cache, 0)
        outs.append(np.asarray(lg))
    np.testing.assert_allclose(np.concatenate(outs), np.asarray(full),
                               atol=2e-4)
