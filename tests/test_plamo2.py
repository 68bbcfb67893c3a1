"""PLaMo-2 (GGUF arch "plamo2") parity test — reference llm_build_plamo2
(src/llama-model.cpp:17672): sandwich-normed mamba/attention hybrid with
RMS-normed B/C/dt, one scalar dt per SSM head, per-head-interleaved
[z|x] in_proj, fused-SWIGLU FFN and the Plamo2Model converter's norm
offsets / -exp(A_log) transforms.

Oracle: token-by-token numpy straight from the HF checkpoint layout
(model.layers.layers.*, trust_remote_code — fabricated here)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_tpu.models import plamo2

D, NH, NKV, HD, V = 32, 4, 2, 8, 64
SH, SS, DC = 4, 16, 4          # ssm heads, d_state, d_conv
DI = SH * HD                    # ssm inner = heads * hidden_per_head
DT = max(64, D // 16)           # dt low-rank width (hardcoded in graph)
FF = 48
NL = 4                          # mamba, attn, mamba, attn (mamba_step 2)
EPS = 1e-6


def _rms(x, w, eps=EPS):
    return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w


def make_hf_state(seed=7):
    rng = np.random.default_rng(seed)
    w = lambda *s, sc=0.15: (rng.standard_normal(s) * sc).astype(np.float32)
    sd = {"model.embed_tokens.weight": w(V, D, sc=0.5),
          "model.norm.weight": w(D, sc=0.1)}
    for i in range(NL):
        p = f"model.layers.layers.{i}."
        m = p + "mixer."
        sd[p + "pre_mixer_norm.weight"] = w(D, sc=0.05)
        sd[p + "post_mixer_norm.weight"] = w(D, sc=0.05)
        sd[p + "pre_mlp_norm.weight"] = w(D, sc=0.05)
        sd[p + "post_mlp_norm.weight"] = w(D, sc=0.05)
        sd[p + "mlp.gate_up_proj.weight"] = w(2 * FF, D)
        sd[p + "mlp.down_proj.weight"] = w(D, FF)
        if i % 2 == 0:  # mamba
            sd[m + "in_proj.weight"] = w(2 * DI, D)
            sd[m + "conv1d.weight"] = w(DI, 1, DC)
            sd[m + "bcdt_proj.weight"] = w(2 * SS + DT, DI)
            sd[m + "dt_proj.weight"] = w(SH, DT)
            sd[m + "dt_bias"] = w(SH, sc=0.3)
            sd[m + "dt_norm_weight"] = 1 + w(DT, sc=0.05)
            sd[m + "B_norm_weight"] = 1 + w(SS, sc=0.05)
            sd[m + "C_norm_weight"] = 1 + w(SS, sc=0.05)
            sd[m + "A_log"] = w(SH, sc=0.3)
            sd[m + "D"] = 1 + w(SH, sc=0.2)
            sd[m + "out_proj.weight"] = w(D, DI)
        else:  # attention
            sd[m + "qkv_proj.weight"] = w((NH + 2 * NKV) * HD, D)
            sd[m + "o_proj.weight"] = w(D, NH * HD)
            sd[m + "q_weight"] = 1 + w(HD, sc=0.1)
            sd[m + "k_weight"] = 1 + w(HD, sc=0.1)
    return sd


def _rope(x, pos, base=10000.0):
    half = HD // 2
    freq = base ** (-np.arange(half) / half)
    ang = pos * freq
    cos, sin = np.cos(ang), np.sin(ang)
    x1, x2 = x[..., :half], x[..., half:]
    return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)


def oracle_forward(sd, tokens):
    import ml_dtypes

    bf16 = lambda a: a.astype(ml_dtypes.bfloat16).astype(np.float32)
    conv = {i: np.zeros((DC - 1, DI), np.float32)
            for i in range(NL) if i % 2 == 0}
    ssm = {i: np.zeros((SH, HD, SS), np.float32)
           for i in range(NL) if i % 2 == 0}
    kv = {i: ([], []) for i in range(NL) if i % 2 == 1}
    rows = []
    for ti, tok in enumerate(tokens):
        x = sd["model.embed_tokens.weight"][tok].copy()
        for i in range(NL):
            p = f"model.layers.layers.{i}."
            m = p + "mixer."
            res = x
            hn = _rms(x, 1 + sd[p + "pre_mixer_norm.weight"])
            if i % 2 == 0:  # mamba
                zx = (sd[m + "in_proj.weight"] @ hn).reshape(SH, 2 * HD)
                z = zx[:, :HD].reshape(DI)
                xx = zx[:, HD:].reshape(DI)
                window = np.concatenate([conv[i], xx[None]], 0)
                xx = (window * sd[m + "conv1d.weight"][:, 0, :].T).sum(0)
                xx = xx / (1 + np.exp(-xx))  # silu
                conv[i] = window[1:]
                bcdt = sd[m + "bcdt_proj.weight"] @ xx
                b = _rms(bcdt[:SS], sd[m + "B_norm_weight"])
                c = _rms(bcdt[SS:2 * SS], sd[m + "C_norm_weight"])
                dtv = _rms(bcdt[2 * SS:], sd[m + "dt_norm_weight"])
                dt = sd[m + "dt_proj.weight"] @ dtv + sd[m + "dt_bias"]
                dt = np.log1p(np.exp(dt))  # softplus [SH]
                a = -np.exp(sd[m + "A_log"])
                da = np.exp(dt * a)
                xh = xx.reshape(SH, HD)
                ssm[i] = (da[:, None, None] * ssm[i]
                          + (dt[:, None] * xh)[..., None] * b[None, None, :])
                y = np.einsum("hps,s->hp", ssm[i], c) \
                    + sd[m + "D"][:, None] * xh
                y = y.reshape(DI) * (z / (1 + np.exp(-z)))
                mix = sd[m + "out_proj.weight"] @ y
            else:
                qkv = sd[m + "qkv_proj.weight"] @ hn
                q = qkv[:NH * HD].reshape(NH, HD)
                k = qkv[NH * HD:(NH + NKV) * HD].reshape(NKV, HD)
                v = qkv[(NH + NKV) * HD:].reshape(NKV, HD)
                q = _rope(_rms(q, sd[m + "q_weight"]), ti)
                k = _rope(_rms(k, sd[m + "k_weight"]), ti)
                kv[i][0].append(bf16(k))
                kv[i][1].append(bf16(v))
                ks, vs = np.stack(kv[i][0]), np.stack(kv[i][1])
                q = bf16(q)
                out = np.zeros((NH, HD), np.float32)
                for h in range(NH):
                    g = h * NKV // NH
                    sc = ks[:, g] @ q[h] / np.sqrt(HD)
                    a = np.exp(sc - sc.max())
                    a /= a.sum()
                    out[h] = a @ vs[:, g]
                mix = sd[m + "o_proj.weight"] @ out.reshape(-1)
            mix = _rms(mix, 1.0 / 5 + sd[p + "post_mixer_norm.weight"])
            x = res + mix

            res = x
            hn2 = _rms(x, 1 + sd[p + "pre_mlp_norm.weight"])
            gu = sd[p + "mlp.gate_up_proj.weight"] @ hn2
            g, u = gu[:FF], gu[FF:]
            y = sd[p + "mlp.down_proj.weight"] @ (g / (1 + np.exp(-g)) * u)
            y = _rms(y, 1.0 / 5 ** 1.5 + sd[p + "post_mlp_norm.weight"])
            x = res + y
        hid = _rms(x, 1 + sd["model.norm.weight"])
        rows.append(hid @ sd["model.embed_tokens.weight"].T)
    return np.stack(rows)


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.core.gguf import GGUFReader

    sd = make_hf_state()
    config = {"hidden_size": D, "num_hidden_layers": NL,
              "num_attention_heads": NH, "num_key_value_heads": NKV,
              "hidden_size_per_head": HD, "intermediate_size": FF,
              "mamba_num_heads": SH, "mamba_d_state": SS,
              "mamba_d_conv": DC, "mamba_step": 2,
              "vocab_size": V, "rms_norm_eps": EPS,
              "rope_theta": 10000.0, "tie_word_embeddings": True}
    path = tmp_path_factory.mktemp("plamo2") / "p2.gguf"
    convert_llm(sd, config, str(path), arch="plamo2")
    reader = GGUFReader(str(path))
    cfg = plamo2.Plamo2Config.from_gguf(reader.kv)
    params = plamo2.load_params(reader, cfg)
    return sd, cfg, params


def test_config(converted):
    _, cfg, _ = converted
    assert cfg.kv_heads == (0, NKV, 0, NKV)
    assert (cfg.d_inner, cfg.n_ssm_head, cfg.d_state) == (DI, SH, SS)
    assert cfg.dt_dim == DT


def test_logits_match_scalar_oracle(converted):
    sd, cfg, params = converted
    toks = np.array([3, 11, 7, 29, 13, 41], np.int64)
    ref = oracle_forward(sd, toks)
    fwd = jax.jit(plamo2.forward, static_argnums=(1,))
    cache = plamo2.make_cache(cfg, kv_size=32, n_seqs=2)
    logits, cache = fwd(params, cfg, jnp.asarray(toks, jnp.int32), cache, 0)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-4, atol=3e-4)


def test_prefill_equals_stepwise(converted):
    _, cfg, params = converted
    toks = np.array([9, 1, 33, 60, 17], np.int64)
    fwd = jax.jit(plamo2.forward, static_argnums=(1,))
    cache_a = plamo2.make_cache(cfg, kv_size=32, n_seqs=2)
    la, _ = fwd(params, cfg, jnp.asarray(toks, jnp.int32), cache_a, 0)
    cache_b = plamo2.make_cache(cfg, kv_size=32, n_seqs=2)
    rows = []
    for t in toks:
        lg, cache_b = fwd(params, cfg, jnp.asarray([t], jnp.int32),
                          cache_b, 0)
        rows.append(np.asarray(lg[0]))
    np.testing.assert_allclose(np.asarray(la), np.stack(rows), rtol=1e-3,
                               atol=1e-4)


def test_cli_autodetect():
    from omni_tpu.cli.convert_hf import _HF_ARCH_MAP

    assert _HF_ARCH_MAP.get("PLaMo2ForCausalLM") == "plamo2"
