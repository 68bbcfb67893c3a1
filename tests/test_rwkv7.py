"""RWKV7 / ARWKV7 arch tests (reference llm_build_rwkv7 / llm_build_arwkv7
+ ggml_rwkv_wkv7, ggml-cpu/ops.cpp:9598).

Oracle: an independent numpy implementation written token-by-token from
the WKV7 scalar-loop semantics, running on the HF-layout state dict; the
production path converts through convert_llm(arch=...), loads the GGUF,
and must match."""

import numpy as np

import jax.numpy as jnp

from omni_tpu.models import rwkv7

C, D, NL, V = 32, 8, 3, 64  # 4 heads
RK = 8  # lora ranks
FF = 48
EPS = 1e-5


def _ln(x, w, b, eps=EPS):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def _rms(x, w, eps=1e-6):
    return x / np.sqrt((x * x).mean(-1, keepdims=True) + eps) * w


def _sig(x):
    return 1.0 / (1.0 + np.exp(-x))


def make_hf_state(arch, seed=0, has_gate=True):
    rng = np.random.default_rng(seed)

    def w(*shape, sc=0.1):
        return (rng.standard_normal(shape) * sc).astype(np.float32)

    st = {"model.embeddings.weight": w(V, C, sc=0.4),
          "head.weight": w(V, C, sc=0.2)}
    if arch == "rwkv7":
        st["model.layers.0.pre_norm.weight"] = 1 + w(C, sc=0.1)
        st["model.layers.0.pre_norm.bias"] = w(C, sc=0.05)
        st["model.ln_out.weight"] = 1 + w(C, sc=0.1)
        st["model.ln_out.bias"] = w(C, sc=0.05)
    else:
        st["model.norm.weight"] = 1 + w(C, sc=0.1)
    branches = ["r", "w", "k", "v", "a"] + (["g"] if has_gate else [])
    for i in range(NL):
        p = f"model.layers.{i}."
        a = p + "attention."
        if arch == "rwkv7":
            st[p + "ln1.weight"] = 1 + w(C, sc=0.1)
            st[p + "ln1.bias"] = w(C, sc=0.05)
            st[p + "ln2.weight"] = 1 + w(C, sc=0.1)
            st[p + "ln2.bias"] = w(C, sc=0.05)
        else:
            st[p + "input_layernorm.weight"] = 1 + w(C, sc=0.1)
            st[p + "post_attention_layernorm.weight"] = 1 + w(C, sc=0.1)
        for nm in branches:
            st[a + f"x_{nm}"] = w(1, 1, C, sc=0.3)
        st[a + "w0"] = w(1, 1, C, sc=0.3) - 2.0
        st[a + "w1"] = w(C, RK)
        st[a + "w2"] = w(RK, C)
        st[a + "a0"] = w(1, 1, C, sc=0.3)
        st[a + "a1"] = w(C, RK)
        st[a + "a2"] = w(RK, C)
        if i > 0:
            st[a + "v0"] = w(1, 1, C, sc=0.3)
            st[a + "v1"] = w(C, RK)
            st[a + "v2"] = w(RK, C)
        if has_gate:
            st[a + "g1"] = w(C, RK)
            st[a + "g2"] = w(RK, C)
        st[a + "k_k"] = w(1, 1, C, sc=0.5) + 0.5
        st[a + "k_a"] = w(1, 1, C, sc=0.5)
        st[a + "r_k"] = w(4, D, sc=0.3)
        st[a + "receptance.weight"] = w(C, C)
        st[a + "key.weight"] = w(C, C)
        st[a + "value.weight"] = w(C, C)
        st[a + "output.weight"] = w(C, C)
        st[a + "ln_x.weight"] = 1 + w(C, sc=0.1)
        st[a + "ln_x.bias"] = w(C, sc=0.05)
        f = p + "feed_forward."
        if arch == "rwkv7":
            st[f + "x_k"] = w(1, 1, C, sc=0.3)
            st[f + "key.weight"] = w(FF, C)
            st[f + "value.weight"] = w(C, FF)
        else:
            st[p + "mlp.gate_proj.weight"] = w(FF, C)
            st[p + "mlp.up_proj.weight"] = w(FF, C)
            st[p + "mlp.down_proj.weight"] = w(C, FF)
    return st


def oracle(st, arch, tokens, has_gate=True):
    """Scalar-loop numpy forward per the reference graphs."""
    h = 4
    T = len(tokens)
    x = st["model.embeddings.weight"][tokens].astype(np.float64)
    if arch == "rwkv7":
        x = _ln(x, st["model.layers.0.pre_norm.weight"],
                st["model.layers.0.pre_norm.bias"])
    v_first = None
    shifts_att = [np.zeros(C) for _ in range(NL)]
    shifts_ffn = [np.zeros(C) for _ in range(NL)]
    states = [np.zeros((h, D, D)) for _ in range(NL)]
    branches = ["r", "w", "k", "v", "a"] + (["g"] if has_gate else [])

    for li in range(NL):
        p = f"model.layers.{li}."
        a = p + "attention."
        if arch == "rwkv7":
            xa_n = _ln(x, st[p + "ln1.weight"], st[p + "ln1.bias"])
        else:
            xa_n = _rms(x, st[p + "input_layernorm.weight"])
        x_prev = np.concatenate([shifts_att[li][None], xa_n[:-1]], 0)
        sx = x_prev - xa_n
        xs = {nm: xa_n + sx * st[a + f"x_{nm}"].reshape(C)
              for nm in branches}
        r = xs["r"] @ st[a + "receptance.weight"].T
        wv = (np.tanh(xs["w"] @ st[a + "w1"]) @ st[a + "w2"]
              + st[a + "w0"].reshape(C))
        wv = np.exp(-0.606531 * _sig(wv))
        k = xs["k"] @ st[a + "key.weight"].T
        v = xs["v"] @ st[a + "value.weight"].T
        if v_first is None:
            v_first = v
        else:
            mix = _sig(xs["v"] @ st[a + "v1"] @ st[a + "v2"]
                       + st[a + "v0"].reshape(C))
            v = v + (v_first - v) * mix
        g = None
        if has_gate:
            g = _sig(xs["g"] @ st[a + "g1"]) @ st[a + "g2"]
        iclr = _sig(xs["a"] @ st[a + "a1"] @ st[a + "a2"]
                    + st[a + "a0"].reshape(C))
        kk = (k * st[a + "k_k"].reshape(C)).reshape(T, h, D)
        kk = kk / np.maximum(
            np.sqrt((kk * kk).sum(-1, keepdims=True)), 1e-12)
        ka = k * st[a + "k_a"].reshape(C)
        k2 = k + iclr * ka - ka

        out = np.zeros((T, h, D))
        S = states[li]
        rh = r.reshape(T, h, D)
        kh = k2.reshape(T, h, D)
        vh = v.reshape(T, h, D)
        wh = wv.reshape(T, h, D)
        ah = -kk
        bh = kk * iclr.reshape(T, h, D)
        for t in range(T):
            for hh in range(h):
                sa = S[hh] @ ah[t, hh]  # [D(i)]
                S[hh] = (S[hh] * wh[t, hh][None, :]
                         + np.outer(vh[t, hh], kh[t, hh])
                         + np.outer(sa, bh[t, hh]))
                out[t, hh] = S[hh] @ rh[t, hh]
        states[li] = S

        mu = out.mean(-1, keepdims=True)
        var = ((out - mu) ** 2).mean(-1, keepdims=True)
        o = (out - mu) / np.sqrt(var + 64e-5)
        o = (o.reshape(T, C) * st[a + "ln_x.weight"]
             + st[a + "ln_x.bias"])
        rk = (kh * rh * st[a + "r_k"].reshape(1, h, D)).sum(-1)
        o = o + (vh * rk[..., None]).reshape(T, C)
        if g is not None:
            o = o * g
        att = o @ st[a + "output.weight"].T
        x = x + att
        shifts_att[li] = xa_n[-1]

        if arch == "rwkv7":
            fn = _ln(x, st[p + "ln2.weight"], st[p + "ln2.bias"])
            x_prev = np.concatenate([shifts_ffn[li][None], fn[:-1]], 0)
            xk = fn + (x_prev - fn) * st[p + "feed_forward.x_k"].reshape(C)
            kf = np.square(np.maximum(
                xk @ st[p + "feed_forward.key.weight"].T, 0.0))
            x = x + kf @ st[p + "feed_forward.value.weight"].T
            shifts_ffn[li] = fn[-1]
        else:
            fn = _rms(x, st[p + "post_attention_layernorm.weight"])
            gate = fn @ st[p + "mlp.gate_proj.weight"].T
            gate = gate * _sig(gate)
            x = x + (gate * (fn @ st[p + "mlp.up_proj.weight"].T)) \
                @ st[p + "mlp.down_proj.weight"].T

    if arch == "rwkv7":
        hid = _ln(x, st["model.ln_out.weight"], st["model.ln_out.bias"])
    else:
        hid = _rms(x, st["model.norm.weight"])
    return hid @ st["head.weight"].T


def _convert(tmp_path, st, arch, has_gate=True):
    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.core import GGMLType, GGUFReader

    cfg = dict(hidden_size=C, num_hidden_layers=NL, head_size=D,
               intermediate_size=FF, vocab_size=V, wkv_has_gate=has_gate,
               layer_norm_epsilon=EPS, rms_norm_eps=1e-6)
    path = tmp_path / f"{arch}.gguf"
    convert_llm(st, cfg, path, arch=arch, qtype=GGMLType.F32)
    reader = GGUFReader(path)
    ecfg = rwkv7.RWKV7Config.from_gguf(reader.kv)
    return reader, ecfg


def test_rwkv7_gguf_matches_scalar_oracle(tmp_path):
    st = make_hf_state("rwkv7")
    toks = np.array([3, 9, 17, 40, 8, 2], np.int32)
    ref = oracle(st, "rwkv7", toks)
    reader, cfg = _convert(tmp_path, st, "rwkv7")
    assert cfg.arch == "rwkv7" and cfg.n_heads == 4
    params = rwkv7.load_params(reader)
    cache = rwkv7.make_cache(cfg, 1)
    logits, _ = rwkv7.forward(params, cfg, jnp.asarray(toks), cache, 0)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-3)


def test_arwkv7_gguf_matches_scalar_oracle(tmp_path):
    st = make_hf_state("arwkv7", seed=1)
    toks = np.array([5, 11, 30, 7], np.int32)
    ref = oracle(st, "arwkv7", toks)
    reader, cfg = _convert(tmp_path, st, "arwkv7")
    assert cfg.arch == "arwkv7" and cfg.n_shift == 1
    params = rwkv7.load_params(reader)
    cache = rwkv7.make_cache(cfg, 1)
    logits, _ = rwkv7.forward(params, cfg, jnp.asarray(toks), cache, 0)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-3)


def test_rwkv7_prefill_equals_stepwise(tmp_path):
    """Chunked prefill + stepwise decode == one-shot evaluation (the
    recurrent-state contract)."""
    st = make_hf_state("rwkv7", seed=2)
    toks = np.array([3, 9, 17, 40, 8, 2, 30, 5], np.int32)
    reader, cfg = _convert(tmp_path, st, "rwkv7")
    params = rwkv7.load_params(reader)

    cache = rwkv7.make_cache(cfg, 1)
    full, _ = rwkv7.forward(params, cfg, jnp.asarray(toks), cache, 0)

    cache = rwkv7.make_cache(cfg, 1)
    outs = []
    for chunk in (toks[:3], toks[3:4], toks[4:]):
        lg, cache = rwkv7.forward(params, cfg, jnp.asarray(chunk), cache, 0)
        outs.append(np.asarray(lg))
    np.testing.assert_allclose(np.concatenate(outs), np.asarray(full),
                               atol=2e-4)
