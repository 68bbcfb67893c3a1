"""RWKV6 GGUF-loadable arch tests (reference llm_build_rwkv6,
src/llama-model.cpp:15473 + ggml_rwkv_wkv6, ggml-cpu/ops.cpp:9177).

Oracle: an independent numpy implementation written token-by-token from
the WKV6 scalar-loop semantics, running directly on the HF-layout state
dict (rwkv.blocks.*). The production path converts that state dict through
convert_llm(arch="rwkv6") — exercising the exporter's transposes, the
5-way lerp fusion, and the rescale_every pre-division — loads the GGUF,
and must match the oracle, which itself applies NO rescale (the division
and the runtime 0.5 halving must cancel exactly in f32).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_tpu.models import rwkv6

C, D, NL, V = 32, 8, 4, 64  # H=4 heads, rescale_every=2 hits twice
W_MIX, W_DECAY = 8, 16
FF = 48
RESCALE = 2
EPS = 1e-5


def _ln(x, w, b, eps=EPS):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def make_hf_state(seed=0):
    """Synthetic HF rwkv6 remote-code layout state dict."""
    rng = np.random.default_rng(seed)
    w = lambda *s, sc=0.1: (rng.standard_normal(s) * sc).astype(np.float32)
    sd = {
        "rwkv.embeddings.weight": w(V, C, sc=0.5),
        "rwkv.blocks.0.pre_ln.weight": w(C, sc=0.2) + 1.0,
        "rwkv.blocks.0.pre_ln.bias": w(C, sc=0.1),
        "rwkv.ln_out.weight": w(C, sc=0.2) + 1.0,
        "rwkv.ln_out.bias": w(C, sc=0.1),
        "head.weight": w(V, C, sc=0.3),
    }
    for i in range(NL):
        a = f"rwkv.blocks.{i}.attention."
        f = f"rwkv.blocks.{i}.feed_forward."
        sd.update({
            f"rwkv.blocks.{i}.ln1.weight": w(C, sc=0.2) + 1.0,
            f"rwkv.blocks.{i}.ln1.bias": w(C, sc=0.1),
            f"rwkv.blocks.{i}.ln2.weight": w(C, sc=0.2) + 1.0,
            f"rwkv.blocks.{i}.ln2.bias": w(C, sc=0.1),
            a + "time_maa_x": w(1, 1, C, sc=0.4),
            a + "time_maa_w": w(1, 1, C, sc=0.4),
            a + "time_maa_k": w(1, 1, C, sc=0.4),
            a + "time_maa_v": w(1, 1, C, sc=0.4),
            a + "time_maa_r": w(1, 1, C, sc=0.4),
            a + "time_maa_g": w(1, 1, C, sc=0.4),
            a + "time_maa_w1": w(C, 5 * W_MIX, sc=0.3),
            a + "time_maa_w2": w(5, W_MIX, C, sc=0.3),
            a + "time_decay": w(1, 1, C, sc=0.5) - 4.0,
            a + "time_decay_w1": w(C, W_DECAY, sc=0.3),
            a + "time_decay_w2": w(W_DECAY, C, sc=0.3),
            a + "time_faaaa": w(C // D, D, sc=0.3),
            a + "key.weight": w(C, C, sc=0.2),
            a + "value.weight": w(C, C, sc=0.2),
            a + "receptance.weight": w(C, C, sc=0.2),
            a + "gate.weight": w(C, C, sc=0.2),
            a + "output.weight": w(C, C, sc=0.2),
            a + "ln_x.weight": w(C, sc=0.2) + 1.0,
            a + "ln_x.bias": w(C, sc=0.1),
            f + "time_maa_k": w(1, 1, C, sc=0.4),
            f + "time_maa_r": w(1, 1, C, sc=0.4),
            f + "key.weight": w(FF, C, sc=0.2),
            f + "value.weight": w(C, FF, sc=0.2),
            f + "receptance.weight": w(C, C, sc=0.2),
        })
    return sd


def oracle_forward(sd, tokens):
    """Token-by-token numpy RWKV6, straight from the HF layout, NO rescale
    (exact arithmetic makes the exporter division x runtime halving a
    no-op; matching the converted model checks that cancellation)."""
    h = C // D
    x_seq = sd["rwkv.embeddings.weight"][tokens]
    x_seq = _ln(x_seq, sd["rwkv.blocks.0.pre_ln.weight"],
                sd["rwkv.blocks.0.pre_ln.bias"])
    out_rows = []
    att_prev = [np.zeros(C, np.float32) for _ in range(NL)]
    ffn_prev = [np.zeros(C, np.float32) for _ in range(NL)]
    wkv = [np.zeros((h, D, D), np.float32) for _ in range(NL)]
    for x in x_seq:
        for i in range(NL):
            a = f"rwkv.blocks.{i}.attention."
            f = f"rwkv.blocks.{i}.feed_forward."
            xa = _ln(x, sd[f"rwkv.blocks.{i}.ln1.weight"],
                     sd[f"rwkv.blocks.{i}.ln1.bias"])
            sx = att_prev[i] - xa
            att_prev[i] = xa
            xxx = xa + sx * sd[a + "time_maa_x"].reshape(-1)
            t5 = np.tanh(xxx @ sd[a + "time_maa_w1"]).reshape(5, W_MIX)
            xs = {}
            for bi, s in enumerate("wkvrg"):
                m = t5[bi] @ sd[a + "time_maa_w2"][bi]
                xs[s] = xa + sx * (sd[a + f"time_maa_{s}"].reshape(-1) + m)
            r = sd[a + "receptance.weight"] @ xs["r"]
            k = sd[a + "key.weight"] @ xs["k"]
            v = sd[a + "value.weight"] @ xs["v"]
            g = xs["g"] @ sd[a + "gate.weight"].T
            g = g / (1.0 + np.exp(-g))  # silu
            ww = (np.tanh(xs["w"] @ sd[a + "time_decay_w1"])
                  @ sd[a + "time_decay_w2"])
            wdec = np.exp(-np.exp(sd[a + "time_decay"].reshape(-1) + ww))
            first = sd[a + "time_faaaa"]
            out = np.zeros(C, np.float32)
            for hh in range(h):
                rs, ks, vs = (r[hh * D:(hh + 1) * D], k[hh * D:(hh + 1) * D],
                              v[hh * D:(hh + 1) * D])
                ws = wdec[hh * D:(hh + 1) * D]
                S = wkv[i][hh]
                for j in range(D):
                    for ii in range(D):
                        kv = ks[ii] * vs[j]
                        out[hh * D + j] += rs[ii] * (first[hh, ii] * kv
                                                     + S[ii, j])
                for ii in range(D):
                    for j in range(D):
                        S[ii, j] = S[ii, j] * ws[ii] + ks[ii] * vs[j]
            # per-head group norm eps 64e-5, then full-width affine ln_x
            og = out.reshape(h, D)
            og = (og - og.mean(-1, keepdims=True)) / np.sqrt(
                og.var(-1) + 64e-5)[:, None]
            out = og.reshape(C) * sd[a + "ln_x.weight"] + sd[a + "ln_x.bias"]
            out = out * g
            x = x + sd[a + "output.weight"] @ out

            xf = _ln(x, sd[f"rwkv.blocks.{i}.ln2.weight"],
                     sd[f"rwkv.blocks.{i}.ln2.bias"])
            sxf = ffn_prev[i] - xf
            ffn_prev[i] = xf
            xk = xf + sxf * sd[f + "time_maa_k"].reshape(-1)
            xr = xf + sxf * sd[f + "time_maa_r"].reshape(-1)
            rr = 1.0 / (1.0 + np.exp(-(sd[f + "receptance.weight"] @ xr)))
            kk = np.square(np.maximum(sd[f + "key.weight"] @ xk, 0.0))
            x = x + rr * (sd[f + "value.weight"] @ kk)
        hid = _ln(x, sd["rwkv.ln_out.weight"], sd["rwkv.ln_out.bias"])
        out_rows.append(hid @ sd["head.weight"].T)
    return np.stack(out_rows)


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.core.gguf import GGUFReader

    sd = make_hf_state()
    config = {"hidden_size": C, "num_hidden_layers": NL, "head_size": D,
              "rescale_every": RESCALE, "intermediate_size": FF,
              "vocab_size": V, "layer_norm_epsilon": EPS}
    path = tmp_path_factory.mktemp("rwkv") / "rwkv6.gguf"
    convert_llm(sd, config, str(path), arch="rwkv6")
    reader = GGUFReader(str(path))
    cfg = rwkv6.RWKV6Config.from_gguf(reader.kv)
    params = rwkv6.load_params(reader)
    return sd, cfg, params


def test_config_from_gguf(converted):
    _, cfg, _ = converted
    assert (cfg.d_model, cfg.head_size, cfg.n_heads) == (C, D, C // D)
    assert cfg.rescale_every == RESCALE
    assert cfg.d_ff == FF


def test_gguf_logits_match_scalar_oracle(converted):
    """Converted GGUF model == token-loop numpy oracle on raw HF weights
    (checks exporter layouts AND that rescale pre-division cancels the
    runtime halving)."""
    sd, cfg, params = converted
    toks = np.array([3, 11, 7, 29, 13, 5, 41, 2], np.int64)
    ref = oracle_forward(sd, toks)

    fwd = jax.jit(rwkv6.forward, static_argnums=(1,))
    cache = rwkv6.make_cache(cfg, 2)
    logits, cache = fwd(params, cfg, jnp.asarray(toks, jnp.int32), cache, 0)
    # rescale halves the stream twice -> oracle rows differ by exactly
    # the cancelled 2^2 in intermediate magnitude; final logits must agree
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-4,
                               atol=2e-4)
    assert int(cache.pos[0]) == len(toks)


def test_prefill_equals_stepwise(converted):
    sd, cfg, params = converted
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
    # batched-T matmuls vs per-token reassociate f32 sums -> ~1e-5 noise
    np.testing.assert_allclose(np.asarray(la), np.stack(rows), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(cache_a.ssm[:, 0]),
                               np.asarray(cache_b.ssm[:, 0]), rtol=1e-3,
                               atol=1e-4)


def test_seq_fork_and_reset(converted):
    """RecurrentCache semantics hold for the RWKV state layout too."""
    _, cfg, params = converted
    fwd = jax.jit(rwkv6.forward, static_argnums=(1,))
    cache = rwkv6.make_cache(cfg, 4)
    _, cache = fwd(params, cfg, jnp.asarray([5, 6, 7], jnp.int32), cache, 0)
    cache = cache.seq_cp(0, 2)
    la, _ = fwd(params, cfg, jnp.asarray([11], jnp.int32), cache, 0)
    lb, _ = fwd(params, cfg, jnp.asarray([11], jnp.int32), cache, 2)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-6)

    cache = cache.seq_rm(0)
    fresh = rwkv6.make_cache(cfg, 4)
    lc, _ = fwd(params, cfg, jnp.asarray([4], jnp.int32), cache, 0)
    ld, _ = fwd(params, cfg, jnp.asarray([4], jnp.int32), fresh, 0)
    np.testing.assert_allclose(np.asarray(lc), np.asarray(ld), rtol=1e-6)


def test_cli_autodetect_rwkv6():
    from omni_tpu.cli.convert_hf import _HF_ARCH_MAP

    assert _HF_ARCH_MAP.get("Rwkv6ForCausalLM") == "rwkv6"
