"""Gemma3n (GGUF arch "gemma3n") HF-logits parity — reference
llm_build_gemma3n_iswa (src/llama-model.cpp:10991): AltUp predict/correct
over a stacked residual, LAuReL, per-layer embeddings with gated
injection, shared-KV tail layers, activation sparsity, weightless v
norm, kq scale 1.0, final softcap 30.

Oracle: transformers Gemma3nForCausalLM on a tiny random config."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_tpu.models import gemma3n

D, NH, NKV, HD, FF, V, NL = 32, 4, 2, 8, 48, 64, 7
DA, ALT, SHARED, LRANK, SW = 8, 4, 2, 4, 8


@pytest.fixture(scope="module")
def hf_pair(tmp_path_factory):
    import torch
    from transformers import Gemma3nForCausalLM, Gemma3nTextConfig

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.core.gguf import GGUFReader

    types = ["sliding_attention" if i % 5 != 4 else "full_attention"
             for i in range(NL)]
    hcfg = Gemma3nTextConfig(
        vocab_size=V, vocab_size_per_layer_input=V, hidden_size=D,
        hidden_size_per_layer_input=DA, intermediate_size=FF,
        num_hidden_layers=NL, num_attention_heads=NH,
        num_key_value_heads=NKV, head_dim=HD, altup_num_inputs=ALT,
        altup_active_idx=0, altup_coef_clip=120.0,
        num_kv_shared_layers=SHARED, laurel_rank=LRANK,
        sliding_window=SW, activation_sparsity_pattern=[0.95] * 2
        + [0.0] * (NL - 2), layer_types=types, rope_theta=1e6,
        rope_local_base_freq=1e4, rms_norm_eps=1e-6,
        max_position_embeddings=64, final_logit_softcapping=30.0,
        tie_word_embeddings=True)
    torch.manual_seed(0)
    model = Gemma3nForCausalLM(hcfg).eval()
    # keep magnitudes sane for f32-vs-bf16 comparison
    sd = {k: (v * 0.35 if v.ndim >= 2 else v)
          for k, v in model.state_dict().items()}
    model.load_state_dict(sd)

    cfg_d = hcfg.to_dict()
    path = tmp_path_factory.mktemp("g3n") / "g3n.gguf"
    convert_llm(sd, cfg_d, str(path), arch="gemma3n")
    reader = GGUFReader(str(path))
    cfg = gemma3n.Gemma3nConfig.from_gguf(reader.kv)
    params = gemma3n.load_params(reader, cfg)
    return model, cfg, params


def test_config(hf_pair):
    _, cfg, _ = hf_pair
    assert cfg.n_altup == ALT and cfg.d_altup == DA
    assert cfg.shared_kv_layers == SHARED and cfg.kv_from_start == NL - 2
    assert cfg.n_sparsity == 2
    # shared swa layer 5 reuses the last swa kv layer (3); a shared full
    # layer would reuse layer 4 (layer_reuse_cb)
    assert cfg.kv_layer(5) == NL - SHARED - 2
    assert cfg.kv_layer(0) == 0


def test_logits_match_transformers(hf_pair):
    import torch

    model, cfg, params = hf_pair
    toks = np.array([3, 11, 7, 29, 13, 41, 2, 55], np.int64)
    with torch.no_grad():
        ref = model(torch.tensor(toks)[None]).logits[0].float().numpy()
    fwd = jax.jit(gemma3n.forward, static_argnums=(1,))
    cache = gemma3n.make_cache(cfg, kv_size=32)
    logits, cache = fwd(params, cfg, jnp.asarray(toks, jnp.int32), cache, 0)
    ours = np.asarray(logits)
    np.testing.assert_allclose(ours, ref, atol=0.02)
    assert np.array_equal(ours.argmax(-1), ref.argmax(-1))


def test_prefill_equals_stepwise(hf_pair):
    _, cfg, params = hf_pair
    toks = np.array([9, 1, 33, 60, 17], np.int64)
    fwd = jax.jit(gemma3n.forward, static_argnums=(1,))
    cache_a = gemma3n.make_cache(cfg, kv_size=32)
    la, _ = fwd(params, cfg, jnp.asarray(toks, jnp.int32), cache_a, 0)
    cache_b = gemma3n.make_cache(cfg, kv_size=32)
    rows = []
    pos = 0
    for t in toks:
        lg, cache_b = fwd(params, cfg, jnp.asarray([t], jnp.int32),
                          cache_b, 0, jnp.int32(pos))
        rows.append(np.asarray(lg[0]))
        pos += 1
    np.testing.assert_allclose(np.asarray(la), np.stack(rows), rtol=1e-3,
                               atol=2e-4)


def test_cli_autodetect():
    from omni_tpu.cli.convert_hf import _HF_ARCH_MAP

    assert _HF_ARCH_MAP.get("Gemma3nForCausalLM") == "gemma3n"
