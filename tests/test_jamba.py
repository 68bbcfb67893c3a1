"""Jamba hybrid arch tests (reference llm_build_jamba,
src/llama-model.cpp:12003, over llama_memory_hybrid): HF-oracle logits
parity through the real converter, prefill==stepwise through the
HybridCache, and hybrid sequence semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_tpu.models import jamba

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def converted(tmp_path_factory):
    from transformers import JambaConfig as HFJambaConfig
    from transformers import JambaForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.core.gguf import GGUFReader

    torch.manual_seed(0)
    hcfg = HFJambaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        attn_layer_offset=1, attn_layer_period=2,
        expert_layer_offset=1, expert_layer_period=2, num_experts=2,
        num_experts_per_tok=2, mamba_d_state=8, mamba_d_conv=4,
        mamba_expand=2, mamba_dt_rank=4, use_mamba_kernels=False,
        tie_word_embeddings=False)
    model = JambaForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path_factory.mktemp("jamba") / "jamba.gguf"
    convert_llm(sd, hcfg.to_dict(), str(path), arch="jamba")

    reader = GGUFReader(str(path))
    cfg = jamba.JambaConfig.from_gguf(reader.kv)
    params = jamba.load_params(reader, cfg)
    return model, cfg, params


def test_config_layout(converted):
    _, cfg, params = converted
    # layers 1 and 3 are attention (offset 1, period 2), 0/2 mamba
    assert cfg.kv_heads == (0, 2, 0, 2)
    assert cfg.d_inner == 64 and cfg.d_state == 8 and cfg.dt_rank == 4
    assert cfg.n_experts == 2
    # layers 1/3 are MoE (expert offset 1 period 2), 0/2 dense
    assert params["layers"][1].get("gate_inp") is not None
    assert params["layers"][0].get("w_gate") is not None
    # jamba mamba layers carry dt/B/C norms
    assert params["layers"][0]["dt_norm"] is not None


def test_hf_oracle_logits_parity(converted):
    """Converted GGUF == HF transformers eager, prefill AND stepwise
    decode through the HybridCache."""
    model, cfg, params = converted
    toks = np.array([3, 11, 7, 29, 13, 5, 41, 2], np.int64)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None])).logits[0].numpy()

    fwd = jax.jit(jamba.forward, static_argnums=(1, 4))
    cache = jamba.make_cache(cfg, kv_size=32)
    logits, cache2 = fwd(params, cfg, jnp.asarray(toks, jnp.int32),
                         cache, 0)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.02)

    cache_b = jamba.make_cache(cfg, kv_size=32)
    rows = []
    for t in toks:
        lg, cache_b = fwd(params, cfg, jnp.asarray([t], jnp.int32),
                          cache_b, 0)
        rows.append(np.asarray(lg[0]))
    np.testing.assert_allclose(np.stack(rows), np.asarray(logits),
                               rtol=1e-3, atol=1e-4)


def test_hybrid_sequence_isolation(converted):
    """Two sequences interleave without cross-talk in EITHER memory."""
    _, cfg, params = converted
    fwd = jax.jit(jamba.forward, static_argnums=(1, 4))
    cache = jamba.make_cache(cfg, kv_size=64)
    a = jnp.asarray([1, 2, 3], jnp.int32)
    b = jnp.asarray([9, 8, 7, 6], jnp.int32)

    la_solo, _ = fwd(params, cfg, a, jamba.make_cache(cfg, kv_size=64), 0)
    _, cache = fwd(params, cfg, b, cache, 1)
    la_mixed, cache = fwd(params, cfg, a, cache, 0)
    np.testing.assert_allclose(np.asarray(la_solo), np.asarray(la_mixed),
                               rtol=1e-4, atol=1e-5)

    # seq_rm clears both memories for that sequence only
    cache = cache.seq_rm(0)
    assert int(cache.rec.pos[0]) == -1
    assert int(cache.rec.pos[1]) == 4
