"""Recurrent (Mamba-style SSM) memory + model tests
(reference src/llama-memory-recurrent.cpp + llm_build_mamba coverage)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_tpu.models import ssm
from omni_tpu.runtime.recurrent import RecurrentCache

CFG = ssm.SSMConfig(n_layers=2, d_model=32, d_inner=64, d_conv=4,
                    d_state=8, dt_rank=4, n_vocab=64)


@pytest.fixture(scope="module")
def model():
    params = ssm.init_params(CFG, seed=0)
    fwd = jax.jit(ssm.forward, static_argnums=(1,))
    return params, fwd


def _fresh_cache(n_seqs=4):
    return RecurrentCache.create(CFG.n_layers, n_seqs, CFG.d_conv,
                                 CFG.d_inner, CFG.d_state)


def test_prefill_equals_stepwise_decode(model):
    """One-scan chunked prefill == token-by-token decode, exactly (the
    invariant the shared step function guarantees)."""
    params, fwd = model
    toks = jnp.asarray([3, 14, 15, 9, 2, 6], jnp.int32)

    cache_a = _fresh_cache()
    logits_a, cache_a = fwd(params, CFG, toks, cache_a, 0)

    cache_b = _fresh_cache()
    rows = []
    for t in np.asarray(toks):
        lg, cache_b = fwd(params, CFG, jnp.asarray([t], jnp.int32), cache_b, 0)
        rows.append(np.asarray(lg[0]))

    np.testing.assert_allclose(np.asarray(logits_a), np.stack(rows),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cache_a.ssm[:, 0]),
                               np.asarray(cache_b.ssm[:, 0]),
                               rtol=1e-5, atol=1e-5)
    assert int(cache_a.pos[0]) == 6


def test_sequence_isolation(model):
    params, fwd = model
    cache = _fresh_cache()
    t1 = jnp.asarray([1, 2, 3], jnp.int32)
    t2 = jnp.asarray([9, 8, 7], jnp.int32)
    _, cache = fwd(params, CFG, t1, cache, 0)
    ssm0 = np.asarray(cache.ssm[:, 0]).copy()
    _, cache = fwd(params, CFG, t2, cache, 1)
    np.testing.assert_array_equal(np.asarray(cache.ssm[:, 0]), ssm0)
    assert not np.allclose(np.asarray(cache.ssm[:, 1]), ssm0)


def test_seq_cp_forks_state(model):
    """seq_cp = cheap fork: the copy continues identically to the source."""
    params, fwd = model
    cache = _fresh_cache()
    _, cache = fwd(params, CFG, jnp.asarray([5, 6, 7], jnp.int32), cache, 0)
    cache = cache.seq_cp(0, 2)
    cont = jnp.asarray([11], jnp.int32)
    la, _ = fwd(params, CFG, cont, cache, 0)
    lb, _ = fwd(params, CFG, cont, cache, 2)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-6)


def test_seq_rm_resets(model):
    params, fwd = model
    cache = _fresh_cache()
    _, cache = fwd(params, CFG, jnp.asarray([5, 6], jnp.int32), cache, 0)
    cache = cache.seq_rm(0)
    assert int(cache.pos[0]) == -1
    np.testing.assert_array_equal(np.asarray(cache.ssm[:, 0]), 0.0)
    fresh = _fresh_cache()
    la, _ = fwd(params, CFG, jnp.asarray([4], jnp.int32), cache, 0)
    lb, _ = fwd(params, CFG, jnp.asarray([4], jnp.int32), fresh, 0)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-6)


def test_state_is_fixed_size(model):
    """The recurrent memory never grows with sequence length."""
    params, fwd = model
    cache = _fresh_cache()
    long = jnp.asarray(np.arange(200) % CFG.n_vocab, jnp.int32)
    _, cache = fwd(params, CFG, long, cache, 0)
    assert cache.ssm.shape == (CFG.n_layers, 4, CFG.d_inner, CFG.d_state)
    assert int(cache.pos[0]) == 200


def test_hybrid_cache_seq_ops(model):
    """HybridCache fans sequence ops to both memories (llama_memory_hybrid)."""
    import jax.numpy as jnp

    from omni_tpu.runtime.kv_cache import KVCache
    from omni_tpu.runtime.recurrent import HybridCache

    kv = KVCache.create(2, 16, 2, 8)
    slots = kv.find_slots(4)
    kv = kv.commit(slots, jnp.arange(4, dtype=jnp.int32),
                   jnp.zeros(4, jnp.int32))
    rec = _fresh_cache()
    params, fwd = model
    _, rec = fwd(params, CFG, jnp.asarray([1, 2], jnp.int32), rec, 0)

    h = HybridCache(kv=kv, rec=rec)
    h2 = h.seq_cp(0, 1)
    assert int(jnp.sum((h2.kv.seq_mask >> 1) & 1)) == 4
    assert int(h2.rec.pos[1]) == int(h2.rec.pos[0])

    h3 = h2.seq_rm(0)
    assert int(jnp.sum(h3.kv.seq_mask & 1)) == 0
    assert int(h3.rec.pos[0]) == -1
    # partial rm touches only the KV side
    h4 = h2.seq_rm(1, 2, 4)
    assert int(h4.rec.pos[1]) >= 0

    h5 = h2.clear()
    assert int(jnp.sum(h5.kv.seq_mask)) == 0


def test_mamba_gguf_logits_match_transformers(tmp_path):
    """GGUF-loadable Mamba (VERDICT r2 #5): HF MambaForCausalLM ->
    omni-convert-hf -> ssm.load_params -> logits parity, prefill AND
    stepwise decode through the RecurrentCache."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import MambaConfig, MambaForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.core.gguf import GGUFReader

    torch.manual_seed(0)
    hcfg = MambaConfig(
        vocab_size=64, hidden_size=32, state_size=8, num_hidden_layers=2,
        intermediate_size=64, conv_kernel=4, time_step_rank=4,
        layer_norm_epsilon=1e-5)
    model = MambaForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "mamba.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="mamba")

    reader = GGUFReader(path)
    cfg = ssm.SSMConfig.from_gguf(reader.kv)
    assert (cfg.d_inner, cfg.d_state, cfg.dt_rank) == (64, 8, 4)
    params = ssm.load_params(reader)

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()

    fwd = jax.jit(ssm.forward, static_argnums=(1,))
    cache = RecurrentCache.create(cfg.n_layers, 2, cfg.d_conv, cfg.d_inner,
                                  cfg.d_state)
    logits, cache2 = fwd(params, cfg, jnp.asarray(toks), cache, 0)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.02)

    # stepwise decode equals prefill (same scan step fn, state carried)
    cache_b = RecurrentCache.create(cfg.n_layers, 2, cfg.d_conv, cfg.d_inner,
                                    cfg.d_state)
    steps = []
    for t in toks:
        lg, cache_b = fwd(params, cfg, jnp.asarray([t]), cache_b, 0)
        steps.append(np.asarray(lg)[0])
    np.testing.assert_allclose(np.stack(steps), np.asarray(logits), atol=1e-4)


def test_mamba2_gguf_logits_match_transformers(tmp_path):
    """GGUF-loadable Mamba2 (SSD, build_mamba2_layer): HF
    Mamba2ForCausalLM -> omni-convert-hf -> ssm.load_params -> logits
    parity, prefill AND stepwise decode. New mechanics vs Mamba1: dt
    folded into ssm_in as one scalar per head, conv over x|B|C, scalar
    per-head A, outer-product state update, gated group RMS norm."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import Mamba2Config, Mamba2ForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.core.gguf import GGUFReader

    torch.manual_seed(0)
    hcfg = Mamba2Config(
        vocab_size=96, hidden_size=16, state_size=8, num_hidden_layers=2,
        expand=2, conv_kernel=4, num_heads=4, head_dim=8, n_groups=1,
        layer_norm_epsilon=1e-5, rms_norm=True, chunk_size=16)
    model = Mamba2ForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "mamba2.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="mamba2")

    reader = GGUFReader(path)
    cfg = ssm.SSMConfig.from_gguf(reader.kv)
    assert cfg.variant == "mamba2"
    assert (cfg.d_inner, cfg.d_state, cfg.n_head, cfg.head_dim,
            cfg.n_group) == (32, 8, 4, 8, 1)
    assert cfg.conv_channels == 32 + 2 * 8
    params = ssm.load_params(reader)
    assert params["layers"][0]["ssm_x"] is None  # no x_proj in mamba2
    assert params["layers"][0]["ssm_norm"] is not None

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()

    fwd = jax.jit(ssm.forward, static_argnums=(1,))
    cache = ssm.make_cache(cfg, n_seqs=2)
    logits, cache2 = fwd(params, cfg, jnp.asarray(toks), cache, 0)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.02)

    # stepwise decode equals prefill (same scan step fn, state carried)
    cache_b = ssm.make_cache(cfg, n_seqs=2)
    steps = []
    for t in toks:
        lg, cache_b = fwd(params, cfg, jnp.asarray([t]), cache_b, 0)
        steps.append(np.asarray(lg)[0])
    np.testing.assert_allclose(np.stack(steps), np.asarray(logits),
                               atol=1e-4)


def test_mamba2_grouped_bc_consistency():
    """n_group > 1: grouped B/C and the grouped gated norm — prefill ==
    stepwise decode (internal consistency; real G>1 checkpoints are the
    NVIDIA hybrid family)."""
    cfg = ssm.SSMConfig(n_layers=2, d_model=16, d_inner=32, d_conv=4,
                        d_state=8, dt_rank=4, n_vocab=64,
                        variant="mamba2", n_group=2)
    rng = np.random.default_rng(0)

    def w(*shape, scale=0.1):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)

    layers = []
    for _ in range(cfg.n_layers):
        layers.append({
            "norm": jnp.ones(16), "ssm_x": None, "ssm_dt": None,
            "ssm_in": w(2 * 32 + 2 * 2 * 8 + 4, 16),
            "ssm_conv1d": w(cfg.conv_channels, 4),
            "ssm_conv1d_b": jnp.zeros(cfg.conv_channels),
            "ssm_dt_b": jnp.zeros(4) + 0.3,
            "ssm_a": w(4, scale=0.2), "ssm_d": jnp.ones(4),
            "ssm_norm": jnp.ones(32), "ssm_out": w(16, 32),
        })
    params = {"token_embd": w(64, 16, scale=0.3),
              "output_norm": jnp.ones(16), "layers": layers}

    toks = np.array([3, 11, 7, 29, 13], np.int32)
    fwd = jax.jit(ssm.forward, static_argnums=(1,))
    logits, _ = fwd(params, cfg, jnp.asarray(toks), ssm.make_cache(cfg), 0)
    cache = ssm.make_cache(cfg)
    steps = []
    for t in toks:
        lg, cache = fwd(params, cfg, jnp.asarray([t]), cache, 0)
        steps.append(np.asarray(lg)[0])
    np.testing.assert_allclose(np.stack(steps), np.asarray(logits),
                               atol=1e-4)


def test_lfm2_gguf_logits_match_transformers(tmp_path):
    """LFM2 (llm_build_lfm2): hybrid gated-shortconv + attention layers
    over the HybridCache; conv states roll in the RecurrentCache, the
    final norm is the embedding_norm. HF-oracle parity on prefill AND
    stepwise decode."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import Lfm2Config, Lfm2ForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.core.gguf import GGUFReader
    from omni_tpu.models import lfm2

    torch.manual_seed(0)
    hcfg = Lfm2Config(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        conv_L_cache=3, norm_eps=1e-5,
        layer_types=["conv", "full_attention", "conv", "full_attention"],
        attn_implementation="eager", tie_word_embeddings=True)
    model = Lfm2ForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "lfm2.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="lfm2")

    reader = GGUFReader(path)
    cfg = lfm2.Lfm2Config.from_gguf(reader.kv)
    assert cfg.kv_heads == (0, 2, 0, 2) and cfg.l_cache == 3
    params = lfm2.load_params(reader, cfg)
    assert "conv_kernel" in params["layers"][0]
    assert "wq" in params["layers"][1]

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()

    fwd = jax.jit(lfm2.forward, static_argnums=(1,))
    cache = lfm2.make_cache(cfg, kv_size=32, n_seqs=2)
    logits, cache2 = fwd(params, cfg, jnp.asarray(toks), cache, 0)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.02)

    # stepwise decode equals prefill (conv window + KV both carried)
    cache_b = lfm2.make_cache(cfg, kv_size=32, n_seqs=2)
    steps = []
    for t in toks:
        lg, cache_b = fwd(params, cfg, jnp.asarray([t]), cache_b, 0)
        steps.append(np.asarray(lg)[0])
    np.testing.assert_allclose(np.stack(steps), np.asarray(logits),
                               atol=1e-4)


def test_granite_hybrid_gguf_logits_match_transformers(tmp_path):
    """Granite-Hybrid (llm_build_granite_hybrid): Mamba2 + NoPE-attention
    layer dispatch, granite mup scales (embedding/residual/logit/attn),
    granitemoe fused-expert MoE + GraniteMoeShared always-on expert.
    HF-oracle parity on prefill AND stepwise decode."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import (GraniteMoeHybridConfig,
                              GraniteMoeHybridForCausalLM)

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.core.gguf import GGUFReader
    from omni_tpu.models import granite_hybrid as gh

    torch.manual_seed(0)
    hcfg = GraniteMoeHybridConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        layer_types=["mamba", "attention", "mamba"],
        shared_intermediate_size=40, num_local_experts=4,
        num_experts_per_tok=2, mamba_n_heads=4, mamba_d_head=16,
        mamba_expand=2, mamba_d_state=8, mamba_n_groups=1, mamba_d_conv=4,
        embedding_multiplier=2.0, residual_multiplier=0.5,
        logits_scaling=3.0, attention_multiplier=0.2,
        attn_implementation="eager", tie_word_embeddings=True)
    model = GraniteMoeHybridForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "ghybrid.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="granitehybrid")

    reader = GGUFReader(path)
    cfg = gh.GraniteHybridConfig.from_gguf(reader.kv)
    assert cfg.kv_heads == (0, 2, 0)
    assert cfg.emb_scale == 2.0 and cfg.residual_scale == 0.5
    assert cfg.logit_scale == 3.0 and cfg.attn_scale == pytest.approx(0.2)
    assert cfg.d_inner == 64 and cfg.n_ssm_head == 4
    params = gh.load_params(reader, cfg)
    assert params["layers"][0].get("ssm_in") is not None
    assert params["layers"][1].get("wq") is not None
    assert params["layers"][0].get("gate_shexp") is not None
    assert params["layers"][0].get("gate_inp") is not None

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()

    fwd = jax.jit(gh.forward, static_argnums=(1,))
    cache = gh.make_cache(cfg, kv_size=32, n_seqs=2)
    logits, _ = fwd(params, cfg, jnp.asarray(toks), cache, 0)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.02)

    cache_b = gh.make_cache(cfg, kv_size=32, n_seqs=2)
    steps = []
    for t in toks:
        lg, cache_b = fwd(params, cfg, jnp.asarray([t]), cache_b, 0)
        steps.append(np.asarray(lg)[0])
    np.testing.assert_allclose(np.stack(steps), np.asarray(logits),
                               atol=1e-4)


def test_falcon_h1_gguf_logits_match_transformers(tmp_path):
    """Falcon-H1 (llm_build_falcon_h1, llama-model.cpp:17546): every
    layer runs NeoX-rope GQA attention AND a Mamba2 mixer in parallel on
    the same normed input; all mup multipliers (embedding/lm_head/attn
    in+out/key/ssm in+out/zxBCdt sections/mlp gate+down) are baked into
    the converted weights. HF-oracle parity on prefill AND stepwise
    decode."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import FalconH1Config, FalconH1ForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.core.gguf import GGUFReader
    from omni_tpu.models import falcon_h1 as fh

    torch.manual_seed(0)
    hcfg = FalconH1Config(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, mamba_d_ssm=32, mamba_n_heads=4, mamba_d_head=8,
        mamba_d_state=8, mamba_n_groups=1, mamba_d_conv=4,
        mamba_rms_norm=True, mamba_norm_before_gate=False,
        rope_theta=10000.0, max_position_embeddings=64,
        embedding_multiplier=2.0, lm_head_multiplier=0.5,
        attention_in_multiplier=1.5, attention_out_multiplier=0.8,
        key_multiplier=1.25, ssm_in_multiplier=0.75,
        ssm_out_multiplier=1.1, mlp_multipliers=[1.2, 0.9],
        ssm_multipliers=[1.0, 1.3, 0.7, 1.4, 0.6],
        attn_implementation="eager", tie_word_embeddings=True)
    model = FalconH1ForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "fh1.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="falcon-h1")

    reader = GGUFReader(path)
    cfg = fh.FalconH1Config.from_gguf(reader.kv)
    assert cfg.d_inner == 32 and cfg.n_ssm_head == 4 and cfg.head_dim == 8
    params = fh.load_params(reader, cfg)
    assert "output" in params  # tied + distinct head multiplier
    assert params["layers"][0]["ssm_norm"] is not None

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()

    fwd = jax.jit(fh.forward, static_argnums=(1,))
    cache = fh.make_cache(cfg, kv_size=32, n_seqs=2)
    logits, _ = fwd(params, cfg, jnp.asarray(toks), cache, 0)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.02)

    cache_b = fh.make_cache(cfg, kv_size=32, n_seqs=2)
    steps = []
    for t in toks:
        lg, cache_b = fwd(params, cfg, jnp.asarray([t]), cache_b, 0)
        steps.append(np.asarray(lg)[0])
    np.testing.assert_allclose(np.stack(steps), np.asarray(logits),
                               atol=1e-4)
