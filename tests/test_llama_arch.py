"""LLaMA/Mistral-family arch support: NORM rotary + no q/k-norm layers
(reference llm_build_llama; rope type per llama_model_rope_type)."""

import numpy as np
import pytest

import jax.numpy as jnp

from omni_tpu.core import GGMLType, GGUFReader
from omni_tpu.kernels.rope import apply_rope
from omni_tpu.models import qwen3
from omni_tpu.runtime import Batch, Context, SamplerParams
from omni_tpu.testing import write_tiny_qwen3


def test_rope_norm_matches_manual():
    """NORM rotary: adjacent lanes (2i, 2i+1) rotate by pos * base^(-2i/d)."""
    rng = np.random.default_rng(0)
    d = 8
    x = rng.standard_normal((1, 1, d)).astype(np.float32)
    pos = np.array([3], np.int32)
    base = 10000.0
    out = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(pos), base,
                                neox=False))[0, 0]
    expect = np.empty(d, np.float32)
    for i in range(d // 2):
        theta = 3 * base ** (-2 * i / d)
        c, s = np.cos(theta), np.sin(theta)
        expect[2 * i] = x[0, 0, 2 * i] * c - x[0, 0, 2 * i + 1] * s
        expect[2 * i + 1] = x[0, 0, 2 * i] * s + x[0, 0, 2 * i + 1] * c
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-6)


def test_rope_norm_differs_from_neox():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 2, 16)).astype(np.float32))
    pos = jnp.asarray([1, 5], jnp.int32)
    a = np.asarray(apply_rope(x, pos, neox=True))
    b = np.asarray(apply_rope(x, pos, neox=False))
    assert not np.allclose(a, b)


@pytest.fixture(scope="module")
def llama_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("ll") / "llama.gguf"
    write_tiny_qwen3(path, arch="llama", qk_norm=False, qtype=GGMLType.Q8_0,
                     d_model=128, d_ff=192, n_heads=4, n_kv_heads=2,
                     head_dim=32, tied_head=False)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    return reader, cfg


def test_llama_config_uses_norm_rope(llama_model):
    _, cfg = llama_model
    assert cfg.rope_neox is False


def test_llama_arch_decode_and_kv_shift(llama_model):
    reader, cfg = llama_model
    ctx = Context(cfg, qwen3.load_params(reader), qwen3.forward, qwen3.embed,
                  n_ctx=64, sampler=SamplerParams(greedy=True), buckets=(8,))
    out = ctx.generate(np.array([5, 9, 3], np.int32), max_new=6)
    assert len(out) == 6

    # pure position re-base under NORM rope (no eviction): K re-rotation by
    # the delta must reproduce decoding at the re-based positions directly.
    # (Eviction-style context shift is approximate by design — surviving
    # tokens' KV was computed with the evicted context — same as the
    # reference.)
    toks = np.array([5, 9, 3, 7], np.int32)
    ctx_a = Context(cfg, qwen3.load_params(reader), qwen3.forward,
                    qwen3.embed, n_ctx=64, sampler=SamplerParams(greedy=True),
                    buckets=(8,))
    ctx_a.decode(Batch(tokens=toks, pos=np.arange(10, 14, dtype=np.int32),
                       seq_id=np.zeros(4, np.int32)))
    ctx_a.seq_add(0, 10, 14, -10)
    la, _ = ctx_a.decode(Batch(tokens=np.array([1], np.int32),
                               pos=np.array([4], np.int32),
                               seq_id=np.array([0], np.int32)))

    ctx_b = Context(cfg, qwen3.load_params(reader), qwen3.forward,
                    qwen3.embed, n_ctx=64, sampler=SamplerParams(greedy=True),
                    buckets=(8,))
    ctx_b.decode(Batch(tokens=toks, pos=np.arange(4, dtype=np.int32),
                       seq_id=np.zeros(4, np.int32)))
    lb, _ = ctx_b.decode(Batch(tokens=np.array([1], np.int32),
                               pos=np.array([4], np.int32),
                               seq_id=np.array([0], np.int32)))
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=7e-2, atol=7e-2)
    assert np.asarray(la).argmax() == np.asarray(lb).argmax()


def test_llama_logits_match_transformers(tmp_path):
    """Gold parity vs HF eager LlamaForCausalLM: conversion permutes q/k
    from the HF half-split rotary layout to the GGUF adjacent-pair (NORM)
    layout, and the engine ropes with neox=False — logits must agree."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=128, rope_theta=10000.0,
        attn_implementation="eager", tie_word_embeddings=True,
    )
    model = LlamaForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "ll.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="llama")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.rope_neox is False
    params = qwen3.load_params(reader)

    toks = np.array([3, 11, 7, 29, 13, 5, 41, 2], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()

    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    ours = np.asarray(logits)
    np.testing.assert_allclose(ours, ref, atol=0.02)
    for i in range(len(toks)):
        top2 = np.sort(ref[i])[-2:]
        if top2[1] - top2[0] > 0.02:
            assert np.argmax(ours[i]) == np.argmax(ref[i]), i


def test_phi3_logits_match_transformers(tmp_path):
    """Phi-3 (fused qkv/gate_up split during conversion, NeoX rope) gold
    parity vs the HF eager implementation."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import Phi3Config, Phi3ForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = Phi3Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, pad_token_id=0,
        attn_implementation="eager")
    model = Phi3ForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "p3.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="phi3")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.rope_neox is True
    params = qwen3.load_params(reader)

    toks = np.array([3, 11, 7, 29, 13, 5, 41, 2], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()

    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    ours = np.asarray(logits)
    np.testing.assert_allclose(ours, ref, atol=0.02)
    for i in range(len(toks)):
        top2 = np.sort(ref[i])[-2:]
        if top2[1] - top2[0] > 0.02:
            assert np.argmax(ours[i]) == np.argmax(ref[i]), i


def test_granite_logits_match_transformers(tmp_path):
    """Granite (the builder MiniCPM also runs on): embedding/residual/
    logit multipliers + attention scale, NORM-rope permute — gold parity
    vs HF eager GraniteForCausalLM."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import GraniteConfig, GraniteForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = GraniteConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        embedding_multiplier=12.0, residual_multiplier=0.22,
        logits_scaling=8.0, attention_multiplier=0.3,
        attn_implementation="eager", tie_word_embeddings=True)
    model = GraniteForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "gr.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="granite")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.rope_neox is False
    assert cfg.emb_scale == 12.0 and cfg.logit_scale == 8.0
    assert cfg.attn_scale == pytest.approx(0.3)
    params = qwen3.load_params(reader)

    toks = np.array([3, 11, 7, 29, 13, 5, 41, 2], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()

    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    ours = np.asarray(logits)
    np.testing.assert_allclose(ours, ref, atol=0.02)
    for i in range(len(toks)):
        top2 = np.sort(ref[i])[-2:]
        if top2[1] - top2[0] > 0.02:
            assert np.argmax(ours[i]) == np.argmax(ref[i]), i


def test_olmo2_logits_match_transformers(tmp_path):
    """OLMo-2 post-norm topology (no pre-norms, sublayer-output norms) with
    full-width q/k RMS norms — gold parity vs HF eager, unfused and fused
    layouts."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import Olmo2Config, Olmo2ForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = Olmo2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        attn_implementation="eager", tie_word_embeddings=True)
    model = Olmo2ForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "ol2.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="olmo2")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.pre_norm is False and cfg.sandwich_norms
    params = qwen3.load_params(reader)
    assert params["layers"][0]["attn_norm"] is None
    assert params["layers"][0]["q_norm"].shape[-1] == 32  # full width

    toks = np.array([3, 11, 7, 29, 13, 5, 41, 2], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()

    for fuse in (False, True):
        p = qwen3.load_params(reader, fuse=fuse)
        ctx = Context(cfg, p, qwen3.forward, qwen3.embed, n_ctx=32)
        logits, _ = ctx.decode(Batch(tokens=toks))
        ours = np.asarray(logits)
        np.testing.assert_allclose(ours, ref, atol=0.02)
        for i in range(len(toks)):
            top2 = np.sort(ref[i])[-2:]
            if top2[1] - top2[0] > 0.02:
                assert np.argmax(ours[i]) == np.argmax(ref[i]), (fuse, i)


def test_cohere_command_r_logits_match_transformers(tmp_path):
    """Cohere/Command-R: parallel attn+ffn residual off one shared
    bias-free LayerNorm, NORM rope (no permute — HF Cohere is natively
    interleaved), multiplied logit scale — gold parity vs HF eager."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import CohereConfig, CohereForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = CohereConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0, pad_token_id=0,
        logit_scale=0.0625, attn_implementation="eager",
        tie_word_embeddings=True)
    model = CohereForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "cr.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="command-r")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.parallel_residual and cfg.norm_type == "layer"
    assert cfg.rope_neox is False
    assert cfg.logit_scale == pytest.approx(16.0)  # 1/0.0625 (divisor form)
    params = qwen3.load_params(reader)
    assert params["layers"][0]["ffn_norm"] is None

    toks = np.array([3, 11, 7, 29, 13, 5, 41, 2], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()

    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    ours = np.asarray(logits)
    np.testing.assert_allclose(ours, ref, atol=0.02)
    for i in range(len(toks)):
        top2 = np.sort(ref[i])[-2:]
        if top2[1] - top2[0] > 0.02:
            assert np.argmax(ours[i]) == np.argmax(ref[i]), i


def test_gpt2_logits_match_transformers(tmp_path):
    """GPT-2 family (llm_build_gpt2): learned absolute position
    embeddings, biased LayerNorms, pre-fused attn_qkv with biases,
    un-gated GELU FFN with biases — parity vs HF eager, prefill and
    stepwise decode (positions must come from the KV position vector)."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import GPT2Config, GPT2LMHeadModel

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = GPT2Config(
        vocab_size=96, n_embd=32, n_layer=3, n_head=4, n_positions=64,
        n_inner=None, layer_norm_epsilon=1e-5, attn_implementation="eager")
    model = GPT2LMHeadModel(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "gpt2.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="gpt2")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert not cfg.use_rope and cfg.norm_bias and cfg.act == "gelu"
    assert cfg.n_kv_heads == cfg.n_heads
    params = qwen3.load_params(reader)
    assert params["position_embd"] is not None
    assert params["layers"][0]["wqkv"] is not None
    assert params["layers"][0]["w_gate"] is None

    toks = np.array([3, 11, 7, 29, 13, 5, 41, 2], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()

    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)

    # stepwise decode: absolute positions advance through the cache
    ctx2 = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    rows = []
    for t in toks:
        lg, _ = ctx2.decode(Batch(tokens=np.asarray([t], np.int32)))
        rows.append(np.asarray(lg)[0])
    np.testing.assert_allclose(np.stack(rows), ref, atol=0.03)


def test_starcoder2_logits_match_transformers(tmp_path):
    """StarCoder2 (llm_build_starcoder2): biased LayerNorms + biased
    projections + un-gated GELU FFN, WITH rope (unlike gpt2) — parity vs
    HF eager."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import Starcoder2Config, Starcoder2ForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = Starcoder2Config(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0, use_bias=True,
        attn_implementation="eager", tie_word_embeddings=True)
    model = Starcoder2ForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "sc2.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="starcoder2")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.use_rope and cfg.norm_bias and cfg.act == "gelu"
    params = qwen3.load_params(reader)
    assert params["layers"][0]["w_gate"] is None
    assert params["layers"][0]["b_up"] is not None
    assert params["layers"][0]["attn_norm_b"] is not None

    toks = np.array([3, 11, 7, 29, 13, 5, 41, 2], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()

    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)
    for i in range(len(toks)):
        top2 = np.sort(ref[i])[-2:]
        if top2[1] - top2[0] > 0.05:
            assert int(np.asarray(logits)[i].argmax()) == int(ref[i].argmax())


def test_phi2_logits_match_transformers(tmp_path):
    """Phi-2 (llm_build_phi2): PARTIAL rotary (rot_pct of each head),
    parallel residual off one shared biased LayerNorm, biased LM head —
    parity vs HF eager, prefill + stepwise (partial-rope positions must
    survive the cache)."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import PhiConfig, PhiForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = PhiConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=4,
        partial_rotary_factor=0.5, max_position_embeddings=64,
        rope_theta=10000.0, attn_implementation="eager",
        tie_word_embeddings=False)
    model = PhiForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "phi2.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="phi2")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.rope_dim == 4 and cfg.head_dim == 8  # partial rotary
    assert cfg.parallel_residual and cfg.norm_bias
    params = qwen3.load_params(reader)
    assert params["output_b"] is not None

    toks = np.array([3, 11, 7, 29, 13, 5, 41, 2], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()

    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)

    ctx2 = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    rows = []
    for t in toks:
        lg, _ = ctx2.decode(Batch(tokens=np.asarray([t], np.int32)))
        rows.append(np.asarray(lg)[0])
    np.testing.assert_allclose(np.stack(rows), ref, atol=0.03)


def test_gptneox_logits_match_transformers(tmp_path):
    """GPT-NeoX (llm_build_gptneox): per-head interleaved fused QKV
    de-interleave, partial rotary, use_parallel_residual BOTH ways (the
    parallel form norms the LAYER INPUT with its own ffn_norm)."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    for par in (True, False):
        torch.manual_seed(0)
        hcfg = GPTNeoXConfig(
            vocab_size=96, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, rotary_pct=0.5,
            max_position_embeddings=64, use_parallel_residual=par,
            attn_implementation="eager", tie_word_embeddings=False)
        model = GPTNeoXForCausalLM(hcfg).eval()
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        path = tmp_path / f"neox{par}.gguf"
        convert_llm(sd, hcfg.to_dict(), path, arch="gptneox")

        reader = GGUFReader(path)
        cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
        assert cfg.parallel_residual == par
        assert cfg.rope_dim == 4 and cfg.norm_bias
        params = qwen3.load_params(reader)
        assert params["layers"][0]["wqkv"] is not None

        toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
        with torch.no_grad():
            ref = model(torch.tensor(toks[None].astype(np.int64))
                        ).logits[0].numpy()
        ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
        logits, _ = ctx.decode(Batch(tokens=toks))
        np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_stablelm_logits_match_transformers(tmp_path):
    """StableLM-2 (llm_build_stablelm): biased LayerNorms around a gated
    SiLU FFN, partial rotary, qkv biases."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import StableLmConfig, StableLmForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = StableLmConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.5, max_position_embeddings=64,
        use_qkv_bias=True, attn_implementation="eager",
        tie_word_embeddings=False)
    model = StableLmForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "stablelm.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="stablelm")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.rope_dim == 4 and cfg.norm_bias and cfg.act == "silu"
    params = qwen3.load_params(reader)
    assert params["layers"][0]["w_gate"] is not None  # gated, unlike gpt2
    assert params["layers"][0]["bq"] is not None

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_falcon_logits_match_transformers(tmp_path):
    """Falcon (llm_build_falcon): grouped fused-QKV rearrange, parallel
    residual — 40b-style DUAL norms (ln_attn feeds attention, ln_mlp
    feeds the FFN off the layer input) and 7b-style shared single norm."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import FalconConfig, FalconForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    for new_arch in (True, False):
        torch.manual_seed(0)
        hcfg = FalconConfig(
            vocab_size=96, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, num_kv_heads=2,
            new_decoder_architecture=new_arch, multi_query=not new_arch,
            parallel_attn=True, bias=False, alibi=False,
            attn_implementation="eager", tie_word_embeddings=True)
        model = FalconForCausalLM(hcfg).eval()
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        path = tmp_path / f"falcon{new_arch}.gguf"
        convert_llm(sd, hcfg.to_dict(), path, arch="falcon")

        reader = GGUFReader(path)
        cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
        assert cfg.parallel_residual and cfg.norm_bias
        assert cfg.n_kv_heads == (2 if new_arch else 1)
        params = qwen3.load_params(reader)
        assert (params["layers"][0].get("ffn_norm") is not None) == new_arch

        toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
        with torch.no_grad():
            ref = model(torch.tensor(toks[None].astype(np.int64))
                        ).logits[0].numpy()
        ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
        logits, _ = ctx.decode(Batch(tokens=toks))
        np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_smollm3_logits_match_transformers(tmp_path):
    """SmolLM3 (llm_build_smollm3): NoPE — every 4th layer skips rope
    entirely (n_no_rope_layer_step, llama-model.cpp:1988); NORM rope
    with q/k permute on the rest."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import SmolLM3Config, SmolLM3ForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = SmolLM3Config(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        no_rope_layer_interval=4, max_position_embeddings=64,
        pad_token_id=0, attn_implementation="eager",
        tie_word_embeddings=True)
    model = SmolLM3ForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "smollm3.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="smollm3")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.no_rope_step == 4 and not cfg.rope_neox
    params = qwen3.load_params(reader)

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_qwen2moe_logits_match_transformers(tmp_path):
    """Qwen2-MoE (llm_build_qwen2moe): softmax top-k WITHOUT prob
    normalisation + a sigmoid-gated shared expert added to the routed
    mix (ffn_gate_inp_shexp)."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = Qwen2MoeConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=48, shared_expert_intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        norm_topk_prob=False, max_position_embeddings=64,
        attn_implementation="eager", tie_word_embeddings=True)
    model = Qwen2MoeForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "q2moe.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="qwen2moe")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert not cfg.moe_norm_w and cfg.n_experts == 4
    params = qwen3.load_params(reader)
    assert params["layers"][0]["gate_inp_shexp"] is not None
    assert params["layers"][0]["bq"] is not None  # qwen2 attn biases

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_glm4_logits_match_transformers(tmp_path):
    """GLM-4 (llm_build_glm4): sandwich norms around both sublayers,
    disk-fused gate_up in ffn_up (LLM_FFN_SWIGLU), interleaved-pair
    (NORM) HALF-width partial rotary."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import Glm4Config, Glm4ForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = Glm4Config(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.5, head_dim=8, max_position_embeddings=64,
        attention_bias=True, pad_token_id=0, attn_implementation="eager",
        tie_word_embeddings=True)
    model = Glm4ForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "glm4.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="glm4")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.rope_dim == 4 and not cfg.rope_neox and cfg.sandwich_norms
    params = qwen3.load_params(reader)
    assert "w_gateup" in params["layers"][0]  # disk-fused gate|up

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_nemotron_logits_match_transformers(tmp_path):
    """Nemotron (llm_build_nemotron): biased LayerNorms, un-gated
    relu^2 FFN (LLM_FFN_RELU_SQR), half-width NEOX partial rotary."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import NemotronConfig, NemotronForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = NemotronConfig(
        vocab_size=96, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=0.5, max_position_embeddings=64,
        norm_eps=1e-5, pad_token_id=0, attn_implementation="eager",
        tie_word_embeddings=True)
    model = NemotronForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "nemotron.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="nemotron")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.act == "relu2" and cfg.norm_bias and cfg.rope_dim == 4
    params = qwen3.load_params(reader)
    assert params["layers"][0]["w_gate"] is None

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_olmoe_logits_match_transformers(tmp_path):
    """OLMoE (llm_build_olmoe): full-width q/k RMS norms on a standard
    pre-norm topology + MoE WITHOUT top-k prob normalisation."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import OlmoeConfig, OlmoeForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = OlmoeConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        max_position_embeddings=64, pad_token_id=0,
        attn_implementation="eager", tie_word_embeddings=True)
    model = OlmoeForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "olmoe.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="olmoe")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert not cfg.moe_norm_w and cfg.n_experts == 4
    params = qwen3.load_params(reader)
    assert params["layers"][0]["q_norm"].shape[-1] == 32  # full width

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_arcee_and_ernie_logits_match_transformers(tmp_path):
    """Arcee (relu^2 un-gated FFN on RMS norms) and Ernie-4.5 (llama
    clone) — both NORM-rope permuted."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import (ArceeConfig, ArceeForCausalLM,
                              Ernie4_5Config, Ernie4_5ForCausalLM)

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    cases = [
        ("arcee", ArceeConfig, ArceeForCausalLM,
         dict(vocab_size=96, hidden_size=32, intermediate_size=64,
              num_hidden_layers=2, num_attention_heads=4,
              num_key_value_heads=2, max_position_embeddings=64,
              pad_token_id=0, attn_implementation="eager",
              tie_word_embeddings=True)),
        ("ernie4_5", Ernie4_5Config, Ernie4_5ForCausalLM,
         dict(vocab_size=96, hidden_size=32, intermediate_size=64,
              num_hidden_layers=2, num_attention_heads=4,
              num_key_value_heads=2, max_position_embeddings=64,
              pad_token_id=0, attn_implementation="eager",
              tie_word_embeddings=True)),
    ]
    for arch, Cfg, Model, kw in cases:
        torch.manual_seed(0)
        model = Model(Cfg(**kw)).eval()
        sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
        path = tmp_path / f"{arch}.gguf"
        convert_llm(sd, model.config.to_dict(), path, arch=arch)

        reader = GGUFReader(path)
        cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
        assert not cfg.rope_neox
        if arch == "arcee":
            assert cfg.act == "relu2"
        params = qwen3.load_params(reader)

        toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
        with torch.no_grad():
            ref = model(torch.tensor(toks[None].astype(np.int64))
                        ).logits[0].numpy()
        ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
        logits, _ = ctx.decode(Batch(tokens=toks))
        np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03,
                                   err_msg=arch)


def test_granitemoe_logits_match_transformers(tmp_path):
    """GraniteMoE (llm_build_granite MoE form): granite scale set +
    per-expert fused input_linear [E, 2F, d] split at conversion."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import GraniteMoeConfig, GraniteMoeForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = GraniteMoeConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        embedding_multiplier=2.0, residual_multiplier=0.5,
        logits_scaling=2.0, attention_multiplier=0.3,
        max_position_embeddings=64, pad_token_id=0,
        attn_implementation="eager", tie_word_embeddings=True)
    model = GraniteMoeForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "gmoe.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="granitemoe")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.n_experts == 4 and cfg.emb_scale == 2.0
    assert cfg.attn_scale == pytest.approx(0.3)
    params = qwen3.load_params(reader)

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_olmo_logits_match_transformers(tmp_path):
    """OLMo (llm_build_olmo): NON-PARAMETRIC LayerNorms everywhere (no
    norm tensors on disk at all, llama-model.cpp:4206), optional q/k/v
    clamping (f_clamp_kqv), NORM rope (permuted on conversion)."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import OlmoConfig, OlmoForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = OlmoConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        clip_qkv=0.15, max_position_embeddings=64,
        attn_implementation="eager", tie_word_embeddings=True)
    model = OlmoForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "olmo.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="olmo")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.norm_type == "layer" and not cfg.rope_neox
    assert cfg.clamp_kqv == pytest.approx(0.15)
    params = qwen3.load_params(reader)
    assert params["output_norm"] is None  # weightless final norm
    assert params["layers"][0]["attn_norm"] is None

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_gemma1_logits_match_transformers(tmp_path):
    """Gemma v1 (llm_build_gemma): sqrt(d) embedding scale, GELU-tanh
    gated FFN, +1 RMS-norm convention on disk, NEOX rope — but llama
    norm topology (post_attention_layernorm IS the ffn pre-norm; no
    sandwich norms, no softcaps, no SWA)."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import GemmaConfig, GemmaForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = GemmaConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=1,
        head_dim=8, max_position_embeddings=64,
        attn_implementation="eager", tie_word_embeddings=True)
    model = GemmaForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "gemma1.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="gemma")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.emb_scale == pytest.approx(32 ** 0.5)
    assert cfg.act == "gelu" and not cfg.sandwich_norms and cfg.rope_neox
    assert cfg.swa_every == 0
    params = qwen3.load_params(reader)
    assert params["layers"][0]["ffn_norm"] is not None  # llama topology

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_cohere2_logits_match_transformers(tmp_path):
    """Cohere2 (llm_build_cohere2_iswa): command-r parallel residual +
    bias-free LayerNorm + multiplied logit_scale, PLUS 3-SWA:1-full
    interleaving (set_swa_pattern(4)) where ONLY the SWA layers rope —
    the full layers are NoPE."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import Cohere2Config, Cohere2ForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = Cohere2Config(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        sliding_window=4, logit_scale=0.25, max_position_embeddings=64,
        attn_implementation="eager", tie_word_embeddings=True)
    # default layer_types = [swa, swa, swa, full] — engine pattern match
    assert hcfg.layer_types == ["sliding_attention"] * 3 + ["full_attention"]
    model = Cohere2ForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "cohere2.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="cohere2")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.parallel_residual and cfg.norm_type == "layer"
    assert cfg.swa_every == 4 and cfg.swa_window == 4
    assert cfg.no_rope_step == 4 and not cfg.rope_neox
    assert cfg.logit_scale == pytest.approx(4.0)  # inverted (divides)
    assert [cfg.is_swa_layer(i) for i in range(4)] == [True, True, True,
                                                       False]

    # long enough that the window (4) actually masks keys on SWA layers
    toks = np.array([3, 11, 7, 29, 13, 5, 17, 23, 9, 2], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    params = qwen3.load_params(reader)
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_bloom_logits_match_transformers(tmp_path):
    """BLOOM (llm_build_bloom): ALiBi positional score biases instead of
    rope (f_max_alibi_bias=8, slope formula of ggml_soft_max_ext),
    embedding LayerNorm (token_embd_norm), per-head-interleaved fused QKV
    reordered on conversion, biased GELU FFN."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import BloomConfig, BloomForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = BloomConfig(vocab_size=96, hidden_size=32, n_layer=2, n_head=4,
                       attn_implementation="eager")
    model = BloomForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "bloom.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="bloom")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.max_alibi_bias == 8.0 and not cfg.use_rope
    assert cfg.norm_type == "layer" and cfg.act == "gelu"
    params = qwen3.load_params(reader)
    assert params["tok_norm"] is not None
    assert "wqkv" in params["layers"][0]  # fused on disk

    toks = np.array([3, 11, 7, 29, 13, 5, 17, 23], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)

    # single-token decode continues the same ALiBi geometry (pool path)
    l2, _ = ctx.decode(Batch(tokens=np.array([9], np.int32),
                             pos=np.array([8], np.int32)))
    with torch.no_grad():
        ref2 = model(torch.tensor(np.r_[toks, 9][None].astype(np.int64))
                     ).logits[0, -1].numpy()
    np.testing.assert_allclose(np.asarray(l2)[0], ref2, atol=0.03)


def test_mpt_logits_match_transformers(tmp_path):
    """MPT (llm_build_mpt): ALiBi with alibi_bias_max from attn_config,
    bias-free LayerNorms (no_bias), straight-fused Wqkv, un-gated GELU,
    optional clip_qkv clamping."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import MptConfig, MptForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = MptConfig(vocab_size=96, d_model=32, n_layers=2, n_heads=4,
                     attn_implementation="eager")
    model = MptForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "mpt.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="mpt")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.max_alibi_bias == 8.0 and not cfg.use_rope
    assert cfg.norm_type == "layer" and cfg.d_ff == 128
    params = qwen3.load_params(reader)
    assert params["layers"][0].get("attn_norm_b") is None  # no_bias
    assert params["layers"][0].get("w_gate") is None  # un-gated GELU

    toks = np.array([3, 11, 7, 29, 13, 5, 17, 23], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_seed_oss_logits_match_transformers(tmp_path):
    """Seed-OSS (llm_build_seed_oss): llama topology with NEOX rope and
    attention projection biases."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import SeedOssConfig, SeedOssForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = SeedOssConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=64,
        attn_implementation="eager", tie_word_embeddings=True)
    model = SeedOssForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "seedoss.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="seed_oss")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.rope_neox
    params = qwen3.load_params(reader)
    assert params["layers"][0]["bq"] is not None  # attention biases

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_exaone4_logits_match_transformers(tmp_path):
    """EXAONE-4 (llm_build_exaone4): OLMo-2-style post-norm topology
    (post_attention/post_feedforward norms on sublayer OUTPUTS), per-head
    q/k RMS norms, and 3-SWA:1-full interleaving where the full layers
    are NoPE (use_rope = is_swa)."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import Exaone4Config, Exaone4ForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = Exaone4Config(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        sliding_window=4, sliding_window_pattern=4,
        max_position_embeddings=64, attn_implementation="eager",
        tie_word_embeddings=True)
    assert hcfg.layer_types == ["sliding_attention"] * 3 + ["full_attention"]
    model = Exaone4ForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "exaone4.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="exaone4")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert not cfg.pre_norm and cfg.sandwich_norms
    assert cfg.swa_every == 4 and cfg.swa_window == 4 and cfg.no_rope_step == 4
    params = qwen3.load_params(reader)
    assert params["layers"][0]["q_norm"] is not None

    toks = np.array([3, 11, 7, 29, 13, 5, 17, 23, 9, 2], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_apertus_logits_match_transformers(tmp_path):
    """Apertus (llm_build_apertus): un-gated FFN with the xIELU
    activation — per-layer learnable (alpha_n, alpha_p, beta, eps)
    scalars shipped as unprefixed xielu.* KV lists (ggml_xielu applies
    softplus to the alphas) — plus per-head q/k norms."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import ApertusConfig, ApertusForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = ApertusConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_scaling=None,
        attn_implementation="eager", tie_word_embeddings=True)
    model = ApertusForCausalLM(hcfg).eval()
    # the xIELU scalars are bf16 buffers
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    path = tmp_path / "apertus.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="apertus")

    reader = GGUFReader(path)
    assert len(reader.kv["xielu.alpha_n"]) == 2
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.act == "xielu" and len(cfg.xielu) == 2
    params = qwen3.load_params(reader)
    assert params["layers"][0]["w_gate"] is None  # un-gated

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_bitnet_logits_match_transformers(tmp_path):
    """BitNet (llm_build_bitnet): RMS sub-norms INSIDE both sublayers —
    on the attention output before wo, and on the gated-FFN activation
    before down. (The i2_s per-projection scales are optional tensors on
    the same paths; the HF reference checkpoint is full-precision.)"""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import BitNetConfig, BitNetForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = BitNetConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        hidden_act="relu2", max_position_embeddings=64,
        attn_implementation="eager", tie_word_embeddings=True)
    model = BitNetForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "bitnet.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="bitnet")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.act == "relu2"
    params = qwen3.load_params(reader)
    assert params["layers"][0]["attn_sub_norm"] is not None
    assert params["layers"][0]["ffn_sub_norm"] is not None

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_starcoder_logits_match_transformers(tmp_path):
    """StarCoder / GPTBigCode (llm_build_starcoder, llama-model.cpp:7670):
    GPT-2 topology with multi-query attention (fused c_attn Linear split
    as [q | 1-head k | 1-head v]), learned positions, biased LayerNorms,
    un-gated GELU. Gold parity vs HF eager."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = GPTBigCodeConfig(
        vocab_size=96, n_embd=32, n_inner=64, n_layer=2, n_head=4,
        n_positions=64, multi_query=True, attn_implementation="eager",
        tie_word_embeddings=True)
    model = GPTBigCodeForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "sc.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="starcoder")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.n_kv_heads == 1 and cfg.norm_bias and not cfg.use_rope
    assert cfg.act == "gelu"
    params = qwen3.load_params(reader)
    assert params["position_embd"] is not None
    assert params["layers"][0].get("wqkv") is not None

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()

    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    ours = np.asarray(logits)
    np.testing.assert_allclose(ours, ref, atol=0.02)


def _llama_logits(model, toks):
    import torch
    with torch.no_grad():
        return model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()


def _assert_ctx_matches(cfg, params, toks, ref, atol=0.02):
    from omni_tpu.runtime import Batch, Context
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=atol)


def test_baichuan_xverse_internlm2_logits_match_transformers(tmp_path):
    """The llama-semantics clone family (NORM rope):
    - Baichuan fuses q/k/v into W_pack [3d, d] (llm_build_baichuan;
      reference BaichuanModel de-fuses with the reverse permute)
    - XVERSE is tensor-for-tensor llama naming (llm_build_xverse)
    - InternLM2 fuses a GROUPED wqkv [(q_per_kv+2)*kv*hd, d] and uses
      its own tensor names (llm_build_internlm2, InternLM2Model)
    Oracle: one HF LlamaForCausalLM whose weights are re-packed into
    each arch's HF naming — the converted GGUF must reproduce the
    llama logits exactly."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import LlamaConfig, LlamaForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm

    torch.manual_seed(0)
    hcfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        head_dim=8, max_position_embeddings=64, rope_theta=10000.0,
        attention_bias=False, attn_implementation="eager",
        tie_word_embeddings=False)
    model = LlamaForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    ref = _llama_logits(model, toks)

    # ---- baichuan: fuse q/k/v -> W_pack --------------------------------
    bsd = {}
    for k, v in sd.items():
        if k.endswith("self_attn.q_proj.weight"):
            base = k[: -len("q_proj.weight")]
            bsd[base + "W_pack.weight"] = np.concatenate(
                [sd[base + "q_proj.weight"], sd[base + "k_proj.weight"],
                 sd[base + "v_proj.weight"]])
        elif ".k_proj." in k or ".v_proj." in k:
            continue
        else:
            bsd[k] = v
    path = tmp_path / "bc.gguf"
    convert_llm(bsd, hcfg.to_dict(), path, arch="baichuan")
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.rope_neox is False
    _assert_ctx_matches(cfg, qwen3.load_params(reader), toks, ref)

    # ---- xverse: identical naming --------------------------------------
    path = tmp_path / "xv.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="xverse")
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.rope_neox is False
    _assert_ctx_matches(cfg, qwen3.load_params(reader), toks, ref)

    # ---- internlm2: grouped wqkv + own names (GQA this time) -----------
    hcfg2 = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=64, rope_theta=10000.0,
        attn_implementation="eager", tie_word_embeddings=False)
    torch.manual_seed(1)
    model2 = LlamaForCausalLM(hcfg2).eval()
    sd2 = {k: v.detach().numpy() for k, v in model2.state_dict().items()}
    ref2 = _llama_logits(model2, toks)
    n_h, n_k, hd = 4, 2, 8
    qpk = n_h // n_k
    isd = {"model.tok_embeddings.weight": sd2["model.embed_tokens.weight"],
           "model.norm.weight": sd2["model.norm.weight"],
           "output.weight": sd2["lm_head.weight"]}
    for i in range(2):
        p = f"model.layers.{i}."
        q = sd2[p + "self_attn.q_proj.weight"].reshape(n_k, qpk, hd, -1)
        k = sd2[p + "self_attn.k_proj.weight"].reshape(n_k, 1, hd, -1)
        v = sd2[p + "self_attn.v_proj.weight"].reshape(n_k, 1, hd, -1)
        isd[p + "attention.wqkv.weight"] = np.concatenate(
            [q, k, v], axis=1).reshape(-1, 32)
        isd[p + "attention.wo.weight"] = sd2[p + "self_attn.o_proj.weight"]
        isd[p + "attention_norm.weight"] = sd2[p + "input_layernorm.weight"]
        isd[p + "ffn_norm.weight"] = \
            sd2[p + "post_attention_layernorm.weight"]
        isd[p + "feed_forward.w1.weight"] = sd2[p + "mlp.gate_proj.weight"]
        isd[p + "feed_forward.w3.weight"] = sd2[p + "mlp.up_proj.weight"]
        isd[p + "feed_forward.w2.weight"] = sd2[p + "mlp.down_proj.weight"]
    path = tmp_path / "il2.gguf"
    convert_llm(isd, hcfg2.to_dict(), path, arch="internlm2")
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.rope_neox is False and cfg.n_kv_heads == 2
    _assert_ctx_matches(cfg, qwen3.load_params(reader), toks, ref2)


def test_exaone_qwen1_orion_logits_match_transformers(tmp_path):
    """NEOX-rope clone family:
    - EXAONE-3 (llm_build_exaone): transformer.h naming, c_fc_0/c_fc_1
      gate/up split, NEOX rope (no permute). Oracle: LlamaForCausalLM
      re-named (HF llama's half-split rotary IS the NEOX layout).
    - Qwen v1 (llm_build_qwen): fused biased c_attn, mlp.w2=gate/w1=up.
      Oracle: LlamaForCausalLM with attention biases, re-fused.
    - Orion (llm_build_orion): biased TRUE LayerNorms + SwiGLU. Oracle:
      StableLmForCausalLM with partial_rotary_factor=1.0 (same math)."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import (LlamaConfig, LlamaForCausalLM,
                              StableLmConfig, StableLmForCausalLM)

    from omni_tpu.convert.hf_to_gguf import convert_llm

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)

    # ---- exaone ---------------------------------------------------------
    torch.manual_seed(0)
    hcfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=64, rope_theta=10000.0,
        attn_implementation="eager", tie_word_embeddings=False)
    model = LlamaForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    ref = _llama_logits(model, toks)
    esd = {"transformer.wte.weight": sd["model.embed_tokens.weight"],
           "transformer.ln_f.weight": sd["model.norm.weight"],
           "lm_head.weight": sd["lm_head.weight"]}
    for i in range(2):
        p, e = f"model.layers.{i}.", f"transformer.h.{i}."
        esd[e + "ln_1.weight"] = sd[p + "input_layernorm.weight"]
        esd[e + "ln_2.weight"] = sd[p + "post_attention_layernorm.weight"]
        for w in ("q", "k", "v"):
            esd[e + f"attn.attention.{w}_proj.weight"] = \
                sd[p + f"self_attn.{w}_proj.weight"]
        esd[e + "attn.attention.out_proj.weight"] = \
            sd[p + "self_attn.o_proj.weight"]
        esd[e + "mlp.c_fc_0.weight"] = sd[p + "mlp.gate_proj.weight"]
        esd[e + "mlp.c_fc_1.weight"] = sd[p + "mlp.up_proj.weight"]
        esd[e + "mlp.c_proj.weight"] = sd[p + "mlp.down_proj.weight"]
    ecfg = {**hcfg.to_dict(), "layer_norm_epsilon": hcfg.rms_norm_eps}
    path = tmp_path / "ex.gguf"
    convert_llm(esd, ecfg, path, arch="exaone")
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.rope_neox is True
    _assert_ctx_matches(cfg, qwen3.load_params(reader), toks, ref)

    # ---- qwen v1 (MHA + attn biases, fused c_attn) ----------------------
    torch.manual_seed(1)
    hcfg_q = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        head_dim=8, max_position_embeddings=64, rope_theta=10000.0,
        attention_bias=True, attn_implementation="eager",
        tie_word_embeddings=False)
    model_q = LlamaForCausalLM(hcfg_q).eval()
    sdq = {k: v.detach().numpy() for k, v in model_q.state_dict().items()}
    # llama's o_proj has no bias even with attention_bias — zero it is
    refq = _llama_logits(model_q, toks)
    qsd = {"transformer.wte.weight": sdq["model.embed_tokens.weight"],
           "transformer.ln_f.weight": sdq["model.norm.weight"],
           "lm_head.weight": sdq["lm_head.weight"]}
    for i in range(2):
        p, e = f"model.layers.{i}.", f"transformer.h.{i}."
        qsd[e + "ln_1.weight"] = sdq[p + "input_layernorm.weight"]
        qsd[e + "ln_2.weight"] = sdq[p + "post_attention_layernorm.weight"]
        qsd[e + "attn.c_attn.weight"] = np.concatenate(
            [sdq[p + "self_attn.q_proj.weight"],
             sdq[p + "self_attn.k_proj.weight"],
             sdq[p + "self_attn.v_proj.weight"]])
        qsd[e + "attn.c_attn.bias"] = np.concatenate(
            [sdq[p + "self_attn.q_proj.bias"],
             sdq[p + "self_attn.k_proj.bias"],
             sdq[p + "self_attn.v_proj.bias"]])
        qsd[e + "attn.c_proj.weight"] = sdq[p + "self_attn.o_proj.weight"]
        qsd[e + "mlp.w2.weight"] = sdq[p + "mlp.gate_proj.weight"]
        qsd[e + "mlp.w1.weight"] = sdq[p + "mlp.up_proj.weight"]
        qsd[e + "mlp.c_proj.weight"] = sdq[p + "mlp.down_proj.weight"]
    # real HF Qwen-v1 configs set intermediate_size to 2x the actual
    # w1/w2 width (QWenMLP projects to intermediate_size // 2) — the
    # converter halves it back
    qcfg = {**hcfg_q.to_dict(), "layer_norm_epsilon": hcfg_q.rms_norm_eps,
            "intermediate_size": 2 * hcfg_q.intermediate_size,
            "rotary_emb_base": 10000.0}
    path = tmp_path / "qw1.gguf"
    convert_llm(qsd, qcfg, path, arch="qwen")
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.rope_neox is True
    params = qwen3.load_params(reader)
    assert params["layers"][0]["bq"] is not None
    _assert_ctx_matches(cfg, params, toks, refq)

    # ---- orion (biased LayerNorms, full rotary) -------------------------
    torch.manual_seed(2)
    scfg = StableLmConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        partial_rotary_factor=1.0, use_qkv_bias=False, qk_layernorm=False,
        use_parallel_residual=False, max_position_embeddings=64,
        rope_theta=10000.0, attn_implementation="eager",
        tie_word_embeddings=False)
    model_s = StableLmForCausalLM(scfg).eval()
    sds = {k: v.detach().numpy() for k, v in model_s.state_dict().items()}
    refs = _llama_logits(model_s, toks)
    ocfg = {**scfg.to_dict(), "rms_norm_eps": scfg.layer_norm_eps}
    path = tmp_path / "orion.gguf"
    convert_llm(sds, ocfg, path, arch="orion")
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.norm_type == "layer" and cfg.norm_bias and cfg.rope_neox
    params = qwen3.load_params(reader)
    assert params["layers"][0]["attn_norm_b"] is not None
    _assert_ctx_matches(cfg, params, toks, refs)


def test_baichuan_13b_converts_as_alibi_no_rope(tmp_path):
    """40-layer Baichuan (the 13B shape) is ALiBi with NO rope — the
    reference sets f_max_alibi_bias=8 for LLM_TYPE_13B and skips rope
    (llama-model.cpp:779); only the 7B variants rope. The converter
    detects the 40-layer variant and emits max_alibi_bias=8."""
    import numpy as np

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Context, SamplerParams

    rng = np.random.default_rng(0)
    d, ff, vocab, n_l = 16, 32, 32, 40

    def w(*shape):
        return (rng.standard_normal(shape) * 0.05).astype(np.float32)

    sd = {"model.embed_tokens.weight": w(vocab, d),
          "model.norm.weight": np.ones(d, np.float32),
          "lm_head.weight": w(vocab, d)}
    for i in range(n_l):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = np.ones(d, np.float32)
        sd[p + "post_attention_layernorm.weight"] = np.ones(d, np.float32)
        sd[p + "self_attn.W_pack.weight"] = w(3 * d, d)
        sd[p + "self_attn.o_proj.weight"] = w(d, d)
        sd[p + "mlp.gate_proj.weight"] = w(ff, d)
        sd[p + "mlp.up_proj.weight"] = w(ff, d)
        sd[p + "mlp.down_proj.weight"] = w(d, ff)
    config = dict(vocab_size=vocab, hidden_size=d, intermediate_size=ff,
                  num_hidden_layers=n_l, num_attention_heads=2,
                  num_key_value_heads=2, max_position_embeddings=64,
                  rms_norm_eps=1e-6, tie_word_embeddings=False)
    path = tmp_path / "bc13.gguf"
    convert_llm(sd, config, path, arch="baichuan")
    reader = GGUFReader(path)
    assert reader.kv["baichuan.attention.max_alibi_bias"] == 8.0
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.use_rope is False
    assert cfg.max_alibi_bias == 8.0
    ctx = Context(cfg, qwen3.load_params(reader), qwen3.forward,
                  qwen3.embed, n_ctx=32, buckets=(8,),
                  sampler=SamplerParams(greedy=True))
    out = ctx.generate(np.array([3, 7, 5], np.int32), max_new=4)
    assert len(out) == 4
