"""MoE (qwen3moe-style) tests: routed FFN correctness + expert parallelism
(the §2.8 EP capability the reference lacks on multi-device)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_tpu.core import GGUFReader
from omni_tpu.models import qwen3
from omni_tpu.runtime import Batch, Context, SamplerParams
from omni_tpu.testing import write_tiny_qwen3moe


@pytest.fixture(scope="module")
def moe_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("moe") / "moe.gguf"
    write_tiny_qwen3moe(path, n_experts=4, n_experts_used=2)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    return reader, cfg


def test_moe_config_and_load(moe_model):
    reader, cfg = moe_model
    assert cfg.n_experts == 4 and cfg.n_experts_used == 2
    params = qwen3.load_params(reader)
    lp = params["layers"][0]
    assert lp["gate_exps"].shape == (4, 64, 64)
    assert lp["w_gate"] is None


def test_moe_decode_and_generate(moe_model):
    reader, cfg = moe_model
    ctx = Context(cfg, qwen3.load_params(reader), qwen3.forward, qwen3.embed,
                  n_ctx=64, sampler=SamplerParams(greedy=True))
    out = ctx.generate(np.array([3, 7, 11], np.int32), max_new=6)
    assert len(out) == 6


def test_moe_ffn_matches_manual_topk(moe_model):
    """Dense-dispatch einsum == explicit per-token top-k expert loop."""
    reader, cfg = moe_model
    params = qwen3.load_params(reader)
    lp = params["layers"][0]
    rng = np.random.default_rng(0)
    hn = jnp.asarray(rng.standard_normal((3, cfg.d_model)) * 0.1, jnp.float32)

    got = np.asarray(qwen3.moe_ffn(lp, cfg, hn), np.float32)

    gi = np.asarray(lp["gate_inp"], np.float32)
    ge = np.asarray(lp["gate_exps"], np.float32)
    ue = np.asarray(lp["up_exps"], np.float32)
    de = np.asarray(lp["down_exps"], np.float32)
    hb = np.asarray(hn, np.float32)

    def silu(v):
        return v / (1 + np.exp(-v))

    expect = np.zeros_like(hb)
    for ti in range(hb.shape[0]):
        logits = gi @ hb[ti]
        probs = np.exp(logits - logits.max())
        probs /= probs.sum()
        top = np.argsort(-probs)[:2]
        ws = probs[top] / probs[top].sum()
        for w, e in zip(ws, top):
            act = silu(ge[e] @ hb[ti]) * (ue[e] @ hb[ti])
            expect[ti] += w * (de[e] @ act)
    np.testing.assert_allclose(got, expect, rtol=4e-2, atol=4e-2)


def test_moe_fused_load_keeps_experts(moe_model):
    reader, cfg = moe_model
    params = qwen3.load_params(reader, fuse=True)
    lp = params["layers"][0]
    assert "wqkv" in lp and lp.get("gate_exps") is not None
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=np.array([1, 2], np.int32)))
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs mesh")
def test_expert_parallel_sharding(moe_model):
    """EP: expert stacks shard over tp; decode matches single-device."""
    from omni_tpu.parallel import make_mesh
    from omni_tpu.parallel.infer import shard_context

    reader, cfg = moe_model

    def make():
        return Context(cfg, qwen3.load_params(reader), qwen3.forward,
                       qwen3.embed, n_ctx=64, sampler=SamplerParams(greedy=True))

    toks = np.array([3, 7, 11], np.int32)
    ref, _ = make().decode(Batch(tokens=toks))

    mesh = make_mesh(n_dp=1, n_tp=4, devices=jax.devices()[:4])
    ctx = shard_context(make(), mesh)
    # verify the expert axis is actually sharded
    spec = ctx.params["layers"][0]["gate_exps"].sharding.spec
    assert spec[0] == "tp"
    got, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(np.asarray(got).argmax(-1),
                                  np.asarray(ref).argmax(-1))


def test_moe_capacity_dispatch_matches_gather(moe_model):
    """Large-T capacity dispatch == small-T gather path (same routing):
    per-token FLOPs ∝ k/E, not dense-over-experts."""
    reader, cfg = moe_model
    params = qwen3.load_params(reader)
    lp = params["layers"][0]
    rng = np.random.default_rng(3)
    hn = jnp.asarray(rng.standard_normal((24, cfg.d_model)) * 0.1,
                     jnp.float32)  # T*k = 48 > 16 -> capacity path
    got_cap = np.asarray(qwen3.moe_ffn(lp, cfg, hn), np.float32)
    # gather path on the same tokens, 4 at a time (T*k = 8 <= 16)
    got_gather = np.concatenate([
        np.asarray(qwen3.moe_ffn(lp, cfg, hn[i:i + 4]), np.float32)
        for i in range(0, 24, 4)])
    np.testing.assert_allclose(got_cap, got_gather, rtol=2e-2, atol=2e-2)


def test_moe_q4k_experts(tmp_path):
    """Quantized expert stacks: per-expert QTensor list + fused kernel
    dispatch; output tracks the dequantized-dense reference within Q4_K
    quantization error."""
    from omni_tpu.core import GGMLType

    path = tmp_path / "moe_q4k.gguf"
    write_tiny_qwen3moe(path, n_layers=1, d_model=256, n_heads=4,
                        n_kv_heads=2, head_dim=64, d_ff=256, n_vocab=64,
                        n_experts=2, n_experts_used=2,
                        expert_qtype=GGMLType.Q4_K)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)

    from omni_tpu.kernels.qformats import QExpertStack

    pq = qwen3.load_params(reader, keep_quantized=True)
    lq = pq["layers"][0]
    assert isinstance(lq["gate_exps"], QExpertStack)
    assert lq["gate_exps"].n_experts == 2

    pd = qwen3.load_params(GGUFReader(path), keep_quantized=False)
    ld = pd["layers"][0]
    assert not isinstance(ld["gate_exps"], list)

    rng = np.random.default_rng(1)
    # decode (gather) path: T*k = 12 <= 16
    hn = jnp.asarray(rng.standard_normal((6, 256)) * 0.1, jnp.float32)
    got_q = np.asarray(qwen3.moe_ffn(lq, cfg, hn), np.float32)
    got_d = np.asarray(qwen3.moe_ffn(ld, cfg, hn), np.float32)
    err = np.abs(got_q - got_d).max() / (np.abs(got_d).max() + 1e-9)
    assert err < 0.15, err  # same weights, bf16-vs-kernel numerics only
    # capacity (prefill) path with quantized experts: T*k = 48
    hn2 = jnp.asarray(rng.standard_normal((24, 256)) * 0.1, jnp.float32)
    got_q2 = np.asarray(qwen3.moe_ffn(lq, cfg, hn2), np.float32)
    got_d2 = np.asarray(qwen3.moe_ffn(ld, cfg, hn2), np.float32)
    err2 = np.abs(got_q2 - got_d2).max() / (np.abs(got_d2).max() + 1e-9)
    assert err2 < 0.15, err2
    # end-to-end decode runs with quantized experts
    ctx = Context(cfg, pq, qwen3.forward, qwen3.embed, n_ctx=64,
                  sampler=SamplerParams(greedy=True))
    out = ctx.generate(np.array([3, 5], np.int32), max_new=3)
    assert len(out) == 3


def test_qwen3moe_logits_match_transformers(tmp_path):
    """Gold parity vs HF eager Qwen3MoeForCausalLM: top-k routing with
    normalized weights, expert stacks converted from per-expert HF
    projections — both the decode gather path (T*k small) and the
    capacity-dispatch path (prefill) must match the oracle."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = Qwen3MoeConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        moe_intermediate_size=32, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        num_experts=4, num_experts_per_tok=2, decoder_sparse_step=1,
        norm_topk_prob=True, max_position_embeddings=128,
        rope_theta=10000.0, attn_implementation="eager",
        tie_word_embeddings=True, mlp_only_layers=[],
    )
    model = Qwen3MoeForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "q3moe.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="qwen3moe")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.n_experts == 4 and cfg.n_experts_used == 2
    params = qwen3.load_params(reader)

    toks = np.array([3, 11, 7, 29, 13, 5, 41, 2], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()

    # prefill (capacity dispatch, T=8)
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)

    # token-by-token (decode gather path, T=1)
    ctx2 = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    outs = []
    for t in toks:
        lg, _ = ctx2.decode(Batch(tokens=np.array([t], np.int32)))
        outs.append(np.asarray(lg)[0])
    np.testing.assert_allclose(np.stack(outs), ref, atol=0.03)


def test_mixtral_logits_match_transformers(tmp_path):
    """Mixtral (llama arch + experts: rope permute AND w1/w2/w3 renaming)
    gold parity vs HF eager."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import MixtralConfig, MixtralForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = MixtralConfig(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, rope_theta=10000.0,
        attn_implementation="eager", tie_word_embeddings=True)
    model = MixtralForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "mix.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="llama")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.n_experts == 4 and cfg.rope_neox is False
    params = qwen3.load_params(reader)

    toks = np.array([3, 11, 7, 29, 13, 5, 41, 2], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()

    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_gpt_oss_logits_match_transformers(tmp_path):
    """GPT-OSS gold parity vs HF eager: attention sinks, q/k/v/o biases,
    alternating sliding-window layers, router bias, fused+interleaved
    expert tensors de-interleaved at conversion, clamped swiglu_oai with
    per-projection expert biases — on both MoE dispatch paths."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import GptOssConfig, GptOssForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = GptOssConfig(
        vocab_size=64, hidden_size=32, intermediate_size=32,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, num_local_experts=4, num_experts_per_tok=2,
        sliding_window=6, max_position_embeddings=128, rope_theta=10000.0,
        rope_scaling=None, attn_implementation="eager",
        tie_word_embeddings=True)
    assert hcfg.layer_types[0] == "sliding_attention"
    model = GptOssForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "oss.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="gpt-oss")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.moe_act == "swiglu_oai"
    assert cfg.swa_window == 6 and cfg.swa_every == 2
    params = qwen3.load_params(reader)
    assert params["layers"][0]["sinks"] is not None
    assert params["layers"][0]["gate_inp_b"] is not None

    toks = np.array([3, 11, 7, 29, 13, 5, 41, 2, 17, 23], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()

    # prefill (capacity dispatch)
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)

    # token-by-token (decode gather path + SWA past the window)
    ctx2 = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    outs = []
    for t in toks:
        lg, _ = ctx2.decode(Batch(tokens=np.array([t], np.int32)))
        outs.append(np.asarray(lg)[0])
    np.testing.assert_allclose(np.stack(outs), ref, atol=0.03)


def test_llama4_logits_match_transformers(tmp_path):
    """Llama4 (llm_build_llama_iswa): chunked-SWA pattern 4 whose full
    layers are NoPE with temperature-tuned queries, post-rope weightless
    L2 q/k norm, interleaved MoE layers with sigmoid router weights
    applied to the expert INPUT (weight_before_ffn) plus an always-on
    shared expert."""
    import numpy as np
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import Llama4TextConfig
    from transformers.models.llama4.modeling_llama4 import Llama4ForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.core import GGUFReader
    from omni_tpu.models import qwen3
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = Llama4TextConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        intermediate_size_mlp=64, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        num_local_experts=4, num_experts_per_tok=2,
        interleave_moe_layer_step=2, attention_chunk_size=4,
        floor_scale=4, max_position_embeddings=64,
        attn_implementation="eager", tie_word_embeddings=True)
    model = Llama4ForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "llama4.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="llama4")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.swa_chunked and cfg.swa_every == 4 and cfg.swa_window == 4
    assert cfg.no_rope_step == 4 and not cfg.rope_neox
    assert cfg.moe_weight_before and cfg.moe_gating == "sigmoid"
    assert cfg.qk_norm_l2 and cfg.attn_temp_scale == pytest.approx(0.1)
    assert cfg.attn_temp_floor == 4
    params = qwen3.load_params(reader)
    assert params["layers"][0].get("gate_inp") is None  # dense layer
    assert params["layers"][1].get("gate_inp") is not None  # MoE layer
    assert params["layers"][1].get("gate_shexp") is not None

    toks = np.array([3, 11, 7, 29, 13, 5, 17, 23, 9, 2], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)

    # single-token decode at pos 10: crosses a chunk boundary AND a
    # temperature step (floor(10/4)=2) against the pool path
    l2, _ = ctx.decode(Batch(tokens=np.array([9], np.int32),
                             pos=np.array([10], np.int32)))
    with torch.no_grad():
        ref2 = model(torch.tensor(np.r_[toks, 9][None].astype(np.int64))
                     ).logits[0, -1].numpy()
    np.testing.assert_allclose(np.asarray(l2)[0], ref2, atol=0.03)


def test_glm4moe_logits_match_transformers(tmp_path):
    """GLM-4.5-MoE (llm_build_glm4_moe): half-width NEOX partial rotary,
    leading dense layers, sigmoid router with e_score_correction bias +
    renormalized top-k + routed scaling, always-on shared expert."""
    import numpy as np
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import Glm4MoeConfig, Glm4MoeForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.core import GGUFReader
    from omni_tpu.models import qwen3
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = Glm4MoeConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=24, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, num_nextn_predict_layers=0,
        partial_rotary_factor=0.5, routed_scaling_factor=1.5,
        max_position_embeddings=64, attn_implementation="eager",
        tie_word_embeddings=True)
    model = Glm4MoeForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "glm4moe.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="glm4moe")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.moe_gating == "sigmoid" and cfg.moe_norm_w
    assert cfg.moe_scale_w == pytest.approx(1.5) and cfg.rope_dim == 4
    params = qwen3.load_params(reader)
    assert params["layers"][0].get("gate_inp") is None  # dense lead
    assert params["layers"][1].get("exp_probs_b") is not None
    assert params["layers"][1].get("gate_shexp") is not None

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_dots1_logits_match_transformers(tmp_path):
    """dots.llm1 (llm_build_dots1): per-head q/k RMS norms, leading dense
    layers, sigmoid router + bias-corrected selection + renorm + scale,
    shared expert."""
    import numpy as np
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import Dots1Config, Dots1ForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.core import GGUFReader
    from omni_tpu.models import qwen3
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = Dots1Config(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=24, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, n_group=1, topk_group=1,
        routed_scaling_factor=2.0, max_position_embeddings=64,
        attn_implementation="eager", tie_word_embeddings=True)
    model = Dots1ForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "dots1.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="dots1")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.moe_gating == "sigmoid" and cfg.moe_scale_w == 2.0
    params = qwen3.load_params(reader)
    assert params["layers"][1]["q_norm"] is not None

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_ernie45_moe_logits_match_transformers(tmp_path):
    """ERNIE-4.5-MoE (llm_build_ernie4_5_moe): NORM rope (permuted),
    interleaved MoE after a dense lead, softmax router with
    moe_statics e_score_correction bias on SELECTION only + renorm,
    shared expert."""
    import numpy as np
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import Ernie4_5_MoeConfig, Ernie4_5_MoeForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.core import GGUFReader
    from omni_tpu.models import qwen3
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = Ernie4_5_MoeConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        moe_intermediate_size=24, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2,
        moe_num_experts=4, moe_k=2, moe_num_shared_experts=1,
        moe_layer_start_index=1, moe_layer_interval=1,
        max_position_embeddings=64, attn_implementation="eager",
        tie_word_embeddings=True)
    model = Ernie4_5_MoeForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "ernie45moe.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="ernie4_5-moe")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.moe_gating == "softmax" and cfg.moe_norm_w
    assert not cfg.rope_neox
    params = qwen3.load_params(reader)
    assert params["layers"][0].get("gate_inp") is None  # dense lead
    assert params["layers"][1].get("exp_probs_b") is not None

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_hunyuan_dense_logits_match_transformers(tmp_path):
    """HunYuan-Dense (llm_build_hunyuan_dense): weighted per-head q/k RMS
    norms applied AFTER rope (qk_norm_post_rope)."""
    import numpy as np
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import HunYuanDenseV1Config, HunYuanDenseV1ForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.core import GGUFReader
    from omni_tpu.models import qwen3
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = HunYuanDenseV1Config(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, use_qk_norm=True, rope_scaling=None,
        max_position_embeddings=64, attn_implementation="eager",
        tie_word_embeddings=True)
    model = HunYuanDenseV1ForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "hy_dense.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="hunyuan-dense")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.qk_norm_post_rope and cfg.rope_neox
    params = qwen3.load_params(reader)
    assert params["layers"][0]["q_norm"] is not None

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_hunyuan_moe_logits_match_transformers(tmp_path):
    """HunYuan-MoE (llm_build_hunyuan_moe): post-rope q/k norms + softmax
    renormalized top-k routing + an always-on shared_mlp expert."""
    import numpy as np
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import HunYuanMoEV1Config, HunYuanMoEV1ForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.core import GGUFReader
    from omni_tpu.models import qwen3
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = HunYuanMoEV1Config(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, num_experts=4, moe_topk=2, use_qk_norm=True,
        rope_scaling=None, max_position_embeddings=64,
        attn_implementation="eager", tie_word_embeddings=True)
    model = HunYuanMoEV1ForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "hy_moe.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="hunyuan-moe")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.qk_norm_post_rope and cfg.moe_norm_w
    assert cfg.n_experts == 4 and cfg.n_experts_used == 2
    params = qwen3.load_params(reader)
    assert params["layers"][0].get("gate_shexp") is not None

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_dbrx_logits_match_transformers(tmp_path):
    """DBRX (llm_build_dbrx): bias-free LayerNorms, fused clamped Wqkv,
    flattened w1/v1/w2 expert tensors, softmax renormalized top-k."""
    import numpy as np
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import DbrxConfig, DbrxForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.core import GGUFReader
    from omni_tpu.models import qwen3
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = DbrxConfig(
        d_model=32, n_heads=4, n_layers=2, vocab_size=96, max_seq_len=64,
        ffn_config={"ffn_hidden_size": 48, "moe_num_experts": 4,
                    "moe_top_k": 2},
        attn_config={"kv_n_heads": 2, "clip_qkv": 6.0},
        attn_implementation="eager")
    model = DbrxForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "dbrx.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="dbrx")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.norm_type == "layer" and cfg.clamp_kqv == 6.0
    assert cfg.n_experts == 4 and cfg.moe_norm_w
    params = qwen3.load_params(reader)
    assert "wqkv" in params["layers"][0]

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)


def test_phimoe_logits_match_transformers(tmp_path):
    """PhiMoE (llm_build_phi3 MoE branch, LLM_ARCH_PHIMOE): true biased
    LayerNorms, biased q/k/v/o + lm_head, HF-exact sparsemixer top-2
    routing (separate masked softmaxes, no pairwise renorm — the
    reference approximates this with plain softmax top-2)."""
    import numpy as np
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import PhimoeConfig, PhimoeForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.core import GGUFReader
    from omni_tpu.models import qwen3
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = PhimoeConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=64, rope_theta=10000.0, rope_scaling=None,
        attention_bias=True, lm_head_bias=True, router_jitter_noise=0.01,
        sliding_window=None, attn_implementation="eager",
        tie_word_embeddings=False)
    model = PhimoeForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "phimoe.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="phimoe")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.moe_gating == "sparsemixer" and cfg.norm_bias
    assert cfg.norm_type == "layer"
    assert abs(cfg.moe_jitter_eps - 0.01) < 1e-6
    params = qwen3.load_params(reader)
    assert params["layers"][0]["attn_norm_b"] is not None
    assert params["layers"][0]["bq"] is not None
    assert params["output_b"] is not None

    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()

    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    ours = np.asarray(logits)
    np.testing.assert_allclose(ours, ref, atol=0.03)
    for i in range(len(toks)):
        top2 = np.sort(ref[i])[-2:]
        if top2[1] - top2[0] > 0.03:
            assert np.argmax(ours[i]) == np.argmax(ref[i]), i
