"""DeepSeek-V2/V3 (arch "deepseek2") MLA + MoE parity vs HF transformers.

The engine runs the ABSORBED MLA path (reference src/llama-model.cpp
llm_build_deepseek2): the KV cache holds one latent head of
[qk_rope_head_dim roped | kv_lora_rank compressed] per position, queries
absorb wk_b so scores contract in latent space, and attention output
decompresses through wv_b.  HF transformers runs the naive decompressed
path — logits parity across the two factorizations is the strongest
correctness check available.
"""
import numpy as np
import pytest

from omni_tpu.core.gguf import GGUFReader
from omni_tpu.models import qwen3

torch = pytest.importorskip("torch")


def _roundtrip(model, hcfg, tmp_path, name):
    from omni_tpu.convert.hf_to_gguf import convert_llm
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / f"{name}.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="deepseek2")
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader)
    return cfg, params


def _check_logits(cfg, params, model, toks, atol=0.02):
    from omni_tpu.runtime import Batch, Context
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    ours = np.asarray(logits)
    np.testing.assert_allclose(ours, ref, atol=atol)
    for i in range(len(toks)):
        top2 = np.sort(ref[i])[-2:]
        if top2[1] - top2[0] > atol:
            assert np.argmax(ours[i]) == np.argmax(ref[i]), i


def test_deepseek_v2_logits_match_transformers(tmp_path):
    """DeepSeek-V2: q LoRA + MLA + MoE (softmax greedy gate, shared
    expert, leading dense layer, routed_scaling_factor)."""
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    torch.manual_seed(0)
    hcfg = DeepseekV2Config(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        moe_intermediate_size=32, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=24, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=16, v_head_dim=12, head_dim=12,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, topk_method="greedy", n_group=1,
        topk_group=1, norm_topk_prob=False, routed_scaling_factor=1.5,
        max_position_embeddings=128, rope_theta=10000.0,
        attn_implementation="eager",
    )
    model = DeepseekV2ForCausalLM(hcfg).eval()
    cfg, params = _roundtrip(model, hcfg, tmp_path, "dsv2")
    assert cfg.kv_lora_rank == 16 and cfg.rope_dim == 8
    assert cfg.n_kv_heads == 1 and cfg.head_dim == 16 + 8
    assert cfg.moe_gating == "softmax" and cfg.moe_scale_w == 1.5
    assert cfg.rope_neox is False
    toks = np.array([3, 11, 7, 29, 13, 5, 41, 2], np.int32)
    _check_logits(cfg, params, model, toks)


def test_deepseek_v2_lite_logits_match_transformers(tmp_path):
    """V2-Lite: q_lora_rank=None -> direct q projection, dense FFN only."""
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    torch.manual_seed(1)
    hcfg = DeepseekV2Config(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=None, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=16, v_head_dim=12, head_dim=12,
        n_routed_experts=None, first_k_dense_replace=2,
        topk_method="greedy", n_group=1, topk_group=1,
        max_position_embeddings=128, rope_theta=10000.0,
        attn_implementation="eager",
    )
    model = DeepseekV2ForCausalLM(hcfg).eval()
    cfg, params = _roundtrip(model, hcfg, tmp_path, "dsv2l")
    assert cfg.q_lora_rank == 0 and cfg.n_experts == 0
    toks = np.array([9, 1, 55, 29, 3, 5], np.int32)
    _check_logits(cfg, params, model, toks)


def test_deepseek_v3_logits_match_transformers(tmp_path):
    """DeepSeek-V3: sigmoid gating + e_score_correction selection bias +
    norm_topk_prob (weights from UNbiased scores)."""
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    torch.manual_seed(2)
    hcfg = DeepseekV3Config(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        moe_intermediate_size=32, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=24, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=16, v_head_dim=12, head_dim=8,
        n_routed_experts=8, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, n_group=1, topk_group=1,
        norm_topk_prob=True, routed_scaling_factor=2.0,
        max_position_embeddings=128, rope_theta=10000.0,
        attn_implementation="eager", rope_interleave=True,
    )
    model = DeepseekV3ForCausalLM(hcfg).eval()
    # make the correction bias non-trivial so selection != plain sigmoid
    with torch.no_grad():
        for layer in model.model.layers[1:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.2, 0.2)
    cfg, params = _roundtrip(model, hcfg, tmp_path, "dsv3")
    assert cfg.moe_gating == "sigmoid" and cfg.moe_norm_w is True
    toks = np.array([3, 11, 7, 29, 13, 5, 41, 2], np.int32)
    _check_logits(cfg, params, model, toks)


def test_deepseek_kv_cache_geometry(tmp_path):
    """Decode after prefill reuses the latent cache: step-by-step decode
    logits match a single prefill pass (cache holds [rope|latent] keys,
    latent-only values)."""
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(3)
    hcfg = DeepseekV2Config(
        vocab_size=64, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=24, kv_lora_rank=16, qk_rope_head_dim=8,
        qk_nope_head_dim=16, v_head_dim=12, head_dim=12,
        n_routed_experts=None, first_k_dense_replace=2,
        topk_method="greedy", n_group=1, topk_group=1,
        max_position_embeddings=128, rope_theta=10000.0,
        attn_implementation="eager",
    )
    model = DeepseekV2ForCausalLM(hcfg).eval()
    cfg, params = _roundtrip(model, hcfg, tmp_path, "dskv")
    toks = np.array([3, 11, 7, 29, 13, 5], np.int32)

    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    full, _ = ctx.decode(Batch(tokens=toks))
    # value plane is latent-width, key plane is rope+latent
    assert ctx.cache.v.shape[-1] == cfg.kv_lora_rank
    assert ctx.cache.k.shape[-1] == cfg.kv_lora_rank + cfg.rope_dim

    ctx2 = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    step = []
    for i in range(len(toks)):
        lg, _ = ctx2.decode(Batch(tokens=toks[i:i + 1],
                                  pos=np.array([i], np.int32)))
        step.append(np.asarray(lg)[0])
    np.testing.assert_allclose(np.stack(step), np.asarray(full), atol=5e-3)
