"""RoPE context-scaling parity vs HF transformers (the oracle whose
formulas the engine implements): linear, yarn (NTK-by-parts), llama3
per-dim divisors, and phi3 longrope short/long factor tensors.

Reference counterparts: {arch}.rope.scaling.* GGUF keys
(/root/reference/gguf-py/gguf/constants.py:166-175), rope_freqs.weight
(/root/reference/convert_hf_to_gguf.py:2410-2436), rope_factors_
{short,long}.weight (Phi3MiniModel), ggml rope_yarn corrections."""

import dataclasses

import numpy as np
import pytest

from omni_tpu.core import GGUFReader
from omni_tpu.models import qwen3

torch = pytest.importorskip("torch")


def _run_parity(tmp_path, hcfg, model, arch, toks=None, replace_cfg=None,
                atol=0.02):
    from omni_tpu.convert.hf_to_gguf import convert_llm
    from omni_tpu.runtime import Batch, Context

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / f"{arch}.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch=arch)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    if replace_cfg:
        cfg = dataclasses.replace(cfg, **replace_cfg)
    params = qwen3.load_params(reader)
    if toks is None:
        toks = np.array([3, 11, 7, 29, 13, 5, 41, 2], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))
                    ).logits[0].numpy()
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed,
                  n_ctx=max(64, len(toks) + 8))
    logits, _ = ctx.decode(Batch(tokens=toks))
    ours = np.asarray(logits)
    np.testing.assert_allclose(ours, ref, atol=atol)
    for i in range(len(toks)):
        top2 = np.sort(ref[i])[-2:]
        if top2[1] - top2[0] > atol:
            assert np.argmax(ours[i]) == np.argmax(ref[i]), i
    return cfg, reader


def test_llama3_rope_scaling_parity(tmp_path):
    """llama3-type scaling arrives as the rope_freqs.weight per-dim
    divisor tensor; scaled and unscaled logits must differ."""
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    kw = dict(vocab_size=64, hidden_size=32, intermediate_size=64,
              num_hidden_layers=2, num_attention_heads=4,
              num_key_value_heads=2, head_dim=8,
              max_position_embeddings=256, rope_theta=10000.0,
              attn_implementation="eager", tie_word_embeddings=True)
    hcfg = LlamaConfig(rope_scaling={
        "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
        "high_freq_factor": 4.0, "original_max_position_embeddings": 32,
    }, **kw)
    model = LlamaForCausalLM(hcfg).eval()
    # sharpen attention so positions (hence rope scaling) actually move
    # the logits — random-init tiny models are near-position-blind
    sd = model.state_dict()
    for k in list(sd):
        if "q_proj" in k or "k_proj" in k:
            sd[k] = sd[k] * 8.0
    model.load_state_dict(sd)
    rng = np.random.default_rng(7)
    toks = rng.integers(2, 60, size=24).astype(np.int32)
    cfg, reader = _run_parity(tmp_path, hcfg, model, "llama", toks=toks)
    assert reader.tensors.get("rope_freqs.weight") is not None

    # same weights without scaling must NOT match the scaled logits:
    # the unscaled error must dominate the (numerical) parity error
    params = qwen3.load_params(reader)
    from omni_tpu.runtime import Batch, Context
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))
                    ).logits[0].numpy()
    ctx_s = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=64)
    scaled, _ = ctx_s.decode(Batch(tokens=toks))
    err_scaled = np.abs(np.asarray(scaled) - ref).max()
    params_plain = dict(params, rope_freqs=None)
    ctx = Context(cfg, params_plain, qwen3.forward, qwen3.embed, n_ctx=64)
    plain, _ = ctx.decode(Batch(tokens=toks))
    err_plain = np.abs(np.asarray(plain) - ref).max()
    assert err_plain > 5 * err_scaled


def test_linear_rope_scaling_parity(tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(1)
    hcfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=256, rope_theta=10000.0,
        attn_implementation="eager", tie_word_embeddings=True,
        rope_scaling={"rope_type": "linear", "factor": 4.0})
    model = LlamaForCausalLM(hcfg).eval()
    cfg, _ = _run_parity(tmp_path, hcfg, model, "llama")
    assert cfg.rope_scaling == "linear" and cfg.rope_scale_factor == 4.0


def test_yarn_rope_scaling_parity(tmp_path):
    """YaRN on qwen2 (NeoX rope + attention biases): ramp-corrected
    frequencies + the 0.1*ln(factor)+1 attention factor."""
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(2)
    hcfg = Qwen2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rope_theta=10000.0,
        attn_implementation="eager", tie_word_embeddings=True,
        rope_scaling={"rope_type": "yarn", "factor": 4.0,
                      "original_max_position_embeddings": 128})
    model = Qwen2ForCausalLM(hcfg).eval()
    cfg, _ = _run_parity(tmp_path, hcfg, model, "qwen2")
    assert cfg.rope_scaling == "yarn"
    assert cfg.rope_orig_ctx == 128
    assert abs(cfg.rope_attn_factor - (0.1 * np.log(4.0) + 1.0)) < 1e-6


def _phi3_cfg(**rope_kw):
    from transformers import Phi3Config

    return Phi3Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        rope_theta=10000.0, pad_token_id=0,
        attn_implementation="eager", **rope_kw)


def test_phi3_longrope_short_branch_parity(tmp_path):
    """seq_len <= original_max -> HF applies short_factor; the engine
    reads rope_factors_short.weight (cfg.rope_long=False default)."""
    from transformers import Phi3ForCausalLM

    torch.manual_seed(3)
    hcfg = _phi3_cfg(
        max_position_embeddings=256,
        original_max_position_embeddings=64,
        rope_scaling={"type": "longrope",
                      "short_factor": [1.0, 1.2, 1.5, 2.0],
                      "long_factor": [1.0, 2.0, 4.0, 8.0]})
    model = Phi3ForCausalLM(hcfg).eval()
    cfg, reader = _run_parity(tmp_path, hcfg, model, "phi3")
    assert cfg.rope_scaling == "longrope" and not cfg.rope_long
    assert reader.tensors.get("rope_factors_long.weight") is not None
    # resolved attention factor: sqrt(1 + ln(256/64)/ln(64))
    expect = np.sqrt(1 + np.log(4.0) / np.log(64))
    assert abs(cfg.rope_attn_factor - expect) < 1e-6


def test_phi3_longrope_long_branch_parity(tmp_path):
    """seq_len > original_max -> HF switches to long_factor; the engine
    mirrors with cfg.rope_long=True (the runtime sets it whenever its
    context exceeds rope_orig_ctx)."""
    from transformers import Phi3ForCausalLM

    torch.manual_seed(4)
    hcfg = _phi3_cfg(
        max_position_embeddings=256,
        original_max_position_embeddings=16,
        rope_scaling={"type": "longrope",
                      "short_factor": [1.0, 1.2, 1.5, 2.0],
                      "long_factor": [1.0, 2.0, 4.0, 8.0]})
    model = Phi3ForCausalLM(hcfg).eval()
    rng = np.random.default_rng(0)
    toks = rng.integers(2, 60, size=24).astype(np.int32)  # 24 > 16
    _run_parity(tmp_path, hcfg, model, "phi3", toks=toks,
                replace_cfg={"rope_long": True})


def test_phi3_sliding_window_parity(tmp_path):
    """phi3 windows EVERY layer; parity with seq longer than the window
    proves the all-SWA mask (not just causal) is applied."""
    from transformers import Phi3ForCausalLM

    torch.manual_seed(5)
    hcfg = _phi3_cfg(max_position_embeddings=128, sliding_window=4)
    model = Phi3ForCausalLM(hcfg).eval()
    rng = np.random.default_rng(1)
    toks = rng.integers(2, 60, size=12).astype(np.int32)
    cfg, _ = _run_parity(tmp_path, hcfg, model, "phi3", toks=toks)
    assert cfg.swa_window == 4
    assert all(cfg.is_swa_layer(il) for il in range(cfg.n_layers))
