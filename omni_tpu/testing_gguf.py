"""Tiny-GGUF writers for the non-LLM omni modules (APM / VPM / TTS /
Token2Wav) and a full MiniCPM-o-style model-directory builder.

The reference tests against small real artifacts (SURVEY.md §4: vocab-only
GGUFs, 15M-param smoke models). These writers play the same role for the
omni stack: every module is serialized under the exact tensor naming its
loader expects (the converter naming of tools/omni/convert/convert_*.py),
so `omni-cli`/`omni-server` can drive a COMPLETE 5-module session
end-to-end on random weights — plumbing and protocol validation without
multi-GB checkpoints.

Directory layout written by `write_tiny_model_dir` (mirrors the reference
model-dir resolution, tools/omni/omni-cli.cpp):

    {dir}/llm.gguf
    {dir}/audio/tiny-audio-apm.gguf
    {dir}/vision/tiny-vision-vpm.gguf
    {dir}/tts/tiny-tts.gguf
    {dir}/token2wav/{encoder,flow_matching,flow_extra,hifigan2,prompt_cache}.gguf
"""

from __future__ import annotations

import os

import numpy as np

from .core.gguf import GGUFWriter
from .core.dtypes import GGMLType
from .testing import write_tiny_qwen3


def _r(rng, *shape, s=0.1):
    return (rng.standard_normal(shape) * s).astype(np.float32)


# ---------------------------------------------------------------------------
# APM (streaming Whisper encoder; loader omni_tpu/models/whisper.py)
# ---------------------------------------------------------------------------

def write_tiny_apm(path, n_layers=2, d_model=64, n_heads=4, n_mels=16,
                   n_audio_ctx=300, d_out=64, seed=0) -> None:
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path)
    w.add_kv("general.architecture", "whisper")
    w.add_kv("encoder_layers", n_layers)
    w.add_kv("d_model", d_model)
    w.add_kv("encoder_attention_heads", n_heads)
    w.add_kv("n_mel", n_mels)
    w.add_kv("n_audio_ctx", n_audio_ctx)
    w.add_kv("audio_projection_dim", d_out)
    # simple positive filterbank [n_mel, 201] (n_fft 400 -> 201 bins)
    w.add_kv("filters",
             (np.abs(rng.standard_normal((n_mels, 201))) * 0.01)
             .astype(np.float32).reshape(-1).tolist())

    def t(name, *shape):
        w.add_tensor(name, _r(rng, *shape))

    t("encoder.conv1.weight", d_model, n_mels, 3)
    t("encoder.conv1.bias", d_model)
    t("encoder.conv2.weight", d_model, d_model, 3)
    t("encoder.conv2.bias", d_model)
    t("encoder.positional_embedding", n_audio_ctx, d_model)
    w.add_tensor("encoder.ln_post.weight", np.ones(d_model, np.float32))
    w.add_tensor("encoder.ln_post.bias", np.zeros(d_model, np.float32))
    t("audio_projector.linear1.weight", d_out, d_model)
    t("audio_projector.linear1.bias", d_out)
    t("audio_projector.linear2.weight", d_out, d_out)
    t("audio_projector.linear2.bias", d_out)
    for i in range(n_layers):
        b = f"encoder.blocks.{i}."
        w.add_tensor(b + "attn_ln.weight", np.ones(d_model, np.float32))
        w.add_tensor(b + "attn_ln.bias", np.zeros(d_model, np.float32))
        t(b + "attn.query.weight", d_model, d_model)
        t(b + "attn.query.bias", d_model)
        t(b + "attn.key.weight", d_model, d_model)  # no bias (whisper)
        t(b + "attn.value.weight", d_model, d_model)
        t(b + "attn.value.bias", d_model)
        t(b + "attn.out.weight", d_model, d_model)
        t(b + "attn.out.bias", d_model)
        w.add_tensor(b + "mlp_ln.weight", np.ones(d_model, np.float32))
        w.add_tensor(b + "mlp_ln.bias", np.zeros(d_model, np.float32))
        t(b + "mlp.0.weight", 2 * d_model, d_model)
        t(b + "mlp.0.bias", 2 * d_model)
        t(b + "mlp.2.weight", d_model, 2 * d_model)
        t(b + "mlp.2.bias", d_model)
    w.write()


# ---------------------------------------------------------------------------
# VPM (SigLip encoder + resampler; loader omni_tpu/models/siglip.py)
# ---------------------------------------------------------------------------

def write_tiny_vpm(path, n_layers=2, d_model=32, n_heads=4, d_ff=64,
                   patch_size=14, d_out=64, n_queries=8, pos_buckets=70,
                   seed=0) -> None:
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path)
    w.add_kv("general.architecture", "clip")
    w.add_kv("clip.vision.block_count", n_layers)
    w.add_kv("clip.vision.embedding_length", d_model)
    w.add_kv("clip.vision.attention.head_count", n_heads)
    w.add_kv("clip.vision.feed_forward_length", d_ff)
    w.add_kv("clip.vision.patch_size", patch_size)
    w.add_kv("clip.vision.image_size", 448)
    w.add_kv("clip.vision.projection_dim", d_out)
    w.add_kv("clip.minicpmv_query_num", n_queries)
    w.add_kv("clip.vision.image_mean", [0.5, 0.5, 0.5])
    w.add_kv("clip.vision.image_std", [0.5, 0.5, 0.5])

    def t(name, *shape):
        w.add_tensor(name, _r(rng, *shape))

    t("v.patch_embd.weight", d_model, 3, patch_size, patch_size)
    t("v.patch_embd.bias", d_model)
    t("v.position_embd.weight", pos_buckets * pos_buckets, d_model)
    w.add_tensor("v.post_ln.weight", np.ones(d_model, np.float32))
    w.add_tensor("v.post_ln.bias", np.zeros(d_model, np.float32))
    t("resampler.query", n_queries, d_out)
    t("resampler.kv.weight", d_out, d_model)
    for n in ("q", "k", "v", "out"):
        t(f"resampler.attn.{n}.weight", d_out, d_out)
        t(f"resampler.attn.{n}.bias", d_out)
    for n in ("ln_q", "ln_kv", "ln_post"):
        w.add_tensor(f"resampler.{n}.weight", np.ones(d_out, np.float32))
        w.add_tensor(f"resampler.{n}.bias", np.zeros(d_out, np.float32))
    t("resampler.proj.weight", d_out, d_out)
    for i in range(n_layers):
        b = f"v.blk.{i}."
        w.add_tensor(b + "ln1.weight", np.ones(d_model, np.float32))
        w.add_tensor(b + "ln1.bias", np.zeros(d_model, np.float32))
        for n in ("q", "k", "v"):
            t(b + f"attn_{n}.weight", d_model, d_model)
            t(b + f"attn_{n}.bias", d_model)
        t(b + "attn_out.weight", d_model, d_model)
        t(b + "attn_out.bias", d_model)
        w.add_tensor(b + "ln2.weight", np.ones(d_model, np.float32))
        w.add_tensor(b + "ln2.bias", np.zeros(d_model, np.float32))
        t(b + "ffn_up.weight", d_ff, d_model)
        t(b + "ffn_up.bias", d_ff)
        t(b + "ffn_down.weight", d_model, d_ff)
        t(b + "ffn_down.bias", d_model)
    w.write()


# ---------------------------------------------------------------------------
# TTS (LLaMA-arch decoder + side weights; loader omni_tpu/models/tts.py)
# ---------------------------------------------------------------------------

def write_tiny_tts(path, n_layers=2, d_model=32, n_heads=2, d_ff=64,
                   d_llm=64, n_codes=50, n_text=300, seed=0) -> None:
    """blk.* decoder (qwen3 naming, NORM rope via arch=minicpmtts) plus the
    raw side weights (emb_text/emb_code/head_code/projectors,
    omni.cpp:1260-1836)."""
    rng = np.random.default_rng(seed + 7)
    write_tiny_qwen3(path, n_layers=n_layers, d_model=d_model,
                     n_heads=n_heads, n_kv_heads=n_heads,
                     head_dim=d_model // n_heads, d_ff=d_ff,
                     n_vocab=n_codes, qk_norm=False,
                     qtype=GGMLType.F32, seed=seed, arch="minicpmtts",
                     extra_tensors=_tts_extra_tensors(
                         rng, d_model, d_llm, n_codes, n_text))


def _tts_extra_tensors(rng, d_tts, d_llm, n_codes, n_text):
    return {
        "emb_text.weight": _r(rng, n_text, d_tts),
        "emb_code.0.weight": _r(rng, n_codes, d_tts),
        "head_code.0.weight": _r(rng, n_codes, d_tts),
        "projector_semantic.linear1.weight": _r(rng, d_tts, d_llm),
        "projector_semantic.linear1.bias": _r(rng, d_tts),
        "projector_semantic.linear2.weight": _r(rng, d_tts, d_tts),
        "projector_semantic.linear2.bias": _r(rng, d_tts),
        "projector_spk.linear1.weight": _r(rng, d_tts, d_llm),
        "projector_spk.linear1.bias": _r(rng, d_tts),
        "projector_spk.linear2.weight": _r(rng, d_tts, d_tts),
        "projector_spk.linear2.bias": _r(rng, d_tts),
    }


# ---------------------------------------------------------------------------
# Token2Wav: 4 GGUFs + prompt cache (loaders omni_tpu/models/token2wav/)
# ---------------------------------------------------------------------------

def write_tiny_token2wav(dir_path, mel=16, seed=0,
                         prompt_tokens=None) -> dict:
    """Write encoder/flow_matching/flow_extra/hifigan2(/prompt_cache) GGUFs
    from the tiny pytrees of testing_t2w; returns the path dict."""
    from .testing_t2w import tiny_conformer, tiny_dit, tiny_hifigan

    rng = np.random.default_rng(seed + 21)
    os.makedirs(dir_path, exist_ok=True)
    paths = {
        "t2w_encoder": os.path.join(dir_path, "tiny-encoder.gguf"),
        "t2w_flow": os.path.join(dir_path, "tiny-flow_matching.gguf"),
        "t2w_extra": os.path.join(dir_path, "tiny-flow_extra.gguf"),
        "t2w_vocoder": os.path.join(dir_path, "tiny-hifigan2.gguf"),
        "t2w_prompt": os.path.join(dir_path, "tiny-prompt_cache.gguf"),
    }

    conf_p, conf_cfg = tiny_conformer(rng, d=32)
    _write_conformer(paths["t2w_encoder"], conf_p)
    dit_p, dit_cfg = tiny_dit(rng, mel=mel)
    _write_dit(paths["t2w_flow"], dit_p)
    w = GGUFWriter(paths["t2w_extra"])
    w.add_tensor("input_embedding.weight", _r(rng, 5000, conf_cfg.d_model))
    w.add_tensor("spk_embed_affine_layer.weight",
                 _r(rng, dit_cfg.out_channels, 192))
    w.add_tensor("spk_embed_affine_layer.bias", _r(rng, dit_cfg.out_channels))
    w.add_tensor("encoder_proj.weight",
                 _r(rng, dit_cfg.out_channels, conf_cfg.d_model))
    w.add_tensor("encoder_proj.bias", _r(rng, dit_cfg.out_channels))
    w.write()
    _write_hifigan(paths["t2w_vocoder"], tiny_hifigan(rng, mel=mel))

    w = GGUFWriter(paths["t2w_prompt"])
    w.add_tensor("prompt_cache.spk_cb", _r(rng, 192, s=1.0))
    if prompt_tokens is None:
        prompt_tokens = rng.integers(0, 40, size=30)
    w.add_tensor("prompt_cache.prompt_tokens",
                 np.asarray(prompt_tokens, np.int32))
    w.write()
    return paths


def _np(x):
    return np.asarray(x, np.float32)


def _write_conformer(path, p) -> None:
    w = GGUFWriter(path)
    top = {
        "embed_w": "embed.out.0.weight", "embed_b": "embed.out.0.bias",
        "embed_ln_w": "embed.out.1.weight", "embed_ln_b": "embed.out.1.bias",
        "prelook1_w": "pre_lookahead_layer.conv1.weight",
        "prelook1_b": "pre_lookahead_layer.conv1.bias",
        "prelook2_w": "pre_lookahead_layer.conv2.weight",
        "prelook2_b": "pre_lookahead_layer.conv2.bias",
        "up_conv_w": "up_layer.conv.weight", "up_conv_b": "up_layer.conv.bias",
        "up_embed_w": "up_embed.out.0.weight", "up_embed_b": "up_embed.out.0.bias",
        "up_embed_ln_w": "up_embed.out.1.weight",
        "up_embed_ln_b": "up_embed.out.1.bias",
        "after_norm_w": "after_norm.weight", "after_norm_b": "after_norm.bias",
    }
    for k, name in top.items():
        w.add_tensor(name, _np(p[k]))
    layer_map = {
        "norm_ff_w": "norm_ff.weight", "norm_ff_b": "norm_ff.bias",
        "norm_mha_w": "norm_mha.weight", "norm_mha_b": "norm_mha.bias",
        "q_w": "self_attn.linear_q.weight", "q_b": "self_attn.linear_q.bias",
        "k_w": "self_attn.linear_k.weight", "k_b": "self_attn.linear_k.bias",
        "v_w": "self_attn.linear_v.weight", "v_b": "self_attn.linear_v.bias",
        "o_w": "self_attn.linear_out.weight", "o_b": "self_attn.linear_out.bias",
        "pos_w": "self_attn.linear_pos.weight",
        "pos_bias_u": "self_attn.pos_bias_u", "pos_bias_v": "self_attn.pos_bias_v",
        "ff1_w": "feed_forward.w_1.weight", "ff1_b": "feed_forward.w_1.bias",
        "ff2_w": "feed_forward.w_2.weight", "ff2_b": "feed_forward.w_2.bias",
    }
    for prefix, layers in (("encoders", p["encoders"]),
                           ("up_encoders", p["up_encoders"])):
        for i, lp in enumerate(layers):
            for k, name in layer_map.items():
                w.add_tensor(f"{prefix}.{i}.{name}", _np(lp[k]))
    w.write()


def _write_dit(path, p) -> None:
    w = GGUFWriter(path)
    top = {
        "in_proj_w": "estimator.in_proj.weight",
        "in_proj_b": "estimator.in_proj.bias",
        "t_mlp1_w": "estimator.t_embedder.mlp.0.weight",
        "t_mlp1_b": "estimator.t_embedder.mlp.0.bias",
        "t_mlp2_w": "estimator.t_embedder.mlp.2.weight",
        "t_mlp2_b": "estimator.t_embedder.mlp.2.bias",
        "final_ada_w": "estimator.final_layer.adaLN_modulation.1.weight",
        "final_ada_b": "estimator.final_layer.adaLN_modulation.1.bias",
        "final_w": "estimator.final_layer.linear.weight",
        "final_b": "estimator.final_layer.linear.bias",
    }
    for k, name in top.items():
        w.add_tensor(name, _np(p[k]))
    blk_map = {
        "ada_w": "adaLN_modulation.1.weight", "ada_b": "adaLN_modulation.1.bias",
        "q_w": "attn.to_q.weight", "q_b": "attn.to_q.bias",
        "k_w": "attn.to_k.weight", "k_b": "attn.to_k.bias",
        "v_w": "attn.to_v.weight", "v_b": "attn.to_v.bias",
        "qn_w": "attn.q_norm.weight", "qn_b": "attn.q_norm.bias",
        "kn_w": "attn.k_norm.weight", "kn_b": "attn.k_norm.bias",
        "proj_w": "attn.proj.weight", "proj_b": "attn.proj.bias",
        "conv1_w": "conv.block.1.weight", "conv1_b": "conv.block.1.bias",
        "conv_ln_w": "conv.block.3.weight", "conv_ln_b": "conv.block.3.bias",
        "conv2_w": "conv.block.6.weight", "conv2_b": "conv.block.6.bias",
        "fc1_w": "mlp.fc1.weight", "fc1_b": "mlp.fc1.bias",
        "fc2_w": "mlp.fc2.weight", "fc2_b": "mlp.fc2.bias",
    }
    for i, bp in enumerate(p["blocks"]):
        for k, name in blk_map.items():
            w.add_tensor(f"estimator.blocks.{i}.{name}", _np(bp[k]))
    w.write()


def _write_hifigan(path, p) -> None:
    w = GGUFWriter(path)
    for k in ("conv_pre", "conv_post"):
        w.add_tensor(f"{k}.weight", _np(p[k + "_w"]))
        w.add_tensor(f"{k}.bias", _np(p[k + "_b"]))
    w.add_tensor("f0_predictor.proj.weight", _np(p["f0_lin_w"]))
    w.add_tensor("f0_predictor.proj.bias", _np(p["f0_lin_b"]))
    w.add_tensor("m_source.l_linear.weight", _np(p["nsf_lin_w"]))
    w.add_tensor("m_source.l_linear.bias", _np(p["nsf_lin_b"]))
    for i in range(5):
        w.add_tensor(f"f0_predictor.condnet.{i * 2}.weight",
                     _np(p[f"f0_conv{i}_w"]))
        w.add_tensor(f"f0_predictor.condnet.{i * 2}.bias",
                     _np(p[f"f0_conv{i}_b"]))
    for s in range(3):
        w.add_tensor(f"ups.{s}.weight", _np(p[f"up{s}_w"]))
        w.add_tensor(f"ups.{s}.bias", _np(p[f"up{s}_b"]))
        w.add_tensor(f"source_downs.{s}.weight", _np(p[f"sd{s}_w"]))
        w.add_tensor(f"source_downs.{s}.bias", _np(p[f"sd{s}_b"]))
        _write_resblock(w, p, f"s{s}", f"source_resblocks.{s}")
    for r in range(9):
        _write_resblock(w, p, f"{r}", f"resblocks.{r}")
    w.write()


def _write_resblock(w, p, key, prefix) -> None:
    for i, ((w1, b1), (w2, b2)) in enumerate(
            zip(p[f"rb{key}_c1"], p[f"rb{key}_c2"])):
        w.add_tensor(f"{prefix}.convs1.{i}.weight", _np(w1))
        w.add_tensor(f"{prefix}.convs1.{i}.bias", _np(b1))
        w.add_tensor(f"{prefix}.convs2.{i}.weight", _np(w2))
        w.add_tensor(f"{prefix}.convs2.{i}.bias", _np(b2))
        w.add_tensor(f"{prefix}.activations1.{i}.alpha",
                     _np(p[f"rb{key}_a1"][i]))
        w.add_tensor(f"{prefix}.activations2.{i}.alpha",
                     _np(p[f"rb{key}_a2"][i]))


# ---------------------------------------------------------------------------
# full model directory
# ---------------------------------------------------------------------------

def write_tiny_model_dir(base_dir, d_llm=64, seed=0) -> str:
    """Write the full 5-module tiny model directory; returns the LLM path."""
    base_dir = os.fspath(base_dir)
    os.makedirs(os.path.join(base_dir, "audio"), exist_ok=True)
    os.makedirs(os.path.join(base_dir, "vision"), exist_ok=True)
    os.makedirs(os.path.join(base_dir, "tts"), exist_ok=True)

    llm = os.path.join(base_dir, "llm.gguf")
    write_tiny_qwen3(llm, n_layers=2, d_model=d_llm, n_heads=4, n_kv_heads=2,
                     head_dim=16, d_ff=64, n_vocab=300,
                     qtype=GGMLType.F32, byte_tokenizer=True, seed=seed)
    write_tiny_apm(os.path.join(base_dir, "audio", "tiny-audio-apm.gguf"),
                   d_out=d_llm, seed=seed)
    write_tiny_vpm(os.path.join(base_dir, "vision", "tiny-vision-vpm.gguf"),
                   d_out=d_llm, seed=seed)
    write_tiny_tts(os.path.join(base_dir, "tts", "tiny-tts.gguf"),
                   d_llm=d_llm, seed=seed)
    write_tiny_token2wav(os.path.join(base_dir, "token2wav"), seed=seed)
    return llm
