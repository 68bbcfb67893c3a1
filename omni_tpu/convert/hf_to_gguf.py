"""Per-module HF -> GGUF converters.

Each converter maps HF parameter names to the GGUF tensor naming the
reference toolchain produces (and our loaders consume):
- LLM: llama.cpp naming (blk.N.attn_q.weight ...) as in convert_hf_to_gguf.py
- APM: whisper converter naming (encoder.blocks.N.attn.query.weight ...,
  reference tools/omni/convert/convert_apm.py)
- VPM: clip converter naming (v.blk.N.*, resampler.*, convert_vpm.py)
- TTS: converter naming (tts.layers.N.self_attn.*, convert_tts.py) with the
  weight-norm head_code merge (convert_tts.py:76-87)
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from ..core import GGMLType
from ..core.gguf import GGUFWriter


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().float().numpy()
    return np.asarray(v)


def merge_weight_norm(weight_g: np.ndarray, weight_v: np.ndarray) -> np.ndarray:
    """Materialize torch weight-norm: W = g * V / ||V||_row (dim=0 per
    torch's default for Linear: norm over input dim per output row)."""
    v = _np(weight_v).astype(np.float32)
    g = _np(weight_g).astype(np.float32).reshape(-1, *([1] * (v.ndim - 1)))
    norm = np.sqrt((v ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def _add(w: GGUFWriter, name: str, arr, qtype: GGMLType | None = None) -> None:
    x = _np(arr).astype(np.float32)
    if qtype in (None, GGMLType.F32) or x.ndim != 2 or x.shape[-1] % 256:
        w.add_tensor(name, x if x.ndim else x.reshape(1))
        return
    if qtype == GGMLType.F16:
        w.add_tensor(name, x.astype(np.float16))
        return
    from ..core import quants

    w.add_tensor(name, quants.quantize(x, qtype), qtype, logical_shape=x.shape)


def _emit_rope_scaling(w: GGUFWriter, arch: str, config: Mapping[str, Any],
                       rot_dim: int) -> dict[str, np.ndarray]:
    """Emit {arch}.rope.scaling.* KVs for HF rope_scaling configs and
    return any per-dim factor tensors to write (rope_freqs.weight for
    llama3, rope_factors_{short,long}.weight for longrope) — the same
    on-disk contract the reference converter produces
    (convert_hf_to_gguf.py:2410-2436 llama3 rope_factors,
    Phi3MiniModel longrope factors; gguf constants.py:166-175).

    The attention (mscale) factor is RESOLVED here per the HF rules
    (modeling_rope_utils.py: yarn get_mscale incl. mscale/mscale_all_dim;
    longrope sqrt(1+ln(f)/ln(orig))) so the engine reads one number."""
    import math

    rs = config.get("rope_scaling") or {}
    if not rs:
        return {}
    typ = str(rs.get("rope_type", rs.get("type", ""))).lower()
    extra: dict[str, np.ndarray] = {}
    if typ == "linear" and rs.get("factor"):
        w.add_kv(f"{arch}.rope.scaling.type", "linear")
        w.add_kv(f"{arch}.rope.scaling.factor", float(rs["factor"]))
    elif typ in ("yarn", "original") and rs.get("factor"):
        factor = float(rs["factor"])
        orig = int(rs.get("original_max_position_embeddings")
                   or config.get("max_position_embeddings", 4096))

        def _gm(s: float, m: float = 1.0) -> float:
            return 1.0 if s <= 1 else 0.1 * m * math.log(s) + 1.0

        attn = rs.get("attention_factor")
        if attn is None:
            ms, msa = rs.get("mscale"), rs.get("mscale_all_dim")
            attn = (_gm(factor, ms) / _gm(factor, msa) if ms and msa
                    else _gm(factor))
        w.add_kv(f"{arch}.rope.scaling.type", "yarn")
        w.add_kv(f"{arch}.rope.scaling.factor", factor)
        w.add_kv(f"{arch}.rope.scaling.original_context_length", orig)
        w.add_kv(f"{arch}.rope.scaling.attn_factor", float(attn))
        w.add_kv(f"{arch}.rope.scaling.yarn_beta_fast",
                 float(rs.get("beta_fast") or 32.0))
        w.add_kv(f"{arch}.rope.scaling.yarn_beta_slow",
                 float(rs.get("beta_slow") or 1.0))
    elif typ in ("longrope", "su"):
        # factor for the attention scale: phi3-family overrides via the
        # top-level original_max_position_embeddings ratio
        orig_top = config.get("original_max_position_embeddings")
        if orig_top:
            factor = (float(config["max_position_embeddings"])
                      / float(orig_top))
            orig = int(orig_top)
        else:
            factor = rs.get("factor")
            orig = int(rs.get("original_max_position_embeddings")
                       or config.get("max_position_embeddings", 4096))
        attn = rs.get("attention_factor")
        if attn is None:
            attn = (1.0 if not factor or factor <= 1.0
                    else math.sqrt(1 + math.log(factor) / math.log(orig)))
        w.add_kv(f"{arch}.rope.scaling.type", "longrope")
        w.add_kv(f"{arch}.rope.scaling.original_context_length", orig)
        w.add_kv(f"{arch}.rope.scaling.attn_factor", float(attn))
        extra["rope_factors_short.weight"] = np.asarray(
            rs["short_factor"], np.float32)
        extra["rope_factors_long.weight"] = np.asarray(
            rs["long_factor"], np.float32)
    elif typ == "llama3":
        base = float(config.get("rope_theta", 10000.0))
        factor = float(rs.get("factor", 8.0))
        lo_f = float(rs.get("low_freq_factor", 1.0))
        hi_f = float(rs.get("high_freq_factor", 4.0))
        old = float(rs.get("original_max_position_embeddings", 8192))
        inv = 1.0 / (base ** (np.arange(0, rot_dim, 2, dtype=np.float64)
                              / rot_dim))
        wavelen = 2 * math.pi / inv
        smooth = (old / wavelen - lo_f) / (hi_f - lo_f)
        divisors = np.where(
            wavelen < old / hi_f, 1.0,
            np.where(wavelen > old / lo_f, factor,
                     1.0 / ((1 - smooth) / factor + smooth)))
        extra["rope_freqs.weight"] = divisors.astype(np.float32)
    return extra


def _strip(state: Mapping[str, Any], *prefixes: str) -> dict[str, Any]:
    out = {}
    for k, v in state.items():
        for p in prefixes:
            if k.startswith(p):
                k = k[len(p):]
                break
        out[k] = v
    return out


# ---------------------------------------------------------------------------
# LLM (Qwen3/LLaMA family) — convert_hf_to_gguf.py counterpart
# ---------------------------------------------------------------------------

_LLM_LAYER_MAP = {
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.v_proj.weight": "attn_v.weight",
    # attention biases (qwen2/qwen2.5)
    "self_attn.q_proj.bias": "attn_q.bias",
    "self_attn.k_proj.bias": "attn_k.bias",
    "self_attn.v_proj.bias": "attn_v.bias",
    "self_attn.o_proj.weight": "attn_output.weight",
    "self_attn.o_proj.bias": "attn_output.bias",
    "self_attn.q_norm.weight": "attn_q_norm.weight",
    "self_attn.k_norm.weight": "attn_k_norm.weight",
    # chameleon per-head biased q/k LayerNorms
    "self_attn.q_norm.bias": "attn_q_norm.bias",
    "self_attn.k_norm.bias": "attn_k_norm.bias",
    "input_layernorm.weight": "attn_norm.weight",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
}

# Chameleon swin_norm: both block norms land in the POST slots
# (llm_build_chameleon hparams.swin_norm branches)
_CHAMELEON_SWIN_MAP = {
    **{k: v for k, v in _LLM_LAYER_MAP.items()
       if "layernorm" not in k},
    "post_attention_norm_tmp.weight": "post_attention_norm.weight",
    "post_ffw_norm_tmp.weight": "post_ffw_norm.weight",
}

# PhiMoE: biased TRUE LayerNorms around attention/MoE (HF Phimoe;
# the reference loads the biases too — llama-model.cpp LLM_ARCH_PHIMOE)
_PHIMOE_LAYER_MAP = {
    **_LLM_LAYER_MAP,
    "input_layernorm.bias": "attn_norm.bias",
    "post_attention_layernorm.bias": "ffn_norm.bias",
}

# Apertus: un-gated xIELU FFN, per-head q/k norms, its own norm names
_APERTUS_LAYER_MAP = {
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.o_proj.weight": "attn_output.weight",
    "self_attn.q_norm.weight": "attn_q_norm.weight",
    "self_attn.k_norm.weight": "attn_k_norm.weight",
    # chameleon per-head biased q/k LayerNorms
    "self_attn.q_norm.bias": "attn_q_norm.bias",
    "self_attn.k_norm.bias": "attn_k_norm.bias",
    "attention_layernorm.weight": "attn_norm.weight",
    "feedforward_layernorm.weight": "ffn_norm.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
}

# BitNet: llama layout + sub-norms inside both sublayers
_BITNET_LAYER_MAP = {
    **_LLM_LAYER_MAP,
    "self_attn.attn_sub_norm.weight": "attn_sub_norm.weight",
    "mlp.ffn_sub_norm.weight": "ffn_sub_norm.weight",
}

# StarCoder2: biased LayerNorms, biased projections, un-gated GELU FFN
# named c_fc/c_proj (reference convert_hf_to_gguf.py StarCoder2Model)
_STARCODER2_LAYER_MAP = {
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.q_proj.bias": "attn_q.bias",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.k_proj.bias": "attn_k.bias",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.v_proj.bias": "attn_v.bias",
    "self_attn.o_proj.weight": "attn_output.weight",
    "self_attn.o_proj.bias": "attn_output.bias",
    "input_layernorm.weight": "attn_norm.weight",
    "input_layernorm.bias": "attn_norm.bias",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "post_attention_layernorm.bias": "ffn_norm.bias",
    "mlp.c_fc.weight": "ffn_up.weight",
    "mlp.c_fc.bias": "ffn_up.bias",
    "mlp.c_proj.weight": "ffn_down.weight",
    "mlp.c_proj.bias": "ffn_down.bias",
}

# StableLM: llama-shaped projections + biased LayerNorms + partial rotary
_STABLELM_LAYER_MAP = {
    **_LLM_LAYER_MAP,
    "input_layernorm.bias": "attn_norm.bias",
    "post_attention_layernorm.bias": "ffn_norm.bias",
}

# Phi-2: parallel residual off ONE shared layernorm, partial rotary,
# biased everything, un-gated GELU fc1/fc2 (convert_hf_to_gguf Phi2Model)
_PHI2_LAYER_MAP = {
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.q_proj.bias": "attn_q.bias",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.k_proj.bias": "attn_k.bias",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.v_proj.bias": "attn_v.bias",
    "self_attn.dense.weight": "attn_output.weight",
    "self_attn.dense.bias": "attn_output.bias",
    "input_layernorm.weight": "attn_norm.weight",
    "input_layernorm.bias": "attn_norm.bias",
    "mlp.fc1.weight": "ffn_up.weight",
    "mlp.fc1.bias": "ffn_up.bias",
    "mlp.fc2.weight": "ffn_down.weight",
    "mlp.fc2.bias": "ffn_down.bias",
}

# Nemotron: biased LayerNorms, un-gated relu^2 FFN (llm_build_nemotron)
_NEMOTRON_LAYER_MAP = {
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.o_proj.weight": "attn_output.weight",
    "input_layernorm.weight": "attn_norm.weight",
    "input_layernorm.bias": "attn_norm.bias",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "post_attention_layernorm.bias": "ffn_norm.bias",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
}

# GLM-4: sandwich norms around both sublayers, disk-fused gate_up in
# ffn_up, interleaved (NORM) half-width rotary (llm_build_glm4)
_GLM4_LAYER_MAP = {
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.q_proj.bias": "attn_q.bias",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.k_proj.bias": "attn_k.bias",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.v_proj.bias": "attn_v.bias",
    "self_attn.o_proj.weight": "attn_output.weight",
    "input_layernorm.weight": "attn_norm.weight",
    "post_self_attn_layernorm.weight": "post_attention_norm.weight",
    "post_attention_layernorm.weight": "ffn_norm.weight",
    "post_mlp_layernorm.weight": "post_ffw_norm.weight",
    "mlp.gate_up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
}

# Gemma-2/3 (sandwich norms): HF post_attention_layernorm maps to the
# POST-attention norm (not ffn_norm), pre_feedforward takes the ffn_norm
# slot, post_feedforward becomes post_ffw_norm
# (reference convert_hf_to_gguf.py Gemma2Model/Gemma3Model)
_GEMMA_LAYER_MAP = {
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.o_proj.weight": "attn_output.weight",
    "self_attn.q_norm.weight": "attn_q_norm.weight",
    "self_attn.k_norm.weight": "attn_k_norm.weight",
    # chameleon per-head biased q/k LayerNorms
    "self_attn.q_norm.bias": "attn_q_norm.bias",
    "self_attn.k_norm.bias": "attn_k_norm.bias",
    "input_layernorm.weight": "attn_norm.weight",
    "post_attention_layernorm.weight": "post_attention_norm.weight",
    "pre_feedforward_layernorm.weight": "ffn_norm.weight",
    "post_feedforward_layernorm.weight": "post_ffw_norm.weight",
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
}


# OLMo-2 post-norm topology: no pre-norms; post_attention/post_feedforward
# norms apply to the sublayer outputs (reference convert_hf_to_gguf.py
# Olmo2Model); q/k norms span the full projection width
_OLMO2_LAYER_MAP = {
    "self_attn.q_proj.weight": "attn_q.weight",
    "self_attn.k_proj.weight": "attn_k.weight",
    "self_attn.v_proj.weight": "attn_v.weight",
    "self_attn.o_proj.weight": "attn_output.weight",
    "self_attn.q_norm.weight": "attn_q_norm.weight",
    "self_attn.k_norm.weight": "attn_k_norm.weight",
    # chameleon per-head biased q/k LayerNorms
    "self_attn.q_norm.bias": "attn_q_norm.bias",
    "self_attn.k_norm.bias": "attn_k_norm.bias",
    "post_attention_layernorm.weight": "post_attention_norm.weight",
    "post_feedforward_layernorm.weight": "post_ffw_norm.weight",
    "mlp.gate_proj.weight": "ffn_gate.weight",
    "mlp.up_proj.weight": "ffn_up.weight",
    "mlp.down_proj.weight": "ffn_down.weight",
}


def _permute_rope(w: np.ndarray, n_head: int) -> np.ndarray:
    """HF half-split rotary layout -> GGUF adjacent-pair (NORM) layout for
    llama-arch q/k projections (reference convert_hf_to_gguf.py
    LlamaModel.permute): per head, rows [r0..r_{d/2-1}, i0..i_{d/2-1}]
    interleave to [r0, i0, r1, i1, ...]."""
    w = _np(w)
    return (w.reshape(n_head, 2, w.shape[0] // n_head // 2, *w.shape[1:])
            .swapaxes(1, 2).reshape(w.shape))


def convert_llm(state: Mapping[str, Any], config: Mapping[str, Any],
                out_path: str, qtype: GGMLType = GGMLType.F16,
                arch: str = "qwen3",
                tokenizer_kv: Mapping[str, Any] | None = None) -> list[str]:
    """HF Qwen3/LLaMA-style state dict + config.json dict -> GGUF.

    llama/minicpm archs rope with adjacent pairs (NORM) on disk while HF
    checkpoints store the half-split layout, so their q/k projections are
    permuted during conversion — exactly like the reference converter."""
    if arch == "mamba":
        return _convert_mamba(state, config, out_path, qtype,
                              tokenizer_kv=tokenizer_kv)
    if arch == "mamba2":
        return _convert_mamba2(state, config, out_path, qtype,
                               tokenizer_kv=tokenizer_kv)
    if arch == "dbrx":
        return _convert_dbrx(state, config, out_path, qtype,
                             tokenizer_kv=tokenizer_kv)
    if arch in ("lfm2", "lfm2moe"):
        return _convert_lfm2(state, config, out_path, qtype,
                             tokenizer_kv=tokenizer_kv, arch=arch)
    if arch == "granitehybrid":
        return _convert_granite_hybrid(state, config, out_path, qtype,
                                       tokenizer_kv=tokenizer_kv)
    if arch == "falcon-h1":
        return _convert_falcon_h1(state, config, out_path, qtype,
                                  tokenizer_kv=tokenizer_kv)
    if arch == "bert":
        return _convert_bert(state, config, out_path, qtype,
                             tokenizer_kv=tokenizer_kv)
    if arch in ("nomic-bert", "nomic-bert-moe", "jina-bert-v2",
                "jina-bert-v3", "neo-bert"):
        return _convert_bert_variant(state, config, out_path, qtype,
                                     arch, tokenizer_kv=tokenizer_kv)
    if arch == "deci":
        return _convert_deci(state, config, out_path, qtype,
                             tokenizer_kv=tokenizer_kv)
    if arch == "openelm":
        return _convert_openelm(state, config, out_path, qtype,
                                tokenizer_kv=tokenizer_kv)
    if arch == "nemotron_h":
        return _convert_nemotron_h(state, config, out_path, qtype,
                                   tokenizer_kv=tokenizer_kv)
    if arch == "plamo2":
        return _convert_plamo2(state, config, out_path, qtype,
                               tokenizer_kv=tokenizer_kv)
    if arch == "gemma3n":
        return _convert_gemma3n(state, config, out_path, qtype,
                                tokenizer_kv=tokenizer_kv)
    if arch in ("rwkv7", "arwkv7"):
        return _convert_rwkv7(state, config, out_path, qtype,
                              tokenizer_kv=tokenizer_kv, arch=arch)
    if arch == "rwkv6":
        return _convert_rwkv6(state, config, out_path, qtype,
                              tokenizer_kv=tokenizer_kv)
    if arch == "rwkv6qwen2":
        return _convert_rwkv6qwen2(state, config, out_path, qtype,
                                   tokenizer_kv=tokenizer_kv)
    if arch == "gemma-embedding":
        return _convert_gemma_embedding(state, config, out_path, qtype,
                                        tokenizer_kv=tokenizer_kv)
    if arch == "jamba":
        return _convert_jamba(state, config, out_path, qtype,
                              tokenizer_kv=tokenizer_kv)
    if arch == "gpt2":
        return _convert_gpt2(state, config, out_path, qtype,
                             tokenizer_kv=tokenizer_kv)
    if arch == "starcoder":
        return _convert_starcoder(state, config, out_path, qtype,
                                  tokenizer_kv=tokenizer_kv)
    if arch == "bloom":
        return _convert_bloom(state, config, out_path, qtype,
                              tokenizer_kv=tokenizer_kv)
    if arch == "mpt":
        return _convert_mpt(state, config, out_path, qtype,
                            tokenizer_kv=tokenizer_kv)
    if arch == "gptneox":
        return _convert_gptneox(state, config, out_path, qtype,
                                tokenizer_kv=tokenizer_kv)
    if arch == "jais":
        return _convert_jais(state, config, out_path, qtype,
                             tokenizer_kv=tokenizer_kv)
    if arch == "codeshell":
        return _convert_codeshell(state, config, out_path, qtype,
                                  tokenizer_kv=tokenizer_kv)
    if arch == "gptj":
        return _convert_gptj(state, config, out_path, qtype,
                             tokenizer_kv=tokenizer_kv)
    if arch == "falcon":
        return _convert_falcon(state, config, out_path, qtype,
                               tokenizer_kv=tokenizer_kv)
    if arch in ("t5", "t5encoder"):
        return _convert_t5(state, config, out_path, qtype,
                           tokenizer_kv=tokenizer_kv)
    if arch == "exaone":
        # EXAONE-3 (reference ExaoneModel): transformer.h naming ->
        # llama-style; c_fc_0 = gate, c_fc_1 = up; NEOX rope (no permute)
        state = _strip(state, "transformer.")
        ren = {"wte.weight": "embed_tokens.weight",
               "ln_f.weight": "norm.weight"}
        out_state = {}
        for k, v in state.items():
            k = ren.get(k, k)
            k = (k.replace("h.", "layers.", 1)
                 .replace(".ln_1.", ".input_layernorm.")
                 .replace(".ln_2.", ".post_attention_layernorm.")
                 .replace(".attn.attention.out_proj.", ".self_attn.o_proj.")
                 .replace(".attn.attention.", ".self_attn.")
                 .replace(".mlp.c_fc_0.", ".mlp.gate_proj.")
                 .replace(".mlp.c_fc_1.", ".mlp.up_proj.")
                 .replace(".mlp.c_proj.", ".mlp.down_proj."))
            out_state[k] = v
        state = out_state
        # partial rotary: HF EXAONE configs use partial_rotary_factor
        # or rope_pct (reference ExaoneModel reads
        # ["partial_rotary_factor", "rope_pct"]); never clobber a real
        # value with the non-existent "rotary_factor" key
        config = {**config,
                  "rms_norm_eps": config.get("layer_norm_epsilon", 1e-5),
                  "partial_rotary_factor":
                      float(config.get("partial_rotary_factor",
                                       config.get("rope_pct", 1.0)))}
    if arch == "qwen":
        # Qwen v1 (reference QwenModel): fused biased c_attn [3d, d]
        # de-fuses into q/k/v; mlp.w2 = gate, mlp.w1 = up (that order);
        # RMS ln_1/ln_2; NEOX rope
        state = _strip(state, "transformer.")
        ren = {"wte.weight": "embed_tokens.weight",
               "ln_f.weight": "norm.weight"}
        out_state = {}
        for k, v in state.items():
            k = ren.get(k, k)
            k = (k.replace("h.", "layers.", 1)
                 .replace(".ln_1.", ".input_layernorm.")
                 .replace(".ln_2.", ".post_attention_layernorm.")
                 .replace(".attn.c_proj.", ".self_attn.o_proj.")
                 .replace(".mlp.w2.", ".mlp.gate_proj.")
                 .replace(".mlp.w1.", ".mlp.up_proj.")
                 .replace(".mlp.c_proj.", ".mlp.down_proj."))
            if k.endswith(".attn.c_attn.weight") or \
                    k.endswith(".attn.c_attn.bias"):
                arr = _np(v)
                d = arr.shape[0] // 3
                suffix = k.rsplit(".", 1)[1]
                base = k[: -len("attn.c_attn." + suffix)] + "self_attn."
                out_state[base + "q_proj." + suffix] = arr[:d]
                out_state[base + "k_proj." + suffix] = arr[d:2 * d]
                out_state[base + "v_proj." + suffix] = arr[2 * d:]
            else:
                out_state[k] = v
        state = out_state
        # HF Qwen-v1 sets intermediate_size to 2x the true w1/w2 width
        # (QWenMLP projects to intermediate_size // 2; the reference
        # builds ffn tensors at n_ff/2) — halve so d_ff matches the
        # actual gate/up projection width
        config = {**config,
                  "intermediate_size": int(config["intermediate_size"]) // 2,
                  "rms_norm_eps": config.get("layer_norm_epsilon", 1e-6),
                  "rope_theta": config.get("rotary_emb_base", 10000.0)}
    if arch == "plamo":
        # PLaMo (reference PlamoModel + llm_build_plamo): one shared
        # pre-norm feeds attention AND ffn (parallel residual), NeoX
        # full-head rope; HF orders q heads q-per-group-major while the
        # GGUF GQA contract is kv-group-major — shuffle q rows and the
        # matching o columns (PlamoModel.shuffle_attn_{q,output}_weight)
        state = {k.replace("layers.layers.", "layers.", 1): v
                 for k, v in state.items()}
        n_h = int(config["num_attention_heads"])
        n_k = int(config.get("num_key_value_heads") or n_h)
        hd = int(config["hidden_size"]) // n_h
        qpk = n_h // n_k
        out_state = {}
        for k, v in state.items():
            if k.endswith("self_attn.q_proj.weight") and qpk > 1:
                a = _np(v)
                d = a.shape[1]
                a = a.reshape(qpk, n_k, hd, d).swapaxes(0, 1)
                out_state[k] = a.reshape(n_h * hd, d)
            elif k.endswith("self_attn.o_proj.weight") and qpk > 1:
                a = _np(v)
                d = a.shape[0]
                a = a.reshape(d, qpk, n_k, hd).swapaxes(1, 2)
                out_state[k] = a.reshape(d, n_h * hd)
            elif k.endswith(".norm.weight") and ".layers." in k:
                out_state[k.replace(".norm.weight",
                                    ".input_layernorm.weight")] = v
            else:
                out_state[k] = v
        state = out_state
    if arch == "refact":
        # Refact (reference RefactModel + llm_build_refact): MQA
        # (head_count_kv=1), ALiBi (f_max_alibi_bias=8, no rope), RMS
        # norms, SwiGLU with disk-split gate_up; ff_dim follows the
        # llama-style 2/3*4d rounding
        state = _strip(state, "transformer.")
        d = int(config["n_embd"])
        n_h = int(config["n_head"])
        hd = d // n_h
        ff = 256 * ((int(2 * 4 * d / 3) + 255) // 256)
        ren = {"wte.weight": "embed_tokens.weight",
               "ln_f.weight": "norm.weight"}
        out_state = {}
        for k, v in state.items():
            k = ren.get(k, k)
            k = k.replace("h.", "layers.", 1)
            if k.endswith(".attn.kv.weight"):
                a = _np(v)
                base = k[: -len("attn.kv.weight")] + "self_attn."
                out_state[base + "k_proj.weight"] = a[:hd]
                out_state[base + "v_proj.weight"] = a[hd:]
            elif k.endswith(".mlp.gate_up_proj.weight"):
                a = _np(v)
                base = k[: -len("gate_up_proj.weight")]
                out_state[base + "gate_proj.weight"] = a[:ff]
                out_state[base + "up_proj.weight"] = a[ff:]
            else:
                k = (k.replace(".ln_1.", ".input_layernorm.")
                     .replace(".ln_2.", ".post_attention_layernorm.")
                     .replace(".attn.q.", ".self_attn.q_proj.")
                     .replace(".attn.c_proj.", ".self_attn.o_proj.")
                     .replace(".mlp.linear_3.", ".mlp.down_proj."))
                out_state[k] = v
        state = out_state
        config = {**config,
                  "hidden_size": d, "num_attention_heads": n_h,
                  "num_key_value_heads": 1, "intermediate_size": ff,
                  "num_hidden_layers": int(config["n_layer"]),
                  "vocab_size": int(config["vocab_size"]),
                  "max_position_embeddings":
                      int(config.get("n_positions", 4096)),
                  "rms_norm_eps": config.get("layer_norm_epsilon", 1e-6),
                  "tie_word_embeddings": False}
    if arch == "chatglm":
        # ChatGLM-2/3 / GLM-4-9b legacy (reference ChatGLMModel +
        # llm_build_chatglm): RMS norms, NORM rope over HALF the head
        # dims (partial_rotary_factor 0.5), fused biased qkv de-fused,
        # SwiGLU with disk-fused gate|up (dense_h_to_4h)
        state = _strip(state, "transformer.")
        n_h = int(config.get("num_attention_heads", config.get("n_head")))
        n_k = int(config.get("multi_query_group_num",
                             config.get("num_key_value_heads", n_h)))
        d = int(config.get("hidden_size", config.get("n_embed")))
        hd = int(config.get("attention_dim", d // n_h))
        ren = {"embedding.word_embeddings.weight": "embed_tokens.weight",
               "encoder.final_layernorm.weight": "norm.weight",
               "output_layer.weight": "lm_head.weight"}
        out_state = {}
        for k, v in state.items():
            if k.endswith("rotary_pos_emb.inv_freq"):
                continue
            k = ren.get(k, k)
            k = k.replace("encoder.layers.", "layers.", 1)
            if ".self_attention.query_key_value." in k:
                a = _np(v)
                suffix = k.rsplit(".", 1)[1]
                base = (k[: k.index("self_attention.")]
                        + "self_attn.")
                qd, kvd = n_h * hd, n_k * hd
                out_state[base + "q_proj." + suffix] = a[:qd]
                out_state[base + "k_proj." + suffix] = a[qd:qd + kvd]
                out_state[base + "v_proj." + suffix] = a[qd + kvd:]
            else:
                k = (k.replace(".self_attention.dense.",
                               ".self_attn.o_proj.")
                     .replace(".mlp.dense_h_to_4h.", ".mlp.gate_up_proj.")
                     .replace(".mlp.dense_4h_to_h.", ".mlp.down_proj."))
                out_state[k] = v
        state = out_state
        config = {**config,
                  "hidden_size": d, "num_attention_heads": n_h,
                  "num_key_value_heads": n_k,
                  "num_hidden_layers": int(config.get(
                      "num_layers", config.get("num_hidden_layers"))),
                  "intermediate_size": int(config.get(
                      "ffn_hidden_size",
                      config.get("intermediate_size", 4 * d))),
                  "max_position_embeddings":
                      int(config.get("seq_length", 4096)),
                  "rms_norm_eps": config.get("layernorm_epsilon", 1e-5),
                  "rope_theta": 10000.0 * float(config.get("rope_ratio",
                                                           1.0)),
                  "tie_word_embeddings": False}
    if arch == "llada":
        # LLaDA diffusion LM (reference LLaDAModel + llm_build_llada):
        # llama graph with NON-CAUSAL attention; HF uses OLMo-style
        # names (model.transformer.blocks.N.*) and d_model config keys
        state = {k.replace("model.transformer.", "model.", 1)
                 : v for k, v in state.items()}
        ren = {"wte.weight": "embed_tokens.weight",
               "ln_f.weight": "norm.weight",
               "ff_out.weight": "lm_head.weight"}
        out_state = {}
        for k, v in state.items():
            if k.startswith("model.") and "." in k[6:]:
                tail = k[6:]
                tail = ren.get(tail, tail)
                if tail.startswith("blocks."):
                    tail = ("layers." + tail[len("blocks."):])
                    tail = (tail
                            .replace(".attn_norm.", ".input_layernorm.")
                            .replace(".attn_out.", ".self_attn.o_proj.")
                            .replace(".q_proj.", ".self_attn.q_proj.")
                            .replace(".k_proj.", ".self_attn.k_proj.")
                            .replace(".v_proj.", ".self_attn.v_proj.")
                            .replace(".ff_norm.",
                                     ".post_attention_layernorm.")
                            .replace(".ff_proj.", ".mlp.gate_proj.")
                            .replace(".up_proj.", ".mlp.up_proj.")
                            .replace(".ff_out.", ".mlp.down_proj."))
                out_state["model." + tail] = v
            else:
                out_state[k] = v
        state = out_state
        config = {**config,
                  "hidden_size": int(config.get("d_model")
                                     or config.get("hidden_size")),
                  "num_attention_heads": int(config.get("n_heads")
                                             or config.get(
                                                 "num_attention_heads")),
                  "num_key_value_heads": int(
                      config.get("n_kv_heads")
                      or config.get("num_key_value_heads")
                      or config.get("n_heads")
                      or config.get("num_attention_heads")),
                  "num_hidden_layers": int(config.get("n_layers")
                                           or config.get(
                                               "num_hidden_layers")),
                  "intermediate_size": int(config.get("mlp_hidden_size")
                                           or config.get(
                                               "intermediate_size")),
                  "max_position_embeddings": int(
                      config.get("max_sequence_length", 4096)),
                  "rms_norm_eps": float(config.get("rms_norm_eps", 1e-5)),
                  "tie_word_embeddings":
                      bool(config.get("weight_tying", False))}
    if arch == "chameleon":
        # Chameleon (reference ChameleonModel + llm_build_chameleon):
        # NORM-rope llama graph + per-head biased LN q/k norms whose
        # weights take head 0, re-interleave the half-split layout, and
        # broadcast to every head (ChameleonModel._reverse_hf_permute);
        # swin_norm moves both block norms AFTER their sublayers
        n_h_ = int(config["num_attention_heads"])
        n_k_ = int(config.get("num_key_value_heads", n_h_))
        hd_ = int(config["hidden_size"]) // n_h_
        out_state = {}
        for k, v in state.items():
            if k.startswith("model.vqmodel"):
                continue  # image tokenizer: not served yet
            if k.endswith(("q_norm.weight", "q_norm.bias",
                           "k_norm.weight", "k_norm.bias")):
                nh = n_h_ if ".q_norm." in k else n_k_
                a = _np(v).reshape(-1, hd_)[0]
                a = a.reshape(2, hd_ // 2).T.reshape(-1)
                out_state[k] = np.tile(a, nh)
            else:
                out_state[k] = v
        state = out_state
        if config.get("swin_norm"):
            # post-norm topology: input_layernorm normalizes the ATTN
            # OUTPUT, post_attention_layernorm the FFN output
            ren = {".input_layernorm.": ".post_attention_norm_tmp.",
                   ".post_attention_layernorm.": ".post_ffw_norm_tmp."}
            out_state = {}
            for k, v in state.items():
                for a, bt in ren.items():
                    k = k.replace(a, bt)
                out_state[k] = v
            state = out_state
    if arch == "qwen2vl":
        # Qwen2-VL text stack = qwen2 (biased qkv, NeoX) + M-RoPE
        # sections (reference Qwen2VLModel set_gguf_parameters:
        # add_rope_dimension_sections from rope_scaling.mrope_section;
        # llm_build_qwen2vl ggml_rope_multi). The vision tower converts
        # separately (convert_qwen2vl_vision -> mmproj GGUF)
        state = {k.replace("model.language_model.", "model.", 1): v
                 for k, v in state.items()
                 if not (k.startswith("model.visual.")
                         or k.startswith("visual."))}
    if arch == "arctic":
        # Arctic (reference ArcticModel + llm_build_arctic): a dense
        # residual_mlp runs from ffn_norm(ffn_inp) IN PARALLEL with the
        # MoE on ffn_norm_exps(layer input); w1=gate w3=up w2=down.
        # HF residual_layernorm feeds the dense branch (-> the
        # post_attention_layernorm slot = GGUF ffn_norm) and HF
        # post_attention_layernorm feeds the MoE (-> ffn_norm_exps)
        out_state = {}
        for k, v in state.items():
            k = (k.replace(".post_attention_layernorm.",
                           ".moe_norm_exps.")
                 .replace(".residual_layernorm.",
                          ".post_attention_layernorm.")
                 .replace(".residual_mlp.w1.", ".mlp.gate_proj.")
                 .replace(".residual_mlp.w3.", ".mlp.up_proj.")
                 .replace(".residual_mlp.w2.", ".mlp.down_proj."))
            out_state[k] = v
        state = out_state
        config = {**config,
                  "num_experts": config.get("num_local_experts")
                  or config.get("num_experts")}
    if arch == "grok":
        # Grok (reference GrokModel + llm_build_grok): sandwich norms
        # (pre/post attn + pre/post moe) -> the gemma-style map slots;
        # experts arrive in mixtral block_sparse_moe naming (w1/w2/w3)
        out_state = {}
        for k, v in state.items():
            k = (k.replace(".pre_attn_norm.", ".input_layernorm.")
                 .replace(".post_attn_norm.",
                          ".post_attention_layernorm.")
                 .replace(".pre_moe_norm.", ".pre_feedforward_layernorm.")
                 .replace(".post_moe_norm.",
                          ".post_feedforward_layernorm."))
            out_state[k] = v
        state = out_state
        config = {**config,
                  "num_experts": config.get("num_local_experts")
                  or config.get("num_experts")}
    if arch == "smallthinker":
        # SmallThinker (reference SmallThinkerModel +
        # llm_build_smallthinker): router reads the LAYER INPUT, ReGLU
        # experts, optional 4:1 SWA with NoPE on the dense layers
        out_state = {}
        for k, v in state.items():
            k = (k.replace(".block_sparse_moe.primary_router.",
                           ".mlp.gate.")
                 .replace(".block_sparse_moe.experts.", ".mlp.experts."))
            if ".mlp.experts." in k:
                k = (k.replace(".gate.weight", ".gate_proj.weight")
                     .replace(".up.weight", ".up_proj.weight")
                     .replace(".down.weight", ".down_proj.weight"))
            out_state[k] = v
        state = out_state
        n_e = (config.get("num_experts")
               or config.get("moe_num_primary_experts"))
        config = {**config,
                  "num_experts": n_e,
                  "num_experts_per_tok":
                      (config.get("num_experts_per_tok")
                       or config.get("moe_num_active_primary_experts")),
                  "intermediate_size":
                      (config.get("moe_ffn_hidden_size")
                       or config.get("intermediate_size"))}
    if arch in ("deepseek", "bailingmoe"):
        # DeepSeek-V1 / BailingMoe (llm_build_{deepseek,bailingmoe}):
        # llama attention (NORM rope; bailing ships fused
        # query_key_value) + softmax-gated MoE with shared experts and
        # leading dense layers
        state = {k.replace(".mlp.shared_experts.", ".mlp.shared_expert.")
                 : v for k, v in state.items()}
        if arch == "bailingmoe":
            state = {k.replace("model.word_embeddings.",
                               "model.embed_tokens."): v
                     for k, v in state.items()}
            n_h = int(config["num_attention_heads"])
            n_k = int(config.get("num_key_value_heads", n_h))
            hd = int(config.get("head_dim")
                     or config["hidden_size"] // n_h)
            out_state = {}
            for k, v in state.items():
                if k.endswith("attention.query_key_value.weight"):
                    a = _np(v)
                    base = k[: -len("attention.query_key_value.weight")]
                    out_state[base + "self_attn.q_proj.weight"] = \
                        a[: n_h * hd]
                    out_state[base + "self_attn.k_proj.weight"] = \
                        a[n_h * hd: (n_h + n_k) * hd]
                    out_state[base + "self_attn.v_proj.weight"] = \
                        a[(n_h + n_k) * hd:]
                elif k.endswith("attention.dense.weight"):
                    out_state[k.replace("attention.dense.",
                                        "self_attn.o_proj.")] = v
                else:
                    out_state[k] = v
            state = out_state
            if config.get("norm_head"):
                # bailing norm_head: L2-normalize lm_head columns
                # (reference BailingMoeModel modify_tensors)
                hw = _np(state["lm_head.weight"]).astype(np.float32)
                norm = np.sqrt((hw ** 2).sum(0, keepdims=True)) + 1e-7
                state = dict(state)
                state["lm_head.weight"] = hw / norm
        config = {**config,
                  "num_experts": (config.get("n_routed_experts")
                                  or config.get("num_experts"))}
    state = _strip(state, "model.")
    if arch == "baichuan":
        # W_pack fused [3d, d] -> q/k/v (reference BaichuanModel
        # _reverse_hf_permute_part); the NORM-rope q/k permute then
        # applies through the standard permute path below
        out_state = {}
        for k, v in state.items():
            if k.endswith("self_attn.W_pack.weight"):
                arr = _np(v)
                d = arr.shape[0] // 3
                base = k[: -len("W_pack.weight")]
                out_state[base + "q_proj.weight"] = arr[:d]
                out_state[base + "k_proj.weight"] = arr[d:2 * d]
                out_state[base + "v_proj.weight"] = arr[2 * d:]
            else:
                out_state[k] = v
        state = out_state
    if arch == "internlm2":
        # InternLM2 (reference InternLM2Model): grouped fused wqkv
        # [(q_per_kv + 2) * kv_heads * head_dim, d] de-fuses into q/k/v;
        # its own tensor names -> llama-style; lm head is "output"
        n_h = int(config["num_attention_heads"])
        n_k = int(config.get("num_key_value_heads", n_h))
        hd = int(config["hidden_size"]) // n_h
        qpk = n_h // n_k
        out_state = {}
        for k, v in state.items():
            if k.endswith("attention.wqkv.weight"):
                arr = _np(v).reshape(n_k, qpk + 2, hd, -1)
                base = k[: -len("attention.wqkv.weight")] + "self_attn."
                out_state[base + "q_proj.weight"] = \
                    arr[:, :qpk].reshape(n_h * hd, -1)
                out_state[base + "k_proj.weight"] = \
                    arr[:, -2].reshape(n_k * hd, -1)
                out_state[base + "v_proj.weight"] = \
                    arr[:, -1].reshape(n_k * hd, -1)
            else:
                k = (k.replace("tok_embeddings.weight",
                               "embed_tokens.weight")
                     .replace(".attention_norm.", ".input_layernorm.")
                     .replace(".attention.wo.", ".self_attn.o_proj.")
                     .replace(".ffn_norm.", ".post_attention_layernorm.")
                     .replace(".feed_forward.w1.", ".mlp.gate_proj.")
                     .replace(".feed_forward.w3.", ".mlp.up_proj.")
                     .replace(".feed_forward.w2.", ".mlp.down_proj."))
                if k == "output.weight":
                    k = "lm_head.weight"
                out_state[k] = v
        state = out_state
    if arch == "granitemoe":
        # GraniteMoE fuses each expert's gate|up into one 3-D
        # input_linear [E, 2F, d] (GraniteMoeParallelExperts; reference
        # GraniteMoeModel splits it the same way)
        out_state = {}
        for k, v in state.items():
            if k.endswith("block_sparse_moe.input_linear.weight"):
                base = k.rsplit("block_sparse_moe.", 1)[0]
                arr = _np(v)
                f = arr.shape[1] // 2
                for e in range(arr.shape[0]):
                    out_state[f"{base}mlp.experts.{e}.gate_proj.weight"] = \
                        arr[e, :f]
                    out_state[f"{base}mlp.experts.{e}.up_proj.weight"] = \
                        arr[e, f:]
            elif k.endswith("block_sparse_moe.output_linear.weight"):
                base = k.rsplit("block_sparse_moe.", 1)[0]
                arr = _np(v)
                for e in range(arr.shape[0]):
                    out_state[f"{base}mlp.experts.{e}.down_proj.weight"] = \
                        arr[e]
            elif k.endswith("block_sparse_moe.router.layer.weight"):
                out_state[k.replace("block_sparse_moe.router.layer.",
                                    "mlp.gate.")] = v
            else:
                out_state[k] = v
        state = out_state
        config = {**config,
                  "num_experts": config.get("num_experts")
                  or config.get("num_local_experts")}
    if arch == "llama4":
        # Llama4 (reference Llama4Model): feed_forward.* naming -> mlp.*;
        # fused per-layer expert tensors gate_up_proj [E, d, 2F] /
        # down_proj [E, F, d] split+transpose into the canonical
        # per-expert layout; intermediate_size is the MoE width and
        # intermediate_size_mlp the dense one — swapped like the reference
        out_state = {}
        for k, v in state.items():
            if "feed_forward.experts.gate_up_proj" in k:
                base = k.rsplit("experts.gate_up_proj", 1)[0]
                arr = _np(v)
                f = arr.shape[-1] // 2
                for e in range(arr.shape[0]):
                    out_state[f"{base}experts.{e}.gate_proj.weight"] = \
                        arr[e, :, :f].T
                    out_state[f"{base}experts.{e}.up_proj.weight"] = \
                        arr[e, :, f:].T
            elif "feed_forward.experts.down_proj" in k:
                base = k.rsplit("experts.down_proj", 1)[0]
                arr = _np(v)
                for e in range(arr.shape[0]):
                    out_state[f"{base}experts.{e}.down_proj.weight"] = \
                        arr[e].T
            elif "feed_forward.router.weight" in k:
                out_state[k.replace("feed_forward.router.",
                                    "feed_forward.gate.")] = v
            else:
                out_state[k] = v
        state = {k.replace("feed_forward.", "mlp."): v
                 for k, v in out_state.items()}
        config = {**config,
                  "num_experts": config.get("num_local_experts"),
                  "intermediate_size": config.get("intermediate_size_mlp"),
                  "expert_intermediate_size": config.get("intermediate_size")}
    if arch in ("hunyuan-moe", "hunyuan-dense"):
        # HunYuan naming: query/key_layernorm (post-rope norms),
        # mlp.gate.wg router, shared_mlp shared expert
        ren = {".self_attn.query_layernorm.": ".self_attn.q_norm.",
               ".self_attn.key_layernorm.": ".self_attn.k_norm.",
               ".mlp.gate.wg.": ".mlp.gate.",
               ".mlp.shared_mlp.": ".mlp.shared_expert."}
        out_state = {}
        for k, v in state.items():
            for a, bt in ren.items():
                k = k.replace(a, bt)
            out_state[k] = v
        state = out_state
        config = {**config,
                  "num_experts_per_tok": (config.get("moe_topk")
                                          or config.get("num_experts_per_tok"))}
    if arch in ("glm4moe", "dots1", "ernie4_5-moe"):
        # deepseek-style MoE naming: shared_experts (plural) -> the
        # canonical shared_expert; per-config expert-count aliases
        state = {k.replace(".mlp.shared_experts.", ".mlp.shared_expert."): v
                 for k, v in state.items()}
        config = {**config,
                  "num_experts": (config.get("n_routed_experts")
                                  or config.get("moe_num_experts")
                                  or config.get("num_experts")),
                  "num_experts_per_tok": (config.get("num_experts_per_tok")
                                          or config.get("moe_k"))}
    if any(k.startswith("layers.0.block_sparse_moe.") for k in state):
        # Mixtral naming -> the canonical mlp.experts layout (w1=gate,
        # w3=up, w2=down; reference convert_hf_to_gguf.py MixtralModel)
        ren = {"block_sparse_moe.gate.": "mlp.gate.",
               ".w1.": ".gate_proj.", ".w3.": ".up_proj.",
               ".w2.": ".down_proj."}
        out_state = {}
        for k, v in state.items():
            k = k.replace("block_sparse_moe.experts.", "mlp.experts.")
            for a, b in ren.items():
                k = k.replace(a, b)
            out_state[k] = v
        state = out_state
        config = {**config,
                  "num_experts": config.get("num_experts")
                  or config.get("num_local_experts")}
    w = GGUFWriter(out_path)
    n_heads = int(config["num_attention_heads"])
    d_model = int(config["hidden_size"])
    head_dim = int(config.get("head_dim") or d_model // n_heads)
    ds2 = arch == "deepseek2"
    mla_ref = arch in ("plm", "minicpm3")
    if ds2:
        # MLA converts into MQA with one latent head: cache key =
        # kv_lora_rank + qk_rope_head_dim, value = kv_lora_rank
        # (reference convert_hf_to_gguf.py DeepseekV2Model)
        config = {**config, "num_key_value_heads": 1}
        head_dim = (int(config["kv_lora_rank"])
                    + int(config["qk_rope_head_dim"]))
    if mla_ref:
        # plm/minicpm3 follow the reference GGUF convention instead:
        # key_length = qk_nope + qk_rope (PLMModel/MiniCPM3Model
        # add_key_length); the engine derives the latent cache geometry
        # from kv_lora_rank + rope.dimension_count at load
        head_dim = (int(config["qk_nope_head_dim"])
                    + int(config["qk_rope_head_dim"]))
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", int(config["num_hidden_layers"]))
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length", int(config["intermediate_size"]))
    w.add_kv(f"{arch}.attention.head_count", n_heads)
    w.add_kv(f"{arch}.attention.head_count_kv",
             int(config.get("num_key_value_heads", n_heads)))
    w.add_kv(f"{arch}.attention.key_length", head_dim)
    w.add_kv(f"{arch}.attention.value_length",
             int(config["kv_lora_rank"]) if ds2 else
             int(config["v_head_dim"]) if mla_ref else head_dim)
    if mla_ref:
        w.add_kv(f"{arch}.attention.kv_lora_rank",
                 int(config["kv_lora_rank"]))
        if config.get("q_lora_rank"):
            w.add_kv(f"{arch}.attention.q_lora_rank",
                     int(config["q_lora_rank"]))
        w.add_kv(f"{arch}.rope.dimension_count",
                 int(config["qk_rope_head_dim"]))
    if ds2:
        rope = int(config["qk_rope_head_dim"])
        nope = int(config["qk_nope_head_dim"])
        w.add_kv(f"{arch}.attention.kv_lora_rank",
                 int(config["kv_lora_rank"]))
        if config.get("q_lora_rank"):
            w.add_kv(f"{arch}.attention.q_lora_rank",
                     int(config["q_lora_rank"]))
        w.add_kv(f"{arch}.attention.key_length_mla", nope + rope)
        w.add_kv(f"{arch}.attention.value_length_mla",
                 int(config["v_head_dim"]))
        w.add_kv(f"{arch}.rope.dimension_count", rope)
        w.add_kv(f"{arch}.leading_dense_block_count",
                 int(config.get("first_k_dense_replace", 0)))
        if config.get("n_routed_experts"):
            w.add_kv(f"{arch}.expert_count",
                     int(config["n_routed_experts"]))
            w.add_kv(f"{arch}.expert_used_count",
                     int(config.get("num_experts_per_tok", 2)))
            w.add_kv(f"{arch}.expert_feed_forward_length",
                     int(config["moe_intermediate_size"]))
            w.add_kv(f"{arch}.expert_shared_count",
                     int(config.get("n_shared_experts", 0)))
            w.add_kv(f"{arch}.expert_weights_scale",
                     float(config.get("routed_scaling_factor", 1.0)))
            w.add_kv(f"{arch}.expert_weights_norm",
                     bool(config.get("norm_topk_prob", False)))
            sigmoid_gate = (config.get("scoring_func") == "sigmoid"
                            or config.get("model_type") == "deepseek_v3")
            w.add_kv(f"{arch}.expert_gating_func", 2 if sigmoid_gate else 1)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             float(config.get("rms_norm_eps", 1e-6)))
    w.add_kv(f"{arch}.rope.freq_base", float(config.get("rope_theta", 10000.0)))
    w.add_kv(f"{arch}.context_length",
             int(config.get("max_position_embeddings", 4096)))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    rope_extra = _emit_rope_scaling(
        w, arch, config,
        rot_dim=(int(config["qk_rope_head_dim"]) if (ds2 or mla_ref) else
                 int(head_dim
                     * float(config.get("partial_rotary_factor", 1.0)))))
    if arch == "gpt-oss":
        config = {**config, "num_experts": config.get("num_experts")
                  or config.get("num_local_experts")}
        if config.get("sliding_window"):
            w.add_kv(f"{arch}.attention.sliding_window",
                     int(config["sliding_window"]))
    if arch == "llama4":
        w.add_kv(f"{arch}.interleave_moe_layer_step",
                 int(config.get("interleave_moe_layer_step", 1)))
        if config.get("expert_intermediate_size"):
            w.add_kv(f"{arch}.expert_feed_forward_length",
                     int(config["expert_intermediate_size"]))
        lt = config.get("layer_types") or []
        if lt and all(t == "full_attention" for t in lt):
            w.add_kv(f"{arch}.attention.sliding_window", 0)  # MobileLLM
        else:
            w.add_kv(f"{arch}.attention.sliding_window",
                     int(config.get("attention_chunk_size", 8192)))
        w.add_kv(f"{arch}.attn_temperature_tuning",
                 bool(config.get("attn_temperature_tuning", True)))
        w.add_kv(f"{arch}.attention.temperature_scale",
                 float(config.get("attn_scale", 0.1)))
        w.add_kv(f"{arch}.attention.temperature_floor_scale",
                 int(config.get("floor_scale", 8192)))
        w.add_kv(f"{arch}.attention.use_kq_norm",
                 bool(config.get("use_qk_norm", True)))
    if config.get("num_experts"):
        w.add_kv(f"{arch}.expert_count", int(config["num_experts"]))
        w.add_kv(f"{arch}.expert_used_count",
                 int(config.get("num_experts_per_tok", 2)))
    if arch == "apertus":
        # per-layer xIELU scalars -> unprefixed KV lists (reference
        # ApertusModel add_xielu_* / LLM_KV_XIELU_*)
        state = dict(state)
        n_l = int(config["num_hidden_layers"])
        for nm, key in (("alpha_n", "xielu.alpha_n"),
                        ("alpha_p", "xielu.alpha_p"),
                        ("beta", "xielu.beta"), ("eps", "xielu.eps")):
            vals = [float(_np(state.pop(f"layers.{i}.mlp.act_fn.{nm}")))
                    for i in range(n_l)]
            w.add_kv(key, vals)
    if arch == "bitnet" and config.get("hidden_act"):
        w.add_kv(f"{arch}.activation", str(config["hidden_act"]))
    if arch == "exaone4" and config.get("sliding_window"):
        lt = config.get("layer_types") or []
        if any(t == "sliding_attention" for t in lt):
            w.add_kv(f"{arch}.attention.sliding_window",
                     int(config["sliding_window"]))
    if arch == "starcoder2":
        w.add_kv(f"{arch}.attention.layer_norm_epsilon",
                 float(config.get("norm_epsilon", 1e-5)))
    if arch == "orion":
        # Orion: true biased LayerNorms keyed by rms_norm_eps in the HF
        # config (OrionModel add_layer_norm_eps)
        w.add_kv(f"{arch}.attention.layer_norm_epsilon",
                 float(config.get("rms_norm_eps", 1e-5)))
    if arch == "baichuan" and int(config["num_hidden_layers"]) == 40:
        # Baichuan-13B (40 layers) is ALiBi with NO rope — the reference
        # sets f_max_alibi_bias=8 for LLM_TYPE_13B and skips rope
        # (llama-model.cpp:779, llm_build_baichuan); only the 7B
        # variants rope
        w.add_kv(f"{arch}.attention.max_alibi_bias", 8.0)
    if arch == "exaone" and float(config.get("partial_rotary_factor",
                                             1.0)) != 1.0:
        w.add_kv(f"{arch}.rope.dimension_count",
                 int(float(config["partial_rotary_factor"]) * head_dim))
    if arch == "phimoe":
        # HF Phimoe's LayerNorms use config.rms_norm_eps as their eps;
        # jitter width drives the sparsemixer masked softmax
        w.add_kv(f"{arch}.attention.layer_norm_epsilon",
                 float(config.get("rms_norm_eps", 1e-5)))
        w.add_kv(f"{arch}.expert_jitter_eps",
                 float(config.get("router_jitter_noise", 0.01)))
    if arch in ("phi3", "phimoe") and config.get("sliding_window"):
        # phi3-family windows every layer (reference llm_build_phi3
        # iswa=true path with all-SWA pattern)
        w.add_kv(f"{arch}.attention.sliding_window",
                 int(config["sliding_window"]))
    if arch == "refact":
        # Refact is ALiBi (reference llama-model.cpp refact hparams:
        # f_max_alibi_bias = 8, no rope)
        w.add_kv(f"{arch}.attention.max_alibi_bias", 8.0)
    if arch == "chatglm":
        # NORM rope over half the head dims (ChatGLMModel
        # set_gguf_parameters: rope_dim * partial_rotary_factor=0.5)
        w.add_kv(f"{arch}.rope.dimension_count",
                 int(head_dim * float(config.get("partial_rotary_factor",
                                                 0.5))))
    if arch in ("llada", "dream", "llada_moe"):
        # diffusion LMs attend bidirectionally; the mask token id and
        # (llada) shifted-logits convention drive examples/diffusion.py
        # (reference {LLaDA,Dream,LLaDAMoE}Model set_gguf_parameters +
        # examples/diffusion/diffusion-cli.cpp)
        w.add_kv(f"{arch}.attention.causal", False)
        if config.get("mask_token_id") is not None:
            w.add_kv("tokenizer.ggml.mask_token_id",
                     int(config["mask_token_id"]))
        elif arch == "llada_moe":
            w.add_kv("tokenizer.ggml.mask_token_id", 156895)
        w.add_kv(f"{arch}.diffusion.shift_logits", arch == "llada")
    if arch == "llada_moe":
        # qwen3moe-shaped MoE: per-head q/k norms, softmax routing
        # WITHOUT top-k renorm (llm_build_llada_moe norm_w=false)
        if config.get("expert_intermediate_size"):
            w.add_kv(f"{arch}.expert_feed_forward_length",
                     int(config["expert_intermediate_size"]))
        w.add_kv(f"{arch}.expert_weights_norm", False)
        w.add_kv(f"{arch}.expert_gating_func", 1)
    if arch == "grovemoe":
        # reference GroveMoeModel: chunk ff hardcoded to head_dim or 128,
        # experts_per_group=2, group scale=0.05 (modeling_grove_moe.py)
        w.add_kv(f"{arch}.expert_feed_forward_length",
                 int(config["moe_intermediate_size"]))
        w.add_kv(f"{arch}.expert_chunk_feed_forward_length",
                 int(config.get("head_dim") or 128))
        w.add_kv(f"{arch}.experts_per_group",
                 int(config.get("experts_per_group", 2)))
        w.add_kv(f"{arch}.expert_group_scale",
                 float(config.get("expert_group_scale", 0.05)))
    if arch == "chameleon":
        w.add_kv(f"{arch}.swin_norm", bool(config.get("swin_norm", False)))
    if arch == "qwen2vl":
        rs = config.get("rope_scaling") or {}
        sec = list(rs.get("mrope_section") or ())
        if len(sec) < 4:
            sec = sec + [0] * (4 - len(sec))
        w.add_kv(f"{arch}.rope.dimension_sections", [int(s) for s in sec])
    if arch == "grok":
        w.add_kv(f"{arch}.attn_logit_softcapping",
                 float(config.get("attn_logit_softcapping", 30.0)))
        w.add_kv(f"{arch}.router_logit_softcapping",
                 float(config.get("router_logit_softcapping", 30.0)))
        if config.get("final_logit_softcapping"):
            w.add_kv(f"{arch}.final_logit_softcapping",
                     float(config["final_logit_softcapping"]))
        w.add_kv(f"{arch}.attention.output_scale",
                 float(config.get("attn_output_multiplier",
                                  head_dim ** -0.5)))
        w.add_kv(f"{arch}.embedding_scale",
                 float(config["embedding_multiplier_scale"]))
        w.add_kv(f"{arch}.logit_scale",
                 float(config["output_multiplier_scale"]))
        if config.get("moe_intermediate_size"):
            w.add_kv(f"{arch}.expert_feed_forward_length",
                     int(config["moe_intermediate_size"]))
    if arch == "smallthinker":
        w.add_kv(f"{arch}.expert_gating_func",
                 1 if config.get("moe_primary_router_apply_softmax", True)
                 else 2)
        w.add_kv(f"{arch}.expert_weights_norm", True)
        layout = config.get("sliding_window_layout") or []
        if any(layout) and config.get("sliding_window_size"):
            w.add_kv(f"{arch}.attention.sliding_window",
                     int(config["sliding_window_size"]))
    if arch in ("deepseek", "bailingmoe"):
        # softmax-gated MoE with shared experts + leading dense layers
        # (reference DeepseekModel / BailingMoeModel set_gguf_parameters)
        w.add_kv(f"{arch}.leading_dense_block_count",
                 int(config.get("first_k_dense_replace", 0)))
        if config.get("moe_intermediate_size"):
            w.add_kv(f"{arch}.expert_feed_forward_length",
                     int(config["moe_intermediate_size"]))
        w.add_kv(f"{arch}.expert_shared_count",
                 int(config.get("n_shared_experts")
                     or config.get("num_shared_experts") or 0))
        w.add_kv(f"{arch}.expert_weights_scale", 1.0)
        w.add_kv(f"{arch}.expert_weights_norm",
                 bool(config.get("norm_topk_prob", False)))
        w.add_kv(f"{arch}.expert_gating_func", 1)  # softmax
    if arch == "phi2":
        w.add_kv(f"{arch}.attention.layer_norm_epsilon",
                 float(config.get("layer_norm_eps", 1e-5)))
        # partial rotary: n_rot = rot_pct * head_dim (llm_build_phi2)
        w.add_kv(f"{arch}.rope.dimension_count",
                 int(float(config.get("partial_rotary_factor", 0.5))
                     * head_dim))
        state = dict(state)
        state["norm.weight"] = state.pop("final_layernorm.weight")
        state["norm.bias"] = state.pop("final_layernorm.bias")
    if arch == "stablelm":
        w.add_kv(f"{arch}.attention.layer_norm_epsilon",
                 float(config.get("layer_norm_eps", 1e-5)))
        w.add_kv(f"{arch}.rope.dimension_count",
                 int(float(config.get("partial_rotary_factor", 0.25))
                     * head_dim))
    if arch in ("glm4", "glm4moe"):
        w.add_kv(f"{arch}.rope.dimension_count",
                 int(float(config.get("partial_rotary_factor", 0.5))
                     * head_dim))
    if arch in ("glm4moe", "dots1", "ernie4_5-moe"):
        # deepseek-style gating hparams (reference Glm4MoeModel /
        # Dots1Model / Ernie4_5MoeModel set_gguf_parameters)
        if config.get("moe_intermediate_size"):
            w.add_kv(f"{arch}.expert_feed_forward_length",
                     int(config["moe_intermediate_size"]))
        w.add_kv(f"{arch}.expert_shared_count",
                 int(config.get("n_shared_experts")
                     or config.get("moe_num_shared_experts") or 0))
        if arch == "ernie4_5-moe":  # softmax + renormalize (llm graph)
            w.add_kv(f"{arch}.expert_gating_func", 1)
            w.add_kv(f"{arch}.expert_weights_norm", True)
        else:  # glm4moe / dots1: sigmoid scores + bias-corrected topk
            w.add_kv(f"{arch}.expert_gating_func", 2)
            w.add_kv(f"{arch}.expert_weights_norm",
                     bool(config.get("norm_topk_prob", True)))
            w.add_kv(f"{arch}.expert_weights_scale",
                     float(config.get("routed_scaling_factor", 1.0)))
    if arch == "nemotron":
        w.add_kv(f"{arch}.attention.layer_norm_epsilon",
                 float(config.get("norm_eps", 1e-5)))
        w.add_kv(f"{arch}.rope.dimension_count",
                 int(float(config.get("partial_rotary_factor", 0.5))
                     * head_dim))
    if arch in ("command-r", "cohere2"):
        # HF Cohere: interleaved rotary natively = GGUF NORM layout (no
        # permute); logit_scale multiplies logits; block norms are
        # bias-free LayerNorm with layer_norm_eps
        w.add_kv(f"{arch}.logit_scale", float(config.get("logit_scale", 1.0)))
        w.add_kv(f"{arch}.attention.layer_norm_epsilon",
                 float(config.get("layer_norm_eps", 1e-5)))
        if config.get("sliding_window"):  # cohere2 3-SWA:1-full-NoPE
            w.add_kv(f"{arch}.attention.sliding_window",
                     int(config["sliding_window"]))
    if arch == "olmo":
        # weightless LayerNorms (OlmoLayerNorm hardcodes eps=1e-5) and
        # optional q/k/v clamping (reference OlmoModel set_gguf_parameters)
        w.add_kv(f"{arch}.attention.layer_norm_epsilon", 1e-5)
        if config.get("clip_qkv"):
            w.add_kv(f"{arch}.attention.clamp_kqv",
                     float(config["clip_qkv"]))
    if arch in ("granite", "granitemoe"):
        # HF Granite multipliers -> granite kv scales (llama-model.cpp
        # LLM_KV_{EMBEDDING,RESIDUAL,LOGIT}_SCALE + ATTENTION_SCALE)
        w.add_kv(f"{arch}.embedding_scale",
                 float(config.get("embedding_multiplier", 1.0)))
        w.add_kv(f"{arch}.residual_scale",
                 float(config.get("residual_multiplier", 1.0)))
        w.add_kv(f"{arch}.logit_scale",
                 float(config.get("logits_scaling", 1.0)))
        if config.get("attention_multiplier"):
            w.add_kv(f"{arch}.attention.scale",
                     float(config["attention_multiplier"]))
    gemma = arch.startswith("gemma")
    if gemma:
        if config.get("sliding_window"):
            w.add_kv(f"{arch}.attention.sliding_window",
                     int(config["sliding_window"]))
        if config.get("attn_logit_softcapping"):
            w.add_kv(f"{arch}.attn_logit_softcapping",
                     float(config["attn_logit_softcapping"]))
        if config.get("final_logit_softcapping"):
            w.add_kv(f"{arch}.final_logit_softcapping",
                     float(config["final_logit_softcapping"]))
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)

    written = []

    def put(name, arr, q=qtype):
        # Gemma RMS norms / Nemotron layernorm1p store (weight + 1) on
        # disk — the zero-centered HF convention vs the gguf one
        # (convert_hf_to_gguf.py GemmaModel / NemotronModel)
        if (gemma or arch == "nemotron") and name.endswith("norm.weight"):
            arr = _np(arr).astype(np.float32) + 1.0
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["embed_tokens.weight"])
    for nm, arr in rope_extra.items():  # llama3/longrope factor tensors
        put(nm, arr, None)
    if "norm.weight" in state:  # absent for OLMo (non-parametric norms)
        put("output_norm.weight", state["norm.weight"], None)
    if "norm.bias" in state:  # starcoder2 biased final LayerNorm
        put("output_norm.bias", state["norm.bias"], None)
    if "lm_head.weight" in state and not config.get("tie_word_embeddings", False):
        put("output.weight", state["lm_head.weight"])
        if "lm_head.bias" in state:  # phi2 biased LM head
            put("output.bias", state["lm_head.bias"], None)
    n_layers = int(config["num_hidden_layers"])
    # gemma v1's post_attention_layernorm is its FFN pre-norm (llama
    # topology) — only gemma2/3 have the sandwich-norm naming
    layer_map = (_GEMMA_LAYER_MAP if ((gemma and arch != "gemma")
                                      or arch == "grok") else
                 _OLMO2_LAYER_MAP if arch in ("olmo2", "exaone4") else
                 _APERTUS_LAYER_MAP if arch == "apertus" else
                 _BITNET_LAYER_MAP if arch == "bitnet" else
                 _STARCODER2_LAYER_MAP if arch == "starcoder2" else
                 _PHI2_LAYER_MAP if arch == "phi2" else
                 _PHIMOE_LAYER_MAP if arch in ("phimoe",
                                               "orion") else
                 _CHAMELEON_SWIN_MAP if (arch == "chameleon"
                                         and config.get("swin_norm"))
                 else
                 _STABLELM_LAYER_MAP if arch == "stablelm" else
                 _GLM4_LAYER_MAP if arch in ("glm4", "chatglm") else
                 _NEMOTRON_LAYER_MAP if arch in ("nemotron",
                                                 "arcee") else
                 _LLM_LAYER_MAP)
    n_kv = int(config.get("num_key_value_heads", n_heads))
    permute_qk = arch in ("llama", "minicpm", "minicpmtts", "granite",
                      "granitemoe", "smollm3", "arcee",
                      "ernie4_5", "ernie4_5-moe", "olmo",
                      "baichuan", "xverse", "internlm2",
                      "deepseek", "bailingmoe", "llada",
                      "arctic", "chameleon")  # NORM rope
    # (chatglm is NORM rope too but HF stores the interleaved layout
    # natively — no permute, like cohere)
    if arch == "phi3":  # fused qkv_proj / gate_up_proj -> split projections
        state = dict(state)
        qd, kvd = n_heads * head_dim, n_kv * head_dim
        d_ff = int(config["intermediate_size"])
        for i in range(n_layers):
            qkv = _np(state.pop(f"layers.{i}.self_attn.qkv_proj.weight"))
            state[f"layers.{i}.self_attn.q_proj.weight"] = qkv[:qd]
            state[f"layers.{i}.self_attn.k_proj.weight"] = qkv[qd:qd + kvd]
            state[f"layers.{i}.self_attn.v_proj.weight"] = qkv[qd + kvd:]
            gu = _np(state.pop(f"layers.{i}.mlp.gate_up_proj.weight"))
            state[f"layers.{i}.mlp.gate_proj.weight"] = gu[:d_ff]
            state[f"layers.{i}.mlp.up_proj.weight"] = gu[d_ff:]
    if ds2 or mla_ref:
        _put_deepseek2_layers(put, state, config, n_layers, qtype)
        w.write()
        return written
    for i in range(n_layers):
        moe = (f"layers.{i}.mlp.experts.0.gate_proj.weight" in state
               or arch == "gpt-oss")
        for hf, gg in layer_map.items():
            key = f"layers.{i}.{hf}"
            if key not in state:
                if ("norm" in hf or hf.endswith(".bias")
                        or (moe and hf.startswith("mlp."))):
                    continue  # q/k norm + biases optional; MoE lacks dense
                raise KeyError(f"missing {key}")
            is_norm = "norm" in hf or hf.endswith(".bias")
            arr = state[key]
            if permute_qk and gg == "attn_q.weight":
                arr = _permute_rope(arr, n_heads)
            elif permute_qk and gg == "attn_k.weight":
                arr = _permute_rope(arr, n_kv)
            put(f"blk.{i}.{gg}", arr, None if is_norm else qtype)
        if arch == "gpt-oss":
            # fused+interleaved expert tensors: gate_up_proj [E, d, 2F]
            # (even cols = gate, odd = up — GptOssExperts), down [E, F, d];
            # GGUF stacks are [E, F, d] / [E, d, F]; plus sinks, router
            # bias and per-projection expert biases
            pfx = f"layers.{i}."
            put(f"blk.{i}.attn_sinks.weight",
                state[pfx + "self_attn.sinks"], None)
            put(f"blk.{i}.ffn_gate_inp.weight",
                state[pfx + "mlp.router.weight"], None)
            put(f"blk.{i}.ffn_gate_inp.bias",
                state[pfx + "mlp.router.bias"], None)
            gu = _np(state[pfx + "mlp.experts.gate_up_proj"])
            gub = _np(state[pfx + "mlp.experts.gate_up_proj_bias"])
            put(f"blk.{i}.ffn_gate_exps.weight",
                np.ascontiguousarray(gu[..., ::2].transpose(0, 2, 1)), None)
            put(f"blk.{i}.ffn_up_exps.weight",
                np.ascontiguousarray(gu[..., 1::2].transpose(0, 2, 1)), None)
            put(f"blk.{i}.ffn_gate_exps.bias", gub[:, ::2], None)
            put(f"blk.{i}.ffn_up_exps.bias", gub[:, 1::2], None)
            dn = _np(state[pfx + "mlp.experts.down_proj"])
            put(f"blk.{i}.ffn_down_exps.weight",
                np.ascontiguousarray(dn.transpose(0, 2, 1)), None)
            put(f"blk.{i}.ffn_down_exps.bias",
                state[pfx + "mlp.experts.down_proj_bias"], None)
        elif moe:  # qwen3moe/mixtral-style expert stacks
            n_exp = int(config["num_experts"])
            put(f"blk.{i}.ffn_gate_inp.weight",
                state[f"layers.{i}.mlp.gate.weight"], None)
            for bk in (f"layers.{i}.mlp.gate.e_score_correction_bias",
                       f"layers.{i}.mlp.moe_statics.e_score_correction_bias"):
                if bk in state:  # V3-style selection bias -> exp_probs_b
                    put(f"blk.{i}.exp_probs_b.bias",
                        _np(state[bk]).reshape(-1), None)
            for hfp, gg in (("gate_proj", "ffn_gate_exps"),
                            ("up_proj", "ffn_up_exps"),
                            ("down_proj", "ffn_down_exps")):
                stack = np.stack([
                    _np(state[f"layers.{i}.mlp.experts.{e}.{hfp}.weight"])
                    for e in range(n_exp)])
                put(f"blk.{i}.{gg}.weight", stack, qtype)
            if arch == "grovemoe":
                # adjugate chunk-expert stacks (reference GroveMoeModel
                # merges mlp.chunk_experts.{x}.{gate,up,down}_proj)
                n_ch = n_exp // int(config.get("experts_per_group", 2))
                for hfp, gg in (("gate_proj", "ffn_gate_chexps"),
                                ("up_proj", "ffn_up_chexps"),
                                ("down_proj", "ffn_down_chexps")):
                    stack = np.stack([
                        _np(state[f"layers.{i}.mlp.chunk_experts.{e}"
                                  f".{hfp}.weight"]) for e in range(n_ch)])
                    put(f"blk.{i}.{gg}.weight", stack, qtype)
            if arch == "arctic":
                put(f"blk.{i}.ffn_norm_exps.weight",
                    state[f"layers.{i}.moe_norm_exps.weight"], None)
            if (arch in ("arctic", "grok")
                    and f"layers.{i}.mlp.gate_proj.weight" in state):
                # parallel dense branch alongside the MoE
                for hfp, gg in (("gate_proj", "ffn_gate"),
                                ("up_proj", "ffn_up"),
                                ("down_proj", "ffn_down")):
                    put(f"blk.{i}.{gg}.weight",
                        state[f"layers.{i}.mlp.{hfp}.weight"])
            sh = f"layers.{i}.mlp.shared_expert."
            if sh + "gate_proj.weight" in state:  # qwen2moe gated shexp
                put(f"blk.{i}.ffn_gate_shexp.weight",
                    state[sh + "gate_proj.weight"])
                put(f"blk.{i}.ffn_up_shexp.weight",
                    state[sh + "up_proj.weight"])
                put(f"blk.{i}.ffn_down_shexp.weight",
                    state[sh + "down_proj.weight"])
                # qwen2moe gates its shared expert; llama4's is ungated
                sg = f"layers.{i}.mlp.shared_expert_gate.weight"
                if sg in state:
                    put(f"blk.{i}.ffn_gate_inp_shexp.weight", state[sg],
                        None)
    w.write()
    return written


def _put_deepseek2_layers(put, state: Mapping[str, Any],
                          config: Mapping[str, Any], n_layers: int,
                          qtype: GGMLType) -> None:
    """DeepSeek-V2/V3 MLA + MoE layer tensors (reference
    convert_hf_to_gguf.py DeepseekV2Model.modify_tensors): kv_b_proj is
    split into attn_k_b [H, rank, nope] (transposed) and attn_v_b
    [H, v_dim, rank] for the absorbed-MLA attention path; MoE layers stack
    routed experts and keep the shared-expert dense branch; V3's
    e_score_correction bias becomes exp_probs_b."""
    n_kv_orig = int(config.get("num_attention_heads"))  # MLA: kv == q heads
    nope = int(config["qk_nope_head_dim"])
    vdim = int(config["v_head_dim"])
    for i in range(n_layers):
        pfx = f"layers.{i}."
        b = f"blk.{i}."
        put(b + "attn_norm.weight", state[pfx + "input_layernorm.weight"],
            None)
        put(b + "ffn_norm.weight",
            state[pfx + "post_attention_layernorm.weight"], None)
        if pfx + "self_attn.q_proj.weight" in state:  # V2-Lite
            put(b + "attn_q.weight", state[pfx + "self_attn.q_proj.weight"])
        else:
            put(b + "attn_q_a.weight",
                state[pfx + "self_attn.q_a_proj.weight"])
            put(b + "attn_q_a_norm.weight",
                state[pfx + "self_attn.q_a_layernorm.weight"], None)
            put(b + "attn_q_b.weight",
                state[pfx + "self_attn.q_b_proj.weight"])
        put(b + "attn_kv_a_mqa.weight",
            state[pfx + "self_attn.kv_a_proj_with_mqa.weight"])
        put(b + "attn_kv_a_norm.weight",
            state[pfx + "self_attn.kv_a_layernorm.weight"], None)
        kvb = _np(state[pfx + "self_attn.kv_b_proj.weight"]).astype(np.float32)
        kvb = kvb.reshape(n_kv_orig, nope + vdim, -1)  # [H, nope+v, rank]
        put(b + "attn_k_b.weight",
            np.ascontiguousarray(kvb[:, :nope, :].transpose(0, 2, 1)), None)
        put(b + "attn_v_b.weight",
            np.ascontiguousarray(kvb[:, nope:, :]), None)
        put(b + "attn_output.weight",
            state[pfx + "self_attn.o_proj.weight"])
        if pfx + "mlp.gate_proj.weight" in state:  # leading dense layer
            for hfp, gg in (("gate_proj", "ffn_gate"), ("up_proj", "ffn_up"),
                            ("down_proj", "ffn_down")):
                put(b + gg + ".weight", state[pfx + f"mlp.{hfp}.weight"])
        elif pfx + "mlp.experts.0.gate_proj.weight" not in state:
            # un-gated dense FFN (plm relu^2, llm_build_plm)
            put(b + "ffn_up.weight", state[pfx + "mlp.up_proj.weight"])
            put(b + "ffn_down.weight", state[pfx + "mlp.down_proj.weight"])
        else:
            put(b + "ffn_gate_inp.weight", state[pfx + "mlp.gate.weight"],
                None)
            if pfx + "mlp.gate.e_score_correction_bias" in state:
                put(b + "exp_probs_b.bias",
                    state[pfx + "mlp.gate.e_score_correction_bias"], None)
            n_exp = int(config["n_routed_experts"])
            for hfp, gg in (("gate_proj", "ffn_gate_exps"),
                            ("up_proj", "ffn_up_exps"),
                            ("down_proj", "ffn_down_exps")):
                stack = np.stack([
                    _np(state[pfx + f"mlp.experts.{e}.{hfp}.weight"])
                    for e in range(n_exp)])
                put(b + gg + ".weight", stack, qtype)
            for hfp, gg in (("gate_proj", "ffn_gate_shexp"),
                            ("up_proj", "ffn_up_shexp"),
                            ("down_proj", "ffn_down_shexp")):
                key = pfx + f"mlp.shared_experts.{hfp}.weight"
                if key in state:
                    put(b + gg + ".weight", state[key])


def _convert_mamba(state: Mapping[str, Any], config: Mapping[str, Any],
                   out_path: str, qtype: GGMLType,
                   tokenizer_kv: Mapping[str, Any] | None = None) -> list[str]:
    """HF MambaForCausalLM -> GGUF arch "mamba" (reference
    convert_hf_to_gguf.py MambaModel + llm_build_mamba tensor names):
    ssm_a stores A_log verbatim (the engine applies -exp), conv1d weight
    drops the depthwise singleton dim."""
    state = _strip(state, "backbone.")
    arch = "mamba"
    d_model = int(config["hidden_size"])
    tsr = config.get("time_step_rank", "auto")
    if tsr in (None, "auto"):
        tsr = -(-d_model // 16)  # ceil, HF MambaConfig "auto" rule
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", int(config["num_hidden_layers"]))
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.ssm.inner_size",
             int(config.get("intermediate_size") or 2 * d_model))
    w.add_kv(f"{arch}.ssm.conv_kernel", int(config.get("conv_kernel", 4)))
    w.add_kv(f"{arch}.ssm.state_size", int(config.get("state_size", 16)))
    w.add_kv(f"{arch}.ssm.time_step_rank", int(tsr))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    w.add_kv(f"{arch}.context_length",
             int(config.get("max_position_embeddings", 1 << 20)))
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             float(config.get("layer_norm_epsilon", 1e-5)))
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)

    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["embeddings.weight"])
    put("output_norm.weight", state["norm_f.weight"], None)
    if ("lm_head.weight" in state
            and not config.get("tie_word_embeddings", True)):
        put("output.weight", state["lm_head.weight"])
    for i in range(int(config["num_hidden_layers"])):
        pfx, b = f"layers.{i}.mixer.", f"blk.{i}."
        put(b + "attn_norm.weight", state[f"layers.{i}.norm.weight"], None)
        put(b + "ssm_in.weight", state[pfx + "in_proj.weight"])
        put(b + "ssm_conv1d.weight",
            _np(state[pfx + "conv1d.weight"])[:, 0, :], None)
        put(b + "ssm_conv1d.bias", state[pfx + "conv1d.bias"], None)
        put(b + "ssm_x.weight", state[pfx + "x_proj.weight"])
        put(b + "ssm_dt.weight", state[pfx + "dt_proj.weight"], None)
        put(b + "ssm_dt.bias", state[pfx + "dt_proj.bias"], None)
        put(b + "ssm_a", state[pfx + "A_log"], None)
        put(b + "ssm_d", state[pfx + "D"], None)
        put(b + "ssm_out.weight", state[pfx + "out_proj.weight"])
    w.write()
    return written


def _convert_granite_hybrid(state: Mapping[str, Any],
                            config: Mapping[str, Any],
                            out_path: str, qtype: GGMLType,
                            tokenizer_kv: Mapping[str, Any] | None = None
                            ) -> list[str]:
    """HF GraniteMoeHybridForCausalLM -> GGUF arch "granitehybrid"
    (reference GraniteHybridModel): per-layer head_count_kv vector
    (0 = mamba2 layer), granite mup scales as KVs, granitemoe fused
    input_linear experts + GraniteMoeShared shared expert, NoPE
    attention (no q/k permute: undo_permute)."""
    state = _strip(state, "model.")
    arch = "granitehybrid"
    d_model = int(config["hidden_size"])
    n_layers = int(config["num_hidden_layers"])
    n_heads = int(config["num_attention_heads"])
    n_kv = int(config.get("num_key_value_heads", n_heads))
    types = config.get("layer_types") or ["attention"] * n_layers
    kvh = [n_kv if t == "attention" else 0 for t in types]
    n_ssm_head = int(config.get("mamba_n_heads", 4))
    d_inner = n_ssm_head * int(config.get("mamba_d_head", 16))
    n_exp = int(config.get("num_local_experts", 0))
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length",
             int(config["intermediate_size"]))
    w.add_kv(f"{arch}.attention.head_count", n_heads)
    w.add_kv(f"{arch}.attention.head_count_kv", kvh)
    w.add_kv(f"{arch}.attention.key_length", d_model // n_heads)
    w.add_kv(f"{arch}.ssm.inner_size", d_inner)
    w.add_kv(f"{arch}.ssm.conv_kernel", int(config.get("mamba_d_conv", 4)))
    w.add_kv(f"{arch}.ssm.state_size", int(config.get("mamba_d_state", 8)))
    w.add_kv(f"{arch}.ssm.time_step_rank", n_ssm_head)
    w.add_kv(f"{arch}.ssm.group_count",
             int(config.get("mamba_n_groups", 1)))
    if n_exp:
        w.add_kv(f"{arch}.expert_count", n_exp)
        w.add_kv(f"{arch}.expert_used_count",
                 int(config.get("num_experts_per_tok", 2)))
    if config.get("shared_intermediate_size"):
        w.add_kv(f"{arch}.expert_shared_feed_forward_length",
                 int(config["shared_intermediate_size"]))
    w.add_kv(f"{arch}.embedding_scale",
             float(config.get("embedding_multiplier", 1.0)))
    w.add_kv(f"{arch}.residual_scale",
             float(config.get("residual_multiplier", 1.0)))
    w.add_kv(f"{arch}.logit_scale",
             float(config.get("logits_scaling", 1.0)))
    if config.get("attention_multiplier"):
        w.add_kv(f"{arch}.attention.scale",
                 float(config["attention_multiplier"]))
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             float(config.get("rms_norm_eps", 1e-5)))
    w.add_kv(f"{arch}.context_length",
             int(config.get("max_position_embeddings", 4096)))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)

    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["embed_tokens.weight"])
    put("output_norm.weight", state["norm.weight"], None)
    if ("lm_head.weight" in state
            and not config.get("tie_word_embeddings", True)):
        put("output.weight", state["lm_head.weight"])
    for i in range(n_layers):
        pfx, b = f"layers.{i}.", f"blk.{i}."
        put(b + "attn_norm.weight", state[pfx + "input_layernorm.weight"],
            None)
        put(b + "ffn_norm.weight",
            state[pfx + "post_attention_layernorm.weight"], None)
        if kvh[i] == 0:  # mamba2 mixer
            mp = pfx + "mamba."
            put(b + "ssm_in.weight", state[mp + "in_proj.weight"])
            put(b + "ssm_conv1d.weight",
                _np(state[mp + "conv1d.weight"])[:, 0, :], None)
            put(b + "ssm_conv1d.bias", state[mp + "conv1d.bias"], None)
            put(b + "ssm_dt.bias", state[mp + "dt_bias"], None)
            put(b + "ssm_a", state[mp + "A_log"], None)
            put(b + "ssm_d", state[mp + "D"], None)
            # reference reshapes mamba norms to [n_group, d_inner/n_group]
            put(b + "ssm_norm.weight",
                _np(state[mp + "norm.weight"]).reshape(
                    int(config.get("mamba_n_groups", 1)), -1), None)
            put(b + "ssm_out.weight", state[mp + "out_proj.weight"])
        else:
            put(b + "attn_q.weight", state[pfx + "self_attn.q_proj.weight"])
            put(b + "attn_k.weight", state[pfx + "self_attn.k_proj.weight"])
            put(b + "attn_v.weight", state[pfx + "self_attn.v_proj.weight"])
            put(b + "attn_output.weight",
                state[pfx + "self_attn.o_proj.weight"])
        if n_exp:
            moe = pfx + "block_sparse_moe."
            put(b + "ffn_gate_inp.weight",
                state[moe + "router.layer.weight"], None)
            inl = _np(state[moe + "input_linear.weight"])  # [E, 2F, d]
            f = inl.shape[1] // 2
            put(b + "ffn_gate_exps.weight", inl[:, :f], qtype)
            put(b + "ffn_up_exps.weight", inl[:, f:], qtype)
            put(b + "ffn_down_exps.weight",
                state[moe + "output_linear.weight"], qtype)
        if pfx + "shared_mlp.input_linear.weight" in state:
            sin = _np(state[pfx + "shared_mlp.input_linear.weight"])
            fs = sin.shape[0] // 2
            put(b + "ffn_gate_shexp.weight", sin[:fs])
            put(b + "ffn_up_shexp.weight", sin[fs:])
            put(b + "ffn_down_shexp.weight",
                state[pfx + "shared_mlp.output_linear.weight"])
    w.write()
    return written


def _convert_falcon_h1(state: Mapping[str, Any], config: Mapping[str, Any],
                       out_path: str, qtype: GGMLType,
                       tokenizer_kv: Mapping[str, Any] | None = None
                       ) -> list[str]:
    """HF FalconH1ForCausalLM -> GGUF arch "falcon-h1" (reference
    FalconH1Model, convert_hf_to_gguf.py:8464): every mup multiplier is
    baked into the weights — embed x embedding_multiplier, lm_head x
    lm_head_multiplier, q/v x attention_in, k x key x attention_in,
    o x attention_out, ssm in_proj x ssm_in x per-section zxBCdt vector,
    ssm out_proj x ssm_out, ffn gate x mlp[0], down x mlp[1]. NEOX rope
    (no q/k permute)."""
    state = _strip(state, "model.")
    arch = "falcon-h1"
    d_model = int(config["hidden_size"])
    n_layers = int(config["num_hidden_layers"])
    n_heads = int(config["num_attention_heads"])
    n_kv = int(config.get("num_key_value_heads", n_heads))
    head_dim = int(config.get("head_dim") or d_model // n_heads)
    d_inner = int(config.get("mamba_d_ssm")
                  or int(config.get("mamba_expand", 2)) * d_model)
    n_group = int(config.get("mamba_n_groups", 1))
    d_state = int(config.get("mamba_d_state", 8))
    gts = n_group * d_state
    mlp_mult = config.get("mlp_multipliers") or [1.0, 1.0]
    zxbcdt_mult = config.get("ssm_multipliers") or [1.0] * 5
    attn_in = float(config.get("attention_in_multiplier", 1.0))
    attn_out = float(config.get("attention_out_multiplier", 1.0))
    key_mult = float(config.get("key_multiplier", 1.0))
    ssm_in_m = float(config.get("ssm_in_multiplier", 1.0))
    ssm_out_m = float(config.get("ssm_out_multiplier", 1.0))

    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length",
             int(config["intermediate_size"]))
    w.add_kv(f"{arch}.attention.head_count", n_heads)
    w.add_kv(f"{arch}.attention.head_count_kv", n_kv)
    w.add_kv(f"{arch}.attention.key_length", head_dim)
    w.add_kv(f"{arch}.ssm.inner_size", d_inner)
    w.add_kv(f"{arch}.ssm.conv_kernel", int(config.get("mamba_d_conv", 4)))
    w.add_kv(f"{arch}.ssm.state_size", d_state)
    w.add_kv(f"{arch}.ssm.time_step_rank",
             int(config.get("mamba_n_heads", 4)))
    w.add_kv(f"{arch}.ssm.group_count", n_group)
    w.add_kv(f"{arch}.rope.freq_base",
             float(config.get("rope_theta", 100000.0)))
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             float(config.get("rms_norm_eps", 1e-5)))
    w.add_kv(f"{arch}.context_length",
             int(config.get("max_position_embeddings", 4096)))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)

    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    emb_m = float(config.get("embedding_multiplier", 1.0))
    put("token_embd.weight", _np(state["embed_tokens.weight"]) * emb_m)
    put("output_norm.weight", state["final_layernorm.weight"], None)
    head_m = float(config.get("lm_head_multiplier", 1.0))
    if ("lm_head.weight" in state
            and not config.get("tie_word_embeddings", False)):
        put("output.weight", _np(state["lm_head.weight"]) * head_m)
    elif head_m != emb_m:
        # tied embeddings with distinct embedding/lm_head multipliers:
        # materialize a separate scaled output head
        put("output.weight", _np(state["embed_tokens.weight"]) * head_m)
    for i in range(n_layers):
        pfx, b = f"layers.{i}.", f"blk.{i}."
        put(b + "attn_norm.weight", state[pfx + "input_layernorm.weight"],
            None)
        put(b + "ffn_norm.weight",
            state[pfx + "pre_ff_layernorm.weight"], None)
        sa = pfx + "self_attn."
        put(b + "attn_q.weight", _np(state[sa + "q_proj.weight"]) * attn_in)
        put(b + "attn_k.weight",
            _np(state[sa + "k_proj.weight"]) * key_mult * attn_in)
        put(b + "attn_v.weight", _np(state[sa + "v_proj.weight"]) * attn_in)
        put(b + "attn_output.weight",
            _np(state[sa + "o_proj.weight"]) * attn_out)
        mp = pfx + "mamba."
        inp = _np(state[mp + "in_proj.weight"]).astype(np.float32) * ssm_in_m
        inp = inp.copy()
        inp[:d_inner] *= zxbcdt_mult[0]
        inp[d_inner:2 * d_inner] *= zxbcdt_mult[1]
        inp[2 * d_inner:2 * d_inner + gts] *= zxbcdt_mult[2]
        inp[2 * d_inner + gts:2 * d_inner + 2 * gts] *= zxbcdt_mult[3]
        inp[2 * d_inner + 2 * gts:] *= zxbcdt_mult[4]
        put(b + "ssm_in.weight", inp)
        put(b + "ssm_conv1d.weight",
            _np(state[mp + "conv1d.weight"])[:, 0, :], None)
        put(b + "ssm_conv1d.bias", state[mp + "conv1d.bias"], None)
        put(b + "ssm_dt.bias", state[mp + "dt_bias"], None)
        put(b + "ssm_a", state[mp + "A_log"], None)
        put(b + "ssm_d", state[mp + "D"], None)
        if mp + "norm.weight" in state:
            # reference FalconH1Model reshapes mamba.norm to
            # [n_group, d_inner/n_group] on disk (element order is the
            # flat one either way; ssm.py re-flattens at use)
            put(b + "ssm_norm.weight",
                _np(state[mp + "norm.weight"]).reshape(
                    n_group, d_inner // n_group), None)
        put(b + "ssm_out.weight",
            _np(state[mp + "out_proj.weight"]) * ssm_out_m)
        fp = pfx + "feed_forward."
        put(b + "ffn_gate.weight",
            _np(state[fp + "gate_proj.weight"]) * float(mlp_mult[0]))
        put(b + "ffn_up.weight", state[fp + "up_proj.weight"])
        put(b + "ffn_down.weight",
            _np(state[fp + "down_proj.weight"]) * float(mlp_mult[1]))
    w.write()
    return written


def _convert_lfm2(state: Mapping[str, Any], config: Mapping[str, Any],
                  out_path: str, qtype: GGMLType,
                  tokenizer_kv: Mapping[str, Any] | None = None,
                  arch: str = "lfm2") -> list[str]:
    """HF Lfm2ForCausalLM / Lfm2MoeForCausalLM -> GGUF arch "lfm2" /
    "lfm2moe" (reference Lfm2Model / LFM2MoeModel + llm_build_lfm2):
    per-layer head_count_kv VECTOR (0 = shortconv layer),
    shortconv.{conv,in_proj,out_proj} tensors, embedding_norm as the
    final token_embd_norm, w1/w3/w2 = gate/up/down; lfm2moe stacks
    per-expert w1/w2/w3 into [E, ...] ffn_*_exps with a sigmoid router
    (feed_forward.gate) and expert_bias after num_dense_layers."""
    state = _strip(state, "model.")
    d_model = int(config["hidden_size"])
    n_layers = int(config["num_hidden_layers"])
    n_heads = int(config["num_attention_heads"])
    n_kv = int(config.get("num_key_value_heads", n_heads))
    types = config.get("layer_types") or ["full_attention"] * n_layers
    kvh = [n_kv if t == "full_attention" else 0 for t in types]
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length",
             int(config["intermediate_size"]))
    w.add_kv(f"{arch}.attention.head_count", n_heads)
    w.add_kv(f"{arch}.attention.head_count_kv", kvh)
    w.add_kv(f"{arch}.attention.key_length", d_model // n_heads)
    w.add_kv(f"{arch}.shortconv.l_cache",
             int(config.get("conv_L_cache", 3)))
    w.add_kv(f"{arch}.rope.freq_base",
             float(config.get("rope_theta", 1000000.0)))
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             float(config.get("norm_eps", 1e-5)))
    w.add_kv(f"{arch}.context_length",
             int(config.get("max_position_embeddings", 4096)))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    n_dense = int(config.get("num_dense_layers", 0))
    if arch == "lfm2moe":
        w.add_kv(f"{arch}.expert_count", int(config["num_experts"]))
        w.add_kv(f"{arch}.expert_used_count",
                 int(config["num_experts_per_tok"]))
        w.add_kv(f"{arch}.expert_feed_forward_length",
                 int(config["moe_intermediate_size"]))
        w.add_kv(f"{arch}.leading_dense_block_count", n_dense)
        w.add_kv(f"{arch}.expert_gating_func", 2)  # sigmoid
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)

    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["embed_tokens.weight"])
    put("token_embd_norm.weight", state["embedding_norm.weight"], None)
    if ("lm_head.weight" in state
            and not config.get("tie_word_embeddings", True)):
        put("output.weight", state["lm_head.weight"])
    for i in range(n_layers):
        pfx, b = f"layers.{i}.", f"blk.{i}."
        put(b + "attn_norm.weight", state[pfx + "operator_norm.weight"],
            None)
        put(b + "ffn_norm.weight", state[pfx + "ffn_norm.weight"], None)
        if arch == "lfm2moe" and i >= n_dense:
            put(b + "ffn_gate_inp.weight",
                state[pfx + "feed_forward.gate.weight"], None)
            put(b + "exp_probs_b.bias",
                state[pfx + "feed_forward.expert_bias"], None)
            ne = int(config["num_experts"])
            for wn, gg in (("w1", "ffn_gate_exps"), ("w3", "ffn_up_exps"),
                           ("w2", "ffn_down_exps")):
                put(b + f"{gg}.weight", np.stack(
                    [_np(state[f"{pfx}feed_forward.experts.{x}.{wn}.weight"])
                     for x in range(ne)]))
        else:
            put(b + "ffn_gate.weight",
                state[pfx + "feed_forward.w1.weight"])
            put(b + "ffn_up.weight", state[pfx + "feed_forward.w3.weight"])
            put(b + "ffn_down.weight",
                state[pfx + "feed_forward.w2.weight"])
        if kvh[i] == 0:
            put(b + "shortconv.in_proj.weight",
                state[pfx + "conv.in_proj.weight"])
            put(b + "shortconv.out_proj.weight",
                state[pfx + "conv.out_proj.weight"])
            put(b + "shortconv.conv.weight",
                _np(state[pfx + "conv.conv.weight"])[:, 0, :], None)
        else:
            put(b + "attn_q.weight", state[pfx + "self_attn.q_proj.weight"])
            put(b + "attn_k.weight", state[pfx + "self_attn.k_proj.weight"])
            put(b + "attn_v.weight", state[pfx + "self_attn.v_proj.weight"])
            put(b + "attn_output.weight",
                state[pfx + "self_attn.out_proj.weight"])
            put(b + "attn_q_norm.weight",
                state[pfx + "self_attn.q_layernorm.weight"], None)
            put(b + "attn_k_norm.weight",
                state[pfx + "self_attn.k_layernorm.weight"], None)
    w.write()
    return written


def _convert_dbrx(state: Mapping[str, Any], config: Mapping[str, Any],
                  out_path: str, qtype: GGMLType,
                  tokenizer_kv: Mapping[str, Any] | None = None) -> list[str]:
    """HF DbrxForCausalLM -> GGUF arch "dbrx" (reference
    convert_hf_to_gguf.py DbrxModel + llm_build_dbrx): bias-free
    LayerNorms, fused clamped Wqkv, flattened expert tensors w1/v1/w2
    [E*F, d] split into gate/up/down stacks (w2 transposed per expert)."""
    state = _strip(state, "transformer.")
    arch = "dbrx"
    d_model = int(config["d_model"])
    n_layers = int(config["n_layers"])
    ffn_cfg = config.get("ffn_config") or {}
    attn_cfg = config.get("attn_config") or {}
    if hasattr(ffn_cfg, "to_dict"):
        ffn_cfg = ffn_cfg.to_dict()
    if hasattr(attn_cfg, "to_dict"):
        attn_cfg = attn_cfg.to_dict()
    d_ff = int(ffn_cfg.get("ffn_hidden_size", 4 * d_model))
    n_exp = int(ffn_cfg.get("moe_num_experts", 16))
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length", d_ff)
    w.add_kv(f"{arch}.attention.head_count", int(config["n_heads"]))
    w.add_kv(f"{arch}.attention.head_count_kv",
             int(attn_cfg.get("kv_n_heads", config["n_heads"])))
    w.add_kv(f"{arch}.attention.layer_norm_epsilon", 1e-5)
    if attn_cfg.get("clip_qkv"):
        w.add_kv(f"{arch}.attention.clamp_kqv",
                 float(attn_cfg["clip_qkv"]))
    w.add_kv(f"{arch}.rope.freq_base",
             float(attn_cfg.get("rope_theta", 10000.0)))
    w.add_kv(f"{arch}.expert_count", n_exp)
    w.add_kv(f"{arch}.expert_used_count",
             int(ffn_cfg.get("moe_top_k", 4)))
    w.add_kv(f"{arch}.context_length", int(config.get("max_seq_len", 2048)))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)

    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["wte.weight"])
    put("output_norm.weight", state["norm_f.weight"], None)
    if "lm_head.weight" in state:
        put("output.weight", state["lm_head.weight"])
    for i in range(n_layers):
        pfx, b = f"blocks.{i}.", f"blk.{i}."
        put(b + "attn_norm.weight",
            state[pfx + "norm_attn_norm.norm_1.weight"], None)
        put(b + "attn_qkv.weight",
            state[pfx + "norm_attn_norm.attn.Wqkv.weight"])
        put(b + "attn_output.weight",
            state[pfx + "norm_attn_norm.attn.out_proj.weight"])
        put(b + "ffn_norm.weight",
            state[pfx + "norm_attn_norm.norm_2.weight"], None)
        put(b + "ffn_gate_inp.weight",
            state[pfx + "ffn.router.layer.weight"], None)
        w1 = _np(state[pfx + "ffn.experts.mlp.w1"]).reshape(n_exp, d_ff,
                                                            d_model)
        v1 = _np(state[pfx + "ffn.experts.mlp.v1"]).reshape(n_exp, d_ff,
                                                            d_model)
        w2 = _np(state[pfx + "ffn.experts.mlp.w2"]).reshape(n_exp, d_ff,
                                                            d_model)
        put(b + "ffn_gate_exps.weight", w1, qtype)
        put(b + "ffn_up_exps.weight", v1, qtype)
        put(b + "ffn_down_exps.weight",
            np.ascontiguousarray(w2.transpose(0, 2, 1)), qtype)
    w.write()
    return written


def _convert_mamba2(state: Mapping[str, Any], config: Mapping[str, Any],
                    out_path: str, qtype: GGMLType,
                    tokenizer_kv: Mapping[str, Any] | None = None
                    ) -> list[str]:
    """HF Mamba2ForCausalLM -> GGUF arch "mamba2" (reference
    convert_hf_to_gguf.py Mamba2Model + build_mamba2_layer names): dt is
    folded into ssm_in (no x_proj/dt_proj), ssm.time_step_rank carries
    the head count, A_log/D/dt_bias are per-head scalars, and the gated
    group norm lands in ssm_norm."""
    state = _strip(state, "backbone.")
    arch = "mamba2"
    d_model = int(config["hidden_size"])
    d_inner = int(config.get("intermediate_size")
                  or int(config.get("expand", 2)) * d_model)
    n_head = int(config.get("num_heads")
                 or d_inner // int(config.get("head_dim", 64)))
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", int(config["num_hidden_layers"]))
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.ssm.inner_size", d_inner)
    w.add_kv(f"{arch}.ssm.conv_kernel", int(config.get("conv_kernel", 4)))
    w.add_kv(f"{arch}.ssm.state_size", int(config.get("state_size", 128)))
    w.add_kv(f"{arch}.ssm.time_step_rank", n_head)
    w.add_kv(f"{arch}.ssm.group_count", int(config.get("n_groups", 1)))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    w.add_kv(f"{arch}.context_length",
             int(config.get("max_position_embeddings", 1 << 20)))
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             float(config.get("layer_norm_epsilon", 1e-5)))
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)

    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["embeddings.weight"])
    put("output_norm.weight", state["norm_f.weight"], None)
    if ("lm_head.weight" in state
            and not config.get("tie_word_embeddings", True)):
        put("output.weight", state["lm_head.weight"])
    for i in range(int(config["num_hidden_layers"])):
        pfx, b = f"layers.{i}.mixer.", f"blk.{i}."
        put(b + "attn_norm.weight", state[f"layers.{i}.norm.weight"], None)
        put(b + "ssm_in.weight", state[pfx + "in_proj.weight"])
        put(b + "ssm_conv1d.weight",
            _np(state[pfx + "conv1d.weight"])[:, 0, :], None)
        put(b + "ssm_conv1d.bias", state[pfx + "conv1d.bias"], None)
        put(b + "ssm_dt.bias", state[pfx + "dt_bias"], None)
        put(b + "ssm_a", state[pfx + "A_log"], None)
        put(b + "ssm_d", state[pfx + "D"], None)
        # reference Mamba2Model reshapes norm to [n_group, d_inner/n_group]
        put(b + "ssm_norm.weight",
            _np(state[pfx + "norm.weight"]).reshape(
                int(config.get("n_groups", 1)), -1), None)
        put(b + "ssm_out.weight", state[pfx + "out_proj.weight"])
    w.write()
    return written


_T5_SUB = {  # HF block-sublayer names -> GGUF leaf names
    "SelfAttention.q": "attn_q", "SelfAttention.k": "attn_k",
    "SelfAttention.v": "attn_v", "SelfAttention.o": "attn_o",
    "EncDecAttention.q": "cross_attn_q", "EncDecAttention.k": "cross_attn_k",
    "EncDecAttention.v": "cross_attn_v", "EncDecAttention.o": "cross_attn_o",
    "DenseReluDense.wi": "ffn_up", "DenseReluDense.wi_0": "ffn_gate",
    "DenseReluDense.wi_1": "ffn_up", "DenseReluDense.wo": "ffn_down",
}


def _convert_t5(state: Mapping[str, Any], config: Mapping[str, Any],
                out_path: str, qtype: GGMLType,
                tokenizer_kv: Mapping[str, Any] | None = None) -> list[str]:
    """HF T5ForConditionalGeneration / T5EncoderModel -> GGUF arch "t5" /
    "t5encoder" (reference convert_hf_to_gguf.py T5Model): enc.blk.N.* /
    dec.blk.N.* names, relative_attention_bias in block 0, and — when the
    LM head is tied — output.weight pre-scaled by d_model**-0.5 (HF scales
    sequence_output before the tied head; baking it into the weight keeps
    the runtime graph identical to the untied case)."""
    has_dec = any(k.startswith("decoder.") for k in state)
    arch = "t5" if has_dec else "t5encoder"
    d_model = int(config["d_model"])
    n_enc = int(config["num_layers"])
    n_dec = int(config.get("num_decoder_layers", n_enc))
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_enc)
    if has_dec:
        w.add_kv(f"{arch}.decoder_block_count", n_dec)
        w.add_kv(f"{arch}.decoder_start_token_id",
                 int(config.get("decoder_start_token_id", 0)))
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length", int(config["d_ff"]))
    w.add_kv(f"{arch}.attention.head_count", int(config["num_heads"]))
    w.add_kv(f"{arch}.attention.key_length", int(config["d_kv"]))
    w.add_kv(f"{arch}.attention.value_length", int(config["d_kv"]))
    w.add_kv(f"{arch}.attention.relative_buckets_count",
             int(config.get("relative_attention_num_buckets", 32)))
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             float(config.get("layer_norm_epsilon", 1e-6)))
    w.add_kv(f"{arch}.context_length", int(config.get("n_positions", 512)))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)

    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["shared.weight"])
    if has_dec and config.get("tie_word_embeddings", True):
        # a tied state dict still materialises lm_head.weight — the scale
        # bake must win over it
        put("output.weight",
            _np(state["shared.weight"]).astype(np.float32)
            * d_model ** -0.5)
    elif "lm_head.weight" in state:
        put("output.weight", state["lm_head.weight"])
    for side, n_l in (("encoder", n_enc),) + ((("decoder", n_dec),)
                                              if has_dec else ()):
        gp = "enc" if side == "encoder" else "dec"
        put(f"{gp}.output_norm.weight",
            state[f"{side}.final_layer_norm.weight"], None)
        for i in range(n_l):
            for key, val in state.items():
                pre = f"{side}.block.{i}.layer."
                if not key.startswith(pre):
                    continue
                sub = key[len(pre):]  # e.g. "0.SelfAttention.q.weight"
                _, rest = sub.split(".", 1)
                rest = rest.rsplit(".weight", 1)[0]
                if rest == "layer_norm":
                    # sublayer index decides which norm this is
                    li = int(sub.split(".", 1)[0])
                    if li == 0:
                        nm = "attn_norm"
                    elif li == 1 and side == "decoder":
                        nm = "cross_attn_norm"
                    else:
                        nm = "ffn_norm"
                    put(f"{gp}.blk.{i}.{nm}.weight", val, None)
                elif rest == "SelfAttention.relative_attention_bias":
                    put(f"{gp}.blk.{i}.attn_rel_b.weight", val, None)
                elif rest in _T5_SUB:
                    put(f"{gp}.blk.{i}.{_T5_SUB[rest]}.weight", val)
    w.write()
    return written


def _convert_falcon(state: Mapping[str, Any], config: Mapping[str, Any],
                    out_path: str, qtype: GGMLType,
                    tokenizer_kv: Mapping[str, Any] | None = None
                    ) -> list[str]:
    """HF FalconForCausalLM -> GGUF arch "falcon" (reference
    convert_hf_to_gguf.py FalconModel): the fused query_key_value stores
    n_head_kv GROUPS of [q_heads_in_group..., k, v] — rearranged to the
    contiguous [all q; all k; all v] layout; 40b-style models carry two
    per-layer norms (ln_attn -> attn_norm_2 feeds attention, ln_mlp ->
    attn_norm feeds the FFN — llm_build_falcon's 'use the attn norm, not
    the result')."""
    state = _strip(state, "transformer.")
    arch = "falcon"
    d_model = int(config["hidden_size"])
    n_layers = int(config.get("num_hidden_layers", config.get("n_layer")))
    n_heads = int(config.get("num_attention_heads", config.get("n_head")))
    n_kv = (int(config.get("num_kv_heads") or config.get("n_head_kv") or 1)
            if config.get("new_decoder_architecture") else 1)
    hd = d_model // n_heads
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length",
             int(config.get("ffn_hidden_size") or 4 * d_model))
    w.add_kv(f"{arch}.attention.head_count", n_heads)
    w.add_kv(f"{arch}.attention.head_count_kv", n_kv)
    w.add_kv(f"{arch}.context_length",
             int(config.get("max_position_embeddings", 2048)))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    w.add_kv(f"{arch}.attention.layer_norm_epsilon",
             float(config.get("layer_norm_epsilon", 1e-5)))
    w.add_kv(f"{arch}.rope.freq_base",
             float(config.get("rope_theta", 10000.0)))
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)

    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["word_embeddings.weight"])
    put("output_norm.weight", state["ln_f.weight"], None)
    put("output_norm.bias", state["ln_f.bias"], None)
    if ("lm_head.weight" in state
            and not config.get("tie_word_embeddings", True)):
        put("output.weight", state["lm_head.weight"])
    for i in range(n_layers):
        pfx, b = f"h.{i}.", f"blk.{i}."
        if pfx + "ln_attn.weight" in state:  # new decoder arch (40b)
            put(b + "attn_norm_2.weight", state[pfx + "ln_attn.weight"],
                None)
            put(b + "attn_norm_2.bias", state[pfx + "ln_attn.bias"], None)
            put(b + "attn_norm.weight", state[pfx + "ln_mlp.weight"], None)
            put(b + "attn_norm.bias", state[pfx + "ln_mlp.bias"], None)
        else:  # 7b: one shared norm
            put(b + "attn_norm.weight",
                state[pfx + "input_layernorm.weight"], None)
            put(b + "attn_norm.bias", state[pfx + "input_layernorm.bias"],
                None)
        qkv = _np(state[pfx + "self_attention.query_key_value.weight"])
        qkv = qkv.reshape(n_kv, n_heads // n_kv + 2, hd, d_model)
        put(b + "attn_qkv.weight", np.concatenate([
            qkv[:, :-2].reshape(n_heads * hd, d_model),
            qkv[:, -2].reshape(n_kv * hd, d_model),
            qkv[:, -1].reshape(n_kv * hd, d_model)]))
        put(b + "attn_output.weight",
            state[pfx + "self_attention.dense.weight"])
        put(b + "ffn_up.weight", state[pfx + "mlp.dense_h_to_4h.weight"])
        put(b + "ffn_down.weight", state[pfx + "mlp.dense_4h_to_h.weight"])
    w.write()
    return written


def _convert_gptneox(state: Mapping[str, Any], config: Mapping[str, Any],
                     out_path: str, qtype: GGMLType,
                     tokenizer_kv: Mapping[str, Any] | None = None
                     ) -> list[str]:
    """HF GPTNeoXForCausalLM -> GGUF arch "gptneox" (reference
    convert_hf_to_gguf.py GPTNeoXModel): the fused query_key_value weight
    is stored PER-HEAD interleaved ([H, 3, D, d]) and must de-interleave
    into the [q; k; v] concat the engine expects; partial rotary
    (rotary_pct) + use_parallel_residual carried as KVs."""
    state = _strip(state, "gpt_neox.")
    arch = "gptneox"
    d_model = int(config["hidden_size"])
    n_layers = int(config["num_hidden_layers"])
    n_heads = int(config["num_attention_heads"])
    hd = d_model // n_heads
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length", int(config["intermediate_size"]))
    w.add_kv(f"{arch}.attention.head_count", n_heads)
    w.add_kv(f"{arch}.context_length",
             int(config.get("max_position_embeddings", 2048)))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    w.add_kv(f"{arch}.attention.layer_norm_epsilon",
             float(config.get("layer_norm_eps", 1e-5)))
    w.add_kv(f"{arch}.rope.dimension_count",
             int(float(config.get("rotary_pct", 0.25)) * hd))
    w.add_kv(f"{arch}.rope.freq_base",
             float(config.get("rotary_emb_base", 10000.0)))
    w.add_kv(f"{arch}.use_parallel_residual",
             bool(config.get("use_parallel_residual", True)))
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)

    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["embed_in.weight"])
    put("output_norm.weight", state["final_layer_norm.weight"], None)
    put("output_norm.bias", state["final_layer_norm.bias"], None)
    if "embed_out.weight" in state:
        put("output.weight", state["embed_out.weight"])
    for i in range(n_layers):
        pfx, b = f"layers.{i}.", f"blk.{i}."
        put(b + "attn_norm.weight", state[pfx + "input_layernorm.weight"],
            None)
        put(b + "attn_norm.bias", state[pfx + "input_layernorm.bias"], None)
        put(b + "ffn_norm.weight",
            state[pfx + "post_attention_layernorm.weight"], None)
        put(b + "ffn_norm.bias",
            state[pfx + "post_attention_layernorm.bias"], None)
        qkv = _np(state[pfx + "attention.query_key_value.weight"])
        qkv = qkv.reshape(n_heads, 3, hd, d_model)
        put(b + "attn_qkv.weight",
            np.concatenate([qkv[:, 0], qkv[:, 1], qkv[:, 2]])
            .reshape(3 * d_model, d_model))
        qkv_b = _np(state[pfx + "attention.query_key_value.bias"])
        qkv_b = qkv_b.reshape(n_heads, 3, hd)
        put(b + "attn_qkv.bias",
            np.concatenate([qkv_b[:, 0], qkv_b[:, 1], qkv_b[:, 2]])
            .reshape(3 * d_model), None)
        put(b + "attn_output.weight", state[pfx + "attention.dense.weight"])
        put(b + "attn_output.bias", state[pfx + "attention.dense.bias"],
            None)
        put(b + "ffn_up.weight", state[pfx + "mlp.dense_h_to_4h.weight"])
        put(b + "ffn_up.bias", state[pfx + "mlp.dense_h_to_4h.bias"], None)
        put(b + "ffn_down.weight", state[pfx + "mlp.dense_4h_to_h.weight"])
        put(b + "ffn_down.bias", state[pfx + "mlp.dense_4h_to_h.bias"],
            None)
    w.write()
    return written


def _convert_bloom(state: Mapping[str, Any], config: Mapping[str, Any],
                   out_path: str, qtype: GGMLType,
                   tokenizer_kv: Mapping[str, Any] | None = None) -> list[str]:
    """HF BloomForCausalLM -> GGUF arch "bloom" (reference
    convert_hf_to_gguf.py BloomModel + llm_build_bloom): ALiBi attention
    (f_max_alibi_bias = 8, llama-model.cpp:779), embedding LayerNorm
    (token_embd_norm), fused QKV whose HF rows interleave per head as
    [head, (q|k|v), head_dim] — reordered to the straight q|k|v layout."""
    state = _strip(state, "transformer.")
    arch = "bloom"
    d_model = int(config["hidden_size"])
    n_layers = int(config["n_layer"])
    n_heads = int(config["n_head"])
    hd = d_model // n_heads
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length", 4 * d_model)
    w.add_kv(f"{arch}.attention.head_count", n_heads)
    w.add_kv(f"{arch}.attention.layer_norm_epsilon",
             float(config.get("layer_norm_epsilon", 1e-5)))
    w.add_kv(f"{arch}.attention.max_alibi_bias", 8.0)
    w.add_kv(f"{arch}.context_length", 2048)
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)

    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    def deinterleave(arr):
        # rows (n_heads, 3, hd, ...) -> (3, n_heads, hd, ...)
        a = _np(arr)
        return (a.reshape(n_heads, 3, hd, *a.shape[1:])
                .swapaxes(0, 1).reshape(3 * d_model, *a.shape[1:]))

    put("token_embd.weight", state["word_embeddings.weight"])
    put("token_embd_norm.weight",
        state["word_embeddings_layernorm.weight"], None)
    put("token_embd_norm.bias",
        state["word_embeddings_layernorm.bias"], None)
    put("output_norm.weight", state["ln_f.weight"], None)
    put("output_norm.bias", state["ln_f.bias"], None)
    for i in range(n_layers):
        pfx, b = f"h.{i}.", f"blk.{i}."
        put(b + "attn_norm.weight", state[pfx + "input_layernorm.weight"],
            None)
        put(b + "attn_norm.bias", state[pfx + "input_layernorm.bias"], None)
        put(b + "attn_qkv.weight",
            deinterleave(state[pfx + "self_attention.query_key_value.weight"]))
        put(b + "attn_qkv.bias",
            deinterleave(state[pfx + "self_attention.query_key_value.bias"]),
            None)
        put(b + "attn_output.weight", state[pfx + "self_attention.dense.weight"])
        put(b + "attn_output.bias", state[pfx + "self_attention.dense.bias"],
            None)
        put(b + "ffn_norm.weight",
            state[pfx + "post_attention_layernorm.weight"], None)
        put(b + "ffn_norm.bias",
            state[pfx + "post_attention_layernorm.bias"], None)
        put(b + "ffn_up.weight", state[pfx + "mlp.dense_h_to_4h.weight"])
        put(b + "ffn_up.bias", state[pfx + "mlp.dense_h_to_4h.bias"], None)
        put(b + "ffn_down.weight", state[pfx + "mlp.dense_4h_to_h.weight"])
        put(b + "ffn_down.bias", state[pfx + "mlp.dense_4h_to_h.bias"], None)
    w.write()
    return written


def _convert_mpt(state: Mapping[str, Any], config: Mapping[str, Any],
                 out_path: str, qtype: GGMLType,
                 tokenizer_kv: Mapping[str, Any] | None = None) -> list[str]:
    """HF MptForCausalLM -> GGUF arch "mpt" (reference convert_hf_to_gguf.py
    MPTModel + llm_build_mpt): ALiBi (alibi_bias_max from attn_config),
    bias-free LayerNorms (no_bias default), straight-fused Wqkv, un-gated
    GELU FFN, optional clip_qkv."""
    state = _strip(state, "transformer.")
    arch = "mpt"
    d_model = int(config["d_model"])
    n_layers = int(config["n_layers"])
    attn_cfg = config.get("attn_config") or {}
    if hasattr(attn_cfg, "to_dict"):
        attn_cfg = attn_cfg.to_dict()
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length",
             int(config.get("expansion_ratio", 4)) * d_model)
    w.add_kv(f"{arch}.attention.head_count", int(config["n_heads"]))
    w.add_kv(f"{arch}.attention.layer_norm_epsilon",
             float(config.get("layer_norm_epsilon", 1e-5)))
    w.add_kv(f"{arch}.attention.max_alibi_bias",
             float(attn_cfg.get("alibi_bias_max", 8)))
    if attn_cfg.get("clip_qkv"):
        w.add_kv(f"{arch}.attention.clamp_kqv",
                 float(attn_cfg["clip_qkv"]))
    w.add_kv(f"{arch}.context_length", int(config.get("max_seq_len", 2048)))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)

    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["wte.weight"])
    put("output_norm.weight", state["norm_f.weight"], None)
    if "norm_f.bias" in state:
        put("output_norm.bias", state["norm_f.bias"], None)
    for i in range(n_layers):
        pfx, b = f"blocks.{i}.", f"blk.{i}."
        put(b + "attn_norm.weight", state[pfx + "norm_1.weight"], None)
        if pfx + "norm_1.bias" in state:
            put(b + "attn_norm.bias", state[pfx + "norm_1.bias"], None)
        put(b + "attn_qkv.weight", state[pfx + "attn.Wqkv.weight"])
        if pfx + "attn.Wqkv.bias" in state:
            put(b + "attn_qkv.bias", state[pfx + "attn.Wqkv.bias"], None)
        put(b + "attn_output.weight", state[pfx + "attn.out_proj.weight"])
        put(b + "ffn_norm.weight", state[pfx + "norm_2.weight"], None)
        if pfx + "norm_2.bias" in state:
            put(b + "ffn_norm.bias", state[pfx + "norm_2.bias"], None)
        put(b + "ffn_up.weight", state[pfx + "ffn.up_proj.weight"])
        put(b + "ffn_down.weight", state[pfx + "ffn.down_proj.weight"])
    w.write()
    return written


def _convert_gpt2(state: Mapping[str, Any], config: Mapping[str, Any],
                  out_path: str, qtype: GGMLType,
                  tokenizer_kv: Mapping[str, Any] | None = None) -> list[str]:
    """HF GPT2LMHeadModel -> GGUF arch "gpt2" (reference
    convert_hf_to_gguf.py GPT2Model + llm_build_gpt2 names): Conv1D
    weights ([in, out]) transpose to the GGUF [out, in] layout; QKV ships
    pre-fused (attn_qkv); learned position embeddings (position_embd)."""
    state = _strip(state, "transformer.")
    arch = "gpt2"
    d_model = int(config["n_embd"])
    n_layers = int(config["n_layer"])
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length",
             int(config.get("n_inner") or 4 * d_model))
    w.add_kv(f"{arch}.attention.head_count", int(config["n_head"]))
    w.add_kv(f"{arch}.context_length",
             int(config.get("n_positions", config.get("n_ctx", 1024))))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    w.add_kv(f"{arch}.attention.layer_norm_epsilon",
             float(config.get("layer_norm_epsilon", 1e-5)))
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)

    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["wte.weight"])
    put("position_embd.weight", state["wpe.weight"])
    put("output_norm.weight", state["ln_f.weight"], None)
    put("output_norm.bias", state["ln_f.bias"], None)
    if ("lm_head.weight" in state
            and not config.get("tie_word_embeddings", True)):
        put("output.weight", state["lm_head.weight"])
    for i in range(n_layers):
        pfx, b = f"h.{i}.", f"blk.{i}."
        put(b + "attn_norm.weight", state[pfx + "ln_1.weight"], None)
        put(b + "attn_norm.bias", state[pfx + "ln_1.bias"], None)
        put(b + "attn_qkv.weight", _np(state[pfx + "attn.c_attn.weight"]).T)
        put(b + "attn_qkv.bias", state[pfx + "attn.c_attn.bias"], None)
        put(b + "attn_output.weight",
            _np(state[pfx + "attn.c_proj.weight"]).T)
        put(b + "attn_output.bias", state[pfx + "attn.c_proj.bias"], None)
        put(b + "ffn_norm.weight", state[pfx + "ln_2.weight"], None)
        put(b + "ffn_norm.bias", state[pfx + "ln_2.bias"], None)
        put(b + "ffn_up.weight", _np(state[pfx + "mlp.c_fc.weight"]).T)
        put(b + "ffn_up.bias", state[pfx + "mlp.c_fc.bias"], None)
        put(b + "ffn_down.weight", _np(state[pfx + "mlp.c_proj.weight"]).T)
        put(b + "ffn_down.bias", state[pfx + "mlp.c_proj.bias"], None)
    w.write()
    return written


def _convert_jais(state: Mapping[str, Any], config: Mapping[str, Any],
                  out_path: str, qtype: GGMLType,
                  tokenizer_kv: Mapping[str, Any] | None = None) -> list[str]:
    """HF JAISLMHeadModel -> GGUF arch "jais" (reference JaisModel +
    llm_build_jais): GPT-2 topology (Conv1D transpose, fused biased qkv,
    biased LayerNorms) but ALiBi instead of positions, biased SwiGLU FFN
    (c_fc=up, c_fc2=gate), muP scales baked into the embedding/output
    tensors at convert time, and kq_scale = 1/head_dim."""
    import math

    state = _strip(state, "transformer.")
    arch = "jais"
    d_model = int(config["n_embd"])
    n_layers = int(config["n_layer"])
    n_heads = int(config["n_head"])
    emb_scale = float(config.get("mup_embeddings_scale")
                      or config.get("embeddings_scale") or 1.0)
    if config.get("mup_output_alpha") is not None:
        width_scale = (float(config["mup_output_alpha"])
                       * float(config.get("mup_width_scale", 1.0)))
    else:
        width_scale = float(config.get("width_scale", 1.0))
    max_alibi = 8.0
    if "relative_pe.slopes" in state:
        # invert the precomputed slopes into f_max_alibi_bias
        # (JaisModel.modify_tensors)
        closest = 2 ** math.floor(math.log2(n_heads))
        max_alibi = -round(
            math.log2(float(_np(state["relative_pe.slopes"])[0]))
            * closest)
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length",
             int(config.get("n_inner") or 4 * d_model))
    w.add_kv(f"{arch}.attention.head_count", n_heads)
    w.add_kv(f"{arch}.context_length",
             int(config.get("n_positions", 2048)))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    w.add_kv(f"{arch}.attention.layer_norm_epsilon",
             float(config.get("layer_norm_epsilon", 1e-5)))
    w.add_kv(f"{arch}.attention.max_alibi_bias", float(max_alibi))
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)
    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    wte = _np(state["wte.weight"]).astype(np.float32)
    put("token_embd.weight", wte * emb_scale)
    put("output_norm.weight", state["ln_f.weight"], None)
    put("output_norm.bias", state["ln_f.bias"], None)
    head = _np(state.get("lm_head.weight", wte)).astype(np.float32)
    put("output.weight", head * width_scale)
    for i in range(n_layers):
        pfx, b = f"h.{i}.", f"blk.{i}."
        put(b + "attn_norm.weight", state[pfx + "ln_1.weight"], None)
        put(b + "attn_norm.bias", state[pfx + "ln_1.bias"], None)
        put(b + "attn_qkv.weight", _np(state[pfx + "attn.c_attn.weight"]).T)
        put(b + "attn_qkv.bias", state[pfx + "attn.c_attn.bias"], None)
        put(b + "attn_output.weight",
            _np(state[pfx + "attn.c_proj.weight"]).T)
        put(b + "attn_output.bias", state[pfx + "attn.c_proj.bias"], None)
        put(b + "ffn_norm.weight", state[pfx + "ln_2.weight"], None)
        put(b + "ffn_norm.bias", state[pfx + "ln_2.bias"], None)
        put(b + "ffn_up.weight", _np(state[pfx + "mlp.c_fc.weight"]).T)
        put(b + "ffn_up.bias", state[pfx + "mlp.c_fc.bias"], None)
        put(b + "ffn_gate.weight", _np(state[pfx + "mlp.c_fc2.weight"]).T)
        put(b + "ffn_gate.bias", state[pfx + "mlp.c_fc2.bias"], None)
        put(b + "ffn_down.weight", _np(state[pfx + "mlp.c_proj.weight"]).T)
        put(b + "ffn_down.bias", state[pfx + "mlp.c_proj.bias"], None)
    w.write()
    return written


def _convert_codeshell(state: Mapping[str, Any], config: Mapping[str, Any],
                       out_path: str, qtype: GGMLType,
                       tokenizer_kv: Mapping[str, Any] | None = None
                       ) -> list[str]:
    """HF CodeShellForCausalLM -> GGUF arch "codeshell" (reference
    CodeShellModel + llm_build_codeshell): StarCoder-style grouped-query
    fused c_attn (nn.Linear, no transpose) + biased LayerNorms + un-gated
    GELU FFN, but NeoX rope instead of learned positions."""
    state = _strip(state, "transformer.")
    arch = "codeshell"
    d_model = int(config["n_embd"])
    n_layers = int(config["n_layer"])
    n_heads = int(config["n_head"])
    n_kv = int(config.get("num_query_groups", 1))
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length",
             int(config.get("n_inner") or 4 * d_model))
    w.add_kv(f"{arch}.attention.head_count", n_heads)
    w.add_kv(f"{arch}.attention.head_count_kv", n_kv)
    w.add_kv(f"{arch}.context_length",
             int(config.get("n_positions", 8192)))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    w.add_kv(f"{arch}.attention.layer_norm_epsilon",
             float(config.get("layer_norm_epsilon", 1e-5)))
    w.add_kv(f"{arch}.rope.freq_base",
             float(config.get("rope_theta", 10000.0)))
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)
    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["wte.weight"])
    put("output_norm.weight", state["ln_f.weight"], None)
    put("output_norm.bias", state["ln_f.bias"], None)
    if ("lm_head.weight" in state
            and not config.get("tie_word_embeddings", True)):
        put("output.weight", state["lm_head.weight"])
    for i in range(n_layers):
        pfx, b = f"h.{i}.", f"blk.{i}."
        put(b + "attn_norm.weight", state[pfx + "ln_1.weight"], None)
        put(b + "attn_norm.bias", state[pfx + "ln_1.bias"], None)
        put(b + "attn_qkv.weight", state[pfx + "attn.c_attn.weight"])
        put(b + "attn_qkv.bias", state[pfx + "attn.c_attn.bias"], None)
        put(b + "attn_output.weight", state[pfx + "attn.c_proj.weight"])
        put(b + "attn_output.bias", state[pfx + "attn.c_proj.bias"], None)
        put(b + "ffn_norm.weight", state[pfx + "ln_2.weight"], None)
        put(b + "ffn_norm.bias", state[pfx + "ln_2.bias"], None)
        put(b + "ffn_up.weight", state[pfx + "mlp.c_fc.weight"])
        put(b + "ffn_up.bias", state[pfx + "mlp.c_fc.bias"], None)
        put(b + "ffn_down.weight", state[pfx + "mlp.c_proj.weight"])
        put(b + "ffn_down.bias", state[pfx + "mlp.c_proj.bias"], None)
    w.write()
    return written


def _convert_gptj(state: Mapping[str, Any], config: Mapping[str, Any],
                  out_path: str, qtype: GGMLType,
                  tokenizer_kv: Mapping[str, Any] | None = None) -> list[str]:
    """HF GPTJForCausalLM -> GGUF arch "gptj": parallel residual (one
    shared ln_1 feeds attention AND ffn), partial NORM rotary over the
    first rotary_dim columns, un-gated GELU FFN with biases, biased LM
    head. The reference declares LLM_ARCH_GPTJ (llama-arch.h) but ships
    no graph for it — we support both conversion and inference."""
    state = _strip(state, "transformer.")
    arch = "gptj"
    d_model = int(config["n_embd"])
    n_layers = int(config["n_layer"])
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length",
             int(config.get("n_inner") or 4 * d_model))
    w.add_kv(f"{arch}.attention.head_count", int(config["n_head"]))
    w.add_kv(f"{arch}.rope.dimension_count",
             int(config.get("rotary_dim") or d_model // int(config["n_head"])))
    w.add_kv(f"{arch}.context_length",
             int(config.get("n_positions", 2048)))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    w.add_kv(f"{arch}.attention.layer_norm_epsilon",
             float(config.get("layer_norm_epsilon", 1e-5)))
    w.add_kv(f"{arch}.rope.freq_base",
             float(config.get("rope_theta", 10000.0)))
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)
    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["wte.weight"])
    put("output_norm.weight", state["ln_f.weight"], None)
    put("output_norm.bias", state["ln_f.bias"], None)
    put("output.weight", state["lm_head.weight"])
    if "lm_head.bias" in state:
        put("output.bias", state["lm_head.bias"], None)
    for i in range(n_layers):
        pfx, b = f"h.{i}.", f"blk.{i}."
        put(b + "attn_norm.weight", state[pfx + "ln_1.weight"], None)
        put(b + "attn_norm.bias", state[pfx + "ln_1.bias"], None)
        put(b + "attn_q.weight", state[pfx + "attn.q_proj.weight"])
        put(b + "attn_k.weight", state[pfx + "attn.k_proj.weight"])
        put(b + "attn_v.weight", state[pfx + "attn.v_proj.weight"])
        put(b + "attn_output.weight", state[pfx + "attn.out_proj.weight"])
        put(b + "ffn_up.weight", state[pfx + "mlp.fc_in.weight"])
        put(b + "ffn_up.bias", state[pfx + "mlp.fc_in.bias"], None)
        put(b + "ffn_down.weight", state[pfx + "mlp.fc_out.weight"])
        put(b + "ffn_down.bias", state[pfx + "mlp.fc_out.bias"], None)
    w.write()
    return written


def _convert_starcoder(state: Mapping[str, Any], config: Mapping[str, Any],
                       out_path: str, qtype: GGMLType,
                       tokenizer_kv: Mapping[str, Any] | None = None
                       ) -> list[str]:
    """HF GPTBigCodeForCausalLM -> GGUF arch "starcoder" (reference
    StarCoderModel + llm_build_starcoder, llama-model.cpp:7670): GPT-2
    topology with multi-query attention — fused c_attn is
    [d + 2*kv_dim, d] (nn.Linear, NOT Conv1D: no transpose), learned
    positions, biased LayerNorms, un-gated GELU FFN."""
    state = _strip(state, "transformer.")
    arch = "starcoder"
    d_model = int(config["n_embd"])
    n_layers = int(config["n_layer"])
    n_heads = int(config["n_head"])
    n_kv = 1 if config.get("multi_query", True) else n_heads
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length",
             int(config.get("n_inner") or 4 * d_model))
    w.add_kv(f"{arch}.attention.head_count", n_heads)
    w.add_kv(f"{arch}.attention.head_count_kv", n_kv)
    w.add_kv(f"{arch}.context_length",
             int(config.get("n_positions", 8192)))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    w.add_kv(f"{arch}.attention.layer_norm_epsilon",
             float(config.get("layer_norm_epsilon", 1e-5)))
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)

    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["wte.weight"])
    put("position_embd.weight", state["wpe.weight"])
    put("output_norm.weight", state["ln_f.weight"], None)
    put("output_norm.bias", state["ln_f.bias"], None)
    if ("lm_head.weight" in state
            and not config.get("tie_word_embeddings", True)):
        put("output.weight", state["lm_head.weight"])
    for i in range(n_layers):
        pfx, b = f"h.{i}.", f"blk.{i}."
        put(b + "attn_norm.weight", state[pfx + "ln_1.weight"], None)
        put(b + "attn_norm.bias", state[pfx + "ln_1.bias"], None)
        put(b + "attn_qkv.weight", state[pfx + "attn.c_attn.weight"])
        put(b + "attn_qkv.bias", state[pfx + "attn.c_attn.bias"], None)
        put(b + "attn_output.weight", state[pfx + "attn.c_proj.weight"])
        put(b + "attn_output.bias", state[pfx + "attn.c_proj.bias"], None)
        put(b + "ffn_norm.weight", state[pfx + "ln_2.weight"], None)
        put(b + "ffn_norm.bias", state[pfx + "ln_2.bias"], None)
        put(b + "ffn_up.weight", state[pfx + "mlp.c_fc.weight"])
        put(b + "ffn_up.bias", state[pfx + "mlp.c_fc.bias"], None)
        put(b + "ffn_down.weight", state[pfx + "mlp.c_proj.weight"])
        put(b + "ffn_down.bias", state[pfx + "mlp.c_proj.bias"], None)
    w.write()
    return written


def _convert_jamba(state: Mapping[str, Any], config: Mapping[str, Any],
                   out_path: str, qtype: GGMLType,
                   tokenizer_kv: Mapping[str, Any] | None = None) -> list[str]:
    """HF JambaForCausalLM -> GGUF arch "jamba" (reference
    convert_hf_to_gguf.py JambaModel): attention.head_count_kv is a
    per-layer VECTOR (0 = mamba layer), expert stacks merge to 3-D
    ffn_*_exps, conv1d drops its depthwise singleton dim."""
    state = _strip(state, "model.")
    arch = "jamba"
    d_model = int(config["hidden_size"])
    n_layers = int(config["num_hidden_layers"])
    n_heads = int(config["num_attention_heads"])
    n_kv = int(config["num_key_value_heads"])
    d_inner = int(config.get("mamba_expand", 2)) * d_model
    dt_rank = config.get("mamba_dt_rank") or -(-d_model // 16)
    attn_off = int(config.get("attn_layer_offset", 1))
    attn_per = int(config.get("attn_layer_period", 8))
    n_exp = int(config.get("num_experts", 0))
    kv_vec = [n_kv if i >= attn_off and (i - attn_off) % attn_per == 0
              else 0 for i in range(n_layers)]

    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length", int(config["intermediate_size"]))
    w.add_kv(f"{arch}.attention.head_count", n_heads)
    w.add_kv(f"{arch}.attention.head_count_kv", kv_vec)
    w.add_kv(f"{arch}.attention.key_length", d_model // n_heads)
    w.add_kv(f"{arch}.ssm.inner_size", d_inner)
    w.add_kv(f"{arch}.ssm.conv_kernel", int(config.get("mamba_d_conv", 4)))
    w.add_kv(f"{arch}.ssm.state_size", int(config.get("mamba_d_state", 16)))
    w.add_kv(f"{arch}.ssm.time_step_rank", int(dt_rank))
    if n_exp > 1:
        w.add_kv(f"{arch}.expert_count", n_exp)
        w.add_kv(f"{arch}.expert_used_count",
                 int(config.get("num_experts_per_tok", 2)))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             float(config.get("rms_norm_eps", 1e-6)))
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)

    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["embed_tokens.weight"])
    put("output_norm.weight", state["final_layernorm.weight"], None)
    if ("lm_head.weight" in state
            and not config.get("tie_word_embeddings", True)):
        put("output.weight", state["lm_head.weight"])
    for i in range(n_layers):
        pfx, b = f"layers.{i}.", f"blk.{i}."
        put(b + "attn_norm.weight", state[pfx + "input_layernorm.weight"],
            None)
        put(b + "ffn_norm.weight", state[pfx + "pre_ff_layernorm.weight"],
            None)
        if kv_vec[i] == 0:
            mm = pfx + "mamba."
            put(b + "ssm_in.weight", state[mm + "in_proj.weight"])
            put(b + "ssm_conv1d.weight",
                _np(state[mm + "conv1d.weight"])[:, 0, :], None)
            put(b + "ssm_conv1d.bias", state[mm + "conv1d.bias"], None)
            put(b + "ssm_x.weight", state[mm + "x_proj.weight"])
            put(b + "ssm_dt.weight", state[mm + "dt_proj.weight"], None)
            put(b + "ssm_dt.bias", state[mm + "dt_proj.bias"], None)
            put(b + "ssm_dt_norm.weight", state[mm + "dt_layernorm.weight"],
                None)
            put(b + "ssm_b_norm.weight", state[mm + "b_layernorm.weight"],
                None)
            put(b + "ssm_c_norm.weight", state[mm + "c_layernorm.weight"],
                None)
            put(b + "ssm_a", state[mm + "A_log"], None)
            put(b + "ssm_d", state[mm + "D"], None)
            put(b + "ssm_out.weight", state[mm + "out_proj.weight"])
        else:
            at = pfx + "self_attn."
            put(b + "attn_q.weight", state[at + "q_proj.weight"])
            put(b + "attn_k.weight", state[at + "k_proj.weight"])
            put(b + "attn_v.weight", state[at + "v_proj.weight"])
            put(b + "attn_output.weight", state[at + "o_proj.weight"])
        ff = pfx + "feed_forward."
        if ff + "router.weight" in state:
            put(b + "ffn_gate_inp.weight", state[ff + "router.weight"],
                None)
            for wid, gg in (("gate_proj", "ffn_gate_exps"),
                            ("up_proj", "ffn_up_exps"),
                            ("down_proj", "ffn_down_exps")):
                stack = np.stack([
                    _np(state[f"{ff}experts.{e}.{wid}.weight"])
                    for e in range(n_exp)])
                put(b + f"{gg}.weight", stack)
        else:
            put(b + "ffn_gate.weight", state[ff + "gate_proj.weight"])
            put(b + "ffn_up.weight", state[ff + "up_proj.weight"])
            put(b + "ffn_down.weight", state[ff + "down_proj.weight"])
    w.write()
    return written


def _convert_rwkv6(state: Mapping[str, Any], config: Mapping[str, Any],
                   out_path: str, qtype: GGMLType,
                   tokenizer_kv: Mapping[str, Any] | None = None) -> list[str]:
    """HF Rwkv6ForCausalLM (rwkv.blocks.* remote-code layout) -> GGUF arch
    "rwkv6" with the reference exporter's layouts (convert_hf_to_gguf.py
    Rwkv6Model): time_maa_w1/time_decay_w1/time_decay_w2 transposed to
    [out, in], time_maa_w2 permuted to [5, C, W], the five per-branch lerp
    vectors fused into time_mix_lerp_fused [5, 1, C] (order w,k,v,r,g),
    decay/lerps squeezed to [C], and — when rescale_every > 0 —
    time_mix_output / channel_mix_value pre-divided by 2^(layer//n) to
    match the runtime's 0.5 residual rescale (llm_build_rwkv6)."""
    state = _strip(state, "rwkv.")
    arch = "rwkv6"
    d_model = int(config["hidden_size"])
    n_layers = int(config["num_hidden_layers"])
    head_size = int(config.get("head_size", 64))
    rescale = int(config.get("rescale_every", 6))
    d_ff = int(config.get("intermediate_size")
               or int(d_model * 3.5) // 32 * 32)
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length", d_ff)
    w.add_kv(f"{arch}.wkv.head_size", head_size)
    w.add_kv(f"{arch}.rescale_every_n_layers", rescale)
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    w.add_kv(f"{arch}.context_length",
             int(config.get("max_position_embeddings", 1 << 20)))
    w.add_kv(f"{arch}.attention.layer_norm_epsilon",
             float(config.get("layer_norm_epsilon", 1e-5)))
    # reference writes these (unused by the graph; sized per Rwkv6Model)
    w.add_kv(f"{arch}.time_mix_extra_dim", 64 if d_model == 4096 else 32)
    w.add_kv(f"{arch}.time_decay_extra_dim", 128 if d_model == 4096 else 64)
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)

    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["embeddings.weight"])
    put("token_embd_norm.weight", state["blocks.0.pre_ln.weight"], None)
    put("token_embd_norm.bias", state["blocks.0.pre_ln.bias"], None)
    put("output_norm.weight", state["ln_out.weight"], None)
    put("output_norm.bias", state["ln_out.bias"], None)
    if "head.weight" in state:
        put("output.weight", state["head.weight"])
    for i in range(n_layers):
        pfx, b = f"blocks.{i}.", f"blk.{i}."
        att, ffn = pfx + "attention.", pfx + "feed_forward."
        div = float(2 ** (i // rescale)) if rescale > 0 else 1.0
        put(b + "attn_norm.weight", state[pfx + "ln1.weight"], None)
        put(b + "attn_norm.bias", state[pfx + "ln1.bias"], None)
        put(b + "attn_norm_2.weight", state[pfx + "ln2.weight"], None)
        put(b + "attn_norm_2.bias", state[pfx + "ln2.bias"], None)
        put(b + "time_mix_lerp_x.weight",
            _np(state[att + "time_maa_x"]).reshape(-1), None)
        put(b + "time_mix_lerp_fused.weight",
            np.stack([_np(state[att + f"time_maa_{s}"]).reshape(1, -1)
                      for s in "wkvrg"]), None)
        put(b + "time_mix_w1.weight",
            _np(state[att + "time_maa_w1"]).T, None)
        put(b + "time_mix_w2.weight",
            _np(state[att + "time_maa_w2"]).transpose(0, 2, 1), None)
        put(b + "time_mix_decay.weight",
            _np(state[att + "time_decay"]).reshape(-1), None)
        put(b + "time_mix_decay_w1.weight",
            _np(state[att + "time_decay_w1"]).T, None)
        put(b + "time_mix_decay_w2.weight",
            _np(state[att + "time_decay_w2"]).T, None)
        put(b + "time_mix_first.weight", state[att + "time_faaaa"], None)
        put(b + "time_mix_key.weight", state[att + "key.weight"])
        put(b + "time_mix_value.weight", state[att + "value.weight"])
        put(b + "time_mix_receptance.weight",
            state[att + "receptance.weight"])
        put(b + "time_mix_gate.weight", state[att + "gate.weight"])
        put(b + "time_mix_ln.weight", state[att + "ln_x.weight"], None)
        put(b + "time_mix_ln.bias", state[att + "ln_x.bias"], None)
        put(b + "time_mix_output.weight",
            _np(state[att + "output.weight"]) / div)
        put(b + "channel_mix_lerp_k.weight",
            _np(state[ffn + "time_maa_k"]).reshape(-1), None)
        put(b + "channel_mix_lerp_r.weight",
            _np(state[ffn + "time_maa_r"]).reshape(-1), None)
        put(b + "channel_mix_key.weight", state[ffn + "key.weight"])
        put(b + "channel_mix_value.weight",
            _np(state[ffn + "value.weight"]) / div)
        put(b + "channel_mix_receptance.weight",
            state[ffn + "receptance.weight"])
    w.write()
    return written


def _convert_gemma_embedding(state: Mapping[str, Any],
                             config: Mapping[str, Any], out_path: str,
                             qtype: GGMLType,
                             tokenizer_kv: Mapping[str, Any] | None = None,
                             ) -> list[str]:
    """HF Gemma3TextModel (EmbeddingGemma) -> GGUF arch "gemma-embedding"
    (reference convert_hf_to_gguf.py EmbeddingGemma(Gemma3Model)): gemma3
    sandwich-norm tensor names with the +1 RMS-norm shift, plus
    pooling_type and the optional sentence-transformers dense_2/dense_3
    projections (state keys "2_Dense.linear.weight" / "3_Dense.linear
    .weight", generate_extra_tensors)."""
    state = _strip(state, "model.")
    arch = "gemma-embedding"
    d_model = int(config["hidden_size"])
    n_layers = int(config["num_hidden_layers"])
    n_heads = int(config.get("num_attention_heads", 8))
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length",
             int(config["intermediate_size"]))
    w.add_kv(f"{arch}.attention.head_count", n_heads)
    w.add_kv(f"{arch}.attention.head_count_kv",
             int(config.get("num_key_value_heads", 4)))
    w.add_kv(f"{arch}.attention.key_length",
             int(config.get("head_dim", 256)))
    w.add_kv(f"{arch}.attention.value_length",
             int(config.get("head_dim", 256)))
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             float(config.get("rms_norm_eps", 1e-6)))
    w.add_kv(f"{arch}.context_length",
             int(config.get("max_position_embeddings", 131072)))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    w.add_kv(f"{arch}.rope.freq_base",
             float(config.get("rope_theta", 1_000_000.0)))
    w.add_kv(f"{arch}.attention.sliding_window",
             int(config["sliding_window"]))
    w.add_kv(f"{arch}.pooling_type", int(config.get("pooling_type", 1)))
    dense = {}
    for idx in (2, 3):
        k = f"{idx}_Dense.linear.weight"
        if k in state:
            dense[f"dense_{idx}"] = _np(state[k])
            w.add_kv(f"{arch}.dense_{idx}_feat_in", dense[f"dense_{idx}"].shape[1])
            w.add_kv(f"{arch}.dense_{idx}_feat_out", dense[f"dense_{idx}"].shape[0])
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)

    written = []

    def put(name, arr, q=qtype):
        if name.endswith("norm.weight"):  # Gemma +1 RMS shift
            arr = _np(arr).astype(np.float32) + 1.0
            q = None
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["embed_tokens.weight"])
    put("output_norm.weight", state["norm.weight"])
    for nm, arr in dense.items():
        _add(w, nm + ".weight", arr, qtype)
        written.append(nm + ".weight")
    gmap = {
        "self_attn.q_proj.weight": "attn_q.weight",
        "self_attn.k_proj.weight": "attn_k.weight",
        "self_attn.v_proj.weight": "attn_v.weight",
        "self_attn.o_proj.weight": "attn_output.weight",
        "self_attn.q_norm.weight": "attn_q_norm.weight",
        "self_attn.k_norm.weight": "attn_k_norm.weight",
        "input_layernorm.weight": "attn_norm.weight",
        "post_attention_layernorm.weight": "post_attention_norm.weight",
        "pre_feedforward_layernorm.weight": "ffn_norm.weight",
        "post_feedforward_layernorm.weight": "post_ffw_norm.weight",
        "mlp.gate_proj.weight": "ffn_gate.weight",
        "mlp.up_proj.weight": "ffn_up.weight",
        "mlp.down_proj.weight": "ffn_down.weight",
    }
    for i in range(n_layers):
        for hf, gg in gmap.items():
            put(f"blk.{i}.{gg}", state[f"layers.{i}.{hf}"])
    w.write()
    return written


def _convert_rwkv6qwen2(state: Mapping[str, Any], config: Mapping[str, Any],
                        out_path: str, qtype: GGMLType,
                        tokenizer_kv: Mapping[str, Any] | None = None,
                        ) -> list[str]:
    """HF RWKV6Qwen2ForCausalLM (QRWKV: qwen2 topology with GLA time mix)
    -> GGUF arch "rwkv6qwen2" (reference convert_hf_to_gguf.py
    RWKV6Qwen2Model): rwkv6 tensor transforms, with time_maa_w1/w2's five
    blocks permuted from the checkpoint's r,k,v,w,g order to the GGUF
    w,k,v,r,g convention; RMS norms and SwiGLU FFN keep qwen2 names;
    token_shift_count=1, GQA head_count_kv, no time_faaaa / ln_x."""
    state = _strip(state, "model.")
    arch = "rwkv6qwen2"
    d_model = int(config["hidden_size"])
    n_layers = int(config["num_hidden_layers"])
    n_heads = int(config["num_attention_heads"])
    head_size = d_model // n_heads
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length", int(config["intermediate_size"]))
    w.add_kv(f"{arch}.wkv.head_size", head_size)
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    w.add_kv(f"{arch}.context_length", 1 << 20)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             float(config.get("rms_norm_eps", 1e-6)))
    w.add_kv(f"{arch}.token_shift_count", 1)
    w.add_kv(f"{arch}.attention.head_count", 0)
    w.add_kv(f"{arch}.attention.head_count_kv",
             int(config.get("num_key_value_heads", n_heads)))
    w.add_kv(f"{arch}.time_mix_extra_dim",
             int(config.get("lora_rank_tokenshift",
                            64 if d_model >= 4096 else 32)))
    w.add_kv(f"{arch}.time_decay_extra_dim",
             int(config.get("lora_rank_decay",
                            128 if d_model >= 4096 else 64)))
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)

    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    def rkvwg_to_wkvrg(a, blocks_last: bool):
        """Permute the five stacked lora blocks r,k,v,w,g -> w,k,v,r,g
        (reference RWKV6Qwen2Model.modify_tensors)."""
        if blocks_last:  # w1 [C, 5W] -> transpose later; blocks on axis -1
            b = _np(a).reshape(_np(a).shape[0], 5, -1)
            return b[:, [3, 1, 2, 0, 4]].reshape(_np(a).shape)
        b = _np(a)  # w2 [5, W, C]
        return b[[3, 1, 2, 0, 4]]

    put("token_embd.weight", state["embed_tokens.weight"])
    put("output_norm.weight", state["norm.weight"], None)
    if "lm_head.weight" in state:
        put("output.weight", state["lm_head.weight"])
    for i in range(n_layers):
        pfx, b = f"layers.{i}.", f"blk.{i}."
        att = pfx + "self_attn."
        put(b + "attn_norm.weight", state[pfx + "input_layernorm.weight"],
            None)
        put(b + "ffn_norm.weight",
            state[pfx + "post_attention_layernorm.weight"], None)
        put(b + "time_mix_lerp_x.weight",
            _np(state[att + "time_maa_x"]).reshape(-1), None)
        put(b + "time_mix_lerp_fused.weight",
            np.stack([_np(state[att + f"time_maa_{s}"]).reshape(1, -1)
                      for s in "wkvrg"]), None)
        put(b + "time_mix_w1.weight",
            rkvwg_to_wkvrg(state[att + "time_maa_w1"], True).T, None)
        put(b + "time_mix_w2.weight",
            rkvwg_to_wkvrg(state[att + "time_maa_w2"],
                           False).transpose(0, 2, 1), None)
        put(b + "time_mix_decay.weight",
            _np(state[att + "time_decay"]).reshape(-1), None)
        put(b + "time_mix_decay_w1.weight",
            _np(state[att + "time_decay_w1"]).T, None)
        put(b + "time_mix_decay_w2.weight",
            _np(state[att + "time_decay_w2"]).T, None)
        put(b + "time_mix_key.weight", state[att + "k_proj.weight"])
        put(b + "time_mix_value.weight", state[att + "v_proj.weight"])
        put(b + "time_mix_receptance.weight", state[att + "q_proj.weight"])
        for hf, gg in (("k_proj", "time_mix_key"),
                       ("v_proj", "time_mix_value"),
                       ("q_proj", "time_mix_receptance")):
            if att + hf + ".bias" in state:
                put(b + gg + ".bias", state[att + hf + ".bias"], None)
        put(b + "time_mix_gate.weight", state[att + "gate.weight"])
        put(b + "time_mix_output.weight", state[att + "o_proj.weight"])
        put(b + "ffn_gate.weight", state[pfx + "mlp.gate_proj.weight"])
        put(b + "ffn_up.weight", state[pfx + "mlp.up_proj.weight"])
        put(b + "ffn_down.weight", state[pfx + "mlp.down_proj.weight"])
    w.write()
    return written


_BERT_LAYER_MAP = {
    "attention.self.query": "attn_q",
    "attention.self.key": "attn_k",
    "attention.self.value": "attn_v",
    "attention.output.dense": "attn_output",
    "attention.output.LayerNorm": "attn_output_norm",
    "intermediate.dense": "ffn_up",
    "output.dense": "ffn_down",
    "output.LayerNorm": "layer_output_norm",
}


def _convert_bert(state: Mapping[str, Any], config: Mapping[str, Any],
                  out_path: str, qtype: GGMLType,
                  tokenizer_kv: Mapping[str, Any] | None = None) -> list[str]:
    """HF BertModel / BertForSequenceClassification -> GGUF arch "bert"
    (reference convert_hf_to_gguf.py BertModel): post-norm encoder blocks
    with biased projections, learned positions + token types, optional
    rank-classifier cls heads.  Pooling defaults to CLS (2); a
    single-logit classifier flips it to RANK (4)."""
    state = _strip(state, "bert.", "roberta.")
    arch = "bert"
    if config.get("model_type") == "xlm-roberta":
        # XLMRoberta position ids start at pad_token_id+1: chop the
        # offset rows so GGUF positions index from 0 (reference
        # XLMRobertaModel._position_offset)
        off = int(config.get("pad_token_id", 1)) + 1
        k = "embeddings.position_embeddings.weight"
        if k in state:
            state = dict(state)
            state[k] = _np(state[k])[off:]
            config = dict(config)
            config["max_position_embeddings"] = (
                int(config["max_position_embeddings"]) - off)
    w = GGUFWriter(out_path)
    n_layers = int(config["num_hidden_layers"])
    pooling = int(config.get("pooling_type", 2))  # LLAMA_POOLING_TYPE_CLS
    has_cls = "classifier.weight" in state
    if has_cls:
        pooling = 4  # RANK (cross-encoder reranker)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", int(config["hidden_size"]))
    w.add_kv(f"{arch}.feed_forward_length", int(config["intermediate_size"]))
    w.add_kv(f"{arch}.attention.head_count",
             int(config["num_attention_heads"]))
    w.add_kv(f"{arch}.attention.layer_norm_epsilon",
             float(config.get("layer_norm_eps", 1e-12)))
    w.add_kv(f"{arch}.context_length",
             int(config.get("max_position_embeddings", 512)))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    w.add_kv(f"{arch}.token_type_count", int(config.get("type_vocab_size", 2)))
    w.add_kv(f"{arch}.pooling_type", pooling)
    w.add_kv(f"{arch}.activation",
             str(config.get("hidden_act", "gelu")))
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)

    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["embeddings.word_embeddings.weight"])
    put("position_embd.weight",
        state["embeddings.position_embeddings.weight"], None)
    if "embeddings.token_type_embeddings.weight" in state:
        put("token_types.weight",
            state["embeddings.token_type_embeddings.weight"], None)
    put("token_embd_norm.weight", state["embeddings.LayerNorm.weight"], None)
    put("token_embd_norm.bias", state["embeddings.LayerNorm.bias"], None)
    for i in range(n_layers):
        for hf, gg in _BERT_LAYER_MAP.items():
            for part in ("weight", "bias"):
                key = f"encoder.layer.{i}.{hf}.{part}"
                q = qtype if part == "weight" and "Norm" not in hf else None
                put(f"blk.{i}.{gg}.{part}", state[key], q)
    if "pooler.dense.weight" in state and has_cls:
        # rank head: pooler dense (tanh) -> classifier logit
        put("cls.weight", state["pooler.dense.weight"], None)
        put("cls.bias", state["pooler.dense.bias"], None)
    if has_cls:
        put("cls.output.weight", state["classifier.weight"], None)
        put("cls.output.bias", state["classifier.bias"], None)
    w.write()
    return written


def _convert_bert_variant(state: Mapping[str, Any],
                          config: Mapping[str, Any], out_path: str,
                          qtype: GGMLType, arch: str,
                          tokenizer_kv: Mapping[str, Any] | None = None,
                          ) -> list[str]:
    """Embedding-BERT family -> GGUF (reference convert_hf_to_gguf.py
    NomicBertModel / JinaBertV2Model / NeoBert / XLMRobertaModel):

    - nomic-bert      rope-NEOX, fused Wqkv (no bias), SwiGLU fc11/fc12
    - nomic-bert-moe  + biased projections, GELU fc1/fc2 dense layers and
                      up/down-only routed experts on layers il%2==1
    - jina-bert-v2    learned-position-free ALiBi(8), fused GEGLU
                      gated_layers, biased down (mlp.wo)
    - jina-bert-v3    XLMRoberta naming + rope-NEOX (lora-parametrized
                      weights unwrapped), biased GELU FFN
    - neo-bert        pre-norm RMS, fused qkv, rope-NORM, SwiGLU w12/w3
    """
    state = dict(state)
    if arch == "neo-bert":
        # NeoBERT checkpoints prefix "model." and carry an LM "decoder."
        state = {k[6:] if k.startswith("model.") else k: v
                 for k, v in state.items() if not k.startswith("decoder.")}
    if arch == "jina-bert-v3":
        # bge-reranker style prefix + jina-v3 lora parametrizations:
        # "….parametrizations.weight.original" is the base weight
        clean = {}
        for k, v in state.items():
            if k.startswith("roberta."):
                k = k[8:]
            if ".parametrizations." in k:
                if k.endswith(".original"):
                    k = k.replace(".parametrizations.", ".")[:-9]
                else:
                    continue  # task-lora stacks: separate adapters
            clean[k] = v
        state = clean

    g = lambda *keys_dflt: next(
        (config[k] for k in keys_dflt[:-1] if k in config), keys_dflt[-1])
    n_layers = int(g("num_hidden_layers", "n_layer", 0))
    d_model = int(g("hidden_size", "n_embd", 0))
    n_heads = int(g("num_attention_heads", "n_head", 0))
    d_ff = int(g("intermediate_size", "n_inner", 0))
    if arch == "neo-bert":
        # reference writes 2/3 of intermediate as n_ff (NeoBert)
        d_ff = int(2 * d_ff / 3)
    n_ctx = int(g("max_position_embeddings", "n_positions",
                  "max_length", 512))
    if arch in ("nomic-bert", "nomic-bert-moe"):
        # nomic v1/v1.5 are trained for 2048, v2-moe for 512
        # (reference NomicBertModel.__init__ n_positions clamp)
        mtp = int(config.get("max_trained_positions", 2048))
        n_ctx = 2048 if (n_ctx == 8192 and mtp == 2048) else \
            512 if n_ctx == 2048 else n_ctx
    moe_every = int(config.get("moe_every_n_layers", 0) or 0)
    pooling = int(config.get("pooling_type",
                             2 if arch == "neo-bert" else 1))

    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length", d_ff)
    w.add_kv(f"{arch}.attention.head_count", n_heads)
    w.add_kv(f"{arch}.context_length", n_ctx)
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    w.add_kv(f"{arch}.token_type_count",
             int(config.get("type_vocab_size", 0) or 0))
    w.add_kv(f"{arch}.pooling_type", pooling)
    act = str(config.get("hidden_act",
                         config.get("activation_function", "gelu")))
    if act in ("gelu", "gelu_new", "gelu_pytorch_tanh"):
        w.add_kv(f"{arch}.activation", act)
    if arch == "neo-bert":
        w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon",
                 float(config.get("norm_eps", 1e-6)))
        w.add_kv(f"{arch}.rope.freq_base", 10000.0)
    else:
        w.add_kv(f"{arch}.attention.layer_norm_epsilon",
                 float(g("layer_norm_eps", "layer_norm_epsilon", 1e-12)))
    if arch in ("nomic-bert", "nomic-bert-moe", "jina-bert-v3"):
        w.add_kv(f"{arch}.rope.freq_base",
                 float(config.get("rotary_emb_base", 10000.0)))
    if moe_every:
        w.add_kv(f"{arch}.moe_every_n_layers", moe_every)
        w.add_kv(f"{arch}.expert_count", int(config["num_experts"]))
        w.add_kv(f"{arch}.expert_used_count", int(config["moe_top_k"]))
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)

    written = []

    def put(name, arr, q=qtype):
        if arr is None:
            return
        _add(w, name, arr, q)
        written.append(name)

    def opt(key):
        return _np(state[key]) if key in state else None

    if arch == "neo-bert":
        put("token_embd.weight", state["encoder.weight"])
        put("output_norm.weight", state["layer_norm.weight"], None)
        for i in range(n_layers):
            p, o = f"transformer_encoder.{i}.", f"blk.{i}."
            put(o + "attn_norm.weight", state[p + "attention_norm.weight"],
                None)
            put(o + "attn_qkv.weight", state[p + "qkv.weight"])
            put(o + "attn_output.weight", state[p + "wo.weight"])
            put(o + "ffn_norm.weight", state[p + "ffn_norm.weight"], None)
            put(o + "ffn_up.weight", state[p + "ffn.w12.weight"])
            put(o + "ffn_down.weight", state[p + "ffn.w3.weight"])
        w.write()
        return written

    put("token_embd.weight", state["embeddings.word_embeddings.weight"])
    put("token_types.weight",
        opt("embeddings.token_type_embeddings.weight"), None)
    if arch in ("nomic-bert", "nomic-bert-moe"):
        put("token_embd_norm.weight", state["emb_ln.weight"], None)
        put("token_embd_norm.bias", state["emb_ln.bias"], None)
        for i in range(n_layers):
            p, o = f"encoder.layers.{i}.", f"blk.{i}."
            put(o + "attn_qkv.weight", state[p + "attn.Wqkv.weight"])
            put(o + "attn_qkv.bias", opt(p + "attn.Wqkv.bias"), None)
            put(o + "attn_output.weight", state[p + "attn.out_proj.weight"])
            put(o + "attn_output.bias", opt(p + "attn.out_proj.bias"), None)
            put(o + "attn_output_norm.weight", state[p + "norm1.weight"],
                None)
            put(o + "attn_output_norm.bias", state[p + "norm1.bias"], None)
            put(o + "layer_output_norm.weight", state[p + "norm2.weight"],
                None)
            put(o + "layer_output_norm.bias", state[p + "norm2.bias"], None)
            if moe_every and i % moe_every == 1:
                e, f = int(config["num_experts"]), d_ff
                put(o + "ffn_gate_inp.weight",
                    state[p + "mlp.router.layer.weight"], None)
                w1 = _np(state[p + "mlp.experts.mlp.w1"])
                w2 = _np(state[p + "mlp.experts.mlp.w2"])
                put(o + "ffn_up_exps.weight",
                    w1.reshape(e, f, d_model))
                put(o + "ffn_down_exps.weight",
                    w2.reshape(e, f, d_model).transpose(0, 2, 1))
            elif moe_every:  # dense GELU layers of the MoE model
                put(o + "ffn_up.weight", state[p + "mlp.fc1.weight"])
                put(o + "ffn_up.bias", state[p + "mlp.fc1.bias"], None)
                put(o + "ffn_down.weight", state[p + "mlp.fc2.weight"])
                put(o + "ffn_down.bias", state[p + "mlp.fc2.bias"], None)
            else:  # SwiGLU: fc11 -> up, fc12 -> gate
                put(o + "ffn_up.weight", state[p + "mlp.fc11.weight"])
                put(o + "ffn_gate.weight", state[p + "mlp.fc12.weight"])
                put(o + "ffn_down.weight", state[p + "mlp.fc2.weight"])
        w.write()
        return written

    put("token_embd_norm.weight", state["embeddings.LayerNorm.weight"],
        None)
    put("token_embd_norm.bias", state["embeddings.LayerNorm.bias"], None)
    if arch == "jina-bert-v3":
        for i in range(n_layers):
            for hf, gg in _BERT_LAYER_MAP.items():
                for part in ("weight", "bias"):
                    key = f"encoder.layer.{i}.{hf}.{part}"
                    q = (qtype if part == "weight" and "Norm" not in hf
                         else None)
                    put(f"blk.{i}.{gg}.{part}", state[key], q)
        w.write()
        return written

    # jina-bert-v2
    for i in range(n_layers):
        p, o = f"encoder.layer.{i}.", f"blk.{i}."
        for hf, gg in (("attention.self.query", "attn_q"),
                       ("attention.self.key", "attn_k"),
                       ("attention.self.value", "attn_v"),
                       ("attention.output.dense", "attn_output")):
            put(o + gg + ".weight", state[p + hf + ".weight"])
            put(o + gg + ".bias", opt(p + hf + ".bias"), None)
        for hf, gg in (("attention.self.layer_norm_q", "attn_q_norm"),
                       ("attention.self.layer_norm_k", "attn_k_norm"),
                       ("attention.output.LayerNorm", "attn_output_norm"),
                       ("layer_norm_1", "attn_norm_2"),
                       ("mlp.layernorm", "layer_output_norm"),
                       ("layer_norm_2", "layer_output_norm")):
            put(o + gg + ".weight", opt(p + hf + ".weight"), None)
            put(o + gg + ".bias", opt(p + hf + ".bias"), None)
        # fused GEGLU [2F, d] (gated_layers / up_gated_layer) or split
        put(o + "ffn_up.weight",
            opt(p + "mlp.gated_layers.weight")
            if p + "mlp.gated_layers.weight" in state
            else opt(p + "mlp.up_gated_layer.weight"))
        put(o + "ffn_gate.weight", opt(p + "mlp.gated_layers_w.weight"))
        dk = (p + "mlp.wo" if p + "mlp.wo.weight" in state
              else p + "mlp.down_layer")
        put(o + "ffn_down.weight", state[dk + ".weight"])
        put(o + "ffn_down.bias", state[dk + ".bias"], None)
    w.write()
    return written


# ---------------------------------------------------------------------------
# APM (Whisper-style audio encoder) — convert_apm.py counterpart
# ---------------------------------------------------------------------------

_APM_ATTN_MAP = {
    "q_proj": "attn.query",
    "k_proj": "attn.key",
    "v_proj": "attn.value",
    "out_proj": "attn.out",
}


def convert_apm(state: Mapping[str, Any], config: Mapping[str, Any],
                out_path: str, mel_filters: np.ndarray | None = None) -> list[str]:
    """HF Whisper encoder (+ audio_projection_layer) -> APM GGUF."""
    state = _strip(state, "model.", "encoder.")
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", "whisper")
    n_layers = int(config.get("encoder_layers", 24))
    w.add_kv("encoder_layers", n_layers)
    w.add_kv("d_model", int(config.get("d_model", 1024)))
    w.add_kv("encoder_attention_heads",
             int(config.get("encoder_attention_heads", 16)))
    w.add_kv("n_mel", int(config.get("num_mel_bins", 80)))
    if mel_filters is not None:  # loader reads the filterbank from KV
        w.add_kv("filters",
                 [float(x) for x in np.asarray(mel_filters, np.float32).reshape(-1)])

    written = []

    def put(name, arr):
        _add(w, name, arr, None)
        written.append(name)

    put("encoder.conv1.weight", state["conv1.weight"])
    put("encoder.conv1.bias", state["conv1.bias"])
    put("encoder.conv2.weight", state["conv2.weight"])
    put("encoder.conv2.bias", state["conv2.bias"])
    put("encoder.positional_embedding", state["embed_positions.weight"])
    put("encoder.ln_post.weight", state["layer_norm.weight"])
    put("encoder.ln_post.bias", state["layer_norm.bias"])
    for i in range(n_layers):
        src = f"layers.{i}."
        dst = f"encoder.blocks.{i}."
        for hf, gg in _APM_ATTN_MAP.items():
            put(dst + gg + ".weight", state[src + f"self_attn.{hf}.weight"])
            bkey = src + f"self_attn.{hf}.bias"
            if bkey in state:  # whisper k_proj has no bias
                put(dst + gg + ".bias", state[bkey])
        put(dst + "attn_ln.weight", state[src + "self_attn_layer_norm.weight"])
        put(dst + "attn_ln.bias", state[src + "self_attn_layer_norm.bias"])
        put(dst + "mlp_ln.weight", state[src + "final_layer_norm.weight"])
        put(dst + "mlp_ln.bias", state[src + "final_layer_norm.bias"])
        put(dst + "mlp.0.weight", state[src + "fc1.weight"])
        put(dst + "mlp.0.bias", state[src + "fc1.bias"])
        put(dst + "mlp.2.weight", state[src + "fc2.weight"])
        put(dst + "mlp.2.bias", state[src + "fc2.bias"])
    # projection MLP (MiniCPM-o audio_projection_layer: linear1/linear2)
    for src, dst in (("audio_projection_layer.linear1", "audio_projector.linear1"),
                     ("audio_projection_layer.linear2", "audio_projector.linear2")):
        if src + ".weight" in state:
            put(dst + ".weight", state[src + ".weight"])
            put(dst + ".bias", state[src + ".bias"])
    w.write()
    return written


# ---------------------------------------------------------------------------
# VPM (SigLip2 + resampler) — convert_vpm.py counterpart
# ---------------------------------------------------------------------------

def convert_vpm(state: Mapping[str, Any], config: Mapping[str, Any],
                out_path: str) -> list[str]:
    state = _strip(state, "vpm.", "vision_model.")
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", "clip")
    n_layers = int(config.get("num_hidden_layers", 26))
    w.add_kv("clip.vision.block_count", n_layers)
    w.add_kv("clip.vision.embedding_length", int(config.get("hidden_size", 1152)))
    w.add_kv("clip.vision.feed_forward_length",
             int(config.get("intermediate_size", 4304)))
    w.add_kv("clip.vision.attention.head_count",
             int(config.get("num_attention_heads", 16)))
    w.add_kv("clip.vision.patch_size", int(config.get("patch_size", 14)))
    w.add_kv("clip.vision.image_size", int(config.get("image_size", 980)))
    w.add_kv("clip.minicpmv_query_num", int(config.get("query_num", 64)))

    written = []

    def put(name, arr):
        _add(w, name, arr, None)
        written.append(name)

    emb = "embeddings."
    put("v.patch_embd.weight", state[emb + "patch_embedding.weight"])
    put("v.patch_embd.bias", state[emb + "patch_embedding.bias"])
    put("v.position_embd.weight", state[emb + "position_embedding.weight"])
    put("v.post_ln.weight", state["post_layernorm.weight"])
    put("v.post_ln.bias", state["post_layernorm.bias"])
    for i in range(n_layers):
        src = f"encoder.layers.{i}."
        dst = f"v.blk.{i}."
        for hf, gg in (("self_attn.q_proj", "attn_q"),
                       ("self_attn.k_proj", "attn_k"),
                       ("self_attn.v_proj", "attn_v"),
                       ("self_attn.out_proj", "attn_out"),
                       ("mlp.fc1", "ffn_up"), ("mlp.fc2", "ffn_down")):
            put(dst + gg + ".weight", state[src + hf + ".weight"])
            put(dst + gg + ".bias", state[src + hf + ".bias"])
        put(dst + "ln1.weight", state[src + "layer_norm1.weight"])
        put(dst + "ln1.bias", state[src + "layer_norm1.bias"])
        put(dst + "ln2.weight", state[src + "layer_norm2.weight"])
        put(dst + "ln2.bias", state[src + "layer_norm2.bias"])

    # resampler (64-query cross-attention into LLM width)
    rs = {k[len("resampler."):]: v for k, v in state.items()
          if k.startswith("resampler.")}
    if rs:
        put("resampler.query", rs["query"])
        put("resampler.kv.weight", rs["kv_proj.weight"])
        # torch MultiheadAttention in_proj packs q/k/v
        in_w, in_b = _np(rs["attn.in_proj_weight"]), _np(rs["attn.in_proj_bias"])
        d = in_w.shape[0] // 3
        for j, nm in enumerate("qkv"):
            put(f"resampler.attn.{nm}.weight", in_w[j * d:(j + 1) * d])
            put(f"resampler.attn.{nm}.bias", in_b[j * d:(j + 1) * d])
        put("resampler.attn.out.weight", rs["attn.out_proj.weight"])
        put("resampler.attn.out.bias", rs["attn.out_proj.bias"])
        put("resampler.ln_q.weight", rs["ln_q.weight"])
        put("resampler.ln_q.bias", rs["ln_q.bias"])
        put("resampler.ln_kv.weight", rs["ln_kv.weight"])
        put("resampler.ln_kv.bias", rs["ln_kv.bias"])
        put("resampler.ln_post.weight", rs["ln_post.weight"])
        put("resampler.ln_post.bias", rs["ln_post.bias"])
        put("resampler.proj.weight", rs["proj"])
    w.write()
    return written


# ---------------------------------------------------------------------------
# TTS decoder — convert_tts.py counterpart (weight-norm merge incl.)
# ---------------------------------------------------------------------------

def convert_tts(state: Mapping[str, Any], config: Mapping[str, Any],
                out_path: str, qtype: GGMLType = GGMLType.F16) -> list[str]:
    state = dict(state)
    w = GGUFWriter(out_path)
    arch = "minicpmtts"
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", int(config.get("num_hidden_layers", 20)))
    w.add_kv(f"{arch}.embedding_length", int(config.get("hidden_size", 768)))
    w.add_kv(f"{arch}.feed_forward_length",
             int(config.get("intermediate_size", 3072)))
    w.add_kv(f"{arch}.attention.head_count",
             int(config.get("num_attention_heads", 12)))
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             float(config.get("rms_norm_eps", 1e-6)))
    w.add_kv(f"{arch}.rope.freq_base", float(config.get("rope_theta", 10000.0)))

    written = []

    def put(name, arr, q=None):
        _add(w, name, arr, q)
        written.append(name)

    body = _strip(state, "model.")
    n_layers = int(config.get("num_hidden_layers", 20))
    put("tts.norm.weight", body["norm.weight"])
    for i in range(n_layers):
        src = f"layers.{i}."
        for suffix in ("self_attn.q_proj.weight", "self_attn.k_proj.weight",
                       "self_attn.v_proj.weight", "self_attn.o_proj.weight",
                       "mlp.gate_proj.weight", "mlp.up_proj.weight",
                       "mlp.down_proj.weight"):
            put(f"tts.layers.{i}.{suffix}", body[src + suffix], qtype)
        for suffix in ("input_layernorm.weight",
                       "post_attention_layernorm.weight"):
            put(f"tts.layers.{i}.{suffix}", body[src + suffix])

    put("emb_text.weight", state["emb_text.weight"], qtype)
    put("emb_code.0.weight", state["emb_code.0.weight"])
    # weight-normed head: merge g * v/||v|| (reference convert_tts.py:76-87)
    if "head_code.0.parametrizations.weight.original0" in state:
        g = state["head_code.0.parametrizations.weight.original0"]
        v = state["head_code.0.parametrizations.weight.original1"]
        put("head_code.0.weight", merge_weight_norm(g, v))
    elif "head_code.0.weight_g" in state:
        put("head_code.0.weight",
            merge_weight_norm(state["head_code.0.weight_g"],
                              state["head_code.0.weight_v"]))
    else:
        put("head_code.0.weight", state["head_code.0.weight"])
    for lin in ("linear1", "linear2"):
        for pt in ("weight", "bias"):
            for proj in ("projector_semantic", "projector_spk"):
                key = f"{proj}.{lin}.{pt}"
                if key in state:
                    put(f"{proj}.{lin}.{pt}", state[key])
    w.write()
    return written


def convert_qwen2vl_vision(state: Mapping[str, Any],
                           config: Mapping[str, Any], out_path: str,
                           qtype: GGMLType = GGMLType.F16) -> list[str]:
    """HF Qwen2-VL vision tower -> mmproj-style GGUF (reference
    convert_hf_to_gguf.py Qwen2VLVisionModel: fused qkv split, Conv3D
    split into two Conv2D planes v.patch_embd.weight{,.1}; clip.cpp
    build_qwen2vl consumes the same names). `config` is the HF
    vision_config dict (+ the LLM hidden size as out_hidden)."""
    state = {k.removeprefix("visual.").removeprefix("model.visual.") : v
             for k, v in state.items()}
    v25 = "window_size" in config  # Qwen2.5-VL vision variant
    d = int(config.get("embed_dim", config.get("hidden_size", 0)))
    ff = int(config.get("intermediate_size",
                        d * int(config.get("mlp_ratio", 4))))
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", "clip")
    w.add_kv("clip.projector_type",
             "qwen2.5vl_merger" if v25 else "qwen2vl_merger")
    w.add_kv("clip.vision.block_count", int(config["depth"]))
    w.add_kv("clip.vision.embedding_length", d)
    w.add_kv("clip.vision.projection_dim",
             int(config.get("out_hidden", config.get("out_hidden_size", 0))))
    w.add_kv("clip.vision.attention.head_count", int(config["num_heads"]))
    w.add_kv("clip.vision.in_channels", int(config.get("in_channels", 3)))
    w.add_kv("clip.vision.patch_size", int(config["patch_size"]))
    w.add_kv("clip.vision.spatial_merge_size",
             int(config.get("spatial_merge_size", 2)))
    w.add_kv("clip.vision.temporal_patch_size",
             int(config.get("temporal_patch_size", 2)))
    w.add_kv("clip.vision.feed_forward_length", ff)
    w.add_kv("clip.vision.attention.layer_norm_epsilon", 1e-6)
    if v25:
        w.add_kv("clip.vision.window_size", int(config["window_size"]))
        fab = [int(i) for i in config.get("fullatt_block_indexes", [])]
        w.add_kv("clip.vision.fullatt_block_indexes", fab)
        # reference KV (clip-impl.h KEY_WIN_ATTN_PATTERN) when periodic
        if fab and all(fab[i] - fab[i - 1] == fab[0] + 1
                       for i in range(1, len(fab))):
            w.add_kv("clip.vision.n_wa_pattern", fab[0] + 1)
    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    pe = _np(state["patch_embed.proj.weight"])  # [E, C, T, P, P]
    put("v.patch_embd.weight", pe[:, :, 0], None)
    put("v.patch_embd.weight.1", pe[:, :, 1], None)
    put("v.post_ln.weight", state["merger.ln_q.weight"], None)
    if "merger.ln_q.bias" in state:
        put("v.post_ln.bias", state["merger.ln_q.bias"], None)
    put("mm.0.weight", state["merger.mlp.0.weight"], None)
    put("mm.0.bias", state["merger.mlp.0.bias"], None)
    put("mm.2.weight", state["merger.mlp.2.weight"], None)
    put("mm.2.bias", state["merger.mlp.2.bias"], None)
    for i in range(int(config["depth"])):
        p, b = f"blocks.{i}.", f"v.blk.{i}."
        qkv_w = _np(state[p + "attn.qkv.weight"])
        qkv_b = _np(state[p + "attn.qkv.bias"])
        for j, nm in enumerate(("q", "k", "v")):
            put(b + f"attn_{nm}.weight", qkv_w[j * d:(j + 1) * d], None)
            put(b + f"attn_{nm}.bias", qkv_b[j * d:(j + 1) * d], None)
        put(b + "attn_out.weight", state[p + "attn.proj.weight"], None)
        put(b + "attn_out.bias", state[p + "attn.proj.bias"], None)
        put(b + "ln1.weight", state[p + "norm1.weight"], None)
        if p + "norm1.bias" in state:
            put(b + "ln1.bias", state[p + "norm1.bias"], None)
            put(b + "ln2.bias", state[p + "norm2.bias"], None)
        put(b + "ln2.weight", state[p + "norm2.weight"], None)
        if v25:  # gated-SiLU MLP
            put(b + "ffn_gate.weight", state[p + "mlp.gate_proj.weight"], None)
            put(b + "ffn_gate.bias", state[p + "mlp.gate_proj.bias"], None)
            put(b + "ffn_up.weight", state[p + "mlp.up_proj.weight"], None)
            put(b + "ffn_up.bias", state[p + "mlp.up_proj.bias"], None)
            put(b + "ffn_down.weight", state[p + "mlp.down_proj.weight"], None)
            put(b + "ffn_down.bias", state[p + "mlp.down_proj.bias"], None)
        else:
            put(b + "ffn_up.weight", state[p + "mlp.fc1.weight"], None)
            put(b + "ffn_up.bias", state[p + "mlp.fc1.bias"], None)
            put(b + "ffn_down.weight", state[p + "mlp.fc2.weight"], None)
            put(b + "ffn_down.bias", state[p + "mlp.fc2.bias"], None)
    w.write()
    return written


def convert_llava_vision(state: Mapping[str, Any],
                         config: Mapping[str, Any], out_path: str,
                         qtype: GGMLType = GGMLType.F16) -> list[str]:
    """HF LLaVA vision tower + multi_modal_projector -> mmproj GGUF
    (reference clip.cpp PROJECTOR_TYPE_MLP naming: v.class_embd,
    v.position_embd, v.pre_ln, v.blk.N.*, mm.0/mm.2). `config` = the HF
    vision_config dict + out_hidden (LLM width) + feature_layer."""
    state = {k.removeprefix("vision_tower.").removeprefix("model.")
             .removeprefix("vision_tower.")
             : v for k, v in state.items()}
    state = _strip(state, "vision_model.")
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", "clip")
    w.add_kv("clip.projector_type", "mlp")
    w.add_kv("clip.vision.block_count", int(config["num_hidden_layers"]))
    w.add_kv("clip.vision.embedding_length", int(config["hidden_size"]))
    w.add_kv("clip.vision.projection_dim", int(config["out_hidden"]))
    w.add_kv("clip.vision.attention.head_count",
             int(config["num_attention_heads"]))
    w.add_kv("clip.vision.patch_size", int(config["patch_size"]))
    w.add_kv("clip.vision.image_size", int(config.get("image_size", 224)))
    w.add_kv("clip.vision.feed_forward_length",
             int(config["intermediate_size"]))
    w.add_kv("clip.vision.attention.layer_norm_epsilon",
             float(config.get("layer_norm_eps", 1e-5)))
    w.add_kv("clip.vision.feature_layer",
             int(config.get("feature_layer", -2)))
    if config.get("image_grid_pinpoints"):
        # llava-next anyres (reference mm_patch_merge_type spatial_unpad)
        w.add_kv("clip.vision.mm_patch_merge_type", "spatial_unpad")
        w.add_kv("clip.vision.image_grid_pinpoints",
                 [int(x) for pt in config["image_grid_pinpoints"]
                  for x in pt])
    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    if "image_newline" in state:
        put("model.image_newline", state["image_newline"], None)
    put("v.class_embd", state["embeddings.class_embedding"], None)
    put("v.patch_embd.weight",
        state["embeddings.patch_embedding.weight"], None)
    put("v.position_embd.weight",
        state["embeddings.position_embedding.weight"], None)
    put("v.pre_ln.weight", state["pre_layrnorm.weight"], None)
    put("v.pre_ln.bias", state["pre_layrnorm.bias"], None)
    # projector (LlavaMultiModalProjector linear_1/linear_2)
    put("mm.0.weight", state["multi_modal_projector.linear_1.weight"], None)
    put("mm.0.bias", state["multi_modal_projector.linear_1.bias"], None)
    put("mm.2.weight", state["multi_modal_projector.linear_2.weight"], None)
    put("mm.2.bias", state["multi_modal_projector.linear_2.bias"], None)
    for i in range(int(config["num_hidden_layers"])):
        p, b = f"encoder.layers.{i}.", f"v.blk.{i}."
        put(b + "ln1.weight", state[p + "layer_norm1.weight"], None)
        put(b + "ln1.bias", state[p + "layer_norm1.bias"], None)
        put(b + "ln2.weight", state[p + "layer_norm2.weight"], None)
        put(b + "ln2.bias", state[p + "layer_norm2.bias"], None)
        for nm in ("q", "k", "v"):
            put(b + f"attn_{nm}.weight",
                state[p + f"self_attn.{nm}_proj.weight"], None)
            put(b + f"attn_{nm}.bias",
                state[p + f"self_attn.{nm}_proj.bias"], None)
        put(b + "attn_out.weight",
            state[p + "self_attn.out_proj.weight"], None)
        put(b + "attn_out.bias", state[p + "self_attn.out_proj.bias"], None)
        put(b + "ffn_up.weight", state[p + "mlp.fc1.weight"], None)
        put(b + "ffn_up.bias", state[p + "mlp.fc1.bias"], None)
        put(b + "ffn_down.weight", state[p + "mlp.fc2.weight"], None)
        put(b + "ffn_down.bias", state[p + "mlp.fc2.bias"], None)
    w.write()
    return written


def _put_vit_layers(put, state: Mapping[str, Any], depth: int,
                    prefix: str = "encoder.layers.") -> None:
    """SigLip/CLIP-shaped encoder layers -> v.blk.N.* (reference clip.cpp
    TN_* naming)."""
    for i in range(depth):
        p, b = f"{prefix}{i}.", f"v.blk.{i}."
        for nm in ("q", "k", "v"):
            put(b + f"attn_{nm}.weight", state[p + f"self_attn.{nm}_proj.weight"])
            put(b + f"attn_{nm}.bias", state[p + f"self_attn.{nm}_proj.bias"])
        put(b + "attn_out.weight", state[p + "self_attn.out_proj.weight"])
        put(b + "attn_out.bias", state[p + "self_attn.out_proj.bias"])
        put(b + "ln1.weight", state[p + "layer_norm1.weight"])
        put(b + "ln1.bias", state[p + "layer_norm1.bias"])
        put(b + "ln2.weight", state[p + "layer_norm2.weight"])
        put(b + "ln2.bias", state[p + "layer_norm2.bias"])
        put(b + "ffn_up.weight", state[p + "mlp.fc1.weight"])
        put(b + "ffn_up.bias", state[p + "mlp.fc1.bias"])
        put(b + "ffn_down.weight", state[p + "mlp.fc2.weight"])
        put(b + "ffn_down.bias", state[p + "mlp.fc2.bias"])


def _vision_writer(out_path: str, proj_type: str, config: Mapping[str, Any],
                   ffn_op: str, eps: float, scale_factor: int | None = None):
    def _i(v):  # internvl stores patch_size/image_size as (h, w) tuples
        return int(v[0]) if isinstance(v, (tuple, list)) else int(v)

    config = {k: (_i(v) if k in ("patch_size", "image_size") else v)
              for k, v in config.items()}
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", "clip")
    w.add_kv("clip.projector_type", proj_type)
    w.add_kv("clip.use_gelu", ffn_op in ("gelu", "gelu_tanh"))
    w.add_kv("clip.vision.ffn_op", ffn_op)
    w.add_kv("clip.vision.block_count", int(config["num_hidden_layers"]))
    w.add_kv("clip.vision.embedding_length", int(config["hidden_size"]))
    w.add_kv("clip.vision.projection_dim", int(config["out_hidden"]))
    w.add_kv("clip.vision.attention.head_count",
             int(config["num_attention_heads"]))
    w.add_kv("clip.vision.patch_size", int(config["patch_size"]))
    w.add_kv("clip.vision.image_size", int(config.get("image_size", 224)))
    w.add_kv("clip.vision.feed_forward_length",
             int(config["intermediate_size"]))
    w.add_kv("clip.vision.attention.layer_norm_epsilon", float(eps))
    if scale_factor is not None:
        w.add_kv("clip.vision.projector.scale_factor", int(scale_factor))
    return w


def convert_gemma3_vision(state: Mapping[str, Any],
                          config: Mapping[str, Any], out_path: str,
                          qtype: GGMLType = GGMLType.F16) -> list[str]:
    """HF Gemma3 vision tower (SigLip) + Gemma3MultiModalProjector ->
    mmproj GGUF (reference convert_hf_to_gguf.py Gemma3VisionModel:
    soft_emb_norm stored +1; clip.cpp:508-530 consumes avg-pool + RMS +
    input projection). `config` = HF vision_config dict + out_hidden
    (LLM width) + mm_tokens_per_image."""
    state = _strip(state, "model.")
    state = _strip(state, "vision_tower.vision_model.")
    tokens_per_side = int(round(
        float(config.get("mm_tokens_per_image", 256)) ** 0.5))
    kernel = ((int(config["image_size"]) // int(config["patch_size"]))
              // tokens_per_side)
    w = _vision_writer(out_path, "gemma3", config, "gelu_tanh",
                       config.get("layer_norm_eps", 1e-6),
                       scale_factor=kernel)
    written = []

    def put(name, arr, q=None):
        _add(w, name, arr, q)
        written.append(name)

    put("v.patch_embd.weight", state["embeddings.patch_embedding.weight"])
    put("v.patch_embd.bias", state["embeddings.patch_embedding.bias"])
    put("v.position_embd.weight",
        state["embeddings.position_embedding.weight"])
    put("v.post_ln.weight", state["post_layernorm.weight"])
    put("v.post_ln.bias", state["post_layernorm.bias"])
    put("mm.input_projection.weight",
        state["multi_modal_projector.mm_input_projection_weight"])
    put("mm.soft_emb_norm.weight",
        _np(state["multi_modal_projector.mm_soft_emb_norm.weight"]) + 1.0)
    _put_vit_layers(put, state, int(config["num_hidden_layers"]))
    w.write()
    return written


def convert_idefics3_vision(state: Mapping[str, Any],
                            config: Mapping[str, Any], out_path: str,
                            qtype: GGMLType = GGMLType.F16) -> list[str]:
    """HF Idefics3/SmolVLM vision tower + connector -> mmproj GGUF
    (clip.cpp:531-537: pixel shuffle + mm.model.fc). `config` = HF
    vision_config dict + out_hidden + scale_factor."""
    state = _strip(state, "model.")
    state = _strip(state, "vision_model.")
    w = _vision_writer(out_path, "idefics3", config, "gelu_tanh",
                       config.get("layer_norm_eps", 1e-6),
                       scale_factor=int(config.get("scale_factor", 2)))
    written = []

    def put(name, arr, q=None):
        _add(w, name, arr, q)
        written.append(name)

    put("v.patch_embd.weight", state["embeddings.patch_embedding.weight"])
    put("v.patch_embd.bias", state["embeddings.patch_embedding.bias"])
    put("v.position_embd.weight",
        state["embeddings.position_embedding.weight"])
    put("v.post_ln.weight", state["post_layernorm.weight"])
    put("v.post_ln.bias", state["post_layernorm.bias"])
    put("mm.model.fc.weight",
        state["connector.modality_projection.proj.weight"])
    _put_vit_layers(put, state, int(config["num_hidden_layers"]))
    w.write()
    return written


def convert_internvl_vision(state: Mapping[str, Any],
                            config: Mapping[str, Any], out_path: str,
                            qtype: GGMLType = GGMLType.F16) -> list[str]:
    """HF InternVL vision tower + InternVLMultiModalProjector -> mmproj
    GGUF (clip.cpp:916-982: CLS ViT with layer-scale, pixel shuffle,
    mm.model.mlp.{0,1,3}). `config` = HF vision_config dict + out_hidden
    + downsample_ratio."""
    state = _strip(state, "model.")
    state = _strip(state, "vision_tower.")
    sf = int(round(1.0 / float(config.get("downsample_ratio", 0.5))))
    w = _vision_writer(out_path, "internvl", config, "gelu",
                       config.get("layer_norm_eps", 1e-6), scale_factor=sf)
    written = []

    def put(name, arr, q=None):
        _add(w, name, arr, q)
        written.append(name)

    put("v.class_embd", _np(state["embeddings.cls_token"]).reshape(-1))
    put("v.patch_embd.weight",
        state["embeddings.patch_embeddings.projection.weight"])
    put("v.patch_embd.bias",
        state["embeddings.patch_embeddings.projection.bias"])
    pe = _np(state["embeddings.position_embeddings"])
    put("v.position_embd.weight", pe.reshape(pe.shape[-2], pe.shape[-1]))
    put("mm.model.mlp.0.weight",
        state["multi_modal_projector.layer_norm.weight"])
    put("mm.model.mlp.0.bias",
        state["multi_modal_projector.layer_norm.bias"])
    put("mm.model.mlp.1.weight",
        state["multi_modal_projector.linear_1.weight"])
    put("mm.model.mlp.1.bias", state["multi_modal_projector.linear_1.bias"])
    put("mm.model.mlp.3.weight",
        state["multi_modal_projector.linear_2.weight"])
    put("mm.model.mlp.3.bias", state["multi_modal_projector.linear_2.bias"])
    for i in range(int(config["num_hidden_layers"])):
        p, b = f"encoder.layer.{i}.", f"v.blk.{i}."
        for nm in ("q", "k", "v"):
            put(b + f"attn_{nm}.weight", state[p + f"attention.{nm}_proj.weight"])
            bias = state.get(p + f"attention.{nm}_proj.bias")
            if bias is not None:
                put(b + f"attn_{nm}.bias", bias)
        put(b + "attn_out.weight",
            state[p + "attention.projection_layer.weight"])
        put(b + "attn_out.bias", state[p + "attention.projection_layer.bias"])
        put(b + "ln1.weight", state[p + "layernorm_before.weight"])
        put(b + "ln1.bias", state[p + "layernorm_before.bias"])
        put(b + "ln2.weight", state[p + "layernorm_after.weight"])
        put(b + "ln2.bias", state[p + "layernorm_after.bias"])
        put(b + "ls1.weight", state[p + "lambda_1"])
        put(b + "ls2.weight", state[p + "lambda_2"])
        put(b + "ffn_up.weight", state[p + "mlp.fc1.weight"])
        put(b + "ffn_up.bias", state[p + "mlp.fc1.bias"])
        put(b + "ffn_down.weight", state[p + "mlp.fc2.weight"])
        put(b + "ffn_down.bias", state[p + "mlp.fc2.bias"])
    w.write()
    return written


def convert_pixtral_vision(state: Mapping[str, Any],
                           config: Mapping[str, Any], out_path: str,
                           qtype: GGMLType = GGMLType.F16,
                           img_break_embed=None) -> list[str]:
    """HF Pixtral vision tower (+ Mistral3 patch-merger projector) ->
    mmproj GGUF (reference clip.cpp build_pixtral names: mm.1/mm.2
    projector, mm.input_norm + mm.patch_merger for Mistral-Small 3.1,
    v.token_embd.img_break row separator). `config` = HF vision_config
    dict + out_hidden (+ spatial_merge_size); `img_break_embed` = the
    LLM's [IMG_BREAK] embedding row."""
    state = _strip(state, "model.")
    state = _strip(state, "vision_tower.")
    sms = int(config.get("spatial_merge_size", 1))
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", "clip")
    w.add_kv("clip.projector_type", "pixtral")
    w.add_kv("clip.use_silu", True)
    w.add_kv("clip.vision.block_count", int(config["num_hidden_layers"]))
    w.add_kv("clip.vision.embedding_length", int(config["hidden_size"]))
    w.add_kv("clip.vision.projection_dim", int(config["out_hidden"]))
    w.add_kv("clip.vision.attention.head_count",
             int(config["num_attention_heads"]))
    w.add_kv("clip.vision.patch_size", int(config["patch_size"]))
    w.add_kv("clip.vision.image_size", int(config.get("image_size", 1024)))
    w.add_kv("clip.vision.feed_forward_length",
             int(config["intermediate_size"]))
    w.add_kv("clip.vision.attention.layer_norm_epsilon", 1e-5)
    w.add_kv("clip.vision.rope.freq_base",
             float(config.get("rope_theta", 10000.0)))
    w.add_kv("clip.vision.spatial_merge_size", sms)
    written = []

    def put(name, arr, q=None):
        _add(w, name, arr, q)
        written.append(name)

    put("v.patch_embd.weight", state["patch_conv.weight"])
    put("v.pre_ln.weight", state["ln_pre.weight"])
    mp = "multi_modal_projector."
    put("mm.1.weight", state[mp + "linear_1.weight"])
    if mp + "linear_1.bias" in state:
        put("mm.1.bias", state[mp + "linear_1.bias"])
        put("mm.2.bias", state[mp + "linear_2.bias"])
    put("mm.2.weight", state[mp + "linear_2.weight"])
    if mp + "patch_merger.merging_layer.weight" in state:
        put("mm.input_norm.weight", state[mp + "norm.weight"])
        put("mm.patch_merger.weight",
            state[mp + "patch_merger.merging_layer.weight"])
    if img_break_embed is not None:
        put("v.token_embd.img_break", img_break_embed)
    for i in range(int(config["num_hidden_layers"])):
        p, b = f"transformer.layers.{i}.", f"v.blk.{i}."
        put(b + "ln1.weight", state[p + "attention_norm.weight"])
        put(b + "ln2.weight", state[p + "ffn_norm.weight"])
        for nm in ("q", "k", "v"):
            put(b + f"attn_{nm}.weight",
                state[p + f"attention.{nm}_proj.weight"])
        put(b + "attn_out.weight", state[p + "attention.o_proj.weight"])
        put(b + "ffn_gate.weight",
            state[p + "feed_forward.gate_proj.weight"])
        put(b + "ffn_up.weight", state[p + "feed_forward.up_proj.weight"])
        put(b + "ffn_down.weight",
            state[p + "feed_forward.down_proj.weight"])
    w.write()
    return written


def convert_lfm2_vision(state: Mapping[str, Any],
                        config: Mapping[str, Any], out_path: str,
                        qtype: GGMLType = GGMLType.F16) -> list[str]:
    """HF LFM2-VL vision tower (SigLip2 NaFlex: linear patch embed,
    resizable position grid) + Lfm2VlMultiModalProjector -> mmproj GGUF
    (clip.cpp:538-552 PROJECTOR_TYPE_LFM2 names: mm.input_norm +
    mm.1/mm.2). `config` = HF vision_config dict + out_hidden +
    downsample_factor."""
    state = _strip(state, "model.")
    state = _strip(state, "vision_tower.vision_model.")
    w = _vision_writer(out_path, "lfm2", config, "gelu_tanh",
                       config.get("layer_norm_eps", 1e-6),
                       scale_factor=int(config.get("downsample_factor", 2)))
    written = []

    def put(name, arr, q=None):
        _add(w, name, arr, q)
        written.append(name)

    put("v.patch_embd.weight", state["embeddings.patch_embedding.weight"])
    put("v.patch_embd.bias", state["embeddings.patch_embedding.bias"])
    put("v.position_embd.weight",
        state["embeddings.position_embedding.weight"])
    put("v.post_ln.weight", state["post_layernorm.weight"])
    put("v.post_ln.bias", state["post_layernorm.bias"])
    mp = "multi_modal_projector."
    put("mm.input_norm.weight", state[mp + "layer_norm.weight"])
    put("mm.input_norm.bias", state[mp + "layer_norm.bias"])
    put("mm.1.weight", state[mp + "linear_1.weight"])
    if mp + "linear_1.bias" in state:
        put("mm.1.bias", state[mp + "linear_1.bias"])
        put("mm.2.bias", state[mp + "linear_2.bias"])
    put("mm.2.weight", state[mp + "linear_2.weight"])
    _put_vit_layers(put, state, int(config["num_hidden_layers"]))
    w.write()
    return written


def convert_qwen2audio_encoder(state: Mapping[str, Any],
                               config: Mapping[str, Any], out_path: str,
                               qtype: GGMLType = GGMLType.F16,
                               mel_filters=None) -> list[str]:
    """HF Qwen2-Audio tower + linear projector -> audio mmproj GGUF
    (reference clip.cpp PROJECTOR_TYPE_QWEN2A names: a.conv1d.{1,2},
    a.position_embd, a.blk.N.*, a.post_ln, mm.a.fc;
    mtmd-audio.cpp preprocessing contract). `config` = HF audio_config
    dict + out_hidden (LLM width). `mel_filters` [n_mel, n_fft/2+1] is
    embedded for host-side log-mel preprocessing."""
    state = _strip(state, "model.")
    state = _strip(state, "audio_tower.")
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", "clip")
    w.add_kv("clip.projector_type", "qwen2a")
    w.add_kv("clip.has_audio_encoder", True)
    w.add_kv("clip.audio.block_count", int(config["encoder_layers"]))
    w.add_kv("clip.audio.embedding_length", int(config["d_model"]))
    w.add_kv("clip.audio.projection_dim", int(config["out_hidden"]))
    w.add_kv("clip.audio.attention.head_count",
             int(config["encoder_attention_heads"]))
    w.add_kv("clip.audio.num_mel_bins", int(config.get("num_mel_bins", 128)))
    w.add_kv("clip.audio.feed_forward_length",
             int(config["encoder_ffn_dim"]))
    w.add_kv("clip.audio.attention.layer_norm_epsilon", 1e-5)
    written = []

    def put(name, arr, q=None):
        _add(w, name, arr, q)
        written.append(name)

    put("a.conv1d.1.weight", state["conv1.weight"])
    put("a.conv1d.1.bias", state["conv1.bias"])
    put("a.conv1d.2.weight", state["conv2.weight"])
    put("a.conv1d.2.bias", state["conv2.bias"])
    put("a.position_embd.weight", state["embed_positions.weight"])
    put("a.post_ln.weight", state["layer_norm.weight"])
    put("a.post_ln.bias", state["layer_norm.bias"])
    put("mm.a.fc.weight", state["multi_modal_projector.linear.weight"])
    put("mm.a.fc.bias", state["multi_modal_projector.linear.bias"])
    if mel_filters is not None:
        put("a.mel_filters", mel_filters)
    for i in range(int(config["encoder_layers"])):
        p, b = f"layers.{i}.", f"a.blk.{i}."
        put(b + "attn_q.weight", state[p + "self_attn.q_proj.weight"])
        put(b + "attn_q.bias", state[p + "self_attn.q_proj.bias"])
        put(b + "attn_k.weight", state[p + "self_attn.k_proj.weight"])
        put(b + "attn_v.weight", state[p + "self_attn.v_proj.weight"])
        put(b + "attn_v.bias", state[p + "self_attn.v_proj.bias"])
        put(b + "attn_out.weight", state[p + "self_attn.out_proj.weight"])
        put(b + "attn_out.bias", state[p + "self_attn.out_proj.bias"])
        put(b + "ln1.weight", state[p + "self_attn_layer_norm.weight"])
        put(b + "ln1.bias", state[p + "self_attn_layer_norm.bias"])
        put(b + "ln2.weight", state[p + "final_layer_norm.weight"])
        put(b + "ln2.bias", state[p + "final_layer_norm.bias"])
        put(b + "ffn_up.weight", state[p + "fc1.weight"])
        put(b + "ffn_up.bias", state[p + "fc1.bias"])
        put(b + "ffn_down.weight", state[p + "fc2.weight"])
        put(b + "ffn_down.bias", state[p + "fc2.bias"])
    w.write()
    return written


def _convert_rwkv7(state: Mapping[str, Any], config: Mapping[str, Any],
                   out_path: str, qtype: GGMLType,
                   tokenizer_kv: Mapping[str, Any] | None = None,
                   arch: str = "rwkv7") -> list[str]:
    """HF RWKV7 (pth-style model.layers.N.attention.* layout) /
    ARWKV7 (qwen-hybrid: self_attn time mix + SwiGLU mlp) -> GGUF archs
    "rwkv7"/"arwkv7" with the reference exporter's layouts
    (convert_hf_to_gguf.py Rwkv7Model/ARwkv7Model): the six per-branch
    token-shift vectors fuse into time_mix_lerp_fused [n, C]; the
    w/a/v/g low-rank towers transpose to [out, in]; w0/a0/v0 squeeze to
    [C]."""
    state = _strip(state, "model.")
    # unify arwkv7's qwen-ish naming into the rwkv7 attention.* layout
    state = {k.replace(".self_attn.", ".attention.")
             .replace(".attn.", ".attention.")
             .replace("_lora.lora.0.weight", ".lora1")
             .replace("_lora.lora.2.weight", ".lora2")
             .replace("_lora.lora.2.bias", ".lora0"): v
             for k, v in state.items()}
    d_model = int(config["hidden_size"])
    n_layers = int(config["num_hidden_layers"])
    head_size = int(config.get("head_size", config.get("head_dim", 64)))
    d_ff = int(config.get("intermediate_size") or 4 * d_model)
    has_gate = bool(config.get("wkv_has_gate", True))
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length", d_ff)
    w.add_kv(f"{arch}.wkv.head_size", head_size)
    w.add_kv(f"{arch}.context_length", 1048576)
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    w.add_kv(f"{arch}.token_shift_count", 2 if arch == "rwkv7" else 1)
    if arch == "rwkv7":
        w.add_kv(f"{arch}.attention.layer_norm_epsilon",
                 float(config.get("layer_norm_epsilon", 1e-5)))
    else:
        w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon",
                 float(config.get("rms_norm_eps", 1e-6)))
    w.add_kv(f"{arch}.attention.head_count", 0)
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)
    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["embeddings.weight"])
    if arch == "rwkv7":
        put("token_embd_norm.weight", state["layers.0.pre_norm.weight"],
            None)
        put("token_embd_norm.bias", state["layers.0.pre_norm.bias"], None)
        put("output_norm.weight", state["ln_out.weight"], None)
        put("output_norm.bias", state["ln_out.bias"], None)
    else:
        put("output_norm.weight", state["norm.weight"], None)
    if "head.weight" in state:
        put("output.weight", state["head.weight"])
    elif "lm_head.weight" in state:
        put("output.weight", state["lm_head.weight"])

    branches = ["r", "w", "k", "v", "a"] + (["g"] if has_gate else [])
    for i in range(n_layers):
        pfx, b = f"layers.{i}.", f"blk.{i}."
        a = pfx + "attention."
        if arch == "rwkv7":
            put(b + "attn_norm.weight", state[pfx + "ln1.weight"], None)
            put(b + "attn_norm.bias", state[pfx + "ln1.bias"], None)
            put(b + "attn_norm_2.weight", state[pfx + "ln2.weight"], None)
            put(b + "attn_norm_2.bias", state[pfx + "ln2.bias"], None)
        else:
            put(b + "attn_norm.weight",
                state[pfx + "input_layernorm.weight"], None)
            put(b + "ffn_norm.weight",
                state[pfx + "post_attention_layernorm.weight"], None)
        if a + "x_x" in state:  # pre-fused [n, C] (fla layout)
            fused = _np(state[a + "x_x"]).reshape(len(branches), d_model)
        else:
            fused = np.stack([
                _np(state[a + f"x_{nm}"]).reshape(d_model)
                for nm in branches])
        put(b + "time_mix_lerp_fused.weight", fused, None)
        for tower in ("w", "a", "v", "g"):
            if tower == "v" and a + "v0" not in state and \
                    a + "v.lora0" not in state:
                continue  # layer 0 has no value-residual tower
            if tower == "g":
                if not has_gate:
                    continue
                # gate tower has no bias term (g1/g2 only)
                w1 = state.get(a + "g1", state.get(a + "g.lora1"))
                w2 = state.get(a + "g2", state.get(a + "g.lora2"))
                put(b + "time_mix_g1.weight", _np(w1).T, None)
                put(b + "time_mix_g2.weight", _np(w2).T, None)
                continue
            w0 = state.get(a + f"{tower}0", state.get(a + f"{tower}.lora0"))
            w1 = state.get(a + f"{tower}1", state.get(a + f"{tower}.lora1"))
            w2 = state.get(a + f"{tower}2", state.get(a + f"{tower}.lora2"))
            put(b + f"time_mix_{tower}0.weight",
                _np(w0).reshape(d_model), None)
            put(b + f"time_mix_{tower}1.weight", _np(w1).T, None)
            put(b + f"time_mix_{tower}2.weight", _np(w2).T, None)
        for nm, gg in (("k_k", "time_mix_k_k"), ("k_a", "time_mix_k_a"),
                       ("r_k", "time_mix_r_k")):
            put(b + gg + ".weight", _np(state[a + nm]).reshape(-1), None)
        put(b + "time_mix_receptance.weight", state[a + "receptance.weight"])
        put(b + "time_mix_key.weight", state[a + "key.weight"])
        put(b + "time_mix_value.weight", state[a + "value.weight"])
        put(b + "time_mix_output.weight", state[a + "output.weight"])
        if a + "ln_x.weight" in state:
            put(b + "time_mix_ln.weight", state[a + "ln_x.weight"], None)
            put(b + "time_mix_ln.bias", state[a + "ln_x.bias"], None)
        f = pfx + "feed_forward."
        if arch == "rwkv7":
            put(b + "channel_mix_lerp_k.weight",
                _np(state[f + "x_k"]).reshape(d_model), None)
            put(b + "channel_mix_key.weight", state[f + "key.weight"])
            put(b + "channel_mix_value.weight", state[f + "value.weight"])
        else:
            put(b + "ffn_gate.weight", state[pfx + "mlp.gate_proj.weight"])
            put(b + "ffn_up.weight", state[pfx + "mlp.up_proj.weight"])
            put(b + "ffn_down.weight", state[pfx + "mlp.down_proj.weight"])
    w.write()
    return written


def _convert_gemma3n(state: Mapping[str, Any], config: Mapping[str, Any],
                     out_path: str, qtype: GGMLType,
                     tokenizer_kv: Mapping[str, Any] | None = None,
                     ) -> list[str]:
    """HF Gemma3nForCausalLM -> GGUF arch "gemma3n" (reference
    convert_hf_to_gguf.py Gemma3NModel, norm_shift=0): AltUp tensors per
    layer, the 3 altup_(unembed_)projections stacked to [A-1, D, D],
    laurel low-rank pair, per-layer input gate/proj, and the
    activation-sparsity std multipliers (icdf of the target sparsity)."""
    state = _strip(state, "model.language_model.", "model.")
    arch = "gemma3n"
    d_model = int(config["hidden_size"])
    n_layers = int(config["num_hidden_layers"])
    n_altup = int(config.get("altup_num_inputs", 4))
    ff = config["intermediate_size"]
    if isinstance(ff, (list, tuple)):  # HF normalizes to a per-layer list
        assert len(set(ff)) == 1, "per-layer FFN widths unsupported"
        ff = ff[0]
    config = {**config, "intermediate_size": int(ff)}
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length",
             int(config["intermediate_size"]))
    w.add_kv(f"{arch}.attention.head_count",
             int(config.get("num_attention_heads", 8)))
    w.add_kv(f"{arch}.attention.head_count_kv",
             int(config.get("num_key_value_heads", 2)))
    w.add_kv(f"{arch}.attention.key_length",
             int(config.get("head_dim", 256)))
    w.add_kv(f"{arch}.attention.value_length",
             int(config.get("head_dim", 256)))
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             float(config.get("rms_norm_eps", 1e-6)))
    w.add_kv(f"{arch}.context_length",
             int(config.get("max_position_embeddings", 32768)))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    w.add_kv(f"{arch}.rope.freq_base",
             float(config.get("rope_theta", 1_000_000.0)))
    w.add_kv(f"{arch}.attention.sliding_window",
             int(config["sliding_window"]))
    w.add_kv(f"{arch}.altup.active_idx",
             int(config.get("altup_active_idx", 0)))
    w.add_kv(f"{arch}.altup.num_inputs", n_altup)
    w.add_kv(f"{arch}.embedding_length_per_layer_input",
             int(config["hidden_size_per_layer_input"]))
    w.add_kv(f"{arch}.attention.shared_kv_layers",
             int(config.get("num_kv_shared_layers", 0)))
    from statistics import NormalDist

    spars = [float(NormalDist().inv_cdf(s)) if s > 0 else 0.0
             for s in (config.get("activation_sparsity_pattern")
                       or [0.95] * min(10, n_layers)
                       + [0.0] * max(0, n_layers - 10))]
    w.add_kv(f"{arch}.activation_sparsity_scale", spars)
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)

    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["embed_tokens.weight"])
    put("per_layer_token_embd.weight",
        state["embed_tokens_per_layer.weight"])
    put("per_layer_model_proj.weight",
        state["per_layer_model_projection.weight"])
    put("per_layer_proj_norm.weight",
        state["per_layer_projection_norm.weight"], None)
    put("altup_proj.weight", np.stack(
        [_np(state[f"altup_projections.{i}.weight"])
         for i in range(n_altup - 1)]))
    put("altup_unembd_proj.weight", np.stack(
        [_np(state[f"altup_unembed_projections.{i}.weight"])
         for i in range(n_altup - 1)]))
    put("output_norm.weight", state["norm.weight"], None)
    if "lm_head.weight" in state and not config.get("tie_word_embeddings",
                                                    True):
        put("output.weight", state["lm_head.weight"])
    lmap = {
        "self_attn.q_proj.weight": "attn_q.weight",
        "self_attn.k_proj.weight": "attn_k.weight",
        "self_attn.v_proj.weight": "attn_v.weight",
        "self_attn.o_proj.weight": "attn_output.weight",
        "self_attn.q_norm.weight": "attn_q_norm.weight",
        "self_attn.k_norm.weight": "attn_k_norm.weight",
        "input_layernorm.weight": "attn_norm.weight",
        "post_attention_layernorm.weight": "post_attention_norm.weight",
        "pre_feedforward_layernorm.weight": "ffn_norm.weight",
        "post_feedforward_layernorm.weight": "post_ffw_norm.weight",
        "mlp.gate_proj.weight": "ffn_gate.weight",
        "mlp.up_proj.weight": "ffn_up.weight",
        "mlp.down_proj.weight": "ffn_down.weight",
        "altup.correction_coefs.weight": "altup_correct_coef.weight",
        "altup.prediction_coefs.weight": "altup_predict_coef.weight",
        "altup.modality_router.weight": "altup_router.weight",
        "altup.router_norm.weight": "altup_router_norm.weight",
        "altup.correct_output_scale": "altup_correct_scale.weight",
        "laurel.linear_left.weight": "laurel_l.weight",
        "laurel.linear_right.weight": "laurel_r.weight",
        "laurel.post_laurel_norm.weight": "laurel_post_norm.weight",
        "per_layer_input_gate.weight": "inp_gate.weight",
        "per_layer_projection.weight": "proj.weight",
        "post_per_layer_input_norm.weight": "post_norm.weight",
    }
    for i in range(n_layers):
        for hf, gg in lmap.items():
            key = f"layers.{i}.{hf}"
            if key not in state:
                continue  # shared-kv layers have no k/v projections
            is_small = ("norm" in gg or "coef" in gg or "router" in gg
                        or "scale" in gg)
            put(f"blk.{i}.{gg}", state[key], None if is_small else qtype)
    w.write()
    return written


def _convert_plamo2(state: Mapping[str, Any], config: Mapping[str, Any],
                    out_path: str, qtype: GGMLType,
                    tokenizer_kv: Mapping[str, Any] | None = None,
                    ) -> list[str]:
    """HF PLaMo2ForCausalLM (model.layers.layers.* remote-code layout) ->
    GGUF arch "plamo2" (reference convert_hf_to_gguf.py Plamo2Model):
    per-layer head_count/head_count_kv vectors from the mamba_step
    pattern, A_log -> -exp(A_log), conv1d squeezed 2-D, and the norm
    weight offsets the checkpoint factored out (+1 pre-norms/final,
    +1/5 post_mixer, +1/5^1.5 post_mlp)."""
    state = _strip(state, "model.")
    arch = "plamo2"
    d_model = int(config["hidden_size"])
    n_layers = int(config["num_hidden_layers"])
    n_heads = int(config.get("num_attention_heads", 32))
    n_kv = int(config.get("num_key_value_heads", 4))
    hd = int(config.get("hidden_size_per_head", 128))
    mamba_step = int(config.get("mamba_step", 2))
    ssm_heads = int(config.get("mamba_num_heads", 64))
    kvh, nh = [], []
    for i in range(n_layers):
        if n_layers <= mamba_step // 2:
            is_mamba = i != n_layers - 1
        else:
            is_mamba = (i % mamba_step) != (mamba_step // 2)
        kvh.append(0 if is_mamba else n_kv)
        nh.append(0 if is_mamba else n_heads)
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length",
             int(config.get("intermediate_size", 4 * d_model)))
    w.add_kv(f"{arch}.attention.head_count", nh)
    w.add_kv(f"{arch}.attention.head_count_kv", kvh)
    w.add_kv(f"{arch}.attention.key_length", hd)
    w.add_kv(f"{arch}.attention.value_length", hd)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             float(config.get("rms_norm_eps", 1e-6)))
    w.add_kv(f"{arch}.rope.freq_base",
             float(config.get("rope_theta", 10000.0)))
    w.add_kv(f"{arch}.context_length",
             int(config.get("max_position_embeddings", 2048)))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    w.add_kv(f"{arch}.ssm.state_size", int(config.get("mamba_d_state", 64)))
    w.add_kv(f"{arch}.ssm.conv_kernel", int(config.get("mamba_d_conv", 4)))
    w.add_kv(f"{arch}.ssm.time_step_rank", ssm_heads)
    w.add_kv(f"{arch}.ssm.inner_size", ssm_heads * hd)
    w.add_kv(f"{arch}.ssm.group_count", 0)
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)

    written = []

    def put(name, arr, q=qtype, off=0.0):
        if off:
            arr = _np(arr).astype(np.float32) + off
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["embed_tokens.weight"])
    put("output_norm.weight", state["norm.weight"], None, off=1.0)
    if "lm_head.weight" in state and not config.get("tie_word_embeddings",
                                                    True):
        put("output.weight", state["lm_head.weight"])
    for i in range(n_layers):
        pfx, b = f"layers.layers.{i}.", f"blk.{i}."
        mx = pfx + "mixer."
        put(b + "attn_norm.weight", state[pfx + "pre_mixer_norm.weight"],
            None, off=1.0)
        put(b + "attn_post_norm.weight",
            state[pfx + "post_mixer_norm.weight"], None, off=1.0 / 5)
        put(b + "ffn_norm.weight", state[pfx + "pre_mlp_norm.weight"],
            None, off=1.0)
        put(b + "ffn_post_norm.weight",
            state[pfx + "post_mlp_norm.weight"], None, off=1.0 / 5 ** 1.5)
        put(b + "ffn_up.weight", state[pfx + "mlp.gate_up_proj.weight"])
        put(b + "ffn_down.weight", state[pfx + "mlp.down_proj.weight"])
        if kvh[i] == 0:  # mamba mixer
            put(b + "ssm_in.weight", state[mx + "in_proj.weight"])
            put(b + "ssm_conv1d.weight",
                _np(state[mx + "conv1d.weight"]).squeeze(), None)
            put(b + "ssm_x.weight", state[mx + "bcdt_proj.weight"])
            put(b + "ssm_dt.weight", state[mx + "dt_proj.weight"])
            put(b + "ssm_dt.bias", state[mx + "dt_bias"], None)
            put(b + "ssm_dt_norm.weight", state[mx + "dt_norm_weight"],
                None)
            put(b + "ssm_b_norm.weight", state[mx + "B_norm_weight"], None)
            put(b + "ssm_c_norm.weight", state[mx + "C_norm_weight"], None)
            put(b + "ssm_a", -np.exp(_np(state[mx + "A_log"])), None)
            put(b + "ssm_d", state[mx + "D"], None)
            put(b + "ssm_out.weight", state[mx + "out_proj.weight"])
        else:
            put(b + "attn_qkv.weight", state[mx + "qkv_proj.weight"])
            put(b + "attn_output.weight", state[mx + "o_proj.weight"])
            put(b + "attn_q_norm.weight", state[mx + "q_weight"], None)
            put(b + "attn_k_norm.weight", state[mx + "k_weight"], None)
    w.write()
    return written


def _convert_nemotron_h(state: Mapping[str, Any],
                        config: Mapping[str, Any],
                        out_path: str, qtype: GGMLType,
                        tokenizer_kv: Mapping[str, Any] | None = None
                        ) -> list[str]:
    """HF NemotronHForCausalLM (backbone.layers.N.mixer.*) -> GGUF arch
    "nemotron_h" (reference NemotronHModel + llm_build_nemotron_h):
    layer types come from hybrid_override_pattern ("M"=mamba2,
    "*"=attention, "-"=relu^2 FFN) and are encoded as per-layer
    head_count_kv / feed_forward_length vectors (0 = not that type)."""
    state = _strip(state, "backbone.")
    arch = "nemotron_h"
    d_model = int(config["hidden_size"])
    n_layers = int(config["num_hidden_layers"])
    n_heads = int(config["num_attention_heads"])
    n_kv = int(config.get("num_key_value_heads", n_heads))
    head_dim = int(config.get("head_dim",
                              config.get("attention_head_dim",
                                         d_model // n_heads)))
    pattern = config["hybrid_override_pattern"]
    assert len(pattern) == n_layers
    kvh = [n_kv if c == "*" else 0 for c in pattern]
    n_ff = int(config.get("intermediate_size")
               or config.get("n_inner") or 4 * d_model)
    ffs = [n_ff if c == "-" else 0 for c in pattern]
    n_ssm_head = int(config.get("mamba_num_heads",
                                config.get("num_heads", 4)))
    d_inner = n_ssm_head * int(config.get("mamba_head_dim", 16))
    n_group = int(config.get("n_groups", 1))
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length", ffs)
    w.add_kv(f"{arch}.attention.head_count", n_heads)
    w.add_kv(f"{arch}.attention.head_count_kv", kvh)
    w.add_kv(f"{arch}.attention.key_length", head_dim)
    w.add_kv(f"{arch}.ssm.inner_size", d_inner)
    w.add_kv(f"{arch}.ssm.conv_kernel", int(config.get("conv_kernel", 4)))
    w.add_kv(f"{arch}.ssm.state_size", int(config.get("ssm_state_size", 8)))
    w.add_kv(f"{arch}.ssm.time_step_rank", n_ssm_head)
    w.add_kv(f"{arch}.ssm.group_count", n_group)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             float(config.get("layer_norm_epsilon",
                              config.get("rms_norm_eps", 1e-5))))
    w.add_kv(f"{arch}.context_length",
             int(config.get("max_position_embeddings", 4096)))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)
    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["embeddings.weight"])
    put("output_norm.weight", state["norm_f.weight"], None)
    if ("lm_head.weight" in state
            and not config.get("tie_word_embeddings", True)):
        put("output.weight", state["lm_head.weight"])
    for i in range(n_layers):
        pfx, b = f"layers.{i}.", f"blk.{i}."
        put(b + "attn_norm.weight", state[pfx + "norm.weight"], None)
        mp = pfx + "mixer."
        if pattern[i] == "M":
            put(b + "ssm_in.weight", state[mp + "in_proj.weight"])
            put(b + "ssm_conv1d.weight",
                _np(state[mp + "conv1d.weight"])[:, 0, :], None)
            put(b + "ssm_conv1d.bias", state[mp + "conv1d.bias"], None)
            put(b + "ssm_dt.bias", state[mp + "dt_bias"], None)
            put(b + "ssm_a", state[mp + "A_log"], None)
            put(b + "ssm_d", state[mp + "D"], None)
            put(b + "ssm_norm.weight",
                _np(state[mp + "norm.weight"]).reshape(n_group, -1), None)
            put(b + "ssm_out.weight", state[mp + "out_proj.weight"])
        elif pattern[i] == "*":
            put(b + "attn_q.weight", state[mp + "q_proj.weight"])
            put(b + "attn_k.weight", state[mp + "k_proj.weight"])
            put(b + "attn_v.weight", state[mp + "v_proj.weight"])
            put(b + "attn_output.weight", state[mp + "o_proj.weight"])
        else:
            put(b + "ffn_up.weight", state[mp + "up_proj.weight"])
            put(b + "ffn_down.weight", state[mp + "down_proj.weight"])
    w.write()
    return written


def _convert_deci(state: Mapping[str, Any], config: Mapping[str, Any],
                  out_path: str, qtype: GGMLType,
                  tokenizer_kv: Mapping[str, Any] | None = None
                  ) -> list[str]:
    """HF DeciLM / Llama-3_1-Nemotron -> GGUF arch "deci" (reference
    DeciModel + llm_build_deci): per-layer GQA widths from block_configs
    (or num_key_value_heads_per_layer), attention-free layers
    (n_heads_in_group None, replace_with_linear False), linear-attention
    layers (wo only), FFN-free layers (ffn_mult None). NORM-rope llama
    graph with the q/k permute applied per layer."""
    state = _strip(state, "model.")
    arch = "deci"
    d_model = int(config["hidden_size"])
    n_layers = int(config["num_hidden_layers"])
    n_heads_u = int(config["num_attention_heads"])
    head_dim = d_model // n_heads_u

    if "block_configs" in config:
        heads, kvs, ffs = [], [], []
        for bc in config["block_configs"]:
            g_ = bc["attention"].get("n_heads_in_group")
            if g_ is None:
                kvs.append(0)
                heads.append(n_heads_u
                             if bc["attention"].get("replace_with_linear")
                             else 0)
            else:
                kvs.append(n_heads_u // int(g_))
                heads.append(n_heads_u)
            fm = bc["ffn"].get("ffn_mult")
            if fm is None:
                ffs.append(0)
            else:
                # DeciModel._ffn_mult_to_intermediate_size
                ff = int(2 * fm * d_model / 3)
                ffs.append(256 * ((ff + 255) // 256))
    else:
        heads = [n_heads_u] * n_layers
        kvs = [int(x) for x in
               config.get("num_key_value_heads_per_layer",
                          [config.get("num_key_value_heads",
                                      n_heads_u)] * n_layers)]
        ffs = [int(config["intermediate_size"])] * n_layers

    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length", ffs)
    w.add_kv(f"{arch}.attention.head_count", heads)
    w.add_kv(f"{arch}.attention.head_count_kv", kvs)
    w.add_kv(f"{arch}.attention.key_length", head_dim)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon",
             float(config.get("rms_norm_eps", 1e-5)))
    w.add_kv(f"{arch}.rope.freq_base",
             float(config.get("rope_theta", 10000.0)))
    w.add_kv(f"{arch}.context_length",
             int(config.get("max_position_embeddings", 4096)))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    rope_extra = _emit_rope_scaling(w, arch, config, rot_dim=head_dim)
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)
    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["embed_tokens.weight"])
    for nm, arr in rope_extra.items():
        put(nm, arr, None)
    put("output_norm.weight", state["norm.weight"], None)
    if ("lm_head.weight" in state
            and not config.get("tie_word_embeddings", False)):
        put("output.weight", state["lm_head.weight"])
    for i in range(n_layers):
        pfx, b = f"layers.{i}.", f"blk.{i}."
        if heads[i] > 0 and kvs[i] > 0:
            put(b + "attn_norm.weight",
                state[pfx + "input_layernorm.weight"], None)
            put(b + "attn_q.weight", _permute_rope(
                _np(state[pfx + "self_attn.q_proj.weight"]), heads[i]))
            put(b + "attn_k.weight", _permute_rope(
                _np(state[pfx + "self_attn.k_proj.weight"]), kvs[i]))
            put(b + "attn_v.weight", state[pfx + "self_attn.v_proj.weight"])
            put(b + "attn_output.weight",
                state[pfx + "self_attn.o_proj.weight"])
        elif heads[i] > 0:  # linear attention: wo on the norm output
            put(b + "attn_norm.weight",
                state[pfx + "input_layernorm.weight"], None)
            put(b + "attn_output.weight",
                state[pfx + "self_attn.linear_attn.weight"])
        if ffs[i] > 0:
            put(b + "ffn_norm.weight",
                state[pfx + "post_attention_layernorm.weight"], None)
            put(b + "ffn_gate.weight", state[pfx + "mlp.gate_proj.weight"])
            put(b + "ffn_up.weight", state[pfx + "mlp.up_proj.weight"])
            put(b + "ffn_down.weight", state[pfx + "mlp.down_proj.weight"])
    w.write()
    return written


def _convert_openelm(state: Mapping[str, Any], config: Mapping[str, Any],
                     out_path: str, qtype: GGMLType,
                     tokenizer_kv: Mapping[str, Any] | None = None
                     ) -> list[str]:
    """HF OpenELM -> GGUF arch "openelm" (reference OpenELMModel +
    llm_build_openelm): per-layer q/kv head counts and FFN widths,
    per-head q/k RMS norms, NeoX rope; the fused qkv_proj de-fuses into
    q/k/v with each layer's own widths; the fused ffn proj_1 splits
    into gate|up at that layer's width."""
    state = _strip(state, "transformer.")
    arch = "openelm"
    d_model = int(config["model_dim"])
    n_layers = int(config["num_transformer_layers"])
    head_dim = int(config["head_dim"])
    heads = [int(x) for x in config["num_query_heads"]]
    kvs = [int(x) for x in config["num_kv_heads"]]
    div = int(config.get("ffn_dim_divisor", 256))

    def mk_div(v):
        # OpenELMModel._make_divisible
        new_v = max(div, int(v + div / 2) // div * div)
        if new_v < 0.9 * v:
            new_v += div
        return new_v

    ffs = [mk_div(m * d_model) for m in config["ffn_multipliers"]]
    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length", ffs)
    w.add_kv(f"{arch}.attention.head_count", heads)
    w.add_kv(f"{arch}.attention.head_count_kv", kvs)
    w.add_kv(f"{arch}.attention.key_length", head_dim)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_kv(f"{arch}.rope.freq_base",
             float(config.get("rope_freq_constant", 10000.0)))
    w.add_kv(f"{arch}.context_length",
             int(config.get("max_context_length", 2048)))
    w.add_kv(f"{arch}.vocab_size", int(config["vocab_size"]))
    for k, v in (tokenizer_kv or {}).items():
        w.add_kv(k, v)
    written = []

    def put(name, arr, q=qtype):
        _add(w, name, arr, q)
        written.append(name)

    put("token_embd.weight", state["token_embeddings.weight"])
    put("output_norm.weight", state["norm.weight"], None)
    for i in range(n_layers):
        pfx, b = f"layers.{i}.", f"blk.{i}."
        nh, nk, ff = heads[i], kvs[i], ffs[i]
        put(b + "attn_norm.weight",
            state[pfx + "attn_norm.weight"], None)
        qkv = _np(state[pfx + "attn.qkv_proj.weight"])
        put(b + "attn_q.weight", qkv[: nh * head_dim])
        put(b + "attn_k.weight",
            qkv[nh * head_dim: (nh + nk) * head_dim])
        put(b + "attn_v.weight", qkv[(nh + nk) * head_dim:])
        put(b + "attn_q_norm.weight",
            state[pfx + "attn.q_norm.weight"], None)
        put(b + "attn_k_norm.weight",
            state[pfx + "attn.k_norm.weight"], None)
        put(b + "attn_output.weight", state[pfx + "attn.out_proj.weight"])
        put(b + "ffn_norm.weight", state[pfx + "ffn_norm.weight"], None)
        gu = _np(state[pfx + "ffn.proj_1.weight"])
        put(b + "ffn_gate.weight", gu[:ff])
        put(b + "ffn_up.weight", gu[ff:])
        put(b + "ffn_down.weight", state[pfx + "ffn.proj_2.weight"])
    w.write()
    return written
