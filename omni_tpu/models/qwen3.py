"""Qwen3 dense decoder (the LLM module of MiniCPM-o 4.5).

Architecture contract (verified against the reference:
/root/reference/src/llama-model.cpp:9287-9407 llm_build_qwen3, shapes per
/root/reference/tools/omni/convert/model.txt:1-29): pre-RMSNorm blocks,
GQA attention with per-head q/k RMSNorm, NeoX RoPE, SwiGLU FFN, tied-or-
separate output head. Weights load directly from the reference's GGUF
tensor naming (blk.N.attn_q.weight etc.).

The forward operates on a flat ubatch of T tokens — each with its own
position and sequence id — against the unified KV cell pool, which is what
makes continuous batching and the omni streaming protocol (mixed-sequence
batches) work the same way llama_batch does (include/llama.h:230).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..core.gguf import GGUFReader
from ..kernels import load_quantized
from ..kernels.attention import (cache_attention, mixed_attention,
                                 pool_attention)
from ..kernels.dequant_matmul import matmul
from ..kernels.norms import layer_norm, layer_norm_nobias, rms_norm
from ..kernels.rope import apply_rope
from ..runtime.kv_cache import KVCache


@dataclasses.dataclass(frozen=True)
class Qwen3Config:
    n_layers: int
    d_model: int
    n_heads: int
    n_kv_heads: int
    head_dim: int
    d_ff: int
    n_vocab: int
    rope_base: float = 1000000.0
    rms_eps: float = 1e-6
    # NeoX (half-split) vs NORM (adjacent-pair) rotary: LLaMA/Mistral/
    # MiniCPM-family archs use NORM (reference llama_rope_type)
    rope_neox: bool = True
    # --- RoPE context scaling ({arch}.rope.scaling.* GGUF keys;
    # reference llama-hparams rope_scaling_type_train + rope_yarn in
    # ggml; formulas match HF modeling_rope_utils, our parity oracle).
    # "none" | "linear" (freqs / factor) | "yarn" (NTK-by-parts ramp)
    # | "longrope" (per-dim factor tensors rope_factors_{short,long}).
    # llama3-style scaling arrives as a per-dim divisor tensor
    # (params["rope_freqs"], reference rope_freqs.weight) with type
    # "none". rope_attn_factor is the RESOLVED mscale (cos/sin
    # multiplier): the converter computes it per the HF rules
    # (yarn get_mscale incl. mscale/mscale_all_dim; longrope
    # sqrt(1+ln(f)/ln(orig))) so the engine never re-derives it.
    rope_scaling: str = "none"
    rope_scale_factor: float = 1.0
    rope_orig_ctx: int = 0
    rope_attn_factor: float = 1.0
    yarn_beta_fast: float = 32.0
    yarn_beta_slow: float = 1.0
    # longrope branch selection: True once the runtime context exceeds
    # rope_orig_ctx (HF picks long_factor when seq_len > original_max;
    # the reference picks by n_ctx_per_seq at graph build)
    rope_long: bool = False
    # MoE (qwen3moe/mixtral-style): 0 experts = dense FFN
    n_experts: int = 0
    n_experts_used: int = 0
    # DeepSeek-V2/V3 MoE extensions (llm_build_deepseek2 / build_moe_ffn,
    # reference src/llama-model.cpp:13508, llama-graph.cpp:877):
    moe_gating: str = "softmax"   # "sigmoid" = V3 scoring_func;
    # "sparsemixer" = PhiMoE top-2 (HF modeling_phimoe.sparsemixer)
    moe_norm_w: bool = True       # norm_topk_prob
    moe_jitter_eps: float = 0.0   # phimoe router_jitter_noise (mask width)
    moe_scale_w: float = 1.0      # routed_scaling_factor
    n_expert_shared: int = 0      # shared experts added to routed mix
    # GroveMoE (llm_build_grovemoe): moe_gating="grove" selects via
    # sigmoid(logits) but weights via softmax(logits); a second
    # "adjugate" chunk-expert MoE consumes the main MoE's OUTPUT with
    # chunk ids = selected expert ids // n_group_experts, its output
    # added scaled by moe_grove_scale
    n_group_experts: int = 0
    moe_grove_scale: float = 0.0
    # --- MLA attention (deepseek2): KV cache holds ONE latent head of
    # [rope_dim roped | kv_lora_rank compressed] per position; Q absorbs
    # wk_b, attention output decompresses through wv_b ---
    kv_lora_rank: int = 0         # 0 = standard attention
    q_lora_rank: int = 0          # 0 = direct wq (V2-Lite)
    rope_dim: int = 0             # qk_rope_head_dim
    qk_nope_dim: int = 0          # qk_nope_head_dim
    v_head_dim: int | None = None  # cache value width when != head_dim
    # --- Gemma-family knobs (reference llm_build_gemma3_iswa /
    # llm_build_gemma2_iswa, llama-model.cpp:1157-1204) ---
    emb_scale: float = 1.0       # token embeddings × sqrt(d_model)
    # granite/minicpm scales (llm_build_granite, llama-model.cpp:16012):
    # attn/ffn outputs × residual_scale before the residual add; logits
    # × 1/logit_scale
    residual_scale: float = 1.0
    logit_scale: float = 1.0
    act: str = "silu"            # "gelu" = tanh-approx GELU (LLM_FFN_GELU)
    # MoE expert activation: "swiglu_oai" = gpt-oss clamped swiglu
    # (ggml_swiglu_oai: alpha=1.702, limit=7.0)
    moe_act: str = "silu"
    sandwich_norms: bool = False  # post-attention + post-ffw RMS norms
    # False = OLMo-2 post-norm topology: NO pre-norms, the sandwich norms
    # normalize each sublayer's OUTPUT before the residual add
    pre_norm: bool = True
    # Cohere/Command-R: one shared pre-norm, attn and ffn both read it and
    # both add to the SAME residual (llm_build_command_r)
    parallel_residual: bool = False
    norm_type: str = "rms"  # "layer" = bias-free LayerNorm (LLM_NORM)
    # GPT-2 family: biased LayerNorms, learned absolute position
    # embeddings (params["position_embd"]), no rope (llm_build_gpt2)
    norm_bias: bool = False
    use_rope: bool = True
    # SmolLM3 NoPE: every no_rope_step-th layer skips rope entirely
    # (hparams.n_no_rope_layer_step, llama-model.cpp:1988/6704)
    no_rope_step: int = 0
    attn_scale: float | None = None  # None = 1/sqrt(head_dim)
    attn_softcap: float = 0.0    # Gemma-2 attn logit capping
    final_softcap: float = 0.0   # Gemma-2 final logit capping
    # interleaved sliding-window attention: layer il is windowed iff
    # swa_every > 0 and il % swa_every < swa_every - 1 (set_swa_pattern
    # with dense_first=false); windowed layers rope at rope_base_swa
    swa_window: int = 0
    swa_every: int = 0
    rope_base_swa: float = 10000.0
    # OLMo f_clamp_kqv: clamp q/k/v projections to ±clamp_kqv
    # (llm_build_olmo, llama-model.cpp:12397)
    clamp_kqv: float = 0.0
    # ALiBi (BLOOM/MPT): per-head score bias slope_h * -|q_pos - k_pos|
    # from f_max_alibi_bias (ggml_soft_max_ext's max_bias argument;
    # mask fill at llama-graph.cpp:330)
    max_alibi_bias: float = 0.0
    # --- Llama4 (llm_build_llama_iswa) ---
    # routed-expert weights multiply the expert INPUT (weight_before_ffn)
    moe_weight_before: bool = False
    # NoPE-layer attention temperature tuning: q *= 1 + attn_temp_scale *
    # log(1 + floor(pos / attn_temp_floor)) (llm_graph_input_attn_temp)
    attn_temp_scale: float = 0.0
    attn_temp_floor: int = 8192
    # weightless RMS (L2) norm on q/k AFTER rope, roped layers only
    qk_norm_l2: bool = False
    # HunYuan: the WEIGHTED per-head q/k RMS norms apply AFTER rope
    # (llm_build_hunyuan_moe, llama-model.cpp:18119)
    qk_norm_post_rope: bool = False
    # chameleon: per-head BIASED LayerNorm on q/k (HF ChameleonLayerNorm;
    # weights stored [n_heads*head_dim] in the rope-permuted layout)
    qk_norm_type: str = "rms"
    # Apertus xIELU (ggml_xielu): per-layer (alpha_n, alpha_p, beta, eps)
    # scalars; act == "xielu" selects it on the un-gated FFN
    xielu: tuple = ()
    # chunked SWA (LLAMA_SWA_TYPE_CHUNKED): keys visible iff
    # k_pos >= floor(q_pos / window) * window
    swa_chunked: bool = False
    # diffusion LMs (llada/dream/llada_moe) attend bidirectionally
    # ({arch}.attention.causal=false; reference build_attn_inp_no_cache)
    causal: bool = True
    # --- MoE wiring variants ---
    # "layer_input": router reads the PRE-norm layer input
    # (llm_build_smallthinker routes on inpL before attention)
    moe_router_input: str = "hn"
    # grok: router logits softcapped at 30 (f_router_logit_softcapping)
    moe_router_softcap: float = 0.0
    # "arctic": dense FFN on ffn_norm(ffn_inp) PLUS MoE on
    #   ffn_norm_exps(layer input), summed (llm_build_arctic)
    # "grok": optional dense FFN parallel to the MoE on the same input,
    #   (dense + moe) * sqrt(2)/2 (llm_build_grok)
    moe_parallel_ffn: str = ""
    # smallthinker NoPE pattern: rope only when il % no_rope_step != 0
    # (layer 0 is NoPE — the opposite offset of smollm3's (il+1) rule)
    no_rope_mod_zero: bool = False
    # SWA pattern offset: set_swa_pattern(n, dense_first=true) makes
    # layer il windowed iff il % n != 0 (smallthinker)
    swa_dense_first: bool = False
    # deci/openelm per-layer geometry: (n_head, n_kv) per layer from
    # the attention.head_count{,_kv} VECTORS; () = uniform. n_head=0 is
    # an attention-free layer, n_kv=0 with n_head>0 the deci "linear
    # attention" (wo only); FFN-free layers simply lack ffn tensors
    # (llm_build_deci / llm_build_openelm)
    layer_heads: tuple = ()
    # qwen2vl M-RoPE sections in PAIR units (t/h/w chunk widths;
    # {arch}.rope.dimension_sections, reference ggml_rope_multi). The
    # forward ropes with the pos3 [T, 3] streams when provided; plain
    # pos reduces to standard NeoX rope (all streams equal)
    mrope_sections: tuple = ()

    def is_swa_layer(self, il: int) -> bool:
        if not (self.swa_every > 0 and self.swa_window > 0):
            return False
        if self.swa_dense_first:  # set_swa_pattern(n, true)
            return il % self.swa_every != 0
        return il % self.swa_every < self.swa_every - 1

    @staticmethod
    def from_gguf(kv: dict[str, Any], arch: str | None = None) -> "Qwen3Config":
        arch = arch or kv["general.architecture"]
        g = lambda key, default=None: kv.get(f"{arch}.{key}", default)
        heads_raw = g("attention.head_count")
        kvh_raw = g("attention.head_count_kv", heads_raw)
        layer_heads = ()
        if hasattr(heads_raw, "__len__") or hasattr(kvh_raw, "__len__"):
            # per-layer geometry (deci/openelm): vectors in either kv
            nl_ = int(g("block_count"))
            hs = (list(int(x) for x in heads_raw)
                  if hasattr(heads_raw, "__len__")
                  else [int(heads_raw)] * nl_)
            ks = (list(int(x) for x in kvh_raw)
                  if hasattr(kvh_raw, "__len__")
                  else [int(kvh_raw)] * nl_)
            layer_heads = tuple(zip(hs, ks))
            n_heads = max(hs)
        else:
            n_heads = int(heads_raw)
        d_model = int(g("embedding_length"))
        head_dim = int(g("attention.key_length", d_model // n_heads))
        mla_extra = {}
        mla = arch in ("deepseek2", "plm", "minicpm3")
        if mla:
            # MLA geometry (reference convert_hf_to_gguf.py DeepseekV2Model
            # set_gguf_parameters; PLMModel / MiniCPM3Model share the
            # key/rope/lora keys): cache key = kv_lora_rank + rope_dim,
            # cache value = kv_lora_rank, score scale = 1/sqrt(key_len_mla)
            kv_rank = int(g("attention.kv_lora_rank"))
            rope_dim = int(g("rope.dimension_count"))
            if arch == "deepseek2":
                # our ds2 GGUFs write cache geometry into key_length
                k_mla = int(g("attention.key_length_mla",
                              head_dim - kv_rank + rope_dim))
                v_dim = int(g("attention.value_length", kv_rank))
            else:
                # plm/minicpm3 GGUFs follow the reference convention:
                # attention.key_length = qk_nope + qk_rope (the SCORE
                # width); the absorbed-MLA cache is [rope | rank] wide
                k_mla = head_dim
                head_dim = kv_rank + rope_dim
                v_dim = kv_rank
            gating = int(g("expert_gating_func", 1))  # 1=softmax 2=sigmoid
            mla_extra = dict(
                kv_lora_rank=kv_rank,
                q_lora_rank=int(g("attention.q_lora_rank", 0) or 0),
                rope_dim=rope_dim,
                qk_nope_dim=k_mla - rope_dim,
                v_head_dim=v_dim,
                attn_scale=1.0 / k_mla ** 0.5,
                moe_gating="sigmoid" if gating == 2 else "softmax",
                moe_norm_w=bool(g("expert_weights_norm", False)),
                moe_scale_w=float(g("expert_weights_scale", 1.0)),
                n_expert_shared=int(g("expert_shared_count", 0)),
            )
        hunyuan = arch in ("hunyuan-moe", "hunyuan-dense")
        moe_extra = {}
        if not mla and g("expert_gating_func") is not None:
            # deepseek-style MoE gating outside the deepseek2 arch
            # (glm4moe / dots1 / ernie4_5_moe; build_moe_ffn args)
            moe_extra = dict(
                moe_gating=("sigmoid"
                            if int(g("expert_gating_func", 1)) == 2
                            else "softmax"),
                moe_norm_w=bool(g("expert_weights_norm", True)),
                moe_scale_w=float(g("expert_weights_scale", 1.0)),
                n_expert_shared=int(g("expert_shared_count", 0)),
            )
        if arch == "phimoe":
            # PhiMoE (llm_build_phi3<false> + MoE branch): HF-exact
            # sparsemixer top-2 routing, true biased LayerNorms
            moe_extra = dict(
                moe_gating="sparsemixer", moe_norm_w=False,
                moe_jitter_eps=float(g("expert_jitter_eps", 0.01) or 0.0))
        exaone4_extra = {}
        if arch == "exaone4" and g("attention.sliding_window"):
            # llm_build_exaone4 iswa: 3-SWA:1-full where full layers are
            # NoPE (use_rope = is_swa(il)); pattern 4
            exaone4_extra = dict(
                swa_window=int(g("attention.sliding_window")),
                swa_every=4, no_rope_step=4,
                rope_base_swa=float(g("rope.freq_base", 10000.0)))
        llama4_extra = {}
        if arch == "llama4":
            # llm_build_llama_iswa: chunked SWA pattern 4 with NoPE+
            # temperature-tuned full layers, sigmoid MoE weighting the
            # expert INPUT, post-rope L2 q/k norm (llama-model.cpp:635-666,
            # 6676; defaults llama-hparams.h:162-164)
            sw = int(g("attention.sliding_window", 8192))
            tuning = bool(g("attn_temperature_tuning", True))
            llama4_extra = dict(
                swa_window=sw, swa_every=4 if sw else 0, swa_chunked=True,
                no_rope_step=4 if sw else 0,
                moe_gating="sigmoid", moe_norm_w=False,
                moe_weight_before=True,
                qk_norm_l2=bool(g("attention.use_kq_norm", True)),
                attn_temp_scale=(float(g("attention.temperature_scale",
                                         0.1)) if tuning else 0.0),
                attn_temp_floor=int(g("attention.temperature_floor_scale",
                                      8192)),
                n_expert_shared=1 if g("expert_count") else 0,
            )
        grove_extra = {}
        if arch == "grovemoe":
            # llm_build_grovemoe (llama-model.cpp:19108) + build_moe_ffn's
            # GROVEMOE special cases (llama-graph.cpp:948,958)
            grove_extra = dict(
                moe_gating="grove",
                n_group_experts=int(g("experts_per_group", 2)),
                moe_grove_scale=float(g("expert_group_scale", 0.05)))
        grok_extra = {}
        if arch == "grok":
            # llm_build_grok + llama-graph.cpp:1375: scores scaled by
            # f_attn_out_scale then softcapped at 30; GEGLU experts with
            # optional parallel dense FFN summed * sqrt(2)/2; router
            # logits softcapped; embeddings scaled; logits MULTIPLIED
            # by f_logit_scale
            grok_extra = dict(
                moe_act="gelu", moe_parallel_ffn="grok", moe_norm_w=True,
                moe_router_softcap=float(g("router_logit_softcapping",
                                           30.0)),
                attn_softcap=float(g("attn_logit_softcapping", 30.0)),
                final_softcap=float(g("final_logit_softcapping", 0.0)
                                    or 0.0),
            )
        if arch == "arctic":
            grok_extra = dict(moe_parallel_ffn="arctic", moe_norm_w=True)
        if arch == "chameleon":
            # llm_build_chameleon: llama graph + per-head biased LN q/k
            # norms; swin_norm normalizes sublayer OUTPUTS (the olmo2
            # post-norm topology) instead of inputs
            swin = bool(g("swin_norm", False))
            grok_extra = dict(qk_norm_type="layer",
                              **({"pre_norm": False,
                                  "sandwich_norms": True} if swin else {}))
        if arch == "smallthinker":
            sw = int(g("attention.sliding_window", 0) or 0)
            grok_extra = dict(
                moe_act="relu", moe_router_input="layer_input",
                moe_norm_w=True,
                **({"swa_window": sw, "swa_every": 4,
                    "swa_dense_first": True, "no_rope_step": 4,
                    "no_rope_mod_zero": True,
                    "rope_base_swa": float(g("rope.freq_base", 10000.0))}
                   if sw else {}),
            )
        gemma = arch.startswith("gemma")
        # Gemma 27B variants scale queries by 1/sqrt(d_model/n_heads)
        # instead of 1/sqrt(head_dim) (llama-model.cpp:1175-1178/1201-1204;
        # 46 layers = gemma2-27B, 62 = gemma3-27B)
        attn_scale = None
        if (arch, int(g("block_count"))) in (("gemma2", 46), ("gemma3", 62)):
            attn_scale = 1.0 / (d_model / n_heads) ** 0.5
        # minicpm/granite run the granite graph: embedding/residual/logit
        # scales from kv, with MiniCPM's backward-compatible defaults
        # (llama-model.cpp:688-706, 1805-1840)
        emb_scale, residual_scale, logit_scale = 1.0, 1.0, 1.0
        n_layers_ = int(g("block_count"))
        if arch == "minicpm":
            emb_scale = float(g("embedding_scale", 12.0))
            residual_scale = float(g("residual_scale",
                                     1.4 / n_layers_ ** 0.5))
            logit_scale = float(g("logit_scale", 256.0 / d_model))
        elif arch == "minicpm3":
            # llm_build_minicpm3 hardcodes the muP scales: embeddings
            # x12, residual branches x 1.4/sqrt(L), lm head MULTIPLIED
            # by 256/n_embd (our logit_scale divides -> d/256)
            emb_scale = 12.0
            residual_scale = 1.4 / n_layers_ ** 0.5
            logit_scale = d_model / 256.0
        elif arch in ("granite", "granitemoe"):
            emb_scale = float(g("embedding_scale", 1.0))
            residual_scale = float(g("residual_scale", 1.0))
            logit_scale = float(g("logit_scale", 1.0))
            if g("attention.scale") is not None:
                attn_scale = float(g("attention.scale"))
        elif arch == "grok":
            emb_scale = float(g("embedding_scale", 78.38367176906169))
            # grok's logit scale MULTIPLIES (default 1/sqrt(3))
            logit_scale = 1.0 / float(g("logit_scale",
                                        0.5773502691896257))
            attn_scale = float(g("attention.output_scale",
                                 0.08838834764831845))
        elif gemma:
            emb_scale = float(d_model) ** 0.5
        if arch == "jais":
            # llm_build_jais: kq_scale = 1/n_embd_head (NOT 1/sqrt)
            attn_scale = 1.0 / head_dim
        attn_scale = mla_extra.pop("attn_scale", attn_scale)
        kw = dict(
            **mla_extra,
            rope_neox=arch not in ("llama", "minicpm", "minicpmtts",
                                   "granite", "granitemoe", "command-r",
                                   "deepseek2", "smollm3", "glm4",
                                   "arcee", "ernie4_5", "ernie4_5-moe",
                                   "olmo", "cohere2", "llama4",
                                   "baichuan", "xverse", "internlm2",
                                   "chatglm", "deepseek", "bailingmoe",
                                   "gptj", "chameleon", "llada",
                                   "arctic", "plm", "deci"),
            # smollm3 NoPE every 4th layer; cohere2 ropes ONLY its SWA
            # layers — the dense layers (il % 4 == 3) are NoPE
            # (llm_build_cohere2_iswa, llama-model.cpp:12261)
            no_rope_step=4 if arch in ("smollm3", "cohere2") else 0,
            # qwen2moe does NOT normalize the top-k probs and gates its
            # shared expert (llm_build_qwen2moe norm_w=false)
            **({"moe_norm_w": False} if arch in ("qwen2moe", "olmoe")
               else {}),
            parallel_residual=(arch in ("command-r", "cohere2", "phi2",
                                        "falcon", "plamo", "gptj")
                               or (arch == "gptneox"
                                   and bool(g("use_parallel_residual",
                                              True)))),
            norm_type=("layer" if arch in ("command-r", "cohere2", "gpt2",
                                           "starcoder2", "phi2",
                                           "gptneox", "stablelm",
                                           "falcon", "nemotron", "olmo",
                                           "bloom", "mpt", "dbrx",
                                           "phimoe", "starcoder", "orion",
                                           "jais", "codeshell", "gptj")
                       else "rms"),
            norm_bias=arch in ("gpt2", "starcoder2", "phi2", "gptneox",
                               "stablelm", "falcon", "nemotron", "bloom",
                               "phimoe", "starcoder", "orion",
                               "jais", "codeshell", "gptj"),
            # bloom/mpt (and ALiBi baichuan-13B) replace rope with ALiBi
            # score biases; any arch with max_alibi_bias > 0 skips rope
            use_rope=(arch not in ("gpt2", "bloom", "mpt", "starcoder")
                      and float(g("attention.max_alibi_bias", 0.0)
                                or 0.0) <= 0.0),
            max_alibi_bias=float(g("attention.max_alibi_bias", 0.0) or 0.0),
            # partial rotary (phi2/neox): rope only the first
            # rope.dimension_count columns of each head
            **({"rope_dim": int(g("rope.dimension_count", 0) or 0)}
               if not mla else {}),
            # command-r/cohere2 logit_scale MULTIPLIES logits
            # (build_command_r); our logit_scale divides (granite
            # semantics) — invert
            **({"logit_scale": 1.0 / float(g("logit_scale", 1.0))}
               if arch in ("command-r", "cohere2") else {}),
            clamp_kqv=float(g("attention.clamp_kqv", 0.0) or 0.0),
            causal=bool(g("attention.causal", True)),
            mrope_sections=tuple(
                int(s) for s in list(
                    g("rope.dimension_sections")
                    if g("rope.dimension_sections") is not None else [])
                if int(s) > 0),
            qk_norm_post_rope=hunyuan,
            moe_act="swiglu_oai" if arch == "gpt-oss" else "silu",
            n_layers=int(g("block_count")),
            d_model=d_model,
            n_heads=n_heads,
            n_kv_heads=(max([k for _, k in layer_heads] + [1])
                        if layer_heads
                        else int(g("attention.head_count_kv", n_heads))),
            layer_heads=layer_heads,
            head_dim=head_dim,
            # deci/openelm write feed_forward_length as a vector
            d_ff=(max(int(x) for x in g("feed_forward_length"))
                  if hasattr(g("feed_forward_length"), "__len__")
                  else int(g("feed_forward_length"))),
            n_vocab=len(kv["tokenizer.ggml.tokens"]) if "tokenizer.ggml.tokens" in kv
            else int(g("vocab_size")),
            rope_base=float(g("rope.freq_base", 10000.0)),
            # rope context scaling (reference llama-arch LLM_KV_ROPE_
            # SCALING_*; "none" also covers the llama3 per-dim-divisor
            # tensor path — see rope_scaling docstring above)
            rope_scaling=str(g("rope.scaling.type", "none") or "none"),
            rope_scale_factor=float(g("rope.scaling.factor", 1.0) or 1.0),
            rope_orig_ctx=int(g("rope.scaling.original_context_length",
                                0) or 0),
            rope_attn_factor=float(g("rope.scaling.attn_factor", 1.0)
                                   or 1.0),
            yarn_beta_fast=float(g("rope.scaling.yarn_beta_fast", 32.0)
                                 or 32.0),
            yarn_beta_slow=float(g("rope.scaling.yarn_beta_slow", 1.0)
                                 or 1.0),
            rms_eps=float(g("attention.layer_norm_epsilon",
                            g("attention.layer_norm_rms_epsilon", 1e-6))
                          if arch in ("command-r", "cohere2", "gpt2",
                                      "starcoder2", "phi2", "gptneox",
                                      "stablelm", "falcon", "nemotron",
                                      "olmo", "bloom", "mpt", "dbrx",
                                      "phimoe", "starcoder", "orion",
                                      "jais", "codeshell", "gptj")
                          else g("attention.layer_norm_rms_epsilon", 1e-6)),
            n_experts=int(g("expert_count", 0)),
            n_experts_used=int(g("expert_used_count", 0)),
            emb_scale=emb_scale,
            residual_scale=residual_scale,
            act=("relu2" if (arch in ("nemotron", "arcee", "plm")
                             or (arch == "bitnet"
                                 and g("activation") == "relu2"))
                 else "xielu" if arch == "apertus"
                 else "gelu" if (gemma or arch in ("gpt2", "starcoder2",
                                                   "phi2", "gptneox",
                                                   "falcon", "bloom",
                                                   "mpt", "starcoder",
                                                   "codeshell", "gptj"))
                 else "silu"),
            xielu=tuple(zip(kv.get("xielu.alpha_n", ()),
                            kv.get("xielu.alpha_p", ()),
                            kv.get("xielu.beta", ()),
                            kv.get("xielu.eps", ())))
            if arch == "apertus" else (),
            **({} if arch in ("command-r", "cohere2")
               else {"logit_scale": logit_scale}),
            sandwich_norms=arch in ("gemma2", "gemma3", "olmo2", "glm4",
                                    "exaone4", "grok"),
            pre_norm=arch not in ("olmo2", "exaone4"),
            attn_scale=attn_scale,
            attn_softcap=float(g("attn_logit_softcapping", 50.0))
            if arch == "gemma2" else 0.0,
            final_softcap=float(g("final_logit_softcapping", 30.0))
            if arch == "gemma2" else 0.0,
            swa_window=int(g("attention.sliding_window",
                             4096 if arch == "gemma2" else 0) or 0)
            if (gemma or arch in ("gpt-oss", "cohere2", "phi3",
                                  "phimoe")) else 0,
            # gemma2 and gpt-oss alternate SWA/full (pattern 2); gemma3
            # runs 5 SWA + 1 full (pattern 6); cohere2 3 SWA + 1 full
            # NoPE (pattern 4) — set_swa_pattern calls; phi3-family
            # windows EVERY layer (hparams.set_swa_pattern(1) stays
            # all-SWA: swa_every > n_layers makes il%e < e-1 always true)
            swa_every=(2 if arch in ("gemma2", "gpt-oss") else
                       6 if arch == "gemma3" else
                       4 if arch == "cohere2" else
                       n_layers_ + 1 if (arch in ("phi3", "phimoe")
                                         and g("attention.sliding_window"))
                       else 0),
            rope_base_swa=(float(g("rope.freq_base", 10000.0))
                           if arch in ("gpt-oss", "cohere2", "llama4",
                                       "phi3", "phimoe")
                           else 10000.0),
        )
        kw.update(moe_extra)  # deepseek-style gating KVs (glm4moe/dots1/…)
        kw.update(grok_extra)  # grok/arctic/smallthinker MoE wiring
        kw.update(grove_extra)  # grovemoe adjugate-expert wiring
        if mla:
            kw["n_kv_heads"] = 1  # absorbed MLA = one latent MQA head
        kw.update(exaone4_extra)
        kw.update(llama4_extra)  # llama4 overrides (swa/nope/moe wiring)
        return Qwen3Config(**kw)


def fuse_layer(layer: dict) -> dict:
    """Fuse QKV and gate+up into single weights (one kernel launch each) —
    per-call overhead dominates single-token decode; see kernels README."""
    from ..kernels.qformats import QTensor, concat_qtensors

    def cat(ws):
        if isinstance(ws[0], QTensor):
            return concat_qtensors(ws)
        return jnp.concatenate(ws, axis=0)  # dense [N, K]

    out = dict(layer)
    if layer.get("wk") is not None:  # MLA layers have no separate k/v proj
        out["wqkv"] = cat([layer["wq"], layer["wk"], layer["wv"]])
        for k in ("wq", "wk", "wv"):
            del out[k]
    if layer.get("bq") is not None:  # qwen2-family attention biases
        out["bqkv"] = jnp.concatenate([layer["bq"], layer["bk"],
                                       layer["bv"]])
        for k in ("bq", "bk", "bv"):
            del out[k]
    if (layer.get("w_gate") is not None
            and layer.get("b_gate") is None
            and layer.get("b_up") is None
            and layer.get("gate_inp") is None):
        # dense FFN only (MoE keeps experts; arctic/grok parallel dense
        # branches stay split); biased SwiGLU (jais) stays unfused —
        # the fused path has no bias slots
        out["w_gateup"] = cat([layer["w_gate"], layer["w_up"]])
        for k in ("w_gate", "w_up"):
            del out[k]
    return out


def load_params(reader: GGUFReader, keep_quantized: bool = True,
                fuse: bool = False) -> dict:
    """GGUF tensors -> parameter pytree (QTensor for native quant formats).
    fuse=True merges QKV / gate+up (decode fast path; LoRA application and
    imatrix capture require fuse=False)."""
    params: dict[str, Any] = {"layers": []}

    def get(name: str, required: bool = True, keep_q: bool | None = None):
        if name not in reader.tensors:
            if required:
                raise KeyError(f"missing tensor {name}")
            return None
        ti = reader.tensors[name]
        kq = keep_quantized if keep_q is None else keep_q
        return load_quantized(ti.data, ti.ggml_type, ti.shape, kq)

    # embeddings stay dense bf16: decode gathers rows, which a block-
    # quantized layout would make O(vocab) per step
    params["token_embd"] = get("token_embd.weight", keep_q=False)
    # GPT-2 family: learned absolute position embeddings + norm bias
    params["position_embd"] = get("position_embd.weight", required=False,
                                  keep_q=False)
    # BLOOM embedding LayerNorm (token_embd_norm, llm_build_bloom)
    params["tok_norm"] = get("token_embd_norm.weight", required=False,
                             keep_q=False)
    params["tok_norm_b"] = get("token_embd_norm.bias", required=False,
                               keep_q=False)
    # OLMo's norms are non-parametric — no norm tensors at all on disk
    # (LLM_ARCH_OLMO, llama-model.cpp:4206 "norm params removed")
    params["output_norm"] = get("output_norm.weight", required=False)
    params["output_norm_b"] = get("output_norm.bias", required=False,
                                  keep_q=False)
    out = get("output.weight", required=False)
    params["output"] = out  # None => tied to token_embd
    params["output_b"] = get("output.bias", required=False, keep_q=False)
    # optional classification / rank head (reference LLM_TENSOR_CLS{,_OUT},
    # src/llama-model.cpp:2906-2992; used by RANK pooling rerankers)
    params["cls"] = get("cls.weight", required=False, keep_q=False)
    params["cls_b"] = get("cls.bias", required=False, keep_q=False)
    params["cls_out"] = get("cls.output.weight", required=False, keep_q=False)
    params["cls_out_b"] = get("cls.output.bias", required=False, keep_q=False)
    # rope per-dim frequency divisors: llama3-scaling rope_freqs.weight
    # (reference LlamaModel.generate_extra_tensors) and the phi3-longrope
    # short/long factor tensors (reference LLM_TENSOR_ROPE_FACTORS_*)
    params["rope_freqs"] = get("rope_freqs.weight", required=False,
                               keep_q=False)
    params["rope_factors_short"] = get("rope_factors_short.weight",
                                       required=False, keep_q=False)
    params["rope_factors_long"] = get("rope_factors_long.weight",
                                      required=False, keep_q=False)

    i = 0
    while (f"blk.{i}.attn_norm.weight" in reader.tensors
           or f"blk.{i}.post_attention_norm.weight" in reader.tensors
           # OLMo layers carry no norm weights at all; deci attention-
           # free layers may carry only ffn tensors
           or f"blk.{i}.attn_q.weight" in reader.tensors
           or f"blk.{i}.ffn_up.weight" in reader.tensors):
        p = f"blk.{i}."
        mla = f"{p}attn_kv_a_mqa.weight" in reader.tensors
        # GPT-2 family ships QKV pre-fused on disk (blk.N.attn_qkv)
        fqkv = f"{p}attn_qkv.weight" in reader.tensors
        params["layers"].append({
            "attn_norm": get(p + "attn_norm.weight", required=False),
            "attn_norm_b": get(p + "attn_norm.bias", required=False,
                               keep_q=False),
            # MLA (deepseek2) replaces wk/wv with the latent
            # projections; deci attention-free/linear layers have no
            # q/k/v (and no wo at all when attention-free)
            "wq": get(p + "attn_q.weight", required=False),
            "wk": get(p + "attn_k.weight", required=False),
            "wv": get(p + "attn_v.weight", required=False),
            "wo": get(p + "attn_output.weight", required=False),
            "q_norm": get(p + "attn_q_norm.weight", required=False),
            "k_norm": get(p + "attn_k_norm.weight", required=False),
            # chameleon biased per-head q/k LayerNorms
            "q_norm_b": get(p + "attn_q_norm.bias", required=False,
                            keep_q=False),
            "k_norm_b": get(p + "attn_k_norm.bias", required=False,
                            keep_q=False),
            # attention projection biases (qwen2/qwen2.5, gpt-oss)
            "bq": get(p + "attn_q.bias", required=False, keep_q=False),
            "bk": get(p + "attn_k.bias", required=False, keep_q=False),
            "bv": get(p + "attn_v.bias", required=False, keep_q=False),
            "bo": get(p + "attn_output.bias", required=False, keep_q=False),
            # learned attention-sink logits (gpt-oss, blk.N.attn_sinks)
            "sinks": get(p + "attn_sinks.weight", required=False,
                         keep_q=False),
            # bitnet: sub-norms inside the sublayers + per-projection
            # scalar scales of the i2_s packed format
            "attn_sub_norm": get(p + "attn_sub_norm.weight",
                                 required=False),
            "wq_scale": get(p + "attn_q.scale", required=False,
                            keep_q=False),
            "wk_scale": get(p + "attn_k.scale", required=False,
                            keep_q=False),
            "wv_scale": get(p + "attn_v.scale", required=False,
                            keep_q=False),
            "wo_scale": get(p + "attn_output.scale", required=False,
                            keep_q=False),
            "ffn_norm": get(p + "ffn_norm.weight", required=False),
            "ffn_norm_b": get(p + "ffn_norm.bias", required=False,
                              keep_q=False),
            # Gemma-2/3 sandwich norms (post_attention_norm / post_ffw_norm)
            "attn_post_norm": get(p + "post_attention_norm.weight",
                                  required=False),
            "ffn_post_norm": get(p + "post_ffw_norm.weight",
                                 required=False),
        })
        lp = params["layers"][-1]
        if mla:
            # deepseek2 MLA projections (convert_hf_to_gguf.py
            # DeepseekV2Model modify_tensors: wk_b [H, rank, nope] is the
            # transposed k half of kv_b_proj, wv_b [H, v_dim, rank])
            lp["wq_a"] = get(p + "attn_q_a.weight", required=False)
            lp["wq_b"] = get(p + "attn_q_b.weight", required=False)
            lp["q_a_norm"] = get(p + "attn_q_a_norm.weight", required=False)
            lp["wkv_a"] = get(p + "attn_kv_a_mqa.weight")
            lp["kv_a_norm"] = get(p + "attn_kv_a_norm.weight")
            # small 3-D per-head factors stay dense bf16 (absorbed einsums)
            lp["wk_b"] = get(p + "attn_k_b.weight", keep_q=False)
            lp["wv_b"] = get(p + "attn_v_b.weight", keep_q=False)
        # DeepSeek shared experts (ffn_*_shexp) + V3 selection bias
        if f"{p}ffn_gate_shexp.weight" in reader.tensors:
            lp["gate_shexp"] = get(p + "ffn_gate_shexp.weight")
            lp["up_shexp"] = get(p + "ffn_up_shexp.weight")
            lp["down_shexp"] = get(p + "ffn_down_shexp.weight")
            lp["gate_inp_shexp"] = get(p + "ffn_gate_inp_shexp.weight",
                                       required=False, keep_q=False)
        if f"{p}exp_probs_b.bias" in reader.tensors:
            lp["exp_probs_b"] = get(p + "exp_probs_b.bias", keep_q=False)
        if (lp["ffn_norm"] is None and lp["attn_post_norm"] is not None
                and lp["ffn_post_norm"] is None):
            # gpt-oss names its (only) pre-ffn norm "post_attention_norm";
            # without a separate ffn_norm it takes that slot and the graph
            # is plain pre-norm (llm_build_openai_moe_iswa)
            lp["ffn_norm"] = lp["attn_post_norm"]
            lp["attn_post_norm"] = None
        # a missing ffn_norm with no post-norms is the Cohere parallel-
        # residual layout (one shared pre-norm per layer) — allowed
        if f"{p}ffn_gate_inp.weight" in reader.tensors:
            # MoE FFN (reference blk.N.ffn_{gate_inp,gate_exps,up_exps,
            # down_exps}): quantized 3-D expert stacks stay quantized as a
            # per-expert QTensor list (the fused dequant kernel runs per
            # dispatched expert batch); dense sources load as bf16 stacks
            # whose expert axis is EP-shardable
            lp["gate_inp"] = get(p + "ffn_gate_inp.weight", keep_q=False)
            # arctic/grok: a dense FFN runs in PARALLEL with the MoE
            lp["ffn_norm_exps"] = get(p + "ffn_norm_exps.weight",
                                      required=False)
            # gpt-oss routed-expert biases (router + per-projection)
            lp["gate_inp_b"] = get(p + "ffn_gate_inp.bias", required=False,
                                   keep_q=False)
            for nm, key in (("ffn_gate_exps", "gate_exps"),
                            ("ffn_up_exps", "up_exps"),
                            ("ffn_down_exps", "down_exps")):
                lp[key] = _load_expert_stack(reader, p + nm + ".weight",
                                             keep_quantized)
                lp[key + "_b"] = get(p + nm + ".bias", required=False,
                                     keep_q=False)
            # grovemoe adjugate chunk experts (tiny F': dense bf16 stacks)
            if f"{p}ffn_gate_chexps.weight" in reader.tensors:
                lp["gate_chexps"] = get(p + "ffn_gate_chexps.weight",
                                        keep_q=False)
                lp["up_chexps"] = get(p + "ffn_up_chexps.weight",
                                      keep_q=False)
                lp["down_chexps"] = get(p + "ffn_down_chexps.weight",
                                        keep_q=False)
            # arctic residual_mlp / grok-2 parallel dense branch
            lp["w_gate"] = get(p + "ffn_gate.weight", required=False)
            lp["w_up"] = get(p + "ffn_up.weight", required=False)
            lp["w_down"] = get(p + "ffn_down.weight", required=False)
        else:
            # gate is absent for un-gated FFN archs (GPT-2 family);
            # deci FFN-free layers have no ffn tensors at all
            lp["w_gate"] = get(p + "ffn_gate.weight", required=False)
            lp["w_up"] = get(p + "ffn_up.weight", required=False)
            lp["w_down"] = get(p + "ffn_down.weight", required=False)
            if (lp["w_gate"] is None and lp["w_up"] is not None
                    and lp["w_up"].shape[0] == 2 * lp["w_down"].shape[1]):
                # glm4-style disk-fused gate|up in ffn_up (LLM_FFN_SWIGLU
                # with no separate gate, llm_build_glm4)
                lp["w_gateup"] = lp.pop("w_up")
            lp["b_gate"] = get(p + "ffn_gate.bias", required=False,
                               keep_q=False)
            lp["b_up"] = get(p + "ffn_up.bias", required=False,
                             keep_q=False)
            lp["b_down"] = get(p + "ffn_down.bias", required=False,
                               keep_q=False)
            lp["ffn_sub_norm"] = get(p + "ffn_sub_norm.weight",
                                     required=False)
            lp["gate_scale"] = get(p + "ffn_gate.scale", required=False,
                                   keep_q=False)
            lp["up_scale"] = get(p + "ffn_up.scale", required=False,
                                 keep_q=False)
            lp["down_scale"] = get(p + "ffn_down.scale", required=False,
                                   keep_q=False)
        if fqkv:
            lp["wqkv"] = get(p + "attn_qkv.weight")
            lp["bqkv"] = get(p + "attn_qkv.bias", required=False,
                             keep_q=False)
        if f"{p}attn_norm_2.weight" in reader.tensors:
            # falcon-40b dual norms: attn_norm_2 feeds ATTENTION,
            # attn_norm feeds the FFN (llm_build_falcon) — remap into the
            # engine's parallel-residual slots (attention norm in
            # attn_norm, ffn's own layer-input norm in ffn_norm)
            lp["ffn_norm"] = lp["attn_norm"]
            lp["ffn_norm_b"] = lp["attn_norm_b"]
            lp["attn_norm"] = get(p + "attn_norm_2.weight")
            lp["attn_norm_b"] = get(p + "attn_norm_2.bias", required=False,
                                    keep_q=False)
        i += 1
    if fuse:
        params["layers"] = [fuse_layer(l) for l in params["layers"]]
    return params


def _load_expert_stack(reader: GGUFReader, name: str, keep_quantized: bool):
    """3-D [E, F, D] expert stack: quantized formats become a QExpertStack
    (per-expert SoA planes with a leading expert axis — capacity path runs
    the fused kernel per expert, decode gathers only the selected experts);
    dense formats load as one bf16 stack."""
    import numpy as np

    from ..core.dtypes import GGMLType
    from ..core import quants as nq
    from ..kernels.qformats import NATIVE_QTYPES, QExpertStack, repack

    ti = reader.tensors[name]
    t = GGMLType(ti.ggml_type)
    shape = tuple(ti.shape)
    if keep_quantized and t in NATIVE_QTYPES and len(shape) == 3:
        e = shape[0]
        blocks = np.asarray(ti.data).reshape(e, -1)
        return QExpertStack.stack(
            [repack(blocks[i], t, shape[1:]) for i in range(e)])
    x = nq.dequantize(ti.data, t, shape)
    return jnp.asarray(x, jnp.bfloat16)


def embed(params: dict, tokens: jax.Array) -> jax.Array:
    """Token ids -> embeddings [T, d] (bf16)."""
    return params["token_embd"][tokens].astype(jnp.bfloat16)


def resolve_rope_freqs(cfg: Qwen3Config, params: dict
                       ) -> tuple[jax.Array | None, float]:
    """Per-dim inverse frequencies + attention (mscale) factor for the
    FULL-rope layers. Returns (None, 1.0) for plain rope — the caller
    falls back to apply_rope's base-derived frequencies. SWA layers
    always rope at the unscaled rope_base_swa (gemma3 semantics: HF
    applies rope_scaling only to the global-attention layers)."""
    from ..kernels.rope import rope_freqs, yarn_freqs

    dim = cfg.rope_dim if cfg.rope_dim > 0 else cfg.head_dim
    freqs = None
    if cfg.rope_scaling == "linear":
        freqs = rope_freqs(dim, cfg.rope_base) / cfg.rope_scale_factor
    elif cfg.rope_scaling == "yarn":
        freqs = yarn_freqs(dim, cfg.rope_base, cfg.rope_scale_factor,
                           cfg.rope_orig_ctx or 1,
                           cfg.yarn_beta_fast, cfg.yarn_beta_slow)
    elif cfg.rope_scaling == "longrope":
        fac = (params["rope_factors_long"] if cfg.rope_long
               else params["rope_factors_short"])
        freqs = rope_freqs(dim, cfg.rope_base) / fac.astype(jnp.float32)
    if params.get("rope_freqs") is not None:
        # llama3 scaling: per-dim divisors precomputed by the converter
        # (reference rope_freqs.weight tensor)
        base_f = (freqs if freqs is not None
                  else rope_freqs(dim, cfg.rope_base))
        freqs = base_f / params["rope_freqs"].astype(jnp.float32)
    if freqs is None:
        return None, 1.0
    return freqs, cfg.rope_attn_factor


def forward(
    params: dict,
    cfg: Qwen3Config,
    x: jax.Array,  # [T, d_model] input embeddings (use `embed` for tokens)
    pos: jax.Array,  # [T] int32
    seq_id: jax.Array,  # [T] int32
    cache: KVCache,
    slots: jax.Array,  # [T] cell indices from cache.find_slots
    write_mask: jax.Array | None = None,  # [T] bool; False = padding row
    kv_limit: int | None = None,  # static: attend over cells [0, kv_limit)
    pos3: jax.Array | None = None,  # [T, 3] M-RoPE position streams
) -> tuple[jax.Array, jax.Array, KVCache]:
    """One decode/prefill step. Returns (logits [T, vocab] f32,
    hidden [T, d_model] — the tap the omni TTS projector consumes
    (reference tools/omni/omni.cpp:345-403), updated cache).

    `kv_limit` is the ragged-KV read bound (reference llama_kv_cache's
    n_kv high-water): attention and mask reads stream only the first
    kv_limit pool cells instead of the whole static pool. The caller
    (runtime.Context / the omni scan) guarantees every occupied cell —
    and every slot this step writes — lies below it."""
    t = x.shape[0]
    h = x.astype(jnp.bfloat16)
    if cfg.emb_scale != 1.0:  # Gemma: embeddings × sqrt(d_model)
        h = h * jnp.bfloat16(cfg.emb_scale)
    if params.get("position_embd") is not None:
        # GPT-2 learned absolute position embeddings (llm_build_gpt2
        # pos_embd get_rows) — position comes from the KV position vector
        h = h + params["position_embd"][pos].astype(h.dtype)
    if params.get("tok_norm") is not None:
        # BLOOM embedding LayerNorm (llm_build_bloom token_embd_norm)
        h = layer_norm(h, params["tok_norm"], params.get("tok_norm_b"),
                       cfg.rms_eps)

    if write_mask is None:
        write_mask = jnp.ones((t,), bool)
    # Deferred-write path (default): attend over (pool BEFORE this ubatch)
    # ∪ (current-batch K/V as extra columns), then land all layers' K/V in
    # the pool with ONE scatter — dynamic-index scatters cost ~30-40 us on
    # TPU, so 72 per-layer writes/step were ~1.4 ms/token. The quantized
    # cache keeps write-then-read (its flash kernel reads pool planes).
    deferred = not cache.quantized
    if deferred:
        from ..runtime.kv_cache import primary_seq_bit, seq_bits_of

        mask = cache.attn_mask(pos, seq_id, limit=kv_limit,
                               causal=cfg.causal)  # pool only
        # intra-batch visibility: key row's membership bits ∩ query's
        # primary seq (multi-membership rows use the packed encoding)
        mask_cur = ((seq_bits_of(seq_id)[None, :]
                     & primary_seq_bit(seq_id)[:, None]) != 0)
        if cfg.causal:
            mask_cur = mask_cur & (pos[None, :] <= pos[:, None])
        mask_cur = mask_cur & write_mask[None, :]
        new_ks, new_vs = [], []
    else:
        # commit metadata first so intra-batch causal attention sees it
        cache = cache.commit(slots, pos, seq_id, valid=write_mask)
        mask = cache.attn_mask(pos, seq_id, limit=kv_limit,
                               causal=cfg.causal)  # [T, S]
        mask_cur = None

    # interleaved SWA (Gemma-2/3): windowed layers additionally require
    # key_pos > q_pos - window (llama_kv_cache_iswa's mask term; the
    # dual-pool memory optimisation lives in runtime/swa.py)
    cpos = cache.pos if kv_limit is None else cache.pos[:kv_limit]
    has_swa = cfg.swa_window > 0 and cfg.swa_every > 0
    if has_swa:
        w = cfg.swa_window
        if cfg.swa_chunked:
            # llama4 chunked attention: same-chunk keys only
            # (LLAMA_SWA_TYPE_CHUNKED: k_pos >= floor(q_pos/w)*w)
            lo = (pos // w) * w
            mask_swa = mask & (cpos[None, :] >= lo[:, None])
            mask_cur_swa = (mask_cur & (pos[None, :] >= lo[:, None])
                            if mask_cur is not None else None)
        else:
            mask_swa = mask & (cpos[None, :] > pos[:, None] - w)
            mask_cur_swa = (mask_cur & (pos[None, :] > pos[:, None] - w)
                            if mask_cur is not None else None)

    # ALiBi (BLOOM/MPT): positional score bias instead of rope
    alibi_pool = alibi_mix = None
    if cfg.max_alibi_bias > 0.0:
        from ..kernels.attention import alibi_slopes

        slopes = jnp.asarray(
            alibi_slopes(cfg.n_heads, cfg.max_alibi_bias))
        dist_pool = -jnp.abs(pos[:, None]
                             - cpos[None, :]).astype(jnp.float32)
        alibi_pool = (slopes, dist_pool)
        if deferred:
            dist_cur = -jnp.abs(pos[:, None]
                                - pos[None, :]).astype(jnp.float32)
            alibi_mix = (slopes, dist_pool, dist_cur)

    qd = cfg.n_heads * cfg.head_dim
    kvd = cfg.n_kv_heads * cfg.head_dim
    # rope context scaling (yarn/linear/longrope/llama3 divisors):
    # resolved once; None = plain base-derived frequencies. SWA layers
    # scale too UNLESS the arch defines a distinct local base
    # (gemma3: local layers rope plain at rope_local_base_freq while
    # only global layers carry the linear factor; phi3-style all-SWA
    # archs share one base and scale everywhere)
    rfreqs, rscale = resolve_rope_freqs(cfg, params)
    swa_scaled = cfg.rope_base_swa == cfg.rope_base
    for li, lp in enumerate(params["layers"]):
        h_in = h
        layer_in = h  # pre-attention residual (arctic MoE / smallthinker router input)
        if cfg.norm_type == "rms":
            def bnorm(x, w, eps, b=None):
                return rms_norm(x, w, eps)
        else:  # LayerNorm: biased for GPT-2 (norm_bias), bias-free Cohere
            def bnorm(x, w, eps, b=None):
                return layer_norm(x, w, b, eps)
        hn = (bnorm(h, lp["attn_norm"], cfg.rms_eps,
                    lp.get("attn_norm_b"))
              if cfg.pre_norm else h)  # OLMo-2: sublayer input unnormalized
        mla = cfg.kv_lora_rank > 0
        # deci per-layer variants (llm_build_deci): a layer with no
        # attention tensors at all skips the sublayer; one with ONLY wo
        # is the Nemotron-51B "linear attention" (wo on the norm output)
        no_qkv = (not mla and "wqkv" not in lp and lp.get("wq") is None
                  and lp.get("wkv_a") is None)
        if no_qkv:
            if deferred:
                zkv = jnp.zeros((t, cache.n_kv_heads, cache.k.shape[-1]),
                                jnp.bfloat16)
                new_ks.append(zkv)
                new_vs.append(jnp.zeros(
                    (t, cache.n_kv_heads, cache.v.shape[-1]),
                    jnp.bfloat16))
            attn_out = (matmul(hn, lp["wo"])
                        if lp.get("wo") is not None else None)
        elif mla:
            # --- MLA (deepseek2, llm_build_deepseek2 absorbed path):
            # q: (optionally low-rank) projection -> [nope | rope] heads;
            # kv: ONE latent head [rope | rank]; q_nope absorbs wk_b so
            # scores contract in latent space (MQA geometry) ------------
            if lp.get("wq_a") is not None:
                qm = matmul(hn, lp["wq_a"])
                qm = rms_norm(qm, lp["q_a_norm"], cfg.rms_eps)
                qm = matmul(qm, lp["wq_b"])
            else:  # V2-Lite: direct q projection
                qm = matmul(hn, lp["wq"])
            hk = cfg.qk_nope_dim + cfg.rope_dim
            qm = qm.reshape(t, cfg.n_heads, hk)
            q_nope, q_pe = qm[..., :cfg.qk_nope_dim], qm[..., cfg.qk_nope_dim:]
            kv_a = matmul(hn, lp["wkv_a"])  # [t, rank + rope]
            kv_cmpr = rms_norm(kv_a[:, :cfg.kv_lora_rank],
                               lp["kv_a_norm"], cfg.rms_eps)
            k_pe = kv_a[:, cfg.kv_lora_rank:].reshape(t, 1, cfg.rope_dim)
            q_pe = apply_rope(q_pe, pos, cfg.rope_base, freqs=rfreqs,
                              neox=cfg.rope_neox, scale=rscale)
            k_pe = apply_rope(k_pe, pos, cfg.rope_base, freqs=rfreqs,
                              neox=cfg.rope_neox, scale=rscale)
            # absorb: q_abs[t,h,r] = sum_n q_nope[t,h,n] * wk_b[h,r,n]
            q_abs = jnp.einsum(
                "thn,hrn->thr", q_nope.astype(jnp.bfloat16),
                lp["wk_b"].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            # rope section FIRST (cache re-rotation rotates [:rope_dim])
            q = jnp.concatenate([q_pe.astype(jnp.bfloat16), q_abs], -1)
            k = jnp.concatenate(
                [k_pe.astype(jnp.bfloat16),
                 kv_cmpr[:, None, :].astype(jnp.bfloat16)], -1)
            v = kv_cmpr[:, None, :].astype(jnp.bfloat16)
        elif "wqkv" in lp:  # fused decode fast path
            qkv = matmul(hn, lp["wqkv"])
            if lp.get("bqkv") is not None:  # qwen2-family attn biases
                qkv = qkv + lp["bqkv"].astype(qkv.dtype)
            q, k = qkv[:, :qd], qkv[:, qd:qd + kvd]
            if (lp["q_norm"] is not None
                    and cfg.qk_norm_type == "rms"
                    and lp["q_norm"].shape[-1] != cfg.head_dim):
                q = rms_norm(q, lp["q_norm"], cfg.rms_eps)  # OLMo-2 width
                k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
            q = q.reshape(t, cfg.n_heads, cfg.head_dim)
            k = k.reshape(t, cfg.n_kv_heads, cfg.head_dim)
            v = qkv[:, qd + kvd:].reshape(t, cfg.n_kv_heads, cfg.head_dim)
        else:
            q, k, v = (matmul(hn, lp[w]) for w in ("wq", "wk", "wv"))
            if lp.get("bq") is not None:  # qwen2-family attn biases
                q = q + lp["bq"].astype(q.dtype)
                k = k + lp["bk"].astype(k.dtype)
                v = v + lp["bv"].astype(v.dtype)
            if lp.get("wq_scale") is not None:  # bitnet i2_s scales
                q = q * lp["wq_scale"].astype(q.dtype)
                k = k * lp["wk_scale"].astype(k.dtype)
                v = v * lp["wv_scale"].astype(v.dtype)
            # OLMo-2 normalizes the FULL q/k projections (statistics over
            # n_heads*head_dim, weight that wide) before the head split
            # (chameleon's per-head LN weights are also full-width but
            # route through qk_norm_type == "layer" instead)
            if (lp["q_norm"] is not None
                    and cfg.qk_norm_type == "rms"
                    and lp["q_norm"].shape[-1] != cfg.head_dim):
                q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
                k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
            # head counts from the projection widths (deci/openelm
            # per-layer geometry; uniform archs resolve identically)
            q = q.reshape(t, -1, cfg.head_dim)
            k = k.reshape(t, -1, cfg.head_dim)
            v = v.reshape(t, -1, cfg.head_dim)
        if not no_qkv:
            if cfg.clamp_kqv > 0.0:  # OLMo f_clamp_kqv (llm_build_olmo)
                c = cfg.clamp_kqv
                q = jnp.clip(q, -c, c)
                k = jnp.clip(k, -c, c)
                v = jnp.clip(v, -c, c)
            if not mla and cfg.qk_norm_type == "layer":
                # chameleon per-head biased LayerNorm (pre-rope)
                if lp["q_norm"] is not None:
                    qw = lp["q_norm"].reshape(cfg.n_heads, cfg.head_dim)
                    qb = lp["q_norm_b"].reshape(cfg.n_heads, cfg.head_dim)
                    q = layer_norm(q, qw[None], qb[None], cfg.rms_eps)
                if lp["k_norm"] is not None:
                    kw_ = lp["k_norm"].reshape(cfg.n_kv_heads, cfg.head_dim)
                    kb = lp["k_norm_b"].reshape(cfg.n_kv_heads, cfg.head_dim)
                    k = layer_norm(k, kw_[None], kb[None], cfg.rms_eps)
            elif not mla and not cfg.qk_norm_post_rope:
                if (lp["q_norm"] is not None
                        and lp["q_norm"].shape[-1] == cfg.head_dim):
                    q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
                if (lp["k_norm"] is not None
                        and lp["k_norm"].shape[-1] == cfg.head_dim):
                    k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
            swa_l = has_swa and cfg.is_swa_layer(li)
            base_l = cfg.rope_base_swa if swa_l else cfg.rope_base
            rope_l = cfg.use_rope and (
                cfg.no_rope_step == 0
                or ((li % cfg.no_rope_step != 0) if cfg.no_rope_mod_zero
                    else ((li + 1) % cfg.no_rope_step != 0)))
            if not mla and rope_l:  # MLA ropes only its q_pe/k_pe
                # sections (above); GPT-2 has learned absolute positions;
                # SmolLM3 NoPE layers skip rotation per-layer
                if 0 < cfg.rope_dim < cfg.head_dim:
                    # partial rotary (phi2/neox rot_pct): only the LEADING
                    # rope_dim columns rotate — same layout the cache
                    # re-rotation assumes (llm_build_phi2 n_rot)
                    r = cfg.rope_dim
                    fl, sl = ((rfreqs, rscale)
                              if (not swa_l or swa_scaled) else (None, 1.0))
                    q = jnp.concatenate(
                        [apply_rope(q[..., :r], pos, base_l, freqs=fl,
                                    neox=cfg.rope_neox, scale=sl),
                         q[..., r:]], -1)
                    k = jnp.concatenate(
                        [apply_rope(k[..., :r], pos, base_l, freqs=fl,
                                    neox=cfg.rope_neox, scale=sl),
                         k[..., r:]], -1)
                elif cfg.mrope_sections and pos3 is not None:
                    from ..kernels.rope import apply_mrope

                    q = apply_mrope(q, pos3, cfg.mrope_sections, base_l,
                                    freqs=rfreqs)
                    k = apply_mrope(k, pos3, cfg.mrope_sections, base_l,
                                    freqs=rfreqs)
                else:
                    fl, sl = ((rfreqs, rscale)
                              if (not swa_l or swa_scaled) else (None, 1.0))
                    q = apply_rope(q, pos, base_l, freqs=fl,
                                   neox=cfg.rope_neox, scale=sl)
                    k = apply_rope(k, pos, base_l, freqs=fl,
                                   neox=cfg.rope_neox, scale=sl)
                if cfg.qk_norm_l2:
                    # llama4 L2 norm on roped q/k (weightless RMS, post-rope)
                    q = rms_norm(q, None, cfg.rms_eps)
                    k = rms_norm(k, None, cfg.rms_eps)
            if cfg.qk_norm_post_rope and not mla:
                # HunYuan: weighted per-head q/k norms AFTER rope
                if lp["q_norm"] is not None:
                    q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
                if lp["k_norm"] is not None:
                    k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
            elif not mla and cfg.attn_temp_scale > 0.0:
                # llama4 NoPE-layer temperature tuning: q scaled by
                # 1 + s·log(1 + floor(pos/floor_scale))
                tt = (1.0 + cfg.attn_temp_scale
                      * jnp.log1p(jnp.floor(pos.astype(jnp.float32)
                                            / cfg.attn_temp_floor)))
                q = q * tt[:, None, None].astype(q.dtype)
            mask_l = mask_swa if swa_l else mask
            nkv_l = k.shape[1]
            if deferred:
                kc, vc = cache.read_layer(li, limit=kv_limit)
                if nkv_l < cache.n_kv_heads:  # deci per-layer GQA width
                    kc, vc = kc[:nkv_l], vc[:nkv_l]
                attn = mixed_attention(q, kc, vc, k, v, mask_l,
                                       mask_cur_swa if swa_l else mask_cur,
                                       scale=cfg.attn_scale,
                                       logit_softcap=cfg.attn_softcap,
                                       sinks=lp.get("sinks"),
                                       alibi=alibi_mix)
                if nkv_l < cache.n_kv_heads:
                    padw = ((0, 0), (0, cache.n_kv_heads - nkv_l), (0, 0))
                    k = jnp.pad(k, padw)
                    v = jnp.pad(v, padw)
                new_ks.append(k)
                new_vs.append(v)
            else:
                # padding rows write into their (unowned) slots: metadata stays
                # free, so garbage K/V is never attended to
                cache = cache.write(li, slots, k, v)
                attn = pool_attention(q, cache, li, mask_l, kv_limit=kv_limit,
                                      scale=cfg.attn_scale,
                                      logit_softcap=cfg.attn_softcap,
                                      sinks=lp.get("sinks"),
                                      alibi=alibi_pool)
        if not no_qkv:
            if mla:
                # decompress latent attention output per head through
                # wv_b [H, v_dim, rank] (build_attn's v_mla argument)
                attn = jnp.einsum(
                    "thr,hvr->thv", attn.astype(jnp.bfloat16),
                    lp["wv_b"].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32
                ).astype(jnp.bfloat16)
            attn_flat = attn.reshape(t, -1)
            if lp.get("attn_sub_norm") is not None:
                # bitnet: RMS norm on the attention output BEFORE wo
                # (llm_build_bitnet attn_sub_norm)
                attn_flat = rms_norm(attn_flat, lp["attn_sub_norm"],
                                     cfg.rms_eps)
            attn_out = matmul(attn_flat, lp["wo"])
            if lp.get("wo_scale") is not None:  # bitnet i2_s scale
                attn_out = attn_out * lp["wo_scale"].astype(attn_out.dtype)
            if lp.get("bo") is not None:  # gpt-oss output bias
                attn_out = attn_out + lp["bo"].astype(attn_out.dtype)
        if attn_out is not None:
            if cfg.sandwich_norms:  # Gemma post-attention norm
                attn_out = rms_norm(attn_out, lp["attn_post_norm"],
                                    cfg.rms_eps)
            if cfg.residual_scale != 1.0:  # granite/minicpm
                attn_out = attn_out * jnp.bfloat16(cfg.residual_scale)
        if not cfg.parallel_residual:
            if attn_out is not None:
                h = h_in + attn_out
                h_in = h
            hn = (bnorm(h, lp["ffn_norm"], cfg.rms_eps,
                        lp.get("ffn_norm_b"))
                  if cfg.pre_norm else h)
        elif lp.get("ffn_norm") is not None:
            # NeoX-style parallel residual (use_par_res,
            # llm_build_gptneox): the ffn has its OWN norm but reads the
            # LAYER INPUT; Cohere instead shares the attn pre-norm output
            hn = bnorm(h_in, lp["ffn_norm"], cfg.rms_eps,
                       lp.get("ffn_norm_b"))
        # Cohere parallel residual: the ffn reads the SAME pre-norm output
        # and both sublayers add to the original residual stream
        if cfg.act == "silu":
            act = jax.nn.silu
        elif cfg.act == "relu2":  # nemotron LLM_FFN_RELU_SQR
            act = lambda z: jnp.square(jax.nn.relu(z))  # noqa: E731
        else:
            act = lambda z: jax.nn.gelu(z, approximate=True)  # noqa: E731
        no_ffn = (lp.get("gate_inp") is None and "w_gateup" not in lp
                  and lp.get("w_up") is None)
        if no_ffn:
            # deci FFN-free layer (Nemotron-Ultra): attention only
            ffn_out = None
        elif lp.get("gate_inp") is not None:
            router_x = (layer_in if cfg.moe_router_input == "layer_input"
                        else None)
            if cfg.moe_parallel_ffn == "arctic":
                # llm_build_arctic: dense FFN on ffn_norm(ffn_inp) +
                # MoE on ffn_norm_exps(LAYER INPUT), summed
                moe_in = rms_norm(layer_in, lp["ffn_norm_exps"],
                                  cfg.rms_eps)
                moe_out = moe_ffn(lp, cfg, moe_in)
                dg = matmul(hn, lp["w_gate"])
                du = matmul(hn, lp["w_up"])
                dense = matmul(
                    act(dg.astype(jnp.float32)).astype(jnp.bfloat16) * du,
                    lp["w_down"])
                ffn_out = moe_out + dense.astype(moe_out.dtype)
            else:
                ffn_out = moe_ffn(lp, cfg, hn, router_x=router_x)
                if lp.get("gate_chexps") is not None:
                    # GroveMoE adjugate pass: chunk experts consume the
                    # MAIN MoE's output, scaled by expert_group_scale
                    # (llm_build_grovemoe second build_moe_ffn)
                    ffn_out = ffn_out + cfg.moe_grove_scale * \
                        _grove_adjugate(lp, cfg, ffn_out, hn)
                if (cfg.moe_parallel_ffn == "grok"
                        and lp.get("w_gate") is not None):
                    # llm_build_grok: (dense + moe) * sqrt(2)/2
                    dg = matmul(hn, lp["w_gate"])
                    du = matmul(hn, lp["w_up"])
                    dense = matmul(
                        act(dg.astype(jnp.float32)).astype(jnp.bfloat16)
                        * du, lp["w_down"])
                    ffn_out = ((ffn_out + dense.astype(ffn_out.dtype))
                               * jnp.bfloat16(2 ** 0.5 / 2))
            if lp.get("gate_shexp") is not None:
                # DeepSeek shared experts: a dense SwiGLU branch added to
                # the routed mix (llm_build_deepseek2 ffn_shexp)
                sg = matmul(hn, lp["gate_shexp"])
                su = matmul(hn, lp["up_shexp"])
                shexp = matmul(
                    act(sg.astype(jnp.float32)).astype(jnp.bfloat16) * su,
                    lp["down_shexp"]).astype(ffn_out.dtype)
                if lp.get("gate_inp_shexp") is not None:
                    # qwen2moe gates the shared expert with a sigmoid
                    # scalar head (llm_build_qwen2moe ffn_gate_inp_shexp)
                    g_sh = jax.nn.sigmoid(
                        matmul(hn, lp["gate_inp_shexp"],
                               out_dtype=jnp.float32))
                    shexp = shexp * g_sh.astype(shexp.dtype)
                ffn_out = ffn_out + shexp
        elif "w_gateup" in lp:
            from ..kernels.fused_ffn import qffn_pallas
            from ..kernels.qformats import QTensor

            import os

            if (isinstance(lp["w_gateup"], QTensor)
                    and isinstance(lp["w_down"], QTensor)
                    and jax.default_backend() == "tpu"
                    and cfg.act in ("silu", "gelu")
                    # default-off until chip-verified (interpret-mode
                    # parity is covered; Mosaic lowering is not yet)
                    and os.environ.get("OMNI_FUSED_FFN", "0") == "1"):
                # whole SwiGLU FFN in ONE pallas dispatch: the [T, 2F]
                # gate/up intermediate never leaves VMEM (kills one
                # 15-20 µs pallas-call floor per layer + an XLA
                # elementwise round-trip — docs/PERF.md megakernel lever)
                ffn_out = qffn_pallas(
                    hn, lp["w_gateup"], lp["w_down"],
                    act="silu" if cfg.act == "silu" else "gelu_tanh")
            else:
                gu = matmul(hn, lp["w_gateup"])
                gate, up = gu[:, :cfg.d_ff], gu[:, cfg.d_ff:]
                ffn_out = matmul(
                    act(gate.astype(jnp.float32)).astype(jnp.bfloat16) * up,
                    lp["w_down"])
        elif lp.get("w_gate") is None:
            # un-gated FFN (GPT-2 family, build_ffn LLM_FFN_SEQ): act(x@up
            # + b_up) @ down + b_down
            up = matmul(hn, lp["w_up"])
            if lp.get("b_up") is not None:
                up = up + lp["b_up"].astype(up.dtype)
            if cfg.act == "xielu":
                # Apertus per-layer xIELU (ggml_xielu/op_xielu): the op
                # takes beta+softplus(alpha_n) and softplus(alpha_p)
                import math

                an, ap, bb, ee = cfg.xielu[li]
                apk = math.log1p(math.exp(ap))  # softplus, host-side
                ank = bb + math.log1p(math.exp(an))
                z = up.astype(jnp.float32)
                acted = jnp.where(
                    z > 0.0, apk * z * z + bb * z,
                    (jnp.expm1(jnp.minimum(z, ee)) - z) * ank + bb * z)
            else:
                acted = act(up.astype(jnp.float32))
            ffn_out = matmul(acted.astype(jnp.bfloat16), lp["w_down"])
            if lp.get("b_down") is not None:
                ffn_out = ffn_out + lp["b_down"].astype(ffn_out.dtype)
        else:
            gate = matmul(hn, lp["w_gate"])
            up = matmul(hn, lp["w_up"])
            if lp.get("b_gate") is not None:  # jais biased SwiGLU
                gate = gate + lp["b_gate"].astype(gate.dtype)
            if lp.get("b_up") is not None:
                up = up + lp["b_up"].astype(up.dtype)
            if lp.get("gate_scale") is not None:  # bitnet i2_s scales
                gate = gate * lp["gate_scale"].astype(gate.dtype)
                up = up * lp["up_scale"].astype(up.dtype)
            h_ff = act(gate.astype(jnp.float32)).astype(jnp.bfloat16) * up
            if lp.get("ffn_sub_norm") is not None:  # bitnet pre-down norm
                h_ff = rms_norm(h_ff, lp["ffn_sub_norm"], cfg.rms_eps)
            ffn_out = matmul(h_ff, lp["w_down"])
            if lp.get("b_down") is not None:  # jais biased down proj
                ffn_out = ffn_out + lp["b_down"].astype(ffn_out.dtype)
            if lp.get("down_scale") is not None:
                ffn_out = ffn_out * lp["down_scale"].astype(ffn_out.dtype)
        if ffn_out is not None:
            if cfg.sandwich_norms:  # Gemma post-ffw norm
                ffn_out = rms_norm(ffn_out, lp["ffn_post_norm"],
                                   cfg.rms_eps)
            if cfg.residual_scale != 1.0:  # granite/minicpm
                ffn_out = ffn_out * jnp.bfloat16(cfg.residual_scale)
            h = h_in + ffn_out
        if cfg.parallel_residual and attn_out is not None:
            h = h + attn_out
        if lp.get("cvec") is not None:  # control-vector steering
            h = h + lp["cvec"].astype(h.dtype)

    if deferred:
        cache = cache.write_all(slots, jnp.stack(new_ks), jnp.stack(new_vs))
        cache = cache.commit(slots, pos, seq_id, valid=write_mask)

    hidden = (rms_norm(h, params["output_norm"], cfg.rms_eps)
              if cfg.norm_type == "rms"
              else layer_norm(h, params["output_norm"],
                              params.get("output_norm_b"), cfg.rms_eps))
    head = params["output"] if params["output"] is not None else params["token_embd"]
    if head is None:
        # headless decoder (the TTS module: logits come from the external
        # head_code side weights, tools/omni/omni.cpp:1260); only the
        # hidden tap is meaningful
        logits = jnp.zeros((t, 1), jnp.float32)
    else:
        logits = matmul(hidden, head, out_dtype=jnp.float32)
        if params.get("output_b") is not None:  # phi2 lm-head bias
            logits = logits + params["output_b"].astype(logits.dtype)
        if cfg.final_softcap > 0.0:  # Gemma-2 final logit capping
            logits = jnp.tanh(logits / cfg.final_softcap) * cfg.final_softcap
        if cfg.logit_scale != 1.0:  # granite/minicpm: logits / scale
            logits = logits / cfg.logit_scale
    return logits, hidden.astype(jnp.float32), cache


MOE_CAPACITY_FACTOR = 2.0  # GShard-style slack over the perfect k/E split


def _grove_adjugate(lp: dict, cfg: Qwen3Config, cur: jax.Array,
                    hn: jax.Array) -> jax.Array:
    """GroveMoE adjugate chunk-expert MoE (llm_build_grovemoe second
    build_moe_ffn + the GROVEMOE branches in llama-graph.cpp:948,958):
    selection re-runs top-k over sigmoid(router(hn)), the selected expert
    ids integer-divide by n_group_experts into chunk ids; weights are the
    SOFTMAX probs read at the CHUNK id positions, renormalized; the tiny
    SiLU chunk experts transform `cur` (the main MoE's output)."""
    n_chunk = lp["gate_chexps"].shape[0]
    k = min(max(cfg.n_experts_used, 1), n_chunk)
    router = jnp.einsum("td,ed->te", hn.astype(jnp.float32),
                        lp["gate_inp"].astype(jnp.float32))
    _, top_i = jax.lax.top_k(jax.nn.sigmoid(router), k)
    chunk_i = top_i // cfg.n_group_experts
    probs = jax.nn.softmax(router, axis=-1)
    top_w = jnp.take_along_axis(probs, chunk_i, axis=-1)
    top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    cb = cur.astype(jnp.bfloat16)
    wg = lp["gate_chexps"][chunk_i]  # [T, K, F', D] dense (F' is tiny)
    wu = lp["up_chexps"][chunk_i]
    wd = lp["down_chexps"][chunk_i]  # [T, K, D, F']
    g = jnp.einsum("td,tkfd->tkf", cb, wg,
                   preferred_element_type=jnp.float32)
    u = jnp.einsum("td,tkfd->tkf", cb, wu,
                   preferred_element_type=jnp.float32)
    y = jnp.einsum("tkf,tkdf->tkd", (jax.nn.silu(g) * u).astype(jnp.bfloat16),
                   wd, preferred_element_type=jnp.float32)
    return jnp.einsum("tkd,tk->td", y, top_w).astype(cur.dtype)


def moe_ffn(lp: dict, cfg: Qwen3Config, hn: jax.Array,
            router_x: jax.Array | None = None) -> jax.Array:
    """Top-k routed SwiGLU expert mix (reference llm_build_qwen3moe /
    build_moe_ffn; CUDA analog: indexed mul_mat_id). Per-token FLOPs and
    weight reads are ∝ k/E, never dense-over-all-experts:

    - decode (tiny T): gather the k selected experts' weight slices per
      token and contract only those — weight traffic is k/E of the stacks
      (the mmvq/mul_mat_id design point);
    - prefill (large T): GShard-style capacity dispatch — tokens scatter
      into [E, C] slots (C ≈ T·k/E · slack), one batched einsum per
      projection over [E, C, ·], then weighted combine. EP = shard the
      leading expert axis of the 3-D stacks over the mesh.
    - quantized experts (list of per-expert QTensor): capacity dispatch
      with the fused dequant×matmul kernel per expert.

    hn [T, d] -> [T, d]. `router_x` overrides the router input
    (smallthinker routes on the pre-norm layer input)."""
    t = hn.shape[0]
    e = cfg.n_experts
    k = max(cfg.n_experts_used, 1)
    from ..kernels.qformats import QExpertStack

    rx = hn if router_x is None else router_x
    router = jnp.einsum("td,ed->te", rx.astype(jnp.float32),
                        lp["gate_inp"].astype(jnp.float32))
    if lp.get("gate_inp_b") is not None:  # gpt-oss router bias
        router = router + lp["gate_inp_b"].astype(jnp.float32)
    if cfg.moe_router_softcap > 0.0:  # grok router logit softcap
        c = cfg.moe_router_softcap
        router = jnp.tanh(router / c) * c
    # gating (build_moe_ffn, llama-graph.cpp:877): softmax (default; also
    # covers gpt-oss's SOFTMAX_WEIGHT — softmax-then-topk-then-renorm ==
    # softmax over the selected logits) or sigmoid (DeepSeek-V3)
    if cfg.moe_gating == "sparsemixer":
        # PhiMoE top-2 routing (HF modeling_phimoe.sparsemixer, eval
        # path — the reference approximates it with plain softmax top-2
        # in build_moe_ffn): expert 1 = argmax; its weight = softmax over
        # the scores with every entry where (max-s)/max(|s|,max) exceeds
        # 2*jitter_eps masked to -inf, gathered at the argmax; expert 2
        # repeats the procedure with expert 1 masked out. The two weights
        # come from separate masked softmaxes and are NOT renormalized.
        eps2 = 2.0 * cfg.moe_jitter_eps
        neg = jnp.finfo(jnp.float32).min

        def _pick(base):
            m = jnp.max(base, axis=-1, keepdims=True)
            idx = jnp.argmax(base, axis=-1)
            factor = jnp.maximum(jnp.abs(router), m)
            masked = jnp.where((m - router) / factor > eps2, neg, base)
            p = jax.nn.softmax(masked, axis=-1)
            return idx, jnp.take_along_axis(p, idx[:, None], axis=-1)[:, 0]

        e1, p1 = _pick(router)
        base2 = jnp.where(jax.nn.one_hot(e1, e, dtype=bool), neg, router)
        e2, p2 = _pick(base2)
        top_i = jnp.stack([e1, e2], axis=-1)
        top_w = jnp.stack([p1, p2], axis=-1)
    else:
        if cfg.moe_gating == "sigmoid":
            probs = jax.nn.sigmoid(router)
        else:  # softmax default; grove weights also come from softmax
            probs = jax.nn.softmax(router, axis=-1)  # [T, E]
        # V3 expert-selection bias (e_score_correction): biases SELECTION
        # only, weights come from the unbiased probs
        sel = (probs + lp["exp_probs_b"].astype(jnp.float32)
               if lp.get("exp_probs_b") is not None else probs)
        if cfg.moe_gating == "grove":
            # GroveMoE selects on sigmoid(logits), weights on softmax
            # (llama-graph.cpp:948 GROVEMOE selection_probs override)
            sel = jax.nn.sigmoid(router)
        _, top_i = jax.lax.top_k(sel, k)
        top_w = jnp.take_along_axis(probs, top_i, axis=-1)
        if cfg.moe_norm_w:  # norm_topk_prob
            top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
        if cfg.moe_scale_w != 1.0:  # routed_scaling_factor
            top_w = top_w * cfg.moe_scale_w
    hb = hn.astype(jnp.bfloat16)
    quant = isinstance(lp["gate_exps"], QExpertStack)
    # llama4 applies the (sigmoid) weights to the expert INPUT, not the
    # output (build_moe_ffn weight_before_ffn, llama-graph.cpp:899) —
    # not equivalent through the nonlinear experts
    w_before = cfg.moe_weight_before

    if t * k <= 16:  # decode path: gather SELECTED experts only
        bf = jnp.bfloat16
        hbk = hb[:, None, :] * top_w[:, :, None].astype(bf) if w_before \
            else jnp.broadcast_to(hb[:, None, :], (t, k, hb.shape[-1]))
        if quant:
            # planes of the k chosen experts stream from HBM and dequantize
            # (reads ∝ k/E); K-major [T*k, D, F] — contract on axis 1
            flat = top_i.reshape(-1)
            wg = lp["gate_exps"].gather_dequant(flat).reshape(
                t, k, cfg.d_model, -1)
            wu = lp["up_exps"].gather_dequant(flat).reshape(
                t, k, cfg.d_model, -1)
            wd = lp["down_exps"].gather_dequant(flat)  # [T*k, F, D]
            wd = wd.reshape(t, k, -1, cfg.d_model)
            gate = jnp.einsum("tkd,tkdf->tkf", hbk, wg,
                              preferred_element_type=jnp.float32)
            up = jnp.einsum("tkd,tkdf->tkf", hbk, wu,
                            preferred_element_type=jnp.float32)
            gate, up = _moe_bias(lp, top_i, gate, up)
            act = _moe_mix(gate, up, cfg.moe_act).astype(bf)
            out = jnp.einsum("tkf,tkfd->tkd", act, wd,
                             preferred_element_type=jnp.float32)
            out = _moe_down_bias(lp, top_i, out)
            if w_before:
                return out.sum(axis=1).astype(hn.dtype)
            return jnp.einsum("tk,tkd->td", top_w, out).astype(hn.dtype)
        wg = lp["gate_exps"][top_i].astype(bf)  # [T, k, F, D]
        wu = lp["up_exps"][top_i].astype(bf)
        wd = lp["down_exps"][top_i].astype(bf)  # [T, k, D, F]
        gate = jnp.einsum("tkd,tkfd->tkf", hbk, wg,
                          preferred_element_type=jnp.float32)
        up = jnp.einsum("tkd,tkfd->tkf", hbk, wu,
                        preferred_element_type=jnp.float32)
        gate, up = _moe_bias(lp, top_i, gate, up)
        act = _moe_mix(gate, up, cfg.moe_act).astype(bf)
        out = jnp.einsum("tkf,tkdf->tkd", act, wd,
                         preferred_element_type=jnp.float32)  # [T, k, d]
        out = _moe_down_bias(lp, top_i, out)
        if w_before:
            return out.sum(axis=1).astype(hn.dtype)
        return jnp.einsum("tk,tkd->td", top_w, out).astype(hn.dtype)
    return _moe_capacity(lp, cfg, hb, top_w, top_i, quant=quant)


def _moe_mix(gate: jax.Array, up: jax.Array, moe_act: str) -> jax.Array:
    """Expert gate/up combination. swiglu_oai is gpt-oss's clamped variant
    (ggml_swiglu_oai: gate<=limit, |up|<=limit, gate*sigmoid(1.702*gate) *
    (up+1), limit=7)."""
    if moe_act == "swiglu_oai":
        g = jnp.minimum(gate, 7.0)
        u = jnp.clip(up, -7.0, 7.0)
        return (g * jax.nn.sigmoid(1.702 * g)) * (u + 1.0)
    if moe_act == "gelu":  # grok GEGLU experts
        return jax.nn.gelu(gate, approximate=True) * up
    if moe_act == "relu":  # smallthinker ReGLU experts
        return jax.nn.relu(gate) * up
    return jax.nn.silu(gate) * up


def _moe_bias(lp: dict, top_i: jax.Array, gate: jax.Array,
              up: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Gathered per-expert gate/up biases for the decode path."""
    if lp.get("gate_exps_b") is not None:
        gate = gate + lp["gate_exps_b"][top_i].astype(jnp.float32)
        up = up + lp["up_exps_b"][top_i].astype(jnp.float32)
    return gate, up


def _moe_down_bias(lp: dict, top_i: jax.Array, out: jax.Array) -> jax.Array:
    if lp.get("down_exps_b") is not None:
        out = out + lp["down_exps_b"][top_i].astype(out.dtype)
    return out


def _moe_capacity(lp: dict, cfg: Qwen3Config, hb: jax.Array,
                  top_w: jax.Array, top_i: jax.Array,
                  quant: bool) -> jax.Array:
    """Capacity-based scatter/compute/combine. Tokens beyond an expert's
    capacity are dropped (standard GShard semantics; the slack factor makes
    drops rare at balanced routing)."""
    import math

    t, k = top_w.shape
    e = cfg.n_experts
    d = hb.shape[-1]
    c = max(1, math.ceil(t * k / e * MOE_CAPACITY_FACTOR))

    flat_e = top_i.reshape(-1)  # [T*k] expert of each (token, choice) pair
    onehot = (flat_e[:, None] == jnp.arange(e)[None, :]).astype(jnp.int32)
    pos = jnp.sum(jnp.cumsum(onehot, axis=0) * onehot, axis=1) - 1  # slot
    keep = pos < c
    pos_c = jnp.clip(pos, 0, c - 1)
    src_tok = jnp.arange(t * k) // k

    # scatter tokens into their expert slots: [E, C, d]; llama4 weights
    # the expert INPUT (weight_before_ffn) so the combine is unweighted
    contrib = jnp.where(keep[:, None], hb[src_tok], 0)
    if cfg.moe_weight_before:
        contrib = contrib * top_w.reshape(-1)[:, None].astype(contrib.dtype)
    xe = jnp.zeros((e, c, d), hb.dtype).at[flat_e, pos_c].add(contrib)

    if quant:
        from ..kernels.dequant_matmul import matmul as qmm

        outs = []
        for i in range(e):  # E is static; each is a fused-kernel matmul
            gate = qmm(xe[i], lp["gate_exps"].expert(i)).astype(jnp.float32)
            up = qmm(xe[i], lp["up_exps"].expert(i)).astype(jnp.float32)
            if lp.get("gate_exps_b") is not None:
                gate = gate + lp["gate_exps_b"][i].astype(jnp.float32)
                up = up + lp["up_exps_b"][i].astype(jnp.float32)
            act = _moe_mix(gate, up, cfg.moe_act).astype(jnp.bfloat16)
            y_i = qmm(act, lp["down_exps"].expert(i))
            if lp.get("down_exps_b") is not None:
                y_i = y_i + lp["down_exps_b"][i].astype(y_i.dtype)
            outs.append(y_i)
        y = jnp.stack(outs)  # [E, C, d]
    else:
        bf = jnp.bfloat16
        gate = jnp.einsum("ecd,efd->ecf", xe, lp["gate_exps"].astype(bf),
                          preferred_element_type=jnp.float32)
        up = jnp.einsum("ecd,efd->ecf", xe, lp["up_exps"].astype(bf),
                        preferred_element_type=jnp.float32)
        if lp.get("gate_exps_b") is not None:
            gate = gate + lp["gate_exps_b"][:, None, :].astype(jnp.float32)
            up = up + lp["up_exps_b"][:, None, :].astype(jnp.float32)
        act = _moe_mix(gate, up, cfg.moe_act).astype(bf)
        y = jnp.einsum("ecf,edf->ecd", act, lp["down_exps"].astype(bf),
                       preferred_element_type=jnp.float32)  # [E, C, d]
        if lp.get("down_exps_b") is not None:
            y = y + lp["down_exps_b"][:, None, :].astype(y.dtype)

    # combine: out[t] = Σ_j w_j · y[e_j, pos_j] (w already folded into the
    # input when moe_weight_before)
    y_pairs = jnp.where(keep[:, None], y[flat_e, pos_c], 0)  # [T*k, d]
    if cfg.moe_weight_before:
        out = y_pairs.reshape(t, k, d).sum(axis=1)
    else:
        out = (top_w.reshape(-1)[:, None] * y_pairs).reshape(t, k, d) \
            .sum(axis=1)
    return out.astype(jnp.float32).astype(hb.dtype)


def forward_train(params: dict, cfg: Qwen3Config, tokens: jax.Array) -> jax.Array:
    """Cache-free causal forward over [B, T] token batches -> [B, T, vocab]
    f32 logits. Used for training/finetuning (the capability of the
    reference's ggml-opt + examples/training, which trains any graph it
    can build) and perplexity evaluation. Requires dense (non-QTensor)
    parameters for differentiability.

    Covers the zoo's main training topologies: the qwen3/llama graph,
    Gemma-family sandwich norms + sqrt(d) embedding scale + gelu + attn
    scale/softcaps (llm_build_gemma2_iswa/gemma3), and dense-stack MoE
    with softmax/sigmoid routing (top-k gathers are differentiable wrt
    the routing probs). MLA and recurrent graphs remain inference-only.
    """
    if cfg.kv_lora_rank:
        raise NotImplementedError("forward_train: MLA is inference-only")
    b, t = tokens.shape
    h = params["token_embd"][tokens].astype(jnp.bfloat16)  # [B, T, d]
    if cfg.emb_scale != 1.0:  # gemma sqrt(d) embedding scale
        h = h * jnp.bfloat16(cfg.emb_scale)
    pos = jnp.arange(t, dtype=jnp.int32)
    causal = jnp.tril(jnp.ones((t, t), bool))

    def lin(x, w):
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    if cfg.act == "gelu":
        act = lambda z: jax.nn.gelu(z, approximate=True)  # noqa: E731
    elif cfg.act == "relu2":
        act = lambda z: jnp.square(jax.nn.relu(z))  # noqa: E731
    else:
        act = jax.nn.silu

    def ffn_dense(hn, lp):
        gate = act(lin(hn, lp["w_gate"]).astype(jnp.float32)) \
            .astype(jnp.bfloat16)
        return lin(gate * lin(hn, lp["w_up"]), lp["w_down"])

    def ffn_moe(hn, lp):
        # dense-stack routed experts (build_moe_ffn core laws; gathers
        # and take_along_axis are differentiable)
        e, k_used = cfg.n_experts, max(cfg.n_experts_used, 1)
        router = jnp.einsum("btd,ed->bte", hn.astype(jnp.float32),
                            lp["gate_inp"].astype(jnp.float32))
        probs = (jax.nn.sigmoid(router) if cfg.moe_gating == "sigmoid"
                 else jax.nn.softmax(router, axis=-1))
        sel = (probs + lp["exp_probs_b"].astype(jnp.float32)
               if lp.get("exp_probs_b") is not None else probs)
        _, top_i = jax.lax.top_k(sel, k_used)
        top_w = jnp.take_along_axis(probs, top_i, axis=-1)
        if cfg.moe_norm_w:
            top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
        top_w = top_w * cfg.moe_scale_w
        wg = lp["gate_exps"][top_i].astype(jnp.bfloat16)  # [B,T,K,F,D]
        wu = lp["up_exps"][top_i].astype(jnp.bfloat16)
        wd = lp["down_exps"][top_i].astype(jnp.bfloat16)
        hb = hn.astype(jnp.bfloat16)
        g_ = jnp.einsum("btd,btkfd->btkf", hb, wg,
                        preferred_element_type=jnp.float32)
        u_ = jnp.einsum("btd,btkfd->btkf", hb, wu,
                        preferred_element_type=jnp.float32)
        y = jnp.einsum("btkf,btkdf->btkd", act(g_).astype(jnp.bfloat16)
                       * u_.astype(jnp.bfloat16), wd,
                       preferred_element_type=jnp.float32)
        return jnp.einsum("btkd,btk->btd", y,
                          top_w.astype(jnp.float32)).astype(jnp.bfloat16)

    for lp in params["layers"]:
        h_in = h
        hn = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
        q, k, v = (lin(hn, lp[w]) for w in ("wq", "wk", "wv"))
        if lp.get("bq") is not None:  # qwen2-family attention biases
            q = q + lp["bq"].astype(q.dtype)
            k = k + lp["bk"].astype(k.dtype)
            v = v + lp["bv"].astype(v.dtype)
        q = q.reshape(b, t, cfg.n_heads, cfg.head_dim)
        k = k.reshape(b, t, cfg.n_kv_heads, cfg.head_dim)
        v = v.reshape(b, t, cfg.n_kv_heads, cfg.head_dim)
        if lp["q_norm"] is not None:
            q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
        if lp["k_norm"] is not None:
            k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
        q = apply_rope(q, pos[None, :], cfg.rope_base, neox=cfg.rope_neox)
        k = apply_rope(k, pos[None, :], cfg.rope_base, neox=cfg.rope_neox)
        g = cfg.n_heads // cfg.n_kv_heads
        qg = q.reshape(b, t, cfg.n_kv_heads, g, cfg.head_dim)
        scores = jnp.einsum("bthgd,bshd->bhgts", qg, k,
                            preferred_element_type=jnp.float32)
        scores = scores * (cfg.attn_scale if cfg.attn_scale is not None
                           else cfg.head_dim ** -0.5)
        if cfg.attn_softcap > 0.0:  # gemma2
            scores = jnp.tanh(scores / cfg.attn_softcap) * cfg.attn_softcap
        scores = jnp.where(causal[None, None, None], scores, -1e30)
        p = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
        attn = jnp.einsum("bhgts,bshd->bthgd", p, v,
                          preferred_element_type=jnp.float32)
        attn = attn.reshape(b, t, cfg.n_heads * cfg.head_dim).astype(jnp.bfloat16)
        attn = lin(attn, lp["wo"])
        if cfg.sandwich_norms:  # gemma post-attention norm
            attn = rms_norm(attn, lp["attn_post_norm"], cfg.rms_eps)
        h = h_in + attn
        h_in = h
        hn = rms_norm(h, lp["ffn_norm"], cfg.rms_eps)
        ff = (ffn_moe(hn, lp) if lp.get("gate_inp") is not None
              else ffn_dense(hn, lp))
        if cfg.sandwich_norms:  # gemma post-ffw norm
            ff = rms_norm(ff, lp["ffn_post_norm"], cfg.rms_eps)
        h = h_in + ff

    hidden = (rms_norm if cfg.norm_type == "rms" else layer_norm_nobias)(
        h, params["output_norm"], cfg.rms_eps)
    head = params["output"] if params["output"] is not None else params["token_embd"]
    logits = jax.lax.dot_general(
        hidden.astype(jnp.bfloat16), head.astype(jnp.bfloat16),
        (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    )
    if cfg.final_softcap > 0.0:  # gemma2 final logit capping
        logits = jnp.tanh(logits / cfg.final_softcap) * cfg.final_softcap
    return logits


def train_loss(params: dict, cfg: Qwen3Config, tokens: jax.Array) -> jax.Array:
    """Next-token cross-entropy over [B, T] (the finetune objective)."""
    logits = forward_train(params, cfg, tokens)  # [B, T, V]
    logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    tgt = tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)
