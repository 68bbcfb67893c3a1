"""TTS: LLaMA-arch streaming speech-token decoder (MiniCPM-o 4.5 voice).

Contract from the reference (/root/reference/tools/omni/omni.cpp): a 20-layer
d=768 LLaMA decoder (reuses the generic decoder forward) plus side weights
loaded raw from the TTS GGUF (omni.cpp:1260-1836):
- emb_text [152064, 768]   — indexed by **LLM** token ids
- emb_code [6562, 768]     — audio-code embeddings (next-step inputs)
- head_code [6562, 768]    — weight-normed output head over audio codes
- projector_semantic MLP 4096→768→768 (ReLU) — maps LLM hidden states
- projector_spk (same shape) — speaker embedding projector

Per-chunk conditioning (omni.cpp:5812-5847): for each chunk of 10 LLM text
tokens, condition[i] = emb_text(token_i) + projector_semantic(hidden_i);
append emb_text(text_eos) iff end-of-turn; append emb_code(audio_bos).
Audio ids are relative 0..6561 with EOS = 6561 (= absolute 151687+6561,
omni.cpp:6172-6180); generation feeds emb_code[id] embeddings back.

Sampling (omni.cpp:2691-3010 sample_tts_token, aligned to the Python
TTSSamplingParams): temperature 0.8 → repetition penalty 1.05 over window
16 (skipped on the first token of a chunk in duplex / of the whole
generation in simplex) → optional forced no-EOS → nucleus top_p 0.85 +
top_k 25 with min_tokens_to_keep 3 → multinomial. RAS (repetition-aware
sampling, omni.cpp:2330) is also provided.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core.gguf import GGUFReader
from ..core import quants as nq
from . import qwen3

NUM_AUDIO_TOKENS = 6562
AUDIO_EOS_REL = NUM_AUDIO_TOKENS - 1  # 6561
AUDIO_BOS_ABS = 151687  # omni.cpp:2696
TEXT_EOS_ID = 151692  # omni.cpp A.2
SPK_EMB_ID = 21143


@dataclasses.dataclass(frozen=True)
class TTSSamplingParams:
    """modeling_minicpmo.py TTSSamplingParams mirror (omni.cpp:3617-3625)."""

    temperature: float = 0.8
    top_p: float = 0.85
    top_k: int = 25
    repetition_penalty: float = 1.05
    win_size: int = 16
    tau_r: float = 0.1
    min_tokens_to_keep: int = 3


def config_from_gguf(kv: dict[str, Any]) -> qwen3.Qwen3Config:
    arch = kv.get("general.architecture", "minicpmtts")
    g = lambda key, default: kv.get(f"{arch}.{key}", default)
    n_heads = int(g("attention.head_count", 12))
    d = int(g("embedding_length", 768))
    return qwen3.Qwen3Config(
        n_layers=int(g("block_count", 20)),
        d_model=d,
        n_heads=n_heads,
        n_kv_heads=int(g("attention.head_count_kv", n_heads)),
        head_dim=d // n_heads,
        d_ff=int(g("feed_forward_length", 3072)),
        n_vocab=NUM_AUDIO_TOKENS,  # logits come from head_code, not an LM head
        rope_base=float(g("rope.freq_base", 10000.0)),
        rms_eps=float(g("attention.layer_norm_rms_epsilon", 1e-6)),
        rope_neox=False,  # LLaMA-arch decoder (NORM rotary)
    )


def _dense(reader: GGUFReader, *names: str, required: bool = True):
    for name in names:
        if name in reader.tensors:
            ti = reader.tensors[name]
            return jnp.asarray(nq.dequantize(ti.data, ti.ggml_type, ti.shape))
    if required:
        raise KeyError(f"TTS tensor missing: {names}")
    return None


def load_params(reader: GGUFReader) -> tuple[dict, dict]:
    """Returns (decoder_params in qwen3 layout, extras)."""
    # decoder: either llama.cpp naming (blk.N.*) or converter naming
    # (tts.layers.N.self_attn.*, tools/omni/convert/convert_tts.py)
    if "blk.0.attn_norm.weight" in reader.tensors:
        params = qwen3.load_params(reader, keep_quantized=True)
    else:
        params = {"layers": [], "token_embd": None, "output": None}
        params["output_norm"] = _dense(reader, "tts.norm.weight", "norm.weight")
        i = 0
        while (f"tts.layers.{i}.input_layernorm.weight" in reader.tensors
               or f"layers.{i}.input_layernorm.weight" in reader.tensors):
            p = (f"tts.layers.{i}.", f"layers.{i}.")

            def g(suffix, required=True):
                return _dense(reader, p[0] + suffix, p[1] + suffix,
                              required=required)

            params["layers"].append({
                "attn_norm": g("input_layernorm.weight"),
                "wq": g("self_attn.q_proj.weight"),
                "wk": g("self_attn.k_proj.weight"),
                "wv": g("self_attn.v_proj.weight"),
                "wo": g("self_attn.o_proj.weight"),
                "q_norm": None, "k_norm": None,
                "ffn_norm": g("post_attention_layernorm.weight"),
                "w_gate": g("mlp.gate_proj.weight"),
                "w_up": g("mlp.up_proj.weight"),
                "w_down": g("mlp.down_proj.weight"),
            })
            i += 1

    extras = {
        "emb_text": _dense(reader, "emb_text.weight", "tts.emb_text.weight"),
        "emb_code": _dense(reader, "emb_code.0.weight", "tts.emb_code.0.weight"),
        "head_code": _dense(reader, "head_code.0.weight", "tts.head_code.0.weight"),
        "proj_sem_w1": _dense(reader, "projector_semantic.linear1.weight",
                              "tts.projector_semantic.linear1.weight"),
        "proj_sem_b1": _dense(reader, "projector_semantic.linear1.bias",
                              "tts.projector_semantic.linear1.bias"),
        "proj_sem_w2": _dense(reader, "projector_semantic.linear2.weight",
                              "tts.projector_semantic.linear2.weight"),
        "proj_sem_b2": _dense(reader, "projector_semantic.linear2.bias",
                              "tts.projector_semantic.linear2.bias"),
        "proj_spk_w1": _dense(reader, "projector_spk.linear1.weight",
                              "tts.projector_spk.linear1.weight", required=False),
        "proj_spk_b1": _dense(reader, "projector_spk.linear1.bias",
                              "tts.projector_spk.linear1.bias", required=False),
        "proj_spk_w2": _dense(reader, "projector_spk.linear2.weight",
                              "tts.projector_spk.linear2.weight", required=False),
        "proj_spk_b2": _dense(reader, "projector_spk.linear2.bias",
                              "tts.projector_spk.linear2.bias", required=False),
    }
    return params, extras


# ---------------------------------------------------------------------------
# conditioning + heads
# ---------------------------------------------------------------------------

def projector_semantic(extras: dict, hidden: jax.Array) -> jax.Array:
    """LLM hidden [T, 4096] -> TTS embedding space [T, 768] (ReLU MLP,
    omni.cpp projector_build_graph:1187)."""
    h = jnp.einsum("td,nd->tn", hidden, extras["proj_sem_w1"],
                   preferred_element_type=jnp.float32) + extras["proj_sem_b1"]
    h = jax.nn.relu(h)
    return jnp.einsum("td,nd->tn", h, extras["proj_sem_w2"],
                      preferred_element_type=jnp.float32) + extras["proj_sem_b2"]


def projector_spk(extras: dict, hidden: jax.Array) -> jax.Array:
    """Speaker projector (same ReLU-MLP shape as projector_semantic;
    model.txt:78-125 projector_spk): LLM hidden [T, 4096] -> [T, 768]."""
    h = jnp.einsum("td,nd->tn", hidden, extras["proj_spk_w1"],
                   preferred_element_type=jnp.float32) + extras["proj_spk_b1"]
    h = jax.nn.relu(h)
    return jnp.einsum("td,nd->tn", h, extras["proj_spk_w2"],
                      preferred_element_type=jnp.float32) + extras["proj_spk_b2"]


def speaker_embed(extras: dict, ref_hidden=None) -> jax.Array:
    """The speaker embedding prepended at TTS chunk 0 (voice cloning;
    reference omni.cpp:5041 'idx==0: clear KV and concatenate spk_emb',
    aligned to the Python TTSStreamingGenerator):
    - with a reference-voice sample: projector_spk over the mean-pooled LLM
      hidden states of the reference audio span;
    - otherwise the default voice: emb_text[spk_emb id 21143]
      (omni.cpp:6176). Returns [768]."""
    if ref_hidden is not None and extras.get("proj_spk_w1") is not None:
        pooled = jnp.mean(jnp.asarray(ref_hidden, jnp.float32), axis=0,
                          keepdims=True)
        return projector_spk(extras, pooled)[0]
    return extras["emb_text"][SPK_EMB_ID]


def build_condition(
    extras: dict,
    llm_tokens: jax.Array,  # [T] LLM token ids of the text chunk
    llm_hidden: jax.Array,  # [T, 4096] hidden taps for those tokens
    end_of_turn: bool = False,
    spk_embed: jax.Array | None = None,  # [768]; prepended (chunk 0 only)
) -> jax.Array:
    """Per-chunk TTS condition (omni.cpp:5812-5847): [spk_embed at chunk 0]
    + emb_text + proj(hidden), + text_eos embed iff end of turn, + audio_bos
    embed."""
    cond = extras["emb_text"][llm_tokens] + projector_semantic(extras, llm_hidden)
    parts = [cond] if spk_embed is None else [spk_embed[None], cond]
    if end_of_turn:
        parts.append(extras["emb_text"][jnp.array([TEXT_EOS_ID])])
    parts.append(extras["emb_code"][jnp.array([0])])  # audio_bos = code 0
    return jnp.concatenate(parts, axis=0)


def audio_logits(extras: dict, hidden: jax.Array) -> jax.Array:
    """TTS hidden [768] (or [T,768]) -> logits over 6562 audio codes.

    Rank-1 contractions lower terribly on TPU (no lane tiling), so the
    GEMV always runs as a [T,768]x[768,6562] rank-2 bf16 dot."""
    h2 = hidden[None] if hidden.ndim == 1 else hidden
    out = jax.lax.dot_general(
        h2.astype(jnp.bfloat16), extras["head_code"].astype(jnp.bfloat16),
        (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    return out[0] if hidden.ndim == 1 else out


def code_embedding(extras: dict, rel_id: jax.Array) -> jax.Array:
    return extras["emb_code"][rel_id]


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def apply_repetition_penalty(logits: jax.Array, prev_rel: jax.Array,
                             penalty: float, window: int) -> jax.Array:
    """CustomRepetitionPenaltyLogitsProcessorRepeat semantics
    (omni.cpp:2368): alpha = penalty^freq over the trailing window;
    positive logits divided, negative multiplied. prev_rel is a fixed-size
    ring of relative ids, -1 padded; only the last `window` entries count."""
    w = prev_rel[-window:] if prev_rel.shape[0] > window else prev_rel
    n = logits.shape[-1]
    idx = jnp.where(w >= 0, w, n)  # -1 padding must not wrap to the last id
    freq = jnp.zeros_like(logits).at[idx].add(1.0, mode="drop")
    alpha = jnp.power(penalty, freq)
    return jnp.where(logits < 0, logits * alpha, logits / alpha)


def nucleus_sample(logits: jax.Array, key: jax.Array, top_p: float,
                   top_k: int, min_keep: int) -> jax.Array:
    """TopK + TopP warpers with min_tokens_to_keep, then multinomial —
    matching nucleus_sampling_with_min_keep_tts (omni.cpp:2410+).

    With top_k set, top-p runs on the k sorted candidates only — a full
    jnp.sort over the vocab costs tens of ms on TPU inside a scan; top_k
    gives the sorted prefix for free."""
    n = logits.shape[-1]
    if 0 < top_k < n:
        k = max(top_k, min_keep)
        topv, topi = jax.lax.top_k(logits, k)  # sorted desc
        if top_p < 1.0:
            probs = jax.nn.softmax(topv)  # renormalized over the k (matches
            # the reference: TopK warper runs before TopP)
            cum = jnp.cumsum(probs)
            keep_rank = jnp.maximum(jnp.sum(cum - probs < top_p), min_keep)
            topv = jnp.where(jnp.arange(k) < keep_rank, topv, -jnp.inf)
        choice = jax.random.categorical(key, topv)
        return topi[choice].astype(jnp.int32)
    v = logits
    if top_p < 1.0:
        sorted_v = jnp.sort(v)[::-1]
        probs = jax.nn.softmax(sorted_v)
        cum = jnp.cumsum(probs)
        keep_rank = jnp.maximum(jnp.sum(cum - probs < top_p), min_keep)
        thresh = sorted_v[keep_rank - 1]
        v = jnp.where(v < thresh, -jnp.inf, v)
    return jax.random.categorical(key, v).astype(jnp.int32)


def sample_audio_token(
    logits: jax.Array,  # [6562] f32 (pre-temperature)
    key: jax.Array,
    prev_rel: jax.Array,  # ring of previous relative ids (-1 padded)
    sp: TTSSamplingParams = TTSSamplingParams(),
    skip_processors: bool | jax.Array = False,
    force_no_eos: bool | jax.Array = False,
    argmax: bool = False,
) -> jax.Array:
    """One audio code (relative id), sample_tts_token semantics."""
    if argmax:
        return jnp.argmax(logits).astype(jnp.int32)
    v = logits / sp.temperature
    penalized = apply_repetition_penalty(v, prev_rel, sp.repetition_penalty,
                                         sp.win_size)
    v = jnp.where(jnp.asarray(skip_processors), v, penalized)
    v = jnp.where(
        jnp.asarray(force_no_eos)
        & (jnp.arange(v.shape[-1]) == AUDIO_EOS_REL),
        -jnp.inf, v)
    return nucleus_sample(v, key, sp.top_p, sp.top_k, sp.min_tokens_to_keep)


def ras_sample(
    logits: jax.Array, key: jax.Array, prev_rel: jax.Array,
    sp: TTSSamplingParams = TTSSamplingParams(),
) -> jax.Array:
    """Repetition-aware sampling (omni.cpp:2330): nucleus draw; if the
    candidate repeats >= win_size*tau_r times in the trailing 10-token
    window, fall back to a plain multinomial draw."""
    k1, k2 = jax.random.split(key)
    cand = nucleus_sample(logits, k1, sp.top_p, sp.top_k, 1)
    recent = prev_rel[-10:]
    rep = jnp.sum(recent == cand)
    fallback = jax.random.categorical(k2, logits).astype(jnp.int32)
    return jnp.where(rep >= int(sp.win_size * sp.tau_r), fallback, cand)


# ---------------------------------------------------------------------------
# fused on-device audio-token generation
# ---------------------------------------------------------------------------

import functools


@functools.partial(jax.jit,
                   static_argnames=("cfg", "n_steps", "sp", "first_chunk",
                                    "force_no_eos"),
                   donate_argnames=("cache",))
def tts_decode_scan(
    params: dict,
    cfg,
    extras: dict,
    cache,
    first_hidden: jax.Array,  # [768] hidden after the condition prefill
    start_pos: jax.Array,  # [] int32
    key: jax.Array,
    n_steps: int,
    sp: TTSSamplingParams = TTSSamplingParams(),
    first_chunk: bool = False,
    force_no_eos: bool = False,
    prev0: jax.Array | None = None,  # [win_size] repetition ring carry-in
    done_in: jax.Array | None = None,  # [] bool: chain from the prior scan
):
    """Generate up to n_steps audio codes fully on device — hot loop #2 of
    the reference (~8.5 ms/audio-token on a 4090, tts_thread_func) as ONE
    lax.scan: head_code logits, RAS/nucleus sampling with the repetition
    ring, embed, TTS decoder step. Early audio_eos freezes the carry (codes
    after eos come back as -1).

    Continuation: pass the returned (hidden, prev, done) back in (with the
    updated start_pos) to generate the next n_steps codes in a later
    dispatch — the pipeline streams 25-code windows to Token2Wav between
    scans instead of sitting on one long scan (T2W cadence, §A.3). The
    `done` chain also makes SPECULATIVE issue safe: a successor scan
    dispatched before the predecessor's codes are fetched emits nothing if
    the predecessor hit audio_eos.

    Returns (codes [n_steps] rel ids or -1, n_valid, cache, key,
    last_hidden [768], prev [win_size], pos_out [], done [])."""
    from ..models import qwen3

    if prev0 is None:
        prev0 = jnp.full((sp.win_size,), -1, jnp.int32)
    if done_in is None:
        done_in = jnp.bool_(False)
    # fragmentation-safe slot list: ONE find_slots(n_steps), indexed per step
    all_slots = cache.find_slots(n_steps)
    seq0 = jnp.zeros((1,), jnp.int32)
    emb_code_bf = extras["emb_code"].astype(jnp.bfloat16)

    def step(carry, i):
        cache, h, pos, prev, done, key = carry  # h: [1, 768] bf16
        logits = audio_logits(extras, h)[0]  # rank-2 dot inside
        key, sub = jax.random.split(key)
        rel = sample_audio_token(
            logits, sub, prev, sp,
            skip_processors=jnp.logical_and(i == 0, first_chunk),
            force_no_eos=force_no_eos)
        is_eos = rel == AUDIO_EOS_REL
        done_next = done | is_eos
        emit = jnp.where(done_next, -1, rel)

        emb = emb_code_bf[jnp.maximum(rel, 0)][None]
        logits_u, hidden, cache = qwen3.forward(
            params, cfg, emb, pos[None], seq0, cache, all_slots[i][None],
            write_mask=(~done_next)[None])
        h_next = jnp.where(done_next, h, hidden.astype(h.dtype))
        prev_next = jnp.where(
            done_next, prev,
            jnp.concatenate([prev[1:], rel[None]]))
        pos_next = pos + jnp.where(done_next, 0, 1).astype(pos.dtype)
        return (cache, h_next, pos_next, prev_next, done_next, key), emit

    (cache, h_last, pos_out, prev, done, key), codes = jax.lax.scan(
        step,
        (cache, first_hidden[None].astype(jnp.bfloat16), start_pos, prev0,
         done_in, key),
        jnp.arange(n_steps, dtype=jnp.int32))
    n_valid = jnp.sum(codes >= 0)
    return codes, n_valid, cache, key, h_last[0], prev, pos_out, done
