"""Gemma3n (E2B/E4B) — AltUp + LAuReL + per-layer embeddings, GGUF arch
"gemma3n".

Counterpart of the reference's llm_build_gemma3n_iswa
(src/llama-model.cpp:10991, hparams :1205):

- the residual stream is a STACK of n_altup copies [T, A, D]; each layer
  predicts per-altup mixtures (altup_predict: tanh-routed coefficient
  matrix over the stack), runs attention+FFN on the ACTIVE slice, then
  corrects every slice with the innovation (altup_correct, coefs + 1)
- LAuReL: low-rank residual branch l->r->post_norm added to the attn
  output, (attn + laurel)/sqrt(2)
- per-layer embeddings: a second [V, L*Da] table; token rows (x sqrt(Da))
  combine with a projection of the scaled input embedding (/sqrt(D),
  RMS-normed, /sqrt(2)); each layer gates its slice with
  gelu(inp_gate @ corrected_active) and projects back to D, added to all
  NON-FIRST altup slices
- KV sharing: the last `shared_kv_layers` layers compute only Q and
  attend over the LAST swa/full kv layer's cache
  (llama-model.cpp:19510 layer_reuse_cb)
- activation sparsity on the early layers: gate = relu(gate - (mean +
  std_mul * std)) per token before gelu (gaussian_topk)
- attention: per-head q/k RMS norms, WEIGHTLESS v RMS norm, NEOX rope
  with the gemma3 5:1 local/global pattern, kq scale 1.0
- final: slice 0 + magnitude-matched unembed projections of slices 1..,
  averaged over n_altup; logits softcapped at 30
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp

from ..kernels.attention import cache_attention
from ..kernels.norms import rms_norm
from ..kernels.rope import apply_rope
from ..runtime.kv_cache import KVCache

SPARSITY_STD_MUL = 1.6448533535003662  # icdf(0.95); llama-model.cpp:10998
FINAL_SOFTCAP = 30.0                   # f_final_logit_softcapping default


@dataclasses.dataclass(frozen=True)
class Gemma3nConfig:
    n_layers: int
    d_model: int
    n_heads: int
    n_kv_heads: int
    head_dim: int
    d_ff: int
    n_vocab: int
    n_altup: int = 4
    i_altup_act: int = 0
    d_altup: int = 256            # hidden_size_per_layer_input
    shared_kv_layers: int = 10
    n_sparsity: int = 10          # layers with activation sparsity
    swa_window: int = 512
    swa_every: int = 5            # set_swa_pattern(5)
    rope_base: float = 1_000_000.0
    rope_base_swa: float = 10_000.0
    rms_eps: float = 1e-6

    @property
    def kv_from_start(self) -> int:
        return self.n_layers - self.shared_kv_layers

    def is_swa(self, il: int) -> bool:
        return il % self.swa_every < self.swa_every - 1

    def kv_layer(self, il: int) -> int:
        """Which kv-cache layer serves layer il (layer_reuse_cb)."""
        if il < self.kv_from_start:
            return il
        return self.kv_from_start - (2 if self.is_swa(il) else 1)

    @staticmethod
    def from_gguf(kv: dict[str, Any]) -> "Gemma3nConfig":
        a = "gemma3n"
        g = lambda key, default=None: kv.get(f"{a}.{key}", default)
        d = int(g("embedding_length", 256))
        n_layers = int(g("block_count", 2))
        spars = g("activation_sparsity_scale", None)
        n_sp = (sum(1 for s in spars if s > 0) if spars is not None
                else min(10, n_layers))
        return Gemma3nConfig(
            n_layers=n_layers, d_model=d,
            n_heads=int(g("attention.head_count", 8)),
            n_kv_heads=int(g("attention.head_count_kv", 2)),
            head_dim=int(g("attention.key_length", 256)),
            d_ff=int(g("feed_forward_length", 4 * d)),
            n_vocab=int(g("vocab_size", 256)),
            n_altup=int(g("altup.num_inputs", 4)),
            i_altup_act=int(g("altup.active_idx", 0)),
            d_altup=int(g("embedding_length_per_layer_input", 256)),
            shared_kv_layers=int(g("attention.shared_kv_layers", 0)),
            n_sparsity=n_sp,
            swa_window=int(g("attention.sliding_window", 512)),
            rope_base=float(g("rope.freq_base", 1_000_000.0)),
            rms_eps=float(g("attention.layer_norm_rms_epsilon", 1e-6)),
        )


def make_cache(cfg: Gemma3nConfig, kv_size: int) -> KVCache:
    return KVCache.create(cfg.kv_from_start, kv_size, cfg.n_kv_heads,
                          cfg.head_dim)


def _magnitude(x):
    return jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))


def _modalities(lp, cfg, x):
    """compute_router_modalities: tanh(router(norm(x)/D)) -> [T, A]."""
    r = rms_norm(x, lp["altup_router_norm"], cfg.rms_eps) / cfg.d_model
    return jnp.tanh(r @ lp["altup_router"].T)


def forward(params: dict, cfg: Gemma3nConfig, tokens: jax.Array,
            cache: KVCache, seq_id: int,
            pos0: jax.Array | None = None
            ) -> tuple[jax.Array, KVCache]:
    """[T] tokens of ONE sequence -> (logits [T, V], updated cache)."""
    t = tokens.shape[0]
    if pos0 is None:
        owned = (cache.seq_mask & jnp.uint32(1 << seq_id)) != 0
        pos0 = jnp.max(jnp.where(owned, cache.pos + 1, 0))
    pos = pos0 + jnp.arange(t, dtype=jnp.int32)
    seq_vec = jnp.full((t,), seq_id, jnp.int32)
    slots = cache.find_slots(t)
    cache = cache.commit(slots, pos, seq_vec)

    d, a_n = cfg.d_model, cfg.n_altup
    x0 = params["token_embd"][tokens].astype(jnp.float32) * math.sqrt(d)

    # per-layer inputs [T, L, Da] (get_per_layer_inputs +
    # project_per_layer_inputs)
    plt = params["per_layer_token_embd"][tokens].astype(jnp.float32)
    plt = plt.reshape(t, cfg.n_layers, cfg.d_altup) * math.sqrt(cfg.d_altup)
    plp = (x0 @ params["per_layer_model_proj"].T) / math.sqrt(d)
    plp = plp.reshape(t, cfg.n_layers, cfg.d_altup)
    plp = rms_norm(plp, params["per_layer_proj_norm"], cfg.rms_eps)
    per_layer = (plt + plp) / math.sqrt(2.0)

    # stack altups: slice 0 = x0, the rest = magnitude-matched projections
    mag0 = _magnitude(x0)
    added = jnp.einsum("td,ned->tne", x0, params["altup_proj"])  # [T,A-1,D]
    added = added * mag0[:, None, :] / jnp.maximum(_magnitude(added), 1e-30)
    x = jnp.concatenate([x0[:, None, :], added], axis=1)  # [T, A, D]

    for il, lp in enumerate(params["layers"]):
        act = cfg.i_altup_act
        local = cfg.is_swa(il)
        base = cfg.rope_base_swa if local else cfg.rope_base

        # ---- altup predict
        mod = _modalities(lp, cfg, x[:, act])  # [T, A]
        coefs = (mod @ lp["altup_predict_coef"].T).reshape(t, a_n, a_n)
        # ggml all_coefs[i, j] = flat[i + A*j] -> numpy [t, j, i];
        # predictions[t, j] = sum_i x[t, i] * C[i, j] + x[t, j]
        pred = jnp.einsum("tid,tji->tjd", x, coefs) + x  # [T, A, D]

        active = pred[:, act]  # [T, D]
        hn = rms_norm(active, lp["attn_norm"], cfg.rms_eps)

        # ---- laurel (low-rank residual)
        lr = (hn @ lp["laurel_l"].T) @ lp["laurel_r"].T
        laurel = rms_norm(lr, lp["laurel_post_norm"], cfg.rms_eps) + hn

        # ---- attention (own kv or shared)
        kl = cfg.kv_layer(il)
        hd, hq, hkv = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
        q = (hn @ lp["wq"].T).reshape(t, hq, hd)
        q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
        q = apply_rope(q, pos, base, neox=True)
        if il < cfg.kv_from_start:
            k = (hn @ lp["wk"].T).reshape(t, hkv, hd)
            v = (hn @ lp["wv"].T).reshape(t, hkv, hd)
            k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
            # weightless v RMS norm (ggml_rms_norm, llama-model.cpp:11083)
            v = v * jax.lax.rsqrt(
                jnp.mean(jnp.square(v), -1, keepdims=True) + cfg.rms_eps)
            k = apply_rope(k, pos, base, neox=True)
            cache = cache.write(il, slots, k.astype(jnp.bfloat16),
                                v.astype(jnp.bfloat16))
        kc, vc = cache.read_layer(kl)
        mask = cache.attn_mask(pos, seq_vec)
        if local:  # standard sliding window: k_pos > q_pos - n_swa
            mask = mask & (cache.pos[None, :] > pos[:, None]
                           - cfg.swa_window)
        out = cache_attention(q.astype(jnp.bfloat16), kc, vc, mask,
                              scale=1.0)  # f_attention_scale = 1.0
        attn = out.reshape(t, hq * hd).astype(jnp.float32) @ lp["wo"].T
        attn = rms_norm(attn, lp["attn_post_norm"], cfg.rms_eps)
        attn = attn + active
        attn_laurel = (attn + laurel) / math.sqrt(2.0)

        # ---- FFN with activation sparsity on the early layers
        hn2 = rms_norm(attn_laurel, lp["ffn_norm"], cfg.rms_eps)
        gate = hn2 @ lp["w_gate"].T
        if il < cfg.n_sparsity:
            # gaussian_topk: relu(x - (mean + std_mul * std)), std over
            # the feature dim with 1/(n-1)
            mu = jnp.mean(gate, -1, keepdims=True)
            var = jnp.sum(jnp.square(gate - mu), -1, keepdims=True) \
                / (gate.shape[-1] - 1)
            gate = jax.nn.relu(gate - (mu + SPARSITY_STD_MUL
                                       * jnp.sqrt(var)))
        ff = (jax.nn.gelu(gate, approximate=True)
              * (hn2 @ lp["w_up"].T)) @ lp["w_down"].T
        ff = rms_norm(ff, lp["ffn_post_norm"], cfg.rms_eps)
        gated = ff + attn_laurel  # [T, D]

        # ---- altup correct
        mod_c = _modalities(lp, cfg, gated)
        ccoef = mod_c @ lp["altup_correct_coef"].T + 1.0  # [T, A]
        innovation = gated - pred[:, act]
        corrected = pred + innovation[:, None, :] * ccoef[:, :, None]

        # ---- per-layer input gating -> added to slices 1..A-1
        first = corrected[:, act] * lp["altup_correct_scale"]
        first = jax.nn.gelu(first @ lp["inp_gate"].T, approximate=True)
        first = first * per_layer[:, il]  # [T, Da]
        first = first @ lp["proj"].T
        first = rms_norm(first, lp["post_norm"], cfg.rms_eps)
        x = jnp.concatenate(
            [corrected[:, :1], corrected[:, 1:] + first[:, None, :]],
            axis=1)

    # merge altups: slice 0 + magnitude-matched unembeds of 1..A-1
    act = cfg.i_altup_act
    mag = _magnitude(x[:, act])
    un = jnp.einsum("tnd,ned->tne", x[:, 1:], params["altup_unembd_proj"])
    un = un * mag[:, None, :] / jnp.maximum(_magnitude(un), 1e-30)
    merged = (x[:, 0] + jnp.sum(un, axis=1)) / a_n

    hidden = rms_norm(merged, params["output_norm"], cfg.rms_eps)
    head = params.get("output", params["token_embd"])
    logits = hidden @ head.T.astype(hidden.dtype)
    logits = jnp.tanh(logits / FINAL_SOFTCAP) * FINAL_SOFTCAP
    return logits, cache


def load_params(reader, cfg: Gemma3nConfig) -> dict:
    """GGUF arch "gemma3n" -> forward() pytree (tensor names per the
    reference Gemma3NModel exporter; norm_shift is 0 for gemma3n)."""
    from ..kernels import load_quantized

    def get(name, required=True):
        if name not in reader.tensors:
            if required:
                raise KeyError(f"missing tensor {name}")
            return None
        ti = reader.tensors[name]
        return jnp.asarray(load_quantized(ti.data, ti.ggml_type, ti.shape,
                                          False, dtype=jnp.float32),
                           jnp.float32)

    params = {
        "token_embd": get("token_embd.weight"),
        "per_layer_token_embd": get("per_layer_token_embd.weight"),
        "per_layer_model_proj": get("per_layer_model_proj.weight"),
        "per_layer_proj_norm": get("per_layer_proj_norm.weight"),
        "altup_proj": get("altup_proj.weight"),              # [A-1, D, D]
        "altup_unembd_proj": get("altup_unembd_proj.weight"),
        "output_norm": get("output_norm.weight"),
        "layers": [],
    }
    out = get("output.weight", required=False)
    if out is not None:
        params["output"] = out
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        params["layers"].append({
            "attn_norm": get(p + "attn_norm.weight"),
            "wq": get(p + "attn_q.weight"),
            "wk": get(p + "attn_k.weight", required=i < cfg.kv_from_start),
            "wv": get(p + "attn_v.weight", required=i < cfg.kv_from_start),
            "wo": get(p + "attn_output.weight"),
            "q_norm": get(p + "attn_q_norm.weight"),
            "k_norm": get(p + "attn_k_norm.weight",
                          required=i < cfg.kv_from_start),
            "attn_post_norm": get(p + "post_attention_norm.weight"),
            "ffn_norm": get(p + "ffn_norm.weight"),
            "w_gate": get(p + "ffn_gate.weight"),
            "w_up": get(p + "ffn_up.weight"),
            "w_down": get(p + "ffn_down.weight"),
            "ffn_post_norm": get(p + "post_ffw_norm.weight"),
            "laurel_l": get(p + "laurel_l.weight"),
            "laurel_r": get(p + "laurel_r.weight"),
            "laurel_post_norm": get(p + "laurel_post_norm.weight"),
            "altup_router": get(p + "altup_router.weight"),
            "altup_router_norm": get(p + "altup_router_norm.weight"),
            "altup_predict_coef": get(p + "altup_predict_coef.weight"),
            "altup_correct_coef": get(p + "altup_correct_coef.weight"),
            "altup_correct_scale": get(p + "altup_correct_scale.weight"),
            "inp_gate": get(p + "inp_gate.weight"),
            "proj": get(p + "proj.weight"),
            "post_norm": get(p + "post_norm.weight"),
        })
    return params
