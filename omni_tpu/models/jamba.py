"""Jamba — hybrid attention + Mamba + MoE arch, GGUF arch "jamba".

Counterpart of the reference's llm_build_jamba (src/llama-model.cpp:12003)
over llama_memory_hybrid (src/llama-memory-hybrid.cpp): the per-layer
attention.head_count_kv GGUF key is a VECTOR — 0 marks a Mamba layer
(selective-SSM mixer with Jamba's dt/B/C RMS norms), non-zero an attention
layer (GQA, NO RoPE). FFN is dense SwiGLU or softmax-top-k MoE per layer.

Memory is the repo's HybridCache: attention layers index the unified
KVCache (by attention-layer ordinal), Mamba layers the RecurrentCache (by
mamba-layer ordinal) — sequence ops (rm/cp/clear) fan out to both, exactly
the reference's hybrid-memory contract. Like the other recurrent archs,
forward() is per-sequence (the reference splits ubatches per sequence for
recurrent memories too — llama-batch.cpp equal-split path).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..kernels.attention import cache_attention
from ..kernels.norms import rms_norm
from ..runtime.kv_cache import KVCache
from ..runtime.recurrent import HybridCache, RecurrentCache
from . import ssm as ssm_mod


@dataclasses.dataclass(frozen=True)
class JambaConfig:
    n_layers: int
    d_model: int
    n_heads: int
    kv_heads: tuple[int, ...]  # per layer; 0 = mamba layer
    head_dim: int
    d_ff: int
    d_inner: int
    d_conv: int = 4
    d_state: int = 16
    dt_rank: int = 8
    n_experts: int = 0
    n_experts_used: int = 0
    rms_eps: float = 1e-6
    n_vocab: int = 256

    @property
    def ssm_cfg(self) -> ssm_mod.SSMConfig:
        return ssm_mod.SSMConfig(
            n_layers=self.n_layers, d_model=self.d_model,
            d_inner=self.d_inner, d_conv=self.d_conv, d_state=self.d_state,
            dt_rank=self.dt_rank, n_vocab=self.n_vocab,
            rms_eps=self.rms_eps)

    @staticmethod
    def from_gguf(kv: dict[str, Any]) -> "JambaConfig":
        g = lambda key, default: kv.get(f"jamba.{key}", default)
        d = int(g("embedding_length", 256))
        n_heads = int(g("attention.head_count", 8))
        kvh = g("attention.head_count_kv", 0)
        n_layers = int(g("block_count", 2))
        if not hasattr(kvh, "__len__"):  # scalar: uniform attention
            kvh = [int(kvh)] * n_layers
        return JambaConfig(
            n_layers=n_layers,
            d_model=d,
            n_heads=n_heads,
            kv_heads=tuple(int(x) for x in kvh),
            head_dim=int(g("attention.key_length", d // n_heads)),
            d_ff=int(g("feed_forward_length", 4 * d)),
            d_inner=int(g("ssm.inner_size", 2 * d)),
            d_conv=int(g("ssm.conv_kernel", 4)),
            d_state=int(g("ssm.state_size", 16)),
            dt_rank=int(g("ssm.time_step_rank", max(d // 16, 1))),
            n_experts=int(g("expert_count", 0)),
            n_experts_used=int(g("expert_used_count", 0)),
            rms_eps=float(g("attention.layer_norm_rms_epsilon", 1e-6)),
            n_vocab=int(g("vocab_size", 256)),
        )


def make_cache(cfg: JambaConfig, kv_size: int,
               n_seqs: int = 4) -> HybridCache:
    """Unified KV for the attention layers + recurrent slots for the
    Mamba layers, bundled (llama_memory_hybrid)."""
    n_attn = sum(1 for h in cfg.kv_heads if h > 0)
    n_mamba = cfg.n_layers - n_attn
    kvh = max((h for h in cfg.kv_heads if h > 0), default=1)
    return HybridCache(
        kv=KVCache.create(max(n_attn, 1), kv_size, kvh, cfg.head_dim),
        rec=RecurrentCache.create(max(n_mamba, 1), n_seqs, cfg.d_conv,
                                  cfg.d_inner, cfg.d_state),
    )


def _attn_layer(lp: dict, cfg: JambaConfig, hn: jax.Array, kvc: KVCache,
                attn_li: int, hkv: int, slots, pos,
                seq_vec) -> tuple[jax.Array, KVCache]:
    t = hn.shape[0]
    hd, hq = cfg.head_dim, cfg.n_heads
    q = (hn @ lp["wq"].T).reshape(t, hq, hd)
    k = (hn @ lp["wk"].T).reshape(t, hkv, hd)
    v = (hn @ lp["wv"].T).reshape(t, hkv, hd)
    # No RoPE on Jamba attention (llm_build_jamba "No RoPE :)")
    kvc = kvc.write(attn_li, slots, k, v)
    kc, vc = kvc.read_layer(attn_li)
    mask = kvc.attn_mask(pos, seq_vec)
    out = cache_attention(q.astype(jnp.bfloat16), kc, vc, mask)
    return out.reshape(t, hq * hd) @ lp["wo"].T, kvc


def _ffn(lp: dict, cfg: JambaConfig, hn: jax.Array) -> jax.Array:
    if lp.get("gate_inp") is not None:
        # softmax-top-k MoE (build_moe_ffn SOFTMAX gating, no norm of
        # top-k weights — Jamba passes norm_w=false)
        logits = hn @ lp["gate_inp"].T  # [T, E]
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        w, idx = jax.lax.top_k(probs, cfg.n_experts_used)  # [T, k]
        ge = lp["gate_exps"][idx]  # [T, k, F, D]
        ue = lp["up_exps"][idx]
        de = lp["down_exps"][idx]  # [T, k, D, F]
        g = jnp.einsum("td,tkfd->tkf", hn, ge)
        u = jnp.einsum("td,tkfd->tkf", hn, ue)
        h = jax.nn.silu(g) * u
        out = jnp.einsum("tkf,tkdf->tkd", h, de)
        return jnp.einsum("tkd,tk->td", out, w.astype(out.dtype))
    g = hn @ lp["w_gate"].T
    u = hn @ lp["w_up"].T
    return (jax.nn.silu(g) * u) @ lp["w_down"].T


def forward(params: dict, cfg: JambaConfig, tokens: jax.Array,
            cache: HybridCache, seq_id: int,
            pos0: jax.Array | None = None
            ) -> tuple[jax.Array, HybridCache]:
    """[T] tokens of ONE sequence -> (logits [T, V], updated HybridCache).
    T=1 decode / T>1 chunked prefill, equal by construction."""
    t = tokens.shape[0]
    if pos0 is None:
        pos0 = cache.rec.pos[seq_id]
        pos0 = jnp.where(pos0 < 0, 0, pos0)
    pos = pos0 + jnp.arange(t, dtype=jnp.int32)
    seq_vec = jnp.full((t,), seq_id, jnp.int32)

    kvc = cache.kv
    rec = cache.rec
    slots = kvc.find_slots(t)
    kvc = kvc.commit(slots, pos, seq_vec)

    h = params["token_embd"][tokens].astype(jnp.float32)
    attn_li = mamba_li = 0
    new_states = []
    for li, lp in enumerate(params["layers"]):
        hn = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
        if cfg.kv_heads[li] == 0:  # static layer type (cfg, not params)
            conv0, ssm0 = rec.read(mamba_li, seq_id)

            def step(carry, h_t, lp=lp):
                conv_s, ssm_s = carry
                y, conv_s, ssm_s = ssm_mod._ssm_step(
                    lp, cfg.ssm_cfg, h_t, conv_s, ssm_s)
                return (conv_s, ssm_s), y

            (conv1, ssm1), mix = jax.lax.scan(step, (conv0, ssm0), hn)
            new_states.append((mamba_li, conv1, ssm1))
            mamba_li += 1
        else:
            mix, kvc = _attn_layer(lp, cfg, hn.astype(jnp.bfloat16), kvc,
                                   attn_li, cfg.kv_heads[li], slots, pos,
                                   seq_vec)
            mix = mix.astype(jnp.float32)
            attn_li += 1
        h = h + mix
        hn2 = rms_norm(h, lp["ffn_norm"], cfg.rms_eps)
        h = h + _ffn(lp, cfg, hn2.astype(jnp.float32))

    for mi, conv1, ssm1 in new_states:
        rec = rec.write(mi, seq_id, conv1, ssm1)
    rec = rec.advance(seq_id, t)

    hidden = rms_norm(h, params["output_norm"], cfg.rms_eps)
    head = params.get("output", params["token_embd"])
    logits = hidden @ head.T.astype(hidden.dtype)
    return logits, HybridCache(kv=kvc, rec=rec)


def load_params(reader, cfg: JambaConfig) -> dict:
    """GGUF arch "jamba" -> forward() pytree (tensor names from the
    reference exporter, convert_hf_to_gguf.py JambaModel)."""
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
        "output_norm": get("output_norm.weight"),
        "layers": [],
    }
    out = get("output.weight", required=False)
    if out is not None:
        params["output"] = out
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        lp = {"attn_norm": get(p + "attn_norm.weight"),
              "ffn_norm": get(p + "ffn_norm.weight")}
        if cfg.kv_heads[i] == 0:
            lp.update({
                "ssm_in": get(p + "ssm_in.weight"),
                "ssm_conv1d": get(p + "ssm_conv1d.weight"),
                "ssm_conv1d_b": get(p + "ssm_conv1d.bias"),
                "ssm_x": get(p + "ssm_x.weight"),
                "ssm_dt": get(p + "ssm_dt.weight"),
                "ssm_dt_b": get(p + "ssm_dt.bias"),
                "ssm_a": get(p + "ssm_a"),
                "ssm_d": get(p + "ssm_d"),
                "ssm_out": get(p + "ssm_out.weight"),
                "dt_norm": get(p + "ssm_dt_norm.weight"),
                "b_norm": get(p + "ssm_b_norm.weight"),
                "c_norm": get(p + "ssm_c_norm.weight"),
            })
        else:
            lp.update({
                "wq": get(p + "attn_q.weight"),
                "wk": get(p + "attn_k.weight"),
                "wv": get(p + "attn_v.weight"),
                "wo": get(p + "attn_output.weight"),
            })
        if f"{p}ffn_gate_inp.weight" in reader.tensors:
            lp.update({
                "gate_inp": get(p + "ffn_gate_inp.weight"),
                "gate_exps": get(p + "ffn_gate_exps.weight"),
                "up_exps": get(p + "ffn_up_exps.weight"),
                "down_exps": get(p + "ffn_down_exps.weight"),
            })
        else:
            lp.update({
                "w_gate": get(p + "ffn_gate.weight"),
                "w_up": get(p + "ffn_up.weight"),
                "w_down": get(p + "ffn_down.weight"),
            })
        params["layers"].append(lp)
    return params
