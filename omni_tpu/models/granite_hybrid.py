"""Granite-Hybrid — Mamba2 + attention hybrid with Granite scales and
(optionally) MoE + a shared expert. GGUF arch "granitehybrid".

Counterpart of the reference's llm_build_granite_hybrid
(src/llama-model.cpp:16226): per-layer dispatch between a Mamba2 (SSD)
mixer and NoPE GQA attention scaled by f_attention_scale; every sublayer
output is scaled by f_residual_scale before the residual add; embeddings
scale by f_embedding_scale and logits divide by f_logit_scale (the
granite mup family). The FFN is either dense SwiGLU or a softmax
renormalized top-k MoE plus a GraniteMoeShared always-on expert (fused
input_linear = gate|up).

Memory is the HybridCache: attention layers in the unified KVCache,
Mamba2 states in the RecurrentCache (conv covers x|B|C channels).
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
class GraniteHybridConfig:
    n_layers: int
    d_model: int
    n_heads: int
    kv_heads: tuple[int, ...]  # per layer; 0 = mamba2 layer
    head_dim: int
    d_ff: int
    d_inner: int
    d_conv: int = 4
    d_state: int = 8
    n_ssm_head: int = 4
    n_group: int = 1
    n_experts: int = 0
    n_experts_used: int = 0
    emb_scale: float = 1.0
    residual_scale: float = 1.0
    logit_scale: float = 1.0
    attn_scale: float | None = None
    rms_eps: float = 1e-5
    n_vocab: int = 256

    @property
    def ssm_cfg(self) -> ssm_mod.SSMConfig:
        return ssm_mod.SSMConfig(
            n_layers=self.n_layers, d_model=self.d_model,
            d_inner=self.d_inner, d_conv=self.d_conv,
            d_state=self.d_state, dt_rank=self.n_ssm_head,
            n_vocab=self.n_vocab, rms_eps=self.rms_eps,
            variant="mamba2", n_group=self.n_group)

    @staticmethod
    def from_gguf(kv: dict[str, Any]) -> "GraniteHybridConfig":
        g = lambda key, default=None: kv.get(f"granitehybrid.{key}",
                                             default)
        d = int(g("embedding_length", 256))
        n_heads = int(g("attention.head_count", 8))
        n_layers = int(g("block_count", 2))
        kvh = g("attention.head_count_kv", 0)
        if not hasattr(kvh, "__len__"):
            kvh = [int(kvh)] * n_layers
        return GraniteHybridConfig(
            n_layers=n_layers, d_model=d, n_heads=n_heads,
            kv_heads=tuple(int(x) for x in kvh),
            head_dim=int(g("attention.key_length", d // n_heads)),
            d_ff=int(g("feed_forward_length", 4 * d)),
            d_inner=int(g("ssm.inner_size", 2 * d)),
            d_conv=int(g("ssm.conv_kernel", 4)),
            d_state=int(g("ssm.state_size", 8)),
            n_ssm_head=int(g("ssm.time_step_rank", 4)),
            n_group=int(g("ssm.group_count", 1)),
            n_experts=int(g("expert_count", 0)),
            n_experts_used=int(g("expert_used_count", 0)),
            emb_scale=float(g("embedding_scale", 1.0)),
            residual_scale=float(g("residual_scale", 1.0)),
            logit_scale=float(g("logit_scale", 1.0)),
            attn_scale=(float(g("attention.scale"))
                        if g("attention.scale") is not None else None),
            rms_eps=float(g("attention.layer_norm_rms_epsilon", 1e-5)),
            n_vocab=int(g("vocab_size", 256)),
        )


def make_cache(cfg: GraniteHybridConfig, kv_size: int,
               n_seqs: int = 4) -> HybridCache:
    n_attn = sum(1 for h in cfg.kv_heads if h > 0)
    n_mamba = cfg.n_layers - n_attn
    kvh = max((h for h in cfg.kv_heads if h > 0), default=1)
    return HybridCache(
        kv=KVCache.create(max(n_attn, 1), kv_size, kvh, cfg.head_dim),
        rec=RecurrentCache.create(
            max(n_mamba, 1), n_seqs, cfg.d_conv, cfg.d_inner, cfg.d_state,
            conv_channels=cfg.ssm_cfg.conv_channels),
    )


def _ffn(lp: dict, cfg: GraniteHybridConfig, hn: jax.Array) -> jax.Array:
    out = jnp.zeros_like(hn)
    if lp.get("gate_inp") is not None:
        # softmax renormalized top-k (llm_build_granite's build_moe_ffn:
        # norm_w=true)
        logits = hn @ lp["gate_inp"].T
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        w, idx = jax.lax.top_k(probs, cfg.n_experts_used)
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        ge = lp["gate_exps"][idx]
        ue = lp["up_exps"][idx]
        de = lp["down_exps"][idx]
        g = jnp.einsum("td,tkfd->tkf", hn, ge)
        u = jnp.einsum("td,tkfd->tkf", hn, ue)
        h = jax.nn.silu(g) * u
        moe = jnp.einsum("tkf,tkdf->tkd", h, de)
        out = out + jnp.einsum("tkd,tk->td", moe, w.astype(moe.dtype))
    elif lp.get("w_gate") is not None:
        g = hn @ lp["w_gate"].T
        u = hn @ lp["w_up"].T
        out = out + (jax.nn.silu(g) * u) @ lp["w_down"].T
    if lp.get("gate_shexp") is not None:  # GraniteMoeShared expert
        g = hn @ lp["gate_shexp"].T
        u = hn @ lp["up_shexp"].T
        out = out + (jax.nn.silu(g) * u) @ lp["down_shexp"].T
    return out


def forward(params: dict, cfg: GraniteHybridConfig, tokens: jax.Array,
            cache: HybridCache, seq_id: int,
            pos0: jax.Array | None = None
            ) -> tuple[jax.Array, HybridCache]:
    """[T] tokens of ONE sequence -> (logits [T, V], updated cache)."""
    t = tokens.shape[0]
    if pos0 is None:
        pos0 = cache.rec.pos[seq_id]
        pos0 = jnp.where(pos0 < 0, 0, pos0)
    pos = pos0 + jnp.arange(t, dtype=jnp.int32)
    seq_vec = jnp.full((t,), seq_id, jnp.int32)

    kvc, rec = cache.kv, cache.rec
    slots = kvc.find_slots(t)
    kvc = kvc.commit(slots, pos, seq_vec)

    h = params["token_embd"][tokens].astype(jnp.float32) * cfg.emb_scale
    attn_li = mamba_li = 0
    new_states = []
    for li, lp in enumerate(params["layers"]):
        hn = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
        if cfg.kv_heads[li] == 0:  # mamba2 mixer
            conv0, ssm0 = rec.read(mamba_li, seq_id)

            def step(carry, h_t, lp=lp):
                conv_s, ssm_s = carry
                y, conv_s, ssm_s = ssm_mod._ssm2_step(
                    lp, cfg.ssm_cfg, h_t, conv_s, ssm_s)
                return (conv_s, ssm_s), y

            (conv1, ssm1), mix = jax.lax.scan(step, (conv0, ssm0), hn)
            new_states.append((mamba_li, conv1, ssm1))
            mamba_li += 1
        else:  # NoPE GQA attention at f_attention_scale
            hkv = cfg.kv_heads[li]
            hd, hq = cfg.head_dim, cfg.n_heads
            q = (hn @ lp["wq"].T).reshape(t, hq, hd)
            k = (hn @ lp["wk"].T).reshape(t, hkv, hd)
            v = (hn @ lp["wv"].T).reshape(t, hkv, hd)
            kvc = kvc.write(attn_li, slots, k.astype(jnp.bfloat16),
                            v.astype(jnp.bfloat16))
            kc, vc = kvc.read_layer(attn_li)
            mask = kvc.attn_mask(pos, seq_vec)
            out = cache_attention(q.astype(jnp.bfloat16), kc, vc, mask,
                                  scale=cfg.attn_scale)
            mix = out.reshape(t, hq * hd).astype(jnp.float32) @ lp["wo"].T
            attn_li += 1
        h = h + mix * cfg.residual_scale
        hn2 = rms_norm(h, lp["ffn_norm"], cfg.rms_eps)
        h = h + _ffn(lp, cfg, hn2) * cfg.residual_scale

    for mi, conv1, ssm1 in new_states:
        rec = rec.write(mi, seq_id, conv1, ssm1)
    rec = rec.advance(seq_id, t)

    hidden = rms_norm(h, params["output_norm"], cfg.rms_eps)
    head = params.get("output", params["token_embd"])
    logits = (hidden @ head.T.astype(hidden.dtype)) / cfg.logit_scale
    return logits, HybridCache(kv=kvc, rec=rec)


def load_params(reader, cfg: GraniteHybridConfig) -> dict:
    """GGUF arch "granitehybrid" -> forward() pytree."""
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
        lp = {
            "attn_norm": get(p + "attn_norm.weight"),
            "ffn_norm": get(p + "ffn_norm.weight"),
        }
        if cfg.kv_heads[i] == 0:  # mamba2 tensor set
            lp.update({
                "ssm_in": get(p + "ssm_in.weight"),
                "ssm_conv1d": get(p + "ssm_conv1d.weight"),
                "ssm_conv1d_b": get(p + "ssm_conv1d.bias"),
                "ssm_dt_b": get(p + "ssm_dt.bias"),
                "ssm_a": get(p + "ssm_a"),
                "ssm_d": get(p + "ssm_d"),
                "ssm_norm": get(p + "ssm_norm.weight", required=False),
                "ssm_out": get(p + "ssm_out.weight"),
            })
        else:
            lp.update({
                "wq": get(p + "attn_q.weight"),
                "wk": get(p + "attn_k.weight"),
                "wv": get(p + "attn_v.weight"),
                "wo": get(p + "attn_output.weight"),
            })
        if f"{p}ffn_gate_inp.weight" in reader.tensors:
            lp["gate_inp"] = get(p + "ffn_gate_inp.weight")
            lp["gate_exps"] = get(p + "ffn_gate_exps.weight")
            lp["up_exps"] = get(p + "ffn_up_exps.weight")
            lp["down_exps"] = get(p + "ffn_down_exps.weight")
        else:
            lp["w_gate"] = get(p + "ffn_gate.weight", required=False)
            lp["w_up"] = get(p + "ffn_up.weight", required=False)
            lp["w_down"] = get(p + "ffn_down.weight", required=False)
        if f"{p}ffn_gate_shexp.weight" in reader.tensors:
            lp["gate_shexp"] = get(p + "ffn_gate_shexp.weight")
            lp["up_shexp"] = get(p + "ffn_up_shexp.weight")
            lp["down_shexp"] = get(p + "ffn_down_shexp.weight")
        params["layers"].append(lp)
    return params
