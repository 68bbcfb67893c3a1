"""LFM2 — hybrid short-convolution + attention arch, GGUF arch "lfm2".

Counterpart of the reference's llm_build_lfm2 (src/llama-model.cpp:18685):
per-layer dispatch between a gated short causal convolution mixer
(build_shortconv_block — in_proj -> [B | C | x], Bx = B*x convolved over a
rolling L-column window, y = C * conv, out_proj) and GQA attention with
per-head q/k RMS norms + NeoX rope. The FFN is dense SwiGLU (lfm2moe adds
softmax-top-k experts after a dense lead). The FINAL norm is the model's
token_embd_norm ("model.embedding_norm").

TPU-first: the short conv is fully parallel over time (L is 3-4 — the
window sum is L shifted slices, no scan); conv states live in the
RecurrentCache's conv planes (d_state=1 slot unused), attention in the
unified KVCache — the same HybridCache contract as Jamba.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..kernels.attention import cache_attention
from ..kernels.norms import rms_norm
from ..kernels.rope import apply_rope
from ..runtime.kv_cache import KVCache
from ..runtime.recurrent import HybridCache, RecurrentCache


@dataclasses.dataclass(frozen=True)
class Lfm2Config:
    n_layers: int
    d_model: int
    n_heads: int
    kv_heads: tuple[int, ...]  # per layer; 0 = shortconv layer
    head_dim: int
    d_ff: int
    l_cache: int = 3  # shortconv kernel length (state = l_cache - 1)
    rope_base: float = 1000000.0
    rms_eps: float = 1e-5
    n_vocab: int = 256
    n_experts: int = 0
    n_experts_used: int = 0
    n_dense_lead: int = 0  # lfm2moe: first N layers keep the dense FFN
    d_ff_exp: int = 0

    @staticmethod
    def from_gguf(kv: dict[str, Any]) -> "Lfm2Config":
        arch = kv.get("general.architecture", "lfm2")
        g = lambda key, default: kv.get(f"{arch}.{key}", default)
        d = int(g("embedding_length", 256))
        n_heads = int(g("attention.head_count", 8))
        n_layers = int(g("block_count", 2))
        kvh = g("attention.head_count_kv", 0)
        if not hasattr(kvh, "__len__"):
            kvh = [int(kvh)] * n_layers
        return Lfm2Config(
            n_layers=n_layers, d_model=d, n_heads=n_heads,
            kv_heads=tuple(int(x) for x in kvh),
            head_dim=int(g("attention.key_length", d // n_heads)),
            d_ff=int(g("feed_forward_length", 4 * d)),
            l_cache=int(g("shortconv.l_cache", 3)),
            rope_base=float(g("rope.freq_base", 1000000.0)),
            rms_eps=float(g("attention.layer_norm_rms_epsilon", 1e-5)),
            n_vocab=int(g("vocab_size", 256)),
            n_experts=int(g("expert_count", 0)),
            n_experts_used=int(g("expert_used_count", 0)),
            n_dense_lead=int(g("leading_dense_block_count", 0)),
            d_ff_exp=int(g("expert_feed_forward_length", 0)),
        )


def make_cache(cfg: Lfm2Config, kv_size: int,
               n_seqs: int = 4) -> HybridCache:
    n_attn = sum(1 for h in cfg.kv_heads if h > 0)
    n_conv = cfg.n_layers - n_attn
    kvh = max((h for h in cfg.kv_heads if h > 0), default=1)
    return HybridCache(
        kv=KVCache.create(max(n_attn, 1), kv_size, kvh, cfg.head_dim),
        rec=RecurrentCache.create(max(n_conv, 1), n_seqs, cfg.l_cache,
                                  1, 1, conv_channels=cfg.d_model),
    )


def _shortconv(lp: dict, cfg: Lfm2Config, hn: jax.Array,
               conv_state: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Gated short conv over [T, d]; conv_state [L-1, d] rolls forward.
    Parallel over T: the causal window sum is L shifted slices."""
    t = hn.shape[0]
    d = cfg.d_model
    bcx = hn @ lp["conv_in"].T  # [T, 3d]
    b, c, x = bcx[:, :d], bcx[:, d:2 * d], bcx[:, 2 * d:]
    bx = b * x
    full = jnp.concatenate([conv_state.astype(bx.dtype), bx], axis=0)
    kern = lp["conv_kernel"]  # [d, L]
    y = jnp.zeros_like(bx)
    for j in range(cfg.l_cache):  # L is 3-4: unrolled shifted slices
        y = y + full[j: j + t] * kern[:, j]
    y = c * y
    return y @ lp["conv_out"].T, full[-(cfg.l_cache - 1):]


def _attn(lp: dict, cfg: Lfm2Config, hn: jax.Array, kvc: KVCache,
          attn_li: int, hkv: int, slots, pos, seq_vec):
    t = hn.shape[0]
    hd, hq = cfg.head_dim, cfg.n_heads
    q = (hn @ lp["wq"].T).reshape(t, hq, hd)
    k = (hn @ lp["wk"].T).reshape(t, hkv, hd)
    v = (hn @ lp["wv"].T).reshape(t, hkv, hd)
    q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
    k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
    q = apply_rope(q, pos, cfg.rope_base, neox=True)
    k = apply_rope(k, pos, cfg.rope_base, neox=True)
    kvc = kvc.write(attn_li, slots, k.astype(jnp.bfloat16),
                    v.astype(jnp.bfloat16))
    kc, vc = kvc.read_layer(attn_li)
    mask = kvc.attn_mask(pos, seq_vec)
    out = cache_attention(q.astype(jnp.bfloat16), kc, vc, mask)
    return out.reshape(t, hq * hd).astype(hn.dtype) @ lp["wo"].T, kvc


def forward(params: dict, cfg: Lfm2Config, tokens: jax.Array,
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

    h = params["token_embd"][tokens].astype(jnp.float32)
    attn_li = conv_li = 0
    new_states = []
    for li, lp in enumerate(params["layers"]):
        hn = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
        if cfg.kv_heads[li] == 0:
            conv0, _ = rec.read(conv_li, seq_id)
            mix, conv1 = _shortconv(lp, cfg, hn, conv0)
            new_states.append((conv_li, conv1))
            conv_li += 1
        else:
            mix, kvc = _attn(lp, cfg, hn, kvc, attn_li,
                             cfg.kv_heads[li], slots, pos, seq_vec)
            attn_li += 1
        h = h + mix
        hn2 = rms_norm(h, lp["ffn_norm"], cfg.rms_eps)
        if lp.get("gate_inp") is not None:
            # lfm2moe routed FFN (build_moe_ffn SIGMOID gating, selection
            # biased by exp_probs_b, top-k weights renormalized —
            # llm_build_lfm2::build_moe_feed_forward)
            probs = jax.nn.sigmoid(hn2 @ lp["gate_inp"].T)  # [T, E]
            sel = probs + lp["exp_probs_b"]
            _, top_i = jax.lax.top_k(sel, cfg.n_experts_used)
            top_w = jnp.take_along_axis(probs, top_i, axis=-1)
            top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
            wg = lp["gate_exps"][top_i]  # [T, K, F, D]
            wu = lp["up_exps"][top_i]
            wd = lp["down_exps"][top_i]  # [T, K, D, F]
            g = jnp.einsum("td,tkfd->tkf", hn2, wg)
            u = jnp.einsum("td,tkfd->tkf", hn2, wu)
            y = jnp.einsum("tkf,tkdf->tkd", jax.nn.silu(g) * u, wd)
            h = h + jnp.einsum("tkd,tk->td", y, top_w)
        else:
            g = hn2 @ lp["w_gate"].T
            u = hn2 @ lp["w_up"].T
            h = h + (jax.nn.silu(g) * u) @ lp["w_down"].T

    ssm_dummy = rec.ssm[0, seq_id]
    for ci, conv1 in new_states:
        rec = rec.write(ci, seq_id, conv1, ssm_dummy)
    rec = rec.advance(seq_id, t)

    hidden = rms_norm(h, params["output_norm"], cfg.rms_eps)
    head = params.get("output", params["token_embd"])
    logits = hidden @ head.T.astype(hidden.dtype)
    return logits, HybridCache(kv=kvc, rec=rec)


def load_params(reader, cfg: Lfm2Config) -> dict:
    """GGUF arch "lfm2" -> forward() pytree (tensor names per the
    reference: shortconv.{conv,in_proj,out_proj}, token_embd_norm as the
    final norm)."""
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
        # reference: model.tok_norm plays the final norm (embedding_norm)
        "output_norm": (get("token_embd_norm.weight", required=False)
                        if "token_embd_norm.weight" in reader.tensors
                        else get("output_norm.weight")),
        "layers": [],
    }
    out = get("output.weight", required=False)
    if out is not None:
        params["output"] = out
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        moe = f"{p}ffn_gate_inp.weight" in reader.tensors
        lp = {
            "attn_norm": get(p + "attn_norm.weight"),
            "ffn_norm": get(p + "ffn_norm.weight"),
        }
        if moe:  # lfm2moe layers past the dense lead
            lp["gate_inp"] = get(p + "ffn_gate_inp.weight")
            lp["exp_probs_b"] = get(p + "exp_probs_b.bias")
            lp["gate_exps"] = get(p + "ffn_gate_exps.weight")
            lp["up_exps"] = get(p + "ffn_up_exps.weight")
            lp["down_exps"] = get(p + "ffn_down_exps.weight")
        else:
            lp["w_gate"] = get(p + "ffn_gate.weight")
            lp["w_up"] = get(p + "ffn_up.weight")
            lp["w_down"] = get(p + "ffn_down.weight")
        if cfg.kv_heads[i] == 0:
            lp["conv_in"] = get(p + "shortconv.in_proj.weight")
            lp["conv_out"] = get(p + "shortconv.out_proj.weight")
            # stored [L, d] (ggml {l_cache, n_embd}); kernel use is [d, L]
            lp["conv_kernel"] = get(p + "shortconv.conv.weight")
        else:
            lp["wq"] = get(p + "attn_q.weight")
            lp["wk"] = get(p + "attn_k.weight")
            lp["wv"] = get(p + "attn_v.weight")
            lp["wo"] = get(p + "attn_output.weight")
            lp["q_norm"] = get(p + "attn_q_norm.weight")
            lp["k_norm"] = get(p + "attn_k_norm.weight")
        params["layers"].append(lp)
    return params
