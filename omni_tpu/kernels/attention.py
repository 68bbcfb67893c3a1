"""Attention over the unified KV cell pool.

XLA path (this module) is the reference semantics: masked softmax over every
cell with GQA head grouping — the role of ggml_flash_attn_ext in the
reference graphs (/root/reference/src/llama-graph.cpp:1342-1347). A fused
Pallas flash-decode kernel with the same contract (incl. int8 KV dequant
in-kernel) lives in `flash_attention.py`; measured on v5e, XLA's fused
attention is faster for bf16 pools (49 vs 59 us/layer @2k, 89 vs 119
@8k) so this XLA path is the default — the Pallas kernel wins only for
int8 KV at long context (112 vs 120 us/layer @8k) and is the base for
future sharded-KV ring decode. Numbers: docs/PERF.md.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def alibi_slopes(n_heads: int, max_bias: float):
    """Per-head ALiBi slopes, the ggml_soft_max_ext formula (the HF Bloom
    build_alibi_tensor closed form is identical at max_bias=8):
    m0 = 2^(-max_bias/P), m1 = 2^(-max_bias/2/P) with P = 2^floor(log2(H));
    head h gets m0^(h+1) below P, m1^(2(h-P)+1) above."""
    import math

    import numpy as np

    p = 1 << int(math.floor(math.log2(n_heads)))
    m0 = 2.0 ** (-max_bias / p)
    m1 = 2.0 ** (-max_bias / 2.0 / p)
    return np.asarray(
        [m0 ** (h + 1) if h < p else m1 ** (2 * (h - p) + 1)
         for h in range(n_heads)], np.float32)


def _alibi_bias(alibi, hkv: int, g: int):
    """(slopes [Hq], dist [T, S]) -> [Hkv, T*G, S] additive score bias
    (r-index ordering matches the head-major q layout: r = t*G + g)."""
    slopes, dist = alibi
    t, s = dist.shape
    b = (slopes.reshape(hkv, 1, g, 1).astype(jnp.float32)
         * dist[None, :, None, :].astype(jnp.float32))
    return b.reshape(hkv, t * g, s)


def mixed_attention(
    q: jax.Array,  # [T, Hq, D]
    k_pool: jax.Array,  # [Hkv, S, D]
    v_pool: jax.Array,
    k_cur: jax.Array,  # [T, Hkv, D] current-batch keys (not yet in the pool)
    v_cur: jax.Array,
    mask_pool: jax.Array,  # [T, S] (current-batch cells excluded)
    mask_cur: jax.Array,  # [T, T] causal+same-seq within the batch
    scale: float | None = None,
    logit_softcap: float = 0.0,
    sinks: jax.Array | None = None,  # [Hq] learned sink logits (gpt-oss)
    alibi=None,  # (slopes [Hq], dist_pool [T, S], dist_cur [T, T])
) -> jax.Array:
    """Attention over pool ∪ current batch with ONE joint softmax — the
    deferred-write decode path: the pool is read pre-write, the batch's own
    keys ride along as extra columns, and all layers' K/V hit the pool with
    a single scatter afterwards."""
    t, hq, d = q.shape
    hkv = k_pool.shape[0]
    g = hq // hkv
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    cdtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    qh = (q.reshape(t, hkv, g, d).transpose(1, 0, 2, 3)
          .reshape(hkv, t * g, d).astype(cdtype))
    kc = jnp.swapaxes(k_cur, 0, 1).astype(cdtype)  # [Hkv, T, D]
    vc = jnp.swapaxes(v_cur, 0, 1).astype(cdtype)
    sc_pool = jnp.einsum("hrd,hsd->hrs", qh, k_pool.astype(cdtype),
                         preferred_element_type=jnp.float32) * scale
    sc_cur = jnp.einsum("hrd,hjd->hrj", qh, kc,
                        preferred_element_type=jnp.float32) * scale
    if logit_softcap > 0.0:  # Gemma-2 attn logit soft-capping
        sc_pool = jnp.tanh(sc_pool / logit_softcap) * logit_softcap
        sc_cur = jnp.tanh(sc_cur / logit_softcap) * logit_softcap
    if alibi is not None:  # ALiBi: score += slope_h * -|q_pos - k_pos|
        slopes, dist_pool, dist_cur = alibi
        sc_pool = sc_pool + _alibi_bias((slopes, dist_pool), hkv, g)
        sc_cur = sc_cur + _alibi_bias((slopes, dist_cur), hkv, g)
    mp = jnp.repeat(mask_pool, g, axis=0)  # [T*G, S]
    mc = jnp.repeat(mask_cur, g, axis=0)  # [T*G, T]
    sc_pool = jnp.where(mp[None], sc_pool, NEG_INF)
    sc_cur = jnp.where(mc[None], sc_cur, NEG_INF)
    sc = jnp.concatenate([sc_pool, sc_cur], axis=-1)
    if sinks is not None:
        # per-head sink logit joins the softmax and its mass is dropped
        # (ggml_soft_max_add_sinks semantics); q-head h = hkv_idx*g + g_idx
        sk = (jnp.broadcast_to(sinks.reshape(hkv, 1, g), (hkv, t, g))
              .reshape(hkv, t * g, 1).astype(jnp.float32))
        p = jax.nn.softmax(jnp.concatenate([sc, sk], axis=-1),
                           axis=-1)[..., :-1].astype(cdtype)
    else:
        p = jax.nn.softmax(sc, axis=-1).astype(cdtype)
    s = k_pool.shape[1]
    out = jnp.einsum("hrs,hsd->hrd", p[..., :s], v_pool.astype(cdtype),
                     preferred_element_type=jnp.float32)
    out = out + jnp.einsum("hrj,hjd->hrd", p[..., s:], vc,
                           preferred_element_type=jnp.float32)
    dv = v_pool.shape[-1]  # may differ from d (MLA latent values)
    return (out.reshape(hkv, t, g, dv).transpose(1, 0, 2, 3)
            .reshape(t, hq, dv))


def pool_attention(q: jax.Array, cache, layer: int, mask: jax.Array,
                   scale: float | None = None,
                   logit_softcap: float = 0.0,
                   sinks: jax.Array | None = None,
                   alibi=None, kv_limit: int | None = None) -> jax.Array:
    """Attention over one layer of the KV cell pool, picking the best
    kernel for the storage dtype: int8 KV on TPU goes through the Pallas
    flash kernel (in-register dequant, half the HBM traffic); bf16 uses
    XLA's fused attention (faster on v5e — docs/PERF.md). Soft-capped
    scores (Gemma-2) always take the XLA path — the flash kernel has no
    tanh stage."""
    import os

    # bf16 KV: XLA's fused attention is the measured default; set
    # OMNI_FLASH_BF16_MIN=<cells> to route pools at least that large
    # through the Pallas flash kernel instead (long-context experiments;
    # 0 = always XLA for bf16)
    bf16_flash_min = int(os.environ.get("OMNI_FLASH_BF16_MIN", "0"))
    want_flash = cache.quantized or (
        bf16_flash_min > 0 and (kv_limit or cache.size) >= bf16_flash_min)
    if (want_flash and logit_softcap == 0.0 and sinks is None
            and alibi is None and jax.default_backend() == "tpu"):
        from .flash_attention import flash_decode

        k, v, ks, vs = cache.layer_planes(layer, limit=kv_limit)
        return flash_decode(q, k, v, mask, k_scale=ks, v_scale=vs,
                            scale=scale)
    kc, vc = cache.read_layer(layer, limit=kv_limit)
    return cache_attention(q, kc, vc, mask, scale=scale,
                           logit_softcap=logit_softcap, sinks=sinks,
                           alibi=alibi)


def cache_attention(
    q: jax.Array,  # [T, Hq, D]
    k: jax.Array,  # [Hkv, S, D] (head-major pool)
    v: jax.Array,  # [Hkv, S, D]
    mask: jax.Array,  # [T, S] bool
    scale: float | None = None,
    logit_softcap: float = 0.0,
    sinks: jax.Array | None = None,  # [Hq] learned sink logits (gpt-oss)
    alibi=None,  # (slopes [Hq], dist [T, S])
) -> jax.Array:
    t, hq, d = q.shape
    hkv, s, _ = k.shape
    g = hq // hkv
    if scale is None:
        scale = 1.0 / (d ** 0.5)

    # XLA:CPU lacks bf16 batched dots for this contraction; TPU wants bf16
    cdtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    # head-major batched form ([Hkv, T*G, ...]) measures ~11% faster than
    # the [T, Hkv, G, S] layout on v5e (fewer inserted transposes)
    qh = (q.reshape(t, hkv, g, d).transpose(1, 0, 2, 3)
          .reshape(hkv, t * g, d).astype(cdtype))
    scores = jnp.einsum("hrd,hsd->hrs", qh, k.astype(cdtype),
                        preferred_element_type=jnp.float32) * scale
    if logit_softcap > 0.0:
        scores = jnp.tanh(scores / logit_softcap) * logit_softcap
    if alibi is not None:  # ALiBi: score += slope_h * -|q_pos - k_pos|
        scores = scores + _alibi_bias(alibi, hkv, g)
    mask_r = jnp.repeat(mask, g, axis=0)  # [T*G, S]
    scores = jnp.where(mask_r[None], scores, NEG_INF)
    if sinks is not None:  # gpt-oss sink column, dropped after softmax
        sk = (jnp.broadcast_to(sinks.reshape(hkv, 1, g), (hkv, t, g))
              .reshape(hkv, t * g, 1).astype(jnp.float32))
        p = jax.nn.softmax(jnp.concatenate([scores, sk], axis=-1),
                           axis=-1)[..., :-1]
    else:
        p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hrs,hsd->hrd", p.astype(cdtype), v.astype(cdtype),
                     preferred_element_type=jnp.float32)
    dv = v.shape[-1]  # may differ from d (MLA latent values)
    return (out.reshape(hkv, t, g, dv).transpose(1, 0, 2, 3)
            .reshape(t, hq, dv))
