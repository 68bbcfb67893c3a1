"""Fused flash-attention decode over the KV cell pool.

The role of the reference's fattn-vec kernels with quantized KV support
(ggml/src/ggml-cuda/fattn-vec*.cuh, q8_0 KV instances per
ggml-cuda/CMakeLists.txt:57-63): one Pallas kernel streams the head-major
cell pool [Hkv, S, D] tile-by-tile through VMEM with an online-softmax
accumulator, dequantizing int8 KV in registers — the KV never materializes
in bf16 in HBM. Grid (Hkv, S/TS); S is the pool, masking handles causality,
sequence ownership, and padding in one [T, S] boolean.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(ns: int, quant: bool, scale: float):
    def kernel(q_ref, k_ref, v_ref, mask_ref, *rest):
        if quant:
            ks_ref, vs_ref = rest[0], rest[1]
            rest = rest[2:]
        o_ref, m_ref, l_ref, acc_ref = rest
        h = pl.program_id(0)
        s_idx = pl.program_id(1)

        @pl.when(s_idx == 0)
        def _():
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

        qb = q_ref[0].astype(jnp.bfloat16)  # [TG, D]
        kb = k_ref[0].astype(jnp.bfloat16)  # [TS, D] (raw int8 -> bf16 ok)
        vb = v_ref[0].astype(jnp.bfloat16)

        sc = jax.lax.dot_general(
            qb, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale  # [TG, TS]
        if quant:
            # int8 KV: fold the per-cell K scale into the score COLUMNS —
            # sum_d q·k_int·ks[c] == (sum_d q·k_int) * ks[c] — so scales only
            # need a dynamic SUBLANE slice (lane slicing needs 128-alignment)
            ks_row = ks_ref[pl.ds(h, 1), :]  # [1, TS]
            sc = sc * ks_row
        sc = jnp.where(mask_ref[...], sc, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(sc, axis=-1, keepdims=True))
        p = jnp.exp(sc - m_new)  # [TG, TS]
        corr = jnp.exp(m_prev - m_new)  # [TG, 1]
        l_new = corr * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True)
        if quant:
            # fold the V scale into P's columns: (p ∘ vs) @ v_int == p @ (v)
            p = p * vs_ref[pl.ds(h, 1), :]
        acc_ref[...] = acc_ref[...] * corr + jax.lax.dot_general(
            p.astype(jnp.bfloat16), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

        @pl.when(s_idx == ns - 1)
        def _():
            o_ref[0] = (acc_ref[...] /
                        jnp.maximum(l_ref[:, :1], 1e-30)).astype(o_ref.dtype)

    return kernel


def _kernel4(ns: int, scale: float):
    """int4-KV variant: K/V arrive packed [TS, D/2] (byte d = nibbles of
    logical cols d and d+D/2, biased +8 — kv_cache._quant_rows4), Q arrives
    pre-split [2, TG, D/2] so no lane-axis slicing happens in-kernel. The
    score is the sum of the two half-width dots; the output keeps split
    halves [2, TG, D/2] and the host concatenates (lane concat is free in
    XLA, hostile in Mosaic)."""
    def kernel(q_ref, k_ref, v_ref, mask_ref, ks_ref, vs_ref,
               o_ref, m_ref, l_ref, acc_lo, acc_hi):
        h = pl.program_id(0)
        s_idx = pl.program_id(1)

        @pl.when(s_idx == 0)
        def _():
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_lo[...] = jnp.zeros_like(acc_lo)
            acc_hi[...] = jnp.zeros_like(acc_hi)

        q_lo = q_ref[0, 0].astype(jnp.bfloat16)  # [TG, D/2]
        q_hi = q_ref[1, 0].astype(jnp.bfloat16)

        def halves(ref):  # packed uint8 [TS, D/2] -> two bf16 [TS, D/2]
            b = ref[0].astype(jnp.int32)
            lo = ((b & 0xF) - 8).astype(jnp.float32).astype(jnp.bfloat16)
            hi = ((b >> 4) - 8).astype(jnp.float32).astype(jnp.bfloat16)
            return lo, hi

        k_lo, k_hi = halves(k_ref)
        dims = (((1,), (1,)), ((), ()))
        sc = (jax.lax.dot_general(q_lo, k_lo, dims,
                                  preferred_element_type=jnp.float32)
              + jax.lax.dot_general(q_hi, k_hi, dims,
                                    preferred_element_type=jnp.float32))
        # per-cell K scale folds into score columns (same law as int8)
        sc = sc * scale * ks_ref[pl.ds(h, 1), :]
        sc = jnp.where(mask_ref[...], sc, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(sc, axis=-1, keepdims=True))
        p = jnp.exp(sc - m_new)
        corr = jnp.exp(m_prev - m_new)
        l_ref[...] = jnp.broadcast_to(
            corr * l_ref[:, :1] + jnp.sum(p, axis=-1, keepdims=True),
            l_ref.shape)
        p = (p * vs_ref[pl.ds(h, 1), :]).astype(jnp.bfloat16)
        v_lo, v_hi = halves(v_ref)
        dims_pv = (((1,), (0,)), ((), ()))
        acc_lo[...] = acc_lo[...] * corr + jax.lax.dot_general(
            p, v_lo, dims_pv, preferred_element_type=jnp.float32)
        acc_hi[...] = acc_hi[...] * corr + jax.lax.dot_general(
            p, v_hi, dims_pv, preferred_element_type=jnp.float32)
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

        @pl.when(s_idx == ns - 1)
        def _():
            den = jnp.maximum(l_ref[:, :1], 1e-30)
            o_ref[0, 0] = (acc_lo[...] / den).astype(o_ref.dtype)
            o_ref[0, 1] = (acc_hi[...] / den).astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("scale", "block_s", "interpret"))
def flash_decode(
    q: jax.Array,  # [T, Hq, D]
    k: jax.Array,  # [Hkv, S, D] bf16 or int8
    v: jax.Array,  # [Hkv, S, D]
    mask: jax.Array,  # [T, S] bool
    k_scale: jax.Array | None = None,  # [Hkv, S] (int8 KV)
    v_scale: jax.Array | None = None,
    scale: float | None = None,
    block_s: int = 512,
    interpret: bool = False,
) -> jax.Array:
    t, hq, d = q.shape
    hkv, s, _ = k.shape
    g = hq // hkv
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    quant = k_scale is not None
    quant4 = quant and k.dtype == jnp.uint8  # packed int4 (kv_cache bits=4)

    ts = min(block_s, s)
    while s % ts != 0:
        ts //= 2
    ns = s // ts

    # head-major q rows [Hkv, T*G, D], padded to the sublane granule
    tg = t * g
    tgp = max(8, ((tg + 7) // 8) * 8)
    qh = q.reshape(t, hkv, g, d).transpose(1, 0, 2, 3).reshape(hkv, tg, d)
    qh = jnp.pad(qh, ((0, 0), (0, tgp - tg), (0, 0)))
    # mask rows follow the same (t, g) flattening; padding rows all-False
    mrows = jnp.repeat(mask, g, axis=0)
    mrows = jnp.pad(mrows, ((0, tgp - tg), (0, 0)))

    if quant4:
        return _flash_decode4(qh, k, v, mrows, k_scale, v_scale,
                              float(scale), ts, ns, tg, t, g, interpret)

    in_specs = [
        pl.BlockSpec((1, tgp, d), lambda h, si: (h, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ts, d), lambda h, si: (h, si, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, ts, d), lambda h, si: (h, si, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tgp, ts), lambda h, si: (0, si),
                     memory_space=pltpu.VMEM),
    ]
    args = [qh, k, v, mrows]
    if quant:
        in_specs += [
            pl.BlockSpec((hkv, ts), lambda h, si: (0, si),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hkv, ts), lambda h, si: (0, si),
                         memory_space=pltpu.VMEM),
        ]
        args += [k_scale, v_scale]

    out = pl.pallas_call(
        _kernel(ns, quant, float(scale)),
        out_shape=jax.ShapeDtypeStruct((hkv, tgp, d), jnp.float32),
        grid=(hkv, ns),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tgp, d), lambda h, si: (h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tgp, 128), jnp.float32),  # running max
            pltpu.VMEM((tgp, 128), jnp.float32),  # running denom
            pltpu.VMEM((tgp, d), jnp.float32),  # weighted-V accumulator
        ],
        interpret=interpret,
    )(*args)

    out = out[:, :tg].reshape(hkv, t, g, d).transpose(1, 0, 2, 3)
    return out.reshape(t, hq, d)


def _flash_decode4(qh, k, v, mrows, k_scale, v_scale, scale: float,
                   ts: int, ns: int, tg: int, t: int, g: int,
                   interpret: bool):
    """Packed-int4 dispatch: Q split into halves outside the kernel, the
    kernel's output keeps split halves, concatenated here (in XLA)."""
    hkv, tgp, d = qh.shape
    s = k.shape[1]
    d2 = d // 2
    q2 = jnp.stack([qh[..., :d2], qh[..., d2:]], axis=0)  # [2, Hkv, TGP, D/2]

    out = pl.pallas_call(
        _kernel4(ns, scale),
        out_shape=jax.ShapeDtypeStruct((hkv, 2, tgp, d2), jnp.float32),
        grid=(hkv, ns),
        in_specs=[
            pl.BlockSpec((2, 1, tgp, d2), lambda h, si: (0, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts, d2), lambda h, si: (h, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ts, d2), lambda h, si: (h, si, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tgp, ts), lambda h, si: (0, si),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hkv, ts), lambda h, si: (0, si),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hkv, ts), lambda h, si: (0, si),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2, tgp, d2), lambda h, si: (h, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tgp, 128), jnp.float32),  # running max
            pltpu.VMEM((tgp, 128), jnp.float32),  # running denom
            pltpu.VMEM((tgp, d2), jnp.float32),  # low-half V accumulator
            pltpu.VMEM((tgp, d2), jnp.float32),  # high-half V accumulator
        ],
        interpret=interpret,
    )(q2, k, v, mrows, k_scale, v_scale)

    out = jnp.concatenate([out[:, 0], out[:, 1]], axis=-1)  # [Hkv, TGP, D]
    out = out[:, :tg].reshape(hkv, t, g, d).transpose(1, 0, 2, 3)
    return out.reshape(t, hkv * g, d)
