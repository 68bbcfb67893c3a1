"""Rotary position embeddings (NeoX-style interleaved halves, the variant
used by Qwen3/LLaMA in the reference: ggml_rope_ext with GGML_ROPE_TYPE_NEOX;
graph use at /root/reference/src/llama-model.cpp:9287-9407).

Positions are explicit per token (int32), which is what makes the
llama.cpp-style KV ops (seq_add position re-base, seq_div self-extend)
expressible: cached K is stored rotated, and a position shift is applied as
an incremental rotation by the delta.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def rope_freqs(head_dim: int, base: float, dtype=jnp.float32) -> jax.Array:
    """Inverse frequencies for each rotated pair: [head_dim/2]."""
    exponents = jnp.arange(0, head_dim, 2, dtype=dtype) / head_dim
    return 1.0 / (base ** exponents)


def yarn_freqs(head_dim: int, base: float, factor: float, orig_ctx: int,
               beta_fast: float = 32.0, beta_slow: float = 1.0,
               ) -> jax.Array:
    """YaRN-corrected inverse frequencies [head_dim/2] (NTK-by-parts).

    Matches HF `_compute_yarn_parameters` (and the reference's
    ggml rope_yarn corrections, ggml/src/ggml-cpu/ops.cpp): frequencies
    whose full rotation period fits inside the original context
    (high-frequency dims) extrapolate unchanged; slow dims interpolate
    by 1/factor; a linear ramp between the beta_fast/beta_slow
    correction dims blends the two. The attention (mscale) factor is
    carried separately — see Qwen3Config.rope_attn_factor."""

    def correction_dim(n_rot: float) -> float:
        return (head_dim
                * math.log(orig_ctx / (n_rot * 2 * math.pi))
                / (2 * math.log(base)))

    low = max(math.floor(correction_dim(beta_fast)), 0)
    high = min(math.ceil(correction_dim(beta_slow)), head_dim - 1)
    if low == high:
        high += 0.001
    ramp = jnp.clip(
        (jnp.arange(head_dim // 2, dtype=jnp.float32) - low) / (high - low),
        0.0, 1.0)
    extrap_mask = 1.0 - ramp  # 1 = pure extrapolation (fast dims)
    pos_f = base ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32)
                     / head_dim)
    return ((1.0 / (factor * pos_f)) * ramp
            + (1.0 / pos_f) * extrap_mask)


def apply_rope(x: jax.Array, pos: jax.Array, base: float = 10000.0,
               freqs: jax.Array | None = None,
               neox: bool = True, scale: float = 1.0) -> jax.Array:
    """Rotate x[..., T, H, D] by per-token positions pos[..., T].

    neox=True: the first D/2 lanes pair with the last D/2 (NeoX/Qwen,
    GGML_ROPE_TYPE_NEOX). neox=False: adjacent lanes pair (original
    rotary, GGML_ROPE_TYPE_NORM — LLaMA/Mistral family).

    `scale` is the YaRN/LongRoPE attention factor (mscale): it
    multiplies cos AND sin, i.e. the rotated vector itself, which is
    how HF applies attention_scaling to its cos/sin caches.
    """
    d = x.shape[-1]
    if freqs is None:
        freqs = rope_freqs(d, base)
    angles = pos[..., None].astype(jnp.float32) * freqs  # [..., T, D/2]
    cos = jnp.cos(angles)[..., None, :]  # broadcast over heads
    sin = jnp.sin(angles)[..., None, :]
    if scale != 1.0:
        cos = cos * scale
        sin = sin * scale
    if neox:
        x1 = x[..., : d // 2].astype(jnp.float32)
        x2 = x[..., d // 2 :].astype(jnp.float32)
        out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos],
                              axis=-1)
        return out.astype(x.dtype)
    # NORM: even/odd interleaved pairs
    xf = x.astype(jnp.float32)
    x1 = xf[..., 0::2]
    x2 = xf[..., 1::2]
    r1 = x1 * cos - x2 * sin
    r2 = x1 * sin + x2 * cos
    out = jnp.stack([r1, r2], axis=-1).reshape(x.shape)
    return out.astype(x.dtype)


def rope_shift(k: jax.Array, delta: jax.Array, base: float = 10000.0) -> jax.Array:
    """Incrementally rotate cached K rows by per-row position deltas
    (the K-shift used by context-shift / self-extend: reference
    src/llama-kv-cache.cpp build_rope_shift)."""
    return apply_rope(k, delta, base)


def apply_mrope(x: jax.Array, pos3: jax.Array, sections: tuple,
                base: float = 10000.0,
                freqs: jax.Array | None = None) -> jax.Array:
    """Multimodal rotary (qwen2vl M-RoPE): x [T, H, D], pos3 [T, 3]
    (temporal / height / width position streams).

    Frequency pairs are split into chunks of `sections` (pair units);
    chunk i takes its angle from position stream i % 3 — HF
    apply_multimodal_rotary_pos_emb's cos/sin re-assembly
    (transformers modeling_qwen2_vl.py), the counterpart of the
    reference's ggml_rope_multi sections. With all three streams equal
    this reduces exactly to NeoX rope."""
    d = x.shape[-1]
    if freqs is None:
        freqs = rope_freqs(d, base)
    import numpy as np

    stream = np.concatenate([
        np.full(s, i % 3, np.int32) for i, s in enumerate(sections)])
    assert stream.shape[0] == d // 2, (sections, d)
    pos_pairs = pos3[:, jnp.asarray(stream)].astype(jnp.float32)  # [T, D/2]
    angles = pos_pairs * freqs
    cos = jnp.cos(angles)[..., None, :]
    sin = jnp.sin(angles)[..., None, :]
    x1 = x[..., : d // 2].astype(jnp.float32)
    x2 = x[..., d // 2:].astype(jnp.float32)
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos],
                          axis=-1)
    return out.astype(x.dtype)
