"""Rotary position embeddings (NeoX-style interleaved halves, the variant
used by Qwen3/LLaMA in the reference: ggml_rope_ext with GGML_ROPE_TYPE_NEOX;
graph use at /root/reference/src/llama-model.cpp:9287-9407).

Positions are explicit per token (int32), which is what makes the
llama.cpp-style KV ops (seq_add position re-base, seq_div self-extend)
expressible: cached K is stored rotated, and a position shift is applied as
an incremental rotation by the delta.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_freqs(head_dim: int, base: float, dtype=jnp.float32) -> jax.Array:
    """Inverse frequencies for each rotated pair: [head_dim/2]."""
    exponents = jnp.arange(0, head_dim, 2, dtype=dtype) / head_dim
    return 1.0 / (base ** exponents)


def apply_rope(x: jax.Array, pos: jax.Array, base: float = 10000.0,
               freqs: jax.Array | None = None,
               neox: bool = True) -> jax.Array:
    """Rotate x[..., T, H, D] by per-token positions pos[..., T].

    neox=True: the first D/2 lanes pair with the last D/2 (NeoX/Qwen,
    GGML_ROPE_TYPE_NEOX). neox=False: adjacent lanes pair (original
    rotary, GGML_ROPE_TYPE_NORM — LLaMA/Mistral family).
    """
    d = x.shape[-1]
    if freqs is None:
        freqs = rope_freqs(d, base)
    angles = pos[..., None].astype(jnp.float32) * freqs  # [..., T, D/2]
    cos = jnp.cos(angles)[..., None, :]  # broadcast over heads
    sin = jnp.sin(angles)[..., None, :]
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
