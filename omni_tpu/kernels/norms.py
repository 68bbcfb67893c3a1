"""Normalization primitives (f32 statistics regardless of activation dtype,
matching the reference's ggml_rms_norm / ggml_norm numerics)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array | None,
             eps: float = 1e-6) -> jax.Array:
    """weight=None = non-parametric (ggml_rms_norm with NULL weight)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    return out.astype(x.dtype)


def layer_norm(x: jax.Array, weight: jax.Array | None,
               bias: jax.Array | None = None,
               eps: float = 1e-6) -> jax.Array:
    """weight=None = non-parametric LayerNorm (OLMo's weightless
    LLM_NORM, llm_build_olmo: build_norm(…, NULL, NULL))."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def layer_norm_nobias(x: jax.Array, weight: jax.Array,
                      eps: float = 1e-5) -> jax.Array:
    """Bias-free LayerNorm (LLM_NORM in the reference; Cohere/Command-R
    block norms). Positionally signature-compatible with rms_norm so the
    engine can select between them (`bnorm(x, w, eps)`)."""
    return layer_norm(x, weight, None, eps)
