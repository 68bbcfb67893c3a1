"""Composable sampler chain, jit-compatible.

Re-implements the reference's sampler set (/root/reference/src/
llama-sampling.cpp, chain wrapper common/sampling.cpp, default order per
common/common.h:171-180): penalties → top-n-sigma → top-k → typical →
top-p → min-p → XTC → temperature(-ext) → dist/greedy. All transforms are
pure jnp on an f32 logits vector, so the whole chain runs on-device inside
the decode step; token history for penalties is a fixed-size ring carried
as state (-1 padded).

Samplers not yet ported from the reference: mirostat v1/v2, DRY, infill,
grammar (grammar lives in `omni_tpu.runtime.grammar`).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


@dataclasses.dataclass(frozen=True)
class SamplerParams:
    """Mirror of common_params_sampling (reference common/common.h:96-180)."""

    seed: int = 42
    temp: float = 0.8
    dynatemp_range: float = 0.0  # temp-ext
    dynatemp_exponent: float = 1.0
    top_k: int = 40
    top_p: float = 0.95
    min_p: float = 0.05
    typical_p: float = 1.0
    top_n_sigma: float = -1.0
    xtc_probability: float = 0.0
    xtc_threshold: float = 0.10
    penalty_last_n: int = 64
    penalty_repeat: float = 1.0
    penalty_freq: float = 0.0
    penalty_present: float = 0.0
    greedy: bool = False

    @property
    def needs_penalties(self) -> bool:
        return self.penalty_last_n > 0 and (
            self.penalty_repeat != 1.0
            or self.penalty_freq != 0.0
            or self.penalty_present != 0.0
        )


def apply_penalties(logits: jax.Array, prev_tokens: jax.Array,
                    p: SamplerParams) -> jax.Array:
    """Repetition/frequency/presence penalties over a trailing window.
    prev_tokens: [W] int32, -1 padding."""
    idx = jnp.where(prev_tokens >= 0, prev_tokens, logits.shape[-1])
    counts = jnp.zeros_like(logits).at[idx].add(1.0, mode="drop")
    present = counts > 0
    if p.penalty_repeat != 1.0:
        penal = jnp.where(logits > 0, logits / p.penalty_repeat,
                          logits * p.penalty_repeat)
        logits = jnp.where(present, penal, logits)
    logits = logits - counts * p.penalty_freq
    logits = logits - present.astype(jnp.float32) * p.penalty_present
    return logits


def apply_top_k(logits: jax.Array, k: int) -> jax.Array:
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jax.Array, top_p: float) -> jax.Array:
    if top_p >= 1.0:
        return logits
    sorted_logits = jnp.sort(logits)[::-1]
    probs = jax.nn.softmax(sorted_logits)
    cum = jnp.cumsum(probs)
    # keep the smallest prefix with cumulative prob > top_p (incl. boundary)
    keep = jnp.concatenate([jnp.ones(1, bool), cum[:-1] < top_p])
    thresh = jnp.min(jnp.where(keep, sorted_logits, jnp.inf))
    return jnp.where(logits < thresh, NEG_INF, logits)


def apply_min_p(logits: jax.Array, min_p: float) -> jax.Array:
    if min_p <= 0.0:
        return logits
    probs = jax.nn.softmax(logits)
    cutoff = jnp.max(probs) * min_p
    return jnp.where(probs < cutoff, NEG_INF, logits)


def apply_typical(logits: jax.Array, typ_p: float) -> jax.Array:
    """Locally-typical sampling (reference llama_sampler_init_typical)."""
    if typ_p >= 1.0:
        return logits
    logp = jax.nn.log_softmax(logits)
    probs = jnp.exp(logp)
    ent = -jnp.sum(jnp.where(probs > 0, probs * logp, 0.0))
    shifted = jnp.abs(-logp - ent)
    order = jnp.argsort(shifted)  # ascending deviation from entropy
    sorted_probs = probs[order]
    cum = jnp.cumsum(sorted_probs)
    keep_sorted = jnp.concatenate([jnp.ones(1, bool), cum[:-1] < typ_p])
    keep = jnp.zeros_like(keep_sorted).at[order].set(keep_sorted)
    return jnp.where(keep, logits, NEG_INF)


def apply_top_n_sigma(logits: jax.Array, n_sigma: float) -> jax.Array:
    if n_sigma <= 0.0:
        return logits
    valid = logits > NEG_INF
    mx = jnp.max(logits)
    mean = jnp.mean(jnp.where(valid, logits, 0.0))
    std = jnp.sqrt(jnp.mean(jnp.where(valid, (logits - mean) ** 2, 0.0)))
    return jnp.where(logits < mx - n_sigma * std, NEG_INF, logits)


def apply_xtc(logits: jax.Array, key: jax.Array, p: SamplerParams) -> jax.Array:
    """Exclude-top-choices: with prob xtc_probability, remove all but the
    last token whose prob >= threshold."""
    if p.xtc_probability <= 0.0:
        return logits
    probs = jax.nn.softmax(logits)
    above = probs >= p.xtc_threshold
    n_above = jnp.sum(above)
    fire = jax.random.uniform(key) < p.xtc_probability
    # drop every above-threshold token except the least probable of them
    min_above = jnp.min(jnp.where(above, probs, jnp.inf))
    drop = above & (probs > min_above) & fire & (n_above > 1)
    return jnp.where(drop, NEG_INF, logits)


def apply_temp(logits: jax.Array, p: SamplerParams) -> jax.Array:
    if p.dynatemp_range > 0.0:
        # entropy-scaled dynamic temperature (llama_sampler_init_temp_ext)
        lo = jnp.maximum(0.0, p.temp - p.dynatemp_range)
        hi = p.temp + p.dynatemp_range
        logp = jax.nn.log_softmax(logits)
        probs = jnp.exp(logp)
        ent = -jnp.sum(jnp.where(probs > 0, probs * logp, 0.0))
        n_valid = jnp.sum(logits > NEG_INF)
        max_ent = jnp.log(jnp.maximum(n_valid.astype(jnp.float32), 2.0))
        dyn = lo + (hi - lo) * jnp.power(ent / max_ent, p.dynatemp_exponent)
        return logits / jnp.maximum(dyn, 1e-6)
    if p.temp > 0.0:
        return logits / p.temp
    return logits


def sample(
    logits: jax.Array,  # [vocab] f32
    key: jax.Array,
    params: SamplerParams,
    prev_tokens: jax.Array | None = None,  # [W] int32 ring, -1 padded
) -> jax.Array:
    """Run the chain and draw one token id (int32)."""
    if params.greedy or params.temp <= 0.0:
        if params.needs_penalties and prev_tokens is not None:
            logits = apply_penalties(logits, prev_tokens, params)
        return jnp.argmax(logits).astype(jnp.int32)

    if params.needs_penalties and prev_tokens is not None:
        logits = apply_penalties(logits, prev_tokens, params)
    logits = apply_top_n_sigma(logits, params.top_n_sigma)
    logits = apply_top_k(logits, params.top_k)
    logits = apply_typical(logits, params.typical_p)
    logits = apply_top_p(logits, params.top_p)
    logits = apply_min_p(logits, params.min_p)
    k_xtc, k_draw = jax.random.split(key)
    logits = apply_xtc(logits, k_xtc, params)
    logits = apply_temp(logits, params)
    return jax.random.categorical(k_draw, logits).astype(jnp.int32)


def update_prev_tokens(prev: jax.Array, token: jax.Array) -> jax.Array:
    """Shift the penalty ring buffer."""
    return jnp.concatenate([prev[1:], token[None].astype(prev.dtype)])
