"""Composable sampler chain, jit-compatible.

Re-implements the reference's sampler set (/root/reference/src/
llama-sampling.cpp, chain wrapper common/sampling.cpp, default order per
common/common.h:171-180): logit-bias → penalties → DRY → top-n-sigma →
top-k → typical → top-p → min-p → XTC → temperature(-ext) → dist/greedy,
plus mirostat v1/v2 as alternative final samplers (stateful mu). All
transforms are pure jnp on an f32 logits vector, so the whole chain runs
on-device inside the decode step; token history for penalties/DRY is a
fixed-size ring carried as state (-1 padded).

Grammar-constrained sampling lives in `omni_tpu.grammar` (host-side by
nature); its allowed-token set enters here via `apply_allowed_mask`.
The reference's infill sampler (vocab-text dependent EOG merging) is not
ported; the server's infill endpoint uses the standard chain.
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
    # DRY (arXiv repeat suppression; reference llama_sampler_init_dry)
    dry_multiplier: float = 0.0  # 0 = off
    dry_base: float = 1.75
    dry_allowed_length: int = 2
    dry_breakers: tuple[int, ...] = ()  # token ids that reset n-gram matching
    # static (token_id, bias) pairs (llama_sampler_init_logit_bias)
    logit_bias: tuple[tuple[int, float], ...] = ()
    # mirostat: 0 = off, 1 = v1, 2 = v2 (llama_sampler_init_mirostat{,_v2})
    mirostat: int = 0
    mirostat_tau: float = 5.0
    mirostat_eta: float = 0.1
    greedy: bool = False

    @property
    def needs_penalties(self) -> bool:
        return self.penalty_last_n > 0 and (
            self.penalty_repeat != 1.0
            or self.penalty_freq != 0.0
            or self.penalty_present != 0.0
        )

    @property
    def needs_dry(self) -> bool:
        return self.dry_multiplier > 0.0 and self.penalty_last_n > 1


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


def apply_logit_bias(logits: jax.Array,
                     bias: tuple[tuple[int, float], ...]) -> jax.Array:
    if not bias:
        return logits
    ids = jnp.asarray([t for t, _ in bias], jnp.int32)
    vals = jnp.asarray([b for _, b in bias], jnp.float32)
    return logits.at[ids].add(vals, mode="drop")


def apply_allowed_mask(logits: jax.Array, allowed: jax.Array) -> jax.Array:
    """Keep only `allowed` token ids (int32, may contain -1 padding) —
    the on-device half of grammar-constrained sampling."""
    keep = jnp.zeros(logits.shape[-1] + 1, bool).at[
        jnp.where(allowed >= 0, allowed, logits.shape[-1])].set(True)[:-1]
    return jnp.where(keep, logits, NEG_INF)


def apply_dry(logits: jax.Array, prev_tokens: jax.Array,
              p: SamplerParams) -> jax.Array:
    """DRY repeat suppression (reference llama-sampling.cpp dry sampler).

    For every candidate token z that appeared at ring position i, let m(i)
    be the longest suffix match between the tokens before i and the current
    tail of the context. If m >= allowed_length, z would extend a repeated
    n-gram of length m+1; it is penalized by multiplier * base^(m-allowed).
    O(W^2) elementwise on-device (W = penalty ring size), no host sync.
    """
    W = prev_tokens.shape[0]
    valid = prev_tokens >= 0
    is_breaker = jnp.zeros((W,), bool)
    if p.dry_breakers:
        br = jnp.asarray(p.dry_breakers, jnp.int32)
        is_breaker = jnp.any(prev_tokens[:, None] == br[None, :], axis=-1)
    matchable = valid & ~is_breaker

    # E[t, i] = prev[i-t] == prev[W-t]  (t = 1..W-1 compared lag)
    t = jnp.arange(1, W)[:, None]  # [W-1, 1]
    i = jnp.arange(W)[None, :]  # [1, W]
    src = i - t  # earlier index
    tail = W - t  # context-tail index
    ok = (src >= 0)
    eq = (
        jnp.where(ok, prev_tokens[jnp.clip(src, 0)], -2)
        == prev_tokens[jnp.clip(tail, 0, W - 1)]
    ) & ok & matchable[jnp.clip(src, 0)] & matchable[jnp.clip(tail, 0, W - 1)]
    run = jnp.cumprod(eq.astype(jnp.int32), axis=0)  # AND over t<=k
    m = jnp.sum(run, axis=0)  # [W] longest suffix match before i

    length = jnp.where(valid & (m >= p.dry_allowed_length), m, -1)
    pen = jnp.where(
        length >= 0,
        p.dry_multiplier * jnp.power(
            p.dry_base, (length - p.dry_allowed_length).astype(jnp.float32)),
        0.0,
    )
    idx = jnp.where(valid, prev_tokens, logits.shape[-1])
    per_tok = jnp.zeros(logits.shape[-1] + 1, jnp.float32).at[idx].max(
        pen, mode="drop")[:-1]
    return logits - per_tok


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


# ---------------------------------------------------------------------------
# mirostat (stateful: carries mu across steps)
# ---------------------------------------------------------------------------

def mirostat_init(params: SamplerParams) -> jax.Array:
    return jnp.float32(2.0 * params.mirostat_tau)


def sample_mirostat_v2(logits: jax.Array, key: jax.Array, mu: jax.Array,
                       params: SamplerParams) -> tuple[jax.Array, jax.Array]:
    """Mirostat v2 (llama_sampler_init_mirostat_v2): truncate candidates
    whose surprise exceeds mu, draw, then mu -= eta*(surprise - tau)."""
    logits = logits / jnp.maximum(params.temp, 1e-6)
    logp = jax.nn.log_softmax(logits)
    surprise = -logp / jnp.log(2.0)
    keep = surprise <= mu
    # never empty: always keep the argmax
    keep = keep.at[jnp.argmax(logits)].set(True)
    masked = jnp.where(keep, logits, NEG_INF)
    tok = jax.random.categorical(key, masked).astype(jnp.int32)
    obs = surprise[tok]
    new_mu = mu - params.mirostat_eta * (obs - params.mirostat_tau)
    return tok, new_mu


def sample_mirostat_v1(logits: jax.Array, key: jax.Array, mu: jax.Array,
                       params: SamplerParams,
                       n_probs: int = 100) -> tuple[jax.Array, jax.Array]:
    """Mirostat v1 (llama_sampler_init_mirostat): estimate the Zipf exponent
    s_hat from the top candidates, derive k, then top-k sample + mu update."""
    n_vocab = logits.shape[-1]
    logits = logits / jnp.maximum(params.temp, 1e-6)
    top = jax.lax.top_k(logits, min(n_probs, n_vocab))[0]
    probs = jax.nn.softmax(top)
    i = jnp.arange(min(n_probs, n_vocab) - 1, dtype=jnp.float32)
    t_i = jnp.log((i + 2.0) / (i + 1.0))
    b_i = jnp.log(jnp.maximum(probs[:-1], 1e-30) / jnp.maximum(probs[1:], 1e-30))
    s_hat = jnp.sum(t_i * b_i) / jnp.maximum(jnp.sum(t_i * t_i), 1e-9)
    eps = s_hat - 1.0
    k = jnp.power(
        (eps * jnp.power(2.0, mu)) /
        jnp.maximum(1.0 - jnp.power(jnp.float32(n_vocab), -eps), 1e-9),
        1.0 / jnp.maximum(s_hat, 1e-6),
    )
    k = jnp.clip(k, 1, n_vocab).astype(jnp.int32)
    # dynamic-k truncation with a static top_k bound (rank mask)
    order = jnp.argsort(-logits)
    rank = jnp.zeros(n_vocab, jnp.int32).at[order].set(jnp.arange(n_vocab, dtype=jnp.int32))
    masked = jnp.where(rank < k, logits, NEG_INF)
    tok = jax.random.categorical(key, masked).astype(jnp.int32)
    obs = -jax.nn.log_softmax(logits)[tok] / jnp.log(2.0)
    new_mu = mu - params.mirostat_eta * (obs - params.mirostat_tau)
    return tok, new_mu


def sample(
    logits: jax.Array,  # [vocab] f32
    key: jax.Array,
    params: SamplerParams,
    prev_tokens: jax.Array | None = None,  # [W] int32 ring, -1 padded
    mu: jax.Array | None = None,  # mirostat state (when params.mirostat > 0)
) -> jax.Array | tuple[jax.Array, jax.Array]:
    """Run the chain and draw one token id (int32). With mirostat enabled
    (and `mu` provided) returns (token, new_mu)."""
    logits = apply_logit_bias(logits, params.logit_bias)
    if params.needs_penalties and prev_tokens is not None:
        logits = apply_penalties(logits, prev_tokens, params)
    if params.needs_dry and prev_tokens is not None:
        logits = apply_dry(logits, prev_tokens, params)

    if params.greedy or params.temp <= 0.0:
        tok = jnp.argmax(logits).astype(jnp.int32)
        return (tok, mu) if mu is not None else tok

    if params.mirostat and mu is not None:
        fn = sample_mirostat_v1 if params.mirostat == 1 else sample_mirostat_v2
        return fn(logits, key, mu, params)

    logits = apply_top_n_sigma(logits, params.top_n_sigma)
    logits = apply_top_k(logits, params.top_k)
    logits = apply_typical(logits, params.typical_p)
    logits = apply_top_p(logits, params.top_p)
    logits = apply_min_p(logits, params.min_p)
    k_xtc, k_draw = jax.random.split(key)
    logits = apply_xtc(logits, k_xtc, params)
    logits = apply_temp(logits, params)
    tok = jax.random.categorical(k_draw, logits).astype(jnp.int32)
    return (tok, mu) if mu is not None else tok


def update_prev_tokens(prev: jax.Array, token: jax.Array) -> jax.Array:
    """Shift the penalty ring buffer."""
    return jnp.concatenate([prev[1:], token[None].astype(prev.dtype)])


def apply_infill_host(logits, eog_ids, token_text, top_k: int = 40):
    """Fill-in-middle candidate filter (reference llama_sampler_infill,
    llama-sampling.cpp:2408-2560), host-side over the top-k candidate set
    (the reference runs it after the truncating samplers in the chain):

    1. EOG-dominance switch: if 3*p_eog*n > p_txt, keep only EOG tokens.
    2. Merge candidates whose text is a prefix of another candidate's text
       into the higher-probability one.
    3. Drop non-EOG candidates below p=0.2; if none survive, collapse to a
       single EOG token.

    Returns (ids int32 [m], probs f32 [m]) renormalized, ready to draw.
    """
    import numpy as np

    lg = np.asarray(logits, np.float32)
    k = min(top_k, lg.shape[0])
    ids = np.argpartition(-lg, k - 1)[:k]
    ids = ids[np.argsort(-lg[ids])]
    z = lg[ids] - lg[ids].max()
    p = np.exp(z)
    p /= p.sum()
    is_eog = np.array([int(i) in eog_ids for i in ids])

    p_eog, p_txt = float(p[is_eog].sum()), float(p[~is_eog].sum())
    if 3.0 * p_eog * len(ids) > p_txt:
        ids, p = ids[is_eog], p[is_eog]
        return ids.astype(np.int32), (p / p.sum()).astype(np.float32)

    texts = [token_text(int(i)) if not e else None
             for i, e in zip(ids, is_eog)]
    alive = np.ones(len(ids), bool)
    for i0 in range(len(ids)):
        for i1 in range(len(ids)):
            if i0 == i1 or not alive[i0] or not alive[i1]:
                continue
            t0, t1 = texts[i0], texts[i1]
            if t0 and t1 and len(t0) <= len(t1) and t1.startswith(t0):
                dst, src = (i0, i1) if p[i0] >= p[i1] else (i1, i0)
                p[dst] += p[src]
                p[src] = 0.0
                alive[src] = False

    keep = alive & (is_eog | (p >= 0.2))
    if not (keep & ~is_eog).any():  # no non-EOG survivors -> single EOG
        eid = next(iter(eog_ids)) if eog_ids else int(ids[0])
        return (np.array([eid], np.int32), np.array([1.0], np.float32))
    ids, p = ids[keep], p[keep]
    return ids.astype(np.int32), (p / p.sum()).astype(np.float32)
