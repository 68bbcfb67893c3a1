"""Fused on-device autoregressive decode loop.

The reference pays ~38 ms/token on a 4090 partly in per-token host↔device
round trips (SURVEY.md §3.3 hot loop #1). On TPU the whole loop — embed,
36 blocks of fused dequant matmuls, KV write, attention, logits, sampling —
runs as ONE jitted lax.scan: zero host syncs per token, cache carried as a
donated scan state. The host only sees the final token array.

Greedy and temperature/top-k sampling run in-graph; the full sampler chain
(runtime.sampler) is also jit-compatible and can be scanned for simplex TTS
cadence, but host-side streaming uses Context.decode for flexibility.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from .kv_cache import KVCache
from .sampler import SamplerParams, sample


@functools.partial(jax.jit, static_argnames=("forward", "embed", "cfg", "n_steps",
                                             "greedy"),
                   donate_argnames=("cache",))
def decode_scan(
    forward: Callable,
    embed: Callable,
    cfg,
    params,
    cache: KVCache,
    first_token: jax.Array,  # [] int32 (already-sampled first token)
    start_pos: jax.Array,  # [] int32
    seq_id: jax.Array,  # [] int32
    key: jax.Array,
    n_steps: int,
    greedy: bool = True,
    temp: float = 0.8,
    top_k: int = 40,
):
    """Run n_steps single-token decode steps fully on device.

    Returns (tokens [n_steps] — token fed at each step, logits of last step,
    hidden [n_steps, d] taps, final cache, final key).
    """
    sp = SamplerParams(greedy=greedy, temp=temp, top_k=top_k)

    # slot allocation: ONE find_slots(n_steps) before the scan (cumsum +
    # scatter costs ~140 us of tiny-kernel overhead), indexed per step.
    # Valid because nothing frees cells mid-scan. Unlike slot0+i counting
    # this is fragmentation-safe: with free cells interleaved below
    # occupied ones the precomputed list still lands on free cells only.
    all_slots = cache.find_slots(n_steps)

    def step(carry, i):
        cache, tok, pos, key = carry
        x = embed(params, tok[None])
        slots = all_slots[i][None]
        logits, hidden, cache = forward(
            params, cfg, x, pos[None], seq_id[None], cache, slots
        )
        key, sub = jax.random.split(key)
        nxt = sample(logits[0], sub, sp)
        return (cache, nxt, pos + 1, key), (tok, nxt, hidden[0])

    (cache, last_tok, _, key), (toks, nxts, hiddens) = jax.lax.scan(
        step, (cache, first_token, start_pos, key),
        jnp.arange(n_steps, dtype=jnp.int32)
    )
    return toks, nxts, hiddens, cache, key
