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


@functools.partial(jax.jit,
                   static_argnames=("forward", "embed", "cfg", "n_steps",
                                    "sp", "end_ids", "listen_id",
                                    "kv_limit"),
                   donate_argnames=("cache",))
def omni_decode_scan(
    forward: Callable,
    embed: Callable,
    cfg,
    params,
    cache: KVCache,
    last_logits: jax.Array,  # [vocab] f32 — logits to sample the 1st token
    start_pos: jax.Array,  # [] int32
    seq_id: jax.Array,  # [] int32
    key: jax.Array,
    prev_tokens: jax.Array,  # [W] int32 penalty ring
    n_steps: int,
    sp: SamplerParams,
    end_ids: tuple[int, ...] = (),
    listen_id: int = -3,
    stop_after: jax.Array | None = None,  # [] int32 dynamic token budget
    done_in: jax.Array | None = None,  # [] bool: chain from the prior scan
    kv_limit: int | None = None,  # static ragged-KV read bound; the caller
    # guarantees occupied cells + this scan's n_steps slots all fit below
):
    """The SERVED omni hot loop, fused: up to n_steps sample→classify→decode
    steps in ONE device dispatch (reference hot loop #1,
    tools/omni/omni.cpp:9138-9469, runs this per token on the host).

    On-device special-token classification freezes the scan at the first
    end/listen token or when `stop_after` new tokens were sampled (the
    duplex chunk cap / max_new budget) — the terminal token is sampled but
    NOT fed into the KV, matching the host-loop semantics (end tokens break
    before eval; cap-breaching tokens are force-replaced, omni.cpp:9317).

    `done_in` chains the frozen flag between scans, which makes SPECULATIVE
    issue safe: the host can dispatch scan k+1 (with done_in = scan k's
    done_out) before fetching scan k's results — if scan k terminated,
    scan k+1 feeds NOTHING (write_mask all false) and its cache is a
    semantic no-op. The axon tunnel costs ~35 ms per host round-trip;
    pipelining the next scan behind the current fetch hides it entirely.

    Returns (packed [2, n_steps] int32 = stacked (toks, fed) — ONE host
    fetch, hiddens [n_steps, d], last_logits, cache, key, prev_tokens,
    pos_out, done_out). pos_out/done_out chain into the next scan's
    start_pos/done_in without a host sync. Entries after the first fed=0
    repeat frozen state."""
    end_arr = (jnp.asarray(end_ids, jnp.int32) if end_ids
               else jnp.full((1,), -2, jnp.int32))
    if stop_after is None:
        stop_after = jnp.int32(n_steps)
    if done_in is None:
        done_in = jnp.bool_(False)
    all_slots = cache.find_slots(n_steps)

    def step(carry, i):
        cache, logits, pos, key, prev, done = carry
        key, sub = jax.random.split(key)
        tok = sample(logits, sub, sp, prev)
        terminal = jnp.any(end_arr == tok) | (tok == listen_id)
        stop_now = done | terminal | (i >= stop_after)
        feed = ~stop_now
        # ring updates for every sampled token while live (host parity:
        # sample_token updates prev_tokens before the end-check break)
        prev = jnp.where(done, prev, jnp.concatenate([prev[1:], tok[None]]))
        x = embed(params, tok[None])
        kw = {"kv_limit": kv_limit} if kv_limit is not None else {}
        new_logits, hidden, cache = forward(
            params, cfg, x, pos[None], seq_id[None], cache,
            all_slots[i][None], feed[None], **kw)
        logits = jnp.where(feed, new_logits[0], logits)
        pos = pos + feed.astype(pos.dtype)
        return (cache, logits, pos, key, prev, stop_now), (tok, feed, hidden[0])

    (cache, logits, pos, key, prev, done), (toks, fed, hiddens) = jax.lax.scan(
        step,
        (cache, last_logits.astype(jnp.float32), start_pos, key, prev_tokens,
         done_in),
        jnp.arange(n_steps, dtype=jnp.int32))
    packed = jnp.stack([toks, fed.astype(jnp.int32)])
    return packed, hiddens, logits, cache, key, prev, pos, done


def fused_generate(ctx, last_logits, seq_id: int, max_new: int,
                   stop_tokens: tuple[int, ...] = (), chunk: int = 32,
                   on_token: Callable | None = None,
                   sampler: SamplerParams | None = None,
                   lock=None, pre_chunk: Callable | None = None) -> list[int]:
    """Host driver for single-stream serving on a Context: chunks of
    `chunk` tokens per device dispatch via omni_decode_scan (vs TWO
    dispatches per token through Context.decode + sample — the axon
    tunnel alone costs ~2 ms per dispatch). Per-request sampler state
    (fresh key + penalty ring, like a slot launch); `lock` (if given) is
    held per chunk only so co-scheduled slots keep stepping. Stops on
    stop_tokens or max_new; stop token excluded from the output
    (Context.generate semantics). on_token(tok, finished) streams."""
    import contextlib

    import numpy as np

    sp = sampler or ctx.sampler
    guard = lock if lock is not None else contextlib.nullcontext()
    key = jax.random.PRNGKey(sp.seed + seq_id)
    prev = jnp.full((max(sp.penalty_last_n, 1),), -1, jnp.int32)
    out: list[int] = []
    pending: list[int] = []  # one-token delay so the last carries finished
    logits = jnp.asarray(last_logits)
    while len(out) < max_new:
        budget = max_new - len(out)
        with guard:
            if pre_chunk is not None:
                pre_chunk()  # e.g. server context shift before the chunk
            free = ctx.cache.size - ctx.cells_used
            if free < chunk:  # the scan pre-allocates `chunk` slots
                from .context import KVCacheFull

                raise KVCacheFull(
                    f"fused_generate: need {chunk} free KV cells, have {free}")
            kvb = ctx.kv_bucket(max(ctx.kv_high, ctx.cells_used) + chunk)
            packed, _, logits, ctx.cache, key, prev, _, _ = omni_decode_scan(
                ctx._forward, ctx._embed, ctx.cfg, ctx.params, ctx.cache,
                logits, jnp.int32(ctx.n_past.get(seq_id, 0)),
                jnp.int32(seq_id), key, prev,
                n_steps=chunk, sp=sp, end_ids=tuple(stop_tokens),
                stop_after=jnp.int32(min(budget, chunk)), kv_limit=kvb)
            packed_np = np.asarray(packed)  # ONE fetch: (toks, fed)
            toks_np = packed_np[0]
            n_fed = int(packed_np[1].sum())
            ctx.n_past[seq_id] = ctx.n_past.get(seq_id, 0) + n_fed
            ctx.cells_used += n_fed
            ctx.kv_high = max(ctx.kv_high, ctx.cells_used)
        # fed tokens are the output; the first un-fed token is either a
        # stop token (excluded, like Context.generate) or the budget stop
        for t in toks_np[:n_fed]:
            out.append(int(t))
            if on_token is not None:
                if pending:
                    on_token(pending.pop(), False)
                pending.append(int(t))
        if n_fed < chunk:
            break
    if on_token is not None and pending:
        on_token(pending.pop(), True)
    return out
