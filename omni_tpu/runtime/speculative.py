"""Speculative decoding: draft-model propose, target verify-in-one-batch.

Counterpart of the reference's common/speculative.cpp (n_draft=16,
p_min=0.75 defaults, common/speculative.h:8-13). TPU-first shape: the
target verifies all K draft tokens with ONE batched decode (K+1 rows
through the MXU instead of K sequential single-token steps), then both
KV caches are rolled back to the accepted prefix via seq_rm — the same
rollback contract the reference uses (llama_memory_seq_rm).

The correctness invariant (greedy verification): output is IDENTICAL to
running the target alone greedily, regardless of draft quality — the
draft only changes speed.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .context import Batch, Context


@dataclasses.dataclass(frozen=True)
class SpecParams:
    n_draft: int = 16  # max tokens proposed per round
    p_min: float = 0.75  # draft stops when its confidence drops below this


@dataclasses.dataclass
class SpecStats:
    n_rounds: int = 0
    n_drafted: int = 0
    n_accepted: int = 0

    @property
    def accept_rate(self) -> float:
        return self.n_accepted / max(self.n_drafted, 1)


def _decode_tokens(ctx: Context, tokens: list[int], seq_id: int):
    logits, _ = ctx.decode(Batch(
        tokens=np.asarray(tokens, np.int32),
        seq_id=np.full(len(tokens), seq_id, np.int32)))
    return jnp.asarray(logits)


def _draft_tokens(draft: Context, committed: list[int], seq_id: int,
                  params: SpecParams) -> list[int]:
    """Greedy draft rollout with confidence gate (p_min). `committed` is the
    full token history; the draft first catches up on any suffix its KV has
    not seen (one batched decode), then extends one token at a time."""
    missing = committed[draft.n_past.get(seq_id, 0):]
    logits = _decode_tokens(draft, missing, seq_id)

    out: list[int] = []
    row = logits[-1]
    for _ in range(params.n_draft):
        probs = jax.nn.softmax(row)
        nxt = int(jnp.argmax(probs))
        if float(probs[nxt]) < params.p_min:
            break
        out.append(nxt)
        row = _decode_tokens(draft, [nxt], seq_id)[0]
    return out


def _rollback(ctx: Context, seq_id: int, keep_upto_pos: int) -> None:
    """Drop KV at positions >= keep_upto_pos and fix the position mark."""
    if ctx.n_past.get(seq_id, 0) > keep_upto_pos:
        ctx.seq_rm(seq_id, keep_upto_pos, -1)
        ctx.n_past[seq_id] = keep_upto_pos


import contextlib


def speculative_generate(
    target: Context,
    draft: Context,
    prompt_tokens,
    max_new: int = 64,
    seq_id: int = 0,
    stop_tokens: tuple[int, ...] = (),
    params: SpecParams = SpecParams(),
    on_tokens=None,  # callback(list[int]) per accepted block (streaming)
    lock=None,  # optional mutex held only per device round, released between
) -> tuple[list[int], SpecStats]:
    """Greedy speculative generation; returns (tokens, stats).

    `lock` (when given) is acquired around each device-touching round and
    released between rounds, so a co-scheduled SlotScheduler keeps decoding
    its own slots while a speculative request runs (the reference server
    interleaves speculative slots the same way)."""
    stats = SpecStats()
    guard = lock if lock is not None else contextlib.nullcontext()
    prompt = [int(t) for t in np.asarray(prompt_tokens, np.int32)]
    with guard:
        last_target = target.prefill(np.asarray(prompt, np.int32), seq_id)
        tok = int(jnp.argmax(jnp.asarray(last_target)))

    out: list[int] = []
    while len(out) < max_new and tok not in stop_tokens:
        out.append(tok)
        if on_tokens:
            on_tokens([tok])
        if len(out) >= max_new:
            break
        stats.n_rounds += 1
        committed = prompt + out  # history incl. `tok` (not yet in target KV)

        with guard:
            drafts = _draft_tokens(draft, committed, seq_id, params)
            stats.n_drafted += len(drafts)

            # one batched target decode over [tok, d1..dK]
            logits = _decode_tokens(target, [tok] + drafts, seq_id)
            choices = np.asarray(jnp.argmax(logits, axis=-1))

        # longest accepted prefix: drafts[i] must equal the target's greedy
        # choice after block[:i+1]
        n_accept = 0
        for i, d in enumerate(drafts):
            if int(choices[i]) == d:
                n_accept += 1
            else:
                break
        stats.n_accepted += n_accept

        accepted = drafts[:n_accept]
        nxt = int(choices[n_accept])  # the target's token after the prefix

        stopped = False
        emitted: list[int] = []
        for t in accepted:
            # match generate(): the stop token itself is not emitted
            if len(out) >= max_new or t in stop_tokens:
                stopped = True
                break
            out.append(t)
            emitted.append(t)
        if emitted and on_tokens:
            on_tokens(emitted)

        # keep committed history only: positions [0, len(prompt+out))
        base = len(prompt) + len(out)
        with guard:
            _rollback(target, seq_id, base)
            _rollback(draft, seq_id, base)
        if stopped:
            return out, stats
        tok = nxt
    return out, stats
