"""Lookup decoding: n-gram-cache drafting, no draft model.

Counterpart of the reference's common/ngram-cache.cpp + examples/lookup:
an n-gram statistics cache over previously seen text proposes continuations
of the current context tail; the target verifies them in one batched decode
(same rollback contract as speculative decoding). Greedy-exact: output is
identical to target-alone greedy decoding.
"""

from __future__ import annotations

import dataclasses
from collections import Counter, defaultdict

import numpy as np

import jax.numpy as jnp

from .context import Context
from .speculative import SpecStats, _decode_tokens, _rollback

NGRAM_MIN = 1
NGRAM_MAX = 4


class NGramCache:
    """n-gram -> next-token frequency maps for n in [NGRAM_MIN, NGRAM_MAX]."""

    def __init__(self):
        self.maps: dict[int, dict[tuple, Counter]] = {
            n: defaultdict(Counter) for n in range(NGRAM_MIN, NGRAM_MAX + 1)}

    def update(self, tokens) -> None:
        toks = [int(t) for t in tokens]
        for n in self.maps:
            for i in range(len(toks) - n):
                self.maps[n][tuple(toks[i:i + n])][toks[i + n]] += 1

    def draft(self, context_tail, n_draft: int) -> list[int]:
        """Chain most-frequent continuations, longest-n-gram first."""
        tail = [int(t) for t in context_tail]
        out: list[int] = []
        while len(out) < n_draft:
            nxt = None
            for n in range(NGRAM_MAX, NGRAM_MIN - 1, -1):
                if len(tail) < n:
                    continue
                counts = self.maps[n].get(tuple(tail[-n:]))
                if counts:
                    nxt = counts.most_common(1)[0][0]
                    break
            if nxt is None:
                break
            out.append(nxt)
            tail.append(nxt)
        return out

    def merge(self, other: "NGramCache") -> None:
        for n, m in other.maps.items():
            for key, counter in m.items():
                self.maps[n][key].update(counter)

    def save(self, path: str) -> None:
        import pickle

        with open(path, "wb") as f:
            pickle.dump({n: dict(m) for n, m in self.maps.items()}, f)

    @staticmethod
    def load(path: str) -> "NGramCache":
        import pickle

        c = NGramCache()
        with open(path, "rb") as f:
            data = pickle.load(f)
        for n, m in data.items():
            for key, counter in m.items():
                c.maps[n][key] = Counter(counter)
        return c


def lookup_generate(
    target: Context,
    prompt_tokens,
    max_new: int = 64,
    seq_id: int = 0,
    stop_tokens: tuple[int, ...] = (),
    n_draft: int = 8,
    cache: NGramCache | None = None,
) -> tuple[list[int], SpecStats]:
    """Greedy generation accelerated by n-gram lookup drafting; the cache
    self-primes from the prompt and everything generated so far."""
    stats = SpecStats()
    cache = cache or NGramCache()
    prompt = [int(t) for t in np.asarray(prompt_tokens, np.int32)]
    cache.update(prompt)
    last = target.prefill(np.asarray(prompt, np.int32), seq_id)
    tok = int(jnp.argmax(jnp.asarray(last)))

    out: list[int] = []
    while len(out) < max_new and tok not in stop_tokens:
        out.append(tok)
        if len(out) >= max_new:
            break
        stats.n_rounds += 1
        committed = prompt + out
        drafts = cache.draft(committed, n_draft)
        stats.n_drafted += len(drafts)

        logits = _decode_tokens(target, [tok] + drafts, seq_id)
        choices = np.asarray(jnp.argmax(logits, axis=-1))
        n_accept = 0
        for i, d in enumerate(drafts):
            if int(choices[i]) == d:
                n_accept += 1
            else:
                break
        stats.n_accepted += n_accept
        accepted = drafts[:n_accept]
        nxt = int(choices[n_accept])

        stopped = False
        for t in accepted:
            if len(out) >= max_new or t in stop_tokens:
                stopped = True
                break
            out.append(t)
        cache.update(committed[-NGRAM_MAX:] + accepted)
        base = len(prompt) + len(out)
        _rollback(target, seq_id, base)
        if stopped:
            return out, stats
        tok = nxt
    return out, stats
