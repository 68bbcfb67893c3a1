"""Lookahead decoding (draft-model-free speculation).

Counterpart of the reference's examples/lookahead/lookahead.cpp, which
implements lmsys lookahead decoding on the unified KV cache: each round
decodes ONE batch carrying (a) the current token, (b) up to G verification
n-grams drawn from an observed n-gram pool keyed by first token, and
(c) an N-1-level Jacobi lookahead window of width W whose level-0 rows are
shared by several sequences (the packed multi-membership seq encoding,
runtime.kv_cache.seq_bits_of). Greedy acceptance walks the longest
verification n-gram that matches the model's own argmax choices, so the
output is IDENTICAL to plain greedy decoding — lookahead only changes
speed (same invariant as runtime.speculative).

KV bookkeeping per round mirrors the reference exactly
(lookahead.cpp:426-445): drop all batch cells past the accepted prefix
(seq_rm_all), then keep/copy the winning verification branch into seq 0
and re-share history with every sequence.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax.numpy as jnp

from .context import Batch, Context
from .kv_cache import encode_seq_bits


@dataclasses.dataclass
class LookaheadParams:
    W: int = 15  # lookahead window width
    N: int = 5  # n-gram size
    G: int = 15  # max verification n-grams per round


@dataclasses.dataclass
class LookaheadStats:
    n_rounds: int = 0
    n_predict: int = 0
    n_accept: int = 0  # extra tokens accepted from verification n-grams


class _NgramPool:
    """Observed n-gram ring buffers keyed by first token
    (ngram_container, lookahead.cpp:23-37)."""

    def __init__(self, n: int, g: int):
        self.n = n
        self.g = g
        self.pool: dict[int, list[tuple[int, ...]]] = {}

    def get(self, first_tok: int) -> list[tuple[int, ...]]:
        return self.pool.get(first_tok, [])

    def add(self, first_tok: int, gram: tuple[int, ...]) -> None:
        lst = self.pool.setdefault(first_tok, [])
        if gram in lst:  # filter repeats (lookahead.cpp:396-409)
            return
        lst.append(gram)
        if len(lst) > self.g:
            lst.pop(0)


def lookahead_generate(
    ctx: Context,
    prompt_tokens,
    max_new: int = 64,
    stop_tokens: tuple[int, ...] = (),
    params: LookaheadParams = LookaheadParams(),
) -> tuple[list[int], LookaheadStats]:
    """Greedy lookahead generation; returns (tokens, stats). Output is
    greedy-exact; requires a KV pool with room for
    prompt + output + (W*(N-1) + G*N) scratch cells."""
    W, N, G = params.W, params.N, params.G
    stats = LookaheadStats()
    prompt = np.asarray(prompt_tokens, np.int32)

    last = ctx.prefill(prompt, seq_id=0)
    n_past = int(ctx.n_past.get(0, 0))
    # share the prompt with every scratch sequence (lookahead.cpp:98-100)
    for s in range(1, W + G + 1):
        ctx.seq_cp(0, s)

    # Jacobi levels init: deterministic filler (lookahead.cpp:133-141)
    tokens_j = [[(100 + i) % ctx.cfg.n_vocab for i in range(W)]
                for _ in range(N - 1)]
    pool = _NgramPool(N, G)

    tok = int(jnp.argmax(jnp.asarray(last)))
    out: list[int] = []
    if tok in stop_tokens:
        return out, stats
    out.append(tok)  # the first sampled token (lookahead.cpp:158-168)

    while len(out) < max_new:
        stats.n_rounds += 1
        # ---- assemble the round's batch (lookahead.cpp:198-249) ----------
        toks: list[int] = [tok]
        poss: list[int] = [n_past]
        seqs: list[int] = [encode_seq_bits(list(range(W + G + 1)))]
        rows_logits: list[int] = [0]

        grams = pool.get(tok)[:G]
        ngrams_cur = []
        for g, gram in enumerate(grams):
            i_batch = []
            for j, t in enumerate(gram):
                i_batch.append(len(toks))
                toks.append(int(t))
                poss.append(n_past + j + 1)
                seqs.append(W + 1 + g)
            ngrams_cur.append({"tokens": (tok,) + gram, "i_batch": [0] + i_batch,
                               "seq": W + 1 + g, "active": True})

        # level-0 lookahead rows i=1..W-1, shared by seqs i+1..W
        for i in range(1, W):
            toks.append(tokens_j[0][i])
            poss.append(n_past + i)
            seqs.append(encode_seq_bits(list(range(i + 1, W + 1))))
        # levels 1..N-2, one seq each
        lvl_logit_rows = []
        for j in range(1, N - 1):
            for i in range(W):
                if j == N - 2:
                    lvl_logit_rows.append(len(toks))
                toks.append(tokens_j[j][i])
                poss.append(n_past + j + i)
                seqs.append(i + 1)

        logits, _ = ctx.decode(Batch(
            tokens=np.asarray(toks, np.int32),
            pos=np.asarray(poss, np.int32),
            seq_id=np.asarray(seqs, np.int32)))
        argmaxes = np.asarray(jnp.argmax(jnp.asarray(logits), axis=-1))

        # ---- greedy acceptance walk (lookahead.cpp:254-315) --------------
        seq_id_best = 0
        stopped = False
        for v in range(N):
            if v > 0:
                i_batch = 0
                for ng in ngrams_cur:
                    if ng["active"]:
                        i_batch = ng["i_batch"][v]
                        seq_id_best = ng["seq"]
                        stats.n_accept += 1
                        break
                if i_batch == 0:
                    break  # no verification branch survived
            else:
                i_batch = 0
            tok = int(argmaxes[i_batch])  # the model's own greedy choice
            stats.n_predict += 1
            n_past += 1  # the consumed cell (input at v=0, verified at v>0)
            if tok not in stop_tokens:
                out.append(tok)
            if len(out) >= max_new or tok in stop_tokens:
                stopped = True
                break

            # n-gram deactivation (lookahead.cpp:307-317)
            for ng in ngrams_cur:
                if ng["active"]:
                    if v == N - 1 or tok != ng["tokens"][v + 1]:
                        ng["active"] = False

            # Jacobi level shift + refresh (lookahead.cpp:343-369): runs
            # per accepted step; the deepest level is re-seeded from the
            # batch argmaxes at v=0, from the previous level otherwise
            tokens_j_prev = list(tokens_j[0])
            for j in range(N - 2):
                tokens_j[j] = list(tokens_j[j + 1])
            if v == 0:
                tokens_j[N - 2] = [
                    int(argmaxes[lvl_logit_rows[i]]) for i in range(W)]
                # observe new n-grams (lookahead.cpp:371-423)
                for f in range(W):
                    gram = tuple(tokens_j[j][f] for j in range(N - 1))
                    pool.add(tokens_j_prev[f], gram)
            else:
                tokens_j[N - 2] = list(tokens_j[0])

        # ---- KV cleanup (lookahead.cpp:426-445) --------------------------
        ctx.seq_rm_all(n_past, -1)
        if seq_id_best != 0:
            ctx.seq_keep(seq_id_best)
            ctx.seq_cp(seq_id_best, 0)
            ctx.seq_rm(seq_id_best, -1, -1)
            for s in range(1, W + G + 1):
                if s != seq_id_best:
                    ctx.seq_cp(0, s)
            ctx.seq_cp(0, seq_id_best)
        ctx.n_past[0] = n_past
        if stopped:
            break

    # scratch sequences released; only seq 0 remains
    for s in range(1, W + G + 1):
        ctx.seq_rm(s, -1, -1)
    return out, stats
