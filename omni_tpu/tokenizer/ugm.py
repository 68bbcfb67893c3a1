"""UGM (unigram / T5) and RWKV tokenizers.

UGM mirrors the reference's llm_tokenizer_ugm (src/llama-vocab.cpp): the
sentencepiece unigram model — whitespace escaped to ▁ (plus the
add_space_prefix convention), then a Viterbi pass choosing the token
segmentation that maximizes the sum of vocab scores; unmatched codepoints
chain through an UNK whose score is (min score - 10) per the reference's
unknown_token_score_penalty, with consecutive UNKs merged. The reference
additionally applies the model's precompiled_charsmap normalization
(xcda blob); that blob-driven normalization is not replicated — inputs
are assumed pre-normalized (documented limitation; the charsmap is a
no-op for ASCII and most already-NFKC text).

RWKV mirrors llm_tokenizer_rwkv: greedy longest-match over raw token
byte strings (the RWKV "world" tokenizer).
"""

from __future__ import annotations

from .vocab import Vocab

UNKNOWN_SCORE_PENALTY = 10.0  # llama-vocab.cpp unknown_token_score_penalty


class UGMEngine:
    def __init__(self, vocab: Vocab):
        if vocab.scores is None:
            raise ValueError("UGM vocab requires tokenizer.ggml.scores")
        self.vocab = vocab
        from .vocab import TYPE_NORMAL, TYPE_USER_DEFINED

        self.t2i = {}
        self.max_len = 1
        for i, t in enumerate(vocab.tokens):
            if vocab.token_types[i] in (TYPE_NORMAL, TYPE_USER_DEFINED):
                self.t2i[t] = i
                self.max_len = max(self.max_len, len(t))
        self.min_score = min(vocab.scores) if vocab.scores else 0.0
        self.unk_score = self.min_score - UNKNOWN_SCORE_PENALTY

    def _normalize(self, text: str) -> str:
        s = text.replace(" ", "▁")
        if self.vocab.add_space_prefix and s and not s.startswith("▁"):
            s = "▁" + s
        return s

    def encode(self, text: str) -> list[int]:
        s = self._normalize(text)
        n = len(s)
        if n == 0:
            return []
        NEG = float("-inf")
        best = [NEG] * (n + 1)
        back: list[tuple[int, int] | None] = [None] * (n + 1)  # (start, id)
        best[0] = 0.0
        scores = self.vocab.scores
        for i in range(n):
            if best[i] == NEG:
                continue
            for j in range(i + 1, min(n, i + self.max_len) + 1):
                tid = self.t2i.get(s[i:j])
                if tid is not None:
                    sc = best[i] + scores[tid]
                    if sc > best[j]:
                        best[j] = sc
                        back[j] = (i, tid)
            # UNK fallback: single codepoint
            sc = best[i] + self.unk_score
            if sc > best[i + 1]:
                best[i + 1] = sc
                back[i + 1] = (i, -1)
        out: list[int] = []
        j = n
        while j > 0:
            i, tid = back[j]
            out.append(tid)
            j = i
        out.reverse()
        # merge consecutive UNKs (reference behavior)
        ids: list[int] = []
        unk = self.vocab.unk_id if self.vocab.unk_id is not None else 0
        for tid in out:
            if tid == -1:
                if ids and ids[-1] == unk:
                    continue
                ids.append(unk)
            else:
                ids.append(tid)
        return ids

    def decode_token(self, token_id: int) -> bytes:
        return (self.vocab.tokens[token_id]
                .replace("▁", " ").encode("utf-8"))


class RWKVEngine:
    """Greedy longest-match over raw byte strings (RWKV world)."""

    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self.t2i: dict[bytes, int] = {}
        self.max_len = 1
        for i, t in enumerate(vocab.tokens):
            b = t.encode("utf-8") if isinstance(t, str) else bytes(t)
            self.t2i[b] = i
            self.max_len = max(self.max_len, len(b))

    def encode(self, text: str) -> list[int]:
        data = text.encode("utf-8")
        out: list[int] = []
        i = 0
        n = len(data)
        while i < n:
            for j in range(min(n, i + self.max_len), i, -1):
                tid = self.t2i.get(data[i:j])
                if tid is not None:
                    out.append(tid)
                    i = j
                    break
            else:
                i += 1  # unmappable byte: skip (no UNK in rwkv world)
        return out

    def decode_token(self, token_id: int) -> bytes:
        t = self.vocab.tokens[token_id]
        return t.encode("utf-8") if isinstance(t, str) else bytes(t)
