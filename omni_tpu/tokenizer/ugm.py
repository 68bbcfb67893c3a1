"""UGM (unigram / T5) and RWKV tokenizers.

UGM mirrors the reference's llm_tokenizer_ugm (src/llama-vocab.cpp): the
model's precompiled_charsmap normalization (an XOR-compressed double
array — XCDA — of byte-sequence replacements, walked longest-prefix per
llama-vocab.cpp:993-1090), whitespace escaped to ▁ (plus the
add_space_prefix / remove_extra_whitespaces conventions,
llama-vocab.cpp:937-980), then a Viterbi pass choosing the token
segmentation that maximizes the sum of vocab scores; unmatched codepoints
chain through an UNK whose score is (min score - 10) per the reference's
unknown_token_score_penalty, with consecutive UNKs merged.

RWKV mirrors llm_tokenizer_rwkv: greedy longest-match over raw token
byte strings (the RWKV "world" tokenizer).
"""

from __future__ import annotations

import struct

from .vocab import Vocab

UNKNOWN_SCORE_PENALTY = 10.0  # llama-vocab.cpp unknown_token_score_penalty


class Charsmap:
    """Precompiled sentencepiece normalization blob: 4-byte LE length,
    XCDA uint32 array (BASE bits 10-30 — ×256 when bit 9 is set — LEAF
    bit 8, LCHECK bits 0-7), then NUL-terminated replacement strings
    (llama-vocab.cpp:761-782 + xcda_array_view)."""

    def __init__(self, blob: bytes):
        if len(blob) < 4:
            raise ValueError("charsmap blob too short")
        (xcda_size,) = struct.unpack_from("<I", blob, 0)
        if xcda_size + 4 >= len(blob):
            raise ValueError("charsmap xcda size out of bounds")
        self.xcda = struct.unpack_from(f"<{xcda_size // 4}I", blob, 4)
        self.replacements = blob[4 + xcda_size:]

    def _base(self, node: int) -> int:
        p = self.xcda[node]
        return (p >> 10) << ((p & (1 << 9)) >> 6)

    def longest_prefix(self, data: bytes, offset: int) -> tuple[int, int]:
        """-> (match_len, replacement_offset); match_len 0 = no match."""
        xcda, n = self.xcda, len(self.xcda)
        best_len, best_off = 0, 0
        node = self._base(0)
        for i in range(offset, len(data)):
            c = data[i]
            if c == 0:
                break
            node ^= c
            if node >= n:
                break
            p = xcda[node]
            if (p & ((1 << 31) | 0xFF)) != c:  # LCHECK mismatch: not a child
                break
            is_leaf = (p >> 8) & 1
            node ^= (p >> 10) << ((p & (1 << 9)) >> 6)
            if is_leaf:
                if node >= n:
                    break
                best_len = i - offset + 1
                best_off = xcda[node] & ((1 << 31) - 1)
        return best_len, best_off

    def replacement(self, off: int) -> bytes:
        if off >= len(self.replacements):
            raise ValueError("charsmap replacement offset out of bounds")
        end = self.replacements.index(b"\x00", off)
        return self.replacements[off:end]


def _utf8_len(b0: int) -> int:
    """Length of a UTF-8 sequence from its first byte; 0 if invalid lead."""
    if b0 < 0x80:
        return 1
    if 0xC2 <= b0 <= 0xDF:
        return 2
    if 0xE0 <= b0 <= 0xEF:
        return 3
    if 0xF0 <= b0 <= 0xF4:
        return 4
    return 0


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
        self.charsmap = (Charsmap(vocab.charsmap) if vocab.charsmap
                         else None)
        # user-defined tokens preempt charsmap normalization
        # (llama-vocab.cpp:1036-1041 user_defined_token_matcher)
        self.user_defined = sorted(
            (t.encode("utf-8") for i, t in enumerate(vocab.tokens)
             if vocab.token_types[i] == TYPE_USER_DEFINED),
            key=len, reverse=True)

    def _normalize_prefix(self, data: bytes, off: int) -> tuple[bytes, int]:
        """-> (normalized bytes, consumed input bytes)
        (llama-vocab.cpp:1029-1090 normalize_prefix)."""
        for ud in self.user_defined:
            if data.startswith(ud, off):
                return ud, len(ud)
        if self.charsmap is not None:
            mlen, moff = self.charsmap.longest_prefix(data, off)
            if mlen > 0:
                return self.charsmap.replacement(moff), mlen
        # valid UTF-8 sequence passes through; invalid bytes -> U+FFFD
        ln = _utf8_len(data[off])
        if ln and off + ln <= len(data) and all(
                0x80 <= b <= 0xBF for b in data[off + 1:off + ln]):
            return data[off:off + ln], ln
        return b"\xef\xbf\xbd", 1

    def _normalize(self, text: str) -> str:
        """Charsmap + whitespace-convention pass
        (llama-vocab.cpp:937-980 normalize)."""
        # surrogateescape round-trips invalid bytes smuggled through str
        # (the reference works on raw bytes; U+FFFD is applied below)
        data = text.encode("utf-8", errors="surrogateescape")
        space = "▁".encode("utf-8")
        prepend = self.vocab.add_space_prefix
        merge = self.vocab.remove_extra_whitespaces
        out = bytearray()
        is_space_prepended = False
        processing_non_ws = False
        i = 0
        while i < len(data):
            rep, consumed = self._normalize_prefix(data, i)
            for c in rep:
                if c != 0x20:
                    if not processing_non_ws:
                        processing_non_ws = True
                        if (prepend and not is_space_prepended) or merge:
                            out += space
                            is_space_prepended = True
                    out.append(c)
                else:
                    processing_non_ws = False
                    if not merge:
                        out += space
            i += consumed
        return out.decode("utf-8", errors="replace")

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
