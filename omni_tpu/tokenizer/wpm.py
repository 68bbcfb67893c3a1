"""WordPiece tokenizer (BERT family).

Mirror of the reference's llm_tokenizer_wpm (src/llama-vocab.cpp:644-756):
NFD normalization, per-codepoint lowercasing, control/replacement-char
removal, whitespace word splits, punctuation / ASCII-symbol / CJK
codepoints isolated as single-char words; each word gets the phantom
"▁" prefix and is consumed by greedy longest-match against the vocab
(max-token-length bounded); a word with any unmatched tail collapses to
UNK."""

from __future__ import annotations

import unicodedata

from .vocab import Vocab


def _is_chinese_char(cp: int) -> bool:
    # src/llama-vocab.cpp:736-752 (incl. its intentionally-hf-compatible
    # 0x2B920 bound)
    return (
        0x4E00 <= cp <= 0x9FFF or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F or 0x2B920 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF or 0x2F800 <= cp <= 0x2FA1F
    )


class WPMEngine:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        self.max_len = max((len(t) for t in vocab.tokens), default=1)

    def _preprocess(self, text: str) -> list[str]:
        words: list[str] = [""]
        for ch in unicodedata.normalize("NFD", text):
            cp = ord(ch)
            if ch.isspace():
                if words[-1]:
                    words.append("")
                continue
            cat = unicodedata.category(ch)
            if cp == 0 or cp == 0xFFFD or cat == "Cc":
                continue
            if cat.startswith("M"):  # strip accent marks post-NFD
                continue
            s = ch.lower()
            is_punct = cat.startswith("P")
            is_ascii_symbol = cp < 0x7F and cat.startswith("S")
            if is_punct or is_ascii_symbol or _is_chinese_char(cp):
                if words[-1]:
                    words.append("")
                words[-1] = s
                words.append("")
            else:
                words[-1] += s
        if not words[-1]:
            words.pop()
        return words

    def encode(self, text: str) -> list[int]:
        t2i = self.vocab.token_to_id
        out: list[int] = []
        for word in self._preprocess(text):
            if not word:
                continue
            w = "▁" + word
            n = len(w)
            start = len(out)
            i = 0
            ok = True
            while i < n:
                match = False
                for j in range(min(n, i + self.max_len + 1), i, -1):
                    tid = t2i.get(w[i:j])
                    if tid is not None:
                        out.append(tid)
                        i = j
                        match = True
                        break
                if not match:
                    del out[start:]
                    ok = False
                    break
            if not ok or len(out) == start:
                if self.vocab.unk_id is not None:
                    out.append(self.vocab.unk_id)
        return out

    def decode_token(self, token_id: int) -> bytes:
        t = self.vocab.tokens[token_id]
        return t.replace("▁", " ").encode("utf-8")
