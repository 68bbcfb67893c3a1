"""Byte-level BPE tokenizer (gpt2 family, incl. the Qwen2 variant used by
the MiniCPM-o LLM).

Counterpart of the reference's llm_tokenizer_bpe
(/root/reference/src/llama-vocab.cpp BPE path): byte→unicode alphabet,
regex pre-tokenization per model family, then lowest-rank-first pair
merging over the merge table from GGUF metadata.
"""

from __future__ import annotations

import functools

import regex

from .vocab import Vocab

# pre-tokenizer regex LISTS by tokenizer.ggml.pre, applied sequentially:
# matches of regex i become atomic pieces, gaps fall through to regex i+1
# (semantics of the reference's unicode_regex_split; regex strings are the
# published tokenizer.json constants, per src/llama-vocab.cpp:284-403).
_GPT2 = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
_QWEN2 = (
    r"(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])"
    r"|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}| ?[^\s\p{L}\p{N}]+[\r\n]*"
    r"|\s*[\r\n]+|\s+(?!\S)|\s+"
)
_LLAMA3 = (
    r"(?:'[sS]|'[tT]|'[rR][eE]|'[vV][eE]|'[mM]|'[lL][lL]|'[dD])"
    r"|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n]*"
    r"|\s*[\r\n]+|\s+(?!\S)|\s+"
)
_DIGIT_THEN_GPT2 = [
    r"\p{N}",
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)",
]
# NOTE: written as \uXXXX escapes — several codepoints (e.g. U+1F7D) are
# destroyed by NFC normalization if kept literal in source
_DEEPSEEK_LLM = [
    "[\r\n]",
    "\\s?[A-Za-z\u00B5\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u01BA\u01BC-\u01BF"
    "\u01C4-\u0293\u0295-\u02AF\u0370-\u0373\u0376\u0377\u037B-\u037D\u037F"
    "\u0386\u0388-\u038A\u038C\u038E-\u03A1\u03A3-\u03F5\u03F7-\u0481"
    "\u048A-\u052F\u0531-\u0556\u10A0-\u10C5\u13A0-\u13F5\u13F8-\u13FD"
    "\u1C90-\u1CBA\u1CBD-\u1CBF\u1D00-\u1D2B\u1D6B-\u1D77\u1D79-\u1D9A"
    "\u1E00-\u1F15\u1F18-\u1F1D\u1F20-\u1F45\u1F48-\u1F4D\u1F50-\u1F57"
    "\u1F59\u1F5B\u1F5D\u1F5F-\u1F7D\u1F80-\u1FB4\u1FB6-\u1FBC\u1FBE"
    "\u1FC2-\u1FC4\u1FC6-\u1FCC\u1FD0-\u1FD3\u1FD6-\u1FDB\u1FE0-\u1FEC"
    "\u1FF2-\u1FF4\u1FF6-\u1FFC\u2102\u2107\u210A-\u2113\u2115\u2119-\u211D"
    "\u2124\u2126\u2128\u212A-\u212D\u212F-\u2134\u2139\u213C-\u213F"
    "\u2145-\u2149\u214E\u2183\u2184\u2C00-\u2C7B\u2C7E-\u2CE4\u2CEB-\u2CEE"
    "\u2CF2\u2CF3\uA640-\uA66D\uA680-\uA69B\uA722-\uA76F\uA771-\uA787"
    "\uA78B-\uA78E\uAB70-\uABBF\uFB00-\uFB06\uFB13-\uFB17\uFF21-\uFF3A"
    "\uFF41-\uFF5A\U00010400-\U0001044F\U000104B0-\U000104D3"
    "\U000104D8-\U000104FB\U00010C80-\U00010CB2\U00010CC0-\U00010CF2"
    "\U000118A0-\U000118DF\U0001E900-\U0001E943]+",
    "\\s?[!-/:-~\uFF01-\uFF0F\uFF1A-\uFF5E\u2018-\u201F\u3000-\u3002]+",
    r"\s+$",
    "[\u4E00-\u9FA5\u0800-\u4E00\uAC00-\uD7FF]+",
    r"\p{N}+",
]
_DEEPSEEK_CODER = [
    "[\r\n]",
    r"\s?\p{L}+",
    r"\s?\p{P}+",
    r"[一-龥ࠀ-一가-퟿]+",
    r"\p{N}",
]
_FALCON = [
    r"[\p{P}\$\+<=>\^~\|`]+",
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)",
    r"[0-9][0-9][0-9]",
]

# python `regex` supports the ORIGINAL tokenizer.json patterns ((?i:..),
# possessive quantifiers) that the reference's C++ engine has to rewrite
# (src/llama-vocab.cpp:283-444) — where both exist we use the original
_DEEPSEEK3 = [
    r"\p{N}{1,3}",
    "[一-龥぀-ゟ゠-ヿ]+",
    "[!\"#$%&'()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~][A-Za-z]+"
    r"|[^\r\n\p{L}\p{P}\p{S}]?[\p{L}\p{M}]+| ?[\p{P}\p{S}]+[\r\n]*"
    r"|\s*[\r\n]+|\s+(?!\S)|\s+",
]
_PORO = [" ?[^(\\s|.,!?…。，、।۔،)]+"]
_TEKKEN = [
    r"[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]*"
    r"[\p{Ll}\p{Lm}\p{Lo}\p{M}]+"
    r"|[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]+"
    r"[\p{Ll}\p{Lm}\p{Lo}\p{M}]*"
    r"|\p{N}| ?[^\s\p{L}\p{N}]+[\r\n/]*|\s*[\r\n]+|\s+(?!\S)|\s+",
]
_CHAMELEON = [
    "<sentinel:[0-9]+>",
    "(IMGIMG)((A|B|C|D|E|F|G|H|I){1,4})Z",
    "([\\t\\n]|    |  )",
    r"\p{N}",
    "[\\p{P}!-/:-@\\[-`{-~]",
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)",
]
_GPT4O = [
    r"[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]*"
    r"[\p{Ll}\p{Lm}\p{Lo}\p{M}]+(?i:'s|'t|'re|'ve|'m|'ll|'d)?"
    r"|[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]+"
    r"[\p{Ll}\p{Lm}\p{Lo}\p{M}]*(?i:'s|'t|'re|'ve|'m|'ll|'d)?"
    r"|\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n/]*|\s*[\r\n]+|\s+(?!\S)|\s+",
]
_SUPERBPE = [r"\p{N}+", r"(?=(\d{3})+(?!\d))"]
_BAILINGMOE = [
    # original tokenizer.json pattern (possessive quantifiers OK here)
    r"'(?i:[sdmt]|ll|ve|re)|[^\r\n\p{L}\p{N}]?+\p{L}+|\p{N}"
    r"| ?[^\s\p{L}\p{N}]++[\r\n]*|\s*[\r\n]|\s+(?!\S)|\s+",
]
_SEED_CODER = [
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}{1}"
    r"| ?[^\s\p{L}\p{N}\r\n]+|\s*[\r\n]+|\s+(?!\S)|\s+",
]
_GROK2 = [
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)|[^\r\n\p{L}\p{N}]?\p{L}+|\p{N}"
    r"| ?[^\s\p{L}\p{N}]+[\r\n]*|\s*[\r\n]+|\s+(?!\S)|\s+",
]

PRE_REGEX: dict[str, list[str]] = {
    "default": [_GPT2],
    "qwen2": [_QWEN2],
    "stablelm2": [_QWEN2],
    "minicpm": [_QWEN2],
    "llama-bpe": [_LLAMA3],
    "llama3": [_LLAMA3],
    "dbrx": [_LLAMA3],
    "smaug-bpe": [_LLAMA3],
    "deepseek-llm": _DEEPSEEK_LLM,
    "deepseek-coder": _DEEPSEEK_CODER,
    "falcon": _FALCON,
    "deepseek-v3": _DEEPSEEK3,
    "hunyuan-dense": _DEEPSEEK3,
    "poro-chat": _PORO,
    "bloom": _PORO,
    "gpt3-finnish": _PORO,
    "viking": _PORO + [r"\p{N}"],
    "tekken": _TEKKEN,
    "chameleon": _CHAMELEON,
    "gpt-4o": _GPT4O,
    "llama4": _GPT4O,
    "superbpe": _SUPERBPE,
    "bailingmoe": _BAILINGMOE,
    "llada-moe": _BAILINGMOE,
    "seed-coder": _SEED_CODER,
    "grok-2": _GROK2,
    # glm4 shares the llama3 pattern (PRE_TYPE_CHATGLM4)
    "glm4": [_LLAMA3],
    "chatglm-bpe": [_LLAMA3],
}
# alias groups (llama-vocab.cpp:1824-1993)
for _n in ("gpt-2", "gpt2", "mpt", "olmo", "jais", "phi-2", "jina-es",
           "jina-de", "gigachat", "jina-v2-es", "jina-v2-de", "a.x-4.0",
           "mellum", "jina-v1-en", "jina-v2-code", "roberta-bpe",
           "exaone4", "trillion", "granite-docling"):
    PRE_REGEX[_n] = [_GPT2]
for _n in ("starcoder", "refact", "command-r", "smollm", "codeshell",
           "exaone", "minerva-7b"):
    PRE_REGEX[_n] = _DIGIT_THEN_GPT2
for _n in ("deepseek-r1-qwen", "megrez", "hunyuan"):
    PRE_REGEX[_n] = [_QWEN2]
for _n in ("falcon3", "falcon-h1", "pixtral", "midm-2.0", "lfm2",
           "llama-v3"):
    PRE_REGEX[_n] = [_LLAMA3]


@functools.lru_cache(maxsize=1)
def bytes_to_unicode() -> dict[int, str]:
    """GPT-2 byte <-> printable-unicode alphabet."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


class BPEEngine:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        if vocab.merges is None:
            raise ValueError("BPE vocab without tokenizer.ggml.merges")
        self.ranks: dict[tuple[str, str], int] = {}
        for i, m in enumerate(vocab.merges):
            a, _, b = m.partition(" ")
            self.ranks[(a, b)] = i
        self.patterns = [regex.compile(rx)
                         for rx in PRE_REGEX.get(vocab.pre, [_GPT2])]
        self.b2u = bytes_to_unicode()
        self.u2b = {c: b for b, c in self.b2u.items()}
        self._cache: dict[str, list[int]] = {}

    # ---- encode ------------------------------------------------------------
    def _pre_tokenize(self, text: str) -> list[str]:
        """Sequential regex splitting (unicode_regex_split semantics):
        every regex re-splits EVERY current segment — earlier matches are
        not atomic (falcon's digit-triple stage splits the number runs its
        own stage-2 regex already matched, src/llama-vocab.cpp falcon
        regex_exprs + unicode.cpp unicode_regex_split)."""
        pieces: list[str] = [text]
        for rx in self.patterns:
            nxt: list[str] = []
            for s in pieces:
                last = 0
                for m in rx.finditer(s):
                    if m.start() > last:
                        nxt.append(s[last:m.start()])
                    if m.group():
                        nxt.append(m.group())
                    last = m.end()
                if last < len(s):
                    nxt.append(s[last:])
            pieces = nxt
        return [s for s in pieces if s]

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for m in self._pre_tokenize(text):
            out.extend(self._encode_word(m))
        return out

    def _encode_word(self, word: str) -> list[int]:
        hit = self._cache.get(word)
        if hit is not None:
            return hit
        u = "".join(self.b2u[b] for b in word.encode("utf-8"))
        parts = [ch for ch in u]
        while len(parts) > 1:
            best_rank, best_i = None, None
            for i in range(len(parts) - 1):
                r = self.ranks.get((parts[i], parts[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]
        t2i = self.vocab.token_to_id
        ids: list[int] = []
        for p in parts:
            i = t2i.get(p)
            if i is not None:
                ids.append(i)
            else:  # resolve unmergeable pieces char-by-char
                for ch in p:
                    j = t2i.get(ch)
                    if j is not None:
                        ids.append(j)
                    elif self.vocab.unk_id is not None:
                        ids.append(self.vocab.unk_id)
        if len(word) < 32:
            self._cache[word] = ids
        return ids

    # ---- decode ------------------------------------------------------------
    def decode_token(self, token_id: int) -> bytes:
        s = self.vocab.tokens[token_id]
        return bytes(self.u2b.get(c, ord("?")) for c in s)
