"""SentencePiece-style (llama) tokenizer.

Counterpart of the reference's llm_tokenizer_spm
(/root/reference/src/llama-vocab.cpp SPM path): greedy highest-score
bigram merging over UTF-8 characters, ▁ as the space symbol, byte-token
fallback (<0xXX>) for unknown characters.
"""

from __future__ import annotations

from .vocab import TYPE_BYTE, Vocab

SPACE = "▁"  # ▁


class SPMEngine:
    def __init__(self, vocab: Vocab):
        self.vocab = vocab
        if vocab.scores is None:
            raise ValueError("SPM vocab without tokenizer.ggml.scores")
        self.byte_ids = {}
        for i, (tok, tt) in enumerate(zip(vocab.tokens, vocab.token_types)):
            if tt == TYPE_BYTE and tok.startswith("<0x") and tok.endswith(">"):
                self.byte_ids[int(tok[3:-1], 16)] = i

    def encode(self, text: str) -> list[int]:
        if not text:
            return []
        if self.vocab.add_space_prefix:
            text = " " + text
        text = text.replace(" ", SPACE)
        parts = list(text)

        # greedy merges: highest-score pair first (llm_tokenizer_spm bigram queue)
        t2i = self.vocab.token_to_id
        scores = self.vocab.scores
        while len(parts) > 1:
            best_score, best_i = None, None
            for i in range(len(parts) - 1):
                cand = t2i.get(parts[i] + parts[i + 1])
                if cand is not None:
                    s = scores[cand]
                    if best_score is None or s > best_score:
                        best_score, best_i = s, i
            if best_i is None:
                break
            parts[best_i : best_i + 2] = [parts[best_i] + parts[best_i + 1]]

        ids: list[int] = []
        for p in parts:
            i = t2i.get(p)
            if i is not None:
                ids.append(i)
            else:  # byte fallback
                for b in p.encode("utf-8"):
                    if b in self.byte_ids:
                        ids.append(self.byte_ids[b])
                    elif self.vocab.unk_id is not None:
                        ids.append(self.vocab.unk_id)
        return ids

    def decode_token(self, token_id: int) -> bytes:
        tok = self.vocab.tokens[token_id]
        if self.vocab.token_types[token_id] == TYPE_BYTE:
            return bytes([int(tok[3:-1], 16)])
        return tok.replace(SPACE, " ").encode("utf-8")
