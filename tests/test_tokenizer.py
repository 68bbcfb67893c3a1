"""Tokenizer golden tests against the reference's committed fixtures
(models/ggml-vocab-*.gguf{,.inp,.out}) — the same strategy as the
reference's test-tokenizer-0 (tests/CMakeLists.txt:114-126)."""

import os

import pytest

from omni_tpu.core import GGUFReader
from omni_tpu.tokenizer import build_tokenizer

REF = "/root/reference/models"


def load_goldens(name):
    inp = open(f"{REF}/ggml-vocab-{name}.gguf.inp", encoding="utf-8").read()
    out = open(f"{REF}/ggml-vocab-{name}.gguf.out", encoding="utf-8").read()
    texts = inp.split("\n__ggml_vocab_test__\n")
    expected = [
        [int(x) for x in line.split()] for line in out.splitlines()
    ]
    return list(zip(texts, expected))


def make_tokenizer(name):
    path = f"{REF}/ggml-vocab-{name}.gguf"
    if not os.path.exists(path):
        pytest.skip(f"{path} missing")
    r = GGUFReader(path)
    return build_tokenizer(r.kv)


@pytest.mark.parametrize("name", ["gpt-2", "llama-spm", "phi-3",
                                  "deepseek-llm", "deepseek-coder",
                                  "starcoder", "mpt", "refact", "falcon",
                                  "bert-bge"])
def test_goldens(name):
    tok = make_tokenizer(name)
    goldens = load_goldens(name)
    assert goldens, name
    n_fail = 0
    for text, want in goldens:
        got = tok.encode(text, add_special=False, parse_special=False)
        if got != want:
            n_fail += 1
            print(f"[{name}] MISMATCH {text!r}\n  got  {got}\n  want {want}")
    assert n_fail == 0, f"{name}: {n_fail}/{len(goldens)} golden mismatches"


@pytest.mark.parametrize("name", ["gpt-2", "llama-spm"])
def test_decode_round_trip(name):
    tok = make_tokenizer(name)
    for text in ["Hello, world!", "  spaces  and\ttabs\n", "héllo 你好 🦙"]:
        ids = tok.encode(text, add_special=False, parse_special=False)
        out = tok.decode(ids)
        # SPM adds a leading space by convention
        assert out.lstrip(" ") == text.lstrip(" ") or out == text, (text, out)


def test_special_token_parsing():
    tok = make_tokenizer("gpt-2")
    text = "hi<|endoftext|>there"
    ids = tok.encode(text, add_special=False, parse_special=True)
    assert tok.vocab.token_to_id["<|endoftext|>"] in ids
    ids2 = tok.encode(text, add_special=False, parse_special=False)
    assert tok.vocab.token_to_id["<|endoftext|>"] not in ids2


def test_ugm_viterbi_synthetic():
    """UGM (unigram/T5): Viterbi picks the max-score segmentation; unknown
    codepoints collapse to merged UNKs (no T5 vocab fixture ships with the
    reference, so this pins the algorithm on a synthetic vocab)."""
    from omni_tpu.tokenizer import build_tokenizer

    kv = {
        "tokenizer.ggml.model": "t5",
        "tokenizer.ggml.tokens": ["<unk>", "▁", "▁he", "llo", "▁hello",
                                  "he", "l", "lo", "o"],
        "tokenizer.ggml.scores": [0.0, -2.0, -3.0, -3.0, -4.0, -3.5, -5.0,
                                  -5.0, -5.0],
        "tokenizer.ggml.token_type": [2] + [1] * 8,
        "tokenizer.ggml.unknown_token_id": 0,
        "tokenizer.ggml.add_space_prefix": True,
        "tokenizer.ggml.add_bos_token": False,
    }
    tok = build_tokenizer(kv)
    # '▁he'+'llo' (-6) beats '▁hello' (-4)? no: -4 > -6 -> single token wins
    assert tok.encode("hello", add_special=False) == [4]
    # unknown chars merge into one UNK
    ids = tok.encode("hello ZZ", add_special=False)
    assert ids[0] == 4 and ids.count(0) == 1
    assert tok.decode([4]) == " hello"


def test_rwkv_greedy_longest_match():
    from omni_tpu.tokenizer import build_tokenizer

    kv = {
        "tokenizer.ggml.model": "rwkv",
        "tokenizer.ggml.tokens": ["a", "b", "ab", "abc", " ", "c"],
        "tokenizer.ggml.token_type": [1] * 6,
        "tokenizer.ggml.add_bos_token": False,
    }
    tok = build_tokenizer(kv)
    assert tok.encode("abc ab a", add_special=False) == [3, 4, 2, 4, 0]
    assert tok.decode([3, 4, 2]) == "abc ab"


def _build_charsmap():
    """Hand-built XCDA blob (llama-vocab.cpp xcda_array_view packing:
    BASE bits 10-30, LEAF bit 8, LCHECK bits 0-7, value nodes bit 31):
    maps 'A' (0x41) -> 'a' and U+00C9 'É' (C3 89) -> 'E'."""
    import struct

    n = 302
    arr = [0] * n
    # root: base 0 (entry 0 all zero)
    # 'A': child at 0^0x41; leaf; value node at 200
    arr[0x41] = ((0x41 ^ 200) << 10) | (1 << 8) | 0x41
    arr[200] = (1 << 31) | 0  # replacement offset 0 -> "a"
    # 'É' C3 89: child at 0xC3 (interior), then W=300 (leaf), value at 301
    W = 300
    X = W ^ 0x89
    arr[0xC3] = ((0xC3 ^ X) << 10) | 0xC3
    arr[W] = ((W ^ 301) << 10) | (1 << 8) | 0x89
    arr[301] = (1 << 31) | 2  # replacement offset 2 -> "E"
    replacements = b"a\x00E\x00"
    return struct.pack("<I", n * 4) + struct.pack(f"<{n}I", *arr) + replacements


def test_ugm_precompiled_charsmap():
    """UGM charsmap normalization (llama-vocab.cpp:993-1090): XCDA
    longest-prefix replacement, UTF-8 passthrough, invalid-byte U+FFFD,
    user-defined token preemption, remove_extra_whitespaces."""
    from omni_tpu.tokenizer import build_tokenizer
    from omni_tpu.tokenizer.ugm import Charsmap

    blob = _build_charsmap()
    cm = Charsmap(blob)
    assert cm.longest_prefix(b"Ax", 0) == (1, 0)
    assert cm.replacement(0) == b"a"
    assert cm.longest_prefix("Éx".encode(), 0) == (2, 2)
    assert cm.replacement(2) == b"E"
    assert cm.longest_prefix(b"Zz", 0)[0] == 0

    kv = {
        "tokenizer.ggml.model": "t5",
        "tokenizer.ggml.tokens": ["<unk>", "▁", "▁a", "E", "a", "z",
                                  "<SPECIAL>"],
        "tokenizer.ggml.scores": [0.0, -1.0, -1.0, -1.0, -1.0, -1.0, -1.0],
        "tokenizer.ggml.token_type": [2, 1, 1, 1, 1, 1, 4],
        "tokenizer.ggml.unknown_token_id": 0,
        "tokenizer.ggml.add_space_prefix": True,
        "tokenizer.ggml.add_bos_token": False,
        "tokenizer.ggml.remove_extra_whitespaces": True,
        "tokenizer.ggml.precompiled_charsmap": list(blob),
    }
    tok = build_tokenizer(kv)
    eng = tok.engine
    # 'A' -> 'a', 'É' -> 'E'; add_space_prefix prepends one ▁
    assert eng._normalize("A") == "▁a"
    assert eng._normalize("É") == "▁E"
    assert eng._normalize("Éa") == "▁Ea"
    # extra whitespace merging: runs of spaces collapse to single ▁
    assert eng._normalize("a   z") == "▁a▁z"
    # invalid UTF-8 byte -> U+FFFD (the reference's \xEF\xBF\xBD fallback)
    bad = b"a\xffz".decode("utf-8", errors="surrogateescape")
    assert "�" in eng._normalize(bad)
    # user-defined token bytes preempt charsmap replacement
    assert "<SPECIAL>" in eng._normalize("<SPECIAL>A")
    # end-to-end: encode goes through the charsmap
    assert tok.encode("A", add_special=False) == [2]  # '▁a'
    assert tok.decode(tok.encode("É", add_special=False)) == " E"


# ---------------------------------------------------------------------------
# round-4 pre-tokenizer breadth: all 62 reference pre names resolve to a
# regex set (llama-vocab.cpp:1824-1993) with the reference split semantics
# ---------------------------------------------------------------------------

def _pre_split(pre: str, text: str):
    from omni_tpu.tokenizer.bpe import BPEEngine
    from omni_tpu.tokenizer.vocab import Vocab

    v = Vocab(tokens=["a"], token_types=[1], scores=None, model="gpt2",
              pre=pre, merges=[], bos_id=None, eos_id=None, unk_id=None,
              pad_id=None, add_bos=False, add_eos=False,
              add_space_prefix=False)
    return BPEEngine(v)._pre_tokenize(text)


def test_all_reference_pre_names_mapped():
    from omni_tpu.tokenizer.bpe import PRE_REGEX

    names = [
        "default", "llama3", "llama-v3", "llama-bpe", "falcon3",
        "falcon-h1", "pixtral", "midm-2.0", "lfm2", "deepseek-llm",
        "deepseek-coder", "deepseek-v3", "falcon", "mpt", "starcoder",
        "gpt-2", "phi-2", "jina-es", "jina-de", "gigachat", "jina-v2-es",
        "jina-v2-de", "a.x-4.0", "mellum", "jina-v1-en", "jina-v2-code",
        "roberta-bpe", "refact", "command-r", "qwen2", "deepseek-r1-qwen",
        "stablelm2", "olmo", "dbrx", "smaug-bpe", "poro-chat", "glm4",
        "chatglm-bpe", "viking", "jais", "tekken", "smollm", "codeshell",
        "bloom", "gpt3-finnish", "exaone", "exaone4", "chameleon",
        "minerva-7b", "megrez", "gpt-4o", "llama4", "superbpe",
        "trillion", "granite-docling", "bailingmoe", "llada-moe",
        "seed-coder", "hunyuan", "hunyuan-dense", "grok-2",
    ]
    missing = [n for n in names if n not in PRE_REGEX]
    assert not missing, missing


def test_pre_split_semantics():
    # tekken (mistral-nemo): case-boundary word split
    assert "Hello" in _pre_split("tekken", "HelloWORLDx")[0:2][0] or \
        _pre_split("tekken", "Hello")[0] == "Hello"
    # gpt-4o: digits grouped in threes
    assert _pre_split("gpt-4o", "12345") == ["123", "45"]
    # qwen2 keeps single digits apart
    assert _pre_split("qwen2", "12") == ["1", "2"]
    # deepseek-v3 digit triples + CJK (Han/kana) run isolation
    assert _pre_split("deepseek-v3", "abc123456 漢字かな") == \
        ["abc", "123", "456", " ", "漢字かな"]
    # poro/bloom: word chunks stop at the literal punctuation set
    assert _pre_split("bloom", "hei maailma!") == ["hei", " maailma", "!"]
    # superbpe: zero-width split points every digit-triple boundary
    assert _pre_split("superbpe", "1234567") == ["1", "234", "567"]
    # bailingmoe possessive-quantifier original pattern; single digits
    assert _pre_split("bailingmoe", "it's 42") == \
        ["it", "'s", " ", "4", "2"]
    # chameleon: the sentinel matched by stage 1 is re-split by the later
    # punctuation stages — same as the reference engine, where sentinel
    # atomicity comes from tokenizer_st_partition, not the regex
    # (llama-vocab.cpp chameleon comment + unicode_regex_split semantics)
    assert _pre_split("chameleon", "ab12")[-2:] == ["1", "2"]
