"""GGUF container tests: writer→reader round-trip plus parsing real GGUF
files produced by the reference toolchain (vocab-only fixtures)."""

import glob
import os

import numpy as np
import pytest

from omni_tpu.core import GGMLType, GGUFReader, GGUFWriter, quants

REF_VOCABS = sorted(glob.glob("/root/reference/models/ggml-vocab-*.gguf"))


def test_round_trip(tmp_path, rng):
    path = tmp_path / "t.gguf"
    w = GGUFWriter(path)
    w.add_kv("general.architecture", "qwen3")
    w.add_kv("qwen3.block_count", 36)
    w.add_kv("qwen3.rope.freq_base", 1000000.0)
    w.add_kv("test.negative", -7)
    w.add_kv("test.bool", True)
    w.add_kv("test.big", 2**40)
    w.add_kv("tokenizer.ggml.tokens", ["a", "b", "<|endoftext|>"])
    w.add_kv("test.int_array", [1, 2, 3])

    x32 = rng.standard_normal((8, 64), dtype=np.float32)
    x16 = rng.standard_normal((4, 32), dtype=np.float32).astype(np.float16)
    xq = rng.standard_normal((4, 256), dtype=np.float32)
    qblocks = quants.quantize(xq, GGMLType.Q4_K)
    w.add_tensor("dense.weight", x32)
    w.add_tensor("half.weight", x16)
    w.add_tensor("quant.weight", qblocks, GGMLType.Q4_K, logical_shape=xq.shape)
    w.write()

    with GGUFReader(path) as r:
        assert r.kv["general.architecture"] == "qwen3"
        assert r.kv["qwen3.block_count"] == 36
        assert r.kv["qwen3.rope.freq_base"] == pytest.approx(1000000.0)
        assert r.kv["test.negative"] == -7
        assert r.kv["test.bool"] is True
        assert r.kv["test.big"] == 2**40
        assert r.kv["tokenizer.ggml.tokens"] == ["a", "b", "<|endoftext|>"]
        assert list(r.kv["test.int_array"]) == [1, 2, 3]

        np.testing.assert_array_equal(r.tensors["dense.weight"].data, x32)
        np.testing.assert_array_equal(r.tensors["half.weight"].data, x16)
        ti = r.tensors["quant.weight"]
        assert ti.ggml_type == GGMLType.Q4_K
        assert ti.shape == (4, 256)
        got = quants.dequantize(ti.data, ti.ggml_type, ti.shape)
        want = quants.dequantize(qblocks, GGMLType.Q4_K, xq.shape)
        np.testing.assert_array_equal(got, want)


@pytest.mark.skipif(not REF_VOCABS, reason="reference vocab fixtures unavailable")
def test_parse_reference_vocab_gguf():
    """Read GGUF files written by the reference's own writer."""
    path = REF_VOCABS[0]
    with GGUFReader(path) as r:
        assert "tokenizer.ggml.tokens" in r.kv
        toks = r.kv["tokenizer.ggml.tokens"]
        assert len(toks) > 1000
        assert isinstance(toks[0], str)
        assert "general.architecture" in r.kv


@pytest.mark.skipif(len(REF_VOCABS) < 2, reason="reference vocab fixtures unavailable")
def test_parse_all_reference_vocabs():
    for path in REF_VOCABS:
        with GGUFReader(path) as r:
            assert len(r.kv["tokenizer.ggml.tokens"]) > 100, path
