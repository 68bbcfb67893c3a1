"""Perplexity KL-divergence mode (reference --kl-divergence) + thread
safety (reference tests/test-thread-safety.cpp)."""

import threading

import numpy as np
import pytest

from omni_tpu.cli.perplexity import kl_divergence, perplexity, save_logits
from omni_tpu.core import GGMLType, GGUFReader
from omni_tpu.models import qwen3
from omni_tpu.runtime import Batch, Context
from omni_tpu.testing import write_tiny_qwen3
from omni_tpu.tokenizer import build_tokenizer


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    d = tmp_path_factory.mktemp("ppl")
    f32 = d / "f32.gguf"
    write_tiny_qwen3(f32, n_layers=2, d_model=128, n_heads=4, n_kv_heads=2,
                     head_dim=32, d_ff=256, n_vocab=300, qtype=GGMLType.F32,
                     byte_tokenizer=True)
    from omni_tpu.cli.quantize import quantize_file

    q4 = d / "q4.gguf"
    quantize_file(str(f32), str(q4), "Q4_K_M")

    def make(path):
        r = GGUFReader(path)
        cfg = qwen3.Qwen3Config.from_gguf(r.kv)
        return (Context(cfg, qwen3.load_params(r), qwen3.forward, qwen3.embed,
                        n_ctx=64), build_tokenizer(r.kv))

    return d, make, f32, q4


TEXT = "the quick brown fox jumps over the lazy dog. " * 40


def test_kl_divergence_f32_vs_quant(setup):
    d, make, f32, q4 = setup
    ctx, tok = make(f32)
    base = d / "base.npz"
    n = save_logits(ctx, tok, TEXT, str(base), n_ctx=64, max_chunks=3)
    assert n == 3

    # self-KL is ~0
    ctx2, _ = make(f32)
    res_self = kl_divergence(ctx2, tok, TEXT, str(base), n_ctx=64, max_chunks=3)
    assert res_self["kl_mean"] < 1e-4
    assert res_self["same_top_rate"] > 0.99

    # quantized model: positive KL, still mostly same top token
    ctxq, _ = make(q4)
    res_q = kl_divergence(ctxq, tok, TEXT, str(base), n_ctx=64, max_chunks=3)
    assert res_q["kl_mean"] > res_self["kl_mean"]
    assert np.isfinite(res_q["kl_max"])


def test_thread_safety_parallel_contexts(setup):
    """Two contexts on shared params decoded from 4 threads concurrently
    must produce the same logits as serial execution (the capability of
    the reference's test-thread-safety on parallel contexts)."""
    _, make, f32, _ = setup
    ctx_ref, tok = make(f32)
    toks = np.asarray(tok.encode("hello world, this is a test"), np.int32)
    ref, _ = ctx_ref.decode(Batch(tokens=toks))
    ref = np.asarray(ref)

    results = [None] * 4
    errors = []

    def worker(i):
        try:
            c, _ = make(f32)
            lg, _ = c.decode(Batch(tokens=toks))
            results[i] = np.asarray(lg)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
    for r in results:
        assert r is not None
        np.testing.assert_allclose(r, ref, rtol=1e-4, atol=1e-4)
