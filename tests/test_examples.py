"""Every example must run end to end (reference keeps examples/ compiling
and exercised in ci/run.sh; we go further and assert their invariants)."""

import os
import sys

import numpy as np
import pytest

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "examples")
sys.path.insert(0, EXAMPLES)


def test_simple():
    import simple

    out = simple.main([])
    assert len(out) == 16


def test_passkey_self_extend():
    import passkey

    max_pos = passkey.main([])
    assert max_pos < 302


def test_parallel_continuous_batching():
    import parallel

    results = parallel.main(["--n-clients", "5", "--n-slots", "2"])
    assert len(results) == 5


def test_save_load_state():
    import save_load_state

    cont = save_load_state.main([])
    assert len(cont) == 6


def test_batched_bench():
    import batched_bench

    rows = batched_bench.main(["--b", "1", "2", "--pp", "8", "--tg", "4"])
    assert len(rows) == 2
    assert all(r[3] > 0 and r[4] > 0 for r in rows)


def test_eval_callback_trace():
    import eval_callback

    entries = eval_callback.main([])
    names = [e.name for e in entries]
    assert "token_embd" in names and "logits" in names
    assert any(n.startswith("blk.0.attn_probs") for n in names)


def test_gguf_split_merge(tmp_path):
    from omni_tpu.cli.gguf_split import ShardedReader, merge_gguf, split_gguf
    from omni_tpu.core import GGMLType, GGUFReader
    from omni_tpu.testing import write_tiny_qwen3

    src = tmp_path / "m.gguf"
    write_tiny_qwen3(src, qtype=GGMLType.Q8_0, d_model=128, d_ff=128,
                     n_heads=4, n_kv_heads=2, head_dim=32, tied_head=False)
    prefix = str(tmp_path / "shard")
    paths = split_gguf(str(src), prefix, max_tensors=7)
    assert len(paths) > 1

    # sharded reader sees the full directory
    sr = ShardedReader(paths[0])
    orig = GGUFReader(src)
    assert set(sr.tensors) == set(orig.tensors)
    assert sr.kv["general.architecture"] == "qwen3"

    # merge round-trips tensor bytes
    merged = tmp_path / "merged.gguf"
    n = merge_gguf(paths[0], str(merged))
    assert n == len(orig.tensors)
    m = GGUFReader(merged)
    for name, ti in orig.tensors.items():
        np.testing.assert_array_equal(
            np.ascontiguousarray(m.tensors[name].data).view(np.uint8),
            np.ascontiguousarray(ti.data).view(np.uint8), err_msg=name)


def test_finetune_loss_decreases():
    import finetune

    losses = finetune.main(["--steps", "6"])
    assert losses[-1] < losses[0]


def test_embedding():
    import embedding

    vecs = embedding.main([])
    assert vecs.shape[0] == 3
    np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0,
                               rtol=1e-5)


def test_retrieval():
    import retrieval

    order = retrieval.main([])
    assert order[0] == 3  # overlapping chunk ranks first
