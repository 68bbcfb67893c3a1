"""Continuous-batching slot scheduler tests (parallel-decode contract of
tools/server/server.cpp slots + examples/parallel)."""

import numpy as np
import pytest

from omni_tpu.core import GGMLType, GGUFReader
from omni_tpu.models import qwen3
from omni_tpu.runtime import Context, SamplerParams
from omni_tpu.runtime.slots import SlotScheduler, SlotState
from omni_tpu.testing import write_tiny_qwen3


@pytest.fixture(scope="module")
def ctx_factory(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "llm.gguf"
    write_tiny_qwen3(path, n_layers=2, d_model=64, n_heads=4, n_kv_heads=2,
                     head_dim=16, d_ff=64, n_vocab=128, qtype=GGMLType.F32)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader)

    def make(n_ctx=256):
        return Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=n_ctx)

    return make


def test_parallel_matches_sequential(ctx_factory):
    """Two interleaved greedy generations == the same prompts run alone."""
    gp = SamplerParams(greedy=True)
    prompts = [np.array([3, 1, 4, 1, 5], np.int32),
               np.array([9, 2, 6], np.int32)]

    # sequential reference
    seq_out = []
    for p in prompts:
        ctx = ctx_factory()
        sched = SlotScheduler(ctx, n_slots=1, n_batch=64)
        s = sched.launch(p, max_new=6, sampler=gp)
        sched.run_until_done()
        seq_out.append(list(s.out_tokens))
        sched.release(s)

    # parallel
    ctx = ctx_factory()
    sched = SlotScheduler(ctx, n_slots=2, n_batch=64)
    s0 = sched.launch(prompts[0], max_new=6, sampler=gp)
    s1 = sched.launch(prompts[1], max_new=6, sampler=gp)
    sched.run_until_done()

    assert s0.out_tokens == seq_out[0]
    assert s1.out_tokens == seq_out[1]


def test_slot_reuse_after_release(ctx_factory):
    ctx = ctx_factory()
    sched = SlotScheduler(ctx, n_slots=1, n_batch=32)
    s = sched.launch(np.array([1, 2, 3], np.int32), max_new=3,
                     sampler=SamplerParams(greedy=True))
    sched.run_until_done()
    first = list(s.out_tokens)
    used_before = sched.metrics()["kv_cells_used"]
    sched.release(s)
    assert sched.metrics()["kv_cells_used"] == 0 and used_before > 0

    s2 = sched.launch(np.array([1, 2, 3], np.int32), max_new=3,
                      sampler=SamplerParams(greedy=True))
    assert s2 is not None
    sched.run_until_done()
    assert s2.out_tokens == first  # clean state -> same greedy output


def test_no_free_slot_returns_none(ctx_factory):
    ctx = ctx_factory()
    sched = SlotScheduler(ctx, n_slots=1)
    assert sched.launch(np.array([1], np.int32)) is not None
    assert sched.launch(np.array([2], np.int32)) is None


def test_context_overflow_raises(ctx_factory):
    """Raw Context must hard-error on pool overflow, never alias cells
    (reference: llama_decode fails when find_slot cannot place the batch)."""
    from omni_tpu.runtime import Batch, KVCacheFull

    ctx = ctx_factory(n_ctx=16)
    with pytest.raises(KVCacheFull):
        for i in range(40):
            ctx.decode(Batch(tokens=np.array([i % 7], np.int32)))


def test_slot_context_shift(ctx_factory):
    """A generation exceeding the slot budget context-shifts (n_discard
    semantics, server.cpp:2872/:3580-3590) and keeps generating."""
    ctx = ctx_factory(n_ctx=64)
    sched = SlotScheduler(ctx, n_slots=2)  # budget = 32 positions/slot
    s = sched.launch(np.array([1, 2, 3], np.int32), max_new=60,
                     sampler=SamplerParams(greedy=True))
    sched.run_until_done()
    assert len(s.out_tokens) == 60  # generation completed past the budget
    assert s.n_shifted > 0  # at least one shift happened
    assert s.n_past <= sched.n_ctx_slot  # never exceeded the budget
    # pool never overflowed (KVCacheFull would have raised) and the cell
    # count matches the post-shift position count
    assert ctx.cells_used <= ctx.n_ctx


def test_slot_no_ctx_shift_stops(ctx_factory):
    ctx = ctx_factory(n_ctx=64)
    sched = SlotScheduler(ctx, n_slots=2, ctx_shift=False)
    s = sched.launch(np.array([1, 2, 3], np.int32), max_new=60,
                     sampler=SamplerParams(greedy=True))
    sched.run_until_done()
    assert s.state == SlotState.DONE
    assert len(s.out_tokens) < 60  # stopped at the budget instead


def test_prompt_exceeding_budget_rejected(ctx_factory):
    ctx = ctx_factory(n_ctx=32)
    sched = SlotScheduler(ctx, n_slots=2)  # budget 16
    with pytest.raises(ValueError):
        sched.launch(np.arange(20, dtype=np.int32) % 7)


def test_streaming_callback(ctx_factory):
    ctx = ctx_factory()
    sched = SlotScheduler(ctx, n_slots=1)
    got = []
    sched.launch(np.array([5, 6], np.int32), max_new=4,
                 sampler=SamplerParams(greedy=True),
                 on_token=lambda t, done: got.append((t, done)))
    sched.run_until_done()
    assert len(got) == 4
    assert got[-1][1] is True and all(not d for _, d in got[:-1])
