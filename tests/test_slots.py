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


def test_check_lazy_trigger():
    from omni_tpu.runtime.slots import check_lazy_trigger

    assert check_lazy_trigger("hello", ("<tool_call>",)) is None
    assert check_lazy_trigger("say <tool_call>{", ("<tool_call>",)) == 4
    # earliest of several triggers wins
    assert check_lazy_trigger("b then a", ("a", "then")) == 2
    assert check_lazy_trigger("", ()) is None


def test_lazy_grammar_dormant_then_activates(ctx_factory):
    """A lazy grammar must not constrain sampling before its trigger
    appears, and must constrain from the trigger onward (the reference's
    grammar_triggers / COMMON_GRAMMAR_TRIGGER_TYPE_WORD behavior)."""
    from omni_tpu.grammar import VocabTrie, parse_gbnf

    # token texts: every id maps to a single letter (a..d cycling)
    letters = ["a", "b", "c", "d"]
    token_text = lambda t: letters[t % 4]
    trie = VocabTrie((i, letters[i % 4]) for i in range(127))
    # grammar: after trigger "b", only "a" tokens are legal
    g = parse_gbnf('root ::= "b" "a"*\n')

    ctx = ctx_factory()
    sched = SlotScheduler(ctx, n_slots=1, n_batch=32,
                          vocab_trie=trie, token_text=token_text)
    s = sched.launch(np.array([3, 1, 4], np.int32), max_new=8,
                     sampler=SamplerParams(greedy=True), stop_tokens=(127,),
                     grammar=g, grammar_lazy=True, grammar_triggers=("b",))
    assert not s.grammar_active  # dormant at launch
    sched.run_until_done()
    out_text = "".join(token_text(t) for t in s.out_tokens)
    if "b" in out_text:
        # everything after the first trigger char must satisfy the grammar
        assert set(out_text[out_text.index("b") + 1:]) <= {"a"}
        assert s.grammar_active
    else:  # never triggered: stayed dormant, output was unconstrained
        assert not s.grammar_active
    sched.release(s)
