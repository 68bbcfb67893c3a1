"""Speculative decoding tests.

The key invariant (greedy verification): speculative output is identical
to greedy decoding with the target alone, for ANY draft model — good
drafts just raise the accept rate.
"""

import numpy as np
import pytest

from omni_tpu.core import GGMLType, GGUFReader
from omni_tpu.models import qwen3
from omni_tpu.runtime import Context, SamplerParams
from omni_tpu.runtime.speculative import SpecParams, speculative_generate
from omni_tpu.testing import write_tiny_qwen3


def _make_ctx(path, seed=0, n_layers=2):
    if not path.exists():
        write_tiny_qwen3(path, qtype=GGMLType.Q8_0, d_model=128, d_ff=128,
                         n_heads=4, n_kv_heads=2, head_dim=32, seed=seed,
                         n_layers=n_layers, tied_head=False)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader)
    # one shared ubatch bucket: single-token decode and batched verify then
    # run through the SAME compiled step, so greedy ties cannot flip between
    # the reference path and the speculative path (bf16 summation order)
    return Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=256,
                   sampler=SamplerParams(greedy=True), buckets=(8,))


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    d = tmp_path_factory.mktemp("spec")
    target = lambda: _make_ctx(d / "target.gguf", seed=0)  # noqa: E731
    draft_same = lambda: _make_ctx(d / "target.gguf", seed=0)  # noqa: E731
    draft_other = lambda: _make_ctx(d / "draft.gguf", seed=7)  # noqa: E731
    return target, draft_same, draft_other


PROMPT = np.array([5, 17, 99, 3], np.int32)


def _greedy_reference(make_target, n):
    ctx = make_target()
    return ctx.generate(PROMPT, max_new=n)


def test_identical_draft_accepts_everything(models):
    make_target, make_draft, _ = models
    ref = _greedy_reference(make_target, 12)
    out, stats = speculative_generate(
        make_target(), make_draft(), PROMPT, max_new=12,
        params=SpecParams(n_draft=4, p_min=0.0))
    assert out == ref
    assert stats.n_drafted > 0
    assert stats.accept_rate == 1.0  # same model -> every draft accepted


def test_mismatched_draft_still_exact(models):
    make_target, _, make_draft = models
    ref = _greedy_reference(make_target, 12)
    out, stats = speculative_generate(
        make_target(), make_draft(), PROMPT, max_new=12,
        params=SpecParams(n_draft=4, p_min=0.0))
    assert out == ref  # correctness must not depend on the draft


def test_p_min_gate_limits_drafting(models):
    make_target, make_draft, _ = models
    out, stats = speculative_generate(
        make_target(), make_draft(), PROMPT, max_new=8,
        params=SpecParams(n_draft=8, p_min=1.1))  # gate always fails
    ref = _greedy_reference(make_target, 8)
    assert out == ref
    assert stats.n_drafted == 0


def test_stop_tokens_respected(models):
    make_target, make_draft, _ = models
    ref = _greedy_reference(make_target, 20)
    stop = ref[5]  # force a stop mid-stream
    out, _ = speculative_generate(
        make_target(), make_draft(), PROMPT, max_new=20,
        stop_tokens=(stop,), params=SpecParams(n_draft=4, p_min=0.0))
    ref_stopped = ref[:ref.index(stop)]
    assert out == ref_stopped
