"""Lookup decoding / n-gram cache tests (common/ngram-cache + examples/lookup)."""

import numpy as np
import pytest

from omni_tpu.core import GGMLType, GGUFReader
from omni_tpu.models import qwen3
from omni_tpu.runtime import Context, SamplerParams
from omni_tpu.runtime.lookup import NGramCache, lookup_generate
from omni_tpu.testing import write_tiny_qwen3


def test_ngram_cache_draft_and_merge(tmp_path):
    c = NGramCache()
    c.update([1, 2, 3, 1, 2, 3, 1, 2, 3])
    assert c.draft([1, 2], 3) == [3, 1, 2]
    assert c.draft([9, 9], 3) == []  # unseen context

    c2 = NGramCache()
    c2.update([5, 6, 5, 6, 5, 6])
    c.merge(c2)
    assert c.draft([5], 2) == [6, 5]

    p = tmp_path / "ngram.bin"
    c.save(str(p))
    c3 = NGramCache.load(str(p))
    assert c3.draft([1, 2], 3) == [3, 1, 2]


@pytest.fixture(scope="module")
def target(tmp_path_factory):
    path = tmp_path_factory.mktemp("lk") / "m.gguf"
    write_tiny_qwen3(path, qtype=GGMLType.Q8_0, d_model=128, d_ff=128,
                     n_heads=4, n_kv_heads=2, head_dim=32, tied_head=False)

    def make():
        r = GGUFReader(path)
        cfg = qwen3.Qwen3Config.from_gguf(r.kv)
        return Context(cfg, qwen3.load_params(r), qwen3.forward, qwen3.embed,
                       n_ctx=256, sampler=SamplerParams(greedy=True),
                       buckets=(16,))
    return make


PROMPT = np.array([5, 17, 99, 3], np.int32)


def test_lookup_greedy_exact(target):
    ref = target().generate(PROMPT, max_new=16)
    out, stats = lookup_generate(target(), PROMPT, max_new=16, n_draft=4)
    assert out == ref
    # tiny greedy models loop, so the self-priming cache must start hitting
    assert stats.n_drafted > 0


def test_lookup_with_warm_cache(target):
    ref = target().generate(PROMPT, max_new=16)
    warm = NGramCache()
    warm.update(list(PROMPT) + ref)  # prime with the exact continuation
    out, stats = lookup_generate(target(), PROMPT, max_new=16, n_draft=8,
                                 cache=warm)
    assert out == ref
    assert stats.accept_rate > 0.5  # warm cache should accept heavily


def test_lookahead_greedy_exact(target):
    """Lookahead decoding output == plain greedy (the speculation
    invariant of examples/lookahead); multi-membership batch rows +
    per-round KV cleanup must leave the context consistent."""
    from omni_tpu.runtime.lookahead import (LookaheadParams,
                                            lookahead_generate)

    prompt = np.array([5, 9, 5, 9, 5], np.int32)
    ref = target().generate(prompt, max_new=24)

    ctx = target()
    out, stats = lookahead_generate(
        ctx, prompt, max_new=24, params=LookaheadParams(W=4, N=3, G=4))
    assert out == ref, (out, ref)
    assert stats.n_rounds >= 1
    # only seq 0 remains after the run
    import numpy as _np

    mask = _np.asarray(ctx.cache.seq_mask)
    assert ((mask == 0) | (mask == 1)).all()
