"""Ragged-KV decode: attention reads only the first kv-bucket cells
(reference llama_kv_cache's n_kv high-water, src/llama-kv-cache.cpp) —
logits must be bit-identical to the full-pool path, including under
fragmentation from seq_rm holes, and the host-side kv_high bound must
dominate every occupied cell index."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_tpu.models import qwen3
from omni_tpu.runtime import Batch, Context, SamplerParams
from omni_tpu.testing import write_tiny_qwen3


@pytest.fixture
def tiny(tmp_path):
    from omni_tpu.core import GGUFReader

    path = tmp_path / "m.gguf"
    write_tiny_qwen3(path, n_layers=2, d_model=64, n_heads=4, n_kv_heads=2,
                     d_ff=128, n_vocab=97)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader)
    return cfg, params


def _mk(cfg, params, n_ctx=640, ragged=True):
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=n_ctx,
                  sampler=SamplerParams(greedy=True))
    if ragged:
        ctx.ragged_steps = True  # opt-in: exercise ragged bucketed steps
    else:
        ctx._fwd_takes_kv_limit = False  # force the full-pool path
    return ctx


def test_ragged_matches_full_pool(tiny):
    cfg, params = tiny
    rng = np.random.default_rng(7)
    toks = rng.integers(0, 97, 40).astype(np.int32)
    ctx_r = _mk(cfg, params, ragged=True)
    ctx_f = _mk(cfg, params, ragged=False)
    lr, _ = ctx_r.decode(Batch(tokens=toks))
    lf, _ = ctx_f.decode(Batch(tokens=toks))
    # prefill (40 -> bucket 64) must have used the 256-cell kv bucket
    assert any(k[1] == 512 for k in ctx_r._steps), ctx_r._steps.keys()
    np.testing.assert_array_equal(np.asarray(lr), np.asarray(lf))
    for t in (3, 5, 11):
        lr, _ = ctx_r.decode(Batch(tokens=np.asarray([t], np.int32)))
        lf, _ = ctx_f.decode(Batch(tokens=np.asarray([t], np.int32)))
        np.testing.assert_array_equal(np.asarray(lr), np.asarray(lf))


def test_ragged_with_fragmentation(tiny):
    """seq_rm holes + re-allocation: low-first find_slots refills the holes
    and the kv_high law (high' = max(high, used')) stays an upper bound."""
    cfg, params = tiny
    rng = np.random.default_rng(3)
    ctx_r = _mk(cfg, params, ragged=True)
    ctx_f = _mk(cfg, params, ragged=False)
    toks = rng.integers(0, 97, 30).astype(np.int32)
    for ctx in (ctx_r, ctx_f):
        ctx.decode(Batch(tokens=toks))
        # carve a hole: drop positions [5, 20) of seq 0
        ctx.seq_rm(0, 5, 20)
        ctx.n_past[0] = 5
    rng2 = np.random.default_rng(9)
    cont = rng2.integers(0, 97, 25).astype(np.int32)
    lr, _ = ctx_r.decode(Batch(tokens=cont))
    lf, _ = ctx_f.decode(Batch(tokens=cont))
    np.testing.assert_array_equal(np.asarray(lr), np.asarray(lf))
    # the exact device high-water never exceeds the host bound
    high = int(jax.device_get(jnp.max(jnp.where(
        ctx_r.cache.seq_mask != 0,
        jnp.arange(ctx_r.cache.size) + 1, 0))))
    assert high <= ctx_r.kv_high <= ctx_r.cache.size


def test_kv_high_resyncs_and_resets(tiny):
    cfg, params = tiny
    ctx = _mk(cfg, params)
    ctx.decode(Batch(tokens=np.arange(10, dtype=np.int32) % 97))
    assert ctx.kv_high >= 10
    ctx.seq_rm(0)  # drop everything -> sync recomputes exactly
    assert ctx.kv_high == 0
    ctx.decode(Batch(tokens=np.arange(4, dtype=np.int32) % 97))
    assert 4 <= ctx.kv_high <= 8  # bucket padding stays free


def test_fused_generate_ragged(tiny):
    """The scan path (omni_decode_scan kv_limit) matches the full pool."""
    from omni_tpu.runtime.loop import fused_generate

    cfg, params = tiny
    outs = []
    for ragged in (True, False):
        ctx = _mk(cfg, params, ragged=ragged)
        last = ctx.prefill(np.arange(20, dtype=np.int32) % 97)
        outs.append(fused_generate(ctx, last, seq_id=0, max_new=30,
                                   chunk=8))
    assert outs[0] == outs[1]
