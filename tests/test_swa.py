"""iSWA dual-cache tests (src/llama-kv-cache-iswa.h counterpart)."""

import numpy as np

import jax.numpy as jnp

from omni_tpu.runtime.swa import SWAKVCache


def _write_tokens(cache: SWAKVCache, positions, seq=0):
    """Commit metadata for tokens at `positions` into both pools."""
    for pool_name in ("full", "swa"):
        pool = getattr(cache, pool_name)
        import dataclasses

        for p in positions:
            slots = pool.find_slots(1)
            pool = pool.commit(slots, jnp.asarray([p], jnp.int32),
                               jnp.asarray([seq], jnp.int32))
        cache = dataclasses.replace(cache, **{pool_name: pool})
    return cache


def test_swa_window_mask():
    cache = SWAKVCache.create(1, 1, size=64, n_swa=8, n_kv_heads=2, head_dim=4)
    cache = _write_tokens(cache, range(20))
    q_pos = jnp.asarray([19], jnp.int32)
    q_seq = jnp.asarray([0], jnp.int32)

    full_mask = np.asarray(cache.attn_mask_full(q_pos, q_seq))[0]
    swa_mask = np.asarray(cache.attn_mask_swa(q_pos, q_seq))[0]
    pos_full = np.asarray(cache.full.pos)
    pos_swa = np.asarray(cache.swa.pos)

    # full: everything causal is visible
    assert set(pos_full[full_mask].tolist()) == set(range(20))
    # swa: only the last n_swa positions
    assert set(pos_swa[swa_mask].tolist()) == set(range(12, 20))


def test_swa_prune_reclaims_cells():
    cache = SWAKVCache.create(1, 1, size=64, n_swa=8, n_kv_heads=2, head_dim=4)
    cache = _write_tokens(cache, range(30))
    used_before = int(jnp.sum(cache.swa.seq_mask != 0))
    assert used_before == 30
    cache = cache.prune_swa(jnp.asarray([0], jnp.int32),
                            jnp.asarray([29], jnp.int32))
    used_after = int(jnp.sum(cache.swa.seq_mask != 0))
    assert used_after == 8  # only the window survives
    # the full pool is untouched
    assert int(jnp.sum(cache.full.seq_mask != 0)) == 30


def test_swa_prune_is_per_sequence():
    """A long sequence in a mixed batch must not evict another sequence's
    cells that are still inside that sequence's own window (per-sequence
    pruning of llama_kv_cache_iswa)."""
    cache = SWAKVCache.create(1, 1, size=64, n_swa=8, n_kv_heads=2, head_dim=4)
    cache = _write_tokens(cache, range(30), seq=0)  # long sequence
    cache = _write_tokens(cache, range(5), seq=1)   # short sequence
    cache = cache.prune_swa(jnp.asarray([0, 1], jnp.int32),
                            jnp.asarray([29, 4], jnp.int32))
    pos = np.asarray(cache.swa.pos)
    mask = np.asarray(cache.swa.seq_mask)
    owned0 = (mask & 1) != 0
    owned1 = ((mask >> 1) & 1) != 0
    # seq 0: only its window survives
    assert set(pos[owned0].tolist()) == set(range(22, 30))
    # seq 1: ALL its cells survive (its own window covers 0..4)
    assert set(pos[owned1].tolist()) == set(range(5))
    # a seq not in the batch is never pruned
    cache2 = cache.prune_swa(jnp.asarray([0], jnp.int32),
                             jnp.asarray([29], jnp.int32))
    owned1b = ((np.asarray(cache2.swa.seq_mask) >> 1) & 1) != 0
    assert owned1b.sum() == 5


def test_swa_pool_is_smaller():
    cache = SWAKVCache.create(2, 2, size=4096, n_swa=256, n_kv_heads=2,
                              head_dim=4)
    assert cache.swa.size < cache.full.size  # the iSWA memory win


def test_seq_ops_mirror_both_pools():
    cache = SWAKVCache.create(1, 1, size=32, n_swa=8, n_kv_heads=2, head_dim=4)
    cache = _write_tokens(cache, range(10), seq=0)
    cache = cache.seq_cp(0, 1)
    for pool in (cache.full, cache.swa):
        owned1 = ((np.asarray(pool.seq_mask) >> 1) & 1) != 0
        assert owned1.sum() == 10
    cache = cache.seq_rm(0)
    for pool in (cache.full, cache.swa):
        owned0 = (np.asarray(pool.seq_mask) & 1) != 0
        assert owned0.sum() == 0
    cache = cache.clear()
    assert int(jnp.sum(cache.full.seq_mask)) == 0
