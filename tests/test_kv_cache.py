"""Unified KV cache semantics (contract: reference src/llama-kv-cache.cpp
seq_rm/seq_cp/seq_add/seq_div + find_slot)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_tpu.runtime.kv_cache import KVCache


def make_cache(size=16, layers=1, heads=1, dim=8, dtype=jnp.bfloat16):
    return KVCache.create(layers, size, heads, dim, dtype=dtype, rope_base=100.0)


def test_find_slots_and_commit():
    c = make_cache()
    slots = c.find_slots(4)
    np.testing.assert_array_equal(np.asarray(slots), [0, 1, 2, 3])
    c = c.commit(slots, jnp.arange(4), jnp.zeros(4, jnp.int32))
    assert int(c.n_used()) == 4
    # next allocation skips used cells
    slots2 = c.find_slots(2)
    np.testing.assert_array_equal(np.asarray(slots2), [4, 5])
    assert bool(c.can_fit(12)) and not bool(c.can_fit(13))


def test_seq_rm_range_and_reuse():
    c = make_cache()
    slots = c.find_slots(6)
    c = c.commit(slots, jnp.arange(6), jnp.zeros(6, jnp.int32))
    c = c.seq_rm(0, 2, 4)  # drop pos 2,3
    assert int(c.n_used()) == 4
    free_slots = c.find_slots(2)
    np.testing.assert_array_equal(np.asarray(free_slots), [2, 3])


def test_seq_cp_and_keep():
    c = make_cache()
    slots = c.find_slots(3)
    c = c.commit(slots, jnp.arange(3), jnp.zeros(3, jnp.int32))
    c = c.seq_cp(0, 5)
    # both sequences see the cells
    m0 = c.attn_mask(jnp.array([10]), jnp.array([0]))
    m5 = c.attn_mask(jnp.array([10]), jnp.array([5]))
    assert int(m0.sum()) == 3 and int(m5.sum()) == 3
    c = c.seq_keep(5)
    m0 = c.attn_mask(jnp.array([10]), jnp.array([0]))
    m5 = c.attn_mask(jnp.array([10]), jnp.array([5]))
    assert int(m0.sum()) == 0 and int(m5.sum()) == 3
    assert int(c.n_used()) == 3


def test_seq_add_shifts_positions_and_drops_negative():
    c = make_cache()
    slots = c.find_slots(5)
    c = c.commit(slots, jnp.arange(5), jnp.zeros(5, jnp.int32))
    c = c.seq_add(0, 0, 5, -2)  # pos 0,1 drop; 2,3,4 -> 0,1,2
    assert int(c.n_used()) == 3
    assert int(c.seq_pos_min(0)) == 0 and int(c.seq_pos_max(0)) == 2


def test_seq_div_self_extend():
    c = make_cache()
    slots = c.find_slots(8)
    c = c.commit(slots, jnp.arange(8), jnp.zeros(8, jnp.int32))
    c = c.seq_div(0, 0, 8, 4)
    # positions 0..7 -> 0,0,0,0,1,1,1,1
    pos = np.asarray(c.pos)[:8]
    np.testing.assert_array_equal(pos, [0, 0, 0, 0, 1, 1, 1, 1])


def test_rope_shift_matches_fresh_rope():
    """K stored rotated at pos p, then seq_add by delta, must equal K rotated
    at pos p+delta (up to bf16 storage rounding)."""
    from omni_tpu.kernels.rope import apply_rope

    c = make_cache(size=4, dim=8, dtype=jnp.float32)
    k_raw = jnp.asarray(np.random.default_rng(0).standard_normal((2, 1, 8)), jnp.float32)
    pos = jnp.array([3, 7])
    k_rot = apply_rope(k_raw, pos, 100.0)  # [2,1,8]
    slots = c.find_slots(2)
    c = c.write(0, slots, k_rot, k_rot)
    c = c.commit(slots, pos, jnp.zeros(2, jnp.int32))
    c = c.seq_add(0, 0, 100, 5)
    want = apply_rope(k_raw, pos + 5, 100.0)  # [T=2, H=1, D]
    got = np.asarray(c.k[0, :, :2])  # head-major [H=1, S=2, D]
    np.testing.assert_allclose(got, np.asarray(want).transpose(1, 0, 2),
                               rtol=1e-3, atol=1e-4)


def test_attn_mask_causality_and_isolation():
    c = make_cache()
    slots = c.find_slots(4)
    c = c.commit(slots, jnp.array([0, 1, 0, 1]), jnp.array([0, 0, 1, 1]))
    m = c.attn_mask(jnp.array([1, 0]), jnp.array([0, 1]))
    # query 0: seq 0 pos 1 -> sees cells 0 (pos0 seq0), 1 (pos1 seq0)
    np.testing.assert_array_equal(np.asarray(m[0, :4]), [True, True, False, False])
    # query 1: seq 1 pos 0 -> sees cell 2 (pos0 seq1) only
    np.testing.assert_array_equal(np.asarray(m[1, :4]), [False, False, True, False])


def test_quantized_kv_roundtrip():
    c = make_cache(dtype=jnp.int8)
    k = jnp.asarray(np.random.default_rng(1).standard_normal((3, 1, 8)), jnp.float32)
    slots = c.find_slots(3)
    c = c.write(0, slots, k, k * 2)
    kd, vd = c.read_layer(0)  # head-major [Hkv, S, D]
    np.testing.assert_allclose(np.asarray(kd[0, :3], np.float32),
                               np.asarray(k[:, 0]), rtol=0.1, atol=0.05)
    np.testing.assert_allclose(np.asarray(vd[0, :3], np.float32),
                               np.asarray(k[:, 0] * 2), rtol=0.1, atol=0.1)


def test_int4_kv_roundtrip_and_rotation():
    """q4_0-analog packed-int4 KV: write/read round-trip plus the seq_add
    K re-rotation path (dequant -> rope -> requant)."""
    c = make_cache(dtype="q4_0")
    assert c.bits == 4 and c.k.dtype == jnp.uint8
    assert c.k.shape[-1] == 4  # D=8 packed to 4 bytes
    k = jnp.asarray(np.random.default_rng(2).standard_normal((3, 1, 8)),
                    jnp.float32)
    slots = c.find_slots(3)
    c = c.write(0, slots, k, k * 2)
    c = c.commit(slots, jnp.array([0, 1, 2]), jnp.zeros(3, jnp.int32))
    kd, vd = c.read_layer(0)
    np.testing.assert_allclose(np.asarray(kd[0, :3], np.float32),
                               np.asarray(k[:, 0]), rtol=0.25, atol=0.15)
    np.testing.assert_allclose(np.asarray(vd[0, :3], np.float32),
                               np.asarray(k[:, 0] * 2), rtol=0.25, atol=0.3)
    c2 = c.seq_add(0, 0, 100, 3)  # position shift re-rotates K in-place
    assert int(c2.pos[0]) == 3
    kd2, _ = c2.read_layer(0)
    assert np.isfinite(np.asarray(kd2, np.float32)).all()
    # the rotation must preserve K row norms (rope is a rotation)
    n1 = np.linalg.norm(np.asarray(kd[0, :3], np.float32), axis=-1)
    n2 = np.linalg.norm(np.asarray(kd2[0, :3], np.float32), axis=-1)
    np.testing.assert_allclose(n2, n1, rtol=0.2)


def test_cache_in_jit_step():
    """The whole cache round-trips through jit (static rope_base etc.)."""
    c = make_cache()

    @jax.jit
    def step(cache, k):
        slots = cache.find_slots(2)
        cache = cache.commit(slots, jnp.array([0, 1]), jnp.zeros(2, jnp.int32))
        return cache.write(0, slots, k, k)

    k = jnp.ones((2, 1, 8), jnp.bfloat16)
    c = step(c, k)
    assert int(c.n_used()) == 2
