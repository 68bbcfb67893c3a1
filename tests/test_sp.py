"""Sequence-parallel attention tests (the SP capability of SURVEY §2.8,
validated on the virtual 8-device CPU mesh)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from omni_tpu.kernels.attention import cache_attention
from omni_tpu.parallel.sp import shard_pool, sp_attention

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs multi-device mesh")


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("sp",))


def _mk(t=2, hq=8, hkv=2, d=64, s=512, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((t, hq, d)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((hkv, s, d)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((hkv, s, d)) * 0.3, jnp.float32)
    mask = rng.random((t, s)) < 0.6
    mask[:, 0] = True
    return q, k, v, jnp.asarray(mask)


@pytest.mark.parametrize("n_sp", [2, 4])
def test_sp_matches_single_device(n_sp):
    q, k, v, mask = _mk()
    ref = np.asarray(cache_attention(q, k, v, mask))

    mesh = _mesh(n_sp)
    ks, vs, ms = shard_pool(k, v, mask, mesh)
    got = np.asarray(sp_attention(q, ks, vs, ms, mesh))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_sp_fully_masked_shard():
    """A device whose entire shard is masked must not poison the merge."""
    q, k, v, mask = _mk(s=256)
    mask = np.array(mask)  # writable copy
    mask[:, 128:] = False  # the second half (whole shards on 4-way) is dead
    mask = jnp.asarray(mask)
    ref = np.asarray(cache_attention(q, k, v, mask))

    mesh = _mesh(4)
    ks, vs, ms = shard_pool(k, v, mask, mesh)
    got = np.asarray(sp_attention(q, ks, vs, ms, mesh))
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_sp_under_jit():
    q, k, v, mask = _mk(s=256)
    mesh = _mesh(4)
    ks, vs, ms = shard_pool(k, v, mask, mesh)

    @jax.jit
    def step(q, k, v, m):
        return sp_attention(q, k, v, m, mesh)

    got = np.asarray(step(q, ks, vs, ms))
    ref = np.asarray(cache_attention(q, k, v, mask))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_ring_prefill_attention_matches_dense():
    """Ring attention over 4 sequence shards == dense causal attention
    (GQA), with no device ever holding the full score matrix."""
    import jax
    from jax.sharding import Mesh
    from omni_tpu.parallel.sp import ring_prefill_attention

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    rng = np.random.default_rng(0)
    t, hq, hkv, d = 32, 8, 4, 16
    q = jnp.asarray(rng.standard_normal((t, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((t, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((t, hkv, d)), jnp.float32)

    mesh = Mesh(np.asarray(jax.devices()[:4]), ("sp",))
    got = np.asarray(ring_prefill_attention(q, k, v, mesh))

    # dense reference
    g = hq // hkv
    qg = np.asarray(q).reshape(t, hkv, g, d)
    sc = np.einsum("thgd,shd->hgts", qg, np.asarray(k)) / np.sqrt(d)
    causal = np.tril(np.ones((t, t), bool))
    sc = np.where(causal[None, None], sc, -1e30)
    p = np.exp(sc - sc.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("hgts,shd->thgd", p, np.asarray(v)).reshape(t, hq, d)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
