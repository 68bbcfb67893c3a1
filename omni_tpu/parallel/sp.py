"""Sequence-parallel attention: the KV pool sharded over devices.

The reference has NO sequence/context parallelism (SURVEY.md §2.8 — long
context is handled by eviction); this is the TPU-native scaling story it
lacks: cells shard over an `sp` mesh axis, every device computes attention
over its shard with a local online-softmax, and the shards merge with one
log-sum-exp combine over ICI (psum/pmax) — a single collective round per
step, the flash-decode math distributed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

NEG_INF = -1e30


def _local_attention(q, k, v, mask, scale, axis):
    """Per-shard partial attention + LSE merge over `axis`.
    q [T,Hq,D] replicated; k/v [Hkv,S_local,D]; mask [T,S_local]."""
    t, hq, d = q.shape
    hkv = k.shape[0]
    g = hq // hkv

    qh = (q.reshape(t, hkv, g, d).transpose(1, 0, 2, 3)
          .reshape(hkv, t * g, d).astype(jnp.float32))
    sc = jnp.einsum("hrd,hsd->hrs", qh, k.astype(jnp.float32),
                    preferred_element_type=jnp.float32) * scale
    mask_r = jnp.repeat(mask, g, axis=0)
    sc = jnp.where(mask_r[None], sc, NEG_INF)

    m_l = jnp.max(sc, axis=-1, keepdims=True)  # [H, R, 1] local max
    p = jnp.exp(sc - m_l)
    p = jnp.where(mask_r[None], p, 0.0)
    l_l = jnp.sum(p, axis=-1, keepdims=True)
    acc_l = jnp.einsum("hrs,hsd->hrd", p, v.astype(jnp.float32),
                       preferred_element_type=jnp.float32)

    # one LSE combine over the sp axis
    m_g = jax.lax.pmax(m_l, axis)
    corr = jnp.exp(m_l - m_g)
    l_g = jax.lax.psum(l_l * corr, axis)
    acc_g = jax.lax.psum(acc_l * corr, axis)
    out = acc_g / jnp.maximum(l_g, 1e-30)
    return (out.reshape(hkv, t, g, d).transpose(1, 0, 2, 3)
            .reshape(t, hq, d))


def sp_attention(q: jax.Array, k: jax.Array, v: jax.Array, mask: jax.Array,
                 mesh: Mesh, axis: str = "sp",
                 scale: float | None = None) -> jax.Array:
    """Attention over a cell pool whose S axis is sharded over `axis`.

    q [T, Hq, D] (replicated), k/v [Hkv, S, D] sharded P(None, axis, None),
    mask [T, S] sharded P(None, axis). Returns [T, Hq, D] replicated.
    """
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)

    fn = shard_map(
        functools.partial(_local_attention, scale=scale, axis=axis),
        mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis, None),
                  P(None, axis)),
        out_specs=P(),
    )
    return fn(q, k, v, mask)


def shard_pool(k: jax.Array, v: jax.Array, mask: jax.Array, mesh: Mesh,
               axis: str = "sp"):
    """Place a pool + mask with S sharded over the mesh axis."""
    kv_ns = NamedSharding(mesh, P(None, axis, None))
    m_ns = NamedSharding(mesh, P(None, axis))
    return (jax.device_put(k, kv_ns), jax.device_put(v, kv_ns),
            jax.device_put(mask, m_ns))


# ---------------------------------------------------------------------------
# ring-attention prefill (context parallelism over the sequence axis)
# ---------------------------------------------------------------------------

def ring_prefill_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                           mesh: Mesh, axis: str = "sp",
                           causal: bool = True) -> jax.Array:
    """Ring attention for LONG-SEQUENCE prefill: q/k/v [T, H, D] with T
    sharded in sequence-order blocks over the `axis` mesh dimension. Each
    device keeps its Q block resident while the K/V blocks rotate around
    the ring over ICI (`ppermute`), accumulating a numerically-stable
    online softmax — peak memory per device is O(T/n · T/n) scores and the
    full-sequence attention never materializes anywhere. The reference has
    no counterpart (its long-context answer is eviction, SURVEY §2.8);
    this is the TPU-native capability it lacks.

    GQA: q [T, Hq, D], k/v [T, Hkv, D] with Hq a multiple of Hkv.
    Returns out [T, Hq, D] sharded like q."""
    n = mesh.shape[axis]
    t, hq, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv
    tl = t // n
    scale = 1.0 / (d ** 0.5)

    def body(q_l, k_l, v_l):
        me = jax.lax.axis_index(axis)
        q_pos = me * tl + jnp.arange(tl)
        # [Hkv, R=Tl*g, D] grouped-query layout
        qh = (q_l.reshape(tl, hkv, g, d).transpose(1, 0, 2, 3)
              .reshape(hkv, tl * g, d).astype(jnp.float32))
        m = jnp.full((hkv, tl * g, 1), NEG_INF, jnp.float32)
        l = jnp.zeros((hkv, tl * g, 1), jnp.float32)
        acc = jnp.zeros((hkv, tl * g, d), jnp.float32)
        kv = (k_l, v_l)
        for step in range(n):
            owner = (me - step) % n  # whose block we hold this step
            k_b, v_b = kv
            sc = jnp.einsum("hrd,hsd->hrs", qh, k_b.transpose(1, 0, 2)
                            .astype(jnp.float32),
                            preferred_element_type=jnp.float32) * scale
            if causal:
                k_pos = owner * tl + jnp.arange(tl)
                ok = k_pos[None, :] <= jnp.repeat(q_pos, g)[:, None]
                sc = jnp.where(ok[None], sc, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(sc, axis=-1, keepdims=True))
            p = jnp.exp(sc - m_new)
            if causal:
                p = jnp.where(ok[None], p, 0.0)
            corr = jnp.exp(m - m_new)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * corr + jnp.einsum(
                "hrs,hsd->hrd", p, v_b.transpose(1, 0, 2).astype(jnp.float32),
                preferred_element_type=jnp.float32)
            m = m_new
            if step < n - 1:  # rotate the KV blocks around the ring
                kv = jax.tree.map(
                    lambda x: jax.lax.ppermute(
                        x, axis, [(i, (i + 1) % n) for i in range(n)]), kv)
        out = acc / jnp.maximum(l, 1e-30)
        return (out.reshape(hkv, tl, g, d).transpose(1, 0, 2, 3)
                .reshape(tl, hq, d).astype(q_l.dtype))

    fn = shard_map(body, mesh=mesh,
                   in_specs=(P(axis), P(axis), P(axis)),
                   out_specs=P(axis), check_rep=False)
    return jax.jit(fn)(q, k, v)
