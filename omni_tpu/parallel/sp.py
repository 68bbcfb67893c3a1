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
