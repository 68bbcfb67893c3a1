"""Tensor-parallel inference: shard a Context over a device mesh.

The serving-side counterpart of the reference's multi-GPU row split
(LLAMA_SPLIT_MODE_ROW, SURVEY.md §2.8): weights get megatron TP shardings,
the KV cache shards over KV heads, and the SAME jitted decode step runs
SPMD — GSPMD inserts the all-reduces (wo/down row-parallel products) over
the ICI mesh axis. No model-code changes: sharding is data placement.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..runtime.context import Context
from ..runtime.kv_cache import KVCache
from .mesh import cache_sharding, param_shardings, shard_params


def shard_kv_cache(cache: KVCache, mesh: Mesh) -> KVCache:
    n_tp = mesh.shape.get("tp", 1)
    if cache.k.shape[1] % max(n_tp, 1) != 0:
        # too few KV heads for this tp degree: replicate the cache (e.g.
        # expert-parallel MoE runs where only experts shard)
        kv_ns = NamedSharding(mesh, P())
    else:
        kv_ns = NamedSharding(mesh, cache_sharding(mesh))
    rep = NamedSharding(mesh, P())
    return dataclasses.replace(
        cache,
        k=jax.device_put(cache.k, kv_ns),
        v=jax.device_put(cache.v, kv_ns),
        k_scale=jax.device_put(
            cache.k_scale,
            NamedSharding(mesh, P(None, "tp", None) if kv_ns.spec else P()))
        if cache.k_scale is not None else None,
        v_scale=jax.device_put(
            cache.v_scale,
            NamedSharding(mesh, P(None, "tp", None) if kv_ns.spec else P()))
        if cache.v_scale is not None else None,
        pos=jax.device_put(cache.pos, rep),
        seq_mask=jax.device_put(cache.seq_mask, rep),
    )


def shard_context(ctx: Context, mesh: Mesh) -> Context:
    """In-place: move params + KV onto the mesh with TP shardings and drop
    compiled steps (they re-trace with sharded operands; GSPMD propagates)."""
    ctx.params = shard_params(ctx.params, mesh)
    ctx.cache = shard_kv_cache(ctx.cache, mesh)
    ctx._steps.clear()
    ctx.mesh = mesh
    return ctx
