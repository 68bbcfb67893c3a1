"""Sliding-window attention (iSWA) dual KV cache.

Counterpart of the reference's llama_kv_cache_iswa
(src/llama-kv-cache-iswa.h): models that interleave full-attention layers
with sliding-window layers (Gemma-2/3 style) keep TWO caches — a full one
for the global layers and a small ring for the SWA layers, where cells
older than `n_swa` positions are reclaimed after every step. On TPU both
are the same static cell pool; SWA pruning is a metadata update (seq_rm by
position range) and the window constraint is an extra mask term.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .kv_cache import KVCache


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SWAKVCache:
    """Dual cache: `full` for global layers, `swa` for windowed layers."""

    full: KVCache
    swa: KVCache
    n_swa: int = dataclasses.field(metadata=dict(static=True), default=512)

    @staticmethod
    def create(n_full_layers: int, n_swa_layers: int, size: int, n_swa: int,
               n_kv_heads: int, head_dim: int, dtype=jnp.bfloat16,
               rope_base: float = 10000.0) -> "SWAKVCache":
        """The SWA pool only needs ~n_swa cells per live sequence; callers
        size it `min(size, n_swa + margin)` — the memory win of iSWA."""
        swa_size = min(size, n_swa + 256)
        return SWAKVCache(
            full=KVCache.create(n_full_layers, size, n_kv_heads, head_dim,
                                dtype, rope_base),
            swa=KVCache.create(n_swa_layers, swa_size, n_kv_heads, head_dim,
                               dtype, rope_base),
            n_swa=n_swa,
        )

    # ---- per-step use ------------------------------------------------------
    def attn_mask_full(self, q_pos, q_seq) -> jax.Array:
        return self.full.attn_mask(q_pos, q_seq)

    def attn_mask_swa(self, q_pos, q_seq) -> jax.Array:
        """Causal AND within-window: pos > q_pos - n_swa."""
        base = self.swa.attn_mask(q_pos, q_seq)
        in_window = self.swa.pos[None, :] > (q_pos[:, None] - self.n_swa)
        return base & in_window

    def prune_swa(self, q_seq, q_pos) -> "SWAKVCache":
        """Reclaim SWA cells that fell out of their OWN sequence's window
        (the reference's llama_kv_cache_iswa prunes per sequence after each
        ubatch). Per-sequence cutoffs: a long sequence in a mixed batch must
        not evict another sequence's still-in-window cells. Metadata-only."""
        from .kv_cache import MAX_SEQS

        # per-sequence max query position (-1 for sequences not in the batch)
        seq_max = jnp.full((MAX_SEQS,), -1, jnp.int32).at[
            q_seq.astype(jnp.int32)].max(q_pos.astype(jnp.int32), mode="drop")
        cutoff = seq_max - self.n_swa  # [MAX_SEQS]
        # bit s of a cell clears iff the cell's pos fell out of seq s's window
        pos = self.swa.pos  # [S]
        stale = ((pos[None, :] >= 0) & (seq_max[:, None] >= 0)
                 & (pos[None, :] <= cutoff[:, None]))  # [MAX_SEQS, S]
        bits = (jnp.uint32(1) << jnp.arange(MAX_SEQS, dtype=jnp.uint32))
        stale_bits = jnp.sum(
            jnp.where(stale, bits[:, None], jnp.uint32(0)), axis=0,
            dtype=jnp.uint32)  # distinct bits: sum == bitwise-or
        new_mask = (self.swa.seq_mask & ~stale_bits).astype(jnp.uint32)
        return dataclasses.replace(
            self,
            swa=dataclasses.replace(
                self.swa,
                seq_mask=new_mask,
                pos=jnp.where(new_mask == 0, -1, self.swa.pos),
            ),
        )

    # ---- session ops mirror both pools ------------------------------------
    def seq_rm(self, seq_id, p0=-1, p1=-1) -> "SWAKVCache":
        return dataclasses.replace(self, full=self.full.seq_rm(seq_id, p0, p1),
                                   swa=self.swa.seq_rm(seq_id, p0, p1))

    def seq_cp(self, seq_src, seq_dst, p0=-1, p1=-1) -> "SWAKVCache":
        return dataclasses.replace(
            self, full=self.full.seq_cp(seq_src, seq_dst, p0, p1),
            swa=self.swa.seq_cp(seq_src, seq_dst, p0, p1))

    def seq_add(self, seq_id, p0, p1, delta) -> "SWAKVCache":
        return dataclasses.replace(
            self, full=self.full.seq_add(seq_id, p0, p1, delta),
            swa=self.swa.seq_add(seq_id, p0, p1, delta))

    def clear(self) -> "SWAKVCache":
        return dataclasses.replace(self, full=self.full.clear(),
                                   swa=self.swa.clear())
