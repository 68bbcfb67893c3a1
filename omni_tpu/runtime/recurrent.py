"""Recurrent (state-space) memory: fixed per-sequence state slots.

Counterpart of the reference's llama_memory_recurrent
(src/llama-memory-recurrent.cpp) used by Mamba/RWKV-family models: instead
of a growing KV, each sequence owns ONE state slot (conv window + SSM
state) that is overwritten in place. Sequence ops mirror the unified-cache
API where they are meaningful: seq_rm resets a state, seq_cp copies slots
(the cheap fork the reference gets by copying the state row), clear resets
all. Hybrid attention+recurrent models (llama_memory_hybrid) compose this
with a KVCache — both are pytrees carried through the same jitted step.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

MAX_RSEQS = 32


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class RecurrentCache:
    """Per-layer, per-sequence recurrent state (static shapes)."""

    conv: jax.Array  # [L, S, d_conv-1, d_inner] rolling conv window
    ssm: jax.Array  # [L, S, d_inner, d_state]
    pos: jax.Array  # [S] int32, -1 = unused
    in_use: jax.Array  # [S] bool

    @staticmethod
    def create(n_layers: int, n_seqs: int, d_conv: int, d_inner: int,
               d_state: int, dtype=jnp.float32,
               conv_channels: int | None = None) -> "RecurrentCache":
        # mamba2 convolves over d_inner + 2*n_group*d_state channels
        # (x|B|C share the conv, build_mamba2_layer) while the SSM state
        # stays [d_inner, d_state]
        return RecurrentCache(
            conv=jnp.zeros((n_layers, n_seqs, d_conv - 1,
                            conv_channels or d_inner), dtype),
            ssm=jnp.zeros((n_layers, n_seqs, d_inner, d_state), dtype),
            pos=jnp.full((n_seqs,), -1, jnp.int32),
            in_use=jnp.zeros((n_seqs,), bool),
        )

    @property
    def n_seqs(self) -> int:
        return self.pos.shape[0]

    def read(self, layer: int, seq_id) -> tuple[jax.Array, jax.Array]:
        return self.conv[layer, seq_id], self.ssm[layer, seq_id]

    def write(self, layer: int, seq_id, conv, ssm) -> "RecurrentCache":
        return dataclasses.replace(
            self,
            conv=self.conv.at[layer, seq_id].set(conv),
            ssm=self.ssm.at[layer, seq_id].set(ssm),
        )

    def advance(self, seq_id, n: int) -> "RecurrentCache":
        pos = jnp.maximum(self.pos[seq_id], -1) + n  # -1 -> n-1? start at n
        return dataclasses.replace(
            self,
            pos=self.pos.at[seq_id].set(jnp.where(self.pos[seq_id] < 0, n,
                                                  self.pos[seq_id] + n)),
            in_use=self.in_use.at[seq_id].set(True),
        )

    # ---- sequence ops (llama_memory_recurrent seq_* semantics) -----------
    def seq_rm(self, seq_id) -> "RecurrentCache":
        """Recurrent states cannot be partially erased (the reference
        returns false for mid-sequence rm); full reset only."""
        return dataclasses.replace(
            self,
            conv=self.conv.at[:, seq_id].set(0.0),
            ssm=self.ssm.at[:, seq_id].set(0.0),
            pos=self.pos.at[seq_id].set(-1),
            in_use=self.in_use.at[seq_id].set(False),
        )

    def seq_cp(self, seq_src, seq_dst) -> "RecurrentCache":
        return dataclasses.replace(
            self,
            conv=self.conv.at[:, seq_dst].set(self.conv[:, seq_src]),
            ssm=self.ssm.at[:, seq_dst].set(self.ssm[:, seq_src]),
            pos=self.pos.at[seq_dst].set(self.pos[seq_src]),
            in_use=self.in_use.at[seq_dst].set(self.in_use[seq_src]),
        )

    def clear(self) -> "RecurrentCache":
        return RecurrentCache.create(
            self.conv.shape[0], self.n_seqs, self.conv.shape[2] + 1,
            self.conv.shape[3], self.ssm.shape[3], self.conv.dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HybridCache:
    """Attention + recurrent memory for hybrid models (Jamba/Granite-4
    style; reference llama_memory_hybrid, src/llama-memory-hybrid.cpp):
    attention layers use the unified KV pool, mamba layers the recurrent
    slots. Sequence ops fan out to both."""

    kv: "KVCache"  # type: ignore[name-defined]  # noqa: F821
    rec: RecurrentCache

    def seq_rm(self, seq_id, p0=-1, p1=-1) -> "HybridCache":
        # recurrent states only support full erase (reference returns
        # false on partial); partial rm applies to the KV side only
        rec = self.rec.seq_rm(seq_id) if (p0 in (-1, 0) and p1 == -1) else self.rec
        return dataclasses.replace(self, kv=self.kv.seq_rm(seq_id, p0, p1),
                                   rec=rec)

    def seq_cp(self, seq_src, seq_dst, p0=-1, p1=-1) -> "HybridCache":
        return dataclasses.replace(
            self, kv=self.kv.seq_cp(seq_src, seq_dst, p0, p1),
            rec=self.rec.seq_cp(seq_src, seq_dst))

    def clear(self) -> "HybridCache":
        return dataclasses.replace(self, kv=self.kv.clear(),
                                   rec=self.rec.clear())
