"""Unified KV cache with llama.cpp session semantics on static TPU shapes.

Re-design of the reference's unified cache
(/root/reference/src/llama-kv-cache.{h,cpp}: ring-buffer cells with per-seq
metadata, find_slot, seq_rm/seq_cp/seq_add/seq_div — see SURVEY.md §2.2):

- Fixed pool of `size` cells per layer; every array is static-shape so the
  whole thing lives inside jit. A cell is (pos:int32, seq_mask:uint32)
  where bit s of seq_mask = "cell belongs to sequence s" (multi-membership
  exactly like the reference's per-cell seq-id set; max 32 sequences).
- find_slot = rank-of-free-cells via cumsum + scatter (no host sync).
- seq_add/seq_div mutate *positions*; cached K is stored rotated, so these
  apply an incremental RoPE rotation by the delta (the reference's K-shift
  graph, src/llama-kv-cache.cpp build_rope_shift) — semantics the omni
  sliding windows (tools/omni/omni.cpp:686-820, 3107-3405) and self-extend
  (examples/passkey/passkey.cpp:133-139) depend on.

Attention reads the whole pool with a per-query mask (seq bit ∧ causal pos);
masked cells contribute -inf scores. K/V can optionally be stored int8 or
packed int4 with per-(cell, head) scales — the TPU analog of the reference's
quantized KV cache types (include/llama.h:330; q8_0 and q4_0 are the
CLI-exposed -ctk/-ctv choices). int4 packs byte column d with the nibbles
of logical columns d (low) and d + D/2 (high), so both the XLA dequant and
the Pallas flash kernel unpack with plain shifts — no lane interleave.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..kernels.rope import apply_rope

MAX_SEQS = 32


def seq_bits_of(seq: jax.Array) -> jax.Array:
    """int32 seq encoding -> uint32 membership bitset.

    seq >= 0: a plain sequence id (bit 1 << seq). seq < 0: a PACKED
    multi-membership bitmask, bits = -seq — how a batch row joins several
    sequences at once (the contract of llama_batch.n_seq_id > 1,
    include/llama.h:230; lookahead decoding's shared lookahead rows are
    the main user). Encode with `encode_seq_bits`."""
    return jnp.where(seq >= 0,
                     jnp.uint32(1) << jnp.uint32(jnp.maximum(seq, 0)),
                     (-seq).astype(jnp.uint32))


def primary_seq_bit(seq: jax.Array) -> jax.Array:
    """The attention sequence of a batch row = lowest set membership bit
    (llama.cpp attends by the row's first seq id)."""
    bits = seq_bits_of(seq)
    return bits & (~bits + jnp.uint32(1))


def encode_seq_bits(seq_ids) -> int:
    """Host helper: list of seq ids -> the int32 batch encoding."""
    bits = 0
    for s in seq_ids:
        bits |= 1 << int(s)
    if len(seq_ids) == 1:
        return int(seq_ids[0])
    return -bits


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Per-model cache state (all layers)."""

    k: jax.Array  # [L, Hkv, S, D] bf16 or int8 (head-major: the flash
    #   decode kernel tiles (head, cell-range) without a transpose)
    v: jax.Array  # [L, Hkv, S, D]
    k_scale: jax.Array | None  # [L, Hkv, S] f32, set when quantized
    v_scale: jax.Array | None
    pos: jax.Array  # [S] int32, -1 = unused
    seq_mask: jax.Array  # [S] uint32 bitset of owning sequences
    rope_base: float = dataclasses.field(metadata=dict(static=True), default=10000.0)
    rope_neox: bool = dataclasses.field(metadata=dict(static=True), default=True)
    # MLA (deepseek2): keys are [roped rope_dim | compressed latent] and
    # only the leading rope_dim columns are position-dependent; 0 = the
    # whole key is roped (standard attention)
    rope_dim: int = dataclasses.field(metadata=dict(static=True), default=0)
    # quantized-KV bit width: 16 (bf16), 8 (int8), 4 (packed nibbles —
    # k/v arrays are uint8 [L, Hkv, S, D/2])
    bits: int = dataclasses.field(metadata=dict(static=True), default=16)

    # ---- construction ----------------------------------------------------
    @staticmethod
    def create(n_layers: int, size: int, n_kv_heads: int, head_dim: int,
               dtype=jnp.bfloat16, rope_base: float = 10000.0,
               rope_neox: bool = True, v_head_dim: int | None = None,
               rope_dim: int = 0) -> "KVCache":
        if dtype in ("q4_0", "int4"):
            bits, dtype = 4, jnp.uint8
        elif dtype == jnp.int8 or dtype == "q8_0":
            bits, dtype = 8, jnp.int8
        else:
            bits = 16
        dv = head_dim if v_head_dim is None else v_head_dim
        dk = head_dim
        if bits == 4:
            assert dk % 2 == 0 and dv % 2 == 0, (dk, dv)
            dk, dv = dk // 2, dv // 2  # two nibbles per byte along D
        shape = (n_layers, n_kv_heads, size, dk)
        vshape = (n_layers, n_kv_heads, size, dv)
        return KVCache(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(vshape, dtype),
            k_scale=jnp.zeros(shape[:3], jnp.float32) if bits < 16 else None,
            v_scale=jnp.zeros(shape[:3], jnp.float32) if bits < 16 else None,
            pos=jnp.full((size,), -1, jnp.int32),
            seq_mask=jnp.zeros((size,), jnp.uint32),
            rope_base=rope_base,
            rope_neox=rope_neox,
            rope_dim=rope_dim,
            bits=bits,
        )

    @property
    def size(self) -> int:
        return self.pos.shape[0]

    @property
    def n_kv_heads(self) -> int:
        return self.k.shape[1]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    # ---- slot allocation ---------------------------------------------------
    def find_slots(self, n: int) -> jax.Array:
        """Indices of the first `n` free cells ([n] int32). Cells past the
        pool's capacity alias slot `size-1`; `can_fit` guards real use."""
        free = self.seq_mask == 0
        rank = jnp.cumsum(free) - 1  # rank among free cells
        slots = jnp.full((n,), self.size - 1, jnp.int32)
        idx = jnp.where(free & (rank < n), rank, n)  # OOB -> dropped
        return slots.at[idx].set(jnp.arange(self.size, dtype=jnp.int32), mode="drop")

    def can_fit(self, n: int) -> jax.Array:
        return jnp.sum(self.seq_mask == 0) >= n

    def n_used(self) -> jax.Array:
        return jnp.sum(self.seq_mask != 0)

    # ---- write -------------------------------------------------------------
    def write(self, layer: int, slots: jax.Array, k: jax.Array, v: jax.Array) -> "KVCache":
        """Store per-token K/V ([T, Hkv, D]) into `slots` of `layer`."""
        # note: k[layer, :, slots] uses one advanced index behind a slice,
        # so the update operand keeps the [T, Hkv, D] token-major shape
        if self.quantized:
            qr = _quant_rows4 if self.bits == 4 else _quant_rows
            ks, k_q = qr(k)
            vs, v_q = qr(v)
            return dataclasses.replace(
                self,
                k=self.k.at[layer, :, slots].set(k_q),
                v=self.v.at[layer, :, slots].set(v_q),
                k_scale=self.k_scale.at[layer, :, slots].set(ks),
                v_scale=self.v_scale.at[layer, :, slots].set(vs),
            )
        return dataclasses.replace(
            self,
            k=self.k.at[layer, :, slots].set(k.astype(self.k.dtype)),
            v=self.v.at[layer, :, slots].set(v.astype(self.v.dtype)),
        )

    def write_all(self, slots: jax.Array, k: jax.Array,
                  v: jax.Array) -> "KVCache":
        """Store ALL layers' per-token K/V ([L, T, Hkv, D]) into `slots` with
        ONE scatter per pool. Dynamic-index scatters are expensive on TPU
        (~30-40 us each); per-layer writes cost 72 of them per step, this
        costs 2 (the deferred-write decode path)."""
        kh = jnp.swapaxes(k, 1, 2)  # [L, Hkv, T, D]
        vh = jnp.swapaxes(v, 1, 2)
        if self.quantized:
            qr = _quant_rows4 if self.bits == 4 else _quant_rows
            ks, k_q = qr(kh)
            vs, v_q = qr(vh)
            return dataclasses.replace(
                self,
                k=self.k.at[:, :, slots].set(k_q),
                v=self.v.at[:, :, slots].set(v_q),
                k_scale=self.k_scale.at[:, :, slots].set(ks),
                v_scale=self.v_scale.at[:, :, slots].set(vs),
            )
        return dataclasses.replace(
            self,
            k=self.k.at[:, :, slots].set(kh.astype(self.k.dtype)),
            v=self.v.at[:, :, slots].set(vh.astype(self.v.dtype)),
        )

    def commit(self, slots: jax.Array, pos: jax.Array, seq_id: jax.Array,
               valid: jax.Array | None = None) -> "KVCache":
        """Mark `slots` as owned: cell metadata update (once per ubatch).
        Rows with valid=False write pos=-1/mask=0 (inert padding).
        seq_id rows use the `seq_bits_of` encoding (negative = packed
        multi-membership)."""
        bit = seq_bits_of(seq_id)
        if valid is not None:
            bit = jnp.where(valid, bit, 0).astype(jnp.uint32)
            pos = jnp.where(valid, pos, -1)
        return dataclasses.replace(
            self,
            pos=self.pos.at[slots].set(pos.astype(jnp.int32)),
            seq_mask=self.seq_mask.at[slots].set(bit),
        )

    def read_layer(self, layer: int,
                   limit: int | None = None) -> tuple[jax.Array, jax.Array]:
        """Dequantized K/V of one layer: ([Hkv, S, D], [Hkv, S, D]).

        `limit` (static) returns only the first `limit` cells — the ragged
        decode path (reference llama_kv_cache keeps an `n_kv` high-water
        mark and attends over [0, n) only; here the bound is a compile-time
        bucket so XLA fuses the slice into the attention reads for free)."""
        s = slice(None) if limit is None else slice(0, limit)
        if self.quantized:
            if self.bits == 4:
                return (_dequant4(self.k[layer, :, s],
                                  self.k_scale[layer, :, s]),
                        _dequant4(self.v[layer, :, s],
                                  self.v_scale[layer, :, s]))
            k = self.k[layer, :, s].astype(jnp.bfloat16) * self.k_scale[layer, :, s][..., None].astype(jnp.bfloat16)
            v = self.v[layer, :, s].astype(jnp.bfloat16) * self.v_scale[layer, :, s][..., None].astype(jnp.bfloat16)
            return k, v
        return self.k[layer, :, s], self.v[layer, :, s]

    def layer_planes(self, layer: int, limit: int | None = None):
        """Raw per-layer planes for the flash kernel: (k, v, k_scale,
        v_scale) with K/V [Hkv, S, D] and scales [Hkv, S] (None if bf16)."""
        s = slice(None) if limit is None else slice(0, limit)
        if self.quantized:
            return (self.k[layer, :, s], self.v[layer, :, s],
                    self.k_scale[layer, :, s], self.v_scale[layer, :, s])
        return self.k[layer, :, s], self.v[layer, :, s], None, None

    # ---- sequence ops (contract: include/llama.h:707-759 KV API) -----------
    def _owned(self, seq_id: int | jax.Array) -> jax.Array:
        return (self.seq_mask >> jnp.uint32(seq_id)) & 1 != 0

    def _in_range(self, p0, p1) -> jax.Array:
        lo = jnp.where(p0 < 0, jnp.iinfo(jnp.int32).min, p0)
        hi = jnp.where(p1 < 0, jnp.iinfo(jnp.int32).max, p1)
        return (self.pos >= lo) & (self.pos < hi)

    def seq_rm(self, seq_id, p0=-1, p1=-1) -> "KVCache":
        sel = self._owned(seq_id) & self._in_range(p0, p1)
        bit = jnp.uint32(1) << jnp.uint32(seq_id)
        new_mask = jnp.where(sel, self.seq_mask & ~bit, self.seq_mask)
        return dataclasses.replace(
            self,
            seq_mask=new_mask,
            pos=jnp.where(new_mask == 0, -1, self.pos),
        )

    def seq_cp(self, seq_src, seq_dst, p0=-1, p1=-1) -> "KVCache":
        sel = self._owned(seq_src) & self._in_range(p0, p1)
        bit = jnp.uint32(1) << jnp.uint32(seq_dst)
        return dataclasses.replace(
            self, seq_mask=jnp.where(sel, self.seq_mask | bit, self.seq_mask)
        )

    def seq_rm_all(self, p0=-1, p1=-1) -> "KVCache":
        """Remove cells in [p0, p1) from EVERY sequence (the seq_id=-1
        form of llama_memory_seq_rm; lookahead's per-round batch cleanup)."""
        sel = self._in_range(p0, p1)
        new_mask = jnp.where(sel, jnp.uint32(0), self.seq_mask)
        return dataclasses.replace(
            self,
            seq_mask=new_mask,
            pos=jnp.where(new_mask == 0, -1, self.pos),
        )

    def seq_keep(self, seq_id) -> "KVCache":
        bit = jnp.uint32(1) << jnp.uint32(seq_id)
        new_mask = self.seq_mask & bit
        return dataclasses.replace(
            self, seq_mask=new_mask, pos=jnp.where(new_mask == 0, -1, self.pos)
        )

    def seq_add(self, seq_id, p0, p1, delta) -> "KVCache":
        """Shift positions by `delta` (context-shift); re-rotates cached K."""
        sel = self._owned(seq_id) & self._in_range(p0, p1)
        new_pos = jnp.where(sel, self.pos + delta, self.pos)
        rot = jnp.where(sel, delta, 0)
        return self._apply_pos_change(new_pos, rot, drop=sel & (new_pos < 0))

    def seq_div(self, seq_id, p0, p1, d) -> "KVCache":
        """Divide positions (self-extend grouped attention)."""
        sel = self._owned(seq_id) & self._in_range(p0, p1)
        new_pos = jnp.where(sel, self.pos // d, self.pos)
        rot = new_pos - self.pos
        return self._apply_pos_change(new_pos, rot, drop=jnp.zeros_like(sel))

    def _apply_pos_change(self, new_pos, rot, drop) -> "KVCache":
        """Incremental K re-rotation by per-cell deltas. K is head-major
        [L, H, S, D]; rotate via a cell-major view (cold path: runs only
        on window slides / self-extend)."""
        def rotate(kf):  # [L, H, S, D] bf16 -> rotated
            kc = jnp.swapaxes(kf, 1, 2)  # [L, S, H, D]
            pos2 = jnp.broadcast_to(rot[None, :], kc.shape[:2])
            if self.rope_dim > 0:
                # MLA: only the leading rope_dim key columns are roped;
                # the compressed latent is position-independent
                head = apply_rope(kc[..., :self.rope_dim], pos2,
                                  self.rope_base, neox=self.rope_neox)
                kc = jnp.concatenate([head, kc[..., self.rope_dim:]], -1)
            else:
                kc = apply_rope(kc, pos2, self.rope_base,
                                neox=self.rope_neox)
            return jnp.swapaxes(kc, 1, 2)

        if self.quantized:
            if self.bits == 4:
                kf = _dequant4(self.k, self.k_scale)
                scale, kq = _quant_rows4(rotate(kf))
            else:
                kf = self.k.astype(jnp.bfloat16) * self.k_scale[..., None].astype(jnp.bfloat16)
                scale, kq = _quant_rows(rotate(kf))
            return dataclasses.replace(
                self, k=kq, k_scale=scale,
                pos=jnp.where(drop, -1, new_pos),
                seq_mask=jnp.where(drop, 0, self.seq_mask).astype(jnp.uint32),
            )
        kf = rotate(self.k)
        return dataclasses.replace(
            self, k=kf.astype(self.k.dtype),
            pos=jnp.where(drop, -1, new_pos),
            seq_mask=jnp.where(drop, 0, self.seq_mask).astype(jnp.uint32),
        )

    def seq_pos_min(self, seq_id) -> jax.Array:
        owned = self._owned(seq_id)
        return jnp.min(jnp.where(owned, self.pos, jnp.iinfo(jnp.int32).max))

    def seq_pos_max(self, seq_id) -> jax.Array:
        owned = self._owned(seq_id)
        return jnp.max(jnp.where(owned, self.pos, -1))

    def clear(self) -> "KVCache":
        return dataclasses.replace(
            self,
            pos=jnp.full_like(self.pos, -1),
            seq_mask=jnp.zeros_like(self.seq_mask),
        )

    # ---- attention mask ----------------------------------------------------
    def attn_mask(self, q_pos: jax.Array, q_seq: jax.Array,
                  slots: jax.Array | None = None,
                  limit: int | None = None,
                  causal: bool = True) -> jax.Array:
        """[T, S] bool: query t may attend to cell c (same seq, causal).

        `slots`/metadata for the current ubatch must already be committed.
        `limit` (static) restricts to the first `limit` cells (ragged
        decode; the caller guarantees every occupied cell is below it).
        causal=False drops the position condition (diffusion LMs:
        reference build_attn_inp_no_cache for llada/dream)."""
        sm = self.seq_mask if limit is None else self.seq_mask[:limit]
        cp = self.pos if limit is None else self.pos[:limit]
        owned = (sm[None, :] & primary_seq_bit(q_seq)[:, None]) != 0
        used = sm[None, :] != 0
        vis = owned & used
        if causal:
            vis = vis & (cp[None, :] <= q_pos[:, None])
        return vis


def _quant_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-(token, head) symmetric int8 quantization of K/V rows."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.round(x.astype(jnp.float32) / scale[..., None]).astype(jnp.int8)
    return scale, q


def _quant_rows4(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-(token, head) symmetric int4 quantization, packed two logical
    columns per byte: byte d = nibble(col d) | nibble(col d + D/2) << 4,
    each nibble biased +8 (the q4_0 bit law, ggml-common.h:219 role)."""
    d = x.shape[-1]
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.where(amax > 0, amax / 7.0, 1.0)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -8, 7).astype(jnp.int32) + 8
    lo, hi = q[..., :d // 2], q[..., d // 2:]
    return scale, (lo | (hi << 4)).astype(jnp.uint8)


def _dequant4(q: jax.Array, scale: jax.Array) -> jax.Array:
    """Packed [..., D/2] uint8 + per-row scale -> [..., D] bf16."""
    qi = q.astype(jnp.int32)
    lo = (qi & 0xF) - 8
    hi = (qi >> 4) - 8
    full = jnp.concatenate([lo, hi], axis=-1).astype(jnp.bfloat16)
    return full * scale[..., None].astype(jnp.bfloat16)
