"""Decode engine: the TPU counterpart of llama_context
(/root/reference/src/llama-context.cpp decode/encode, include/llama.h:860).

Owns the parameter pytree, the unified KV cache, and shape-bucketed jitted
step functions. A `Batch` mirrors llama_batch (include/llama.h:230): either
token ids or raw embeddings, with explicit positions and sequence ids —
embedding injection is how encoder outputs (vision/audio) enter the LLM.

Every step returns logits AND last hidden states, the tap the omni TTS
conditioning requires (reference tools/omni/omni.cpp:345-403).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from .kv_cache import KVCache
from .sampler import (SamplerParams, mirostat_init, sample,
                      update_prev_tokens)

# ubatch padding buckets (limit recompilation: one compiled step per bucket)
BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)


def _bucket(n: int, buckets: tuple[int, ...] = BUCKETS) -> int:
    for b in buckets:
        if n <= b:
            return b
    step = max(buckets[-1], 1)
    return ((n + step - 1) // step) * step


@dataclasses.dataclass
class Batch:
    """Token-or-embedding ubatch (contract of llama_batch)."""

    tokens: np.ndarray | None = None  # [T] int32
    embeds: np.ndarray | None = None  # [T, d] float
    pos: np.ndarray | None = None  # [T] int32; default = arange
    seq_id: np.ndarray | None = None  # [T] int32; default = 0
    # qwen2vl M-RoPE [T, 3] (temporal/height/width streams); the cache
    # and masks use the scalar `pos` (max stream value per token, the
    # reference's mrope convention); None = all streams equal pos
    pos3: np.ndarray | None = None

    def __len__(self) -> int:
        return len(self.tokens) if self.tokens is not None else len(self.embeds)


class KVCacheFull(RuntimeError):
    """Raised when a decode would exceed the KV cell pool. The reference
    either context-shifts (server, tools/server/server.cpp:2872) or fails
    the batch (llama_decode returns 1 on no-slot); silent cell aliasing is
    never acceptable."""


class Context:
    """One model instance + its KV cache + compiled step functions."""

    def __init__(
        self,
        cfg,
        params,
        forward_fn: Callable,  # (params,cfg,x,pos,seq,cache,slots,write_mask)
        embed_fn: Callable,  # (params, tokens) -> [T, d]
        n_ctx: int = 4096,
        kv_dtype=jnp.bfloat16,
        n_kv_heads: int | None = None,
        head_dim: int | None = None,
        sampler: SamplerParams | None = None,
        buckets: tuple[int, ...] = BUCKETS,
    ):
        # longrope branch selection: HF applies long_factor once
        # seq_len exceeds original_max_position_embeddings; the engine
        # picks statically by the context size (the reference picks by
        # n_ctx_per_seq at graph build — same rule)
        if (getattr(cfg, "rope_scaling", "none") == "longrope"
                and getattr(cfg, "rope_orig_ctx", 0)
                and n_ctx > cfg.rope_orig_ctx and not cfg.rope_long):
            import dataclasses as _dc
            cfg = _dc.replace(cfg, rope_long=True)
        self.cfg = cfg
        self.params = params
        self._forward = forward_fn
        self._embed = embed_fn
        self.n_ctx = n_ctx
        self.cache = KVCache.create(
            cfg.n_layers,
            n_ctx,
            n_kv_heads or cfg.n_kv_heads,
            head_dim or cfg.head_dim,
            dtype=kv_dtype,
            rope_base=cfg.rope_base,
            rope_neox=getattr(cfg, "rope_neox", True),
            # MLA (deepseek2): narrower value plane + partially-roped keys;
            # phi2/neox-style partial rotary also ropes only the leading
            # rope_dim columns (re-rotation on seq_add must match)
            v_head_dim=getattr(cfg, "v_head_dim", None),
            rope_dim=(getattr(cfg, "rope_dim", 0)
                      if (getattr(cfg, "kv_lora_rank", 0)
                          or 0 < getattr(cfg, "rope_dim", 0)
                          < (head_dim or cfg.head_dim)) else 0),
        )
        self.sampler = sampler or SamplerParams()
        self.key = jax.random.PRNGKey(self.sampler.seed)
        self.prev_tokens = jnp.full((max(self.sampler.penalty_last_n, 1),), -1, jnp.int32)
        self.mu = mirostat_init(self.sampler) if self.sampler.mirostat else None
        self._steps: dict[int, Callable] = {}
        self.n_past: dict[int, int] = {}  # per-seq position high-water mark
        # host-side shadow of occupied-cell count: lets the hot decode path
        # guard against pool overflow with ZERO device syncs (find_slots
        # would silently alias cells past capacity otherwise). Cold-path
        # seq ops re-sync it from the device.
        self.cells_used = 0
        self.buckets = tuple(sorted(buckets))
        # ragged-KV read bound (reference llama_kv_cache n_kv high-water):
        # with low-first find_slots, after any allocation the max occupied
        # cell index obeys high' = max(high, cells_used') — attention then
        # streams only the first kv-bucket(high) pool cells instead of the
        # whole static pool. Exact under the low-first law; conservatively
        # reset to pool size on state load.
        self.kv_high = 0
        import inspect

        self._fwd_takes_kv_limit = (
            "kv_limit" in inspect.signature(forward_fn).parameters)
        self.kv_buckets = tuple(
            b for b in (512, 1024, 2048, 4096, 8192, 16384, 32768)
            if b < n_ctx) + (n_ctx,)
        # ragged reads for the bucketed decode STEPS are opt-in: each
        # (token-bucket, kv-bucket) pair is a fresh XLA compile of the
        # whole model (~40 s on the tunnel), which the prefill/marker
        # paths don't earn back — the hot scans (omni_decode_scan /
        # fused_generate) are always ragged instead.
        self.ragged_steps = False
        from ..log import PerfCounters

        self.perf = PerfCounters()  # llama_perf_context counterpart

    # ---- compiled step ----------------------------------------------------
    def kv_bucket(self, need: int) -> int | None:
        """Smallest kv-read bucket covering `need` cells (None = full pool,
        either because the forward doesn't take kv_limit or the pool is
        nearly full anyway)."""
        if not self._fwd_takes_kv_limit:
            return None
        for b in self.kv_buckets:
            if b >= need:
                return b if b < self.cache.size else None
        return None

    def _step_fn(self, t: int, kvb: int | None = None) -> Callable:
        if (t, kvb) in self._steps:
            return self._steps[(t, kvb)]

        mrope = bool(getattr(self.cfg, "mrope_sections", ()))
        if mrope:
            @functools.partial(jax.jit, donate_argnums=(1,))
            def step(params, cache: KVCache, x, pos, seq, write_mask,
                     pos3):
                slots = cache.find_slots(x.shape[0])
                kw = {"kv_limit": kvb} if kvb is not None else {}
                logits, hidden, cache = self._forward(
                    params, self.cfg, x, pos, seq, cache, slots,
                    write_mask, pos3=pos3, **kw)
                return logits, hidden, cache
        else:
            @functools.partial(jax.jit, donate_argnums=(1,))
            def step(params, cache: KVCache, x, pos, seq, write_mask):
                slots = cache.find_slots(x.shape[0])
                kw = {"kv_limit": kvb} if kvb is not None else {}
                logits, hidden, cache = self._forward(
                    params, self.cfg, x, pos, seq, cache, slots,
                    write_mask, **kw)
                return logits, hidden, cache

        self._steps[(t, kvb)] = step
        return step

    # ---- public API (llama_decode counterpart) ----------------------------
    def decode(self, batch: Batch, return_hidden: bool = False,
               block: bool = True):
        """Run one ubatch. Returns (logits [T, vocab], hidden or None).

        block=False skips the host sync: the step is ENQUEUED and the
        returned arrays are lazy device values — back-to-back evals (omni
        prefill markers, assistant prompts) then cost one dispatch each
        instead of a full ~35 ms device round-trip each; device-order
        execution keeps the KV consistent for later steps."""
        t = len(batch)
        tb = _bucket(t, self.buckets)
        # overflow guard: the step allocates tb cells (bucket-padded; the
        # padding rows stay free but must land on real free cells — an
        # over-committed find_slots aliases cell size-1 and corrupts it)
        free = self.cache.size - self.cells_used
        if tb > free:
            raise KVCacheFull(
                f"KV pool exhausted: batch of {t} (padded to {tb}) needs "
                f"{tb} free cells, have {free} of {self.cache.size}; "
                f"shift or seq_rm first")
        pos = batch.pos if batch.pos is not None else self._auto_pos(batch)
        seq = batch.seq_id if batch.seq_id is not None else np.zeros(t, np.int32)

        if batch.tokens is not None:
            x = self._embed(self.params, jnp.asarray(
                np.pad(np.asarray(batch.tokens, np.int32), (0, tb - t))))
        elif isinstance(batch.embeds, jax.Array):
            # device-resident embeds (e.g. the TTS condition): pad on
            # device, no host round-trip
            x = jnp.pad(batch.embeds.astype(jnp.bfloat16),
                        ((0, tb - t), (0, 0)))
        else:
            e = np.asarray(batch.embeds, np.float32)
            x = jnp.asarray(np.pad(e, ((0, tb - t), (0, 0))), jnp.bfloat16)

        pos_p = jnp.asarray(np.pad(np.asarray(pos, np.int32), (0, tb - t)))
        seq_p = jnp.asarray(np.pad(np.asarray(seq, np.int32), (0, tb - t)))
        wmask = jnp.asarray(np.arange(tb) < t)

        import time

        t0 = time.perf_counter()
        # ragged-KV bound: every occupied cell is < max(kv_high, used), and
        # this step's tb freshly-allocated slots (low-first) stay below
        # max(kv_high, used) + tb
        kvb = (self.kv_bucket(max(self.kv_high, self.cells_used) + tb)
               if self.ragged_steps else None)
        extra = ()
        if getattr(self.cfg, "mrope_sections", ()):
            p3 = (np.asarray(batch.pos3, np.int32)
                  if batch.pos3 is not None
                  else np.repeat(np.asarray(pos, np.int32)[:, None], 3, 1))
            extra = (jnp.asarray(np.pad(p3, ((0, tb - t), (0, 0)))),)
        logits, hidden, self.cache = self._step_fn(tb, kvb)(
            self.params, self.cache, x, pos_p, seq_p, wmask, *extra
        )
        if block:
            logits.block_until_ready()
        self.perf.record_decode(t, time.perf_counter() - t0)
        self.cells_used += t  # valid rows only; padding cells stay free
        self.kv_high = max(self.kv_high, self.cells_used)
        for s in np.unique(np.asarray(seq)):
            if s < 0:  # packed multi-membership rows (lookahead trees)
                continue  # manage their own position bookkeeping
            mx = int(np.max(np.asarray(pos)[np.asarray(seq) == s]))
            self.n_past[int(s)] = max(self.n_past.get(int(s), 0), mx + 1)
        if return_hidden:
            return logits[:t], hidden[:t]
        return logits[:t], None

    def _auto_pos(self, batch: Batch) -> np.ndarray:
        seq = batch.seq_id if batch.seq_id is not None else np.zeros(len(batch), np.int32)
        pos = np.zeros(len(batch), np.int32)
        counters = dict(self.n_past)
        for i, s in enumerate(np.asarray(seq)):
            pos[i] = counters.get(int(s), 0)
            counters[int(s)] = pos[i] + 1
        return pos

    def prefill(self, tokens, seq_id: int = 0, chunk: int = 256):
        """Chunked prompt ingestion; returns logits of the last position."""
        tokens = np.asarray(tokens, np.int32)
        logits = None
        for i in range(0, len(tokens), chunk):
            part = tokens[i : i + chunk]
            logits, _ = self.decode(Batch(
                tokens=part,
                seq_id=np.full(len(part), seq_id, np.int32),
            ))
        return logits[-1] if logits is not None else None

    def sample_token(self, logits_row) -> int:
        self.key, sub = jax.random.split(self.key)
        if self.mu is not None:
            tok, self.mu = sample(jnp.asarray(logits_row), sub, self.sampler,
                                  self.prev_tokens, mu=self.mu)
        else:
            tok = sample(jnp.asarray(logits_row), sub, self.sampler,
                         self.prev_tokens)
        self.prev_tokens = update_prev_tokens(self.prev_tokens, tok)
        return int(tok)

    def generate(self, prompt_tokens, max_new: int = 64, seq_id: int = 0,
                 stop_tokens: tuple[int, ...] = (), return_hidden: bool = False):
        """Simple autoregressive loop (greedy/dist per sampler params)."""
        last = self.prefill(prompt_tokens, seq_id)
        out, hiddens = [], []
        tok = self.sample_token(last)
        for _ in range(max_new):
            if tok in stop_tokens:
                break
            out.append(tok)
            logits, hidden = self.decode(
                Batch(tokens=np.array([tok], np.int32),
                      seq_id=np.array([seq_id], np.int32)),
                return_hidden=return_hidden,
            )
            if return_hidden:
                hiddens.append(np.asarray(hidden[0]))
            tok = self.sample_token(logits[0])
        if return_hidden:
            return out, hiddens
        return out

    # ---- KV session ops (llama_memory_* counterparts) ----------------------
    def sync_cells_used(self) -> int:
        """Re-sync the host-side occupied-cell shadow from the device (one
        transfer; cold paths only). Also re-syncs the ragged-KV high-water
        mark exactly (max occupied cell index + 1)."""
        used, high = jax.device_get(jax.jit(
            lambda c: (c.n_used(),
                       jnp.max(jnp.where(c.seq_mask != 0,
                                         jnp.arange(c.size) + 1, 0)))
        )(self.cache))
        self.cells_used = int(used)
        self.kv_high = int(high)
        return self.cells_used

    def seq_rm(self, seq_id, p0=-1, p1=-1):
        self.cache = jax.jit(KVCache.seq_rm)(self.cache, seq_id, p0, p1)
        self.sync_cells_used()

    def seq_cp(self, seq_src, seq_dst, p0=-1, p1=-1):
        self.cache = jax.jit(KVCache.seq_cp)(self.cache, seq_src, seq_dst, p0, p1)

    def seq_rm_all(self, p0=-1, p1=-1):
        """llama_memory_seq_rm(seq=-1): drop positions from every seq."""
        self.cache = jax.jit(KVCache.seq_rm_all)(self.cache, p0, p1)
        self.sync_cells_used()

    def seq_keep(self, seq_id):
        self.cache = jax.jit(KVCache.seq_keep)(self.cache, seq_id)
        self.sync_cells_used()

    def seq_add(self, seq_id, p0, p1, delta):
        self.cache = jax.jit(KVCache.seq_add)(self.cache, seq_id, p0, p1, delta)
        if seq_id in self.n_past:
            self.n_past[seq_id] = max(0, self.n_past[seq_id] + int(delta))
        if int(delta) < 0:  # negative shifts can drop cells (new_pos < 0)
            self.sync_cells_used()

    def seq_div(self, seq_id, p0, p1, d):
        self.cache = jax.jit(KVCache.seq_div)(self.cache, seq_id, p0, p1, d)
        if seq_id in self.n_past:
            self.n_past[seq_id] = self.n_past[seq_id] // int(d)

    def clear_kv(self):
        self.cache = self.cache.clear()
        self.n_past.clear()
        self.cells_used = 0
        self.kv_high = 0

    # ---- state save/load (llama_state_{get,set}_data counterpart) ---------
    @staticmethod
    def _to_np(a: jax.Array) -> np.ndarray:
        x = np.asarray(a)
        # bf16 has no portable numpy repr: persist the bit pattern
        return x.view(np.uint16) if a.dtype == jnp.bfloat16 else x

    def state_bytes(self) -> bytes:
        import io

        buf = io.BytesIO()
        arrs = {
            "k": self._to_np(self.cache.k), "v": self._to_np(self.cache.v),
            "pos": np.asarray(self.cache.pos),
            "seq_mask": np.asarray(self.cache.seq_mask),
        }
        if self.cache.quantized:
            arrs["k_scale"] = np.asarray(self.cache.k_scale)
            arrs["v_scale"] = np.asarray(self.cache.v_scale)
        np_past = np.array(sorted(self.n_past.items()), np.int64).reshape(-1, 2)
        np.savez(buf, n_past=np_past, **arrs)
        return buf.getvalue()

    # ---- per-sequence state (llama_state_seq_{get,set}_data counterpart) --
    def seq_state_bytes(self, seq_id: int) -> bytes:
        """Serialize one sequence's KV cells (position-ordered), for the
        server's slot save/restore (tools/server tests test_slot_save.py)."""
        import io

        owned = ((np.asarray(self.cache.seq_mask) >> np.uint32(seq_id)) & 1) != 0
        idx = np.nonzero(owned)[0]
        pos = np.asarray(self.cache.pos)[idx]
        order = np.argsort(pos, kind="stable")
        idx = idx[order]
        arrs = {
            "pos": pos[order],
            "k": self._to_np(self.cache.k[:, :, idx]),
            "v": self._to_np(self.cache.v[:, :, idx]),
            "n_past": np.int64(self.n_past.get(seq_id, 0)),
        }
        if self.cache.quantized:
            arrs["k_scale"] = np.asarray(self.cache.k_scale[:, :, idx])
            arrs["v_scale"] = np.asarray(self.cache.v_scale[:, :, idx])
        buf = io.BytesIO()
        np.savez(buf, **arrs)
        return buf.getvalue()

    def load_seq_state_bytes(self, seq_id: int, data: bytes) -> int:
        """Restore a saved sequence into free cells under `seq_id`; returns
        the number of cells restored."""
        import io

        z = np.load(io.BytesIO(data))
        n = len(z["pos"])
        if n == 0:
            return 0
        self.seq_rm(seq_id, -1, -1)
        free = np.nonzero(np.asarray(self.cache.seq_mask) == 0)[0]
        if len(free) < n:
            raise RuntimeError(f"not enough free KV cells: need {n}, "
                               f"have {len(free)}")
        slots = jnp.asarray(free[:n], jnp.int32)

        def from_np(x, dtype):
            if dtype == jnp.bfloat16:
                import ml_dtypes

                return jnp.asarray(x.view(ml_dtypes.bfloat16))
            return jnp.asarray(x, dtype)

        cache = self.cache
        k = cache.k.at[:, :, slots].set(from_np(z["k"], cache.k.dtype))
        v = cache.v.at[:, :, slots].set(from_np(z["v"], cache.v.dtype))
        bit = jnp.uint32(1) << jnp.uint32(seq_id)
        pos = cache.pos.at[slots].set(jnp.asarray(z["pos"], jnp.int32))
        seq_mask = cache.seq_mask.at[slots].set(bit)
        kw = {}
        if cache.quantized:
            kw["k_scale"] = cache.k_scale.at[:, :, slots].set(jnp.asarray(z["k_scale"]))
            kw["v_scale"] = cache.v_scale.at[:, :, slots].set(jnp.asarray(z["v_scale"]))
        self.cache = dataclasses.replace(cache, k=k, v=v, pos=pos,
                                         seq_mask=seq_mask, **kw)
        self.n_past[seq_id] = int(z["n_past"])
        self.sync_cells_used()
        return n

    def load_state_bytes(self, data: bytes) -> None:
        import io

        z = np.load(io.BytesIO(data))

        def from_np(x, dtype):
            if dtype == jnp.bfloat16:
                import ml_dtypes

                return jnp.asarray(x.view(ml_dtypes.bfloat16))
            return jnp.asarray(x, dtype)

        self.cache = dataclasses.replace(
            self.cache,
            k=from_np(z["k"], self.cache.k.dtype),
            v=from_np(z["v"], self.cache.v.dtype),
            pos=jnp.asarray(z["pos"]),
            seq_mask=jnp.asarray(z["seq_mask"]),
            k_scale=jnp.asarray(z["k_scale"]) if "k_scale" in z.files else None,
            v_scale=jnp.asarray(z["v_scale"]) if "v_scale" in z.files else None,
        )
        self.n_past = {int(a): int(b) for a, b in z["n_past"]}
        self.sync_cells_used()
