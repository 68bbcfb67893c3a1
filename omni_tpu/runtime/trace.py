"""Per-op tracing: the eval-callback capability.

Counterpart of the reference's examples/eval-callback +
ggml_backend_sched_eval_callback (SURVEY.md §5): dump every intermediate
tensor of a forward pass with summary statistics. Under XLA there are no
per-op host callbacks inside a compiled graph, so the idiomatic equivalent
is a tracing forward that RETURNS the intermediates (one jitted call, all
taps fetched together) — same observability, no graph-hook machinery.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from ..kernels.dequant_matmul import matmul
from ..kernels.norms import rms_norm
from ..kernels.rope import apply_rope


@dataclasses.dataclass
class TraceEntry:
    name: str
    shape: tuple[int, ...]
    dtype: str
    mean: float
    std: float
    absmax: float
    data: np.ndarray | None = None

    def __str__(self) -> str:
        return (f"{self.name:40s} {str(self.shape):18s} {self.dtype:9s} "
                f"mean={self.mean:+.4e} std={self.std:.4e} "
                f"absmax={self.absmax:.4e}")


def trace_qwen3(params: dict, cfg, tokens: np.ndarray,
                keep_data: bool = False) -> list[TraceEntry]:
    """Causal forward over [T] tokens, returning stats (optionally values)
    for every intermediate tensor, in execution order."""
    t = int(len(tokens))

    order: list[str] = []

    @jax.jit
    def run(params, toks):
        # dict keys are pytree structure (jit-legal); order records sequence
        taps: dict[str, jax.Array] = {}

        def tap(name, v):
            taps[name] = v
            if name not in order:
                order.append(name)
            return v

        pos = jnp.arange(t, dtype=jnp.int32)
        causal = jnp.tril(jnp.ones((t, t), bool))
        h = tap("token_embd", params["token_embd"][toks].astype(jnp.bfloat16))
        for li, lp in enumerate(params["layers"]):
            p = f"blk.{li}."
            h_in = h
            hn = tap(p + "attn_norm", rms_norm(h, lp["attn_norm"], cfg.rms_eps))
            q = tap(p + "q", matmul(hn, lp["wq"]).reshape(t, cfg.n_heads, cfg.head_dim))
            k = matmul(hn, lp["wk"]).reshape(t, cfg.n_kv_heads, cfg.head_dim)
            v = matmul(hn, lp["wv"]).reshape(t, cfg.n_kv_heads, cfg.head_dim)
            if lp["q_norm"] is not None:
                q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
            if lp["k_norm"] is not None:
                k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
            neox = getattr(cfg, "rope_neox", True)
            q = apply_rope(q, pos, cfg.rope_base, neox=neox)
            k = tap(p + "k_rope", apply_rope(k, pos, cfg.rope_base, neox=neox))
            g = cfg.n_heads // cfg.n_kv_heads
            qg = q.reshape(t, cfg.n_kv_heads, g, cfg.head_dim)
            scores = jnp.einsum("thgd,shd->hgts", qg, k,
                                preferred_element_type=jnp.float32)
            scores = jnp.where(causal[None, None], scores / (cfg.head_dim ** 0.5),
                               -1e30)
            pr = tap(p + "attn_probs", jax.nn.softmax(scores, axis=-1))
            attn = jnp.einsum("hgts,shd->thgd", pr.astype(jnp.bfloat16), v,
                              preferred_element_type=jnp.float32)
            attn = attn.reshape(t, -1).astype(jnp.bfloat16)
            h = tap(p + "attn_out", h_in + matmul(attn, lp["wo"]))
            h_in = h
            hn = tap(p + "ffn_norm", rms_norm(h, lp["ffn_norm"], cfg.rms_eps))
            gate = matmul(hn, lp["w_gate"])
            up = matmul(hn, lp["w_up"])
            act = jax.nn.silu(gate.astype(jnp.float32)).astype(jnp.bfloat16) * up
            h = tap(p + "ffn_out", h_in + matmul(act, lp["w_down"]))
        hidden = tap("output_norm", rms_norm(h, params["output_norm"], cfg.rms_eps))
        head = params["output"] if params["output"] is not None else params["token_embd"]
        tap("logits", matmul(hidden, head, out_dtype=jnp.float32))
        return taps

    taps = run(params, jnp.asarray(tokens, jnp.int32))
    out = []
    for name in order:
        v = taps[name]
        a = np.asarray(v, np.float32)
        out.append(TraceEntry(
            name=name, shape=tuple(a.shape), dtype=str(v.dtype),
            mean=float(a.mean()), std=float(a.std()),
            absmax=float(np.abs(a).max()),
            data=a if keep_data else None,
        ))
    return out
