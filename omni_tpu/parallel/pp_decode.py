"""Pipelined DECODE: continuous cross-step pipeline parallelism.

Counterpart of the reference backend scheduler's n_copies micro-batch
overlap during generation (/root/reference/ggml/src/ggml-backend.cpp:700-714
— while stage s computes micro-batch m, the copy of m+1 to stage s is in
flight). TPU-first shape: G decode groups stream around the `pp` ring
INSIDE ONE jitted lax.scan — each tick every stage processes one group's
current token against its stage-local KV cache and `ppermute`s activations
to the next stage; the LAST stage samples greedily, embeds the new token,
and sends the embedding straight back to stage 0 over the same ring hop.
After the S-tick fill, every stage is busy every tick: steady-state
utilisation is 1 - (S-1)/(G·N+S-1) versus G/(G+S-1) for a per-step
fill-drain schedule — the bubble amortises over the WHOLE generation, not
per token. No host round-trips during the generation at all.

Requires G >= n_stages (a sampled token's ring-trip back to stage 0 takes
S ticks; with fewer in-flight groups the pipeline would starve — the same
constraint as the reference's n_copies window).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..kernels.norms import rms_norm
from ..kernels.rope import apply_rope
from .pp import _block, stage_param_specs


def _step_block(lp: dict, cfg, h: jax.Array, k_cache, v_cache, p,
                tp_axis: str | None = None):
    """Single-token decode block: h [B, d]; stage-local cache slices
    [B, Hkv, Tmax, D]; p = write/attend position (traced scalar).
    With `tp_axis`, head counts come from the tp-local weight shards and
    wo/w_down partial products psum over that axis (megatron layout —
    the same composition as pp.py _block). Returns (h_out,
    k_new [B, Hkv, D], v_new)."""
    b, _ = h.shape
    hd = cfg.head_dim
    n_heads = lp["wq"].shape[0] // hd
    n_kv = lp["wk"].shape[0] // hd

    def lin(x, w):
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    def reduce_rows(x):
        if tp_axis is None:
            return x
        return jax.lax.psum(x.astype(jnp.float32), tp_axis).astype(x.dtype)

    h_in = h
    hn = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
    q = lin(hn, lp["wq"]).reshape(b, n_heads, hd)
    k = lin(hn, lp["wk"]).reshape(b, n_kv, hd)
    v = lin(hn, lp["wv"]).reshape(b, n_kv, hd)
    if "q_norm" in lp:
        q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
    if "k_norm" in lp:
        k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
    pv = jnp.full((b, 1), p, jnp.int32)
    q = apply_rope(q[:, None], pv, cfg.rope_base, neox=cfg.rope_neox)[:, 0]
    k = apply_rope(k[:, None], pv, cfg.rope_base, neox=cfg.rope_neox)[:, 0]

    tmax = k_cache.shape[2]
    k_all = jax.lax.dynamic_update_slice_in_dim(
        k_cache, k[:, :, None].astype(k_cache.dtype), p, axis=2)
    v_all = jax.lax.dynamic_update_slice_in_dim(
        v_cache, v[:, :, None].astype(v_cache.dtype), p, axis=2)
    g = n_heads // n_kv
    qg = q.reshape(b, n_kv, g, hd)
    scores = jnp.einsum("bkgd,bksd->bkgs", qg, k_all,
                        preferred_element_type=jnp.float32)
    mask = jnp.arange(tmax) <= p
    scores = jnp.where(mask[None, None, None], scores / (hd ** 0.5), -1e30)
    pr = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
    attn = jnp.einsum("bkgs,bksd->bkgd", pr, v_all,
                      preferred_element_type=jnp.float32)
    attn = attn.reshape(b, n_heads * hd).astype(jnp.bfloat16)
    h = h_in + reduce_rows(lin(attn, lp["wo"])).astype(h.dtype)
    hn = rms_norm(h, lp["ffn_norm"], cfg.rms_eps)
    gate = jax.nn.silu(lin(hn, lp["w_gate"]).astype(jnp.float32)
                       ).astype(jnp.bfloat16)
    out = h + reduce_rows(
        lin(gate * lin(hn, lp["w_up"]), lp["w_down"])).astype(h.dtype)
    return out, k, v


def pp_decode(pp_params: dict, cfg, tokens0: jax.Array, mesh: Mesh,
              n_new: int) -> jax.Array:
    """tokens0 [G, B, T0] (G pipelined decode groups) -> greedy tokens
    [G, B, n_new]. Prefill runs the GPipe schedule capturing stage-local
    KV; decode runs G·(n_new-1)+S continuous ticks with zero host syncs."""
    n_stages = mesh.shape["pp"]
    n_tp = mesh.shape.get("tp", 1)
    tp_axis = "tp" if n_tp > 1 else None
    g_groups, b, t0 = tokens0.shape
    assert g_groups >= n_stages, (
        f"pipelined decode needs >= {n_stages} groups in flight, got "
        f"{g_groups} (ring latency back to stage 0 is {n_stages} ticks)")
    tmax = t0 + n_new
    d_model = pp_params["token_embd"].shape[1]
    embd = pp_params["token_embd"]
    out_norm = pp_params["output_norm"]
    head = (pp_params["output"] if pp_params.get("output") is not None
            else pp_params["token_embd"])
    stage_specs = stage_param_specs(pp_params["stages"], n_tp)
    ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    def stage_fn(stages, toks):
        s = jax.lax.axis_index("pp")
        lps = jax.tree.map(lambda a: a[0], stages)
        n_lps = next(iter(lps.values())).shape[0]
        n_kv = lps["wk"].shape[1] // cfg.head_dim

        cache_k = jnp.zeros((n_lps, g_groups, b, n_kv, tmax, cfg.head_dim),
                            jnp.bfloat16)
        cache_v = jnp.zeros_like(cache_k)

        # ---- prefill: GPipe over groups, KV captured per stage --------
        h0 = embd[toks].astype(jnp.bfloat16)  # [G, B, T0, d]
        pos = jnp.arange(t0, dtype=jnp.int32)
        causal = jnp.tril(jnp.ones((t0, t0), bool))
        zero = jnp.zeros((b, t0, d_model), jnp.bfloat16)
        recv = zero
        first_tok = jnp.zeros((g_groups, b), jnp.int32)
        for step in range(g_groups + n_stages - 1):
            inp = jnp.where(s == 0,
                            h0[min(step, g_groups - 1)]
                            if step < g_groups else zero,
                            recv)
            y = inp
            ks, vs = [], []
            for i in range(n_lps):
                lp = jax.tree.map(lambda a, i=i: a[i], lps)
                y, (k, v) = _block(lp, cfg, y, pos, causal,
                                   tp_axis=tp_axis, return_kv=True)
                ks.append(k.transpose(0, 2, 1, 3))  # [B, Hkv, T0, D]
                vs.append(v.transpose(0, 2, 1, 3))
            ks = jnp.stack(ks)  # [Lps, B, Hkv, T0, D]
            vs = jnp.stack(vs)
            g_cur = step - s
            valid = (g_cur >= 0) & (g_cur < g_groups)
            gi = jnp.clip(g_cur, 0, g_groups - 1)
            old_k = jax.lax.dynamic_slice_in_dim(cache_k[:, gi], 0, t0, 3)
            old_v = jax.lax.dynamic_slice_in_dim(cache_v[:, gi], 0, t0, 3)
            cache_k = cache_k.at[:, gi, :, :, :t0].set(
                jnp.where(valid, ks.astype(jnp.bfloat16), old_k))
            cache_v = cache_v.at[:, gi, :, :, :t0].set(
                jnp.where(valid, vs.astype(jnp.bfloat16), old_v))
            logits = rms_norm(y[:, -1].astype(jnp.float32), out_norm,
                              cfg.rms_eps) @ head.T.astype(jnp.float32)
            tk = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            first_tok = first_tok.at[gi].set(
                jnp.where(valid & (s == n_stages - 1), tk, first_tok[gi]))
            recv = jax.lax.ppermute(y, "pp", ring)
        # last stage owns first_tok; other stages contributed zeros
        first_tok = jax.lax.psum(first_tok * (s == n_stages - 1), "pp")

        # ---- continuous decode ticks ----------------------------------
        pending = embd[first_tok].astype(jnp.bfloat16)  # [G, B, d]
        out_toks = jnp.zeros((g_groups, b, n_new), jnp.int32)
        out_toks = out_toks.at[:, :, 0].set(first_tok)
        lens = jnp.full((g_groups,), t0, jnp.int32)  # per-stage clocks
        rec_cnt = jnp.ones((g_groups,), jnp.int32)
        recv0 = (jnp.zeros((b, d_model), jnp.bfloat16),
                 jnp.int32(-1), jnp.zeros((b,), jnp.int32), jnp.bool_(False))
        n_ticks = g_groups * (n_new - 1) + n_stages

        def tick(carry, i):
            (cache_k, cache_v, pending, recv, out_toks, lens,
             rec_cnt) = carry
            rh, rgid, rtok, rvalid = recv
            # stage 0: record the token that just completed its ring trip
            # and refresh that group's pending input
            rgi = jnp.clip(rgid, 0, g_groups - 1)
            take = rvalid & (s == 0)
            pending = pending.at[rgi].set(jnp.where(take, rh, pending[rgi]))
            out_toks = out_toks.at[rgi, :, jnp.clip(rec_cnt[rgi], 0,
                                                    n_new - 1)].set(
                jnp.where(take, rtok, out_toks[rgi, :,
                                               jnp.clip(rec_cnt[rgi], 0,
                                                        n_new - 1)]))
            rec_cnt = rec_cnt.at[rgi].set(
                jnp.where(take, rec_cnt[rgi] + 1, rec_cnt[rgi]))

            g0 = i % g_groups
            j0 = i // g_groups
            valid0 = j0 <= n_new - 2
            h = jnp.where(s == 0, pending[g0], rh)
            gid = jnp.where(s == 0, g0, rgid)
            valid = jnp.where(s == 0, valid0, rvalid)
            gi = jnp.clip(gid, 0, g_groups - 1)
            p = lens[gi]
            y = h
            for i_l in range(n_lps):
                lp = jax.tree.map(lambda a, i_l=i_l: a[i_l], lps)
                y, k1, v1 = _step_block(lp, cfg, y, cache_k[i_l, gi],
                                        cache_v[i_l, gi], p,
                                        tp_axis=tp_axis)
                old_k = jax.lax.dynamic_slice_in_dim(
                    cache_k[i_l, gi], p, 1, axis=2)
                old_v = jax.lax.dynamic_slice_in_dim(
                    cache_v[i_l, gi], p, 1, axis=2)
                cache_k = cache_k.at[i_l, gi].set(
                    jax.lax.dynamic_update_slice_in_dim(
                        cache_k[i_l, gi],
                        jnp.where(valid, k1[:, :, None], old_k)
                        .astype(jnp.bfloat16), p, axis=2))
                cache_v = cache_v.at[i_l, gi].set(
                    jax.lax.dynamic_update_slice_in_dim(
                        cache_v[i_l, gi],
                        jnp.where(valid, v1[:, :, None], old_v)
                        .astype(jnp.bfloat16), p, axis=2))
            lens = lens.at[gi].set(jnp.where(valid, p + 1, lens[gi]))
            # last stage: greedy-sample, embed, send the embedding home
            logits = rms_norm(y.astype(jnp.float32), out_norm,
                              cfg.rms_eps) @ head.T.astype(jnp.float32)
            tk = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            send_h = jnp.where(s == n_stages - 1,
                               embd[tk].astype(jnp.bfloat16), y)
            payload = (send_h, gid, tk, valid)
            recv_new = jax.tree.map(
                lambda a: jax.lax.ppermute(a, "pp", ring), payload)
            return (cache_k, cache_v, pending, recv_new, out_toks, lens,
                    rec_cnt), None

        carry = (cache_k, cache_v, pending, recv0, out_toks, lens, rec_cnt)
        carry, _ = jax.lax.scan(tick, carry, jnp.arange(n_ticks))
        out_toks = carry[4]
        return jax.lax.psum(out_toks * (s == 0), "pp")

    from jax.experimental.shard_map import shard_map

    return jax.jit(shard_map(
        stage_fn, mesh=mesh,
        in_specs=(stage_specs, P()),
        out_specs=P(),
        check_rep=False,
    ))(pp_params["stages"], tokens0)
