"""Pipeline parallelism: layer-split stages with micro-batch pipelining.

Counterpart of the reference's LLAMA_SPLIT_MODE_LAYER
(/root/reference/include/llama.h:190-193 — layers assigned to devices by
tensor_split fractions) plus the backend scheduler's n_copies micro-batch
double-buffering (/root/reference/ggml/src/ggml-backend.cpp:700-714).
TPU-first shape: a `pp` mesh axis holds one layer-stage per device
(stage-stacked parameter pytree sharded on its leading axis), and a
GPipe schedule runs inside ONE `shard_map` — each step every stage
processes its in-flight micro-batch and `ppermute`s activations to the
next stage over ICI/DCN. Embedding and the LM head stay outside (they are
cheap and replicated); the pipeline covers the transformer stack, which
is where the memory and FLOPs live.

Intended for prefill/training scale-out across slices (the SURVEY §2.8
DCN story); decode stays TP (parallel/infer.py) where PP bubbles would
dominate."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels.norms import rms_norm
from ..kernels.rope import apply_rope


def make_pp_mesh(n_stages: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()[:n_stages]
    return Mesh(np.asarray(devices).reshape(n_stages), ("pp",))


def stack_stage_params(params: dict, n_stages: int) -> dict:
    """Dense layer list -> stage-stacked pytree: every layer-leaf becomes
    [n_stages, layers_per_stage, ...] (leading axis shards over `pp`)."""
    layers = params["layers"]
    assert len(layers) % n_stages == 0, (len(layers), n_stages)
    lps = len(layers) // n_stages

    def stack(leaves):
        return jnp.stack([jnp.stack(leaves[s * lps:(s + 1) * lps])
                          for s in range(n_stages)])

    keys = [k for k, v in layers[0].items() if v is not None]
    stacked = {k: stack([l[k] for l in layers]) for k in keys}
    return {
        "stages": stacked,
        "token_embd": params["token_embd"],
        "output_norm": params["output_norm"],
        "output": params.get("output"),
    }


def _block(lp: dict, cfg, h: jax.Array, pos: jax.Array,
           causal: jax.Array) -> jax.Array:
    """One decoder block over [B, T, d] (cache-free; mirrors
    qwen3.forward_train's layer body)."""
    b, t, _ = h.shape

    def lin(x, w):
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    h_in = h
    hn = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
    q = lin(hn, lp["wq"]).reshape(b, t, cfg.n_heads, cfg.head_dim)
    k = lin(hn, lp["wk"]).reshape(b, t, cfg.n_kv_heads, cfg.head_dim)
    v = lin(hn, lp["wv"]).reshape(b, t, cfg.n_kv_heads, cfg.head_dim)
    if "q_norm" in lp:
        q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
    if "k_norm" in lp:
        k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
    q = apply_rope(q, pos[None, :], cfg.rope_base, neox=cfg.rope_neox)
    k = apply_rope(k, pos[None, :], cfg.rope_base, neox=cfg.rope_neox)
    g = cfg.n_heads // cfg.n_kv_heads
    qg = q.reshape(b, t, cfg.n_kv_heads, g, cfg.head_dim)
    scores = jnp.einsum("bthgd,bshd->bhgts", qg, k,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(causal[None, None, None],
                       scores / (cfg.head_dim ** 0.5), -1e30)
    p = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
    attn = jnp.einsum("bhgts,bshd->bthgd", p, v,
                      preferred_element_type=jnp.float32)
    attn = attn.reshape(b, t, cfg.n_heads * cfg.head_dim).astype(jnp.bfloat16)
    h = h_in + lin(attn, lp["wo"])
    h_in = h
    hn = rms_norm(h, lp["ffn_norm"], cfg.rms_eps)
    gate = jax.nn.silu(lin(hn, lp["w_gate"]).astype(jnp.float32)).astype(jnp.bfloat16)
    return h_in + lin(gate * lin(hn, lp["w_up"]), lp["w_down"])


def pp_forward(pp_params: dict, cfg, tokens: jax.Array, mesh: Mesh,
               n_micro: int) -> jax.Array:
    """[B, T] tokens -> [B, T, vocab] f32 logits through the pipelined
    stack. B must divide into n_micro micro-batches; schedule length is
    n_micro + n_stages - 1 steps (the GPipe fill+drain)."""
    n_stages = mesh.shape["pp"]
    b, t = tokens.shape
    assert b % n_micro == 0, (b, n_micro)
    mb = b // n_micro
    pos = jnp.arange(t, dtype=jnp.int32)
    causal = jnp.tril(jnp.ones((t, t), bool))
    h0 = pp_params["token_embd"][tokens].astype(jnp.bfloat16)
    xs = h0.reshape(n_micro, mb, t, -1)

    stage_specs = jax.tree.map(lambda _: P("pp"), pp_params["stages"])

    def stage_fn(stages, xs):
        # stages: leaves [1, Lps, ...] (this device's stage)
        s = jax.lax.axis_index("pp")
        lps = jax.tree.map(lambda a: a[0], stages)
        n_layers_stage = next(iter(lps.values())).shape[0]

        def apply_stage(h):
            for i in range(n_layers_stage):
                lp = jax.tree.map(lambda a: a[i], lps)
                h = _block(lp, cfg, h, pos, causal)
            return h

        zero = jnp.zeros_like(xs[0])
        recv = zero
        outs = jnp.zeros((n_micro,) + xs.shape[1:], xs.dtype)
        for step in range(n_micro + n_stages - 1):
            m_in = step  # microbatch entering stage 0 this step
            inp = jnp.where(s == 0,
                            xs[min(m_in, n_micro - 1)]
                            if m_in < n_micro else zero,
                            recv)
            y = apply_stage(inp)
            # hand off to the next stage over the ring (last stage's send
            # wraps to 0 and is ignored there)
            recv = jax.lax.ppermute(
                y, "pp", [(i, (i + 1) % n_stages) for i in range(n_stages)])
            m_out = step - (n_stages - 1)  # microbatch leaving the last stage
            if 0 <= m_out < n_micro:
                outs = outs.at[m_out].set(
                    jnp.where(s == n_stages - 1, y, outs[m_out]))
        # broadcast the last stage's outputs to every device
        keep = (s == n_stages - 1).astype(outs.dtype)
        return jax.lax.psum(outs * keep, "pp")

    from jax.experimental.shard_map import shard_map

    out = jax.jit(shard_map(
        stage_fn, mesh=mesh,
        in_specs=(stage_specs, P()),
        out_specs=P(),
        check_rep=False,
    ))(pp_params["stages"], xs)
    h = out.reshape(b, t, -1)
    hidden = rms_norm(h, pp_params["output_norm"], cfg.rms_eps)
    head = (pp_params["output"] if pp_params.get("output") is not None
            else pp_params["token_embd"])
    return jax.lax.dot_general(
        hidden.astype(jnp.bfloat16), head.astype(jnp.bfloat16),
        (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32)


def shard_pp_params(pp_params: dict, mesh: Mesh) -> dict:
    """Place the stage stack on the pp axis; everything else replicated."""
    out = {}
    for k, v in pp_params.items():
        if k == "stages":
            out[k] = jax.tree.map(
                lambda a: jax.device_put(a, NamedSharding(mesh, P("pp"))), v)
        elif v is not None:
            out[k] = jax.device_put(v, NamedSharding(mesh, P()))
        else:
            out[k] = None
    return out
