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

Covers prefill/training scale-out across slices (the SURVEY §2.8 DCN
story); DECODE pipelines too — pp_decode.py streams G groups around the
ring continuously so the fill bubble amortises over the whole generation
(the reference scheduler's n_copies overlap, ggml-backend.cpp:700-714)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels.norms import rms_norm
from ..kernels.rope import apply_rope


def make_pp_mesh(n_stages: int, n_tp: int = 1, devices=None) -> Mesh:
    """(pp,) or (pp, tp) mesh. With n_tp > 1 each pipeline stage is itself
    megatron-TP-sharded (the PP+TP composition the reference cannot express
    — its LAYER and ROW split modes are mutually exclusive,
    /root/reference/include/llama.h:190-193)."""
    n = n_stages * n_tp
    devices = devices if devices is not None else jax.devices()[:n]
    if n_tp == 1:
        return Mesh(np.asarray(devices).reshape(n_stages), ("pp",))
    return Mesh(np.asarray(devices).reshape(n_stages, n_tp), ("pp", "tp"))


# megatron layout within a stage: [S, Lps, out, in] leaves
_TP_COL = {"wq", "wk", "wv", "w_gate", "w_up"}   # shard out (axis 2)
_TP_ROW = {"wo", "w_down"}                        # shard in (axis 3)


def stage_param_specs(stacked: dict, n_tp: int) -> dict:
    specs = {}
    for k in stacked:
        if n_tp > 1 and k in _TP_COL:
            specs[k] = P("pp", None, "tp")
        elif n_tp > 1 and k in _TP_ROW:
            specs[k] = P("pp", None, None, "tp")
        else:
            specs[k] = P("pp")
    return specs


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
           causal: jax.Array, tp_axis: str | None = None,
           return_kv: bool = False):
    """One decoder block over [B, T, d] (cache-free; mirrors
    qwen3.forward_train's layer body). Head counts come from the local
    weight shapes, so the same body serves replicated and TP-sharded
    stages; with `tp_axis`, wo/w_down are row-parallel partial products
    reduced with a psum over that mesh axis (megatron layout).
    return_kv=True also hands back the post-rope K/V ([B, T, Hkv, D]) so
    pipelined decode (pp_decode.py) can seed its stage-local caches."""
    b, t, _ = h.shape
    n_heads = lp["wq"].shape[0] // cfg.head_dim
    n_kv_heads = lp["wk"].shape[0] // cfg.head_dim

    def lin(x, w):
        return jax.lax.dot_general(
            x.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (((2,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    def reduce_rows(x):
        if tp_axis is None:
            return x
        return jax.lax.psum(x.astype(jnp.float32), tp_axis).astype(x.dtype)

    h_in = h
    hn = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
    q = lin(hn, lp["wq"]).reshape(b, t, n_heads, cfg.head_dim)
    k = lin(hn, lp["wk"]).reshape(b, t, n_kv_heads, cfg.head_dim)
    v = lin(hn, lp["wv"]).reshape(b, t, n_kv_heads, cfg.head_dim)
    if "q_norm" in lp:
        q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
    if "k_norm" in lp:
        k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
    q = apply_rope(q, pos[None, :], cfg.rope_base, neox=cfg.rope_neox)
    k = apply_rope(k, pos[None, :], cfg.rope_base, neox=cfg.rope_neox)
    g = n_heads // n_kv_heads
    qg = q.reshape(b, t, n_kv_heads, g, cfg.head_dim)
    scores = jnp.einsum("bthgd,bshd->bhgts", qg, k,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(causal[None, None, None],
                       scores / (cfg.head_dim ** 0.5), -1e30)
    p = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
    attn = jnp.einsum("bhgts,bshd->bthgd", p, v,
                      preferred_element_type=jnp.float32)
    attn = attn.reshape(b, t, n_heads * cfg.head_dim).astype(jnp.bfloat16)
    h = h_in + reduce_rows(lin(attn, lp["wo"]))
    h_in = h
    hn = rms_norm(h, lp["ffn_norm"], cfg.rms_eps)
    gate = jax.nn.silu(lin(hn, lp["w_gate"]).astype(jnp.float32)).astype(jnp.bfloat16)
    out = h_in + reduce_rows(lin(gate * lin(hn, lp["w_up"]), lp["w_down"]))
    if return_kv:
        return out, (k, v)
    return out


def pp_forward(pp_params: dict, cfg, tokens: jax.Array, mesh: Mesh,
               n_micro: int) -> jax.Array:
    """[B, T] tokens -> [B, T, vocab] f32 logits through the pipelined
    stack. B must divide into n_micro micro-batches; schedule length is
    n_micro + n_stages - 1 steps (the GPipe fill+drain)."""
    n_stages = mesh.shape["pp"]
    n_tp = mesh.shape.get("tp", 1)
    tp_axis = "tp" if n_tp > 1 else None
    b, t = tokens.shape
    assert b % n_micro == 0, (b, n_micro)
    mb = b // n_micro
    pos = jnp.arange(t, dtype=jnp.int32)
    causal = jnp.tril(jnp.ones((t, t), bool))
    h0 = pp_params["token_embd"][tokens].astype(jnp.bfloat16)
    xs = h0.reshape(n_micro, mb, t, -1)

    stage_specs = stage_param_specs(pp_params["stages"], n_tp)

    def stage_fn(stages, xs):
        # stages: leaves [1, Lps, ...] (this device's stage, tp-local slice)
        s = jax.lax.axis_index("pp")
        lps = jax.tree.map(lambda a: a[0], stages)
        n_layers_stage = next(iter(lps.values())).shape[0]

        def apply_stage(h):
            for i in range(n_layers_stage):
                lp = jax.tree.map(lambda a: a[i], lps)
                h = _block(lp, cfg, h, pos, causal, tp_axis=tp_axis)
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
    """Place the stage stack on the pp (and, if present, tp) axes;
    everything else replicated."""
    n_tp = mesh.shape.get("tp", 1)
    out = {}
    for k, v in pp_params.items():
        if k == "stages":
            specs = stage_param_specs(v, n_tp)
            out[k] = {
                name: jax.device_put(a, NamedSharding(mesh, specs[name]))
                for name, a in v.items()
            }
        elif v is not None:
            out[k] = jax.device_put(v, NamedSharding(mesh, P()))
        else:
            out[k] = None
    return out
