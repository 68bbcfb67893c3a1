"""Upsample conformer encoder (token → pre-mel features).

Contract from the reference (/root/reference/tools/omni/token2wav/
token2wav-impl.{h,cpp} upsample_encoder_v2): config (512, 512,
pre_lookahead=3, 6 blocks, 4 up-blocks, up_stride=2, up_scale=2, 8 heads,
ffn 2048, pre-norm):

  token-embed[C=512] → embed (linear+LN(1e-5), ×√d Espnet scaling)
  → PreLookaheadLayer (conv k4 right-pad-3 → leaky_relu(0.01) → conv k3
    left-ctx-2 → +residual)
  → 6 × conformer layers (rel-pos MHA + swish FFN, pre-norm)
  → Upsample1D (nearest ×2, left-ctx 4, conv) → up_embed (linear+LN+scale)
  → 4 × conformer layers → after-norm LN.

Rel-pos attention (Espnet): score = ((q+u)·k + B)/√d with
B[tq,tk] = (q+v)·P(relpos = tq_abs − tk), P computed analytically
(P[2j]=sin(rel·ω_j), P[2j+1]=cos(rel·ω_j), ω_j = 10000^(−2j/d)).

Streaming is expressed as growing per-layer K/V history (identical data to
the reference's packed att_cache) plus the two conv tails; each chunk of 28
tokens attends over the full cached history with full attention inside the
window. Chunk processing == full recompute of that layer's keys, so we keep
explicit histories with fixed max length.
"""

from __future__ import annotations

import dataclasses

import functools

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ConformerConfig:
    d_model: int = 512
    n_heads: int = 8
    d_ff: int = 2048
    n_blocks: int = 6
    n_up_blocks: int = 4
    pre_lookahead: int = 3
    up_stride: int = 2
    ln_eps: float = 1e-5
    max_tokens: int = 320  # stage-1 history cap (tokens incl. prompt)

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ConformerState:
    k1: jax.Array  # [L1, Tmax, H, D] stage-1 K history (post-bias-u side raw k)
    v1: jax.Array
    n1: jax.Array  # [] int32
    k2: jax.Array  # [L2, 2*Tmax, H, D]
    v2: jax.Array
    n2: jax.Array
    prelook_tail: jax.Array  # [2, d] conv2 left context
    up_tail: jax.Array  # [up_stride*2, d] upsample conv left context

    @staticmethod
    def create(cfg: ConformerConfig, dtype=jnp.float32) -> "ConformerState":
        t1 = cfg.max_tokens
        return ConformerState(
            k1=jnp.zeros((cfg.n_blocks, t1, cfg.n_heads, cfg.head_dim), dtype),
            v1=jnp.zeros((cfg.n_blocks, t1, cfg.n_heads, cfg.head_dim), dtype),
            n1=jnp.int32(0),
            k2=jnp.zeros((cfg.n_up_blocks, 2 * t1, cfg.n_heads, cfg.head_dim), dtype),
            v2=jnp.zeros((cfg.n_up_blocks, 2 * t1, cfg.n_heads, cfg.head_dim), dtype),
            n2=jnp.int32(0),
            prelook_tail=jnp.zeros((2, cfg.d_model), dtype),
            up_tail=jnp.zeros((cfg.up_stride * 2, cfg.d_model), dtype),
        )


def _lin(x, w, b=None):
    out = jnp.einsum("...d,nd->...n", x, w, preferred_element_type=jnp.float32)
    return out + b if b is not None else out


def _ln(x, w, b, eps):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * w + b


def _conv1d(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """x [T, C], w [Cout, Cin, K], VALID."""
    y = jax.lax.conv_general_dilated(
        x[None], w, (1,), padding="VALID", dimension_numbers=("NTC", "OIT", "NTC"))[0]
    return y + b


def rel_pos_attention(
    x: jax.Array,  # [T, d] current chunk (post norm_mha)
    lp: dict,
    cfg: ConformerConfig,
    k_hist: jax.Array,  # [Tmax, H, D]
    v_hist: jax.Array,
    n_hist: jax.Array,
    offset: jax.Array,  # absolute position of chunk start
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Espnet rel-pos MHA over [history; chunk]. Returns (out, k_new, v_new)."""
    t = x.shape[0]
    h, d = cfg.n_heads, cfg.head_dim
    q = _lin(x, lp["q_w"], lp["q_b"]).reshape(t, h, d)
    k = _lin(x, lp["k_w"], lp["k_b"]).reshape(t, h, d)
    v = _lin(x, lp["v_w"], lp["v_b"]).reshape(t, h, d)

    tmax = k_hist.shape[0]
    k_all = jnp.concatenate([k_hist.astype(k.dtype), k], axis=0)  # [Tmax+T, H, D]
    v_all = jnp.concatenate([v_hist.astype(v.dtype), v], axis=0)
    valid = jnp.concatenate([jnp.arange(tmax) < n_hist, jnp.ones((t,), bool)])
    # absolute position of each key row: history rows are 0..n_hist-1
    key_pos = jnp.concatenate([jnp.arange(tmax), offset + jnp.arange(t)])
    q_pos = offset + jnp.arange(t)

    # content term
    qu = q + lp["pos_bias_u"]  # [T, H, D]
    ac = jnp.einsum("thd,shd->hts", qu, k_all, preferred_element_type=jnp.float32)

    # positional term: P(rel) projected through linear_pos
    rel = q_pos[:, None] - key_pos[None, :]  # [T, S]
    half = cfg.d_model // 2
    omega = 1.0 / (10000.0 ** (2.0 * jnp.arange(half) / cfg.d_model))
    ang = rel[:, :, None].astype(jnp.float32) * omega  # [T, S, half]
    pe = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1).reshape(t, rel.shape[1], cfg.d_model)
    p = _lin(pe, lp["pos_w"]).reshape(t, rel.shape[1], h, d)  # no bias
    qv = q + lp["pos_bias_v"]
    bd = jnp.einsum("thd,tshd->hts", qv, p, preferred_element_type=jnp.float32)

    scores = (ac + bd) / np.sqrt(d)
    scores = jnp.where(valid[None, None, :], scores, -1e30)
    att = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hts,shd->thd", att, v_all, preferred_element_type=jnp.float32)
    out = _lin(out.reshape(t, cfg.d_model), lp["o_w"], lp["o_b"])
    return out, k, v


def _encoder_stack(x, layers, cfg, k_hist, v_hist, n_hist, offset):
    new_k, new_v = [], []
    for li, lp in enumerate(layers):
        xn = _ln(x, lp["norm_mha_w"], lp["norm_mha_b"], cfg.ln_eps)
        att, kc, vc = rel_pos_attention(xn, lp, cfg, k_hist[li], v_hist[li],
                                        n_hist, offset)
        x = x + att
        xn = _ln(x, lp["norm_ff_w"], lp["norm_ff_b"], cfg.ln_eps)
        ff = _lin(jax.nn.silu(_lin(xn, lp["ff1_w"], lp["ff1_b"])),
                  lp["ff2_w"], lp["ff2_b"])
        x = x + ff
        new_k.append(kc)
        new_v.append(vc)
    return x, jnp.stack(new_k), jnp.stack(new_v)


@functools.partial(jax.jit, static_argnames=('cfg', 'last_chunk'))
def encode_chunk(
    params: dict, cfg: ConformerConfig,
    xs: jax.Array,  # [T, 512] token embeddings for this chunk
    state: ConformerState,
    last_chunk: bool = False,
) -> tuple[jax.Array, ConformerState]:
    """One streaming chunk -> ([T_out, 512] features, new state).
    T_out = 2*T normally (lookahead consumes `pre_lookahead` when not final)."""
    scale = np.sqrt(cfg.d_model)
    x = _ln(_lin(xs, params["embed_w"], params["embed_b"]),
            params["embed_ln_w"], params["embed_ln_b"], cfg.ln_eps) * scale

    if last_chunk:
        x = jnp.concatenate([x, jnp.zeros((cfg.pre_lookahead, cfg.d_model), x.dtype)])

    # pre-lookahead layer: conv1 (k = pre+1, consumes `pre` future frames)
    y1 = _conv1d(x, params["prelook1_w"], params["prelook1_b"])
    y1 = jnp.where(y1 >= 0, y1, 0.01 * y1)  # leaky_relu
    new_prelook_tail = y1[-2:]
    y1c = jnp.concatenate([state.prelook_tail.astype(y1.dtype), y1], axis=0)
    y2 = _conv1d(y1c, params["prelook2_w"], params["prelook2_b"])
    t1 = y1.shape[0]
    x = y2 + x[:t1]

    # stage-1 conformer layers
    x, k1c, v1c = _encoder_stack(x, params["encoders"], cfg,
                                 state.k1, state.v1, state.n1, state.n1)

    # upsample ×2 (nearest) + conv with left context of up_stride*2
    up = jnp.repeat(x, 2, axis=0)
    upc = jnp.concatenate([state.up_tail.astype(up.dtype), up], axis=0)
    new_up_tail = upc[-cfg.up_stride * 2:]
    xu = _conv1d(upc, params["up_conv_w"], params["up_conv_b"])

    x2 = _ln(_lin(xu, params["up_embed_w"], params["up_embed_b"]),
             params["up_embed_ln_w"], params["up_embed_ln_b"], cfg.ln_eps) * scale

    x2, k2c, v2c = _encoder_stack(x2, params["up_encoders"], cfg,
                                  state.k2, state.v2, state.n2, state.n2)
    x2 = _ln(x2, params["after_norm_w"], params["after_norm_b"], cfg.ln_eps)

    def push(hist, chunk, n):
        return jax.lax.dynamic_update_slice_in_dim(
            hist, chunk.astype(hist.dtype), n, axis=1)

    state = ConformerState(
        k1=push(state.k1, k1c, state.n1), v1=push(state.v1, v1c, state.n1),
        n1=state.n1 + t1,
        k2=push(state.k2, k2c, state.n2), v2=push(state.v2, v2c, state.n2),
        n2=state.n2 + x2.shape[0],
        prelook_tail=new_prelook_tail.astype(state.prelook_tail.dtype),
        up_tail=new_up_tail.astype(state.up_tail.dtype),
    )
    return x2, state


def load_conformer_params(reader) -> tuple[dict, ConformerConfig]:
    from ...core import quants

    def get(name):
        ti = reader.tensors[name]
        return jnp.asarray(quants.dequantize(ti.data, ti.ggml_type, ti.shape))

    p = {
        "embed_w": get("embed.out.0.weight"), "embed_b": get("embed.out.0.bias"),
        "embed_ln_w": get("embed.out.1.weight"), "embed_ln_b": get("embed.out.1.bias"),
        "prelook1_w": get("pre_lookahead_layer.conv1.weight"),
        "prelook1_b": get("pre_lookahead_layer.conv1.bias"),
        "prelook2_w": get("pre_lookahead_layer.conv2.weight"),
        "prelook2_b": get("pre_lookahead_layer.conv2.bias"),
        "up_conv_w": get("up_layer.conv.weight"),
        "up_conv_b": get("up_layer.conv.bias"),
        "up_embed_w": get("up_embed.out.0.weight"), "up_embed_b": get("up_embed.out.0.bias"),
        "up_embed_ln_w": get("up_embed.out.1.weight"), "up_embed_ln_b": get("up_embed.out.1.bias"),
        "after_norm_w": get("after_norm.weight"), "after_norm_b": get("after_norm.bias"),
        "encoders": [], "up_encoders": [],
    }

    def load_layers(prefix, out):
        i = 0
        while f"{prefix}.{i}.norm_ff.weight" in reader.tensors:
            b = f"{prefix}.{i}."
            out.append({
                "norm_ff_w": get(b + "norm_ff.weight"), "norm_ff_b": get(b + "norm_ff.bias"),
                "norm_mha_w": get(b + "norm_mha.weight"), "norm_mha_b": get(b + "norm_mha.bias"),
                "q_w": get(b + "self_attn.linear_q.weight"), "q_b": get(b + "self_attn.linear_q.bias"),
                "k_w": get(b + "self_attn.linear_k.weight"), "k_b": get(b + "self_attn.linear_k.bias"),
                "v_w": get(b + "self_attn.linear_v.weight"), "v_b": get(b + "self_attn.linear_v.bias"),
                "o_w": get(b + "self_attn.linear_out.weight"), "o_b": get(b + "self_attn.linear_out.bias"),
                "pos_w": get(b + "self_attn.linear_pos.weight"),
                "pos_bias_u": get(b + "self_attn.pos_bias_u"),
                "pos_bias_v": get(b + "self_attn.pos_bias_v"),
                "ff1_w": get(b + "feed_forward.w_1.weight"), "ff1_b": get(b + "feed_forward.w_1.bias"),
                "ff2_w": get(b + "feed_forward.w_2.weight"), "ff2_b": get(b + "feed_forward.w_2.bias"),
            })
            i += 1

    load_layers("encoders", p["encoders"])
    load_layers("up_encoders", p["up_encoders"])
    d = int(p["embed_w"].shape[0])
    cfg = ConformerConfig(d_model=d, n_blocks=len(p["encoders"]),
                          n_up_blocks=len(p["up_encoders"]),
                          n_heads=int(p["encoders"][0]["pos_bias_u"].shape[0]),
                          d_ff=int(p["encoders"][0]["ff1_w"].shape[0]))
    return p, cfg
