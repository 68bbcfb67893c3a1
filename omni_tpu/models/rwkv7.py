"""RWKV7 ("Goose") + ARWKV7 — generalized-delta-rule recurrent archs,
GGUF archs "rwkv7" / "arwkv7".

Counterpart of the reference's llm_build_rwkv7 / llm_build_arwkv7
(src/llama-model.cpp, shared llm_build_rwkv7_base time-mix) and the WKV7
recurrence (ggml/src/ggml-cpu/ops.cpp ggml_compute_forward_rwkv_wkv7_f32):

    per head, state S[i, j]  (i: value dim, j: key dim), per token:
        sa[i]  = sum_j a[j] * S[i, j]            (a = -normalize(k*k_k))
        S[i,j] = S[i,j]*w[j] + v[i]*k[j] + sa[i]*b[j]   (b = kk * iclr)
        out[i] = sum_j S[i, j] * r[j]

TPU-first decomposition mirrors rwkv6.py: the fused 5/6-way token-shift
lerp, every low-rank tower (w/a/v/g), the r/k/v projections and the
decay all run OUTSIDE the scan as batched [T, C] MXU matmuls; only the
O(H*D*D) state update lives in one lax.scan. The first layer's value
projection (v_first) threads through all layers as a residual mix.

rwkv7 keeps RWKV's LayerNorm blocks + squared-relu channel mix with one
token-shift row per sublayer (token_shift_count=2); arwkv7 is the
attention-free Qwen-style hybrid: RMS norms, SwiGLU FFN, a single
token-shift row, and no x-gating on the ffn.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..runtime.recurrent import RecurrentCache

GROUPNORM_EPS = 64e-5


@dataclasses.dataclass(frozen=True)
class RWKV7Config:
    n_layers: int
    d_model: int
    head_size: int = 64
    d_ff: int = 0
    ln_eps: float = 1e-5
    n_vocab: int = 256
    arch: str = "rwkv7"   # "rwkv7" | "arwkv7"

    @property
    def n_heads(self) -> int:
        return self.d_model // self.head_size

    @property
    def n_shift(self) -> int:
        return 2 if self.arch == "rwkv7" else 1

    @staticmethod
    def from_gguf(kv: dict[str, Any]) -> "RWKV7Config":
        arch = kv.get("general.architecture", "rwkv7")
        g = lambda key, default: kv.get(f"{arch}.{key}", default)
        d = int(g("embedding_length", 256))
        return RWKV7Config(
            n_layers=int(g("block_count", 2)),
            d_model=d,
            head_size=int(g("wkv.head_size", 64)),
            d_ff=int(g("feed_forward_length", 4 * d)),
            ln_eps=float(g("attention.layer_norm_epsilon",
                           g("attention.layer_norm_rms_epsilon", 1e-5))),
            n_vocab=int(g("vocab_size", 256)),
            arch=arch,
        )


def make_cache(cfg: RWKV7Config, n_seqs: int) -> RecurrentCache:
    """conv slot = [n_shift, C] token-shift rows; ssm slot = [C, D]."""
    return RecurrentCache.create(cfg.n_layers, n_seqs,
                                 d_conv=cfg.n_shift + 1,
                                 d_inner=cfg.d_model, d_state=cfg.head_size)


def _layer_norm(x, w, b, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _rms_norm(x, w, eps):
    return x * jax.lax.rsqrt(
        jnp.mean(jnp.square(x), axis=-1, keepdims=True) + eps) * w


def _time_mix(lp: dict, cfg: RWKV7Config, x: jax.Array, shift: jax.Array,
              wkv0: jax.Array, v_first: jax.Array | None
              ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """x [T, C] (post att-norm) -> (out, new wkv state, v_first)."""
    t, c = x.shape
    h, d = cfg.n_heads, cfg.head_size
    has_gate = lp.get("g1") is not None
    n_br = 6 if has_gate else 5
    x_prev = jnp.concatenate([shift[None, :], x[:-1]], axis=0)
    sx = x_prev - x

    # fused lerp: branches r, w, k, v, a[, g] (time_mix_lerp_fused order)
    br = x[None] + sx[None] * lp["lerp_fused"][:n_br, None, :]
    xr, xw, xk, xv, xa = br[0], br[1], br[2], br[3], br[4]

    r = xr @ lp["receptance"].T
    w = jnp.tanh(xw @ lp["w1"].T) @ lp["w2"].T + lp["w0"]
    w = jnp.exp(-0.606531 * jax.nn.sigmoid(w.astype(jnp.float32)))
    k = xk @ lp["key"].T
    v = xv @ lp["value"].T
    if v_first is None:
        v_first = v
    else:
        mix = jax.nn.sigmoid((xv @ lp["v1"].T) @ lp["v2"].T + lp["v0"])
        v = v + (v_first - v) * mix
    g = None
    if has_gate:
        g = jax.nn.sigmoid(br[5] @ lp["g1"].T) @ lp["g2"].T
    iclr = jax.nn.sigmoid((xa @ lp["a1"].T) @ lp["a2"].T + lp["a0"])

    kk = (k * lp["k_k"]).reshape(t, h, d)
    # ggml_l2_norm: x / max(||x||, eps) with eps = 1e-12
    kk = kk / jnp.maximum(
        jnp.sqrt(jnp.sum(jnp.square(kk), axis=-1, keepdims=True)), 1e-12)
    ka = k * lp["k_a"]
    k = k + iclr * ka - ka

    rh = r.reshape(t, h, d).astype(jnp.float32)
    wh = w.reshape(t, h, d)
    kh = k.reshape(t, h, d).astype(jnp.float32)
    vh = v.reshape(t, h, d).astype(jnp.float32)
    ah = (-kk).astype(jnp.float32)
    bh = (kk * iclr.reshape(t, h, d)).astype(jnp.float32)

    def step(state, inp):
        # state [H, D(i=v), D(j=k)]
        r_t, w_t, k_t, v_t, a_t, b_t = inp
        sa = jnp.einsum("hij,hj->hi", state, a_t)  # [H, D(i)]
        state = (state * w_t[:, None, :]
                 + v_t[:, :, None] * k_t[:, None, :]
                 + sa[:, :, None] * b_t[:, None, :])
        out = jnp.einsum("hij,hj->hi", state, r_t)
        return state, out

    state1, out = jax.lax.scan(step, wkv0.reshape(h, d, d),
                               (rh, wh, kh, vh, ah, bh))
    out = out.reshape(t, h, d)

    if lp.get("ln_w") is not None:
        mu = jnp.mean(out, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(out - mu), axis=-1, keepdims=True)
        out = (out - mu) * jax.lax.rsqrt(var + GROUPNORM_EPS)
        out = out.reshape(t, c) * lp["ln_w"] + lp["ln_b"]
    else:
        out = out.reshape(t, c)

    # bonus term: out += v * sum_head(k * r * r_k)
    rk = jnp.sum(kh * rh * lp["r_k"].reshape(1, h, d), axis=-1,
                 keepdims=True)  # [T, H, 1]
    out = out + (vh * rk).reshape(t, c).astype(out.dtype)
    if g is not None:
        out = out * g
    return out @ lp["output"].T, state1.reshape(c, d), v_first


def _channel_mix(lp: dict, x: jax.Array, shift: jax.Array) -> jax.Array:
    """rwkv7 squared-relu channel mix (build_rwkv7_channel_mix)."""
    x_prev = jnp.concatenate([shift[None, :], x[:-1]], axis=0)
    xk = x + (x_prev - x) * lp["cm_lerp_k"]
    k = jnp.square(jax.nn.relu(xk @ lp["cm_key"].T))
    return k @ lp["cm_value"].T


def forward(params: dict, cfg: RWKV7Config, tokens: jax.Array,
            cache: RecurrentCache, seq_id
            ) -> tuple[jax.Array, RecurrentCache]:
    x = params["token_embd"][tokens].astype(jnp.float32)
    if params.get("tok_norm") is not None:  # rwkv7 embeds through a LN
        x = _layer_norm(x, params["tok_norm"], params["tok_norm_b"],
                        cfg.ln_eps)

    rms = cfg.arch == "arwkv7"
    v_first = None
    new_shifts, new_wkvs = [], []
    for li, lp in enumerate(params["layers"]):
        shifts, wkv0 = cache.read(li, seq_id)
        if rms:
            att_norm = _rms_norm(x, lp["ln1_w"], cfg.ln_eps)
        else:
            att_norm = _layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
        att, wkv1, v_first = _time_mix(lp, cfg, att_norm, shifts[0],
                                       wkv0, v_first)
        x = x + att
        if rms:
            ffn_norm = _rms_norm(x, lp["ln2_w"], cfg.ln_eps)
            gate = jax.nn.silu(ffn_norm @ lp["w_gate"].T)
            x = x + (gate * (ffn_norm @ lp["w_up"].T)) @ lp["w_down"].T
            new_shifts.append(att_norm[-1:])
        else:
            ffn_norm = _layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
            x = x + _channel_mix(lp, ffn_norm, shifts[1])
            new_shifts.append(jnp.stack([att_norm[-1], ffn_norm[-1]]))
        new_wkvs.append(wkv1)

    for li in range(cfg.n_layers):
        cache = cache.write(li, seq_id, new_shifts[li], new_wkvs[li])
    cache = cache.advance(seq_id, tokens.shape[0])

    if cfg.arch == "arwkv7":
        hidden = _rms_norm(x, params["output_norm"], cfg.ln_eps)
    else:
        hidden = _layer_norm(x, params["output_norm"],
                             params["output_norm_b"], cfg.ln_eps)
    head = params.get("output", params["token_embd"])
    return hidden @ head.T.astype(hidden.dtype), cache


def load_params(reader) -> dict:
    """GGUF archs rwkv7/arwkv7 (tensor names per the reference exporter
    Rwkv7Model/ARwkv7Model: lora towers transposed to [out, in],
    lerp vectors fused to time_mix_lerp_fused [n_br, C])."""
    from ..kernels import load_quantized

    def get(name, required=True):
        if name not in reader.tensors:
            if required:
                raise KeyError(f"missing tensor {name}")
            return None
        ti = reader.tensors[name]
        return jnp.asarray(load_quantized(ti.data, ti.ggml_type, ti.shape,
                                          False, dtype=jnp.float32),
                           jnp.float32)

    params = {
        "token_embd": get("token_embd.weight"),
        "tok_norm": get("token_embd_norm.weight", required=False),
        "tok_norm_b": get("token_embd_norm.bias", required=False),
        "output_norm": get("output_norm.weight"),
        "output_norm_b": get("output_norm.bias", required=False),
        "layers": [],
    }
    out = get("output.weight", required=False)
    if out is not None:
        params["output"] = out
    i = 0
    while f"blk.{i}.time_mix_key.weight" in reader.tensors:
        p = f"blk.{i}."
        lp = {
            "ln1_w": get(p + "attn_norm.weight"),
            "ln1_b": get(p + "attn_norm.bias", required=False),
            "ln2_w": get(p + "attn_norm_2.weight", required=False),
            "ln2_b": get(p + "attn_norm_2.bias", required=False),
            "lerp_fused": get(p + "time_mix_lerp_fused.weight"),
            "w0": get(p + "time_mix_w0.weight"),
            "w1": get(p + "time_mix_w1.weight"),
            "w2": get(p + "time_mix_w2.weight"),
            "a0": get(p + "time_mix_a0.weight"),
            "a1": get(p + "time_mix_a1.weight"),
            "a2": get(p + "time_mix_a2.weight"),
            "v0": get(p + "time_mix_v0.weight", required=False),
            "v1": get(p + "time_mix_v1.weight", required=False),
            "v2": get(p + "time_mix_v2.weight", required=False),
            "g1": get(p + "time_mix_g1.weight", required=False),
            "g2": get(p + "time_mix_g2.weight", required=False),
            "k_k": get(p + "time_mix_k_k.weight"),
            "k_a": get(p + "time_mix_k_a.weight"),
            "r_k": get(p + "time_mix_r_k.weight"),
            "receptance": get(p + "time_mix_receptance.weight"),
            "key": get(p + "time_mix_key.weight"),
            "value": get(p + "time_mix_value.weight"),
            "output": get(p + "time_mix_output.weight"),
            "ln_w": get(p + "time_mix_ln.weight", required=False),
            "ln_b": get(p + "time_mix_ln.bias", required=False),
        }
        lp["lerp_fused"] = lp["lerp_fused"].reshape(
            -1, params["token_embd"].shape[1])
        if f"{p}channel_mix_key.weight" in reader.tensors:  # rwkv7
            lp["cm_lerp_k"] = get(p + "channel_mix_lerp_k.weight")
            lp["cm_key"] = get(p + "channel_mix_key.weight")
            lp["cm_value"] = get(p + "channel_mix_value.weight")
        else:  # arwkv7 SwiGLU
            lp["ln2_w"] = get(p + "ffn_norm.weight")
            lp["w_gate"] = get(p + "ffn_gate.weight")
            lp["w_up"] = get(p + "ffn_up.weight")
            lp["w_down"] = get(p + "ffn_down.weight")
        params["layers"].append(lp)
        i += 1
    return params
