"""RWKV6 ("Finch") — linear-attention recurrent arch, GGUF archs "rwkv6"
and "rwkv6qwen2" (QRWKV: qwen2 topology — RMS norms, SwiGLU FFN, GQA,
single token-shift — with gated-linear-attention time mixing,
llm_build_rwkv6qwen2 src/llama-model.cpp:15574 + ggml_gated_linear_attn
ops.cpp:9393: k pre-scaled by (1-w), output reads the updated state with
r scaled by head_size^-0.5, sigmoid gate, no bonus/group-norm).

Counterpart of the reference's llm_build_rwkv6 (src/llama-model.cpp:15473,
time/channel mix at :15265-15471) and the WKV6 recurrence op
(ggml/src/ggml-cpu/ops.cpp:9177 ggml_compute_forward_rwkv_wkv6_f32):

    per head h, state S[i, j]  (i: k-dim, j: v-dim), per token t:
        kv[i,j] = k[i] * v[j]
        out[j]  = sum_i r[i] * (first[i] * kv[i,j] + S[i,j])
        S[i,j]  = S[i,j] * w[i] + kv[i,j]        (w = per-token decay)

TPU-first decomposition: everything data-parallel over T — token-shift
lerps, the 5-way low-rank lerp tower (w1/w2), r/k/v/g projections, and the
data-dependent decay — runs OUTSIDE the scan as batched [T, C] matmuls on
the MXU; only the O(H*D*D) state recurrence lives inside one lax.scan.
Prefill (T>1) and decode (T=1) share the step function, so chunked prefill
followed by stepwise decode is exactly equal to all-at-once evaluation.

State carried in RecurrentCache: the "conv" slot holds the two token-shift
rows [2, C] (att_norm / ffn_norm of the last token — the reference's
token_shift_count == 2), the "ssm" slot holds the WKV state flattened to
[H*D, D] = [C, D].
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..runtime.recurrent import RecurrentCache

GROUPNORM_EPS = 64e-5  # reference hardcodes 64e-5 for the per-head norm


@dataclasses.dataclass(frozen=True)
class RWKV6Config:
    n_layers: int
    d_model: int
    head_size: int = 64
    d_ff: int = 0  # channel-mix hidden size
    rescale_every: int = 0  # halve the residual stream every n layers
    ln_eps: float = 1e-5
    n_vocab: int = 256
    arch: str = "rwkv6"   # "rwkv6" | "rwkv6qwen2" (QRWKV: GLA time mix)
    n_kv_heads: int = 0   # rwkv6qwen2 GQA: k/v project to n_kv_heads*D

    @property
    def n_heads(self) -> int:
        return self.d_model // self.head_size

    @staticmethod
    def from_gguf(kv: dict[str, Any]) -> "RWKV6Config":
        arch = kv.get("general.architecture", "rwkv6")
        g = lambda key, default: kv.get(f"{arch}.{key}", default)
        d = int(g("embedding_length", 256))
        return RWKV6Config(
            n_layers=int(g("block_count", 2)),
            d_model=d,
            head_size=int(g("wkv.head_size", 64)),
            d_ff=int(g("feed_forward_length", int(d * 3.5) // 32 * 32)),
            rescale_every=int(g("rescale_every_n_layers", 0)),
            ln_eps=float(g("attention.layer_norm_epsilon",
                           g("attention.layer_norm_rms_epsilon", 1e-5))),
            n_vocab=int(g("vocab_size", 256)),
            arch=arch,
            n_kv_heads=int(g("attention.head_count_kv", 0) or 0),
        )


def make_cache(cfg: RWKV6Config, n_seqs: int) -> RecurrentCache:
    """conv slot = [2, C] token-shift rows; ssm slot = [C, D] WKV state."""
    return RecurrentCache.create(cfg.n_layers, n_seqs, d_conv=3,
                                 d_inner=cfg.d_model, d_state=cfg.head_size)


def _layer_norm(x: jax.Array, w: jax.Array, b: jax.Array,
                eps: float) -> jax.Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * w + b


def _rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(var + eps) * w


def _time_mix(lp: dict, cfg: RWKV6Config, x: jax.Array, shift: jax.Array,
              wkv0: jax.Array) -> tuple[jax.Array, jax.Array]:
    """x [T, C] (post att-norm), shift [C] = last token of the previous
    chunk's att-norm, wkv0 [C, D] carried state. Returns (out [T, C],
    new wkv state). build_rwkv6_time_mix, llama-model.cpp:15300."""
    t, c = x.shape
    h, d = cfg.n_heads, cfg.head_size
    x_prev = jnp.concatenate([shift[None, :], x[:-1]], axis=0)
    sx = x_prev - x

    # 5-way low-rank lerp tower: tanh(x @ w1) -> [T, 5, W] -> per-branch W->C
    xxx = x + sx * lp["lerp_x"]
    a = jnp.tanh(xxx @ lp["w1"].T).reshape(t, 5, -1)  # [T, 5, W]
    # w2 [5, C, W]: branch order w, k, v, r, g (converter fusion order)
    branches = jnp.einsum("tfw,fcw->ftc", a, lp["w2"])  # [5, T, C]
    xw, xk, xv, xr, xg = [
        x + (branches[i] + lp["lerp_fused"][i]) * sx for i in range(5)]

    qrwkv = cfg.arch == "rwkv6qwen2"  # llama-model.cpp:15320 is_qrwkv
    r = xr @ lp["receptance"].T  # [T, C]
    k = xk @ lp["key"].T
    v = xv @ lp["value"].T
    if lp.get("receptance_b") is not None:  # qwen2-style qkv biases
        r = r + lp["receptance_b"]
        k = k + lp["key_b"]
        v = v + lp["value_b"]
    gate = xg @ lp["gate"].T
    g = jax.nn.sigmoid(gate) if qrwkv else jax.nn.silu(gate)

    # data-dependent decay: w = exp(-exp(decay_w2 @ tanh(decay_w1 @ xw) + b))
    w = jnp.tanh(xw @ lp["decay_w1"].T) @ lp["decay_w2"].T + lp["decay"]
    w = jnp.exp(-jnp.exp(w.astype(jnp.float32)))

    if qrwkv and cfg.n_kv_heads and cfg.n_kv_heads != h:
        # GQA: repeat k/v heads up to n_head (llama-model.cpp:15398-15406)
        rep = h // cfg.n_kv_heads
        k = jnp.repeat(k.reshape(t, cfg.n_kv_heads, 1, d), rep,
                       axis=2).reshape(t, c)
        v = jnp.repeat(v.reshape(t, cfg.n_kv_heads, 1, d), rep,
                       axis=2).reshape(t, c)

    rh = r.reshape(t, h, d).astype(jnp.float32)
    kh = k.reshape(t, h, d).astype(jnp.float32)
    vh = v.reshape(t, h, d).astype(jnp.float32)
    wh = w.reshape(t, h, d)

    if qrwkv:
        # gated linear attention (ggml_gated_linear_attn, ops.cpp:9393):
        # k pre-scaled by (1-w); output reads the UPDATED state, scaled
        # r by head_size^-0.5; no bonus term, no group norm / ln_x
        kh = kh * (1.0 - wh)
        scale = float(d) ** -0.5

        def step(state, inp):
            r_t, k_t, v_t, w_t = inp
            kv = k_t[:, :, None] * v_t[:, None, :]  # [H, D(i), D(j)]
            state = state * w_t[:, :, None] + kv
            return state, jnp.einsum("hi,hij->hj", r_t * scale, state)

        state1, out = jax.lax.scan(step, wkv0.reshape(h, d, d),
                                   (rh, kh, vh, wh))
        out = out.reshape(t, c)
    else:
        first = lp["first"].astype(jnp.float32)  # [H, D]

        def step(state, inp):
            # state [H, D, D]; r/k/v/w [H, D]
            r_t, k_t, v_t, w_t = inp
            kv = k_t[:, :, None] * v_t[:, None, :]  # [H, D(i), D(j)]
            out = jnp.einsum("hi,hij->hj", r_t,
                             first[:, :, None] * kv + state)
            return state * w_t[:, :, None] + kv, out

        state1, out = jax.lax.scan(step, wkv0.reshape(h, d, d),
                                   (rh, kh, vh, wh))
        out = out.reshape(t, h, d)

        # per-head group norm (ggml_norm eps 64e-5, no scale) then
        # full-width affine ln_x — llama-model.cpp:15452-15459
        mu = jnp.mean(out, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(out - mu), axis=-1, keepdims=True)
        out = (out - mu) * jax.lax.rsqrt(var + GROUPNORM_EPS)
        out = out.reshape(t, c) * lp["ln_w"] + lp["ln_b"]

    out = out.astype(x.dtype) * g
    return out @ lp["output"].T, state1.reshape(c, d)


def _channel_mix(lp: dict, x: jax.Array, shift: jax.Array) -> jax.Array:
    """x [T, C] (post ffn-norm). build_rwkv6_channel_mix,
    llama-model.cpp:15271: r = sigmoid(Wr xr), k = relu(Wk xk)^2,
    out = r * (Wv k)."""
    x_prev = jnp.concatenate([shift[None, :], x[:-1]], axis=0)
    sx = x_prev - x
    xk = x + sx * lp["cm_lerp_k"]
    xr = x + sx * lp["cm_lerp_r"]
    r = jax.nn.sigmoid(xr @ lp["cm_receptance"].T)
    k = jnp.square(jax.nn.relu(xk @ lp["cm_key"].T))
    return r * (k @ lp["cm_value"].T)


def forward(params: dict, cfg: RWKV6Config, tokens: jax.Array,
            cache: RecurrentCache, seq_id) -> tuple[jax.Array, RecurrentCache]:
    """[T] tokens for one sequence -> (logits [T, V], updated cache).
    T=1 is decode, T>1 chunked prefill — identical math either way."""
    qrwkv = cfg.arch == "rwkv6qwen2"
    x = params["token_embd"][tokens].astype(jnp.float32)  # [T, C]
    if not qrwkv:
        x = _layer_norm(x, params["tok_norm"], params["tok_norm_b"],
                        cfg.ln_eps)

    new_shifts, new_wkvs = [], []
    for li, lp in enumerate(params["layers"]):
        shifts, wkv0 = cache.read(li, seq_id)  # [2, C], [C, D]

        if qrwkv:
            # llm_build_rwkv6qwen2 (llama-model.cpp:15574): RMS norms, a
            # single token-shift row, qwen2 SwiGLU FFN, no rescale
            att_norm = _rms_norm(x, lp["ln1_w"], cfg.ln_eps)
            att, wkv1 = _time_mix(lp, cfg, att_norm, shifts[0], wkv0)
            x = x + att
            ffn_norm = _rms_norm(x, lp["ln2_w"], cfg.ln_eps)
            ff = (jax.nn.silu(ffn_norm @ lp["w_gate"].T)
                  * (ffn_norm @ lp["w_up"].T)) @ lp["w_down"].T
            x = x + ff
            new_shifts.append(jnp.stack([att_norm[-1], att_norm[-1]]))
            new_wkvs.append(wkv1)
            continue

        att_norm = _layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
        att, wkv1 = _time_mix(lp, cfg, att_norm, shifts[0], wkv0)
        x = x + att

        ffn_norm = _layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
        x = x + _channel_mix(lp, ffn_norm, shifts[1])

        # reference rescale: weights were pre-divided by 2^(l//n) at
        # conversion; the runtime halves the stream every n layers
        if cfg.rescale_every > 0 and (li + 1) % cfg.rescale_every == 0:
            x = x * 0.5

        new_shifts.append(jnp.stack([att_norm[-1], ffn_norm[-1]]))
        new_wkvs.append(wkv1)

    for li in range(cfg.n_layers):
        cache = cache.write(li, seq_id, new_shifts[li], new_wkvs[li])
    cache = cache.advance(seq_id, tokens.shape[0])

    if qrwkv:
        hidden = _rms_norm(x, params["output_norm"], cfg.ln_eps)
    else:
        hidden = _layer_norm(x, params["output_norm"],
                             params["output_norm_b"], cfg.ln_eps)
    head = params.get("output", params["token_embd"])
    logits = hidden @ head.T.astype(hidden.dtype)
    return logits, cache


def load_params(reader) -> dict:
    """GGUF arch "rwkv6" -> forward() pytree. Tensor names and layouts from
    the reference exporter (convert_hf_to_gguf.py Rwkv6Model: w1/decay_w1/
    decay_w2 transposed to [out, in], w2 permuted to [5, C, W], the five
    lerp vectors fused to [5, 1, C], decay/lerps squeezed)."""
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

    qrwkv = reader.kv.get("general.architecture") == "rwkv6qwen2"
    params = {
        "token_embd": get("token_embd.weight"),
        "tok_norm": get("token_embd_norm.weight", required=not qrwkv),
        "tok_norm_b": get("token_embd_norm.bias", required=not qrwkv),
        "output_norm": get("output_norm.weight"),
        "output_norm_b": get("output_norm.bias", required=not qrwkv),
        "layers": [],
    }
    out = get("output.weight", required=False)
    if out is not None:
        params["output"] = out
    i = 0
    while f"blk.{i}.time_mix_key.weight" in reader.tensors:
        p = f"blk.{i}."
        if qrwkv:
            params["layers"].append({
                "ln1_w": get(p + "attn_norm.weight"),
                "ln2_w": get(p + "ffn_norm.weight"),
                "lerp_x": get(p + "time_mix_lerp_x.weight"),
                "lerp_fused": get(p + "time_mix_lerp_fused.weight")
                .reshape(5, -1),
                "w1": get(p + "time_mix_w1.weight"),
                "w2": get(p + "time_mix_w2.weight"),
                "decay": get(p + "time_mix_decay.weight"),
                "decay_w1": get(p + "time_mix_decay_w1.weight"),
                "decay_w2": get(p + "time_mix_decay_w2.weight"),
                "key": get(p + "time_mix_key.weight"),
                "key_b": get(p + "time_mix_key.bias", required=False),
                "value": get(p + "time_mix_value.weight"),
                "value_b": get(p + "time_mix_value.bias", required=False),
                "receptance": get(p + "time_mix_receptance.weight"),
                "receptance_b": get(p + "time_mix_receptance.bias",
                                    required=False),
                "gate": get(p + "time_mix_gate.weight"),
                "output": get(p + "time_mix_output.weight"),
                "w_gate": get(p + "ffn_gate.weight"),
                "w_up": get(p + "ffn_up.weight"),
                "w_down": get(p + "ffn_down.weight"),
            })
            i += 1
            continue
        params["layers"].append({
            "ln1_w": get(p + "attn_norm.weight"),
            "ln1_b": get(p + "attn_norm.bias"),
            "ln2_w": get(p + "attn_norm_2.weight"),
            "ln2_b": get(p + "attn_norm_2.bias"),
            "lerp_x": get(p + "time_mix_lerp_x.weight"),
            "lerp_fused": get(p + "time_mix_lerp_fused.weight")
            .reshape(5, -1),
            "w1": get(p + "time_mix_w1.weight"),  # [5W, C]
            "w2": get(p + "time_mix_w2.weight"),  # [5, C, W]
            "decay": get(p + "time_mix_decay.weight"),  # [C]
            "decay_w1": get(p + "time_mix_decay_w1.weight"),  # [W', C]
            "decay_w2": get(p + "time_mix_decay_w2.weight"),  # [C, W']
            "first": get(p + "time_mix_first.weight"),  # [H, D]
            "key": get(p + "time_mix_key.weight"),
            "value": get(p + "time_mix_value.weight"),
            "receptance": get(p + "time_mix_receptance.weight"),
            "gate": get(p + "time_mix_gate.weight"),
            "ln_w": get(p + "time_mix_ln.weight"),
            "ln_b": get(p + "time_mix_ln.bias"),
            "output": get(p + "time_mix_output.weight"),
            "cm_lerp_k": get(p + "channel_mix_lerp_k.weight"),
            "cm_lerp_r": get(p + "channel_mix_lerp_r.weight"),
            "cm_key": get(p + "channel_mix_key.weight"),
            "cm_value": get(p + "channel_mix_value.weight"),
            "cm_receptance": get(p + "channel_mix_receptance.weight"),
        })
        i += 1
    return params


def init_params(cfg: RWKV6Config, seed: int = 0,
                time_mix_extra: int = 32, decay_extra: int = 64) -> dict:
    """Random small-init pytree with GGUF-identical layouts (tests)."""
    rng = jax.random.PRNGKey(seed)
    ks = iter(jax.random.split(rng, 4 + 24 * cfg.n_layers))
    c, h, d = cfg.d_model, cfg.n_heads, cfg.head_size

    def w(*shape, scale=0.05):
        return jax.random.normal(next(ks), shape, jnp.float32) * scale

    params = {
        "token_embd": w(cfg.n_vocab, c, scale=0.02),
        "tok_norm": jnp.ones(c), "tok_norm_b": jnp.zeros(c),
        "output_norm": jnp.ones(c), "output_norm_b": jnp.zeros(c),
        "layers": [],
    }
    for _ in range(cfg.n_layers):
        params["layers"].append({
            "ln1_w": jnp.ones(c), "ln1_b": jnp.zeros(c),
            "ln2_w": jnp.ones(c), "ln2_b": jnp.zeros(c),
            "lerp_x": w(c, scale=0.3),
            "lerp_fused": w(5, c, scale=0.3),
            "w1": w(5 * time_mix_extra, c),
            "w2": w(5, c, time_mix_extra),
            "decay": w(c, scale=0.5) - 4.0,
            "decay_w1": w(decay_extra, c),
            "decay_w2": w(c, decay_extra),
            "first": w(h, d, scale=0.3),
            "key": w(c, c), "value": w(c, c),
            "receptance": w(c, c), "gate": w(c, c),
            "ln_w": jnp.ones(c), "ln_b": jnp.zeros(c),
            "output": w(c, c),
            "cm_lerp_k": w(c, scale=0.3), "cm_lerp_r": w(c, scale=0.3),
            "cm_key": w(cfg.d_ff or 2 * c, c),
            "cm_value": w(c, cfg.d_ff or 2 * c),
            "cm_receptance": w(c, c),
        })
    return params
