"""PLaMo-2 — Mamba(+norms) / attention hybrid with sandwich norms, GGUF
arch "plamo2".

Counterpart of the reference's llm_build_plamo2 (src/llama-model.cpp:
17672): every layer is pre_mixer_norm -> mixer -> post_mixer_norm ->
residual, then pre_mlp_norm -> fused-SWIGLU FFN -> post_mlp_norm ->
residual. Mixers dispatch per layer (head_count_kv[il]==0 = Mamba):

- attention: fused qkv, per-head RMS q/k norms, NEOX rope,
  scale 1/sqrt(head_dim) (build_plamo2_attn_layer)
- mamba: in_proj to per-head-interleaved [z|x] pairs, causal conv+silu
  over x only, bcdt_proj -> [B | C | dt] each RMS-normed (the PLaMo-2
  twist), dt low-rank to ONE scalar per SSM head, per-head scalar decay
  dA = exp(softplus(dt)·A) (ggml_ssm_scan with A {1, n_head}), y =
  ssm + D·x gated by silu(z) (build_plamo2_mamba_layer). The GGUF
  carries A = -exp(A_log) (Plamo2Model converter), n_heads in
  ssm.time_step_rank, and dt's low-rank width dt_dim = max(64, d/16)
  (hardcoded in the reference graph, not a KV).

TPU shape: data-parallel projections outside one lax.scan carrying only
(conv window, ssm state) — same decomposition as ssm.py/nemotron_h.py.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..kernels.attention import cache_attention
from ..kernels.norms import rms_norm
from ..kernels.rope import apply_rope
from ..runtime.kv_cache import KVCache
from ..runtime.recurrent import HybridCache, RecurrentCache


@dataclasses.dataclass(frozen=True)
class Plamo2Config:
    n_layers: int
    d_model: int
    n_heads: int              # attention heads
    kv_heads: tuple[int, ...]  # per layer; 0 = mamba layer
    head_dim: int
    d_ff: int
    d_inner: int              # ssm: n_ssm_head * ssm head_dim
    n_ssm_head: int           # ssm.time_step_rank doubles as head count
    d_conv: int = 4
    d_state: int = 64
    rope_base: float = 10000.0
    rms_eps: float = 1e-6
    n_vocab: int = 256

    @property
    def dt_dim(self) -> int:
        # llm_build_plamo2: dt_dim = max(64, n_embd / 16), not a KV
        return max(64, self.d_model // 16)

    @staticmethod
    def from_gguf(kv: dict[str, Any]) -> "Plamo2Config":
        g = lambda key, default=None: kv.get(f"plamo2.{key}", default)
        d = int(g("embedding_length", 256))
        n_layers = int(g("block_count", 2))
        kvh = g("attention.head_count_kv", 0)
        if not hasattr(kvh, "__len__"):
            kvh = [int(kvh)] * n_layers
        nh = g("attention.head_count", 8)
        if hasattr(nh, "__len__"):
            nh = max(int(x) for x in nh)
        return Plamo2Config(
            n_layers=n_layers, d_model=d, n_heads=int(nh),
            kv_heads=tuple(int(x) for x in kvh),
            head_dim=int(g("attention.key_length", 128)),
            d_ff=int(g("feed_forward_length", 4 * d)),
            d_inner=int(g("ssm.inner_size", 2 * d)),
            n_ssm_head=int(g("ssm.time_step_rank", 4)),
            d_conv=int(g("ssm.conv_kernel", 4)),
            d_state=int(g("ssm.state_size", 64)),
            rope_base=float(g("rope.freq_base", 10000.0)),
            rms_eps=float(g("attention.layer_norm_rms_epsilon", 1e-6)),
            n_vocab=int(g("vocab_size", 256)),
        )


def make_cache(cfg: Plamo2Config, kv_size: int,
               n_seqs: int = 4) -> HybridCache:
    n_attn = sum(1 for h in cfg.kv_heads if h > 0)
    n_mamba = cfg.n_layers - n_attn
    kvh = max((h for h in cfg.kv_heads if h > 0), default=1)
    return HybridCache(
        kv=KVCache.create(max(n_attn, 1), kv_size, kvh, cfg.head_dim),
        rec=RecurrentCache.create(
            max(n_mamba, 1), n_seqs, cfg.d_conv, cfg.d_inner, cfg.d_state),
    )


def _mamba_step(lp: dict, cfg: Plamo2Config, hn_t: jax.Array,
                conv_state: jax.Array, ssm_state: jax.Array):
    """One PLaMo-2 mamba timestep. hn_t [d_model]; conv_state
    [d_conv-1, d_inner]; ssm_state [d_inner, d_state]."""
    h_, s_ = cfg.n_ssm_head, cfg.d_state
    di = cfg.d_inner
    p_ = di // h_
    zx = lp["ssm_in"] @ hn_t  # [2*di], per-head [z(P) | x(P)] pairs
    zx = zx.reshape(h_, 2 * p_)
    z = zx[:, :p_].reshape(di)
    x = zx[:, p_:].reshape(di)

    window = jnp.concatenate([conv_state, x[None, :]], axis=0)
    x = jnp.sum(window * lp["ssm_conv1d"].T, axis=0)
    if lp.get("ssm_conv1d_b") is not None:
        x = x + lp["ssm_conv1d_b"]
    x = jax.nn.silu(x)
    new_conv_state = window[1:]

    bcdt = lp["ssm_x"] @ x  # [S | S | dt_dim]
    b = bcdt[:s_]
    c = bcdt[s_:2 * s_]
    dt = bcdt[2 * s_:]

    def _rms(v, w):
        return v * jax.lax.rsqrt(jnp.mean(v * v, keepdims=True)
                                 + cfg.rms_eps) * w

    b = _rms(b, lp["ssm_b_norm"])
    c = _rms(c, lp["ssm_c_norm"])
    dt = _rms(dt, lp["ssm_dt_norm"])
    dt = jax.nn.softplus(lp["ssm_dt"] @ dt + lp["ssm_dt_b"])  # [H]
    da = jnp.exp(dt * lp["ssm_a"])  # A already -exp(A_log) on disk

    xh = x.reshape(h_, p_)
    st = ssm_state.reshape(h_, p_, s_)
    st = da[:, None, None] * st + (dt[:, None] * xh)[..., None] * b[None, None, :]
    y = jnp.einsum("hps,s->hp", st, c) + lp["ssm_d"][:, None] * xh
    y = y.reshape(di) * jax.nn.silu(z)  # ggml_swiglu_split(z, y)
    return lp["ssm_out"] @ y, new_conv_state, st.reshape(di, s_)


def forward(params: dict, cfg: Plamo2Config, tokens: jax.Array,
            cache: HybridCache, seq_id: int,
            pos0: jax.Array | None = None
            ) -> tuple[jax.Array, HybridCache]:
    """[T] tokens of ONE sequence -> (logits [T, V], updated cache)."""
    t = tokens.shape[0]
    if pos0 is None:
        pos0 = cache.rec.pos[seq_id]
        pos0 = jnp.where(pos0 < 0, 0, pos0)
    pos = pos0 + jnp.arange(t, dtype=jnp.int32)
    seq_vec = jnp.full((t,), seq_id, jnp.int32)

    kvc, rec = cache.kv, cache.rec
    slots = kvc.find_slots(t)
    kvc = kvc.commit(slots, pos, seq_vec)

    h = params["token_embd"][tokens].astype(jnp.float32)
    attn_li = mamba_li = 0
    new_states = []
    for li, lp in enumerate(params["layers"]):
        residual = h
        hn = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
        if cfg.kv_heads[li] == 0:
            conv0, ssm0 = rec.read(mamba_li, seq_id)

            def step(carry, hn_t, lp=lp):
                conv_s, ssm_s = carry
                y, conv_s, ssm_s = _mamba_step(lp, cfg, hn_t, conv_s, ssm_s)
                return (conv_s, ssm_s), y

            (conv1, ssm1), mix = jax.lax.scan(step, (conv0, ssm0), hn)
            new_states.append((mamba_li, conv1, ssm1))
            mamba_li += 1
        else:
            hkv = cfg.kv_heads[li]
            hd, hq = cfg.head_dim, cfg.n_heads
            qkv = hn @ lp["wqkv"].T
            q = qkv[:, :hq * hd].reshape(t, hq, hd)
            k = qkv[:, hq * hd:(hq + hkv) * hd].reshape(t, hkv, hd)
            v = qkv[:, (hq + hkv) * hd:].reshape(t, hkv, hd)
            q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
            k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
            q = apply_rope(q, pos, cfg.rope_base, neox=True)
            k = apply_rope(k, pos, cfg.rope_base, neox=True)
            kvc = kvc.write(attn_li, slots, k.astype(jnp.bfloat16),
                            v.astype(jnp.bfloat16))
            kc, vc = kvc.read_layer(attn_li)
            mask = kvc.attn_mask(pos, seq_vec)
            out = cache_attention(q.astype(jnp.bfloat16), kc, vc, mask)
            mix = out.reshape(t, hq * hd).astype(jnp.float32) @ lp["wo"].T
            attn_li += 1
        mix = rms_norm(mix, lp["attn_post_norm"], cfg.rms_eps)
        h = residual + mix

        residual = h
        hn2 = rms_norm(h, lp["ffn_norm"], cfg.rms_eps)
        gu = hn2 @ lp["w_gateup"].T  # fused [gate | up] (LLM_FFN_SWIGLU)
        ff = gu.shape[-1] // 2
        y = (jax.nn.silu(gu[:, :ff]) * gu[:, ff:]) @ lp["w_down"].T
        y = rms_norm(y, lp["ffn_post_norm"], cfg.rms_eps)
        h = residual + y

    for mi, conv1, ssm1 in new_states:
        rec = rec.write(mi, seq_id, conv1, ssm1)
    rec = rec.advance(seq_id, t)

    hidden = rms_norm(h, params["output_norm"], cfg.rms_eps)
    head = params.get("output", params["token_embd"])
    return hidden @ head.T.astype(hidden.dtype), HybridCache(kv=kvc, rec=rec)


def load_params(reader, cfg: Plamo2Config) -> dict:
    """GGUF arch "plamo2" -> forward() pytree."""
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
        "output_norm": get("output_norm.weight"),
        "layers": [],
    }
    out = get("output.weight", required=False)
    if out is not None:
        params["output"] = out
    for i in range(cfg.n_layers):
        p = f"blk.{i}."
        lp = {
            "attn_norm": get(p + "attn_norm.weight"),
            "attn_post_norm": get(p + "attn_post_norm.weight"),
            "ffn_norm": get(p + "ffn_norm.weight"),
            "ffn_post_norm": get(p + "ffn_post_norm.weight"),
            "w_gateup": get(p + "ffn_up.weight"),
            "w_down": get(p + "ffn_down.weight"),
        }
        if cfg.kv_heads[i] == 0:
            lp.update({
                "ssm_in": get(p + "ssm_in.weight"),
                "ssm_conv1d": get(p + "ssm_conv1d.weight"),
                "ssm_conv1d_b": get(p + "ssm_conv1d.bias", required=False),
                "ssm_x": get(p + "ssm_x.weight"),
                "ssm_dt": get(p + "ssm_dt.weight"),
                "ssm_dt_b": get(p + "ssm_dt.bias"),
                "ssm_dt_norm": get(p + "ssm_dt_norm.weight"),
                "ssm_b_norm": get(p + "ssm_b_norm.weight"),
                "ssm_c_norm": get(p + "ssm_c_norm.weight"),
                "ssm_a": get(p + "ssm_a"),
                "ssm_d": get(p + "ssm_d"),
                "ssm_out": get(p + "ssm_out.weight"),
            })
        else:
            lp.update({
                "wqkv": get(p + "attn_qkv.weight"),
                "wo": get(p + "attn_output.weight"),
                "q_norm": get(p + "attn_q_norm.weight"),
                "k_norm": get(p + "attn_k_norm.weight"),
            })
        params["layers"].append(lp)
    return params
