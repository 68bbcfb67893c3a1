"""Falcon-H1 — parallel attention + Mamba2 hybrid. GGUF arch "falcon-h1".

Counterpart of the reference's llm_build_falcon_h1
(src/llama-model.cpp:17546): EVERY layer runs GQA attention (NeoX rope)
and a Mamba2 (SSD) mixer IN PARALLEL on the same attn_norm'ed input and
sums both into the residual, then a SwiGLU FFN behind ffn_norm. All of
Falcon-H1's mup multipliers (embedding / lm_head / attention in+out /
key / ssm in+out / per-section zxBCdt / mlp gate+down) are baked into
the weights at conversion exactly like the reference converter
(convert_hf_to_gguf.py:8508 FalconH1Model.modify_tensors), so the
forward is multiplier-free.

Memory is the HybridCache: attention in the unified KVCache (all layers),
Mamba2 conv+SSD states in the RecurrentCache (all layers).
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
from . import ssm as ssm_mod


@dataclasses.dataclass(frozen=True)
class FalconH1Config:
    n_layers: int
    d_model: int
    n_heads: int
    n_kv_heads: int
    head_dim: int
    d_ff: int
    d_inner: int
    d_conv: int = 4
    d_state: int = 8
    n_ssm_head: int = 4
    n_group: int = 1
    rope_base: float = 100000.0
    rms_eps: float = 1e-5
    n_vocab: int = 256

    @property
    def ssm_cfg(self) -> ssm_mod.SSMConfig:
        return ssm_mod.SSMConfig(
            n_layers=self.n_layers, d_model=self.d_model,
            d_inner=self.d_inner, d_conv=self.d_conv,
            d_state=self.d_state, dt_rank=self.n_ssm_head,
            n_vocab=self.n_vocab, rms_eps=self.rms_eps,
            variant="mamba2", n_group=self.n_group)

    @staticmethod
    def from_gguf(kv: dict[str, Any]) -> "FalconH1Config":
        g = lambda key, default=None: kv.get(f"falcon-h1.{key}", default)
        d = int(g("embedding_length", 256))
        n_heads = int(g("attention.head_count", 8))
        return FalconH1Config(
            n_layers=int(g("block_count", 2)),
            d_model=d, n_heads=n_heads,
            n_kv_heads=int(g("attention.head_count_kv", n_heads)),
            head_dim=int(g("attention.key_length", d // n_heads)),
            d_ff=int(g("feed_forward_length", 4 * d)),
            d_inner=int(g("ssm.inner_size", 2 * d)),
            d_conv=int(g("ssm.conv_kernel", 4)),
            d_state=int(g("ssm.state_size", 8)),
            n_ssm_head=int(g("ssm.time_step_rank", 4)),
            n_group=int(g("ssm.group_count", 1)),
            rope_base=float(g("rope.freq_base", 100000.0)),
            rms_eps=float(g("attention.layer_norm_rms_epsilon", 1e-5)),
            n_vocab=int(g("vocab_size", 256)),
        )


def make_cache(cfg: FalconH1Config, kv_size: int,
               n_seqs: int = 4) -> HybridCache:
    return HybridCache(
        kv=KVCache.create(cfg.n_layers, kv_size, cfg.n_kv_heads,
                          cfg.head_dim),
        rec=RecurrentCache.create(
            cfg.n_layers, n_seqs, cfg.d_conv, cfg.d_inner, cfg.d_state,
            conv_channels=cfg.ssm_cfg.conv_channels),
    )


def forward(params: dict, cfg: FalconH1Config, tokens: jax.Array,
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
    new_states = []
    for li, lp in enumerate(params["layers"]):
        hn = rms_norm(h, lp["attn_norm"], cfg.rms_eps)

        # --- attention branch (NeoX rope over the unified KV) ---------
        hd, hq, hkv = cfg.head_dim, cfg.n_heads, cfg.n_kv_heads
        q = (hn @ lp["wq"].T).reshape(t, hq, hd)
        k = (hn @ lp["wk"].T).reshape(t, hkv, hd)
        v = (hn @ lp["wv"].T).reshape(t, hkv, hd)
        q = apply_rope(q, pos, cfg.rope_base, neox=True)
        k = apply_rope(k, pos, cfg.rope_base, neox=True)
        kvc = kvc.write(li, slots, k.astype(jnp.bfloat16),
                        v.astype(jnp.bfloat16))
        kc, vc = kvc.read_layer(li)
        mask = kvc.attn_mask(pos, seq_vec)
        out = cache_attention(q.astype(jnp.bfloat16), kc, vc, mask)
        attn_out = out.reshape(t, hq * hd).astype(jnp.float32) @ lp["wo"].T

        # --- Mamba2 branch on the SAME normed input --------------------
        conv0, ssm0 = rec.read(li, seq_id)

        def step(carry, h_t, lp=lp):
            conv_s, ssm_s = carry
            y, conv_s, ssm_s = ssm_mod._ssm2_step(
                lp, cfg.ssm_cfg, h_t, conv_s, ssm_s)
            return (conv_s, ssm_s), y

        (conv1, ssm1), ssm_out = jax.lax.scan(step, (conv0, ssm0), hn)
        new_states.append((li, conv1, ssm1))

        h = h + attn_out + ssm_out

        hn2 = rms_norm(h, lp["ffn_norm"], cfg.rms_eps)
        g = hn2 @ lp["w_gate"].T
        u = hn2 @ lp["w_up"].T
        h = h + (jax.nn.silu(g) * u) @ lp["w_down"].T

    for li, conv1, ssm1 in new_states:
        rec = rec.write(li, seq_id, conv1, ssm1)
    rec = rec.advance(seq_id, t)

    hidden = rms_norm(h, params["output_norm"], cfg.rms_eps)
    head = params.get("output", params["token_embd"])
    logits = hidden @ head.T.astype(hidden.dtype)
    return logits, HybridCache(kv=kvc, rec=rec)


def load_params(reader, cfg: FalconH1Config) -> dict:
    """GGUF arch "falcon-h1" -> forward() pytree."""
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
        params["layers"].append({
            "attn_norm": get(p + "attn_norm.weight"),
            "ffn_norm": get(p + "ffn_norm.weight"),
            "wq": get(p + "attn_q.weight"),
            "wk": get(p + "attn_k.weight"),
            "wv": get(p + "attn_v.weight"),
            "wo": get(p + "attn_output.weight"),
            "ssm_in": get(p + "ssm_in.weight"),
            "ssm_conv1d": get(p + "ssm_conv1d.weight"),
            "ssm_conv1d_b": get(p + "ssm_conv1d.bias"),
            "ssm_dt_b": get(p + "ssm_dt.bias"),
            "ssm_a": get(p + "ssm_a"),
            "ssm_d": get(p + "ssm_d"),
            "ssm_norm": get(p + "ssm_norm.weight", required=False),
            "ssm_out": get(p + "ssm_out.weight"),
            "w_gate": get(p + "ffn_gate.weight"),
            "w_up": get(p + "ffn_up.weight"),
            "w_down": get(p + "ffn_down.weight"),
        })
    return params
