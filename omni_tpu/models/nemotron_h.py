"""Nemotron-H — Mamba2 + attention + FFN hybrid where every layer is a
SINGLE sublayer (norm -> one block -> residual). GGUF arch "nemotron_h".

Counterpart of the reference's llm_build_nemotron_h
(src/llama-model.cpp): per-layer dispatch — recurrent layers run the
Mamba2 (SSD) mixer, layers with n_ff==0 run NoPE GQA attention, the rest
run an UN-GATED relu^2 FFN (LLM_FFN_RELU_SQR). Sibling of
granite_hybrid.py but with one sublayer per layer and no mup scales.

Layer typing on disk: attention.head_count_kv is a per-layer vector
(0 = not attention) and feed_forward_length is a per-layer vector
(0 = not FFN); a layer with both 0 is recurrent — the reference encodes
the same way (NemotronHModel converter).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..kernels.attention import cache_attention
from ..kernels.norms import rms_norm
from ..runtime.kv_cache import KVCache
from ..runtime.recurrent import HybridCache, RecurrentCache
from . import ssm as ssm_mod


@dataclasses.dataclass(frozen=True)
class NemotronHConfig:
    n_layers: int
    d_model: int
    n_heads: int
    kv_heads: tuple[int, ...]   # per layer; >0 = attention layer
    ff_dims: tuple[int, ...]    # per layer; >0 = ffn layer
    head_dim: int
    d_inner: int
    d_conv: int = 4
    d_state: int = 8
    n_ssm_head: int = 4
    n_group: int = 1
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

    def layer_type(self, il: int) -> str:
        if self.kv_heads[il] > 0:
            return "attn"
        if self.ff_dims[il] > 0:
            return "ffn"
        return "mamba"

    @staticmethod
    def from_gguf(kv: dict[str, Any]) -> "NemotronHConfig":
        g = lambda key, default=None: kv.get(f"nemotron_h.{key}", default)
        d = int(g("embedding_length", 256))
        n_layers = int(g("block_count", 2))
        kvh = g("attention.head_count_kv", 0)
        if not hasattr(kvh, "__len__"):
            kvh = [int(kvh)] * n_layers
        ffs = g("feed_forward_length", 0)
        if not hasattr(ffs, "__len__"):
            ffs = [int(ffs)] * n_layers
        n_heads = int(g("attention.head_count", 8))
        return NemotronHConfig(
            n_layers=n_layers, d_model=d, n_heads=n_heads,
            kv_heads=tuple(int(x) for x in kvh),
            ff_dims=tuple(int(x) for x in ffs),
            head_dim=int(g("attention.key_length", d // n_heads)),
            d_inner=int(g("ssm.inner_size", 2 * d)),
            d_conv=int(g("ssm.conv_kernel", 4)),
            d_state=int(g("ssm.state_size", 8)),
            n_ssm_head=int(g("ssm.time_step_rank", 4)),
            n_group=int(g("ssm.group_count", 1)),
            rms_eps=float(g("attention.layer_norm_rms_epsilon", 1e-5)),
            n_vocab=int(g("vocab_size", 256)),
        )


def make_cache(cfg: NemotronHConfig, kv_size: int,
               n_seqs: int = 4) -> HybridCache:
    n_attn = sum(1 for h in cfg.kv_heads if h > 0)
    n_mamba = sum(1 for i in range(cfg.n_layers)
                  if cfg.layer_type(i) == "mamba")
    kvh = max((h for h in cfg.kv_heads if h > 0), default=1)
    return HybridCache(
        kv=KVCache.create(max(n_attn, 1), kv_size, kvh, cfg.head_dim),
        rec=RecurrentCache.create(
            max(n_mamba, 1), n_seqs, cfg.d_conv, cfg.d_inner, cfg.d_state,
            conv_channels=cfg.ssm_cfg.conv_channels),
    )


def forward(params: dict, cfg: NemotronHConfig, tokens: jax.Array,
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
        hn = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
        kind = cfg.layer_type(li)
        if kind == "mamba":
            conv0, ssm0 = rec.read(mamba_li, seq_id)

            def step(carry, h_t, lp=lp):
                conv_s, ssm_s = carry
                y, conv_s, ssm_s = ssm_mod._ssm2_step(
                    lp, cfg.ssm_cfg, h_t, conv_s, ssm_s)
                return (conv_s, ssm_s), y

            (conv1, ssm1), mix = jax.lax.scan(step, (conv0, ssm0), hn)
            new_states.append((mamba_li, conv1, ssm1))
            mamba_li += 1
        elif kind == "attn":  # NoPE GQA
            hkv = cfg.kv_heads[li]
            hd, hq = cfg.head_dim, cfg.n_heads
            q = (hn @ lp["wq"].T).reshape(t, hq, hd)
            k = (hn @ lp["wk"].T).reshape(t, hkv, hd)
            v = (hn @ lp["wv"].T).reshape(t, hkv, hd)
            kvc = kvc.write(attn_li, slots, k.astype(jnp.bfloat16),
                            v.astype(jnp.bfloat16))
            kc, vc = kvc.read_layer(attn_li)
            mask = kvc.attn_mask(pos, seq_vec)
            out = cache_attention(q.astype(jnp.bfloat16), kc, vc, mask)
            mix = out.reshape(t, hq * hd).astype(jnp.float32) @ lp["wo"].T
            attn_li += 1
        else:  # un-gated relu^2 FFN (LLM_FFN_RELU_SQR)
            u = hn @ lp["w_up"].T
            if lp.get("b_up") is not None:
                u = u + lp["b_up"]
            mix = jnp.square(jax.nn.relu(u)) @ lp["w_down"].T
            if lp.get("b_down") is not None:
                mix = mix + lp["b_down"]
        h = h + mix

    for mi, conv1, ssm1 in new_states:
        rec = rec.write(mi, seq_id, conv1, ssm1)
    rec = rec.advance(seq_id, t)

    hidden = rms_norm(h, params["output_norm"], cfg.rms_eps)
    head = params.get("output", params["token_embd"])
    return hidden @ head.T.astype(hidden.dtype), HybridCache(kv=kvc, rec=rec)


def load_params(reader, cfg: NemotronHConfig) -> dict:
    """GGUF arch "nemotron_h" -> forward() pytree."""
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
        lp = {"attn_norm": get(p + "attn_norm.weight")}
        kind = cfg.layer_type(i)
        if kind == "mamba":
            lp.update({
                "ssm_in": get(p + "ssm_in.weight"),
                "ssm_conv1d": get(p + "ssm_conv1d.weight"),
                "ssm_conv1d_b": get(p + "ssm_conv1d.bias"),
                "ssm_dt_b": get(p + "ssm_dt.bias"),
                "ssm_a": get(p + "ssm_a"),
                "ssm_d": get(p + "ssm_d"),
                "ssm_norm": get(p + "ssm_norm.weight", required=False),
                "ssm_out": get(p + "ssm_out.weight"),
            })
        elif kind == "attn":
            lp.update({
                "wq": get(p + "attn_q.weight"),
                "wk": get(p + "attn_k.weight"),
                "wv": get(p + "attn_v.weight"),
                "wo": get(p + "attn_output.weight"),
            })
        else:
            lp.update({
                "w_up": get(p + "ffn_up.weight"),
                "b_up": get(p + "ffn_up.bias", required=False),
                "w_down": get(p + "ffn_down.weight"),
                "b_down": get(p + "ffn_down.bias", required=False),
            })
        params["layers"].append(lp)
    return params
