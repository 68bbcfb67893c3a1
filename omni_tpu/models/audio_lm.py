"""Generic audio-LM encoder: Whisper tower + audio projector heads.

The ALM half of the reference's generic multimodal layer
(/root/reference/tools/mtmd/clip.cpp build_whisper_enc +
mtmd-audio.cpp): conv1(s1)+conv2(s2) with erf-GELU, sinusoidal position
table, pre-LN transformer layers (k_proj has no bias — Whisper
convention), then per-projector:

- "qwen2a"   — avg-pool(2) along time BEFORE the post-LN, then a single
               linear mm.a.fc (HF Qwen2AudioEncoder.avg_pooler +
               multi_modal_projector)
- "ultravox" — stack proj_stack_factor frames, RMS pre-norm, SwiGLU
               (swapped halves: the SECOND half gates), RMS mid-norm,
               linear out (ultravox_model.py UltravoxProjector)
- "voxtral"  — avg-pool(2) + stack(2... per stack factor) + 2-layer
               erf-GELU MLP

Decoupled from the omni pipeline's hard-wired APM (models/whisper.py):
this serves ANY audio-capable chat model through the mtmd registry.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.gguf import GGUFReader
from ..kernels.norms import layer_norm, rms_norm


@dataclasses.dataclass(frozen=True)
class AudioLMConfig:
    depth: int
    embed_dim: int
    out_hidden: int
    n_heads: int
    n_mel: int = 128
    proj_type: str = "qwen2a"
    mlp_dim: int = 0
    stack_factor: int = 8     # ultravox/voxtral frame stacking
    eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.n_heads

    @staticmethod
    def from_gguf(kv: dict) -> "AudioLMConfig":
        g = lambda k, d=None: kv.get(f"clip.audio.{k}", d)
        return AudioLMConfig(
            depth=int(g("block_count")),
            embed_dim=int(g("embedding_length")),
            out_hidden=int(g("projection_dim")),
            n_heads=int(g("attention.head_count")),
            n_mel=int(g("num_mel_bins", 128)),
            proj_type=kv.get("clip.projector_type", "qwen2a"),
            mlp_dim=int(g("feed_forward_length")),
            stack_factor=int(g("projector.stack_factor", 8)),
            eps=float(g("attention.layer_norm_epsilon", 1e-5)),
        )


def load_params(reader: GGUFReader) -> dict:
    from ..core import quants

    def get(n, required=True):
        if n not in reader.tensors:
            if required:
                raise KeyError(f"audio tensor missing: {n}")
            return None
        ti = reader.tensors[n]
        return jnp.asarray(quants.dequantize(ti.data, ti.ggml_type,
                                             ti.shape))

    params = {
        "conv1_w": get("a.conv1d.1.weight"),   # [E, n_mel, 3]
        "conv1_b": get("a.conv1d.1.bias"),
        "conv2_w": get("a.conv1d.2.weight"),   # [E, E, 3]
        "conv2_b": get("a.conv1d.2.bias"),
        "pos": get("a.position_embd.weight"),  # [max_pos, E]
        "post_ln": get("a.post_ln.weight"),
        "post_ln_b": get("a.post_ln.bias"),
        "mm_fc": get("mm.a.fc.weight", required=False),
        "mm_fc_b": get("mm.a.fc.bias", required=False),
        "mm1": get("mm.a.mlp.1.weight", required=False),
        "mm2": get("mm.a.mlp.2.weight", required=False),
        "norm_pre": get("mm.a.norm_pre.weight", required=False),
        "norm_mid": get("mm.a.norm_mid.weight", required=False),
        "mel_filters": get("a.mel_filters", required=False),
        "layers": [],
    }
    i = 0
    while f"a.blk.{i}.ln1.weight" in reader.tensors:
        p = f"a.blk.{i}."
        params["layers"].append({
            "ln1": get(p + "ln1.weight"), "ln1_b": get(p + "ln1.bias"),
            "ln2": get(p + "ln2.weight"), "ln2_b": get(p + "ln2.bias"),
            "wq": get(p + "attn_q.weight"), "bq": get(p + "attn_q.bias"),
            "wk": get(p + "attn_k.weight"),   # no k bias (Whisper)
            "wv": get(p + "attn_v.weight"), "bv": get(p + "attn_v.bias"),
            "wo": get(p + "attn_out.weight"),
            "bo": get(p + "attn_out.bias"),
            "fc1": get(p + "ffn_up.weight"), "fc1_b": get(p + "ffn_up.bias"),
            "fc2": get(p + "ffn_down.weight"),
            "fc2_b": get(p + "ffn_down.bias"),
        })
        i += 1
    return params


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


def _conv1d(x: jax.Array, w: jax.Array, b: jax.Array,
            stride: int) -> jax.Array:
    """x [T, Cin], w [Cout, Cin, 3], pad=1 -> [T', Cout]."""
    xt = x.T[None]  # [1, Cin, T]
    y = jax.lax.conv_general_dilated(
        xt, w, window_strides=(stride,), padding=((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"))
    return y[0].T + b


def forward(params: dict, cfg: AudioLMConfig, mel: jax.Array) -> jax.Array:
    """mel [T, n_mel] normalized log-mel frames -> [n_tokens, out_hidden]."""
    h = _gelu(_conv1d(mel.astype(jnp.float32), params["conv1_w"],
                      params["conv1_b"], 1))
    h = _gelu(_conv1d(h, params["conv2_w"], params["conv2_b"], 2))
    n = h.shape[0]
    h = h + params["pos"][:n]

    nh, hd = cfg.n_heads, cfg.head_dim
    for lp in params["layers"]:
        hn = layer_norm(h, lp["ln1"], lp["ln1_b"], cfg.eps)
        q = (hn @ lp["wq"].T + lp["bq"]).reshape(n, nh, hd)
        k = (hn @ lp["wk"].T).reshape(n, nh, hd)
        v = (hn @ lp["wv"].T + lp["bv"]).reshape(n, nh, hd)
        scores = jnp.einsum("thd,shd->hts", q, k) / jnp.sqrt(float(hd))
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("hts,shd->thd", probs, v).reshape(n, -1)
        h = h + (attn @ lp["wo"].T + lp["bo"])
        hn2 = layer_norm(h, lp["ln2"], lp["ln2_b"], cfg.eps)
        h = h + (_gelu(hn2 @ lp["fc1"].T + lp["fc1_b"]) @ lp["fc2"].T
                 + lp["fc2_b"])

    if cfg.proj_type in ("qwen2a", "voxtral"):  # avg-pool(2) pre post-LN
        t2 = (n // 2) * 2
        h = h[:t2].reshape(t2 // 2, 2, -1).mean(axis=1)
    h = layer_norm(h, params["post_ln"], params["post_ln_b"], cfg.eps)

    if cfg.proj_type == "qwen2a":
        return h @ params["mm_fc"].T + params["mm_fc_b"]

    # stack frames (ultravox/voxtral): pad flat length to a multiple of
    # E*stack, reshape [*, E*stack]
    sf = cfg.stack_factor
    e = h.shape[-1]
    flat = h.reshape(-1)
    stride = e * sf
    pad = (-flat.shape[0]) % stride
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros(pad, flat.dtype)])
    h = flat.reshape(-1, stride)

    if cfg.proj_type == "ultravox":
        h = rms_norm(h, params["norm_pre"], 1e-6)
        h = h @ params["mm1"].T
        half = h.shape[-1] // 2
        # SwiGLU with swapped halves: the SECOND half goes through SiLU
        h = h[:, :half] * jax.nn.silu(h[:, half:])
        h = rms_norm(h, params["norm_mid"], 1e-6)
        return h @ params["mm2"].T

    # voxtral: 2-layer erf-GELU MLP
    h = _gelu(h @ params["mm1"].T)
    return h @ params["mm2"].T
