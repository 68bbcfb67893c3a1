"""CLIP ViT vision encoder + LLaVA-style MLP projector — the "mlp"
projector family of the reference's generic multimodal layer.

Reference: /root/reference/tools/mtmd/clip.cpp (PROJECTOR_TYPE_MLP:
class embedding + learned positions + pre-LN ViT, mm.0/GELU/mm.2
projector) and convert_hf_to_gguf.py LlavaVisionModel naming. Math per
HF transformers CLIPVisionModel + LlavaForConditionalGeneration (the
parity oracle): llava selects the hidden states of layer
`vision_feature_layer` (default -2) and drops the CLS row ("default"
select strategy) before projecting to the LLM width.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.gguf import GGUFReader
from ..kernels.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class ClipVitConfig:
    depth: int
    embed_dim: int
    out_hidden: int
    n_heads: int
    patch_size: int = 14
    image_size: int = 224
    in_channels: int = 3
    mlp_dim: int = 0
    eps: float = 1e-5
    feature_layer: int = -2   # llava vision_feature_layer
    drop_cls: bool = True     # "default" select strategy

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.n_heads

    @staticmethod
    def from_gguf(kv: dict) -> "ClipVitConfig":
        g = lambda k, d=None: kv.get(f"clip.vision.{k}", d)
        return ClipVitConfig(
            depth=int(g("block_count")),
            embed_dim=int(g("embedding_length")),
            out_hidden=int(g("projection_dim")),
            n_heads=int(g("attention.head_count")),
            patch_size=int(g("patch_size")),
            image_size=int(g("image_size", 224)),
            mlp_dim=int(g("feed_forward_length")),
            eps=float(g("attention.layer_norm_epsilon", 1e-5)),
            feature_layer=int(g("feature_layer", -2)),
        )


def load_params(reader: GGUFReader) -> dict:
    from ..core import quants

    def get(n, required=True):
        if n not in reader.tensors:
            if required:
                raise KeyError(f"clip tensor missing: {n}")
            return None
        ti = reader.tensors[n]
        return jnp.asarray(quants.dequantize(ti.data, ti.ggml_type,
                                             ti.shape))

    params = {
        "cls": get("v.class_embd"),
        "patch_w": get("v.patch_embd.weight"),   # [E, C, P, P]
        "pos": get("v.position_embd.weight"),    # [1+N, E]
        "pre_ln": get("v.pre_ln.weight"), "pre_ln_b": get("v.pre_ln.bias"),
        "mm0": get("mm.0.weight"), "mm0_b": get("mm.0.bias"),
        "mm2": get("mm.2.weight"), "mm2_b": get("mm.2.bias"),
        "layers": [],
    }
    i = 0
    while f"v.blk.{i}.ln1.weight" in reader.tensors:
        p = f"v.blk.{i}."
        params["layers"].append({
            "ln1": get(p + "ln1.weight"), "ln1_b": get(p + "ln1.bias"),
            "ln2": get(p + "ln2.weight"), "ln2_b": get(p + "ln2.bias"),
            "wq": get(p + "attn_q.weight"), "bq": get(p + "attn_q.bias"),
            "wk": get(p + "attn_k.weight"), "bk": get(p + "attn_k.bias"),
            "wv": get(p + "attn_v.weight"), "bv": get(p + "attn_v.bias"),
            "wo": get(p + "attn_out.weight"),
            "bo": get(p + "attn_out.bias"),
            "fc1": get(p + "ffn_up.weight"), "fc1_b": get(p + "ffn_up.bias"),
            "fc2": get(p + "ffn_down.weight"),
            "fc2_b": get(p + "ffn_down.bias"),
        })
        i += 1
    return params


def forward(params: dict, cfg: ClipVitConfig,
            pixels: jax.Array) -> jax.Array:
    """pixels [C, H, W] (CLIP-normalized) -> projected embeddings
    [n_patches, out_hidden] for LLM injection (llava path: feature
    layer -2, CLS dropped, mm MLP)."""
    c, hh, ww = pixels.shape
    p = cfg.patch_size
    pix = pixels.reshape(c, hh // p, p, ww // p, p).transpose(1, 3, 0, 2, 4)
    pix = pix.reshape(-1, c * p * p).astype(jnp.float32)
    wp = params["patch_w"].reshape(cfg.embed_dim, -1)
    h = pix @ wp.T  # conv stride=kernel as matmul (no bias in CLIP)
    h = jnp.concatenate([params["cls"][None, :], h], axis=0)
    h = h + params["pos"][: h.shape[0]]
    h = layer_norm(h, params["pre_ln"], params["pre_ln_b"], cfg.eps)

    n = h.shape[0]
    nh, hd = cfg.n_heads, cfg.head_dim
    # llava reads hidden states BEFORE the last `-(feature_layer+1)`
    # encoder layers (HF output_hidden_states indexing)
    n_run = cfg.depth + cfg.feature_layer + 1 if cfg.feature_layer < 0 \
        else cfg.feature_layer
    for lp in params["layers"][:n_run]:
        hn = layer_norm(h, lp["ln1"], lp["ln1_b"], cfg.eps)
        q = (hn @ lp["wq"].T + lp["bq"]).reshape(n, nh, hd)
        k = (hn @ lp["wk"].T + lp["bk"]).reshape(n, nh, hd)
        v = (hn @ lp["wv"].T + lp["bv"]).reshape(n, nh, hd)
        scores = jnp.einsum("thd,shd->hts", q, k) / jnp.sqrt(float(hd))
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("hts,shd->thd", probs, v).reshape(n, -1)
        h = h + (attn @ lp["wo"].T + lp["bo"])
        hn2 = layer_norm(h, lp["ln2"], lp["ln2_b"], cfg.eps)
        a = hn2 @ lp["fc1"].T + lp["fc1_b"]
        a = a * jax.nn.sigmoid(1.702 * a)  # quick_gelu
        h = h + (a @ lp["fc2"].T + lp["fc2_b"])

    feats = h[1:] if cfg.drop_cls else h
    z = feats @ params["mm0"].T + params["mm0_b"]
    z = jax.nn.gelu(z, approximate=False)
    return z @ params["mm2"].T + params["mm2_b"]
