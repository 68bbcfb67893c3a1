"""Pixtral vision encoder + Mistral-Small patch merger projector.

Reference: /root/reference/tools/mtmd/clip.cpp build_pixtral (RMS-norm ViT
with 2-D rotary positions, LlavaMultiModalProjector head, optional
Mistral-Small-3.1 patch merger, [IMG_BREAK] row separators appended to the
encoder output). Parity oracle: HF PixtralVisionModel +
Mistral3ForConditionalGeneration.get_image_features.

2-D rope law (HF PixtralRotaryEmbedding): head_dim/2 frequencies, the
EVEN-index ones driven by the patch row and the ODD-index ones by the
column, concatenated [h-freqs | w-freqs], rotate-half application.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.gguf import GGUFReader
from ..kernels.norms import rms_norm


@dataclasses.dataclass(frozen=True)
class PixtralVisionConfig:
    depth: int
    embed_dim: int
    out_hidden: int
    n_heads: int
    patch_size: int = 16
    image_size: int = 1024
    mlp_dim: int = 0
    eps: float = 1e-5
    rope_theta: float = 10000.0
    spatial_merge: int = 1   # >1 = Mistral-Small patch merger

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.n_heads

    @staticmethod
    def from_gguf(kv: dict) -> "PixtralVisionConfig":
        g = lambda k, d=None: kv.get(f"clip.vision.{k}", d)
        return PixtralVisionConfig(
            depth=int(g("block_count")),
            embed_dim=int(g("embedding_length")),
            out_hidden=int(g("projection_dim")),
            n_heads=int(g("attention.head_count")),
            patch_size=int(g("patch_size")),
            image_size=int(g("image_size", 1024)),
            mlp_dim=int(g("feed_forward_length")),
            eps=float(g("attention.layer_norm_epsilon", 1e-5)),
            rope_theta=float(g("rope.freq_base", 10000.0)),
            spatial_merge=int(g("spatial_merge_size", 1)),
        )


def load_params(reader: GGUFReader) -> dict:
    from ..core import quants

    def get(n, required=True):
        if n not in reader.tensors:
            if required:
                raise KeyError(f"pixtral tensor missing: {n}")
            return None
        ti = reader.tensors[n]
        return jnp.asarray(quants.dequantize(ti.data, ti.ggml_type,
                                             ti.shape))

    params = {
        "patch_w": get("v.patch_embd.weight"),   # [E, C, P, P]
        "pre_ln": get("v.pre_ln.weight"),
        "mm1": get("mm.1.weight"), "mm1_b": get("mm.1.bias", required=False),
        "mm2": get("mm.2.weight"), "mm2_b": get("mm.2.bias", required=False),
        "input_norm": get("mm.input_norm.weight", required=False),
        "patch_merger": get("mm.patch_merger.weight", required=False),
        "img_break": get("v.token_embd.img_break", required=False),
        "layers": [],
    }
    i = 0
    while f"v.blk.{i}.ln1.weight" in reader.tensors:
        p = f"v.blk.{i}."
        params["layers"].append({
            "ln1": get(p + "ln1.weight"),
            "ln2": get(p + "ln2.weight"),
            "wq": get(p + "attn_q.weight"),
            "wk": get(p + "attn_k.weight"),
            "wv": get(p + "attn_v.weight"),
            "wo": get(p + "attn_out.weight"),
            "gate": get(p + "ffn_gate.weight"),
            "up": get(p + "ffn_up.weight"),
            "down": get(p + "ffn_down.weight"),
        })
        i += 1
    return params


def forward(params: dict, cfg: PixtralVisionConfig, pixels: jax.Array,
            with_img_break: bool = False) -> jax.Array:
    """pixels [C, H, W] (normalized, H/W multiples of patch) ->
    [n_tokens, out_hidden]. with_img_break appends the LLM's [IMG_BREAK]
    embedding at the end of every merged row except the last
    (clip.cpp build_pixtral tail)."""
    c, hh, ww = pixels.shape
    p = cfg.patch_size
    gh, gw = hh // p, ww // p
    pix = pixels.reshape(c, gh, p, gw, p).transpose(1, 3, 0, 2, 4)
    pix = pix.reshape(-1, c * p * p).astype(jnp.float32)
    h = pix @ params["patch_w"].reshape(cfg.embed_dim, -1).T
    h = rms_norm(h, params["pre_ln"], cfg.eps)
    n = h.shape[0]

    # 2-D rotary: even-index freqs x row, odd-index freqs x col
    hd = cfg.head_dim
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, hd, 2) / hd))  # [hd/2]
    hp = np.repeat(np.arange(gh), gw).astype(np.float32)
    wp = np.tile(np.arange(gw), gh).astype(np.float32)
    freqs = np.concatenate([hp[:, None] * inv[None, ::2],
                            wp[:, None] * inv[None, 1::2]], axis=1)
    emb = np.concatenate([freqs, freqs], axis=1)  # [N, hd]
    cos = jnp.asarray(np.cos(emb), jnp.float32)[:, None, :]
    sin = jnp.asarray(np.sin(emb), jnp.float32)[:, None, :]

    def rope(x):  # rotate-half
        x1, x2 = x[..., : hd // 2], x[..., hd // 2:]
        rot = jnp.concatenate([-x2, x1], axis=-1)
        return x * cos + rot * sin

    nh = cfg.n_heads
    for lp in params["layers"]:
        hn = rms_norm(h, lp["ln1"], cfg.eps)
        q = rope((hn @ lp["wq"].T).reshape(n, nh, hd))
        k = rope((hn @ lp["wk"].T).reshape(n, nh, hd))
        v = (hn @ lp["wv"].T).reshape(n, nh, hd)
        scores = jnp.einsum("thd,shd->hts", q, k) / jnp.sqrt(float(hd))
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("hts,shd->thd", probs, v).reshape(n, -1)
        h = h + attn @ lp["wo"].T
        hn2 = rms_norm(h, lp["ln2"], cfg.eps)
        a = jax.nn.silu(hn2 @ lp["gate"].T) * (hn2 @ lp["up"].T)
        h = h + a @ lp["down"].T

    s = cfg.spatial_merge
    out_gh, out_gw = gh, gw
    if params["patch_merger"] is not None and s > 1:
        # Mistral-Small 3.1 patch merger: RMS input norm, s x s unfold
        # (im2col over the patch grid), single linear
        h = rms_norm(h, params["input_norm"], cfg.eps)
        e = h.shape[-1]
        hg = h.reshape(gh // s, s, gw // s, s, e).transpose(0, 2, 1, 3, 4)
        # HF unfold flattens (E, kh, kw) channel-major per output cell
        hg = hg.transpose(0, 1, 4, 2, 3).reshape(-1, e * s * s)
        h = hg @ params["patch_merger"].T
        out_gh, out_gw = gh // s, gw // s

    z = h @ params["mm1"].T
    if params["mm1_b"] is not None:
        z = z + params["mm1_b"]
    z = jax.nn.gelu(z, approximate=False)
    z = z @ params["mm2"].T
    if params["mm2_b"] is not None:
        z = z + params["mm2_b"]

    if with_img_break and params["img_break"] is not None:
        rows = z.reshape(out_gh, out_gw, -1)
        brk = jnp.broadcast_to(params["img_break"].reshape(1, 1, -1),
                               (out_gh, 1, rows.shape[-1]))
        z = jnp.concatenate([rows, brk], axis=1).reshape(-1, rows.shape[-1])
        z = z[:-1]  # no break after the last row
    return z
