"""VPM: SigLip2 vision encoder + MiniCPM-V resampler.

Architecture contract from the reference (/root/reference/tools/omni/
vision.cpp: build_minicpmv at :292-361, build_vit at :394+, shapes per
tools/omni/convert/model.txt:30-55): Conv2d patch embed 3→1152 (k14 s14,
bias), learned pos-embed selected by 70×70 bucket coordinates
(vision.cpp:1955-1972), 26 pre-LN layers (d=1152, 16 heads, GELU-tanh FFN,
qkv biases), post-LN; then the resampler: kv_proj 1152→4096 (no bias), 64
learned queries, single MHA at d=4096 (head 128) where K = ln_kv(v) + 2D
sincos pos-embed computed at the slice's patch grid (vision.cpp:1714-1797),
ln_post + out proj. Output: 64 tokens × 4096 per image/slice.

GGUF tensor naming per tools/omni/convert/convert_vpm.py ("v.blk.N.*",
"resampler.*"); the historical ffn_up/ffn_down name swap is auto-detected
by shape exactly like the reference loader (vision.cpp:1015-1026).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.gguf import GGUFReader
from ..kernels.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class SigLipConfig:
    n_layers: int = 26
    d_model: int = 1152
    n_heads: int = 16
    d_ff: int = 4304
    patch_size: int = 14
    image_size: int = 980  # max slice edge (minicpmv: scale_resolution 448? from gguf)
    d_out: int = 4096
    n_queries: int = 64
    pos_buckets: int = 70
    eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @staticmethod
    def from_gguf(kv: dict[str, Any]) -> "SigLipConfig":
        g = lambda k, d: kv.get(f"clip.vision.{k}", d)
        return SigLipConfig(
            n_layers=int(g("block_count", 26)),
            d_model=int(g("embedding_length", 1152)),
            n_heads=int(g("attention.head_count", 16)),
            d_ff=int(g("feed_forward_length", 4304)),
            patch_size=int(g("patch_size", 14)),
            image_size=int(g("image_size", 980)),
            n_queries=int(kv.get("clip.minicpmv_query_num", 64)),
            d_out=int(g("projection_dim", 4096)),
        )


def load_params(reader: GGUFReader) -> dict:
    def get(name, required=True):
        if name not in reader.tensors:
            if required:
                raise KeyError(f"VPM tensor missing: {name}")
            return None
        ti = reader.tensors[name]
        from ..core import quants

        return jnp.asarray(quants.dequantize(ti.data, ti.ggml_type, ti.shape))

    p = {
        "patch_w": get("v.patch_embd.weight"),  # [1152, 3, 14, 14]
        "patch_b": get("v.patch_embd.bias"),
        "pos": get("v.position_embd.weight"),  # [4900, 1152]
        "post_ln_w": get("v.post_ln.weight"), "post_ln_b": get("v.post_ln.bias"),
        "pre_ln_w": get("v.pre_ln.weight", False),
        "pre_ln_b": get("v.pre_ln.bias", False),
        # resampler
        "rs_query": get("resampler.query"),  # [64, 4096]
        "rs_kv_proj": get("resampler.kv.weight"),  # [4096, 1152]
        "rs_q_w": get("resampler.attn.q.weight"), "rs_q_b": get("resampler.attn.q.bias"),
        "rs_k_w": get("resampler.attn.k.weight"), "rs_k_b": get("resampler.attn.k.bias"),
        "rs_v_w": get("resampler.attn.v.weight"), "rs_v_b": get("resampler.attn.v.bias"),
        "rs_o_w": get("resampler.attn.out.weight"), "rs_o_b": get("resampler.attn.out.bias"),
        "rs_ln_q_w": get("resampler.ln_q.weight"), "rs_ln_q_b": get("resampler.ln_q.bias"),
        "rs_ln_kv_w": get("resampler.ln_kv.weight"), "rs_ln_kv_b": get("resampler.ln_kv.bias"),
        "rs_ln_post_w": get("resampler.ln_post.weight"), "rs_ln_post_b": get("resampler.ln_post.bias"),
        "rs_proj": get("resampler.proj.weight"),  # [4096, 4096]
        "layers": [],
    }
    i = 0
    while f"v.blk.{i}.ln1.weight" in reader.tensors:
        b = f"v.blk.{i}."
        lp = {
            "ln1_w": get(b + "ln1.weight"), "ln1_b": get(b + "ln1.bias"),
            "wq": get(b + "attn_q.weight"), "bq": get(b + "attn_q.bias", False),
            "wk": get(b + "attn_k.weight"), "bk": get(b + "attn_k.bias", False),
            "wv": get(b + "attn_v.weight"), "bv": get(b + "attn_v.bias", False),
            "wo": get(b + "attn_out.weight"), "bo": get(b + "attn_out.bias", False),
            "ln2_w": get(b + "ln2.weight"), "ln2_b": get(b + "ln2.bias"),
            "w_up": get(b + "ffn_up.weight"), "b_up": get(b + "ffn_up.bias", False),
            "w_down": get(b + "ffn_down.weight"), "b_down": get(b + "ffn_down.bias", False),
        }
        d = lp["ln1_w"].shape[0]
        # historical converter name swap: "up" must map d -> ff
        if lp["w_up"].shape[1] != d:
            lp["w_up"], lp["w_down"] = lp["w_down"], lp["w_up"]
            lp["b_up"], lp["b_down"] = lp["b_down"], lp["b_up"]
        p["layers"].append(lp)
        i += 1
    return p


# ---------------------------------------------------------------------------
# position embeddings
# ---------------------------------------------------------------------------

def bucket_positions(h_patches: int, w_patches: int, buckets: int = 70) -> np.ndarray:
    """ViT learned-pos-embed indices, NaViT-style bucket interpolation onto a
    buckets×buckets grid (vision.cpp:1955-1972)."""
    bh = np.floor(buckets * np.arange(h_patches) / h_patches).astype(np.int32)
    bw = np.floor(buckets * np.arange(w_patches) / w_patches).astype(np.int32)
    return (bh[:, None] * buckets + bw[None, :]).reshape(-1)


def sincos_pos_embed_2d(embed_dim: int, w: int, h: int) -> np.ndarray:
    """Resampler K-side 2D sincos embedding at the slice's patch grid,
    matching vision.cpp get_2d_sincos_pos_embed(embed_dim, {w, h}) incl. its
    w-major flatten (vision.cpp:1758-1797). Returns [w*h, embed_dim]."""
    half = embed_dim // 2
    quarter = half // 2
    omega = 1.0 / (10000.0 ** (np.arange(quarter, dtype=np.float64) / quarter))

    grid_a = np.arange(w, dtype=np.float64)  # "h" axis in the reference fn
    grid_b = np.arange(h, dtype=np.float64)  # "w" axis
    # emb_h from grid_a (varies along first axis), emb_w from grid_b
    out_a = grid_a[:, None, None] * omega[None, None, :]  # [w, 1, q]
    out_b = grid_b[None, :, None] * omega[None, None, :]  # [1, h, q]
    emb_a = np.concatenate([np.sin(out_a), np.cos(out_a)], -1)  # [w, 1, half]
    emb_b = np.concatenate([np.sin(out_b), np.cos(out_b)], -1)  # [1, h, half]
    emb = np.concatenate([
        np.broadcast_to(emb_a, (w, h, half)),
        np.broadcast_to(emb_b, (w, h, half)),
    ], axis=-1)  # [w, h, embed_dim], index order (grid_a=h-axis, grid_b=w-axis)
    # reference flatten: pos_embed_2d[w_idx * H + h_idx] = emb[h_idx][w_idx]
    # with H = w (the first element of the pair). Net effect: transpose.
    return emb.transpose(1, 0, 2).reshape(h * w, embed_dim).astype(np.float32)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _lin(x, w, b=None):
    out = jnp.einsum("td,nd->tn", x, w, preferred_element_type=jnp.float32)
    return out + b if b is not None else out


@functools.partial(jax.jit, static_argnames=('cfg',))
def encode_image(
    params: dict, cfg: SigLipConfig, pixels: jax.Array,
    pos_ids: jax.Array, k_pos_embed: jax.Array,
) -> jax.Array:
    """One image/slice -> [n_queries, d_out].

    pixels: [H, W, 3] normalized float; H, W multiples of patch_size.
    pos_ids: [n_patches] bucket indices; k_pos_embed: [n_patches, d_out].
    """
    hp = pixels.shape[0] // cfg.patch_size
    wp = pixels.shape[1] // cfg.patch_size
    n_patches = hp * wp

    x = jax.lax.conv_general_dilated(
        pixels[None], params["patch_w"],
        window_strides=(cfg.patch_size,) * 2, padding="VALID",
        dimension_numbers=("NHWC", "OIHW", "NHWC"),
    )[0].reshape(n_patches, cfg.d_model)
    x = x + params["patch_b"]
    h = x + params["pos"][pos_ids]

    if params.get("pre_ln_w") is not None:
        h = layer_norm(h, params["pre_ln_w"], params["pre_ln_b"], cfg.eps)

    scale = 1.0 / float(np.sqrt(cfg.head_dim))
    for lp in params["layers"]:
        hn = layer_norm(h, lp["ln1_w"], lp["ln1_b"], cfg.eps)
        q = _lin(hn, lp["wq"], lp["bq"]).reshape(n_patches, cfg.n_heads, cfg.head_dim)
        k = _lin(hn, lp["wk"], lp["bk"]).reshape(n_patches, cfg.n_heads, cfg.head_dim)
        v = _lin(hn, lp["wv"], lp["bv"]).reshape(n_patches, cfg.n_heads, cfg.head_dim)
        att = jax.nn.softmax(
            jnp.einsum("thd,shd->hts", q, k, preferred_element_type=jnp.float32)
            * scale, axis=-1)
        out = jnp.einsum("hts,shd->thd", att, v, preferred_element_type=jnp.float32)
        h = h + _lin(out.reshape(n_patches, cfg.d_model), lp["wo"], lp["bo"])
        hn = layer_norm(h, lp["ln2_w"], lp["ln2_b"], cfg.eps)
        up = _lin(hn, lp["w_up"], lp["b_up"])
        h = h + _lin(jax.nn.gelu(up, approximate=True), lp["w_down"], lp["b_down"])

    h = layer_norm(h, params["post_ln_w"], params["post_ln_b"], cfg.eps)

    # ---- resampler ----
    v = _lin(h, params["rs_kv_proj"])  # [n_patches, d_out], no bias
    q = layer_norm(params["rs_query"], params["rs_ln_q_w"], params["rs_ln_q_b"], cfg.eps)
    v = layer_norm(v, params["rs_ln_kv_w"], params["rs_ln_kv_b"], cfg.eps)
    k = v + k_pos_embed

    d_head = min(128, cfg.d_out)  # 128 at full size (d_out 4096, 32 heads)
    n_head = max(cfg.d_out // d_head, 1)
    Q = _lin(q, params["rs_q_w"], params["rs_q_b"]).reshape(cfg.n_queries, n_head, d_head)
    K = _lin(k, params["rs_k_w"], params["rs_k_b"]).reshape(n_patches, n_head, d_head)
    V = _lin(v, params["rs_v_w"], params["rs_v_b"]).reshape(n_patches, n_head, d_head)
    att = jax.nn.softmax(
        jnp.einsum("qhd,shd->hqs", Q, K, preferred_element_type=jnp.float32)
        / np.sqrt(d_head), axis=-1)
    out = jnp.einsum("hqs,shd->qhd", att, V, preferred_element_type=jnp.float32)
    out = _lin(out.reshape(cfg.n_queries, cfg.d_out), params["rs_o_w"], params["rs_o_b"])
    out = layer_norm(out, params["rs_ln_post_w"], params["rs_ln_post_b"], cfg.eps)
    return _lin(out, params["rs_proj"])


def encode_image_np(params, cfg, pixels_np: np.ndarray) -> np.ndarray:
    """Host convenience wrapper: builds pos ids + sincos embed then encodes."""
    hp = pixels_np.shape[0] // cfg.patch_size
    wp = pixels_np.shape[1] // cfg.patch_size
    pos_ids = jnp.asarray(bucket_positions(hp, wp, cfg.pos_buckets))
    pe = jnp.asarray(sincos_pos_embed_2d(cfg.d_out, wp, hp))
    return np.asarray(encode_image(params, cfg, jnp.asarray(pixels_np), pos_ids, pe))
