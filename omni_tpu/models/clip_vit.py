"""Generic ViT vision encoder + multimodal projector heads.

The TPU analog of the reference's clip.cpp single-graph-many-projectors
design (/root/reference/tools/mtmd/clip.cpp): ONE trunk forward with
config switches (norm type, FFN activation, CLS token, pre/post LN,
layer-scale) and a projector-head registry keyed by the GGUF
`clip.projector_type`:

- "mlp"      — LLaVA: CLS+learned-pos CLIP ViT, feature layer -2,
               mm.0/GELU/mm.2 (PROJECTOR_TYPE_MLP)
- "gemma3"   — SigLip trunk, avg-pool k=scale_factor, RMS soft-emb-norm
               (stored +1 like the reference converter), input projection
               (clip.cpp:508-530)
- "idefics3" — SigLip trunk, pixel shuffle, single linear
               (clip.cpp:531-537; HF Idefics3Connector)
- "internvl" — CLS ViT with layer-scale, pixel shuffle, LN + 2-layer
               GELU MLP (clip.cpp:916-982)
- "lfm2"     — SigLip2-NaFlex trunk (LINEAR patch embed over
               pre-patchified rows, bilinearly resized position grid),
               pixel unshuffle + LN + 2-layer GELU MLP (clip.cpp:538-552)

Parity oracle: HF transformers {Llava,Gemma3,Idefics3,InternVL}
ForConditionalGeneration.get_image_features. All matmuls run batched over
patches (MXU-shaped); images are pre-patchified on the host.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.gguf import GGUFReader
from ..kernels.norms import layer_norm, rms_norm


@dataclasses.dataclass(frozen=True)
class ClipVitConfig:
    depth: int
    embed_dim: int
    out_hidden: int
    n_heads: int
    proj_type: str = "mlp"
    patch_size: int = 14
    image_size: int = 224
    in_channels: int = 3
    mlp_dim: int = 0
    eps: float = 1e-5
    feature_layer: int = -2   # llava vision_feature_layer
    norm: str = "ln"          # "ln" | "rms"
    act: str = "quick_gelu"   # "quick_gelu" | "gelu" | "gelu_tanh"
    scale_factor: int = 1     # gemma3 pool kernel / pixel-shuffle factor
    # llava-next anyres (mm_patch_merge_type == "spatial_unpad"):
    # candidate canvas resolutions, flattened (h0, w0, h1, w1, ...)
    pinpoints: tuple = ()

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.n_heads

    @staticmethod
    def from_gguf(kv: dict) -> "ClipVitConfig":
        g = lambda k, d=None: kv.get(f"clip.vision.{k}", d)
        proj = kv.get("clip.projector_type", "mlp")
        if kv.get("clip.use_silu"):
            act = "silu"
        elif kv.get("clip.use_gelu"):
            act = "gelu"
        else:
            act = "quick_gelu"
        # our converters record the exact HF activation (the reference
        # collapses gelu_tanh onto gelu; parity wants the real one)
        act = g("ffn_op", act)
        return ClipVitConfig(
            depth=int(g("block_count")),
            embed_dim=int(g("embedding_length")),
            out_hidden=int(g("projection_dim")),
            n_heads=int(g("attention.head_count")),
            proj_type=proj,
            patch_size=int(g("patch_size")),
            image_size=int(g("image_size", 224)),
            mlp_dim=int(g("feed_forward_length")),
            eps=float(g("attention.layer_norm_epsilon", 1e-5)),
            feature_layer=int(g("feature_layer", -2 if proj == "mlp" else -1)),
            norm="rms" if bool(g("use_rms_norm", False)) else "ln",
            act=act,
            scale_factor=int(g("projector.scale_factor",
                               g("scale_factor", 1))),
            pinpoints=tuple(
                int(x) for x in np.asarray(
                    g("image_grid_pinpoints", ())).reshape(-1)),
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
        "cls": get("v.class_embd", required=False),
        "patch_w": get("v.patch_embd.weight"),   # [E, C, P, P]
        "patch_b": get("v.patch_embd.bias", required=False),
        "pos": get("v.position_embd.weight", required=False),  # [n_pos, E]
        "pre_ln": get("v.pre_ln.weight", required=False),
        "pre_ln_b": get("v.pre_ln.bias", required=False),
        "post_ln": get("v.post_ln.weight", required=False),
        "post_ln_b": get("v.post_ln.bias", required=False),
        # projector heads (presence keyed by proj_type)
        "mm0": get("mm.0.weight", required=False),
        "mm0_b": get("mm.0.bias", required=False),
        "mm2": get("mm.2.weight", required=False),
        "mm2_b": get("mm.2.bias", required=False),
        "mm_input_proj": get("mm.input_projection.weight", required=False),
        "input_norm": get("mm.input_norm.weight", required=False),
        "input_norm_b": get("mm.input_norm.bias", required=False),
        "mm1": get("mm.1.weight", required=False),
        "mm1_b": get("mm.1.bias", required=False),
        "image_newline": get("model.image_newline", required=False),
        "mm_soft_emb_norm": get("mm.soft_emb_norm.weight", required=False),
        "mm_fc": get("mm.model.fc.weight", required=False),
        "mvlm_0": get("mm.model.mlp.0.weight", required=False),
        "mvlm_0_b": get("mm.model.mlp.0.bias", required=False),
        "mvlm_1": get("mm.model.mlp.1.weight", required=False),
        "mvlm_1_b": get("mm.model.mlp.1.bias", required=False),
        "mvlm_3": get("mm.model.mlp.3.weight", required=False),
        "mvlm_3_b": get("mm.model.mlp.3.bias", required=False),
        "layers": [],
    }
    i = 0
    while f"v.blk.{i}.ln1.weight" in reader.tensors:
        p = f"v.blk.{i}."
        params["layers"].append({
            "ln1": get(p + "ln1.weight"),
            "ln1_b": get(p + "ln1.bias", required=False),
            "ln2": get(p + "ln2.weight"),
            "ln2_b": get(p + "ln2.bias", required=False),
            "wq": get(p + "attn_q.weight"),
            "bq": get(p + "attn_q.bias", required=False),
            "wk": get(p + "attn_k.weight"),
            "bk": get(p + "attn_k.bias", required=False),
            "wv": get(p + "attn_v.weight"),
            "bv": get(p + "attn_v.bias", required=False),
            "wo": get(p + "attn_out.weight"),
            "bo": get(p + "attn_out.bias", required=False),
            "fc1": get(p + "ffn_up.weight"), "fc1_b": get(p + "ffn_up.bias"),
            "fc2": get(p + "ffn_down.weight"),
            "fc2_b": get(p + "ffn_down.bias"),
            "ls1": get(p + "ls1.weight", required=False),
            "ls2": get(p + "ls2.weight", required=False),
        })
        i += 1
    return params


def _norm(cfg, x, w, b):
    if cfg.norm == "rms":
        return rms_norm(x, w, cfg.eps)
    return layer_norm(x, w, b, cfg.eps)


def _act(cfg, a):
    if cfg.act == "quick_gelu":
        return a * jax.nn.sigmoid(1.702 * a)
    if cfg.act == "gelu_tanh":
        return jax.nn.gelu(a, approximate=True)
    if cfg.act == "silu":
        return jax.nn.silu(a)
    return jax.nn.gelu(a, approximate=False)


def patchify(cfg: ClipVitConfig, pixels: jax.Array) -> jax.Array:
    """[C, H, W] -> [n_patches, C*P*P] (stride=kernel conv as matmul)."""
    c, hh, ww = pixels.shape
    p = cfg.patch_size
    pix = pixels.reshape(c, hh // p, p, ww // p, p).transpose(1, 3, 0, 2, 4)
    return pix.reshape(-1, c * p * p).astype(jnp.float32)


def idefics3_pos_ids(nb_h: int, nb_w: int, nps: int) -> np.ndarray:
    """Bucketized position ids (HF Idefics3VisionEmbeddings / SmolVLM):
    fractional patch coords shrunk by (1-1e-6) and bucketized against
    1/nps boundaries — NOT row-major, even at full resolution (the shrink
    pushes coord i/nps just below boundary i)."""
    bounds = np.arange(1 / nps, 1.0, 1 / nps, dtype=np.float32)

    def bucket(nb):
        fr = (np.arange(nb, dtype=np.float32) / nb
              * np.float32(1 - 1e-6)).astype(np.float32)
        return np.searchsorted(bounds, fr, side="right")

    bh, bw = bucket(nb_h), bucket(nb_w)
    return (bh[:, None] * nps + bw[None, :]).reshape(-1)


def resize_pos_grid(pos: np.ndarray, gh: int, gw: int) -> np.ndarray:
    """NaFlex positional-embedding resize (HF Siglip2VisionEmbeddings /
    reference clip.cpp resize_position_embeddings): the [N0, E] learned
    table viewed as a sqrt(N0) grid, bilinearly resampled (align_corners
    False) to the image's (gh, gw) patch grid -> [gh*gw, E]."""
    n0, e = pos.shape
    side = int(round(np.sqrt(n0)))
    grid = pos.reshape(side, side, e).astype(np.float32)
    if (gh, gw) == (side, side):
        return grid.reshape(-1, e)

    def axis_coords(n_out, n_in):
        c = (np.arange(n_out, dtype=np.float64) + 0.5) * n_in / n_out - 0.5
        return np.clip(c, 0, n_in - 1)

    ys, xs = axis_coords(gh, side), axis_coords(gw, side)
    y0 = np.floor(ys).astype(int)
    x0 = np.floor(xs).astype(int)
    y1 = np.minimum(y0 + 1, side - 1)
    x1 = np.minimum(x0 + 1, side - 1)
    fy = (ys - y0)[:, None, None]
    fx = (xs - x0)[None, :, None]
    out = (grid[y0][:, x0] * (1 - fy) * (1 - fx)
           + grid[y1][:, x0] * fy * (1 - fx)
           + grid[y0][:, x1] * (1 - fy) * fx
           + grid[y1][:, x1] * fy * fx)
    return out.reshape(gh * gw, e).astype(np.float32)


def vit_trunk(params: dict, cfg: ClipVitConfig, pixels: jax.Array,
              n_run: int | None = None,
              pos_ids: np.ndarray | None = None,
              pos_override: np.ndarray | None = None) -> jax.Array:
    """Shared encoder: patch embed (+CLS)(+learned pos)(+pre-LN), n_run
    transformer blocks, optional post-LN. -> [n_pos, E]."""
    pix = patchify(cfg, pixels)
    wp = params["patch_w"].reshape(cfg.embed_dim, -1)
    h = pix @ wp.T
    if params["patch_b"] is not None:
        h = h + params["patch_b"]
    if params["cls"] is not None:
        h = jnp.concatenate([params["cls"].reshape(1, -1), h], axis=0)
    if pos_override is not None:  # NaFlex: per-image resized pos grid
        h = h + jnp.asarray(pos_override)
    elif params["pos"] is not None:
        if pos_ids is not None:
            h = h + params["pos"][np.asarray(pos_ids)]
        else:
            h = h + params["pos"][: h.shape[0]]
    if params["pre_ln"] is not None:
        h = _norm(cfg, h, params["pre_ln"], params["pre_ln_b"])

    n = h.shape[0]
    nh, hd = cfg.n_heads, cfg.head_dim
    if n_run is None:
        n_run = cfg.depth
    def lin(x, w, b):
        y = x @ w.T
        return y if b is None else y + b

    for lp in params["layers"][:n_run]:
        hn = _norm(cfg, h, lp["ln1"], lp["ln1_b"])
        q = lin(hn, lp["wq"], lp["bq"]).reshape(n, nh, hd)
        k = lin(hn, lp["wk"], lp["bk"]).reshape(n, nh, hd)
        v = lin(hn, lp["wv"], lp["bv"]).reshape(n, nh, hd)
        scores = jnp.einsum("thd,shd->hts", q, k) / jnp.sqrt(float(hd))
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("hts,shd->thd", probs, v).reshape(n, -1)
        attn = lin(attn, lp["wo"], lp["bo"])
        if lp["ls1"] is not None:
            attn = attn * lp["ls1"]
        h = h + attn
        hn2 = _norm(cfg, h, lp["ln2"], lp["ln2_b"])
        a = _act(cfg, hn2 @ lp["fc1"].T + lp["fc1_b"])
        a = a @ lp["fc2"].T + lp["fc2_b"]
        if lp["ls2"] is not None:
            a = a * lp["ls2"]
        h = h + a
    if n_run == cfg.depth and params["post_ln"] is not None:
        h = _norm(cfg, h, params["post_ln"], params["post_ln_b"])
    return h


def _pixel_shuffle(h: jax.Array, grid: int, sf: int) -> jax.Array:
    """[grid*grid, E] -> [(grid/sf)^2, E*sf^2] (HF idefics3/internvl
    pixel_shuffle; reference build_patch_merge_permute)."""
    e = h.shape[-1]
    x = h.reshape(grid, grid // sf, e * sf)            # [H, W/s, E*s]
    x = x.transpose(1, 0, 2)                           # [W/s, H, E*s]
    x = x.reshape(grid // sf, grid // sf, e * sf * sf)  # [W/s, H/s, E*s*s]
    x = x.transpose(1, 0, 2)
    return x.reshape(-1, e * sf * sf)


def forward(params: dict, cfg: ClipVitConfig,
            pixels: jax.Array) -> jax.Array:
    """pixels [C, H, W] (normalized) -> [n_tokens, out_hidden]."""
    if cfg.proj_type == "mlp":
        # llava reads hidden states BEFORE the last -(feature_layer+1)
        # layers (HF output_hidden_states indexing); CLS dropped
        n_run = cfg.depth + cfg.feature_layer + 1 if cfg.feature_layer < 0 \
            else cfg.feature_layer
        h = vit_trunk(params, cfg, pixels, n_run=n_run)
        feats = h[1:] if params["cls"] is not None else h
        z = feats @ params["mm0"].T + params["mm0_b"]
        z = jax.nn.gelu(z, approximate=False)
        return z @ params["mm2"].T + params["mm2_b"]

    if cfg.proj_type == "gemma3":
        h = vit_trunk(params, cfg, pixels)          # [g*g, E], no CLS
        g = int(np.sqrt(h.shape[0]))
        k = cfg.scale_factor
        # avg-pool k×k over the patch grid (clip.cpp ggml_pool_2d AVG)
        hp = h.reshape(g // k, k, g // k, k, -1).mean(axis=(1, 3))
        hp = hp.reshape(-1, h.shape[-1])
        # Gemma3RMSNorm stored +1 by the converter (reference convention)
        z = rms_norm(hp, params["mm_soft_emb_norm"], 1e-6)
        return z @ params["mm_input_proj"]           # [E, d_llm] as-is

    if cfg.proj_type == "idefics3":
        g = pixels.shape[-1] // cfg.patch_size
        nps = cfg.image_size // cfg.patch_size
        h = vit_trunk(params, cfg, pixels,
                      pos_ids=idefics3_pos_ids(g, g, nps))  # [g*g, E]
        z = _pixel_shuffle(h, g, cfg.scale_factor)
        return z @ params["mm_fc"].T                 # Idefics3SimpleMLP

    if cfg.proj_type == "lfm2":
        g = pixels.shape[-1] // cfg.patch_size
        pos = resize_pos_grid(np.asarray(params["pos"]), g, g)
        h = vit_trunk(params, cfg, pixels, pos_override=pos)  # [g*g, E]
        z = _pixel_shuffle(h, g, cfg.scale_factor)
        z = layer_norm(z, params["input_norm"], params["input_norm_b"],
                       1e-5)
        z = z @ params["mm1"].T
        if params["mm1_b"] is not None:
            z = z + params["mm1_b"]
        z = jax.nn.gelu(z, approximate=False)
        z = z @ params["mm2"].T
        if params["mm2_b"] is not None:
            z = z + params["mm2_b"]
        return z

    if cfg.proj_type == "internvl":
        h = vit_trunk(params, cfg, pixels)          # CLS + patches
        feats = h[1:]
        g = int(np.sqrt(feats.shape[0]))
        z = _pixel_shuffle(feats, g, cfg.scale_factor)
        z = layer_norm(z, params["mvlm_0"], params["mvlm_0_b"], 1e-5)
        z = z @ params["mvlm_1"].T + params["mvlm_1_b"]
        z = jax.nn.gelu(z, approximate=False)
        return z @ params["mvlm_3"].T + params["mvlm_3_b"]

    raise NotImplementedError(f"projector type {cfg.proj_type}")
