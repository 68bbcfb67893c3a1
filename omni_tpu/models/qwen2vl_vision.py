"""Qwen2-VL vision tower + 2x2 patch merger (the "qwen2vl_merger"
projector of the reference's generic multimodal layer).

Reference: /root/reference/tools/mtmd/clip.cpp build_qwen2vl (graph) and
convert_hf_to_gguf.py Qwen2VLVisionModel (mmproj tensor naming: split
qkv, Conv3D split into two Conv2D planes v.patch_embd.weight{,.1}).
Math follows HF transformers modeling_qwen2_vl (the parity oracle):

- patch embed: Conv3D(kernel=stride=[T,P,P], no bias) over flattened
  [N, C*T*P*P] patches == one matmul
- per-patch 2-D rotary: angle pairs = [h_pos x freqs | w_pos x freqs]
  (head_dim/4 frequencies each), NeoX half-split rotation, patches
  ordered in spatial-merge blocks (rot_pos_emb's permute)
- blocks: LayerNorm -> fused-qkv full attention (per-image, no causal
  mask) -> proj; LayerNorm -> MLP (quick_gelu)
- merger: LayerNorm (ln_q) then the 2x2-group MLP
  [4*embed] -> GELU -> [d_llm] ("mm.0"/"mm.2")
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..core.gguf import GGUFReader
from ..kernels.norms import layer_norm, rms_norm


@dataclasses.dataclass(frozen=True)
class Qwen2VLVisionConfig:
    depth: int
    embed_dim: int
    out_hidden: int        # LLM width (merger output)
    n_heads: int
    in_channels: int = 3
    patch_size: int = 14
    spatial_merge: int = 2
    temporal_patch: int = 2
    mlp_dim: int = 0       # fc1 width
    eps: float = 1e-6
    # qwen2.5vl variant (clip.cpp PROJECTOR_TYPE_QWEN25VL): RMSNorm,
    # gated-SiLU MLP, window attention with periodic full-attn layers
    rms: bool = False
    gated: bool = False
    window_size: int = 0               # 0 = full attention everywhere
    fullatt_blocks: tuple = ()         # HF fullatt_block_indexes

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.n_heads

    @staticmethod
    def from_gguf(kv: dict) -> "Qwen2VLVisionConfig":
        g = lambda k, d=None: kv.get(f"clip.vision.{k}", d)
        v25 = kv.get("clip.projector_type") == "qwen2.5vl_merger"
        wa = int(g("n_wa_pattern", 0))
        depth = int(g("block_count"))
        fullatt = tuple(g("fullatt_block_indexes",
                          tuple(range(wa - 1, depth, wa)) if wa else ()))
        return Qwen2VLVisionConfig(
            depth=depth,
            embed_dim=int(g("embedding_length")),
            out_hidden=int(g("projection_dim")),
            n_heads=int(g("attention.head_count")),
            in_channels=int(g("in_channels", 3)),
            patch_size=int(g("patch_size")),
            spatial_merge=int(g("spatial_merge_size", 2)),
            temporal_patch=int(g("temporal_patch_size", 2)),
            mlp_dim=int(g("feed_forward_length")),
            eps=float(g("attention.layer_norm_epsilon", 1e-6)),
            rms=v25, gated=v25,
            window_size=int(g("window_size", 0)) if v25 else 0,
            fullatt_blocks=fullatt if v25 else (),
        )


def load_params(reader: GGUFReader) -> dict:
    from ..core import quants

    def get(n, required=True):
        if n not in reader.tensors:
            if required:
                raise KeyError(f"qwen2vl vision tensor missing: {n}")
            return None
        ti = reader.tensors[n]
        return jnp.asarray(quants.dequantize(ti.data, ti.ggml_type,
                                             ti.shape))

    params = {
        "patch0": get("v.patch_embd.weight"),       # [E, C, P, P]
        "patch1": get("v.patch_embd.weight.1"),     # temporal plane 2
        "ln_q": get("v.post_ln.weight"),
        "ln_q_b": get("v.post_ln.bias", required=False),
        "mm0": get("mm.0.weight"),
        "mm0_b": get("mm.0.bias"),
        "mm2": get("mm.2.weight"),
        "mm2_b": get("mm.2.bias"),
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
            "wq": get(p + "attn_q.weight"), "bq": get(p + "attn_q.bias"),
            "wk": get(p + "attn_k.weight"), "bk": get(p + "attn_k.bias"),
            "wv": get(p + "attn_v.weight"), "bv": get(p + "attn_v.bias"),
            "wo": get(p + "attn_out.weight"),
            "bo": get(p + "attn_out.bias"),
            "fc1": get(p + "ffn_up.weight"), "fc1_b": get(p + "ffn_up.bias"),
            "fc2": get(p + "ffn_down.weight"),
            "fc2_b": get(p + "ffn_down.bias"),
            "gate": get(p + "ffn_gate.weight", required=False),
            "gate_b": get(p + "ffn_gate.bias", required=False),
        })
        i += 1
    return params


def rot_pos_ids(grid_thw, merge: int) -> np.ndarray:
    """[N, 2] (h, w) per patch in spatial-merge-block order
    (HF Qwen2VisionTransformer.rot_pos_emb)."""
    out = []
    for t, h, w in grid_thw:
        hp = np.broadcast_to(np.arange(h)[:, None], (h, w))
        wp = np.broadcast_to(np.arange(w)[None, :], (h, w))

        def blk(x):
            return (x.reshape(h // merge, merge, w // merge, merge)
                    .transpose(0, 2, 1, 3).reshape(-1))

        ids = np.stack([blk(hp), blk(wp)], axis=-1)
        out.append(np.tile(ids, (t, 1)))
    return np.concatenate(out, axis=0)


def window_index(grid_thw, merge: int, window: int, patch: int):
    """(window_index over merge-groups, per-PATCH window segment ids in
    the reordered sequence) — HF Qwen2_5_VisionTransformer
    .get_window_index; the reference feeds the same permutation as
    inv_window_idx + window_mask graph inputs (clip.cpp:709-722)."""
    vws = window // merge // patch  # window size in merge-grid units
    idx_parts, seg_parts = [], []
    base = 0
    wid = 0
    for t, hh, ww in grid_thw:
        t, hh, ww = int(t), int(hh), int(ww)
        lh, lw = hh // merge, ww // merge
        index = np.arange(t * lh * lw).reshape(t, lh, lw)
        pad_h = (-lh) % vws
        pad_w = (-lw) % vws
        ip = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
        ip[:, :lh, :lw] = index
        nwh, nww = (lh + pad_h) // vws, (lw + pad_w) // vws
        ip = (ip.reshape(t, nwh, vws, nww, vws).transpose(0, 1, 3, 2, 4)
              .reshape(t * nwh * nww, vws * vws))
        seqlens = (ip != -100).sum(axis=1)
        flat = ip.reshape(-1)
        valid = flat[flat != -100]
        idx_parts.append(valid + base)
        seg_parts.append(np.repeat(np.arange(wid, wid + len(seqlens)),
                                   seqlens * merge * merge))
        base += t * lh * lw
        wid += len(seqlens)
    return np.concatenate(idx_parts), np.concatenate(seg_parts)


def forward(params: dict, cfg: Qwen2VLVisionConfig, pixels: jax.Array,
            grid_thw) -> jax.Array:
    """pixels [N, C*T*P*P] flattened patches (the HF processor layout),
    grid_thw list of (t, h, w) per image -> merged embeddings
    [N / merge^2, out_hidden]."""
    n = pixels.shape[0]
    c, tp, p = cfg.in_channels, cfg.temporal_patch, cfg.patch_size
    pix = pixels.reshape(n, c, tp, p, p).astype(jnp.float32)
    wconv = jnp.stack([params["patch0"], params["patch1"]], axis=2)
    # conv with kernel == stride == patch == one contraction
    h = jnp.einsum("nctxy,ectxy->ne", pix, wconv)

    def bnorm(x, w, b):
        if cfg.rms:
            return rms_norm(x, w, cfg.eps)
        return layer_norm(x, w, b, cfg.eps)

    # 2-D rotary tables (NeoX half-split over [h_freqs | w_freqs])
    hd = cfg.head_dim
    inv = 1.0 / (10000.0 ** (np.arange(0, hd // 2, 2) / (hd // 2)))
    ids = rot_pos_ids(grid_thw, cfg.spatial_merge)  # [N, 2]

    # qwen2.5vl: the whole sequence is PERMUTED into window order before
    # the blocks; window layers mask across windows, the periodic
    # fullatt_blocks see per-image blocks; the merger output is permuted
    # back (HF Qwen2_5_VisionTransformer.forward)
    m2 = cfg.spatial_merge ** 2
    win_idx = None
    if cfg.window_size:
        win_idx, seg_win = window_index(grid_thw, cfg.spatial_merge,
                                        cfg.window_size, cfg.patch_size)
        perm = (win_idx[:, None] * m2 + np.arange(m2)[None, :]).reshape(-1)
        h = h[perm]
        ids = ids[perm]
        wmask = jnp.asarray(seg_win[:, None] == seg_win[None, :])

    freqs = np.concatenate([ids[:, :1] * inv[None, :],
                            ids[:, 1:] * inv[None, :]], axis=1)  # [N, hd/2]
    emb = np.concatenate([freqs, freqs], axis=1)  # [N, hd]
    cos = jnp.asarray(np.cos(emb), jnp.float32)[:, None, :]
    sin = jnp.asarray(np.sin(emb), jnp.float32)[:, None, :]

    def rope(x):  # [N, H, D], rotate_half convention
        x1, x2 = x[..., : hd // 2], x[..., hd // 2:]
        rot = jnp.concatenate([-x2, x1], axis=-1)
        return x * cos + rot * sin

    # per-image full-attention mask (cu_seqlens blocks); under the window
    # permutation every patch keeps its image (images are contiguous in
    # both orders), so the segment ids permute with it
    sizes = [int(t) * int(hh) * int(ww) for t, hh, ww in grid_thw]
    seg = np.repeat(np.arange(len(sizes)), sizes)
    if win_idx is not None:
        seg = seg[perm]
    mask = jnp.asarray(seg[:, None] == seg[None, :])

    nh = cfg.n_heads
    for il, lp in enumerate(params["layers"]):
        full = (win_idx is None) or (il in cfg.fullatt_blocks)
        hn = bnorm(h, lp["ln1"], lp["ln1_b"])
        q = (hn @ lp["wq"].T + lp["bq"]).reshape(n, nh, hd)
        k = (hn @ lp["wk"].T + lp["bk"]).reshape(n, nh, hd)
        v = (hn @ lp["wv"].T + lp["bv"]).reshape(n, nh, hd)
        q, k = rope(q), rope(k)
        scores = jnp.einsum("thd,shd->hts", q, k) / jnp.sqrt(float(hd))
        scores = jnp.where((mask if full else wmask)[None], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("hts,shd->thd", probs, v).reshape(n, -1)
        h = h + (attn @ lp["wo"].T + lp["bo"])
        hn2 = bnorm(h, lp["ln2"], lp["ln2_b"])
        if cfg.gated:  # qwen2.5vl gated-SiLU MLP
            a = jax.nn.silu(hn2 @ lp["gate"].T + lp["gate_b"]) \
                * (hn2 @ lp["fc1"].T + lp["fc1_b"])
        else:
            a = hn2 @ lp["fc1"].T + lp["fc1_b"]
            a = a * jax.nn.sigmoid(1.702 * a)  # quick_gelu
        h = h + (a @ lp["fc2"].T + lp["fc2_b"])

    # merger: ln_q then 2x2-group MLP
    hq = bnorm(h, params["ln_q"], params["ln_q_b"])
    g = cfg.spatial_merge ** 2
    hq = hq.reshape(n // g, g * cfg.embed_dim)
    z = hq @ params["mm0"].T + params["mm0_b"]
    z = jax.nn.gelu(z, approximate=False)
    z = z @ params["mm2"].T + params["mm2_b"]
    if win_idx is not None:  # restore merge-group order
        z = z[np.argsort(win_idx)]
    return z


def mrope_positions(n_text_before: int, grid_thw, start: int,
                    merge: int = 2) -> tuple[np.ndarray, int]:
    """M-RoPE (t, h, w) streams for ONE image's MERGED tokens starting at
    text position `start` (HF Qwen2VLForConditionalGeneration
    get_rope_index). Returns (pos3 [n_merged, 3], next_text_pos)."""
    del n_text_before
    t, h, w = (int(x) for x in grid_thw)
    hh, ww = h // merge, w // merge
    tt = np.repeat(np.arange(t), hh * ww)
    hp = np.tile(np.repeat(np.arange(hh), ww), t)
    wp = np.tile(np.arange(ww), t * hh)
    pos3 = np.stack([tt, hp, wp], axis=1).astype(np.int32) + start
    nxt = int(pos3.max()) + 1
    return pos3, nxt


OPENAI_CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
OPENAI_CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess(img, patch: int = 14, merge: int = 2,
               temporal: int = 2) -> tuple[np.ndarray, tuple]:
    """PIL image / [H, W, 3] array -> (flat patches [N, C*T*P*P],
    grid (t, h, w)) in the HF Qwen2VLImageProcessor layout (resize to a
    patch*merge multiple, CLIP normalization, temporal duplication,
    spatial-merge-block patch ordering)."""
    a = np.asarray(img, np.float32)
    if a.ndim == 2:
        a = np.stack([a] * 3, axis=-1)
    if a.max() > 1.5:
        a = a / 255.0
    f = patch * merge
    h = max(f, round(a.shape[0] / f) * f)
    w = max(f, round(a.shape[1] / f) * f)
    if (h, w) != a.shape[:2]:
        try:
            from PIL import Image

            im = Image.fromarray((a * 255).astype(np.uint8))
            a = np.asarray(im.resize((w, h), Image.BICUBIC),
                           np.float32) / 255.0
        except ImportError:  # nearest-neighbor fallback
            yi = (np.arange(h) * a.shape[0] / h).astype(int)
            xi = (np.arange(w) * a.shape[1] / w).astype(int)
            a = a[yi][:, xi]
    a = (a - OPENAI_CLIP_MEAN) / OPENAI_CLIP_STD
    frames = np.repeat(a.transpose(2, 0, 1)[None], temporal, axis=0)
    c = frames.shape[1]
    gt, gh, gw = 1, h // patch, w // patch
    pat = frames.reshape(gt, temporal, c, gh // merge, merge, patch,
                         gw // merge, merge, patch)
    pat = pat.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    flat = pat.reshape(gt * gh * gw, c * temporal * patch * patch)
    return flat.astype(np.float32), (gt, gh, gw)
