"""Generic multimodal chunking: one encoder-runner abstraction for any
VLM/ALM.

Counterpart of the reference's libmtmd (tools/mtmd/mtmd.cpp: mtmd_tokenize /
mtmd_encode / mtmd_get_output_embd, helper eval in mtmd-helper.cpp): a
prompt with media markers is split into TEXT / IMAGE / AUDIO chunks; media
chunks run through registered encoder callables producing LLM-width
embeddings; `eval_chunks` feeds everything into a Context as interleaved
token and embedding batches with correct positions — the generic version of
what the omni pipeline does with its hard-wired markers.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any, Callable

import numpy as np

from .runtime import Batch, Context

DEFAULT_IMAGE_MARKER = "<__image__>"
DEFAULT_AUDIO_MARKER = "<__audio__>"


class ChunkType(enum.Enum):
    TEXT = 0
    IMAGE = 1
    AUDIO = 2


@dataclasses.dataclass
class MtmdChunk:
    type: ChunkType
    tokens: np.ndarray | None = None  # TEXT
    media: Any = None  # IMAGE/AUDIO payload (array, path, ...)
    embeds: np.ndarray | None = None  # filled by encode()

    @property
    def n_positions(self) -> int:
        if self.type == ChunkType.TEXT:
            return len(self.tokens)
        assert self.embeds is not None, "encode() the chunk first"
        return len(self.embeds)


@dataclasses.dataclass
class MtmdContext:
    """Encoder registry (mtmd_context counterpart)."""

    tokenizer: Any
    image_encoder: Callable | None = None  # media -> [n, d_llm]
    audio_encoder: Callable | None = None
    image_marker: str = DEFAULT_IMAGE_MARKER
    audio_marker: str = DEFAULT_AUDIO_MARKER

    # ---- mtmd_tokenize ---------------------------------------------------
    def tokenize(self, text: str, images: list | None = None,
                 audios: list | None = None) -> list[MtmdChunk]:
        images = list(images or [])
        audios = list(audios or [])
        chunks: list[MtmdChunk] = []

        def add_text(s: str):
            if s:
                chunks.append(MtmdChunk(
                    ChunkType.TEXT,
                    tokens=np.asarray(self.tokenizer.encode(s), np.int32)))

        rest = text
        while rest:
            i_img = rest.find(self.image_marker)
            i_aud = rest.find(self.audio_marker)
            candidates = [(i, t) for i, t in
                          ((i_img, ChunkType.IMAGE), (i_aud, ChunkType.AUDIO))
                          if i >= 0]
            if not candidates:
                add_text(rest)
                break
            i, t = min(candidates)
            add_text(rest[:i])
            if t == ChunkType.IMAGE:
                if not images:
                    raise ValueError("more image markers than images")
                chunks.append(MtmdChunk(t, media=images.pop(0)))
                rest = rest[i + len(self.image_marker):]
            else:
                if not audios:
                    raise ValueError("more audio markers than audios")
                chunks.append(MtmdChunk(t, media=audios.pop(0)))
                rest = rest[i + len(self.audio_marker):]
        if images or audios:
            raise ValueError("unused media inputs")
        return chunks

    # ---- mtmd_encode -----------------------------------------------------
    def encode(self, chunk: MtmdChunk) -> MtmdChunk:
        if chunk.type == ChunkType.TEXT:
            return chunk
        enc = (self.image_encoder if chunk.type == ChunkType.IMAGE
               else self.audio_encoder)
        if enc is None:
            raise ValueError(f"no encoder registered for {chunk.type.name}")
        chunk.embeds = np.asarray(enc(chunk.media), np.float32)
        return chunk


def eval_chunks(ctx: Context, mctx: MtmdContext, chunks: list[MtmdChunk],
                seq_id: int = 0, n_past: int | None = None) -> int:
    """Feed chunks into the LLM with correct interleaved positions
    (mtmd_helper_eval_chunks). Returns the new n_past; the last chunk's
    logits are left on `ctx.last_logits` for the caller's first sample."""
    pos = ctx.n_past.get(seq_id, 0) if n_past is None else n_past
    logits = None
    for chunk in chunks:
        mctx.encode(chunk)
        n = chunk.n_positions
        if n == 0:
            continue
        positions = np.arange(pos, pos + n, dtype=np.int32)
        seqs = np.full(n, seq_id, np.int32)
        if chunk.type == ChunkType.TEXT:
            logits, _ = ctx.decode(Batch(tokens=chunk.tokens, pos=positions,
                                         seq_id=seqs))
        else:
            logits, _ = ctx.decode(Batch(embeds=chunk.embeds, pos=positions,
                                         seq_id=seqs))
        pos += n
    ctx.last_logits = logits
    return pos


@dataclasses.dataclass
class ClipImageEncoder:
    """Generic single-resolution image encoder: any clip_vit projector
    family (mlp/gemma3/idefics3/internvl — the reference's clip.cpp
    PROJECTOR_TYPE registry). media payload: pixels [C, H, W], already
    normalized (use .preprocess)."""

    params: dict
    cfg: Any  # models.clip_vit.ClipVitConfig
    image_mean: tuple = (0.5, 0.5, 0.5)
    image_std: tuple = (0.5, 0.5, 0.5)
    uses_mrope = False

    def __call__(self, media):
        from .models import clip_vit

        return np.asarray(clip_vit.forward(self.params, self.cfg,
                                           np.asarray(media)), np.float32)

    def preprocess(self, img: np.ndarray):
        """[H, W, 3] uint8 -> normalized [3, S, S] at the model's square
        input size (bilinear; reference clip.cpp image_manipulation)."""
        s = self.cfg.image_size
        img = np.asarray(img, np.float32) / 255.0
        h, w = img.shape[:2]
        if (h, w) != (s, s):
            ys = np.clip((np.arange(s) + 0.5) * h / s - 0.5, 0, h - 1)
            xs = np.clip((np.arange(s) + 0.5) * w / s - 0.5, 0, w - 1)
            y0 = np.floor(ys).astype(int)
            x0 = np.floor(xs).astype(int)
            y1 = np.minimum(y0 + 1, h - 1)
            x1 = np.minimum(x0 + 1, w - 1)
            fy = (ys - y0)[:, None, None]
            fx = (xs - x0)[None, :, None]
            img = ((img[y0][:, x0] * (1 - fy) * (1 - fx))
                   + (img[y1][:, x0] * fy * (1 - fx))
                   + (img[y0][:, x1] * (1 - fy) * fx)
                   + (img[y1][:, x1] * fy * fx))
        mean = np.asarray(self.image_mean, np.float32)
        std = np.asarray(self.image_std, np.float32)
        return ((img - mean) / std).transpose(2, 0, 1)


def select_best_resolution(orig_hw, pinpoints) -> tuple[int, int]:
    """HF select_best_resolution: maximize effective (non-wasted)
    resolution, tie-break by minimal wasted area. pinpoints =
    [(h, w), ...]."""
    oh, ow = orig_hw
    best, best_fit, min_waste = None, 0, float("inf")
    for h, w in pinpoints:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        fit = min(dw * dh, ow * oh)
        waste = h * w - fit
        if fit > best_fit or (fit == best_fit and waste < min_waste):
            best, best_fit, min_waste = (h, w), fit, waste
    return best


@dataclasses.dataclass
class LlavaNextImageEncoder:
    """LLaVA-NeXT anyres encoder (the reference's
    mm_patch_merge_type == "spatial_unpad", clip.cpp PATCH_MERGE_
    SPATIAL_UNPAD + llava-1.6 tiling): base view + best-resolution tile
    grid through the CLIP "mlp" projector, grid features re-assembled
    spatially, UNPADDED to the original aspect ratio, one image_newline
    embedding appended per row, base features prepended.

    media payload: (tiles [n, C, S, S], orig (h, w))."""

    params: dict
    cfg: Any  # models.clip_vit.ClipVitConfig ("mlp" + pinpoints)
    image_mean: tuple = (0.48145466, 0.4578275, 0.40821073)
    image_std: tuple = (0.26862954, 0.26130258, 0.27577711)
    uses_mrope = False

    def _pins(self):
        p = self.cfg.pinpoints
        return [(p[i], p[i + 1]) for i in range(0, len(p), 2)]

    def __call__(self, media):
        from .models import clip_vit

        tiles, orig_hw = media
        feats = [np.asarray(clip_vit.forward(self.params, self.cfg,
                                             np.asarray(t)), np.float32)
                 for t in tiles]  # each [g*g, d_llm]
        base = feats[0]
        nl = self.params.get("image_newline")
        nl = None if nl is None else np.asarray(nl, np.float32)
        if len(feats) == 1:
            out = base
            return np.concatenate([out, nl[None]]) if nl is not None \
                else out
        g = self.cfg.image_size // self.cfg.patch_size
        bh, bw = select_best_resolution(orig_hw, self._pins())
        nph, npw = bh // self.cfg.image_size, bw // self.cfg.image_size
        d = base.shape[-1]
        grid = np.stack(feats[1:]).reshape(nph, npw, g, g, d)
        # [d, nph*g, npw*g] spatial re-assembly (HF pack_image_features)
        sp = grid.transpose(4, 0, 2, 1, 3).reshape(d, nph * g, npw * g)
        ch, cw = sp.shape[1:]
        oh, ow = orig_hw
        if ow / oh > cw / ch:  # unpad_image
            nh = int(round(oh * (cw / ow), 7))
            pad = (ch - nh) // 2
            sp = sp[:, pad: ch - pad, :]
        else:
            nw = int(round(ow * (ch / oh), 7))
            pad = (cw - nw) // 2
            sp = sp[:, :, pad: cw - pad]
        if nl is not None:
            col = np.broadcast_to(nl[:, None, None],
                                  (d, sp.shape[1], 1))
            sp = np.concatenate([sp, col], axis=2)
        flat = sp.reshape(d, -1).T  # row-major (h, w) token order
        return np.concatenate([base, flat], axis=0)

    def preprocess(self, img: np.ndarray):
        """[H, W, 3] uint8 -> (tiles, orig (h, w)): base view at the
        square input size + the best-resolution canvas (aspect-preserving
        resize, center pad) split into input-size tiles row-major (HF
        LlavaNextImageProcessor.get_image_patches)."""
        a = np.asarray(img, np.float32)
        if a.max() > 1.5:
            a = a / 255.0
        oh, ow = a.shape[:2]
        mean = np.asarray(self.image_mean, np.float32)
        std = np.asarray(self.image_std, np.float32)

        def resize(x, h, w):
            yi = np.clip((np.arange(h) + 0.5) * x.shape[0] / h - 0.5,
                         0, x.shape[0] - 1).round().astype(int)
            xi = np.clip((np.arange(w) + 0.5) * x.shape[1] / w - 0.5,
                         0, x.shape[1] - 1).round().astype(int)
            return x[yi][:, xi]

        def norm_chw(x):
            return ((x - mean) / std).transpose(2, 0, 1)

        s = self.cfg.image_size
        tiles = [norm_chw(resize(a, s, s))]  # base view
        bh, bw = select_best_resolution((oh, ow), self._pins())
        scale = min(bw / ow, bh / oh)
        rh, rw = int(oh * scale), int(ow * scale)
        canvas = np.zeros((bh, bw, 3), np.float32)
        py, px = (bh - rh) // 2, (bw - rw) // 2
        canvas[py: py + rh, px: px + rw] = resize(a, rh, rw)
        for r in range(bh // s):
            for c in range(bw // s):
                tiles.append(norm_chw(
                    canvas[r * s:(r + 1) * s, c * s:(c + 1) * s]))
        return np.stack(tiles), (oh, ow)


@dataclasses.dataclass
class PixtralImageEncoder:
    """Pixtral / Mistral-Small rope-2d encoder (PROJECTOR_TYPE_PIXTRAL).
    media payload: pixels [C, H, W], H/W multiples of patch*merge."""

    params: dict
    cfg: Any  # models.pixtral.PixtralVisionConfig
    uses_mrope = False

    def __call__(self, media):
        from .models import pixtral

        return np.asarray(pixtral.forward(
            self.params, self.cfg, np.asarray(media),
            with_img_break=self.params.get("img_break") is not None),
            np.float32)

    def preprocess(self, img: np.ndarray):
        from .models.qwen2vl_vision import (OPENAI_CLIP_MEAN,
                                            OPENAI_CLIP_STD)

        a = np.asarray(img, np.float32)
        if a.max() > 1.5:
            a = a / 255.0
        f = self.cfg.patch_size * max(1, self.cfg.spatial_merge)
        h = min(self.cfg.image_size, max(f, round(a.shape[0] / f) * f))
        w = min(self.cfg.image_size, max(f, round(a.shape[1] / f) * f))
        if (h, w) != a.shape[:2]:
            yi = np.clip((np.arange(h) + 0.5) * a.shape[0] / h - 0.5,
                         0, a.shape[0] - 1).round().astype(int)
            xi = np.clip((np.arange(w) + 0.5) * a.shape[1] / w - 0.5,
                         0, a.shape[1] - 1).round().astype(int)
            a = a[yi][:, xi]
        a = (a - OPENAI_CLIP_MEAN) / OPENAI_CLIP_STD
        return a.transpose(2, 0, 1)


@dataclasses.dataclass
class AudioLMEncoder:
    """Generic audio-LM encoder (Whisper tower + qwen2a/ultravox/voxtral
    projector — clip.cpp build_whisper_enc + mtmd-audio.cpp). media
    payload: normalized log-mel frames [T, n_mel] (use .preprocess on raw
    16 kHz samples)."""

    params: dict
    cfg: Any  # models.audio_lm.AudioLMConfig
    uses_mrope = False

    def __call__(self, media):
        from .models import audio_lm

        return np.asarray(audio_lm.forward(self.params, self.cfg,
                                           np.asarray(media)), np.float32)

    def preprocess(self, samples: np.ndarray):
        """16 kHz mono f32 samples -> log-mel frames via the filterbank
        embedded in the mmproj (mtmd-audio.cpp contract)."""
        from .omni.audio import log_mel_spectrogram

        filters = np.asarray(self.params["mel_filters"], np.float32)
        return log_mel_spectrogram(np.asarray(samples, np.float32), filters)


def load_audio_encoder(reader):
    """Audio mmproj GGUF -> AudioLMEncoder (clip.has_audio_encoder)."""
    from .models import audio_lm

    return AudioLMEncoder(audio_lm.load_params(reader),
                          audio_lm.AudioLMConfig.from_gguf(reader.kv))


def load_image_encoder(reader):
    """mmproj GGUF -> encoder, dispatched on clip.projector_type
    (the reference's clip_init projector registry)."""
    pt = reader.kv.get("clip.projector_type", "mlp")
    if pt in ("qwen2vl_merger", "qwen2.5vl_merger"):
        from .models import qwen2vl_vision as vis

        return Qwen2VLImageEncoder(vis.load_params(reader),
                                   vis.Qwen2VLVisionConfig.from_gguf(reader.kv))
    if pt == "pixtral":
        from .models import pixtral

        return PixtralImageEncoder(
            pixtral.load_params(reader),
            pixtral.PixtralVisionConfig.from_gguf(reader.kv))
    if (pt == "mlp" and reader.kv.get("clip.vision.mm_patch_merge_type")
            == "spatial_unpad"):
        from .models import clip_vit as _cv

        return LlavaNextImageEncoder(
            _cv.load_params(reader), _cv.ClipVitConfig.from_gguf(reader.kv))
    from .models import clip_vit

    mean = tuple(reader.kv.get("clip.vision.image_mean", (0.5, 0.5, 0.5)))
    std = tuple(reader.kv.get("clip.vision.image_std", (0.5, 0.5, 0.5)))
    return ClipImageEncoder(clip_vit.load_params(reader),
                            clip_vit.ClipVitConfig.from_gguf(reader.kv),
                            image_mean=mean, image_std=std)


@dataclasses.dataclass
class Qwen2VLImageEncoder:
    """Image encoder + M-RoPE position provider for qwen2vl-family LLMs
    (the reference's PROJECTOR_TYPE_QWEN2VL path in clip.cpp +
    mtmd_helper position handling).

    media payload: (pixels [N, C*T*P*P], grid_thw (t, h, w))."""

    params: dict
    cfg: Any  # models.qwen2vl_vision.Qwen2VLVisionConfig
    uses_mrope = True

    def __call__(self, media):
        from .models import qwen2vl_vision as vis

        pixels, grid_thw = media
        return np.asarray(
            vis.forward(self.params, self.cfg, np.asarray(pixels),
                        [tuple(grid_thw)]), np.float32)

    def preprocess(self, img: np.ndarray):
        from .models import qwen2vl_vision as vis

        return vis.preprocess(img, patch=self.cfg.patch_size,
                              merge=self.cfg.spatial_merge,
                              temporal=self.cfg.temporal_patch)

    def positions(self, media, start: int):
        from .models import qwen2vl_vision as vis

        _, grid_thw = media
        return vis.mrope_positions(0, grid_thw, start,
                                   merge=self.cfg.spatial_merge)


def eval_chunks_mrope(ctx: Context, mctx: MtmdContext,
                      chunks: list[MtmdChunk], seq_id: int = 0
                      ) -> tuple[int, int]:
    """eval_chunks for M-RoPE (qwen2vl) models: the scalar cache
    position is the SEQUENCE INDEX (HF masks causally by index) while
    pos3 carries the (t, h, w) streams — text advances the stream
    counter by 1/token, an image occupies t=const with h/w varying and
    the next text position jumps to max(stream)+1
    (HF get_rope_index; reference llama_batch 4-stream mrope pos).

    Returns (n_past_index, next_mrope_pos, last chunk's logits)."""
    idx = ctx.n_past.get(seq_id, 0)
    mpos = getattr(ctx, "mrope_next", {}).get(seq_id, idx)
    if not hasattr(ctx, "mrope_next"):
        ctx.mrope_next = {}
    logits = None
    for chunk in chunks:
        mctx.encode(chunk)
        n = chunk.n_positions
        if n == 0:
            continue
        positions = np.arange(idx, idx + n, dtype=np.int32)
        seqs = np.full(n, seq_id, np.int32)
        if chunk.type == ChunkType.TEXT:
            pos3 = np.repeat(
                np.arange(mpos, mpos + n, dtype=np.int32)[:, None], 3, 1)
            logits, _ = ctx.decode(Batch(tokens=chunk.tokens,
                                         pos=positions, seq_id=seqs,
                                         pos3=pos3))
            mpos += n
        else:
            enc = mctx.image_encoder
            pos3, mpos = enc.positions(chunk.media, mpos)
            logits, _ = ctx.decode(Batch(embeds=chunk.embeds,
                                         pos=positions, seq_id=seqs,
                                         pos3=pos3))
        idx += n
    ctx.mrope_next[seq_id] = mpos
    return idx, mpos, logits
