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
    (mtmd_helper_eval_chunks). Returns the new n_past."""
    pos = ctx.n_past.get(seq_id, 0) if n_past is None else n_past
    for chunk in chunks:
        mctx.encode(chunk)
        n = chunk.n_positions
        if n == 0:
            continue
        positions = np.arange(pos, pos + n, dtype=np.int32)
        seqs = np.full(n, seq_id, np.int32)
        if chunk.type == ChunkType.TEXT:
            ctx.decode(Batch(tokens=chunk.tokens, pos=positions, seq_id=seqs))
        else:
            ctx.decode(Batch(embeds=chunk.embeds, pos=positions, seq_id=seqs))
        pos += n
    return pos


@dataclasses.dataclass
class Qwen2VLImageEncoder:
    """Image encoder + M-RoPE position provider for qwen2vl-family LLMs
    (the reference's PROJECTOR_TYPE_QWEN2VL path in clip.cpp +
    mtmd_helper position handling).

    media payload: (pixels [N, C*T*P*P], grid_thw (t, h, w))."""

    params: dict
    cfg: Any  # models.qwen2vl_vision.Qwen2VLVisionConfig

    def __call__(self, media):
        from .models import qwen2vl_vision as vis

        pixels, grid_thw = media
        return np.asarray(
            vis.forward(self.params, self.cfg, np.asarray(pixels),
                        [tuple(grid_thw)]), np.float32)

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
