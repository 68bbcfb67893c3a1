"""Generic multimodal layer tests (tools/mtmd counterpart)."""

import numpy as np
import pytest

from omni_tpu.core import GGMLType, GGUFReader
from omni_tpu.models import qwen3
from omni_tpu.mtmd import ChunkType, MtmdContext, eval_chunks
from omni_tpu.runtime import Batch, Context
from omni_tpu.testing import write_tiny_qwen3
from omni_tpu.tokenizer import build_tokenizer


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    path = tmp_path_factory.mktemp("mt") / "m.gguf"
    write_tiny_qwen3(path, n_layers=2, d_model=64, n_heads=4, n_kv_heads=2,
                     head_dim=16, d_ff=64, n_vocab=300, qtype=GGMLType.F32,
                     byte_tokenizer=True)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    tok = build_tokenizer(reader.kv)

    def make_ctx():
        return Context(cfg, qwen3.load_params(reader), qwen3.forward,
                       qwen3.embed, n_ctx=128)

    rng = np.random.default_rng(0)

    def image_encoder(media):
        # stand-in SigLip: 4 tokens of LLM width, deterministic per media id
        r = np.random.default_rng(int(media))
        return (r.standard_normal((4, cfg.d_model)) * 0.05).astype(np.float32)

    def audio_encoder(media):
        r = np.random.default_rng(1000 + int(media))
        return (r.standard_normal((2, cfg.d_model)) * 0.05).astype(np.float32)

    return make_ctx, tok, image_encoder, audio_encoder, cfg


def test_tokenize_interleaves_chunks(setup):
    _, tok, img_enc, aud_enc, _ = setup
    m = MtmdContext(tok, image_encoder=img_enc, audio_encoder=aud_enc)
    chunks = m.tokenize("look <__image__> hear <__audio__> done",
                        images=[1], audios=[2])
    types = [c.type for c in chunks]
    assert types == [ChunkType.TEXT, ChunkType.IMAGE, ChunkType.TEXT,
                     ChunkType.AUDIO, ChunkType.TEXT]


def test_tokenize_validates_media_counts(setup):
    _, tok, img_enc, _, _ = setup
    m = MtmdContext(tok, image_encoder=img_enc)
    with pytest.raises(ValueError):
        m.tokenize("<__image__><__image__>", images=[1])
    with pytest.raises(ValueError):
        m.tokenize("no markers", images=[1])


def test_eval_chunks_positions_and_equivalence(setup):
    """eval_chunks == manual interleaved token/embed decode, exactly."""
    make_ctx, tok, img_enc, aud_enc, cfg = setup
    m = MtmdContext(tok, image_encoder=img_enc, audio_encoder=aud_enc)
    chunks = m.tokenize("a <__image__> b", images=[7])

    ctx_a = make_ctx()
    n_past = eval_chunks(ctx_a, m, chunks, seq_id=0)
    toks_a = np.asarray(tok.encode("a "), np.int32)
    toks_b = np.asarray(tok.encode(" b"), np.int32)
    assert n_past == len(toks_a) + 4 + len(toks_b)

    # manual path
    ctx_b = make_ctx()
    pos = 0
    ctx_b.decode(Batch(tokens=toks_a, pos=np.arange(len(toks_a), dtype=np.int32),
                       seq_id=np.zeros(len(toks_a), np.int32)))
    pos += len(toks_a)
    emb = img_enc(7)
    ctx_b.decode(Batch(embeds=emb, pos=np.arange(pos, pos + 4, dtype=np.int32),
                       seq_id=np.zeros(4, np.int32)))
    pos += 4
    la, _ = ctx_a.decode(Batch(tokens=np.array([5], np.int32),
                               pos=np.array([n_past], np.int32),
                               seq_id=np.array([0], np.int32)))
    lb_pre, _ = ctx_b.decode(Batch(
        tokens=toks_b, pos=np.arange(pos, pos + len(toks_b), dtype=np.int32),
        seq_id=np.zeros(len(toks_b), np.int32)))
    pos += len(toks_b)
    lb, _ = ctx_b.decode(Batch(tokens=np.array([5], np.int32),
                               pos=np.array([pos], np.int32),
                               seq_id=np.array([0], np.int32)))
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=1e-4, atol=1e-4)
