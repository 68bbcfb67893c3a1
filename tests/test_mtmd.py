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


def test_llava_projector_e2e_vs_hf(tmp_path):
    """CLIP ViT + llava MLP projector + LLM vs the full HF
    LlavaForConditionalGeneration on a tiny config (reference clip.cpp
    PROJECTOR_TYPE_MLP): prefill logits on (text, image, text) match."""
    import pytest
    torch = pytest.importorskip("torch")
    import numpy as np
    from transformers import (CLIPVisionConfig, LlamaConfig, LlavaConfig,
                              LlavaForConditionalGeneration)

    from omni_tpu.convert.hf_to_gguf import convert_llava_vision, convert_llm
    from omni_tpu.core import GGUFReader
    from omni_tpu.models import clip_vit, qwen3
    from omni_tpu.runtime import Batch, Context

    torch.manual_seed(0)
    V = 64
    vcfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                            num_hidden_layers=3, num_attention_heads=4,
                            image_size=16, patch_size=4)
    tcfg = LlamaConfig(vocab_size=V, hidden_size=48, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2, head_dim=12,
                       max_position_embeddings=64,
                       attn_implementation="eager",
                       tie_word_embeddings=True)
    lcfg = LlavaConfig(vision_config=vcfg, text_config=tcfg,
                       image_token_index=V - 1,
                       vision_feature_layer=-2,
                       vision_feature_select_strategy="default")
    model = LlavaForConditionalGeneration(lcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    llm_sd = {k.removeprefix("model.language_model.").removeprefix(
        "language_model."): v for k, v in sd.items()
        if "language_model" in k}
    llm_sd = {("model." + k if not k.startswith("lm_head") else k): v
              for k, v in llm_sd.items()}
    llm_path = tmp_path / "llava_llm.gguf"
    convert_llm(llm_sd, tcfg.to_dict(), llm_path, arch="llama")
    mm_path = tmp_path / "llava_mmproj.gguf"
    convert_llava_vision(sd, {**vcfg.to_dict(), "out_hidden": 48,
                              "feature_layer": -2}, mm_path)

    rng = np.random.default_rng(0)
    pix = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    # 16x16 / patch 4 -> 16 image tokens
    pre = np.array([3, 11], np.int32)
    post = np.array([7, 29], np.int32)
    input_ids = np.concatenate([pre, np.full(16, V - 1, np.int32), post])
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(input_ids[None].astype(np.int64)),
            pixel_values=torch.tensor(pix),
        ).logits[0].numpy()

    reader = GGUFReader(llm_path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader)
    vreader = GGUFReader(mm_path)
    ccfg = clip_vit.ClipVitConfig.from_gguf(vreader.kv)
    vparams = clip_vit.load_params(vreader)
    img_emb = np.asarray(clip_vit.forward(vparams, ccfg, pix[0]))
    assert img_emb.shape == (16, 48)

    embeds = np.asarray(qwen3.embed(params, input_ids), np.float32)
    embeds[2:18] = img_emb
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(embeds=embeds))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.03)
