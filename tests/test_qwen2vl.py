"""Qwen2-VL: M-RoPE (multimodal rotary with t/h/w position streams)
parity vs the HF oracle — both the degenerate text case (all streams
equal = plain NeoX rope) and genuinely divergent 3-D positions.

Reference: llm_build_qwen2vl + ggml_rope_multi sections
(/root/reference/src/llama-model.cpp), Qwen2VLModel converter
(add_rope_dimension_sections)."""

import numpy as np
import pytest

from omni_tpu.core import GGUFReader
from omni_tpu.models import qwen3
from omni_tpu.runtime import Batch, Context

torch = pytest.importorskip("torch")

V, D, NH, NKV, HD, FF, L, T = 64, 32, 4, 2, 8, 64, 2, 8


@pytest.fixture(scope="module")
def qwen2vl(tmp_path_factory):
    from transformers import Qwen2VLConfig
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        Qwen2VLTextModel)

    from omni_tpu.convert.hf_to_gguf import convert_llm

    torch.manual_seed(0)
    # head_dim 8 -> 4 freq pairs; mrope sections (1, 1, 2) in pair units
    hcfg = Qwen2VLConfig(
        vocab_size=V, hidden_size=D, intermediate_size=FF,
        num_hidden_layers=L, num_attention_heads=NH,
        num_key_value_heads=NKV, max_position_embeddings=128,
        rope_theta=10000.0, attn_implementation="eager",
        tie_word_embeddings=True,
        rope_scaling={"type": "mrope", "mrope_section": [1, 1, 2]})
    model = Qwen2VLTextModel._from_config(hcfg.get_text_config()).eval()
    # sharpen attention so positions actually move the logits (random
    # tiny models are near position-blind otherwise)
    sdt = model.state_dict()
    for k in list(sdt):
        if "q_proj.weight" in k or "k_proj.weight" in k:
            sdt[k] = sdt[k] * 6.0
    model.load_state_dict(sdt)
    # text model has no LM head: logits = hidden @ wte.T (tied)
    sd = {f"model.{k}": v.detach().numpy()
          for k, v in model.state_dict().items()}
    path = tmp_path_factory.mktemp("q2vl") / "q2vl.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="qwen2vl")
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    return model, reader, cfg


def _hf_hidden(model, toks, pos3):
    """pos3 [T, 3] -> HF position_ids [3, 1, T]."""
    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(toks[None].astype(np.int64)),
            position_ids=torch.tensor(
                pos3.T[:, None, :].astype(np.int64)))
    return out.last_hidden_state[0].numpy()


def test_qwen2vl_config(qwen2vl):
    _, _, cfg = qwen2vl
    assert cfg.mrope_sections == (1, 1, 2)
    assert cfg.rope_neox


def test_qwen2vl_text_parity(qwen2vl):
    """All position streams equal -> must match plain qwen2 rope."""
    model, reader, cfg = qwen2vl
    params = qwen3.load_params(reader)
    toks = np.random.default_rng(1).integers(2, V, T).astype(np.int32)
    pos = np.arange(T, dtype=np.int32)
    pos3 = np.repeat(pos[:, None], 3, 1)
    hf_h = _hf_hidden(model, toks, pos3)
    ref = hf_h @ np.asarray(params["token_embd"], np.float32).T

    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))  # no pos3 -> equal streams
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.02)


def test_qwen2vl_mrope_parity(qwen2vl):
    """Divergent t/h/w streams (the real multimodal case): positions as
    qwen2vl assigns them over an image grid."""
    model, reader, cfg = qwen2vl
    params = qwen3.load_params(reader)
    rng = np.random.default_rng(2)
    # 2 text tokens, a 4x4 "image" grid (t fixed at 2, h/w in 2..5),
    # then 2 text tokens at max(stream)+1
    grid = [[2, 2 + r, 2 + c] for r in range(4) for c in range(4)]
    pos3 = np.array([[0, 0, 0], [1, 1, 1]] + grid
                    + [[6, 6, 6], [7, 7, 7]], np.int32)
    toks = rng.integers(2, V, len(pos3)).astype(np.int32)
    hf_h = _hf_hidden(model, toks, pos3)
    ref = hf_h @ np.asarray(params["token_embd"], np.float32).T

    # scalar pos = SEQUENCE INDEX (HF masks causally by index; image
    # patches of one grid share mrope t but stay index-causal), the
    # mrope streams ride pos3
    idx = np.arange(len(toks), dtype=np.int32)
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks, pos=idx, pos3=pos3))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.02)

    # and the equal-stream result must DIFFER (mrope is really applied)
    ctx2 = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    flat, _ = ctx2.decode(Batch(tokens=toks, pos=idx))
    assert np.abs(np.asarray(flat) - ref).max() > 0.02


def test_qwen2vl_vision_tower_parity(tmp_path):
    """Vision tower + 2x2 merger vs the HF oracle through a real mmproj
    GGUF (reference clip.cpp build_qwen2vl / Qwen2VLVisionModel)."""
    from transformers import Qwen2VLConfig
    from transformers.models.qwen2_vl.modeling_qwen2_vl import (
        Qwen2VisionTransformerPretrainedModel)

    from omni_tpu.convert.hf_to_gguf import convert_qwen2vl_vision
    from omni_tpu.models import qwen2vl_vision as vis

    torch.manual_seed(0)
    vc = Qwen2VLConfig(vision_config=dict(
        depth=2, embed_dim=32, hidden_size=48, num_heads=4,
        in_channels=3, patch_size=4, spatial_merge_size=2,
        temporal_patch_size=2, mlp_ratio=2)).vision_config
    model = Qwen2VisionTransformerPretrainedModel._from_config(vc).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg_d = dict(depth=2, embed_dim=32, out_hidden=48, num_heads=4,
                 patch_size=4, spatial_merge_size=2,
                 temporal_patch_size=2, mlp_ratio=2)
    path = tmp_path / "mmproj.gguf"
    convert_qwen2vl_vision(sd, cfg_d, path)

    reader = GGUFReader(path)
    vcfg = vis.Qwen2VLVisionConfig.from_gguf(reader.kv)
    assert vcfg.depth == 2 and vcfg.out_hidden == 48
    params = vis.load_params(reader)

    rng = np.random.default_rng(0)
    # one 4x4 image + one 2x6 image (two cu_seqlens blocks)
    grids = [(1, 4, 4), (1, 2, 6)]
    n = sum(t * h * w for t, h, w in grids)
    pix = rng.standard_normal((n, 3 * 2 * 4 * 4)).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(pix),
                    grid_thw=torch.tensor(grids)).numpy()
    ours = np.asarray(vis.forward(params, vcfg, pix, grids))
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_qwen25vl_vision_tower_parity(tmp_path):
    """Qwen2.5-VL vision variant (clip.cpp PROJECTOR_TYPE_QWEN25VL):
    RMSNorm, gated-SiLU MLP, WINDOW attention with periodic full-attn
    layers and the window-order permutation — vs the HF oracle through
    a real mmproj GGUF."""
    from transformers import Qwen2_5_VLConfig
    from transformers.models.qwen2_5_vl.modeling_qwen2_5_vl import (
        Qwen2_5_VisionTransformerPretrainedModel)

    from omni_tpu.convert.hf_to_gguf import convert_qwen2vl_vision
    from omni_tpu.models import qwen2vl_vision as vis

    torch.manual_seed(0)
    vc = Qwen2_5_VLConfig(vision_config=dict(
        depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
        in_channels=3, patch_size=4, spatial_merge_size=2,
        temporal_patch_size=2, window_size=16, out_hidden_size=48,
        fullatt_block_indexes=[1])).vision_config
    model = Qwen2_5_VisionTransformerPretrainedModel._from_config(vc).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    cfg_d = dict(depth=2, hidden_size=32, intermediate_size=64,
                 out_hidden=48, num_heads=4, patch_size=4,
                 spatial_merge_size=2, temporal_patch_size=2,
                 window_size=16, fullatt_block_indexes=[1])
    path = tmp_path / "mmproj.gguf"
    convert_qwen2vl_vision(sd, cfg_d, path)

    reader = GGUFReader(path)
    assert reader.kv["clip.projector_type"] == "qwen2.5vl_merger"
    vcfg = vis.Qwen2VLVisionConfig.from_gguf(reader.kv)
    assert vcfg.rms and vcfg.gated and vcfg.window_size == 16
    assert vcfg.fullatt_blocks == (1,)
    params = vis.load_params(reader)

    rng = np.random.default_rng(0)
    # 8x8 patch grid: llm grid 4x4 -> 2x2 windows of 2x2 merge units,
    # plus a 2x6 image that needs window padding
    for grids in ([(1, 8, 8)], [(1, 8, 8), (1, 2, 6)]):
        n = sum(t * h * w for t, h, w in grids)
        pix = rng.standard_normal((n, 3 * 2 * 4 * 4)).astype(np.float32)
        with torch.no_grad():
            ref = model(torch.tensor(pix),
                        grid_thw=torch.tensor(grids)).numpy()
        ours = np.asarray(vis.forward(params, vcfg, pix, grids))
        np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_qwen2vl_full_vlm_e2e(tmp_path):
    """Image -> vision tower -> merger -> LLM with M-RoPE positions,
    end-to-end vs the full HF Qwen2VLForConditionalGeneration on a tiny
    config: prefill logits on (text, image, text) must match."""
    from transformers import Qwen2VLConfig, Qwen2VLForConditionalGeneration

    from omni_tpu.convert.hf_to_gguf import (convert_llm,
                                             convert_qwen2vl_vision)
    from omni_tpu.models import qwen2vl_vision as vis
    from omni_tpu.mtmd import (ChunkType, MtmdChunk, MtmdContext,
                               Qwen2VLImageEncoder, eval_chunks_mrope)

    torch.manual_seed(1)
    hcfg = Qwen2VLConfig(
        vocab_size=V, hidden_size=48, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=128,
        rope_theta=10000.0, attn_implementation="eager",
        tie_word_embeddings=True,
        image_token_id=V - 1, vision_start_token_id=V - 2,
        vision_end_token_id=V - 3,
        rope_scaling={"type": "mrope", "mrope_section": [1, 2, 3]},
        vision_config=dict(
            depth=2, embed_dim=32, hidden_size=48, num_heads=4,
            in_channels=3, patch_size=4, spatial_merge_size=2,
            temporal_patch_size=2, mlp_ratio=2))
    model = Qwen2VLForConditionalGeneration(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    llm_path = tmp_path / "q2vl_llm.gguf"
    convert_llm(sd, hcfg.to_dict(), llm_path, arch="qwen2vl")
    mm_path = tmp_path / "q2vl_mmproj.gguf"
    vsd = {k: v for k, v in sd.items() if "visual" in k}
    convert_qwen2vl_vision(vsd, dict(
        depth=2, embed_dim=32, out_hidden=48, num_heads=4, patch_size=4,
        spatial_merge_size=2, temporal_patch_size=2, mlp_ratio=2), mm_path)

    rng = np.random.default_rng(3)
    grid = (1, 4, 4)  # 16 patches -> 4 merged image tokens
    pix = rng.standard_normal((16, 3 * 2 * 4 * 4)).astype(np.float32)
    pre = np.array([3, 11, V - 2], np.int32)   # text + vision_start
    post = np.array([V - 3, 7, 29], np.int32)  # vision_end + text
    input_ids = np.concatenate([pre, np.full(4, V - 1, np.int32), post])

    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(input_ids[None].astype(np.int64)),
            pixel_values=torch.tensor(pix),
            image_grid_thw=torch.tensor([list(grid)]),
        ).logits[0].numpy()

    reader = GGUFReader(llm_path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader)
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)

    vreader = GGUFReader(mm_path)
    vcfg = vis.Qwen2VLVisionConfig.from_gguf(vreader.kv)
    enc = Qwen2VLImageEncoder(vis.load_params(vreader), vcfg)

    class _Tok:  # chunk-level tokens are provided directly
        def encode(self, s, **kw):
            raise NotImplementedError

    mctx = MtmdContext(tokenizer=_Tok(), image_encoder=enc)
    chunks = [MtmdChunk(ChunkType.TEXT, tokens=pre),
              MtmdChunk(ChunkType.IMAGE, media=(pix, grid)),
              MtmdChunk(ChunkType.TEXT, tokens=post)]
    eval_chunks_mrope(ctx, mctx, chunks)

    # compare logits of the final text span (re-decode piecewise gives
    # per-chunk logits; simplest: one fresh decode of everything)
    ctx2 = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    embeds = np.asarray(qwen3.embed(params, input_ids), np.float32)
    img_embeds = enc((pix, grid))
    embeds[3:7] = img_embeds
    pos3 = np.zeros((len(input_ids), 3), np.int32)
    pos3[:3] = np.repeat(np.arange(3)[:, None], 3, 1)
    img_pos3, nxt = enc.positions((pix, grid), 3)
    pos3[3:7] = img_pos3
    pos3[7:] = np.repeat(np.arange(nxt, nxt + 3)[:, None], 3, 1)
    logits, _ = ctx2.decode(Batch(
        embeds=embeds, pos=np.arange(len(input_ids), dtype=np.int32),
        pos3=pos3))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=0.02)
