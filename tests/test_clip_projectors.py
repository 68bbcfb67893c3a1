"""Generic multimodal projector families vs the HF oracle.

Reference: /root/reference/tools/mtmd/clip.cpp PROJECTOR_TYPE_{GEMMA3,
IDEFICS3, INTERNVL} graphs; each family converts a tiny random HF model
through the real converter and must match
<Family>ForConditionalGeneration.get_image_features numerically."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from omni_tpu.core import GGUFReader
from omni_tpu.models import clip_vit

E, FF, L, NH, IMG, P = 32, 64, 2, 2, 56, 14  # grid 4x4 patches


def _pixels(rng):
    return rng.standard_normal((3, IMG, IMG)).astype(np.float32)


def _run_ours(path, pixels):
    reader = GGUFReader(str(path))
    cfg = clip_vit.ClipVitConfig.from_gguf(reader.kv)
    params = clip_vit.load_params(reader)
    return np.asarray(clip_vit.forward(params, cfg, pixels)), cfg


def test_gemma3_projector_parity(tmp_path):
    from transformers import Gemma3Config, Gemma3ForConditionalGeneration

    from omni_tpu.convert.hf_to_gguf import convert_gemma3_vision

    torch.manual_seed(0)
    hcfg = Gemma3Config(
        text_config=dict(vocab_size=64, hidden_size=48, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=2,
                         num_key_value_heads=1, head_dim=16),
        vision_config=dict(hidden_size=E, intermediate_size=FF,
                           num_hidden_layers=L, num_attention_heads=NH,
                           image_size=IMG, patch_size=P),
        mm_tokens_per_image=4)
    model = Gemma3ForConditionalGeneration(hcfg).eval()
    sd = {k: v for k, v in model.state_dict().items()}
    cfg_d = dict(hcfg.vision_config.to_dict(), out_hidden=48,
                 mm_tokens_per_image=4)
    path = tmp_path / "mm.gguf"
    convert_gemma3_vision(sd, cfg_d, str(path))

    rng = np.random.default_rng(0)
    pix = _pixels(rng)
    got, cfg = _run_ours(path, pix)
    assert cfg.proj_type == "gemma3" and cfg.scale_factor == 2
    with torch.no_grad():
        want = model.get_image_features(
            torch.tensor(pix[None]))[0].numpy()
    assert got.shape == want.shape == (4, 48)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_idefics3_projector_parity(tmp_path):
    from transformers import (Idefics3Config,
                              Idefics3ForConditionalGeneration)

    from omni_tpu.convert.hf_to_gguf import convert_idefics3_vision

    torch.manual_seed(1)
    hcfg = Idefics3Config(
        text_config=dict(vocab_size=64, hidden_size=48, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=2,
                         num_key_value_heads=1),
        vision_config=dict(hidden_size=E, intermediate_size=FF,
                           num_hidden_layers=L, num_attention_heads=NH,
                           image_size=IMG, patch_size=P),
        scale_factor=2)
    model = Idefics3ForConditionalGeneration(hcfg).eval()
    cfg_d = dict(hcfg.vision_config.to_dict(), out_hidden=48, scale_factor=2)
    path = tmp_path / "mm.gguf"
    convert_idefics3_vision(dict(model.state_dict()), cfg_d, str(path))

    rng = np.random.default_rng(1)
    pix = _pixels(rng)
    got, cfg = _run_ours(path, pix)
    assert cfg.proj_type == "idefics3" and cfg.scale_factor == 2
    with torch.no_grad():
        want = model.model.get_image_features(
            torch.tensor(pix[None, None]),
            pixel_attention_mask=torch.ones(1, 1, IMG, IMG,
                                            dtype=torch.bool)).numpy()
    want = want.reshape(-1, 48)
    assert got.shape == want.shape == (4, 48)
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_lfm2_projector_parity(tmp_path):
    """LFM2-VL (clip.cpp PROJECTOR_TYPE_LFM2): SigLip2-NaFlex trunk
    (linear patch embed over pre-patchified rows, bilinearly resized
    position grid) + pixel unshuffle + LN + 2-layer GELU MLP — vs
    Lfm2VlForConditionalGeneration.get_image_features, at the native
    grid and at a resized (non-native) grid."""
    from transformers import Lfm2VlConfig, Lfm2VlForConditionalGeneration

    from omni_tpu.convert.hf_to_gguf import convert_lfm2_vision
    from omni_tpu.models import clip_vit

    torch.manual_seed(8)
    hcfg = Lfm2VlConfig(
        text_config=dict(vocab_size=64, hidden_size=48, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=2,
                         num_key_value_heads=1, block_dim=48,
                         block_ff_dim=64, block_multiple_of=16,
                         conv_dim=48),
        vision_config=dict(hidden_size=E, intermediate_size=FF,
                           num_hidden_layers=L, num_attention_heads=NH,
                           num_patches=16, patch_size=P),  # native grid 4x4
        downsample_factor=2)
    model = Lfm2VlForConditionalGeneration(hcfg).eval()
    cfg_d = dict(hcfg.vision_config.to_dict(), out_hidden=48,
                 downsample_factor=2)
    path = tmp_path / "mm.gguf"
    convert_lfm2_vision(dict(model.state_dict()), cfg_d, str(path))

    reader = GGUFReader(str(path))
    cfg = clip_vit.ClipVitConfig.from_gguf(reader.kv)
    assert cfg.proj_type == "lfm2" and cfg.scale_factor == 2
    params = clip_vit.load_params(reader)

    rng = np.random.default_rng(8)
    for g in (4, 6):  # native grid, then a resized-pos-embedding grid
        pix = rng.standard_normal((3, g * P, g * P)).astype(np.float32)
        got = np.asarray(clip_vit.forward(params, cfg, pix))
        # feed HF the SAME patch rows our patchify produces (the
        # processor's layout choice cancels out of the parity check)
        rows = np.asarray(clip_vit.patchify(cfg, pix))
        with torch.no_grad():
            want = model.get_image_features(
                torch.tensor(rows[None]),
                spatial_shapes=torch.tensor([[g, g]]),
                pixel_attention_mask=torch.ones(1, rows.shape[0],
                                                dtype=torch.bool))
            if isinstance(want, (tuple, list)):
                want = torch.cat(list(want), dim=0)
        want = want.reshape(-1, 48).numpy()
        assert got.shape == want.shape == ((g // 2) ** 2, 48)
        np.testing.assert_allclose(got, want, atol=3e-4,
                                   err_msg=f"grid {g}")


def test_llava_next_spatial_unpad_parity(tmp_path):
    """LLaVA-NeXT anyres (the reference's mm_patch_merge_type
    "spatial_unpad" + llava-1.6 tiling): base view + tile grid through
    the mlp projector, spatial re-assembly, unpad to the original aspect,
    image_newline per row — vs LlavaNextForConditionalGeneration
    get_image_features + pack_image_features on identical tiles."""
    from transformers import (LlavaNextConfig,
                              LlavaNextForConditionalGeneration)

    from omni_tpu.convert.hf_to_gguf import convert_llava_vision
    from omni_tpu.mtmd import LlavaNextImageEncoder, load_image_encoder

    torch.manual_seed(11)
    pins = [[28, 56], [56, 28], [56, 56]]
    hcfg = LlavaNextConfig(
        text_config=dict(vocab_size=64, hidden_size=48, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=2,
                         num_key_value_heads=1),
        vision_config=dict(hidden_size=E, intermediate_size=FF,
                           num_hidden_layers=L, num_attention_heads=NH,
                           image_size=28, patch_size=14),
        image_grid_pinpoints=pins, vision_feature_layer=-2,
        vision_feature_select_strategy="default")
    model = LlavaNextForConditionalGeneration(hcfg).eval()
    cfg_d = dict(hcfg.vision_config.to_dict(), out_hidden=48,
                 feature_layer=-2, image_grid_pinpoints=pins)
    path = tmp_path / "mm.gguf"
    convert_llava_vision(dict(model.state_dict()), cfg_d, str(path))

    enc = load_image_encoder(GGUFReader(str(path)))
    assert isinstance(enc, LlavaNextImageEncoder)
    assert enc.cfg.pinpoints == (28, 56, 56, 28, 56, 56)

    rng = np.random.default_rng(11)
    img = (rng.random((40, 50, 3)) * 255).astype(np.uint8)
    media = enc.preprocess(img)
    tiles, orig = media
    assert orig == (40, 50) and tiles.shape[1:] == (3, 28, 28)
    got = enc(media)

    with torch.no_grad():
        # this transformers version's get_image_features already packs
        # (spatial re-assembly + unpad + newline)
        feats = model.model.get_image_features(
            torch.tensor(tiles[None]), torch.tensor([[40, 50]]),
            vision_feature_layer=-2,
            vision_feature_select_strategy="default")
    want = feats[0].numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_generic_vlm_served_e2e(tmp_path):
    """A non-M-RoPE projector family (gemma3) served end-to-end: image_url
    -> ClipImageEncoder.preprocess -> projector -> embedding injection ->
    /v1/chat/completions (reference tools/server + libmtmd path)."""
    import base64
    import io
    import json
    import threading
    import urllib.request

    import jax

    jax.config.update("jax_platforms", "cpu")
    pytest.importorskip("PIL")
    from PIL import Image
    from transformers import Gemma3Config, Gemma3ForConditionalGeneration

    from omni_tpu.convert.hf_to_gguf import convert_gemma3_vision
    from omni_tpu.core import GGMLType
    from omni_tpu.models import qwen3
    from omni_tpu.mtmd import load_image_encoder
    from omni_tpu.runtime import Context
    from omni_tpu.server.main import ServerState, serve
    from omni_tpu.testing import write_tiny_qwen3
    from omni_tpu.tokenizer import build_tokenizer

    torch.manual_seed(3)
    hcfg = Gemma3Config(
        text_config=dict(vocab_size=64, hidden_size=48, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=2,
                         num_key_value_heads=1, head_dim=16),
        vision_config=dict(hidden_size=E, intermediate_size=FF,
                           num_hidden_layers=L, num_attention_heads=NH,
                           image_size=IMG, patch_size=P),
        mm_tokens_per_image=4)
    model = Gemma3ForConditionalGeneration(hcfg).eval()
    mm_path = tmp_path / "mmproj.gguf"
    convert_gemma3_vision(dict(model.state_dict()),
                          dict(hcfg.vision_config.to_dict(), out_hidden=48,
                               mm_tokens_per_image=4), str(mm_path))
    enc = load_image_encoder(GGUFReader(str(mm_path)))
    assert not getattr(enc, "uses_mrope", False)

    llm_path = tmp_path / "llm.gguf"
    write_tiny_qwen3(llm_path, n_layers=1, d_model=48, n_heads=4,
                     n_kv_heads=2, head_dim=12, d_ff=64, n_vocab=300,
                     qtype=GGMLType.F32, byte_tokenizer=True)
    reader = GGUFReader(str(llm_path))
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    ctx = Context(cfg, qwen3.load_params(reader), qwen3.forward,
                  qwen3.embed, n_ctx=128)
    state = ServerState(ctx, build_tokenizer(reader.kv), n_slots=1,
                        mtmd_enc=enc)
    httpd = serve(state, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        rng = np.random.default_rng(3)
        img = Image.fromarray((rng.random((IMG, IMG, 3)) * 255)
                              .astype(np.uint8))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        b64 = base64.b64encode(buf.getvalue()).decode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{httpd.server_address[1]}"
            "/v1/chat/completions",
            json.dumps({"messages": [{"role": "user", "content": [
                {"type": "text", "text": "what is "},
                {"type": "image_url",
                 "image_url": {"url": f"data:image/png;base64,{b64}"}},
            ]}], "max_tokens": 6}).encode(),
            {"Content-Type": "application/json"})
        out = json.load(urllib.request.urlopen(req, timeout=300))
        assert out["choices"][0]["message"]["role"] == "assistant"
        # 4 image tokens (mm_tokens_per_image) entered the prompt
        assert out["usage"]["prompt_tokens"] > 4
    finally:
        httpd.shutdown()


def test_pixtral_mistral3_projector_parity(tmp_path):
    """Pixtral rope-2d trunk + Mistral-Small 3.1 patch merger + projector
    (clip.cpp build_pixtral) vs Mistral3ForConditionalGeneration
    .get_image_features, plus the [IMG_BREAK] row-separator arrangement."""
    from transformers import (Mistral3Config,
                              Mistral3ForConditionalGeneration)

    from omni_tpu.convert.hf_to_gguf import convert_pixtral_vision
    from omni_tpu.models import pixtral

    torch.manual_seed(4)
    hcfg = Mistral3Config(
        text_config=dict(vocab_size=64, hidden_size=48, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=2,
                         num_key_value_heads=1),
        vision_config=dict(hidden_size=E, intermediate_size=FF,
                           num_hidden_layers=L, num_attention_heads=NH,
                           image_size=64, patch_size=8, head_dim=16),
        spatial_merge_size=2, multimodal_projector_bias=False,
        vision_feature_layer=-1)
    model = Mistral3ForConditionalGeneration(hcfg).eval()
    brk = np.zeros(48, np.float32) + 0.25
    cfg_d = dict(hcfg.vision_config.to_dict(), out_hidden=48,
                 spatial_merge_size=2)
    path = tmp_path / "mm.gguf"
    convert_pixtral_vision(dict(model.state_dict()), cfg_d, str(path),
                           img_break_embed=brk)

    reader = GGUFReader(str(path))
    cfg = pixtral.PixtralVisionConfig.from_gguf(reader.kv)
    assert cfg.spatial_merge == 2 and cfg.head_dim == 16
    params = pixtral.load_params(reader)
    rng = np.random.default_rng(4)
    pix = rng.standard_normal((3, 32, 64)).astype(np.float32)  # 4x8 grid
    got = np.asarray(pixtral.forward(params, cfg, pix))
    with torch.no_grad():
        want = model.get_image_features(
            torch.tensor(pix[None]),
            image_sizes=torch.tensor([[32, 64]]))
        if isinstance(want, (tuple, list)):
            want = want[0]
    want = want.numpy().reshape(-1, 48)
    assert got.shape == want.shape == (8, 48)  # 2x4 merged grid
    np.testing.assert_allclose(got, want, atol=3e-4)

    # img_break arrangement: one separator row per merged row except last
    withbrk = np.asarray(pixtral.forward(params, cfg, pix,
                                         with_img_break=True))
    assert withbrk.shape == (9, 48)
    np.testing.assert_allclose(withbrk[4], brk, atol=1e-6)
    np.testing.assert_allclose(withbrk[[0, 1, 2, 3]], want[:4], atol=1e-6)
    np.testing.assert_allclose(withbrk[5:], want[4:], atol=1e-6)


def test_internvl_projector_parity(tmp_path):
    from transformers import (InternVLConfig,
                              InternVLForConditionalGeneration)

    from omni_tpu.convert.hf_to_gguf import convert_internvl_vision

    torch.manual_seed(2)
    hcfg = InternVLConfig(
        text_config=dict(vocab_size=64, hidden_size=48, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=2,
                         num_key_value_heads=1),
        vision_config=dict(hidden_size=E, intermediate_size=FF,
                           num_hidden_layers=L, num_attention_heads=NH,
                           image_size=IMG, patch_size=P),
        downsample_ratio=0.5, vision_feature_layer=-1,
        vision_feature_select_strategy="default")
    model = InternVLForConditionalGeneration(hcfg).eval()
    cfg_d = dict(hcfg.vision_config.to_dict(), out_hidden=48,
                 downsample_ratio=0.5)
    path = tmp_path / "mm.gguf"
    convert_internvl_vision(dict(model.state_dict()), cfg_d, str(path))

    rng = np.random.default_rng(2)
    pix = _pixels(rng)
    got, cfg = _run_ours(path, pix)
    assert cfg.proj_type == "internvl" and cfg.scale_factor == 2
    with torch.no_grad():
        want = model.get_image_features(
            torch.tensor(pix[None]), vision_feature_layer=-1,
            vision_feature_select_strategy="default")[0].numpy()
    assert got.shape == want.shape == (4, 48)
    np.testing.assert_allclose(got, want, atol=2e-4)
