"""Generic audio-LM path (the reference's mtmd ALM half:
clip.cpp build_whisper_enc + mtmd-audio.cpp): Whisper tower + qwen2a /
ultravox projectors, decoupled from the omni pipeline's APM."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from omni_tpu.core import GGUFReader
from omni_tpu.models import audio_lm

D, FF, L, NH, MEL = 32, 64, 2, 2, 16


def _tiny_qwen2audio():
    from transformers import Qwen2AudioConfig, Qwen2AudioForConditionalGeneration

    torch.manual_seed(5)
    hcfg = Qwen2AudioConfig(
        audio_config=dict(d_model=D, encoder_layers=L,
                          encoder_attention_heads=NH, encoder_ffn_dim=FF,
                          num_mel_bins=MEL, max_source_positions=64),
        text_config=dict(vocab_size=64, hidden_size=48, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=2,
                         num_key_value_heads=1))
    return Qwen2AudioForConditionalGeneration(hcfg).eval(), hcfg


def test_qwen2a_parity(tmp_path):
    """Tower + avg-pool + post-LN + linear projector vs the HF oracle
    through a real audio mmproj GGUF."""
    from omni_tpu.convert.hf_to_gguf import convert_qwen2audio_encoder

    model, hcfg = _tiny_qwen2audio()
    cfg_d = dict(hcfg.audio_config.to_dict(), out_hidden=48)
    path = tmp_path / "ammproj.gguf"
    filters = np.random.default_rng(0).random((MEL, 201), np.float32)
    convert_qwen2audio_encoder(dict(model.state_dict()), cfg_d, str(path),
                               mel_filters=filters)

    reader = GGUFReader(str(path))
    cfg = audio_lm.AudioLMConfig.from_gguf(reader.kv)
    assert cfg.proj_type == "qwen2a" and cfg.n_mel == MEL
    params = audio_lm.load_params(reader)
    assert params["mel_filters"].shape == (MEL, 201)

    rng = np.random.default_rng(5)
    # HF requires exactly max_source_positions*2 mel frames (128)
    mel = rng.standard_normal((128, MEL)).astype(np.float32)
    got = np.asarray(audio_lm.forward(params, cfg, mel))
    with torch.no_grad():
        h = model.audio_tower(
            torch.tensor(mel.T[None])).last_hidden_state[0]
        want = model.multi_modal_projector(h).numpy()
    assert got.shape == want.shape == (32, 48)  # conv s2 + pool2: 128->32
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_ultravox_projector_law(tmp_path):
    """Ultravox stack-frames + swapped-SwiGLU projector
    (clip.cpp:1560-1592; fixie-ai ultravox_model.py UltravoxProjector):
    checked against an independent torch reimplementation of the spec."""
    from omni_tpu.core.dtypes import GGMLType
    from omni_tpu.convert.hf_to_gguf import GGUFWriter, _add

    rng = np.random.default_rng(6)
    sf = 2
    w = GGUFWriter(str(tmp_path / "uv.gguf"))
    w.add_kv("general.architecture", "clip")
    w.add_kv("clip.projector_type", "ultravox")
    w.add_kv("clip.has_audio_encoder", True)
    w.add_kv("clip.audio.block_count", L)
    w.add_kv("clip.audio.embedding_length", D)
    w.add_kv("clip.audio.projection_dim", 48)
    w.add_kv("clip.audio.attention.head_count", NH)
    w.add_kv("clip.audio.num_mel_bins", MEL)
    w.add_kv("clip.audio.feed_forward_length", FF)
    w.add_kv("clip.audio.projector.stack_factor", sf)

    def t(name, shape):
        a = rng.standard_normal(shape).astype(np.float32) * 0.1
        _add(w, name, a, None)
        return a

    t("a.conv1d.1.weight", (D, MEL, 3))
    t("a.conv1d.1.bias", (D,))
    t("a.conv1d.2.weight", (D, D, 3))
    t("a.conv1d.2.bias", (D,))
    t("a.position_embd.weight", (64, D))
    t("a.post_ln.weight", (D,))
    t("a.post_ln.bias", (D,))
    mm1 = t("mm.a.mlp.1.weight", (4 * D, sf * D))
    mm2 = t("mm.a.mlp.2.weight", (48, 2 * D))
    npre = t("mm.a.norm_pre.weight", (sf * D,))
    nmid = t("mm.a.norm_mid.weight", (2 * D,))
    for i in range(L):
        p = f"a.blk.{i}."
        t(p + "attn_q.weight", (D, D)); t(p + "attn_q.bias", (D,))
        t(p + "attn_k.weight", (D, D))
        t(p + "attn_v.weight", (D, D)); t(p + "attn_v.bias", (D,))
        t(p + "attn_out.weight", (D, D)); t(p + "attn_out.bias", (D,))
        t(p + "ln1.weight", (D,)); t(p + "ln1.bias", (D,))
        t(p + "ln2.weight", (D,)); t(p + "ln2.bias", (D,))
        t(p + "ffn_up.weight", (FF, D)); t(p + "ffn_up.bias", (FF,))
        t(p + "ffn_down.weight", (D, FF)); t(p + "ffn_down.bias", (D,))
    w.write()

    reader = GGUFReader(str(tmp_path / "uv.gguf"))
    cfg = audio_lm.AudioLMConfig.from_gguf(reader.kv)
    assert cfg.proj_type == "ultravox" and cfg.stack_factor == sf
    params = audio_lm.load_params(reader)
    mel = rng.standard_normal((24, MEL)).astype(np.float32)
    got = np.asarray(audio_lm.forward(params, cfg, mel))
    # 24 frames -> conv s2 -> 12 -> stacked by 2 -> 6 tokens
    assert got.shape == (6, 48)

    # independent torch reimplementation of the projector law on the same
    # post-LN tower output (spec: ultravox_model.py)
    import jax.numpy as jnp
    from omni_tpu.kernels.norms import layer_norm

    qcfg = audio_lm.AudioLMConfig(depth=L, embed_dim=D, out_hidden=48,
                                  n_heads=NH, n_mel=MEL,
                                  proj_type="qwen2a", mlp_dim=FF)
    # reuse the tower via the qwen2a config minus its pool/proj: rerun
    # manually up to post-LN
    h = audio_lm._gelu(audio_lm._conv1d(jnp.asarray(mel), params["conv1_w"],
                                        params["conv1_b"], 1))
    h = audio_lm._gelu(audio_lm._conv1d(h, params["conv2_w"],
                                        params["conv2_b"], 2))
    h = h + params["pos"][: h.shape[0]]
    import jax

    n, hd = h.shape[0], D // NH
    for lp in params["layers"]:
        hn = layer_norm(h, lp["ln1"], lp["ln1_b"], cfg.eps)
        q = (hn @ lp["wq"].T + lp["bq"]).reshape(n, NH, hd)
        k = (hn @ lp["wk"].T).reshape(n, NH, hd)
        v = (hn @ lp["wv"].T + lp["bv"]).reshape(n, NH, hd)
        s = jnp.einsum("thd,shd->hts", q, k) / np.sqrt(hd)
        a = jnp.einsum("hts,shd->thd", jax.nn.softmax(s, -1), v)
        h = h + (a.reshape(n, -1) @ lp["wo"].T + lp["bo"])
        hn2 = layer_norm(h, lp["ln2"], lp["ln2_b"], cfg.eps)
        h = h + (audio_lm._gelu(hn2 @ lp["fc1"].T + lp["fc1_b"])
                 @ lp["fc2"].T + lp["fc2_b"])
    tower = np.asarray(layer_norm(h, params["post_ln"],
                                  params["post_ln_b"], cfg.eps))

    x = torch.tensor(tower.reshape(-1, sf * D))
    x = x * torch.rsqrt((x.float() ** 2).mean(-1, keepdim=True) + 1e-6) \
        * torch.tensor(npre)
    x = x @ torch.tensor(mm1).T
    half = x.shape[-1] // 2
    x = x[:, :half] * torch.nn.functional.silu(x[:, half:])
    x = x * torch.rsqrt((x.float() ** 2).mean(-1, keepdim=True) + 1e-6) \
        * torch.tensor(nmid)
    want = (x @ torch.tensor(mm2).T).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_voxtral_projector_law(tmp_path):
    """Voxtral head (clip.cpp:1600-1605): avg-pool(2) like qwen2a, THEN
    stack-frames like ultravox, then a 2-layer erf-GELU MLP."""
    from omni_tpu.convert.hf_to_gguf import GGUFWriter, _add

    rng = np.random.default_rng(7)
    sf = 2
    w = GGUFWriter(str(tmp_path / "vx.gguf"))
    w.add_kv("general.architecture", "clip")
    w.add_kv("clip.projector_type", "voxtral")
    w.add_kv("clip.has_audio_encoder", True)
    w.add_kv("clip.audio.block_count", 0)
    w.add_kv("clip.audio.embedding_length", D)
    w.add_kv("clip.audio.projection_dim", 48)
    w.add_kv("clip.audio.attention.head_count", NH)
    w.add_kv("clip.audio.num_mel_bins", MEL)
    w.add_kv("clip.audio.feed_forward_length", FF)
    w.add_kv("clip.audio.projector.stack_factor", sf)

    def t(name, shape):
        a = rng.standard_normal(shape).astype(np.float32) * 0.1
        _add(w, name, a, None)
        return a

    c1 = t("a.conv1d.1.weight", (D, MEL, 3))
    c1b = t("a.conv1d.1.bias", (D,))
    c2 = t("a.conv1d.2.weight", (D, D, 3))
    c2b = t("a.conv1d.2.bias", (D,))
    t("a.position_embd.weight", (64, D))
    pw = t("a.post_ln.weight", (D,))
    pb = t("a.post_ln.bias", (D,))
    mm1 = t("mm.a.mlp.1.weight", (4 * D, sf * D))
    mm2 = t("mm.a.mlp.2.weight", (48, 4 * D))
    w.write()

    reader = GGUFReader(str(tmp_path / "vx.gguf"))
    cfg = audio_lm.AudioLMConfig.from_gguf(reader.kv)
    assert cfg.proj_type == "voxtral" and cfg.depth == 0
    params = audio_lm.load_params(reader)
    mel = rng.standard_normal((32, MEL)).astype(np.float32)
    got = np.asarray(audio_lm.forward(params, cfg, mel))
    # 32 mel -> conv s2 -> 16 -> pool2 -> 8 -> stack2 -> 4 tokens
    assert got.shape == (4, 48)

    # independent reimplementation (no tower layers; depth 0)
    import scipy.signal  # noqa: F401  (not used; numpy conv below)

    def conv1d(x, wgt, b, stride):
        T, Cin = x.shape
        xp = np.pad(x, ((1, 1), (0, 0)))
        out_t = (T + 2 - 3) // stride + 1
        y = np.zeros((out_t, wgt.shape[0]), np.float32)
        for o in range(out_t):
            seg = xp[o * stride: o * stride + 3]  # [3, Cin]
            y[o] = np.einsum("kc,ock->o", seg, wgt) + b
        return y

    def gelu(x):
        from scipy.special import erf

        return 0.5 * x * (1 + erf(x / np.sqrt(2)))

    h = gelu(conv1d(mel, c1, c1b, 1))
    h = gelu(conv1d(h, c2, c2b, 2))
    h = h + 0  # pos table rows are added in forward; depth-0 tower
    # match forward: pos embed applies before layers
    pos = np.asarray(params["pos"])[: h.shape[0]]
    h = h + pos
    h = h[: (h.shape[0] // 2) * 2].reshape(-1, 2, D).mean(1)
    mu, var = h.mean(-1, keepdims=True), h.var(-1, keepdims=True)
    h = (h - mu) / np.sqrt(var + 1e-5) * pw + pb
    h = h.reshape(-1, sf * D)
    want = gelu(h @ mm1.T) @ mm2.T
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_image_plus_audio_one_request(tmp_path):
    """One chat request carrying BOTH an image_url and an input_audio part
    (the reference's mtmd serves mixed-media prompts through one chunk
    stream): both encoders inject embeddings into the same sequence."""
    import base64
    import io
    import json
    import threading
    import urllib.request
    import wave

    import jax

    jax.config.update("jax_platforms", "cpu")
    pytest.importorskip("PIL")
    from PIL import Image
    from transformers import Gemma3Config, Gemma3ForConditionalGeneration

    from omni_tpu.convert.hf_to_gguf import (convert_gemma3_vision,
                                             convert_qwen2audio_encoder)
    from omni_tpu.core import GGMLType
    from omni_tpu.models import qwen3
    from omni_tpu.mtmd import load_audio_encoder, load_image_encoder
    from omni_tpu.runtime import Context
    from omni_tpu.server.main import ServerState, serve
    from omni_tpu.testing import write_tiny_qwen3
    from omni_tpu.tokenizer import build_tokenizer

    amodel, ahcfg = _tiny_qwen2audio()
    a_path = tmp_path / "a.gguf"
    convert_qwen2audio_encoder(
        dict(amodel.state_dict()),
        dict(ahcfg.audio_config.to_dict(), out_hidden=48), str(a_path),
        mel_filters=np.random.default_rng(0).random((MEL, 201), np.float32)
        * 1e-3)
    aenc = load_audio_encoder(GGUFReader(str(a_path)))

    torch.manual_seed(9)
    vcfg = Gemma3Config(
        text_config=dict(vocab_size=64, hidden_size=48, intermediate_size=64,
                         num_hidden_layers=1, num_attention_heads=2,
                         num_key_value_heads=1, head_dim=16),
        vision_config=dict(hidden_size=D, intermediate_size=FF,
                           num_hidden_layers=1, num_attention_heads=NH,
                           image_size=28, patch_size=14),
        mm_tokens_per_image=1)
    vmodel = Gemma3ForConditionalGeneration(vcfg).eval()
    v_path = tmp_path / "v.gguf"
    convert_gemma3_vision(dict(vmodel.state_dict()),
                          dict(vcfg.vision_config.to_dict(), out_hidden=48,
                               mm_tokens_per_image=1), str(v_path))
    venc = load_image_encoder(GGUFReader(str(v_path)))

    llm_path = tmp_path / "llm.gguf"
    write_tiny_qwen3(llm_path, n_layers=1, d_model=48, n_heads=4,
                     n_kv_heads=2, head_dim=12, d_ff=64, n_vocab=300,
                     qtype=GGMLType.F32, byte_tokenizer=True)
    reader = GGUFReader(str(llm_path))
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    ctx = Context(cfg, qwen3.load_params(reader), qwen3.forward,
                  qwen3.embed, n_ctx=128)
    state = ServerState(ctx, build_tokenizer(reader.kv), n_slots=1,
                        mtmd_enc=venc, mtmd_audio=aenc)
    httpd = serve(state, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        rng = np.random.default_rng(9)
        img = Image.fromarray((rng.random((28, 28, 3)) * 255)
                              .astype(np.uint8))
        ibuf = io.BytesIO()
        img.save(ibuf, format="PNG")
        pcm = (np.sin(np.arange(3200) / 8.0) * 16000).astype(np.int16)
        abuf = io.BytesIO()
        with wave.open(abuf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes(pcm.tobytes())
        req = urllib.request.Request(
            f"http://127.0.0.1:{httpd.server_address[1]}"
            "/v1/chat/completions",
            json.dumps({"messages": [{"role": "user", "content": [
                {"type": "text", "text": "look "},
                {"type": "image_url", "image_url": {"url":
                 "data:image/png;base64,"
                 + base64.b64encode(ibuf.getvalue()).decode()}},
                {"type": "text", "text": " and listen "},
                {"type": "input_audio", "input_audio": {
                    "data": base64.b64encode(abuf.getvalue()).decode(),
                    "format": "wav"}},
            ]}], "max_tokens": 4}).encode(),
            {"Content-Type": "application/json"})
        out = json.load(urllib.request.urlopen(req, timeout=300))
        assert out["choices"][0]["message"]["role"] == "assistant"
        # 1 image token + 5 audio tokens + text all in one prompt
        assert out["usage"]["prompt_tokens"] > 6
    finally:
        httpd.shutdown()


def test_audio_chat_served_e2e(tmp_path):
    """One audio-LM chat request green: input_audio WAV part ->
    AudioLMEncoder.preprocess (embedded mel filterbank) -> tower ->
    projector -> embedding injection -> /v1/chat/completions."""
    import base64
    import io
    import json
    import struct
    import threading
    import urllib.request
    import wave

    import jax

    jax.config.update("jax_platforms", "cpu")
    from omni_tpu.convert.hf_to_gguf import convert_qwen2audio_encoder
    from omni_tpu.core import GGMLType
    from omni_tpu.models import qwen3
    from omni_tpu.mtmd import load_audio_encoder
    from omni_tpu.runtime import Context
    from omni_tpu.server.main import ServerState, serve
    from omni_tpu.testing import write_tiny_qwen3
    from omni_tpu.tokenizer import build_tokenizer

    model, hcfg = _tiny_qwen2audio()
    filters = (np.random.default_rng(0).random((MEL, 201), np.float32)
               * 1e-3)
    path = tmp_path / "ammproj.gguf"
    convert_qwen2audio_encoder(dict(model.state_dict()),
                               dict(hcfg.audio_config.to_dict(),
                                    out_hidden=48), str(path),
                               mel_filters=filters)
    enc = load_audio_encoder(GGUFReader(str(path)))

    llm_path = tmp_path / "llm.gguf"
    write_tiny_qwen3(llm_path, n_layers=1, d_model=48, n_heads=4,
                     n_kv_heads=2, head_dim=12, d_ff=64, n_vocab=300,
                     qtype=GGMLType.F32, byte_tokenizer=True)
    reader = GGUFReader(str(llm_path))
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    ctx = Context(cfg, qwen3.load_params(reader), qwen3.forward,
                  qwen3.embed, n_ctx=128)
    state = ServerState(ctx, build_tokenizer(reader.kv), n_slots=1,
                        mtmd_audio=enc)
    httpd = serve(state, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        # 0.2 s of 16 kHz sine as a WAV blob
        ts = np.arange(3200) / 16000.0
        pcm = (np.sin(2 * np.pi * 440 * ts) * 16000).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(2)
            f.setframerate(16000)
            f.writeframes(pcm.tobytes())
        b64 = base64.b64encode(buf.getvalue()).decode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{httpd.server_address[1]}"
            "/v1/chat/completions",
            json.dumps({"messages": [{"role": "user", "content": [
                {"type": "text", "text": "transcribe "},
                {"type": "input_audio",
                 "input_audio": {"data": b64, "format": "wav"}},
            ]}], "max_tokens": 5}).encode(),
            {"Content-Type": "application/json"})
        out = json.load(urllib.request.urlopen(req, timeout=300))
        assert out["choices"][0]["message"]["role"] == "assistant"
        # 0.2 s -> 20 mel frames -> 10 conv frames -> 5 audio tokens
        assert out["usage"]["prompt_tokens"] > 5
    finally:
        httpd.shutdown()
