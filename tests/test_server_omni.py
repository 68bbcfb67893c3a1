"""Full omni session over HTTP: /v1/stream/* driven end-to-end against a
real server with a complete tiny 5-module model directory (the capability
of reference server.cpp:5548-6080 — omni_init loads APM/VPM/TTS/T2W from
model_dir, prefill takes file paths, decode streams SSE text while audio
lands out-of-band as wav files + generation_done.flag)."""

import json
import os
import threading
import time
import urllib.request

import numpy as np
import pytest

from omni_tpu.core import GGUFReader
from omni_tpu.models import qwen3
from omni_tpu.runtime import Context
from omni_tpu.server.main import ServerState, serve
from omni_tpu.testing_gguf import write_tiny_model_dir
from omni_tpu.tokenizer import build_tokenizer


@pytest.fixture(scope="module")
def omni_server(tmp_path_factory):
    import omni_tpu.models.tts as tts_mod
    import omni_tpu.omni.pipeline as pl

    # tiny tables: keep the protocol ids/caps inside them
    saved = (tts_mod.TEXT_EOS_ID, tts_mod.AUDIO_EOS_REL, pl.SIMPLEX_AUDIO_CAP)
    tts_mod.TEXT_EOS_ID = 5
    tts_mod.AUDIO_EOS_REL = 49
    pl.SIMPLEX_AUDIO_CAP = 30

    base = tmp_path_factory.mktemp("omni")
    model_dir = base / "model"
    llm_path = write_tiny_model_dir(model_dir)

    # AV fixtures on the server host (the API passes file paths)
    from omni_tpu.omni.audio import write_wav

    wav0 = str(base / "voice.wav")  # reference voice
    wav1 = str(base / "chunk1.wav")
    rng = np.random.default_rng(0)
    write_wav(wav0, rng.standard_normal(16000).astype(np.float32) * 0.1,
              rate=16000)
    write_wav(wav1, rng.standard_normal(16000).astype(np.float32) * 0.1,
              rate=16000)
    jpg1 = str(base / "frame1.jpg")
    from PIL import Image

    Image.fromarray((rng.random((240, 320, 3)) * 255).astype(np.uint8)).save(jpg1)

    reader = GGUFReader(llm_path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    ctx = Context(cfg, qwen3.load_params(reader), qwen3.forward, qwen3.embed,
                  n_ctx=512)
    state = ServerState(ctx, build_tokenizer(reader.kv), n_slots=2)
    httpd = serve(state, "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    out_dir = str(base / "out")
    yield {
        "url": f"http://127.0.0.1:{port}",
        "model_dir": str(model_dir),
        "out_dir": out_dir,
        "wav0": wav0, "wav1": wav1, "jpg1": jpg1,
        "state": state,
    }
    if state.omni is not None:
        state.omni.shutdown()
    httpd.shutdown()
    tts_mod.TEXT_EOS_ID, tts_mod.AUDIO_EOS_REL, pl.SIMPLEX_AUDIO_CAP = saved


def _post(url, obj, raw=False, timeout=600):
    req = urllib.request.Request(url, json.dumps(obj).encode(),
                                 {"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        data = r.read()
    return data if raw else json.loads(data)


def test_omni_session_end_to_end(omni_server):
    s = omni_server
    url = s["url"]

    # 1. omni_init: full model-dir load + voice-clone reference audio
    out = _post(url + "/v1/stream/omni_init", {
        "model_dir": s["model_dir"], "use_tts": True, "media_type": 2,
        "output_dir": s["out_dir"], "voice_audio": s["wav0"],
        "ctx_size": 512,
    })
    assert out["success"]
    st = s["state"]
    assert st.omni is not None
    assert st.omni.tts_ctx is not None and st.omni.t2w is not None
    assert st.omni.audio_encoder is not None
    assert st.omni.vision_encoder is not None
    assert st.omni.n_keep > 0  # voice_audio prefilled the system prompt
    assert st.omni.spk_embed is not None

    # 2. session config: cap generation, check high_image plumbing
    out = _post(url + "/v1/stream/update_session_config",
                {"max_new_tokens": 25, "highImage": True})
    assert out["highImage"] is True
    assert st.omni.effective_max_slice_nums() == 2
    _post(url + "/v1/stream/update_session_config", {"highImage": False})

    # 3. prefill one AV second (full paths, per-request slice override)
    out = _post(url + "/v1/stream/prefill", {
        "audio_path_prefix": s["wav1"], "img_path_prefix": s["jpg1"],
        "cnt": 1, "max_slice_nums": 2})
    assert out["success"]

    # 4. decode: SSE text events; audio out-of-band
    raw = _post(url + "/v1/stream/decode", {"round_idx": 0}, raw=True)
    events = [json.loads(l[len("data: "):])
              for l in raw.decode(errors="replace").splitlines()
              if l.startswith("data:") and "[DONE]" not in l]
    assert events and events[-1]["stop"]

    # 5. wav files + done flag appear (§A.5 out-of-band contract)
    flag = os.path.join(s["out_dir"], "round_000", "generation_done.flag")
    deadline = time.time() + 300
    while time.time() < deadline and not os.path.exists(flag):
        time.sleep(0.5)
    assert os.path.exists(flag), "generation_done.flag missing"
    import glob

    wavs = glob.glob(os.path.join(s["out_dir"], "round_000", "tts_wav",
                                  "wav_*.wav"))
    assert wavs, "no wav chunks written"

    # 6. break + reset
    assert _post(url + "/v1/stream/break", {})["success"]
    assert _post(url + "/v1/stream/reset", {})["success"]
    assert st.omni.llm.n_past.get(0, 0) == 0


def test_omni_duplex_round(omni_server):
    """Duplex over HTTP: hot-swap duplex via update_session_config, run a
    unit-protocol round (listen/speak semantics, chunk caps)."""
    s = omni_server
    url = s["url"]
    assert _post(url + "/v1/stream/reset", {})["success"]
    out = _post(url + "/v1/stream/update_session_config",
                {"duplex": True, "max_new_tokens": 20})
    assert out["duplex"] is True
    st = s["state"]
    _post(url + "/v1/stream/prefill", {
        "audio_path_prefix": s["wav0"], "cnt": 0})
    _post(url + "/v1/stream/prefill", {
        "audio_path_prefix": s["wav1"], "cnt": 1})
    raw = _post(url + "/v1/stream/decode", {"round_idx": 1}, raw=True)
    events = [json.loads(l[len("data: "):])
              for l in raw.decode(errors="replace").splitlines()
              if l.startswith("data:") and "[DONE]" not in l]
    assert events and events[-1]["stop"]
    assert len(st.omni.units) >= 1  # duplex unit registry in play
    _post(url + "/v1/stream/update_session_config",
          {"duplex": False, "max_new_tokens": 25})
