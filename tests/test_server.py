"""Server behavioral tests (spirit of the reference's pytest suite under
tools/server/tests/): real HTTP against the real server on a tiny model."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from omni_tpu.core import GGMLType, GGUFReader
from omni_tpu.models import qwen3
from omni_tpu.runtime import Context
from omni_tpu.server.main import ServerState, serve
from omni_tpu.testing import write_tiny_qwen3
from omni_tpu.tokenizer import build_tokenizer


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "llm.gguf"
    write_tiny_qwen3(path, n_layers=2, d_model=64, n_heads=4, n_kv_heads=2,
                     head_dim=16, d_ff=64, n_vocab=300, qtype=GGMLType.F32,
                     byte_tokenizer=True)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    # n_ctx 1024 = 512/slot: byte-tokenized tool/system prompts must fit the
    # per-slot budget now that SlotScheduler enforces it strictly
    ctx = Context(cfg, qwen3.load_params(reader), qwen3.forward, qwen3.embed,
                  n_ctx=1024)
    tok = build_tokenizer(reader.kv)
    state = ServerState(ctx, tok, n_slots=2,
                        slot_save_path=str(tmp_path_factory.mktemp("slots")))
    httpd = serve(state, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _post(url, obj, raw=False):
    req = urllib.request.Request(url, json.dumps(obj).encode(),
                                 {"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        data = r.read()
    return data if raw else json.loads(data)


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.read().decode()


def test_health(server):
    assert json.loads(_get(server + "/health")) == {"status": "ok"}


def test_models_props_slots(server):
    models = json.loads(_get(server + "/v1/models"))
    assert models["data"][0]["id"] == "omni-tpu"
    props = json.loads(_get(server + "/props"))
    assert props["n_ctx"] == 1024 and props["n_slots"] == 2
    slots = json.loads(_get(server + "/slots"))
    assert len(slots) == 2 and slots[0]["state"] == "IDLE"


def test_tokenize_round_trip(server):
    r = _post(server + "/tokenize", {"content": "hello world"})
    assert len(r["tokens"]) > 0
    r2 = _post(server + "/detokenize", {"tokens": r["tokens"]})
    assert r2["content"] == "hello world"


def test_completion(server):
    r = _post(server + "/v1/completions",
              {"prompt": "hi", "n_predict": 6, "temperature": 0.0})
    assert r["tokens_predicted"] <= 6
    assert "content" in r and "timings" in r


def test_completion_stream_sse(server):
    raw = _post(server + "/v1/completions",
                {"prompt": "hi", "n_predict": 4, "stream": True,
                 "temperature": 0.0}, raw=True).decode()
    events = [json.loads(line[6:]) for line in raw.splitlines()
              if line.startswith("data: ") and line != "data: [DONE]"]
    assert len(events) == 4
    assert events[-1]["stop"] is True
    assert "data: [DONE]" in raw


def test_chat_completions(server):
    r = _post(server + "/v1/chat/completions",
              {"messages": [{"role": "user", "content": "hello"}],
               "max_tokens": 5, "temperature": 0.0})
    assert r["object"] == "chat.completion"
    assert r["choices"][0]["message"]["role"] == "assistant"
    assert r["usage"]["completion_tokens"] <= 5


def test_metrics_prometheus(server):
    text = _get(server + "/metrics")
    assert "omni_tpu_requests_total" in text
    assert "omni_tpu_kv_cells_total" in text


def test_parallel_requests(server):
    results = []

    def hit():
        results.append(_post(server + "/v1/completions",
                             {"prompt": "abc", "n_predict": 4,
                              "temperature": 0.0}))

    ts = [threading.Thread(target=hit) for _ in range(2)]
    [t.start() for t in ts]
    [t.join(timeout=300) for t in ts]
    assert len(results) == 2
    assert results[0]["content"] == results[1]["content"]  # same greedy result


def test_omni_init_and_config(server):
    r = _post(server + "/v1/stream/omni_init",
              {"media_type": 1, "duplex": False, "use_tts": False})
    assert r["success"] is True
    r = _post(server + "/v1/stream/update_session_config",
              {"max_preserved_context": 128})
    assert r["success"] is True
    r = _post(server + "/v1/stream/reset", {})
    assert r["success"] is True


def test_embeddings(server):
    out = _post(server + "/v1/embeddings", {"input": ["hello", "world"]})
    assert out["object"] == "list" and len(out["data"]) == 2
    v = np.asarray(out["data"][0]["embedding"])
    assert v.shape == (64,)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4
    # deterministic per input, different across inputs
    out2 = _post(server + "/v1/embeddings", {"input": "hello"})
    np.testing.assert_allclose(out2["data"][0]["embedding"],
                               out["data"][0]["embedding"], atol=1e-5)
    assert not np.allclose(out["data"][0]["embedding"],
                           out["data"][1]["embedding"])


def test_infill(server):
    out = _post(server + "/infill", {"input_prefix": "def add(a, b):",
                                     "input_suffix": "return c",
                                     "n_predict": 4})
    assert "content" in out and out["tokens_predicted"] > 0


def test_apply_template(server):
    out = _post(server + "/apply-template",
                {"messages": [{"role": "user", "content": "hi"}]})
    assert out["prompt"].startswith("<|im_start|>user\nhi<|im_end|>")


def test_slot_save_restore(server, tmp_path):
    fn = "slot0.bin"  # bare name, confined to the server's --slot-save-path
    # generate something into slot 0 (seq 0)
    _post(server + "/completion", {"prompt": "hello", "n_predict": 4})
    out = _post(server + "/slots/0?action=save", {"filename": fn})
    assert out["n_saved"] > 0
    out = _post(server + "/slots/0?action=erase", {})
    assert out["erased"]
    out = _post(server + "/slots/0?action=restore", {"filename": fn})
    assert out["n_restored"] > 0
    import urllib.error
    try:
        _post(server + "/slots/9?action=save", {})
        assert False, "invalid slot must 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # path traversal / absolute paths must be rejected (security contract:
    # the reference confines slot files to --slot-save-path)
    for bad in ("../evil.bin", "/tmp/evil.bin", "a/b.bin", ".hidden"):
        try:
            _post(server + "/slots/0?action=save", {"filename": bad})
            assert False, f"filename {bad!r} must 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400


def test_grammar_constrained_completion(server):
    out = _post(server + "/completion",
                {"prompt": "answer:", "n_predict": 8, "temperature": 1.0,
                 "grammar": 'root ::= "yes" | "no"'})
    assert out["content"] in ("yes", "no")


def test_json_schema_response_format(server):
    out = _post(server + "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "give a bool"}],
        "max_tokens": 16, "temperature": 1.0,
        "response_format": {"type": "json_schema", "json_schema": {
            "schema": {"type": "boolean"}}},
    })
    content = out["choices"][0]["message"]["content"]
    assert content.strip() in ("true", "false")


def test_lora_adapters_empty(server):
    out = json.loads(_get(server + "/lora-adapters"))
    assert out == []


def test_rerank(server):
    out = _post(server + "/v1/rerank", {
        "query": "hello world",
        "documents": ["hello world", "completely different text zzz"],
        "top_n": 2})
    assert len(out["results"]) == 2
    scores = {r["index"]: r["relevance_score"] for r in out["results"]}
    assert scores[0] > scores[1]  # identical text ranks first


def test_streaming_tool_call_delta(server):
    """Tool-enabled streaming: the SSE stream must deliver parsed
    tool_calls deltas (finish_reason=tool_calls), never leak the raw
    call syntax as content chunks."""
    raw = _post(server + "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "weather in Paris?"}],
        "tools": [{"type": "function", "function": {
            "name": "get_weather",
            "parameters": {"type": "object", "properties": {
                "city": {"type": "string", "maxLength": 4}},
                "required": ["city"], "additionalProperties": False}}}],
        "tool_choice": "required", "max_tokens": 48, "temperature": 1.0,
        "stream": True}, raw=True)
    events = [json.loads(l[len("data: "):])
              for l in raw.decode(errors="replace").splitlines()
              if l.startswith("data:") and "[DONE]" not in l]
    final = events[-1]
    choice = final["choices"][0]
    assert choice["finish_reason"] == "tool_calls"
    calls = choice["delta"]["tool_calls"]
    assert calls[0]["function"]["name"] == "get_weather"
    json.loads(calls[0]["function"]["arguments"])  # valid JSON args
    # no raw tool JSON leaked as content chunks
    assert not any("get_weather" in (e["choices"][0]["delta"].get("content")
                                     or "") for e in events[:-1])


def test_rerank_with_rank_head(tmp_path):
    """A model with cls/cls.output tensors reranks through the real RANK
    head ([BOS]q[EOS]doc[EOS] -> last hidden -> tanh-dense -> projection),
    matching a manual computation (reference build_pooling RANK,
    src/llama-graph.cpp:1945-1974)."""
    import threading

    rng = np.random.default_rng(4)
    d = 64
    path = tmp_path / "rank.gguf"
    write_tiny_qwen3(path, n_layers=2, d_model=d, n_heads=4, n_kv_heads=2,
                     head_dim=16, d_ff=64, n_vocab=300, qtype=GGMLType.F32,
                     byte_tokenizer=True, extra_tensors={
                         "cls.weight": rng.standard_normal((d, d)).astype(np.float32) * 0.1,
                         "cls.bias": rng.standard_normal(d).astype(np.float32) * 0.1,
                         "cls.output.weight": rng.standard_normal((1, d)).astype(np.float32) * 0.1,
                         "cls.output.bias": rng.standard_normal(1).astype(np.float32) * 0.1,
                     })
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader)
    assert params["cls"] is not None and params["cls_out"] is not None
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=512)
    tok = build_tokenizer(reader.kv)
    state = ServerState(ctx, tok, n_slots=2)

    s0 = state.rank_score("hello", "doc one")
    s1 = state.rank_score("hello", "a different doc")
    assert np.isfinite(s0) and np.isfinite(s1) and s0 != s1

    # manual oracle for one pair
    from omni_tpu.runtime.context import Batch

    v = tok.vocab
    ids = ([v.bos_id] if v.bos_id is not None else []) \
        + tok.encode("hello", add_special=False) + [v.eos_id] \
        + tok.encode("doc one", add_special=False) + [v.eos_id]
    _, hidden = ctx.decode(Batch(
        tokens=np.asarray(ids, np.int32),
        pos=np.arange(len(ids), dtype=np.int32),
        seq_id=np.full(len(ids), 7, np.int32)), return_hidden=True)
    ctx.seq_rm(7, -1, -1)
    h = np.asarray(hidden[-1], np.float32)
    h = np.tanh(np.asarray(params["cls"]) @ h + np.asarray(params["cls_b"]))
    want = float(np.asarray(params["cls_out"]) @ h
                 + np.asarray(params["cls_out_b"]))
    np.testing.assert_allclose(s0, want, rtol=1e-4, atol=1e-4)

    # endpoint path
    httpd = serve(state, "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    out = _post(f"http://127.0.0.1:{port}/v1/rerank", {
        "query": "hello", "documents": ["doc one", "a different doc"]})
    got = {r["index"]: r["relevance_score"] for r in out["results"]}
    np.testing.assert_allclose(got[0], s0, rtol=1e-4)
    httpd.shutdown()


def test_env_arg_mirrors(monkeypatch):
    from omni_tpu.cli.args import EnvArgumentParser, env_name

    assert env_name("--ctx-size") == "OMNI_ARG_CTX_SIZE"
    monkeypatch.setenv("OMNI_ARG_CTX_SIZE", "1234")
    ap = EnvArgumentParser("t")
    ap.add_argument("-c", "--ctx-size", type=int, default=512)
    assert ap.parse_args([]).ctx_size == 1234
    assert ap.parse_args(["-c", "99"]).ctx_size == 99  # CLI wins


def test_tool_calling(server):
    """OpenAI tool calling: forced tool choice yields a grammar-constrained
    JSON call with valid arguments (common/chat tool-call capability)."""
    out = _post(server + "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "what is the weather"}],
        "max_tokens": 64, "temperature": 1.0,
        "tools": [{"type": "function", "function": {
            "name": "get_weather",
            "description": "Get the weather",
            "parameters": {"type": "object",
                           "properties": {"city": {"type": "string"}},
                           "required": ["city"],
                           "additionalProperties": False}}}],
        "tool_choice": "required",
    })
    choice = out["choices"][0]
    assert choice["finish_reason"] == "tool_calls"
    call = choice["message"]["tool_calls"][0]
    assert call["function"]["name"] == "get_weather"
    args = json.loads(call["function"]["arguments"])
    assert isinstance(args["city"], str)


def test_n_probs_logprobs(server):
    out = _post(server + "/completion",
                {"prompt": "hi", "n_predict": 3, "n_probs": 4})
    probs = out["completion_probabilities"]
    assert len(probs) == len(out["content"]) or len(probs) >= 1
    first = probs[0]
    assert len(first["top_logprobs"]) == 4
    lps = [t["logprob"] for t in first["top_logprobs"]]
    assert all(lps[i] >= lps[i + 1] for i in range(3))  # sorted desc
    assert all(lp <= 0.0 for lp in lps)


def test_alias_routes(server):
    """Reference route aliases (server.cpp:6211-6230): /v1/health,
    ollama /api/tags + /api/chat + /api/show, /chat/completions."""
    assert json.loads(_get(server + "/v1/health"))["status"] == "ok"
    got = json.loads(_get(server + "/api/tags"))
    assert got["data"][0]["id"] and got["models"][0]["name"]
    r = _post(server + "/api/chat", {
        "messages": [{"role": "user", "content": "hi"}], "max_tokens": 4})
    assert r["choices"][0]["message"]["role"] == "assistant"
    r2 = _post(server + "/chat/completions", {
        "messages": [{"role": "user", "content": "hi"}], "max_tokens": 4})
    assert r2["choices"][0]["message"]["role"] == "assistant"
    info = _post(server + "/api/show", {})
    assert "model_info" in info


@pytest.fixture(scope="module")
def vlm_server(tmp_path_factory):
    """Tiny qwen2vl-arch GGUF + mmproj behind the real server (the
    reference's tools/server multimodal path via libmtmd)."""
    from omni_tpu.convert.hf_to_gguf import convert_qwen2vl_vision
    from omni_tpu.models import qwen2vl_vision as vis
    from omni_tpu.mtmd import Qwen2VLImageEncoder

    path = tmp_path_factory.mktemp("vlm") / "llm.gguf"
    write_tiny_qwen3(path, n_layers=2, d_model=64, n_heads=4, n_kv_heads=2,
                     head_dim=16, d_ff=64, n_vocab=300, qtype=GGMLType.F32,
                     byte_tokenizer=True, arch="qwen2vl",
                     extra_kv={"rope.dimension_sections": [2, 3, 3, 0]})
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.mrope_sections == (2, 3, 3)
    ctx = Context(cfg, qwen3.load_params(reader), qwen3.forward,
                  qwen3.embed, n_ctx=512)

    rng = np.random.default_rng(0)
    d = 32  # head_dim 8 (2-D rotary needs head_dim % 4 == 0)

    def w(*shape, s=0.08):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    vsd = {"patch_embed.proj.weight": w(d, 3, 2, 4, 4),
           "merger.ln_q.weight": np.ones(d, np.float32),
           "merger.ln_q.bias": np.zeros(d, np.float32),
           "merger.mlp.0.weight": w(4 * d, 4 * d),
           "merger.mlp.0.bias": w(4 * d, s=0.02),
           "merger.mlp.2.weight": w(64, 4 * d),
           "merger.mlp.2.bias": w(64, s=0.02)}
    for i in range(2):
        p = f"blocks.{i}."
        vsd[p + "norm1.weight"] = np.ones(d, np.float32)
        vsd[p + "norm1.bias"] = np.zeros(d, np.float32)
        vsd[p + "norm2.weight"] = np.ones(d, np.float32)
        vsd[p + "norm2.bias"] = np.zeros(d, np.float32)
        vsd[p + "attn.qkv.weight"] = w(3 * d, d)
        vsd[p + "attn.qkv.bias"] = w(3 * d, s=0.02)
        vsd[p + "attn.proj.weight"] = w(d, d)
        vsd[p + "attn.proj.bias"] = w(d, s=0.02)
        vsd[p + "mlp.fc1.weight"] = w(2 * d, d)
        vsd[p + "mlp.fc1.bias"] = w(2 * d, s=0.02)
        vsd[p + "mlp.fc2.weight"] = w(d, 2 * d)
        vsd[p + "mlp.fc2.bias"] = w(d, s=0.02)
    mm_path = tmp_path_factory.mktemp("vlm") / "mmproj.gguf"
    convert_qwen2vl_vision(vsd, dict(
        depth=2, embed_dim=d, out_hidden=64, num_heads=4, patch_size=4,
        spatial_merge_size=2, temporal_patch_size=2, mlp_ratio=2), mm_path)
    vreader = GGUFReader(mm_path)
    enc = Qwen2VLImageEncoder(vis.load_params(vreader),
                              vis.Qwen2VLVisionConfig.from_gguf(vreader.kv))

    tok = build_tokenizer(reader.kv)
    state = ServerState(ctx, tok, n_slots=1, mtmd_enc=enc)
    httpd = serve(state, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def test_vision_chat_completion(vlm_server):
    """image_url content part -> vision tower -> merger -> M-RoPE LLM
    decode through /v1/chat/completions (reference server+libmtmd)."""
    import base64
    import io

    pytest.importorskip("PIL")
    from PIL import Image

    rng = np.random.default_rng(1)
    img = Image.fromarray(
        (rng.random((16, 16, 3)) * 255).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()

    r = _post(vlm_server + "/v1/chat/completions", {
        "messages": [{"role": "user", "content": [
            {"type": "text", "text": "describe "},
            {"type": "image_url",
             "image_url": {"url": f"data:image/png;base64,{b64}"}},
            {"type": "text", "text": " please"},
        ]}],
        "max_tokens": 8,
    })
    assert r["choices"][0]["message"]["role"] == "assistant"
    assert isinstance(r["choices"][0]["message"]["content"], str)
    # 16x16 image -> 4x4 patch grid -> 4 merged image tokens in the prompt
    assert r["usage"]["prompt_tokens"] > 4
    # a second request reuses the stream cleanly (seq state was reset)
    r2 = _post(vlm_server + "/v1/chat/completions", {
        "messages": [{"role": "user", "content": [
            {"type": "image_url",
             "image_url": {"url": f"data:image/png;base64,{b64}"}},
        ]}],
        "max_tokens": 4,
    })
    assert r2["choices"][0]["finish_reason"] == "stop"
