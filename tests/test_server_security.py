"""--api-key bearer auth + context-shift-under-load server tests
(reference tools/server/tests/unit/test_security.py and
test_ctx_shift.py contracts)."""

import json
import threading
import urllib.error
import urllib.request

import pytest

from omni_tpu.core import GGMLType, GGUFReader
from omni_tpu.models import qwen3
from omni_tpu.runtime import Context
from omni_tpu.server.main import ServerState, serve
from omni_tpu.testing import write_tiny_qwen3
from omni_tpu.tokenizer import build_tokenizer

KEY = "sk-this-is-the-secret-key"


@pytest.fixture(scope="module")
def secured(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "llm.gguf"
    write_tiny_qwen3(path, n_layers=2, d_model=64, n_heads=4, n_kv_heads=2,
                     head_dim=16, d_ff=64, n_vocab=300, qtype=GGMLType.F32,
                     byte_tokenizer=True)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    # tiny context so ctx-shift triggers under load
    ctx = Context(cfg, qwen3.load_params(reader), qwen3.forward, qwen3.embed,
                  n_ctx=128)
    tok = build_tokenizer(reader.kv)
    state = ServerState(ctx, tok, n_slots=2, api_key=KEY)
    httpd = serve(state, "127.0.0.1", 0)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def _req(url, obj=None, key=None):
    headers = {"Content-Type": "application/json"}
    if key:
        headers["Authorization"] = f"Bearer {key}"
    req = urllib.request.Request(
        url, json.dumps(obj).encode() if obj is not None else None, headers)
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_public_endpoints_need_no_key(secured):
    for ep in ("/health", "/v1/models"):
        code, body = _req(secured + ep)
        assert code == 200 and "error" not in body


@pytest.mark.parametrize("key", [None, "invalid-key"])
def test_incorrect_api_key_401(secured, key):
    code, body = _req(secured + "/completion",
                      {"prompt": "ab", "n_predict": 2}, key=key)
    assert code == 401
    assert body["error"]["type"] == "authentication_error"
    code, _ = _req(secured + "/props")
    assert code == 401


def test_correct_api_key(secured):
    code, body = _req(secured + "/completion",
                      {"prompt": "ab", "n_predict": 2,
                       "temperature": 0.0}, key=KEY)
    assert code == 200 and body["tokens_predicted"] == 2


def test_ctx_shift_under_load(secured):
    """Two parallel slots on a 128-cell cache, each generating past its
    per-slot budget: the context shift (n_discard eviction) must keep
    both streams alive to their full n_predict (reference
    test_ctx_shift.py: generation continues past n_ctx_per_slot)."""
    results = {}

    def worker(i):
        code, body = _req(secured + "/completion", {
            "prompt": "abcdefgh" * 4,  # 32 byte tokens
            "n_predict": 80,           # 32 + 80 > 64 cells/slot -> shift
            "temperature": 0.0}, key=KEY)
        results[i] = (code, body)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert len(results) == 2
    for code, body in results.values():
        assert code == 200
        assert body["tokens_predicted"] == 80
