"""Multi-host runtime helpers + profiling + server speculative tests."""

import json
import threading
import urllib.request

import numpy as np
import pytest

import jax

from omni_tpu.parallel.distributed import make_multihost_mesh, scaling_report


def test_multihost_mesh_single_host():
    mesh = make_multihost_mesh()
    assert mesh.axis_names == ("dp", "tp")
    assert mesh.devices.size == len(jax.devices())

    mesh2 = make_multihost_mesh(n_tp=4)
    assert mesh2.devices.shape == (len(jax.devices()) // 4, 4)

    rep = scaling_report(mesh)
    assert rep["n_devices"] == len(jax.devices())
    assert "mesh_shape" in rep


def test_profiler_trace(tmp_path):
    import jax.numpy as jnp

    from omni_tpu.profiling import StageTimer, trace

    with trace(str(tmp_path / "tr")):
        jnp.ones(16).sum().block_until_ready()

    # jax.profiler writes plugins/profile/<run>/*.xplane.pb under the dir
    trace_files = list((tmp_path / "tr").rglob("*"))
    assert any(f.suffix == ".pb" or "xplane" in f.name for f in trace_files
               if f.is_file()), f"no profiler artifacts in {trace_files}"

    st = StageTimer()
    with st.stage("decode"):
        pass
    with st.stage("decode"):
        pass
    s = st.summary()
    assert s["decode"]["count"] == 2
    st.print()


def test_server_speculative_matches_plain(tmp_path):
    from omni_tpu.core import GGMLType, GGUFReader
    from omni_tpu.models import qwen3
    from omni_tpu.runtime import Context
    from omni_tpu.server.main import ServerState, serve
    from omni_tpu.testing import write_tiny_qwen3
    from omni_tpu.tokenizer import build_tokenizer

    path = tmp_path / "m.gguf"
    write_tiny_qwen3(path, n_layers=2, d_model=64, n_heads=4, n_kv_heads=2,
                     head_dim=16, d_ff=64, n_vocab=300, qtype=GGMLType.F32,
                     byte_tokenizer=True)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)

    def make_ctx():
        return Context(cfg, qwen3.load_params(reader), qwen3.forward,
                       qwen3.embed, n_ctx=256, buckets=(8,))

    tok = build_tokenizer(reader.kv)

    def run_server(draft):
        state = ServerState(make_ctx(), tok, n_slots=2,
                            draft_ctx=make_ctx() if draft else None)
        httpd = serve(state, "127.0.0.1", 0)
        port = httpd.server_address[1]
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        return httpd, f"http://127.0.0.1:{port}"

    def post(url, obj):
        req = urllib.request.Request(url, json.dumps(obj).encode(),
                                     {"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            return json.loads(r.read())

    body = {"prompt": "hello wor", "n_predict": 8, "temperature": 0.0}
    h1, base1 = run_server(draft=False)
    plain = post(base1 + "/completion", body)
    h1.shutdown()
    h2, base2 = run_server(draft=True)
    spec = post(base2 + "/completion", body)
    h2.shutdown()

    assert spec["content"] == plain["content"]
    assert "draft_accept_rate" in spec["timings"]
