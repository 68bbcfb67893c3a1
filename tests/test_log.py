"""Logging + perf counter tests (common/log.cpp, llama_perf counterparts)."""

import numpy as np

from omni_tpu import log


def test_levels_env(monkeypatch, capsys):
    monkeypatch.setenv("OMNI_LOG_LEVEL", "warn")
    log.info("hidden %d", 1)
    log.warn("shown %s", "x")
    err = capsys.readouterr().err
    assert "hidden" not in err and "shown x" in err


def test_perf_counters_via_context(tmp_path):
    from omni_tpu.core import GGMLType, GGUFReader
    from omni_tpu.models import qwen3
    from omni_tpu.runtime import Batch, Context
    from omni_tpu.testing import write_tiny_qwen3

    p = tmp_path / "m.gguf"
    write_tiny_qwen3(p, qtype=GGMLType.Q8_0, d_model=128, d_ff=128,
                     n_heads=4, n_kv_heads=2, head_dim=32, tied_head=False)
    r = GGUFReader(p)
    cfg = qwen3.Qwen3Config.from_gguf(r.kv)
    ctx = Context(cfg, qwen3.load_params(r), qwen3.forward, qwen3.embed,
                  n_ctx=64)
    ctx.decode(Batch(tokens=np.array([1, 2, 3, 4], np.int32)))
    ctx.decode(Batch(tokens=np.array([5], np.int32)))
    s = ctx.perf.summary()
    assert s["prompt_tokens"] == 4 and s["eval_tokens"] == 1
    assert s["prompt_ms_per_token"] > 0 and s["eval_ms_per_token"] > 0
    ctx.perf.print()
    ctx.perf.reset()
    assert ctx.perf.summary()["eval_tokens"] == 0
