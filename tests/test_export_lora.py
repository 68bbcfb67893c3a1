"""omni-export-lora + omni-tokenize tool tests (reference
tools/export-lora/export-lora.cpp and tools/tokenize/tokenize.cpp)."""

import os

import numpy as np
import pytest

from omni_tpu.core import GGMLType, GGUFReader
from omni_tpu.core.gguf import GGUFWriter
from omni_tpu.models import qwen3
from omni_tpu.runtime import Batch, Context, SamplerParams
from omni_tpu.runtime.adapter import LoraAdapter, apply_lora
from omni_tpu.testing import write_tiny_qwen3

D, FF, HEADS, KVH, HD, RANK, ALPHA = 64, 96, 4, 2, 16, 4, 8.0
TOKS = np.array([3, 11, 42, 7], np.int32)


def _write_lora(path, pairs, alpha=ALPHA):
    w = GGUFWriter(path)
    w.add_kv("general.type", "adapter")
    w.add_kv("adapter.type", "lora")
    w.add_kv("adapter.lora.alpha", float(alpha))
    for stem, (a, b) in pairs.items():
        w.add_tensor(f"{stem}.lora_a", a.astype(np.float32))
        w.add_tensor(f"{stem}.lora_b", b.astype(np.float32))
    w.write()


def _logits(reader, wrap=None, scale=1.0):
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader, keep_quantized=False)
    if wrap is not None:
        params = apply_lora(params, wrap, scale=scale)
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32,
                  sampler=SamplerParams(greedy=True))
    logits, _ = ctx.decode(Batch(tokens=TOKS))
    return np.asarray(logits)


def test_export_lora_merge_matches_runtime(tmp_path):
    """Merged-GGUF logits == runtime LoraWeight logits (same delta)."""
    from omni_tpu.cli.export_lora import merge

    mpath = tmp_path / "base.gguf"
    write_tiny_qwen3(mpath, qtype=GGMLType.F32, d_model=D, d_ff=FF,
                     n_heads=HEADS, n_kv_heads=KVH, head_dim=HD,
                     tied_head=False)
    rng = np.random.default_rng(3)
    qd = HEADS * HD
    pairs = {
        "blk.0.attn_q.weight": (rng.standard_normal((RANK, D)) * 0.2,
                                rng.standard_normal((qd, RANK)) * 0.2),
        "blk.1.ffn_down.weight": (rng.standard_normal((RANK, FF)) * 0.2,
                                  rng.standard_normal((D, RANK)) * 0.2),
    }
    lpath = tmp_path / "adapter.gguf"
    _write_lora(lpath, pairs)

    out = tmp_path / "merged.gguf"
    scale = 0.7
    merged = merge(str(mpath), [(str(lpath), scale)], str(out),
                   outtype="f32")
    assert sorted(merged) == ["blk.0.attn_q.weight",
                              "blk.1.ffn_down.weight"]

    want = _logits(GGUFReader(mpath),
                   wrap=LoraAdapter.from_gguf(lpath), scale=scale)
    got = _logits(GGUFReader(out))
    # runtime LoraWeight rounds a/b to bf16; the merged delta is f32
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)

    # the delta itself is exact: W' - W == eff * (b @ a)
    r0, r1 = GGUFReader(mpath), GGUFReader(out)
    w0 = np.asarray(r0.tensors["blk.0.attn_q.weight"].data).reshape(qd, D)
    w1 = np.asarray(r1.tensors["blk.0.attn_q.weight"].data).reshape(qd, D)
    a, b = pairs["blk.0.attn_q.weight"]
    np.testing.assert_allclose(w1 - w0, scale * ALPHA / RANK * (b @ a),
                               atol=1e-6)


def test_export_lora_cli(tmp_path, capsys):
    from omni_tpu.cli.export_lora import main

    mpath = tmp_path / "base.gguf"
    write_tiny_qwen3(mpath, qtype=GGMLType.F32, d_model=D, d_ff=FF,
                     n_heads=HEADS, n_kv_heads=KVH, head_dim=HD)
    rng = np.random.default_rng(4)
    _write_lora(tmp_path / "a.gguf", {
        "blk.0.attn_v.weight": (rng.standard_normal((RANK, D)) * 0.2,
                                rng.standard_normal((KVH * HD, RANK)) * 0.2)})
    out = tmp_path / "m.gguf"
    rc = main(["-m", str(mpath), "-o", str(out),
               "--lora", str(tmp_path / "a.gguf"), "--outtype", "f16"])
    assert rc == 0 and os.path.getsize(out) > 0
    assert "1 tensors merged" in capsys.readouterr().out
    r = GGUFReader(out)
    assert r.tensors["blk.0.attn_v.weight"].ggml_type == GGMLType.F16


REF_VOCAB = "/root/reference/models/ggml-vocab-gpt-2.gguf"


@pytest.mark.skipif(not os.path.exists(REF_VOCAB),
                    reason="reference vocab fixture not available")
def test_tokenize_cli(capsys):
    from omni_tpu.cli.tokenize import main

    rc = main(["-m", REF_VOCAB, "-p", "Hello world", "--ids",
               "--show-count"])
    assert rc == 0
    out = capsys.readouterr().out
    first = out.splitlines()[0]
    ids = [int(x) for x in first.strip("[]\n").split(",")]
    assert len(ids) >= 2
    assert "Total number of tokens" in out

    rc = main(["-m", REF_VOCAB, "-p", "hi"])
    assert rc == 0
    assert "->" in capsys.readouterr().out
