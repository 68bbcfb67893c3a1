"""CI dry-run of scripts/validate_real.py on a tiny model (VERDICT r2 #7:
the harness must be runnable TODAY; real weights only change the inputs).

Covers all four sections: tokenizer round-trip on a functional byte-BPE
vocab, F16-vs-Q4_K PPL delta on a synthetic corpus, stagewise dump
comparison against dumps we write in the reference's binary format
(tools/omni/omni.cpp:2191-2232 save_logits/save_hidden_states layout),
and wav RMSE."""

import json
import struct
import subprocess
import sys
import wave

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_models(tmp_path_factory):
    from omni_tpu.core import GGMLType
    from omni_tpu.testing import write_tiny_qwen3

    d = tmp_path_factory.mktemp("validate")
    kw = dict(arch="qwen3", n_layers=2, d_model=64, n_heads=4, n_kv_heads=2,
              head_dim=16, d_ff=64, n_vocab=300, qk_norm=True,
              byte_tokenizer=True, tied_head=False, seed=7)
    f16 = d / "tiny-f16.gguf"
    q4 = d / "tiny-q4k.gguf"
    write_tiny_qwen3(str(f16), qtype=GGMLType.F16, **kw)
    write_tiny_qwen3(str(q4), qtype=GGMLType.Q4_K, **kw)
    return d, f16, q4


def test_validate_real_dry_run(tiny_models, tmp_path):
    d, f16, q4 = tiny_models
    corpus = tmp_path / "corpus.txt"
    # enough bytes for multiple 64-token chunks through the byte BPE
    corpus.write_text("the quick brown fox jumps over the lazy dog. " * 80)

    # reference-format golden dumps: produce them FROM the f16 model so the
    # comparison must come back near-zero (format + plumbing check)
    from omni_tpu.core import GGUFReader
    from omni_tpu.models import qwen3
    from omni_tpu.runtime import Batch, Context
    from omni_tpu.tokenizer import build_tokenizer

    reader = GGUFReader(str(f16))
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    ctx = Context(cfg, qwen3.load_params(reader), qwen3.forward,
                  qwen3.embed, n_ctx=128)
    tok = build_tokenizer(reader.kv)
    toks = np.asarray(tok.encode("golden dump tokens", add_special=False),
                      np.int32)
    logits, hidden = ctx.decode(Batch(tokens=toks), return_hidden=True)
    dumps = tmp_path / "dumps"
    dumps.mkdir()
    for i in (0, len(toks) - 1):
        row = np.asarray(logits)[i].astype(np.float32)
        with open(dumps / f"logits_{i:03d}.bin", "wb") as f:
            f.write(struct.pack("<ii", i, len(row)) + row.tobytes())
        h = np.asarray(hidden)[i].astype(np.float32)
        with open(dumps / f"hidden_states_{i:03d}.bin", "wb") as f:
            f.write(struct.pack("<ii", i, len(h)) + h.tobytes())
    (tmp_path / "tokens.json").write_text(json.dumps(toks.tolist()))

    # wav goldens: identical file in both dirs -> rmse 0
    for sub in ("wav_ref", "wav_out"):
        (tmp_path / sub).mkdir()
        with wave.open(str(tmp_path / sub / "wav_0.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(16000)
            w.writeframes((np.sin(np.arange(800) * 0.1) * 8000)
                          .astype(np.int16).tobytes())

    out = tmp_path / "report.json"
    r = subprocess.run(
        [sys.executable, "scripts/validate_real.py", "--cpu",
         "--llm", str(f16), "--quant", str(q4),
         "--wikitext", str(corpus), "--ctx", "64", "--chunks", "2",
         "--max-ppl-delta", "10.0",  # tiny random model: loose gate
         "--dumps", str(dumps), "--dump-tokens", str(tmp_path / "tokens.json"),
         "--wav-ref", str(tmp_path / "wav_ref"),
         "--wav-out", str(tmp_path / "wav_out"),
         "--out", str(out)],
        capture_output=True, text=True, timeout=600, cwd="/root/repo")
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    rep = json.loads(out.read_text())
    assert rep["tokenizer_roundtrip"]["pass"], rep["tokenizer_roundtrip"]
    ppl = rep["perplexity"]
    assert ppl["pass"] and ppl["f16"]["ppl"] > 1.0
    sd = rep["stagewise_dumps"]
    assert sd["pass"] and all(row["rmse"] < 1e-4 for row in sd["logits"])
    assert all(row["rel_rmse"] < 1e-4 for row in sd["hidden"])
    assert rep["wav_rmse"]["files"][0]["rmse"] == 0.0
