"""Importance matrix capture + weighted quantization tests
(reference tools/imatrix + llama-quant imatrix weighting)."""

import numpy as np
import pytest

from omni_tpu.cli.imatrix import (accumulate, capture_sums, load_imatrix,
                                  save_imatrix)
from omni_tpu.cli.quantize import quantize_file
from omni_tpu.core import GGMLType, GGUFReader
from omni_tpu.core import quants
from omni_tpu.models import qwen3
from omni_tpu.testing import write_tiny_qwen3


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("im") / "m.gguf"
    write_tiny_qwen3(path, qtype=GGMLType.F16, d_model=256, d_ff=256,
                     n_heads=4, n_kv_heads=2, head_dim=64, tied_head=False)
    return path


def test_capture_shapes_and_positivity(model):
    reader = GGUFReader(model)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader)
    toks = np.arange(16, dtype=np.int32) % cfg.n_vocab
    sums, t = capture_sums(params, cfg, toks)
    assert t == 16
    assert sums["blk.0.attn_q.weight"].shape == (cfg.d_model,)
    assert sums["blk.0.ffn_down.weight"].shape == (cfg.d_ff,)
    assert sums["output.weight"].shape == (cfg.d_model,)
    assert all((v >= 0).all() and np.isfinite(v).all() for v in sums.values())
    # every quantizable 2-D weight input is tapped
    expected = {f"blk.{i}.{w}.weight" for i in range(cfg.n_layers)
                for w in ("attn_q", "attn_k", "attn_v", "attn_output",
                          "ffn_gate", "ffn_up", "ffn_down")} | {"output.weight"}
    assert expected <= set(sums)


def test_imatrix_file_roundtrip(model, tmp_path):
    data = accumulate(str(model), [np.arange(12, dtype=np.int32),
                                   np.arange(8, dtype=np.int32) + 3])
    assert data["n_tokens"] == 20
    out = tmp_path / "im.gguf"
    save_imatrix(str(out), data)
    loaded = load_imatrix(str(out))
    for k, v in loaded.items():
        np.testing.assert_allclose(v, data["sums"][k] / 20, rtol=1e-6)


def test_weighted_quant_improves_weighted_error():
    """Channels marked important by the imatrix get lower error."""
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((64, 512)) * 0.1).astype(np.float32)
    # importance: first half of channels 100x more important
    w = np.ones(512, np.float32)
    w[:256] = 100.0
    wb = np.broadcast_to(w.reshape(1, -1), x.shape)

    for t in (GGMLType.Q4_K, GGMLType.Q3_K, GGMLType.Q6_K):
        plain = quants.dequantize(quants.quantize(x, t), t, x.shape)
        weighted = quants.dequantize(quants.quantize(x, t, qweights=wb), t, x.shape)
        werr_plain = np.mean(wb * (plain - x) ** 2)
        werr_weighted = np.mean(wb * (weighted - x) ** 2)
        assert werr_weighted <= werr_plain * 1.0001, t.name


def test_quantize_cli_with_imatrix(model, tmp_path):
    data = accumulate(str(model), [np.arange(16, dtype=np.int32)])
    impath = tmp_path / "im.gguf"
    save_imatrix(str(impath), data)
    out = tmp_path / "q.gguf"
    stats = quantize_file(str(model), str(out), "Q4_K_M",
                          imatrix=load_imatrix(str(impath)))
    assert stats["n_quantized"] > 0
    # result loads and runs
    r = GGUFReader(out)
    cfg = qwen3.Qwen3Config.from_gguf(r.kv)
    params = qwen3.load_params(r)
    from omni_tpu.runtime import Batch, Context

    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=np.array([1, 2], np.int32)))
    assert np.isfinite(np.asarray(logits)).all()
