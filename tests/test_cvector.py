"""Control-vector generator tests (tools/cvector-generator counterpart)."""

import numpy as np
import pytest

from omni_tpu.cli.cvector import generate_cvector, pca_direction
from omni_tpu.core import GGMLType, GGUFReader
from omni_tpu.models import qwen3
from omni_tpu.runtime import Batch, Context
from omni_tpu.runtime.adapter import apply_control_vector, load_control_vector
from omni_tpu.testing import write_tiny_qwen3


def test_pca_direction_recovers_dominant_axis():
    rng = np.random.default_rng(0)
    axis = np.zeros(16, np.float32)
    axis[3] = 1.0
    diffs = (np.abs(rng.standard_normal((20, 1))) * 2 + 1) * axis \
        + rng.standard_normal((20, 16)) * 0.05
    v = pca_direction(diffs.astype(np.float32))
    assert abs(v[3]) > 0.95
    assert v @ diffs.mean(0) > 0  # sign-aligned to the positive set


def test_generate_and_apply(tmp_path):
    mpath = tmp_path / "m.gguf"
    write_tiny_qwen3(mpath, n_layers=2, d_model=64, n_heads=4, n_kv_heads=2,
                     head_dim=16, d_ff=64, n_vocab=300, qtype=GGMLType.F32,
                     byte_tokenizer=True)
    out = tmp_path / "cv.gguf"
    n = generate_cvector(str(mpath),
                         positives=["I feel happy", "great and joyful"],
                         negatives=["I feel sad", "terrible and gloomy"],
                         out_path=str(out))
    assert n == 2

    directions = load_control_vector(str(out))
    assert set(directions) == {1, 2}
    for v in directions.values():
        assert np.isfinite(np.asarray(v)).all()
        assert abs(np.linalg.norm(np.asarray(v)) - 1.0) < 1e-3

    reader = GGUFReader(mpath)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader, keep_quantized=False)
    toks = np.array([5, 9, 42], np.int32)

    def logits(p):
        ctx = Context(cfg, p, qwen3.forward, qwen3.embed, n_ctx=32)
        lg, _ = ctx.decode(Batch(tokens=toks))
        return np.asarray(lg)

    base = logits(params)
    steered = logits(apply_control_vector(params, directions, strength=2.0))
    assert not np.allclose(base, steered, atol=1e-3)
