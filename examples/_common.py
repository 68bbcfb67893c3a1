"""Shared helpers for the examples: tiny-model construction.

Every example runs standalone on a generated tiny random model (pass
--model to use a real GGUF instead), mirroring how the reference's
examples/ run against any model file.
"""

import os
import tempfile

from omni_tpu.core import GGMLType, GGUFReader
from omni_tpu.models import qwen3
from omni_tpu.runtime import Context, SamplerParams
from omni_tpu.testing import write_tiny_qwen3


def load_model(path: str | None = None, n_ctx: int = 256,
               sampler: SamplerParams | None = None, **ctx_kw):
    if path is None:
        path = os.path.join(tempfile.mkdtemp(), "tiny.gguf")
        write_tiny_qwen3(path, qtype=GGMLType.Q8_0, d_model=128, d_ff=128,
                         n_heads=4, n_kv_heads=2, head_dim=32,
                         tied_head=False)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader)
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=n_ctx,
                  sampler=sampler or SamplerParams(greedy=True), **ctx_kw)
    return ctx, cfg, reader
