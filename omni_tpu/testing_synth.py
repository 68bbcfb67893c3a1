"""Synthetic full-size model parameters for benchmarking.

Builds Qwen3-8B-shaped parameter pytrees with random (but numerically tame)
quantized weights directly in the TPU SoA layout — no 5 GB host quantization
pass. The compute/memory profile is identical to a real Q4_K_M checkpoint;
only the values are random, which is all a throughput benchmark needs
(the reference benchmarks with real weights but throughput is
content-independent for dense decode).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .core.dtypes import GGMLType
from .kernels.qformats import QTensor
from .models.qwen3 import Qwen3Config

QWEN3_8B = Qwen3Config(
    n_layers=36, d_model=4096, n_heads=32, n_kv_heads=8, head_dim=128,
    d_ff=12288, n_vocab=151748, rope_base=1000000.0, rms_eps=1e-6,
)


def synth_q4k(rng: np.random.Generator, n: int, k: int) -> QTensor:
    """Random Q4_K QTensor in TPU layout (scale magnitudes ~N(0,0.02))."""
    nsb = k // 256
    q = rng.integers(0, 256, (k // 2, n), dtype=np.uint8)
    sc = rng.integers(20, 64, (k // 32, n), dtype=np.int8)
    mn = rng.integers(0, 40, (k // 32, n), dtype=np.int8)
    d = (rng.random((k // 256, n), dtype=np.float32) * 1e-4 + 1e-5)
    dm = (rng.random((k // 256, n), dtype=np.float32) * 1e-4 + 1e-5)
    return QTensor(GGMLType.Q4_K, (n, k), jnp.asarray(q), jnp.asarray(sc),
                   jnp.asarray(mn), jnp.asarray(d), jnp.asarray(dm))


def synth_qwen3_params(cfg: Qwen3Config = QWEN3_8B, seed: int = 0,
                       tied_head: bool = False) -> dict:
    rng = np.random.default_rng(seed)
    d, ff = cfg.d_model, cfg.d_ff
    qd = cfg.n_heads * cfg.head_dim
    kvd = cfg.n_kv_heads * cfg.head_dim

    def norm(n):
        return jnp.ones((n,), jnp.float32)

    params = {
        # cheap uniform fill: float64 normal over vocab x d would cost ~5 GB
        "token_embd": jnp.asarray(
            (rng.random((cfg.n_vocab, d), dtype=np.float32) - 0.5) * 0.04,
            jnp.bfloat16),
        "output_norm": norm(d),
        "output": None if tied_head else synth_q4k(rng, cfg.n_vocab, d),
        "layers": [],
    }
    for _ in range(cfg.n_layers):
        params["layers"].append({
            "attn_norm": norm(d),
            "wq": synth_q4k(rng, qd, d),
            "wk": synth_q4k(rng, kvd, d),
            "wv": synth_q4k(rng, kvd, d),
            "wo": synth_q4k(rng, d, qd),
            "q_norm": norm(cfg.head_dim),
            "k_norm": norm(cfg.head_dim),
            "ffn_norm": norm(d),
            "w_gate": synth_q4k(rng, ff, d),
            "w_up": synth_q4k(rng, ff, d),
            "w_down": synth_q4k(rng, d, ff),
        })
    return params
