"""Synthetic full-size model parameters for benchmarking.

Builds Qwen3-8B-shaped parameter pytrees with random (but numerically tame)
quantized weights directly in the TPU SoA layout — generated ON DEVICE with
jax.random so no multi-GB host->device transfer happens (the TPU sits behind
a tunnel; pushing ~5 GB of host RNG output took minutes). The compute/memory
profile is identical to a real Q4_K_M checkpoint; only the values are random,
which is all a throughput benchmark needs (throughput of dense decode is
content-independent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .core.dtypes import GGMLType
from .kernels.qformats import QTensor
from .models.qwen3 import Qwen3Config

QWEN3_8B = Qwen3Config(
    n_layers=36, d_model=4096, n_heads=32, n_kv_heads=8, head_dim=128,
    d_ff=12288, n_vocab=151748, rope_base=1000000.0, rms_eps=1e-6,
)


def _randu8(key, shape, lo, hi):
    return jax.random.randint(key, shape, lo, hi, dtype=jnp.int32).astype(jnp.uint8)


from functools import partial


@partial(jax.jit, static_argnums=(1, 2, 3))
def _synth_q4k_arrays(key, q_shape, s_shape, d_shape):
    kq, ks, km, kd, kdm = jax.random.split(key, 5)
    q = _randu8(kq, q_shape, 0, 256)
    sc = jax.random.randint(ks, s_shape, 20, 64, dtype=jnp.int32).astype(jnp.int8)
    mn = jax.random.randint(km, s_shape, 0, 40, dtype=jnp.int32).astype(jnp.int8)
    d = jax.random.uniform(kd, d_shape, jnp.float32, 1e-5, 1.1e-4)
    dm = jax.random.uniform(kdm, d_shape, jnp.float32, 1e-5, 1.1e-4)
    return q, sc, mn, d, dm


def synth_q4k(key, n: int, k: int) -> QTensor:
    """Random Q4_K QTensor in TPU layout (scale magnitudes ~1e-4)."""
    q, sc, mn, d, dm = _synth_q4k_arrays(
        key, (k // 2, n), (k // 32, n), (k // 256, n))
    return QTensor(GGMLType.Q4_K, (n, k), q, sc, mn, d, dm)


def synth_qwen3_params(cfg: Qwen3Config = QWEN3_8B, seed: int = 0,
                       tied_head: bool = False, fuse: bool = False) -> dict:
    d, ff = cfg.d_model, cfg.d_ff
    qd = cfg.n_heads * cfg.head_dim
    kvd = cfg.n_kv_heads * cfg.head_dim

    keys = iter(jax.random.split(jax.random.PRNGKey(seed),
                                 2 + 7 * cfg.n_layers))

    def norm(n):
        return jnp.ones((n,), jnp.float32)

    params = {
        "token_embd": jax.random.uniform(
            next(keys), (cfg.n_vocab, d), jnp.bfloat16, -0.02, 0.02),
        "output_norm": norm(d),
        "output": None if tied_head else synth_q4k(next(keys), cfg.n_vocab, d),
        "layers": [],
    }
    for _ in range(cfg.n_layers):
        params["layers"].append({
            "attn_norm": norm(d),
            "wq": synth_q4k(next(keys), qd, d),
            "wk": synth_q4k(next(keys), kvd, d),
            "wv": synth_q4k(next(keys), kvd, d),
            "wo": synth_q4k(next(keys), d, qd),
            "q_norm": norm(cfg.head_dim),
            "k_norm": norm(cfg.head_dim),
            "ffn_norm": norm(d),
            "w_gate": synth_q4k(next(keys), ff, d),
            "w_up": synth_q4k(next(keys), ff, d),
            "w_down": synth_q4k(next(keys), d, ff),
        })
    if fuse:
        from .models.qwen3 import fuse_layer

        params["layers"] = [fuse_layer(l) for l in params["layers"]]
    return params
