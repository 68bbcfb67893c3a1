"""Real-TPU smoke test: compile + run the fused dequant-matmul kernel on the
actual chip, check against the XLA path, and time GEMV/GEMM at Qwen3-8B
shapes. Run directly (uses whatever platform JAX selects, i.e. the TPU)."""

import time

import numpy as np

import jax
import jax.numpy as jnp

from omni_tpu.core import GGMLType, quants
from omni_tpu.kernels import qmatmul_pallas, qmatmul_xla, repack


def bench(fn, *args, iters=50):
    fn(*args)[0].block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    out[0].block_until_ready()
    return (time.perf_counter() - t0) / iters


def main():
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)

    # correctness at small shape
    for qtype in (GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q8_0):
        w = rng.standard_normal((512, 1024), dtype=np.float32)
        qt = repack(quants.quantize(w, qtype), qtype, (512, 1024))
        x = jnp.asarray(rng.standard_normal((8, 1024), dtype=np.float32))
        got = np.asarray(qmatmul_pallas(x, qt, out_dtype=jnp.float32))
        want = np.asarray(qmatmul_xla(x, qt, out_dtype=jnp.float32))
        err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        print(f"{qtype.name}: pallas vs xla rel err {err:.2e}")
        assert err < 3e-2, qtype

    # perf at Qwen3-8B shapes (N=K=4096 qkv/o; ffn 12288)
    for (n, k), name in [((4096, 4096), "attn 4096x4096"),
                         ((12288, 4096), "ffn_up 12288x4096"),
                         ((4096, 12288), "ffn_down 4096x12288")]:
        w = rng.standard_normal((n, k), dtype=np.float32) * 0.02
        qt = repack(quants.quantize(w, GGMLType.Q4_K), GGMLType.Q4_K, (n, k))
        for m in (1, 8, 512):
            x = jnp.asarray(rng.standard_normal((m, k), dtype=np.float32), jnp.bfloat16)
            dt = bench(lambda a, b: (qmatmul_pallas(a, b),), x, qt)
            dt_x = bench(lambda a, b: (qmatmul_xla(a, b),), x, qt)
            gbs = qt.nbytes / dt / 1e9
            flops = 2 * m * n * k / dt / 1e12
            print(f"{name} m={m}: pallas {dt*1e6:.0f}us ({gbs:.0f} GB/s, "
                  f"{flops:.2f} TFLOP/s) | xla-dequant {dt_x*1e6:.0f}us")


if __name__ == "__main__":
    main()
