"""On-chip A/B: group-parallel decode kernel (qmatmul_gp_pallas) vs the
production fused dequant-matmul, 8B Q4_K decode shapes.

The GP kernel feeds RAW quants to the MXU against a block-diagonal
activation so the per-group scale law lands on a [K/32, N] plane instead
of [K, N] (docs/PERF.md: the scale math costs ~25% of the plain kernel).
Sweeps the sub-slice depth KS (MXU M-rows per group dot = KS/32).

Method per PERF rules: ONE jitted lax.scan chaining iterations, fetch once.
Compare variants within this process only.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from omni_tpu.core.dtypes import GGMLType  # noqa: E402
from omni_tpu.core import quants  # noqa: E402
from omni_tpu.kernels.dequant_matmul import (  # noqa: E402
    qmatmul_gp_pallas, qmatmul_pallas)
from omni_tpu.kernels.qformats import repack  # noqa: E402

ITERS = 300

SHAPES = [  # (name, N, K) — 8B Q4_K decode geometry
    ("wqkv 6144x4096", 6144, 4096),
    ("wo 4096x4096", 4096, 4096),
    ("gateup 24576x4096", 24576, 4096),
    ("down 4096x12288", 4096, 12288),
]


def timed_scan(fn, x):
    @jax.jit
    def run(xx):
        def body(carry, _):
            out = fn(xx + carry * 0.0)
            return (jnp.sum(out) * 1e-20).astype(jnp.float32), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    run(x).block_until_ready()
    t0 = time.perf_counter()
    np.asarray(run(x))
    return (time.perf_counter() - t0) / ITERS * 1e6


def main():
    rng = np.random.default_rng(0)
    gt = GGMLType.Q4_K
    total = {"prod": 0.0}
    for name, n, k in SHAPES:
        w = (rng.standard_normal((n, k)) * 0.02).astype(np.float32)
        qt = repack(quants.quantize(w, gt), gt, (n, k))
        x = jnp.asarray(rng.standard_normal((1, k)), jnp.bfloat16)
        gb = qt.nbytes / 1e9

        us = timed_scan(lambda xx: qmatmul_pallas(xx, qt), x)
        total["prod"] += us
        print(f"{name}: prod {us:7.1f} us  {gb / (us * 1e-6):5.0f} GB/s")

        ref = np.asarray(qmatmul_pallas(x, qt, out_dtype=jnp.float32))
        # n_sl = tk/ks sub-slices are UNROLLED in the kernel; >4 explodes
        # Mosaic compile time (a 16-slice variant hung >9 min)
        for tk, ks in ((512, 512), (1024, 1024), (2048, 1024),
                       (2048, 512), (4096, 1024)):
            try:
                t0 = time.perf_counter()
                got = np.asarray(qmatmul_gp_pallas(
                    x, qt, block_k=tk, block_ks=ks, out_dtype=jnp.float32))
                tc = time.perf_counter() - t0
                err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
                us = timed_scan(
                    lambda xx, tk=tk, ks=ks: qmatmul_gp_pallas(
                        xx, qt, block_k=tk, block_ks=ks), x)
                key = f"gp tk={tk} ks={ks}"
                total.setdefault(key, 0.0)
                total[key] += us
                print(f"{name}: {key:20s} {us:7.1f} us  "
                      f"{gb / (us * 1e-6):5.0f} GB/s  relerr {err:.1e}  "
                      f"(compile {tc:.0f}s)")
            except Exception as e:  # noqa: BLE001
                print(f"{name}: gp tk={tk} ks={ks} FAILED: "
                      f"{type(e).__name__}: {str(e)[:160]}")
            sys.stdout.flush()
    print("totals:", {k2: round(v, 1) for k2, v in total.items()})


if __name__ == "__main__":
    main()
