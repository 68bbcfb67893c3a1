"""On-chip sweep: does raising Mosaic's scoped-VMEM limit (default 16 MB)
plus larger tiles beat the production decode tiles?

The production dequant-matmul runs at 352-361 GB/s vs a 508 GB/s measured
DMA+dot ceiling (docs/PERF.md). Bigger (bn, bk) tiles mean fewer grid
steps and longer DMA bursts, but were previously capped by the 16 MB
scoped-VMEM default; `CompilerParams.vmem_limit_bytes` lifts it
per-kernel (v5e has 128 MB of VMEM).

Method per PERF rules: ONE jitted lax.scan chaining iterations, fetch once.
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
from omni_tpu.kernels.dequant_matmul import qmatmul_pallas  # noqa: E402
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
    m = 1
    for name, n, k in SHAPES:
        w = (rng.standard_normal((n, k)) * 0.02).astype(np.float32)
        qt = repack(quants.quantize(w, gt), gt, (n, k))
        x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
        base = timed_scan(lambda xx: qmatmul_pallas(xx, qt), x)
        print(f"{name}: auto tiles {base:7.1f} us  "
              f"{qt.nbytes/base*1e-3:5.0f} GB/s", flush=True)
        for bn in (1024, 2048, 4096, n):
            if bn > n:
                continue
            for bk in (4096, 8192, k):
                if bk > k or (bn == n and bk == k and n * k > 4096 * 4096):
                    pass
                try:
                    us = timed_scan(
                        lambda xx, bn=bn, bk=bk: qmatmul_pallas(
                            xx, qt, block_n=bn, block_k=bk,
                            vmem_limit=100 * 2**20), x)
                    print(f"{name}: bn={bn} bk={bk} vmem100M {us:7.1f} us  "
                          f"{qt.nbytes/us*1e-3:5.0f} GB/s", flush=True)
                except Exception as e:
                    print(f"{name}: bn={bn} bk={bk} FAILED "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
