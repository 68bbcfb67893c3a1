"""On-chip A/B: small-M group-parallel kernel (M=2..8 batched decode /
speculative-verify rows) vs the plain fused dequant-matmul at the same M.

Method per docs/PERF.md rules: ONE jitted lax.scan chaining iterations,
fetch once; compare variants within this process only.
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

ITERS = 200

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
    for name, n, k in SHAPES:
        w = (rng.standard_normal((n, k)) * 0.02).astype(np.float32)
        qt = repack(quants.quantize(w, gt), gt, (n, k))
        gb = qt.nbytes / 1e9
        for m in (2, 4, 8):
            x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
            us_p = timed_scan(lambda xx: qmatmul_pallas(xx, qt), x)
            ref = np.asarray(qmatmul_pallas(x, qt, out_dtype=jnp.float32))
            try:
                got = np.asarray(qmatmul_gp_pallas(x, qt,
                                                   out_dtype=jnp.float32))
                err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
                us_g = timed_scan(lambda xx: qmatmul_gp_pallas(xx, qt), x)
                win = (us_p - us_g) / us_p * 100
                print(f"{name} m={m}: plain {us_p:7.1f} us "
                      f"({gb / (us_p * 1e-6):4.0f} GB/s)  gp {us_g:7.1f} us "
                      f"({gb / (us_g * 1e-6):4.0f} GB/s)  win {win:+5.1f}%  "
                      f"relerr {err:.1e}")
            except Exception as e:  # noqa: BLE001
                print(f"{name} m={m}: GP FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
