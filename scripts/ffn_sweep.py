"""On-chip sweep: fused SwiGLU FFN kernel (qffn_pallas) vs the production
two-call path (qmatmul gateup + XLA silu·mul + qmatmul down), 8B Q4_K
geometry (K=4096, F=12288). Decode (M=1) and prefill (M=64/256) shapes.

Method per PERF rules: ONE jitted lax.scan chaining iterations, fetch once.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from omni_tpu.core.dtypes import GGMLType  # noqa: E402
from omni_tpu.core import quants  # noqa: E402
from omni_tpu.kernels.dequant_matmul import qmatmul_pallas  # noqa: E402
from omni_tpu.kernels.fused_ffn import qffn_pallas  # noqa: E402
from omni_tpu.kernels.qformats import repack  # noqa: E402

ITERS = 200
K, F = 4096, 12288


def make_qt(n, k, gtype, rng):
    w = (rng.standard_normal((n, k)) * 0.02).astype(np.float32)
    return repack(quants.quantize(w, gtype), gtype, (n, k))


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
    gtype = GGMLType.Q4_K
    gu = make_qt(2 * F, K, gtype, rng)
    dn = make_qt(K, F, gtype, rng)
    w_bytes = gu.nbytes + dn.nbytes

    def twocall(x):
        g_u = qmatmul_pallas(x, gu)
        g, u = g_u[:, :F], g_u[:, F:]
        h = (jax.nn.silu(g.astype(jnp.float32)).astype(jnp.bfloat16) * u)
        return qmatmul_pallas(h, dn)

    for m in (1, 64, 256):
        x = jnp.asarray(rng.standard_normal((m, K)), jnp.bfloat16)
        us = timed_scan(twocall, x)
        print(f"M={m} two-call: {us:8.1f} us  {w_bytes/us*1e-3:6.0f} GB/s",
              flush=True)
        for bf in (512, 1024, 1536, 2048, 3072):
            if F % bf:
                continue
            us = timed_scan(
                lambda xx, bf=bf: qffn_pallas(xx, gu, dn, block_f=bf), x)
            print(f"M={m} fused bf={bf}: {us:8.1f} us  "
                  f"{w_bytes/us*1e-3:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
