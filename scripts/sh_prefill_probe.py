"""A/B: split-half prefill kernel vs the plain fused kernel (large M).

One jitted lax.scan of chained calls per config (the axon tunnel costs
~35 ms per host round-trip); REAL fetch at the end. Prints TFLOP/s.
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from omni_tpu.kernels.dequant_matmul import (qmatmul_pallas,
                                             qmatmul_splith_pallas)
from omni_tpu.testing_synth import synth_q4k

SHAPES = {  # name: (N, K)  (Qwen3-8B fused-layout weights)
    "wqkv 6144x4096": (6144, 4096),
    "gateup 24576x4096": (24576, 4096),
    "down 4096x12288": (4096, 12288),
}
MS = (64, 256, 512)
# (bm, bn, bk) — prefill corner from rounds 1-2 + a couple of probes
CONFIGS = [(64, 512, 4096), (128, 512, 4096), (256, 512, 4096),
           (256, 512, 2048), (256, 1024, 4096)]
REPS = 32


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk", "kind"))
def bench_scan(x, qt, bm, bn, bk, kind):
    fn = qmatmul_splith_pallas if kind == "sh" else qmatmul_pallas
    kw = {} if kind == "sh" else {}

    def step(x, _):
        y = fn(x, qt, block_m=bm, block_n=bn, block_k=bk, **kw)
        return x + y[0, 0].astype(x.dtype) * 1e-9, ()

    out, _ = jax.lax.scan(step, x, None, length=REPS)
    return out


def main():
    key = jax.random.PRNGKey(0)
    results = {}
    for name, (n, k) in SHAPES.items():
        qt = synth_q4k(key, n, k)
        for m in MS:
            x = jax.random.normal(key, (m, k), jnp.bfloat16)
            for kind in ("plain", "sh"):
                best = (0.0, None)
                for bm, bn, bk in CONFIGS:
                    if bm > m:
                        continue
                    try:
                        np.asarray(bench_scan(x, qt, bm, bn, bk, kind))
                        t0 = time.perf_counter()
                        np.asarray(bench_scan(x, qt, bm, bn, bk, kind))
                        dt = (time.perf_counter() - t0) / REPS
                    except Exception as e:  # noqa: BLE001
                        print(f"  {name} M={m} {kind} bm{bm} bn{bn} bk{bk}: "
                              f"{type(e).__name__}: {e}"[:200],
                              file=sys.stderr, flush=True)
                        continue
                    tf = 2 * m * n * k / dt / 1e12
                    if tf > best[0]:
                        best = (tf, (bm, bn, bk))
                    print(f"  {name} M={m} {kind} bm{bm} bn{bn} bk{bk}: "
                          f"{tf:.1f} TF/s", flush=True)
                results[(name, m, kind)] = best
    print("\nsummary (best TF/s):")
    for (name, m, kind), (tf, tiles) in results.items():
        print(f"  {name:22s} M={m:4d} {kind:5s}: {tf:6.1f} TF/s  {tiles}")


if __name__ == "__main__":
    main()
