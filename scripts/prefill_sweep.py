"""Prefill (large-M) tile sweep for the fused dequant-matmul kernel.

Sweeps (block_m, block_n, block_k) per weight shape at M in {64, 256, 512}
and prints TFLOP/s; the winners feed kernels/dequant_matmul._auto_tiles.
Each config is timed as ONE jitted lax.scan of 30 chained calls (the axon
tunnel costs ~35 ms per host round-trip — per-call timing would be all
tunnel).
"""

import functools
import itertools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from omni_tpu.kernels.dequant_matmul import qmatmul_pallas
from omni_tpu.testing_synth import synth_q4k

SHAPES = {  # name: (N, K)  (Qwen3-8B fused-layout weights)
    "wqkv 6144x4096": (6144, 4096),
    "gateup 24576x4096": (24576, 4096),
    "down 4096x12288": (4096, 12288),
}
MS = (64, 512)
# compile cost (~25 s/config on the tunnel) bounds the grid: sweep the
# promising corner found in round 1 (large bk, medium-large bn).
# NOTE: on axon, block_until_ready does NOT synchronize — every timing
# must end in a REAL host fetch (np.asarray).
CONFIGS = [(64, 256, 4096), (64, 512, 4096), (64, 1024, 4096),
           (128, 512, 4096), (256, 512, 4096),
           (256, 1024, 2048), (256, 1024, 4096), (512, 1024, 4096)]
REPS = 64


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def bench_scan(x, qt, bm, bn, bk):
    def step(x, _):
        y = qmatmul_pallas(x, qt, block_m=bm, block_n=bn, block_k=bk)
        # chain a data dependency so the scan can't collapse
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
            best = (0.0, None)
            for bm, bn, bk in CONFIGS:
                if bm > m or bn > n or bk > k:
                    continue
                try:
                    np.asarray(bench_scan(x, qt, bm, bn, bk))  # compile+warm
                    t0 = time.perf_counter()
                    np.asarray(bench_scan(x, qt, bm, bn, bk))
                    dt = (time.perf_counter() - t0) / REPS
                except Exception as e:  # noqa: BLE001
                    print(f"  {name} M={m} bm{bm} bn{bn} bk{bk}: "
                          f"{type(e).__name__}", file=sys.stderr)
                    continue
                tf = 2 * m * n * k / dt / 1e12
                if tf > best[0]:
                    best = (tf, (bm, bn, bk))
                print(f"  {name} M={m} bm{bm} bn{bn} bk{bk}: {tf:.1f} TF/s",
                      flush=True)
            results[(name, m)] = best
            print(f"BEST {name} M={m}: {best[0]:.1f} TF/s tiles={best[1]}",
                  flush=True)
    print("\nsummary:")
    for (name, m), (tf, tiles) in results.items():
        print(f"  {name:22s} M={m:4d}: {tf:6.1f} TF/s  {tiles}")


if __name__ == "__main__":
    main()
