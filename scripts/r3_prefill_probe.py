"""Round-3 probe: where does small-M prefill time go, and can the Q4_K
dequant scale-math be cheapened?

Measures in ONE process on the chip (axon variance rules, docs/PERF.md):
  1. M in {1, 16, 64} per production weight shape, current auto tiles —
     pipelined harness (independent calls inside one scan, fetch once) so
     per-call fixed costs overlap like production.
  2. tile sweep at M in {16, 64} over a wider grid than round 2
     (bn down to 128, bk 1024-4096).
  3. dequant variants at M=1 and M=64: production vs fnma form
     (q*dl - ml as a single fused op order) vs no-min (lower bound).
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

import omni_tpu.kernels.dequant_matmul as dm
import omni_tpu.kernels.qformats as qf
from omni_tpu.testing_synth import synth_q4k

SHAPES = {
    "wqkv 6144x4096": (6144, 4096),
    "gateup 24576x4096": (24576, 4096),
    "down 4096x12288": (4096, 12288),
    "head 151936x4096": (151936, 4096),
}
REPS = 48


def log(m):
    print(m, file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "bk"))
def bench_scan(x, qt, bm, bn, bk):
    # per-iteration inputs vary with i (no CSE/hoist) but do NOT depend on
    # the previous output, so back-to-back calls pipeline like production
    # layers; the carry only accumulates a scalar off the critical path
    def step(acc, i):
        y = dm.qmatmul_pallas(x + i.astype(x.dtype) * 1e-9, qt,
                              block_m=bm, block_n=bn, block_k=bk)
        return acc + y[0, 0].astype(jnp.float32), None

    acc, _ = jax.lax.scan(step, jnp.float32(0),
                          jnp.arange(REPS, dtype=jnp.int32))
    return acc


def time_cfg(x, qt, bm, bn, bk):
    np.asarray(bench_scan(x, qt, bm, bn, bk))  # compile+warm
    t0 = time.perf_counter()
    np.asarray(bench_scan(x, qt, bm, bn, bk))
    return (time.perf_counter() - t0) / REPS


def run_m(qt, n, k, m, cfgs, label):
    x = jax.random.normal(jax.random.PRNGKey(1), (m, k), jnp.bfloat16)
    best = (1e9, None)
    for bm, bn, bk in cfgs:
        if bm > m or bn > n or bk > k:
            continue
        try:
            dt = time_cfg(x, qt, min(bm, m), bn, bk)
        except Exception as e:  # noqa: BLE001
            log(f"  {label} M={m} ({bm},{bn},{bk}): {type(e).__name__}")
            continue
        gbs = qt_bytes(n, k) / dt / 1e9
        tf = 2 * m * n * k / dt / 1e12
        log(f"  {label} M={m} ({bm},{bn},{bk}): {dt*1e6:7.1f} us "
            f"{gbs:5.0f} GB/s {tf:6.1f} TF/s")
        if dt < best[0]:
            best = (dt, (bm, bn, bk))
    return best


def qt_bytes(n, k):
    return n * k * 144 / 256  # Q4_K bytes


def main():
    key = jax.random.PRNGKey(0)

    # ---- 1+2: tile behavior per shape/M -------------------------------
    auto = [(256, None, None)]  # auto tiles marker handled below
    grid16 = [(16, bn, bk) for bn in (128, 256, 512, 1024)
              for bk in (2048, 4096)]
    grid64 = [(64, bn, bk) for bn in (128, 256, 512, 1024)
              for bk in (2048, 4096)]
    for name, (n, k) in SHAPES.items():
        qt = synth_q4k(key, n, k)
        # current production (auto tiles)
        for m in (1, 16, 64):
            x = jax.random.normal(key, (m, k), jnp.bfloat16)
            an, ak = dm._auto_tiles(m, n, k)
            dt = time_cfg(x, qt, min(256, m), an, ak)
            log(f"AUTO {name} M={m} (auto {an},{ak}): {dt*1e6:7.1f} us "
                f"{qt_bytes(n, k)/dt/1e9:5.0f} GB/s")
        if name == "head 151936x4096":
            continue  # sweep too expensive; auto is representative
        b16 = run_m(qt, n, k, 16, grid16, name)
        b64 = run_m(qt, n, k, 64, grid64, name)
        log(f"BEST {name}: M=16 {b16[0]*1e6:.1f}us {b16[1]} | "
            f"M=64 {b64[0]*1e6:.1f}us {b64[1]}")

    # ---- 3: dequant variants at the decode-critical shapes -------------
    orig = qf.dequant_tile

    def dq_nomin(t, p, dtype=jnp.float32):
        if t == qf.GGMLType.Q4_K:
            q = qf._unpack_sb_halves(p["q"]).astype(jnp.float32)
            sc = p["sc"].astype(jnp.int32).astype(jnp.float32)
            dl = qf._expand_rows(p["d"], 8) * sc
            return (q * qf._expand_rows(dl, 32)).astype(dtype)
        return orig(t, p, dtype)

    def dq_fold(t, p, dtype=jnp.float32):
        # (q - mr) * dl with mr = ml/dl on the SMALL [K/32,N] arrays:
        # one fewer full-size pass iff sub+mul fuse worse than this order
        if t == qf.GGMLType.Q4_K:
            q = qf._unpack_sb_halves(p["q"]).astype(jnp.float32)
            sc = p["sc"].astype(jnp.int32).astype(jnp.float32)
            mn = p["mn"].astype(jnp.int32).astype(jnp.float32)
            dl = qf._expand_rows(p["d"], 8) * sc
            ml = qf._expand_rows(p["dm"], 8) * mn
            mr = ml / jnp.where(dl == 0, 1.0, dl)
            return ((q - qf._expand_rows(mr, 32))
                    * qf._expand_rows(dl, 32)).astype(dtype)
        return orig(t, p, dtype)

    n, k = SHAPES["gateup 24576x4096"]
    qt = synth_q4k(key, n, k)
    for m in (1, 64):
        x = jax.random.normal(key, (m, k), jnp.bfloat16)
        an, ak = dm._auto_tiles(m, n, k)
        for nm, fn in (("prod", orig), ("nomin", dq_nomin),
                       ("fold", dq_fold)):
            dm.dequant_tile = fn
            dm.qmatmul_pallas.clear_cache()
            dt = time_cfg(x, qt, min(256, m), an, ak)
            log(f"VARIANT gateup M={m} {nm}: {dt*1e6:7.1f} us "
                f"{qt_bytes(n, k)/dt/1e9:5.0f} GB/s")
        dm.dequant_tile = orig
        dm.qmatmul_pallas.clear_cache()


if __name__ == "__main__":
    main()
