"""Probe: does the mmvq (int8-activation) design point map onto the MXU?

The CUDA reference's mmvq.cu quantizes activations to q8_1 per-32 groups
and does integer dots with per-group scale combination in registers. On
TPU the per-group scales are inseparable from a full-K MXU contraction;
the only exact formulation is a G-BATCHED depth-32 integer dot
  P[g, n] = sum_j xq[g, j] * q[g, j, n]   (int8 x int8 -> int32)
followed by a small scale-combine  out[n] = sum_g dl[g, n] * P[g, n].
This probe measures (a) whether Mosaic lowers batched int8 dot_general
inside a Pallas kernel at all, and (b) what bandwidth the resulting
kernel reaches vs the production dequant-to-bf16 kernel, on the gate/up
decode shape (24576 x 4096, M=1). Outcome lands in docs/PERF.md.
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def int8_group_kernel(xq_ref, q_ref, dl_ref, o_ref, acc_ref, *, nk):
    kk = pl.program_id(1)

    @pl.when(kk == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[...]  # [TK, TN] int8
    xq = xq_ref[...]  # [TK//32, 32] int8 (groups on sublanes)
    tk, tn = q.shape
    g = tk // 32
    qg = q.reshape(g, 32, tn)
    # batched integer dot: [G, 1, 32] x [G, 32, TN] -> [G, 1, TN]
    p = jax.lax.dot_general(
        xq.reshape(g, 1, 32), qg,
        (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32)
    dl = dl_ref[...]  # [G, TN] f32 (w-group scale x x-group scale folded)
    acc_ref[...] += jnp.sum(p[:, 0, :].astype(jnp.float32) * dl,
                            axis=0, keepdims=True)

    @pl.when(kk == nk - 1)
    def _():
        o_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("bn", "bk"))
def int8_group_matvec(xq, q, dl, bn, bk):
    k2, n = q.shape
    grid = (n // bn, k2 // bk)
    return pl.pallas_call(
        functools.partial(int8_group_kernel, nk=grid[1]),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bk // 32, 32), lambda j, kk: (kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 32, bn), lambda j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn), lambda j, kk: (0, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, bn), jnp.float32)],
    )(xq, q, dl)


def main():
    n, k = 24576, 4096
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(-8, 8, (k, n)), jnp.int8)
    xq = jnp.asarray(rng.integers(-127, 127, (k // 32, 32)), jnp.int8)
    dl = jnp.asarray(rng.standard_normal((k // 32, n)), jnp.float32)

    # correctness vs dense reference
    ref = (np.asarray(xq, np.float32).reshape(-1)[None, :]
           @ (np.asarray(q, np.float32)
              * np.repeat(np.asarray(dl), 32, axis=0)))
    for bn, bk in ((512, 4096), (1024, 2048), (1024, 4096), (2048, 4096)):
        try:
            out = int8_group_matvec(xq, q, dl, bn, bk)
            out.block_until_ready()
        except Exception as e:  # noqa: BLE001
            print(f"bn{bn} bk{bk}: LOWERING FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        err = np.abs(np.asarray(out) - ref).max() / np.abs(ref).max()
        # timed: one scan of 100 calls; the input must depend on the carry
        # or XLA hoists the loop-invariant kernel out of the scan
        @jax.jit
        def loop(xq):
            def step(c, _):
                bump = jnp.where(c > 1e30, jnp.int8(1), jnp.int8(0))
                y = int8_group_matvec(xq + bump, q, dl, bn, bk)
                return c + y[0, 0] * 1e-12, ()
            return jax.lax.scan(step, jnp.float32(0), None, length=100)[0]

        float(loop(xq))  # compile + warm (axon: block_until_ready no-ops)
        t0 = time.perf_counter()
        float(loop(xq))
        dt = (time.perf_counter() - t0) / 100
        gbs = (q.size + dl.size * 4 + xq.size) / dt / 1e9
        print(f"bn{bn} bk{bk}: {dt * 1e6:.0f} us, {gbs:.0f} GB/s, "
              f"rel err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
