"""On-chip decode-attention sweep: XLA cache_attention vs flash_decode at
various block_s, bf16 + int8 KV, 2048/8192 pools (8B GQA geometry:
32 q heads / 8 kv heads / D=128, T=1).

Method per PERF rules: wrap the op in ONE jitted lax.scan (iters chained
through a dummy dependency) and fetch once — never sync per call.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from omni_tpu.kernels.attention import cache_attention  # noqa: E402
from omni_tpu.kernels.flash_attention import flash_decode  # noqa: E402

ITERS = 300


def timed_scan(fn, *args):
    """Run fn(*args) ITERS times inside one jitted scan; return µs/call."""

    @jax.jit
    def run(*a):
        def body(carry, _):
            out = fn(a[0] + carry * 0.0, *a[1:])
            return jnp.sum(out) * 1e-20, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    run(*args).block_until_ready()  # compile
    t0 = time.perf_counter()
    np.asarray(run(*args))
    return (time.perf_counter() - t0) / ITERS * 1e6


def main():
    hq, hkv, d, t = 32, 8, 128, 1
    rng = np.random.default_rng(0)
    for s in (2048, 8192):
        q = jnp.asarray(rng.standard_normal((t, hq, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((hkv, s, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((hkv, s, d)), jnp.bfloat16)
        mask = jnp.asarray(rng.random((t, s)) < 0.9)
        kv_mb = 2 * s * hkv * d * 2 / 1e6

        us = timed_scan(lambda qq: cache_attention(qq, k, v, mask), q)
        print(f"S={s} bf16 XLA: {us:8.1f} us  {kv_mb/us*1e3:6.0f} GB/s",
              flush=True)
        for bs in (512, 1024, 2048, 4096, 8192):
            if bs > s:
                continue
            us = timed_scan(
                lambda qq, bs=bs: flash_decode(qq, k, v, mask, block_s=bs), q)
            print(f"S={s} bf16 flash bs={bs}: {us:8.1f} us  "
                  f"{kv_mb/us*1e3:6.0f} GB/s", flush=True)

        k8 = jnp.asarray(rng.integers(-127, 127, (hkv, s, d)), jnp.int8)
        v8 = jnp.asarray(rng.integers(-127, 127, (hkv, s, d)), jnp.int8)
        ks = jnp.asarray(rng.random((hkv, s)), jnp.float32) * 0.01
        vs = jnp.asarray(rng.random((hkv, s)), jnp.float32) * 0.01
        kv_mb8 = kv_mb / 2
        for bs in (512, 2048, 4096):
            if bs > s:
                continue
            us = timed_scan(
                lambda qq, bs=bs: flash_decode(qq, k8, v8, mask, k_scale=ks,
                                               v_scale=vs, block_s=bs), q)
            print(f"S={s} int8 flash bs={bs}: {us:8.1f} us  "
                  f"{kv_mb8/us*1e3:6.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
