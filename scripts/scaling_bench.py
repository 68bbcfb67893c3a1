#!/usr/bin/env python
"""Scaling-efficiency harness: decode tokens/s at 1 device vs N devices.

Measures the BASELINE.md north-star metric "≥85% scaling efficiency at
2 hosts" the reference has no harness for (its rpc path is benchmarked
only by hand via `llama-bench -rpc`,
/root/reference/tools/llama-bench/llama-bench.cpp:409).

Topology matches the serving design (parallel/distributed.py): dp = one
independent serving context per device group, nothing shared — so ideal
scaling is linear in dp and the measured number is the real overhead of
running N contexts side by side (dispatch contention, host work). Each dp
worker runs the fused decode scan (runtime/loop.py decode_scan) in its own
thread against its own device.

On real multi-chip/multi-host hardware this reports the production
number; on a virtual CPU mesh (default here: the devices share one host
CPU) it is a correctness-grade harness check, flagged in the output.

Prints one JSON line:
  {"tokens_per_s_1": ..., "tokens_per_s_N": ..., "n": N,
   "scaling_efficiency": ..., "correctness_grade": bool}
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time

# self-contained: runnable without an installed omni_tpu package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=2,
                    help="dp width to compare against 1 device")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--cpu", action="store_true",
                    help="force the virtual CPU platform")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", max(args.devices, 2))

    import jax.numpy as jnp

    from omni_tpu.core import GGMLType, GGUFReader
    from omni_tpu.models import qwen3
    from omni_tpu.runtime.kv_cache import KVCache
    from omni_tpu.runtime.loop import decode_scan
    from omni_tpu.testing import write_tiny_qwen3

    devices = jax.devices()
    n = min(args.devices, len(devices))
    if n < 2:
        print(json.dumps({"error": "need >=2 devices"}))
        return 1

    path = tempfile.mktemp(suffix=".gguf")
    write_tiny_qwen3(path, n_layers=args.layers, d_model=256, n_heads=4,
                     n_kv_heads=2, head_dim=64, d_ff=512, n_vocab=512,
                     qtype=GGMLType.Q8_0, tied_head=False)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    base_params = qwen3.load_params(reader)

    def make_worker(dev):
        params = jax.device_put(base_params, dev)
        cache = jax.device_put(
            KVCache.create(cfg.n_layers, 256, cfg.n_kv_heads, cfg.head_dim,
                           rope_base=cfg.rope_base), dev)
        first = jax.device_put(jnp.int32(1), dev)
        zero = jax.device_put(jnp.int32(0), dev)
        key = jax.device_put(jax.random.PRNGKey(0), dev)
        state = {"cache": cache, "key": key}

        def run():
            toks, _, _, state["cache"], state["key"] = decode_scan(
                qwen3.forward, qwen3.embed, cfg, params, state["cache"],
                first, zero, zero, state["key"], args.steps)
            return toks

        return run

    # build + warm all workers (compile once per device)
    workers = [make_worker(d) for d in devices[:n]]
    for w in workers:
        jax.block_until_ready(w())

    def timed(fns):
        barrier = threading.Barrier(len(fns))
        outs = [None] * len(fns)

        def go(i):
            barrier.wait()
            outs[i] = fns[i]()

        threads = [threading.Thread(target=go, args=(i,))
                   for i in range(len(fns))]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        jax.block_until_ready(outs)
        return time.perf_counter() - t0

    # median of 3 for both configs
    t1 = min(timed(workers[:1]) for _ in range(3))
    tn = min(timed(workers) for _ in range(3))

    tps1 = args.steps / t1
    tpsn = n * args.steps / tn
    eff = tpsn / (n * tps1)
    rec = {
        "tokens_per_s_1": round(tps1, 1),
        "tokens_per_s_N": round(tpsn, 1),
        "n": n,
        "scaling_efficiency": round(eff, 3),
        "correctness_grade": devices[0].platform == "cpu",
        "platform": devices[0].platform,
    }
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
