"""omni-bench: prompt-processing / token-generation throughput grid.

Counterpart of llama-bench (/root/reference/tools/llama-bench/
llama-bench.cpp): pp (batch prefill tokens/s) and tg (autoregressive
decode tokens/s) over configurable sizes, printed as a table + JSON lines.
Decode runs as one on-device lax.scan so dispatch overhead doesn't pollute
the measurement (runtime/loop.py).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def bench_model(ctx_factory, cfg, params, pp_sizes, tg_sizes, reps=3):
    import jax
    import jax.numpy as jnp

    from ..models import qwen3
    from ..runtime import Batch
    from ..runtime.kv_cache import KVCache
    from ..runtime.loop import decode_scan

    results = []
    for pp in pp_sizes:
        ctx = ctx_factory()
        toks = np.random.default_rng(0).integers(0, min(1000, cfg.n_vocab),
                                                 pp).astype(np.int32)
        ctx.decode(Batch(tokens=toks))  # compile
        times = []
        for _ in range(reps):
            ctx.clear_kv()
            t0 = time.perf_counter()
            logits, _ = ctx.decode(Batch(tokens=toks))
            np.asarray(logits[-1])
            times.append(time.perf_counter() - t0)
        dt = min(times)
        results.append({"test": f"pp{pp}", "tokens_per_sec": pp / dt,
                        "ms": dt * 1e3})

    for tg in tg_sizes:
        ctx = ctx_factory()
        cache = ctx.cache
        key = jax.random.PRNGKey(0)
        args = dict(forward=qwen3.forward, embed=qwen3.embed, cfg=cfg,
                    n_steps=tg, greedy=True)
        toks, _, _, cache, key = decode_scan(
            params=params, cache=cache, first_token=jnp.int32(1),
            start_pos=jnp.int32(0), seq_id=jnp.int32(0), key=key, **args)
        np.asarray(toks)  # compile+warm
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            toks, _, _, cache, key = decode_scan(
                params=params, cache=cache, first_token=jnp.int32(1),
                start_pos=jnp.int32(tg), seq_id=jnp.int32(0), key=key, **args)
            np.asarray(toks)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        results.append({"test": f"tg{tg}", "tokens_per_sec": tg / dt,
                        "ms_per_token": dt * 1e3 / tg})
    return results


def main(argv=None):
    ap = argparse.ArgumentParser("omni-bench")
    ap.add_argument("-m", "--model", help="GGUF path (omitted = synthetic 8B)")
    ap.add_argument("-p", "--pp", type=int, nargs="*", default=[128, 512])
    ap.add_argument("-n", "--tg", type=int, nargs="*", default=[64])
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("-r", "--reps", type=int, default=3)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from ..models import qwen3
    from ..runtime import Context

    if args.model:
        from ..core import GGUFReader

        reader = GGUFReader(args.model)
        cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
        params = qwen3.load_params(reader)
    else:
        from ..testing_synth import QWEN3_8B, synth_qwen3_params

        cfg = QWEN3_8B
        params = synth_qwen3_params(cfg)
        print("# no model given: synthetic Qwen3-8B Q4_K weights")

    def factory():
        return Context(cfg, params, qwen3.forward, qwen3.embed,
                       n_ctx=args.ctx_size)

    results = bench_model(factory, cfg, params, args.pp, args.tg, args.reps)
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
