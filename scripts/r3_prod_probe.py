"""Round-3 probe #2: TRUE per-step device time of the production Context
steps (decode bucket 1/16/64) and the omni decode scan, measured
differentially: time K1 vs K2 enqueued steps ending in ONE tiny fetch, so
the ~30 ms tunnel round-trip constant cancels exactly.

Everything in one process (axon run-to-run variance rules)."""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from omni_tpu.models import qwen3
from omni_tpu.runtime import Batch, Context, SamplerParams
from omni_tpu.testing_synth import QWEN3_8B, synth_qwen3_params


def log(m):
    print(m, file=sys.stderr, flush=True)


def fetch_scalar(logits):
    return float(np.asarray(logits[-1, :1])[0])


def run_steps(ctx, toks, n):
    out = None
    for _ in range(n):
        out, _ = ctx.decode(Batch(tokens=toks), block=False)
    return fetch_scalar(out)


def main():
    cfg = QWEN3_8B
    log("building synthetic 8B params...")
    params = synth_qwen3_params(cfg, fuse=True)
    jax.block_until_ready(params["layers"][-1]["w_down"].q)
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=4096,
                  sampler=SamplerParams(greedy=True))
    rng = np.random.default_rng(0)

    for tb in (64, 16, 1):
        toks = np.asarray(rng.integers(0, 1000, tb), np.int32)
        run_steps(ctx, toks, 2)  # compile + warm
        pairs = []
        for n in (4, 16):
            t0 = time.perf_counter()
            run_steps(ctx, toks, n)
            pairs.append(time.perf_counter() - t0)
        per = (pairs[1] - pairs[0]) / 12
        log(f"bucket {tb:3d}: per-step {per*1e3:8.2f} ms "
            f"({per/tb*1e3:6.2f} ms/token)  [t4={pairs[0]*1e3:.0f}ms "
            f"t16={pairs[1]*1e3:.0f}ms]")

    # omni decode scan (the served hot loop), differential over scan count
    from omni_tpu.runtime.loop import omni_decode_scan

    sp = ctx.sampler
    logits = jnp.zeros(cfg.vocab_size, jnp.float32)

    def run_scans(n):
        st_logits, pos, key, prev, done = (logits, jnp.int32(ctx.n_past.get(0, 0)),
                                           ctx.key, ctx.prev_tokens, None)
        packed = None
        for _ in range(n):
            packed, hid, st_logits, ctx.cache, key, prev, pos, done = \
                omni_decode_scan(ctx._forward, ctx._embed, ctx.cfg,
                                 ctx.params, ctx.cache, st_logits, pos,
                                 jnp.int32(0), key, prev, n_steps=10,
                                 sp=sp, end_ids=(), listen_id=-3,
                                 stop_after=jnp.int32(10), done_in=done)
        return float(np.asarray(packed[0])[0])

    run_scans(2)
    pairs = []
    for n in (2, 10):
        t0 = time.perf_counter()
        run_scans(n)
        pairs.append(time.perf_counter() - t0)
    per = (pairs[1] - pairs[0]) / 8
    log(f"omni scan (10 tok): {per*1e3:8.2f} ms ({per/10*1e3:6.2f} ms/token)")


if __name__ == "__main__" and (len(sys.argv) < 2):
    main()


def scan_ab():
    """A/B: omni_decode_scan kv_limit=None vs 512 (same process)."""
    import time
    import numpy as np
    import jax, jax.numpy as jnp
    from omni_tpu.models import qwen3
    from omni_tpu.runtime import Context, SamplerParams
    from omni_tpu.runtime.loop import omni_decode_scan
    from omni_tpu.testing_synth import QWEN3_8B, synth_qwen3_params

    cfg = QWEN3_8B
    params = synth_qwen3_params(cfg, fuse=True)
    jax.block_until_ready(params["layers"][-1]["w_down"].q)
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=2048,
                  sampler=SamplerParams(greedy=True))
    logits0 = jnp.zeros(cfg.n_vocab, jnp.float32)

    from omni_tpu.runtime.kv_cache import KVCache

    def fresh():
        return KVCache.create(cfg.n_layers, 2048, cfg.n_kv_heads,
                              cfg.head_dim, rope_base=cfg.rope_base)

    def run(n, kvl):
        cache = fresh()
        packed = None
        lg, pos, key, prev, done = (logits0, jnp.int32(0), ctx.key,
                                    ctx.prev_tokens, None)
        for _ in range(n):
            packed, hid, lg, cache, key, prev, pos, done = omni_decode_scan(
                qwen3.forward, qwen3.embed, cfg, params, cache, lg, pos,
                jnp.int32(0), key, prev, n_steps=10, sp=ctx.sampler,
                end_ids=(), listen_id=-3, stop_after=jnp.int32(10),
                done_in=done, kv_limit=kvl)
        return float(np.asarray(packed[0])[0])

    for kvl in (None, 512, 1024):
        run(2, kvl)
        ts = []
        for n in (2, 12):
            t0 = time.perf_counter(); run(n, kvl)
            ts.append(time.perf_counter() - t0)
        per = (ts[1] - ts[0]) / 100
        log(f"scan kv_limit={kvl}: {per*1e3:6.2f} ms/token")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "ab":
    scan_ab()
