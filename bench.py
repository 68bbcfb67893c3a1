"""Headline benchmark: Qwen3-8B Q4_K decode latency on one TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's published LLM decode latency on RTX 4090 F16,
~38 ms/token (/root/reference/README.md:72; BASELINE.md). vs_baseline is
the speedup factor (baseline_ms / our_ms; >1 = faster than the reference).

Methodology: full 8B-shaped model (36 layers, GQA 32/8, ffn 12288, vocab
151748) with Q4_K weights in the fused-kernel layout, KV cache 2048 cells;
64-token prompt prefill, then 128 greedy decode steps as ONE on-device
lax.scan (no host round-trips, matching production decode). Wall time of
the scan / 128 = ms/token. Synthetic weights: throughput of dense decode is
content-independent.
"""

import json
import time

import numpy as np

BASELINE_MS_PER_TOKEN = 38.0  # reference README.md:72 (RTX 4090, F16)


def main():
    import jax
    import jax.numpy as jnp

    from omni_tpu.models import qwen3
    from omni_tpu.runtime.kv_cache import KVCache
    from omni_tpu.runtime.loop import decode_scan
    from omni_tpu.testing_synth import QWEN3_8B, synth_qwen3_params

    cfg = QWEN3_8B
    n_ctx = 2048
    n_prefill = 64
    n_decode = 128

    import sys

    def log(msg):
        print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr)

    log("building synthetic 8B params...")
    params = synth_qwen3_params(cfg, fuse=True)
    jax.block_until_ready(params["layers"][-1]["w_down"].q)
    log("params on device")
    cache = KVCache.create(cfg.n_layers, n_ctx, cfg.n_kv_heads, cfg.head_dim,
                           dtype=jnp.bfloat16, rope_base=cfg.rope_base)

    # ---- prefill (one jitted call) ----
    @jax.jit
    def prefill(params, cache, tokens):
        x = qwen3.embed(params, tokens)
        pos = jnp.arange(tokens.shape[0], dtype=jnp.int32)
        seq = jnp.zeros_like(pos)
        slots = cache.find_slots(tokens.shape[0])
        logits, _, cache = qwen3.forward(params, cfg, x, pos, seq, cache, slots)
        return jnp.argmax(logits[-1]).astype(jnp.int32), cache

    rng = np.random.default_rng(0)
    prompt = jnp.asarray(rng.integers(0, 1000, n_prefill), jnp.int32)

    t0 = time.perf_counter()
    first, cache = prefill(params, cache, prompt)
    first.block_until_ready()
    prefill_ms = (time.perf_counter() - t0) * 1e3  # includes compile
    log(f"prefill (incl. compile): {prefill_ms:.0f} ms")

    args = dict(
        forward=qwen3.forward, embed=qwen3.embed, cfg=cfg,
        n_steps=n_decode, greedy=True,
    )
    key = jax.random.PRNGKey(0)

    # compile + warm run
    toks, _, _, cache, key = decode_scan(
        params=params, cache=cache, first_token=first,
        start_pos=jnp.int32(n_prefill), seq_id=jnp.int32(0), key=key, **args)
    np.asarray(toks)
    log("decode scan compiled + warm")

    # timed run (cache was donated; continue from returned state)
    t0 = time.perf_counter()
    toks, _, _, cache, key = decode_scan(
        params=params, cache=cache, first_token=jnp.int32(1),
        start_pos=jnp.int32(n_prefill + n_decode), seq_id=jnp.int32(0),
        key=key, **args)
    np.asarray(toks)  # host fetch forces completion
    dt = time.perf_counter() - t0
    ms_per_token = dt * 1e3 / n_decode

    print(json.dumps({
        "metric": "llm_decode_ms_per_token_8b_q4k",
        "value": round(ms_per_token, 3),
        "unit": "ms/token",
        "vs_baseline": round(BASELINE_MS_PER_TOKEN / ms_per_token, 3),
    }))


if __name__ == "__main__":
    main()
