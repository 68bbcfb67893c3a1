"""Long-context served decode: ms/token at 16k/32k KV pools, bf16 vs
int8 vs packed-int4 KV — the regime the reference's q8_0/q4_0-KV fattn
kernels exist for (/root/reference/ggml/src/ggml-cuda/CMakeLists.txt:57-63).

Methodology = bench.py (full 8B Q4_K model behind OmniPipeline's fused
scan), with the KV pool PRE-FILLED to near capacity by stamping cell
metadata (pos/seq arrays; content is timing-irrelevant), so every decode
step attends over the full pool through the ragged-KV bound.

Run: python scripts/longctx_bench.py [--ctx 2048,16384,32768]
     [--kv bf16,q8_0,q4_0]   (~20 min cold; one JSON line per config)
"""

import argparse
import dataclasses
import json
import os
import queue
import sys
import time

if os.path.exists("/tmp/lc_abort"):
    # graceful chain drain BEFORE `import jax`: even importing jax attaches
    # the tunnel plugin, and abandoned/killed clients wedge the remote side
    print("[longctx] lc_abort sentinel present - skipping", file=sys.stderr)
    sys.exit(0)

import numpy as np

import jax
import jax.numpy as jnp


def log(msg):
    print(f"[longctx {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


class _Tok:
    class _V:
        token_to_id: dict = {}
        eos_id = None

        @staticmethod
        def is_eog(tid):
            return False

    vocab = _V()

    def encode(self, text, add_special=False, parse_special=True):
        return [b % 1000 for b in text.encode()]

    def decode(self, ids):
        return "".join(chr(97 + int(i) % 26) for i in ids)


def run_config(params, cfg, n_ctx: int, kv: str, n_decode: int = 64,
               fill: int | None = None):
    from omni_tpu.models import qwen3
    from omni_tpu.omni.pipeline import OmniPipeline, SessionConfig
    from omni_tpu.runtime import Context, SamplerParams

    kv_dtype = {"bf16": jnp.bfloat16, "q8_0": jnp.int8,
                "q4_0": "q4_0"}[kv]
    llm = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=n_ctx,
                  kv_dtype=kv_dtype, sampler=SamplerParams(greedy=True))
    n_fill = (n_ctx - 512) if fill is None else fill
    # stamp the pool as occupied by seq 0 at positions 0..n_fill-1
    # (content zeros: decode timing depends only on the bucket size)
    pos = np.full(n_ctx, -1, np.int32)
    pos[:n_fill] = np.arange(n_fill)
    seqm = np.zeros(n_ctx, np.uint32)
    seqm[:n_fill] = 1
    llm.cache = dataclasses.replace(
        llm.cache, pos=jnp.asarray(pos), seq_mask=jnp.asarray(seqm))
    llm.n_past[0] = n_fill
    llm.cells_used = n_fill
    llm.kv_high = n_fill

    pipe = OmniPipeline(
        llm=llm, tokenizer=_Tok(),
        config=SessionConfig(duplex=False, use_tts=False,
                             max_preserved_context=n_ctx,
                             max_new_tokens=n_decode))
    pipe.stream_prefill(index=0, system_prompt="long context session")

    def drain():
        while True:
            try:
                pipe.text_out.get_nowait()
            except queue.Empty:
                break

    t0 = time.perf_counter()
    pipe.stream_decode(round_idx=0, max_new_tokens=32)  # compile + warm
    drain()
    log(f"  warm turn: {time.perf_counter() - t0:.1f} s")

    t0 = time.perf_counter()
    pipe.stream_decode(round_idx=1, max_new_tokens=n_decode)
    dt = time.perf_counter() - t0
    drain()
    ms = dt * 1e3 / n_decode
    del pipe, llm
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ctx", default="2048,16384,32768")
    ap.add_argument("--kv", default="bf16,q8_0,q4_0")
    ap.add_argument("--n-decode", type=int, default=64)
    ap.add_argument("--fill", type=int, default=None,
                    help="occupied cells before the turn (default ctx-512)")
    args = ap.parse_args()

    from omni_tpu.testing_synth import QWEN3_8B, synth_qwen3_params

    cfg = QWEN3_8B
    log("building synthetic 8B params...")
    params = synth_qwen3_params(cfg, fuse=True)
    jax.block_until_ready(params["layers"][-1]["w_down"].q)

    results = {}
    for n_ctx in (int(x) for x in args.ctx.split(",")):
        for kv in args.kv.split(","):
            log(f"ctx={n_ctx} kv={kv} ...")
            ms = run_config(params, cfg, n_ctx, kv,
                            n_decode=args.n_decode, fill=args.fill)
            results[(n_ctx, kv)] = ms
            log(f"ctx={n_ctx} kv={kv}: {ms:.2f} ms/token")
            print(json.dumps({
                "metric": f"llm_served_decode_ms_per_token_8b_q4k"
                          f"_ctx{n_ctx}_kv-{kv}",
                "value": round(ms, 3), "unit": "ms/token",
                "vs_baseline": round(38.0 / ms, 3)}), flush=True)
    log("summary: " + "; ".join(
        f"ctx{c}/{k}={v:.2f}" for (c, k), v in results.items()))


if __name__ == "__main__":
    main()
