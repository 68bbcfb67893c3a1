"""Lookahead decoding example (reference examples/lookahead/lookahead.cpp):
draft-free speculation via Jacobi lookahead windows + n-gram verification.

Usage: python examples/lookahead.py -m model.gguf -p "prompt" -n 64
"""

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser("lookahead")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="Hello")
    ap.add_argument("-n", "--n-predict", type=int, default=64)
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    args = ap.parse_args(argv)

    import time

    from omni_tpu.core import GGUFReader
    from omni_tpu.models import qwen3
    from omni_tpu.runtime import Context, SamplerParams
    from omni_tpu.runtime.lookahead import lookahead_generate
    from omni_tpu.tokenizer import build_tokenizer

    reader = GGUFReader(args.model)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    ctx = Context(cfg, qwen3.load_params(reader), qwen3.forward, qwen3.embed,
                  n_ctx=args.ctx_size, sampler=SamplerParams(greedy=True))
    tok = build_tokenizer(reader.kv)

    prompt = np.asarray(tok.encode(args.prompt), np.int32)
    t0 = time.time()
    out, stats = lookahead_generate(ctx, prompt, max_new=args.n_predict)
    dt = time.time() - t0
    print(tok.decode(out))
    print(f"\nW/N/G rounds={stats.n_rounds} n_predict={stats.n_predict} "
          f"n_accept={stats.n_accept} ({len(out) / max(dt, 1e-9):.1f} tok/s)")


if __name__ == "__main__":
    main()
