"""Minimal decode loop (reference examples/simple): prefill a prompt,
greedy-decode N tokens, print ids and timing."""

import argparse
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--n-new", type=int, default=16)
    args = ap.parse_args(argv)

    from _common import load_model

    ctx, cfg, _ = load_model(args.model)
    prompt = np.array([1, 2, 3, 4, 5], np.int32)
    t0 = time.time()
    out = ctx.generate(prompt, max_new=args.n_new)
    dt = time.time() - t0
    print(f"prompt={prompt.tolist()} -> {out}")
    print(f"{len(out)} tokens in {dt * 1e3:.0f} ms "
          f"({len(out) / max(dt, 1e-9):.1f} tok/s)")
    return out


if __name__ == "__main__":
    main()
