"""Parallel-decode benchmark grid (reference tools/batched-bench):
B x PP x TG matrix — for each batch size B, prefill PP tokens per sequence,
then decode TG tokens for all B sequences per step; report tok/s."""

import argparse
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--pp", type=int, nargs="+", default=[16])
    ap.add_argument("--tg", type=int, nargs="+", default=[8])
    ap.add_argument("--b", type=int, nargs="+", default=[1, 2, 4])
    args = ap.parse_args(argv)

    from _common import load_model
    from omni_tpu.runtime import Batch

    rows = []
    print(f"{'B':>3} {'PP':>5} {'TG':>5} {'pp t/s':>9} {'tg t/s':>9}")
    for b in args.b:
        for pp in args.pp:
            for tg in args.tg:
                ctx, cfg, _ = load_model(args.model, n_ctx=max(1024, b * (pp + tg)))
                rng = np.random.default_rng(0)
                t0 = time.time()
                for s in range(b):
                    toks = rng.integers(1, cfg.n_vocab, pp).astype(np.int32)
                    ctx.decode(Batch(tokens=toks,
                                     pos=np.arange(pp, dtype=np.int32),
                                     seq_id=np.full(pp, s, np.int32)))
                t_pp = time.time() - t0

                last = np.ones(b, np.int32)
                t0 = time.time()
                for step in range(tg):
                    logits, _ = ctx.decode(Batch(
                        tokens=last,
                        pos=np.full(b, pp + step, np.int32),
                        seq_id=np.arange(b, dtype=np.int32)))
                    last = np.argmax(np.asarray(logits), axis=-1).astype(np.int32)
                t_tg = time.time() - t0
                row = (b, pp, tg, b * pp / max(t_pp, 1e-9),
                       b * tg / max(t_tg, 1e-9))
                rows.append(row)
                print(f"{b:>3} {pp:>5} {tg:>5} {row[3]:>9.1f} {row[4]:>9.1f}")
    return rows


if __name__ == "__main__":
    main()
