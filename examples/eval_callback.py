"""Per-op tracing demo (reference examples/eval-callback): dump summary
statistics for every intermediate tensor of one forward pass."""

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    args = ap.parse_args(argv)

    from _common import load_model
    from omni_tpu.runtime.trace import trace_qwen3

    ctx, cfg, _ = load_model(args.model)
    entries = trace_qwen3(ctx.params, cfg, np.array([1, 2, 3, 4], np.int32))
    for e in entries:
        print(e)
    print(f"{len(entries)} tensors traced")
    assert all(np.isfinite([e.mean, e.std, e.absmax]).all() for e in entries)
    return entries


if __name__ == "__main__":
    main()
