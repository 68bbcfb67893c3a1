"""State save/load determinism (reference examples/save-load-state):
generate, snapshot mid-stream, keep generating; restore the snapshot into a
FRESH context and verify the continuation is identical."""

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    args = ap.parse_args(argv)

    from _common import load_model

    prompt = np.array([5, 9, 2, 7], np.int32)

    ctx, cfg, reader = load_model(args.model)
    first = ctx.generate(prompt, max_new=4)
    blob = ctx.state_bytes()
    cont_a = ctx.generate(np.array(first[-1:], np.int32), max_new=6)

    ctx2, _, _ = load_model(args.model) if args.model else (None, None, None)
    if ctx2 is None:  # tiny-model mode: rebuild from the same reader
        from omni_tpu.models import qwen3
        from omni_tpu.runtime import Context, SamplerParams

        ctx2 = Context(cfg, qwen3.load_params(reader), qwen3.forward,
                       qwen3.embed, n_ctx=256,
                       sampler=SamplerParams(greedy=True))
    ctx2.load_state_bytes(blob)
    cont_b = ctx2.generate(np.array(first[-1:], np.int32), max_new=6)

    print(f"original continuation: {cont_a}")
    print(f"restored continuation: {cont_b}")
    assert cont_a == cont_b, "state restore must reproduce generation"
    print("state save/load OK")
    return cont_a


if __name__ == "__main__":
    main()
