"""Self-extend long-context demo (reference examples/passkey:133-139).

A model with context window W handles a prompt LONGER than W by grouped
attention: after each prefill chunk, seq_div compresses cached positions by
a factor g (keeping n_keep intact), so effective positions stay inside the
trained window. The demo hides a passkey early in a long filler prompt and
checks the model still attends to it (here: KV bookkeeping invariants on a
tiny model — real retrieval needs a trained model)."""

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--grp-attn-n", type=int, default=4)
    ap.add_argument("--grp-attn-w", type=int, default=64)
    args = ap.parse_args(argv)

    from _common import load_model

    g, w = args.grp_attn_n, args.grp_attn_w
    ctx, cfg, _ = load_model(args.model, n_ctx=512)

    rng = np.random.default_rng(0)
    passkey = [7, 42, 99]
    prompt = np.concatenate([
        np.array(passkey, np.int32),
        rng.integers(1, cfg.n_vocab, 300).astype(np.int32),
    ])

    # chunked prefill with self-extend position grouping (passkey.cpp loop)
    n_past = 0
    chunk = w
    for i in range(0, len(prompt), chunk):
        part = prompt[i:i + chunk]
        from omni_tpu.runtime import Batch

        ctx.decode(Batch(tokens=part,
                         pos=np.arange(n_past, n_past + len(part), dtype=np.int32),
                         seq_id=np.zeros(len(part), np.int32)))
        n_past += len(part)
        if n_past > w:
            # group the window we just wrote: positions [n_past-w, n_past) /= g
            ctx.seq_div(0, n_past - w, n_past, g)
            import jax.numpy as jnp

            n_past = int(ctx.cache.seq_pos_max(0)) + 1
            ctx.n_past[0] = n_past

    max_pos = int(ctx.cache.seq_pos_max(0))
    print(f"prefilled {len(prompt)} tokens; max cached position {max_pos} "
          f"(ungrouped would be {len(prompt) - 1})")
    assert max_pos < len(prompt) - 1, "grouping must compress positions"

    out = []
    tok = 1
    for _ in range(8):
        from omni_tpu.runtime import Batch

        logits, _ = ctx.decode(Batch(tokens=np.array([tok], np.int32),
                                     pos=np.array([n_past], np.int32),
                                     seq_id=np.array([0], np.int32)))
        n_past += 1
        tok = int(np.argmax(np.asarray(logits[0])))
        out.append(tok)
    print("decoded after self-extend:", out)
    return max_pos


if __name__ == "__main__":
    main()
