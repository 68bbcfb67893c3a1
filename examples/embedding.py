"""Embedding example (reference examples/embedding): mean-pooled,
L2-normalized decoder hidden states for a batch of prompts, plus the
pairwise cosine-similarity matrix."""

import argparse

import numpy as np


def embed(ctx, tokens: np.ndarray) -> np.ndarray:
    """Mean-pooled decoder embedding (the server /embedding contract for
    decoder models)."""
    from omni_tpu.runtime import Batch

    seq = 31  # scratch sequence
    _, hidden = ctx.decode(Batch(
        tokens=np.asarray(tokens, np.int32),
        pos=np.arange(len(tokens), dtype=np.int32),
        seq_id=np.full(len(tokens), seq, np.int32)), return_hidden=True)
    ctx.seq_rm(seq, -1, -1)
    ctx.n_past.pop(seq, None)
    v = np.asarray(hidden, np.float32).mean(axis=0)
    return v / max(np.linalg.norm(v), 1e-12)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    args = ap.parse_args(argv)

    from _common import load_model

    ctx, cfg, _ = load_model(args.model)
    prompts = [np.array([1, 2, 3, 4], np.int32),
               np.array([1, 2, 3, 5], np.int32),
               np.array([9, 8, 7], np.int32)]
    vecs = np.stack([embed(ctx, p) for p in prompts])
    print(f"{len(prompts)} embeddings of dim {vecs.shape[1]}")
    sim = vecs @ vecs.T
    for i, row in enumerate(sim):
        print(f"prompt {i}: " + " ".join(f"{s:+.3f}" for s in row))
    return vecs


if __name__ == "__main__":
    main()
