"""Retrieval example (reference examples/retrieval): chunk documents,
embed every chunk, then rank chunks by cosine similarity against a
query embedding."""

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--top-k", type=int, default=2)
    args = ap.parse_args(argv)

    from _common import load_model
    from embedding import embed

    ctx, cfg, _ = load_model(args.model)
    rng = np.random.default_rng(0)
    # synthetic "documents": token-id chunks (real use: tokenize files
    # split on a separator, reference retrieval.cpp chunking)
    chunks = [rng.integers(1, 100, rng.integers(4, 12)).astype(np.int32)
              for _ in range(6)]
    query = chunks[3][:5]  # overlapping prefix -> should rank chunk 3 high

    embds = np.stack([embed(ctx, c) for c in chunks])
    qv = embed(ctx, query)
    sims = embds @ qv
    order = np.argsort(-sims)
    print(f"query {query.tolist()}")
    for rank, i in enumerate(order[: args.top_k]):
        print(f"#{rank + 1}: chunk {i} (cos {sims[i]:+.4f}) "
              f"{chunks[i].tolist()}")
    assert order[0] == 3, "expected the overlapping chunk to rank first"
    return order


if __name__ == "__main__":
    main()
