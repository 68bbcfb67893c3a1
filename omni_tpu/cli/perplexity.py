"""omni-perplexity: WikiText-2-style perplexity evaluation.

Methodology of the reference (/root/reference/tools/perplexity/
perplexity.cpp:340-350): tokenize the corpus, split into n_ctx chunks,
evaluate each chunk, accumulate NLL only over the second half of each
chunk (positions >= max(n_ctx/2, 1)) so every scored token has context.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
import time

import numpy as np


def perplexity(ctx, tok, text: str, n_ctx: int = 512,
               max_chunks: int | None = None, log=print) -> dict:
    import jax
    import jax.numpy as jnp

    from ..runtime import Batch

    tokens = np.asarray(tok.encode(text, add_special=False), np.int32)
    n_chunks = len(tokens) // n_ctx
    if max_chunks:
        n_chunks = min(n_chunks, max_chunks)
    if n_chunks == 0:
        raise ValueError(f"need at least {n_ctx} tokens, got {len(tokens)}")

    first = max(n_ctx // 2, 1)
    nll, count = 0.0, 0
    t0 = time.time()
    for ci in range(n_chunks):
        chunk = tokens[ci * n_ctx : (ci + 1) * n_ctx]
        ctx.clear_kv()
        logits, _ = ctx.decode(Batch(tokens=chunk))
        logp = jax.nn.log_softmax(jnp.asarray(logits[:-1]), axis=-1)
        tgt = jnp.asarray(chunk[1:], jnp.int32)
        token_nll = -jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
        sel = np.asarray(token_nll)[first - 1 :]
        nll += float(sel.sum())
        count += len(sel)
        ppl = math.exp(nll / count)
        log(f"chunk {ci + 1}/{n_chunks}: ppl = {ppl:.4f} "
            f"({(time.time() - t0) / (ci + 1):.2f}s/chunk)")
    return {"ppl": math.exp(nll / count), "nll": nll / count,
            "n_tokens_scored": count, "n_chunks": n_chunks}


def save_logits(ctx, tok, text: str, out_path: str, n_ctx: int = 512,
                max_chunks: int | None = None) -> int:
    """Dump per-chunk log-probs of the scored positions for later
    KL-divergence comparison (reference --kl-divergence-base)."""
    import jax
    import jax.numpy as jnp

    from ..runtime import Batch

    tokens = np.asarray(tok.encode(text, add_special=False), np.int32)
    n_chunks = len(tokens) // n_ctx
    if max_chunks:
        n_chunks = min(n_chunks, max_chunks)
    first = max(n_ctx // 2, 1)
    rows = []
    for ci in range(n_chunks):
        chunk = tokens[ci * n_ctx: (ci + 1) * n_ctx]
        ctx.clear_kv()
        logits, _ = ctx.decode(Batch(tokens=chunk))
        logp = jax.nn.log_softmax(jnp.asarray(logits[:-1]), axis=-1)
        rows.append(np.asarray(logp)[first - 1:].astype(np.float16))
    np.savez_compressed(out_path, logp=np.concatenate(rows), n_ctx=n_ctx)
    return n_chunks


def kl_divergence(ctx, tok, text: str, base_path: str, n_ctx: int = 512,
                  max_chunks: int | None = None) -> dict:
    """Mean KL(base || model) over scored tokens + same-top-token rate
    (the reference's quantization-quality metric, perplexity.cpp)."""
    import jax
    import jax.numpy as jnp

    from ..runtime import Batch

    base = np.load(base_path)
    base_logp = base["logp"].astype(np.float32)
    assert int(base["n_ctx"]) == n_ctx, "base logits used a different n_ctx"

    tokens = np.asarray(tok.encode(text, add_special=False), np.int32)
    n_chunks = len(tokens) // n_ctx
    if max_chunks:
        n_chunks = min(n_chunks, max_chunks)
    first = max(n_ctx // 2, 1)
    kls, same_top = [], 0
    idx = 0
    for ci in range(n_chunks):
        chunk = tokens[ci * n_ctx: (ci + 1) * n_ctx]
        ctx.clear_kv()
        logits, _ = ctx.decode(Batch(tokens=chunk))
        logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits[:-1]),
                                             axis=-1))[first - 1:]
        b = base_logp[idx: idx + len(logp)]
        idx += len(logp)
        kls.append(np.sum(np.exp(b) * (b - logp), axis=-1))
        same_top += int((b.argmax(-1) == logp.argmax(-1)).sum())
    kl = np.concatenate(kls)
    return {"kl_mean": float(kl.mean()), "kl_max": float(kl.max()),
            "kl_p99": float(np.percentile(kl, 99)),
            "same_top_rate": same_top / len(kl), "n_tokens": len(kl)}


def main(argv=None):
    from .args import EnvArgumentParser

    ap = EnvArgumentParser("omni-perplexity")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-f", "--file", required=True, help="raw text corpus")
    ap.add_argument("-c", "--ctx-size", type=int, default=512)
    ap.add_argument("--chunks", type=int, default=None)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--save-logits", help="write base log-probs for later "
                                          "--kl-divergence comparison")
    ap.add_argument("--kl-divergence", dest="kl_base",
                    help="base logits file -> report KL instead of PPL")
    args = ap.parse_args(argv)

    from ..core import GGUFReader
    from ..models import qwen3
    from ..runtime import Context
    from ..tokenizer import build_tokenizer

    reader = GGUFReader(args.model)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    ctx = Context(cfg, qwen3.load_params(reader), qwen3.forward, qwen3.embed,
                  n_ctx=args.ctx_size)
    tok = build_tokenizer(reader.kv)
    text = open(args.file, encoding="utf-8").read()
    if args.save_logits:
        n = save_logits(ctx, tok, text, args.save_logits, args.ctx_size,
                        args.chunks)
        print(f"saved base logits for {n} chunks -> {args.save_logits}")
        return
    if args.kl_base:
        res = kl_divergence(ctx, tok, text, args.kl_base, args.ctx_size,
                            args.chunks)
        print(json.dumps(res) if args.json else
              f"KL mean {res['kl_mean']:.6f}  p99 {res['kl_p99']:.4f}  "
              f"same-top {res['same_top_rate']:.3f} over {res['n_tokens']} tokens")
        return
    res = perplexity(ctx, tok, text, args.ctx_size, args.chunks,
                     log=(lambda *a: None) if args.json else print)
    if args.json:
        print(json.dumps(res))
    else:
        print(f"Final estimate: PPL = {res['ppl']:.4f} over "
              f"{res['n_tokens_scored']} tokens")


if __name__ == "__main__":
    main()
