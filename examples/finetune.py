"""Finetuning example (reference ggml-opt + examples/training): full
fine-tune of a (tiny) Qwen3 on next-token prediction with optax AdamW,
sharded-ready via the same train_loss the multi-chip dryrun jits."""

import argparse

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seq", type=int, default=32)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from _common import load_model
    from omni_tpu.models import qwen3

    ctx, cfg, reader = load_model(args.model)
    # training needs dense differentiable weights
    params = qwen3.load_params(reader, keep_quantized=False)
    params = jax.tree.map(lambda x: x.astype(jnp.float32), params)

    opt = optax.adamw(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, tokens):
        loss, grads = jax.value_and_grad(qwen3.train_loss)(params, cfg, tokens)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    # toy corpus: a repeating pattern the model can memorize
    pattern = rng.integers(1, cfg.n_vocab, 8)
    data = np.tile(pattern, args.seq // 8 + 1)[: args.seq]

    losses = []
    for i in range(args.steps):
        tokens = jnp.asarray(np.stack([data] * args.batch), jnp.int32)
        params, opt_state, loss = step(params, opt_state, tokens)
        losses.append(float(loss))
        print(f"step {i}: loss {losses[-1]:.4f}")
    assert losses[-1] < losses[0], "loss must decrease on a memorizable corpus"
    print(f"finetune OK: {losses[0]:.4f} -> {losses[-1]:.4f}")
    return losses


if __name__ == "__main__":
    main()
