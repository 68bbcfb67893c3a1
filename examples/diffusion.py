"""Diffusion-LM generation (reference examples/diffusion/diffusion-cli.cpp).

Masked-diffusion decoding for llada / dream / llada_moe GGUFs: start from
a fully-masked completion, iteratively re-evaluate the WHOLE sequence with
NON-CAUSAL attention, and per step unmask the positions whose predictions
are most confident (CONFIDENCE_BASED algorithm + TIMESTEP_BASED transfer
schedule, diffusion-cli.cpp:17-115). llada predicts shifted by one
({arch}.diffusion.shift_logits), dream predicts in place.

Runs standalone on a generated tiny llada-arch model; pass --model for a
real GGUF.
"""

import argparse
import os
import tempfile

import numpy as np


def make_tiny_llada(path: str) -> None:
    """Tiny llada-arch GGUF via the real HF->GGUF converter."""
    from omni_tpu.convert.hf_to_gguf import convert_llm

    rng = np.random.default_rng(0)
    d, nh, nkv, hd, ff, v, n_l = 32, 4, 2, 8, 64, 64, 2

    def w(*shape, s=0.08):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    st = {"model.transformer.wte.weight": w(v, d),
          "model.transformer.ln_f.weight": np.ones(d, np.float32),
          "model.transformer.ff_out.weight": w(v, d)}
    for i in range(n_l):
        p = f"model.transformer.blocks.{i}."
        st[p + "attn_norm.weight"] = np.ones(d, np.float32)
        st[p + "ff_norm.weight"] = np.ones(d, np.float32)
        st[p + "q_proj.weight"] = w(nh * hd, d)
        st[p + "k_proj.weight"] = w(nkv * hd, d)
        st[p + "v_proj.weight"] = w(nkv * hd, d)
        st[p + "attn_out.weight"] = w(d, nh * hd)
        st[p + "ff_proj.weight"] = w(ff, d)
        st[p + "up_proj.weight"] = w(ff, d)
        st[p + "ff_out.weight"] = w(d, ff)
    config = dict(d_model=d, n_heads=nh, n_kv_heads=nkv, n_layers=n_l,
                  mlp_hidden_size=ff, vocab_size=v,
                  max_sequence_length=128, rms_norm_eps=1e-5,
                  mask_token_id=v - 1, rope_theta=10000.0)
    convert_llm(st, config, path, arch="llada")


def diffusion_generate(ctx, prompt: np.ndarray, n_gen: int, steps: int,
                       mask_id: int, shift_logits: bool,
                       rng=None) -> np.ndarray:
    """Confidence-based masked-diffusion generation: per step, decode the
    full (prompt + masked completion) sequence bidirectionally, rank the
    still-masked positions by the max softmax probability of their
    prediction, and commit the top transfer_count of them
    (diffusion-cli.cpp CONFIDENCE_BASED + TIMESTEP_BASED)."""
    from omni_tpu.runtime import Batch

    eps = 1e-3
    seq = np.concatenate([prompt.astype(np.int32),
                          np.full(n_gen, mask_id, np.int32)])
    n = len(seq)
    pos = np.arange(n, dtype=np.int32)
    for step in range(steps):
        masked = np.flatnonzero(seq == mask_id)
        if masked.size == 0:
            break
        ctx.seq_rm(0)  # full re-eval each step (no causal cache reuse)
        logits, _ = ctx.decode(Batch(tokens=seq, pos=pos,
                                     seq_id=np.zeros(n, np.int32)))
        logits = np.asarray(logits)
        # llada's head predicts position i from row i-1
        rows = masked - 1 if shift_logits else masked
        lg = logits[rows]
        p = np.exp(lg - lg.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        cand = p.argmax(-1)
        conf = p[np.arange(len(masked)), cand]
        # TIMESTEP_BASED schedule (diffusion-cli.cpp:105-110)
        t = 1.0 - step / steps
        s = 1.0 - (step + 1) / steps
        p_tr = 1.0 if step == steps - 1 else (1.0 - s / t)
        n_tr = max(1, int(masked.size * p_tr))
        take = np.argsort(-conf)[:n_tr]
        seq[masked[take]] = cand[take]
    return seq[len(prompt):]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--n-gen", type=int, default=12)
    args = ap.parse_args(argv)

    from omni_tpu.core import GGUFReader
    from omni_tpu.models import qwen3
    from omni_tpu.runtime import Context, SamplerParams

    path = args.model
    if path is None:
        path = os.path.join(tempfile.mkdtemp(), "llada.gguf")
        make_tiny_llada(path)
    reader = GGUFReader(path)
    arch = reader.kv["general.architecture"]
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert not cfg.causal, "diffusion generation needs a non-causal arch"
    mask_id = int(reader.kv.get("tokenizer.ggml.mask_token_id",
                                cfg.n_vocab - 1))
    shift = bool(reader.kv.get(f"{arch}.diffusion.shift_logits", False))
    params = qwen3.load_params(reader)
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=128,
                  sampler=SamplerParams(greedy=True))

    prompt = np.array([3, 11, 7, 29], np.int32)
    out = diffusion_generate(ctx, prompt, args.n_gen, args.steps,
                             mask_id, shift)
    assert len(out) == args.n_gen
    assert not np.any(out == mask_id), "all positions must be unmasked"
    print("diffusion output:", out.tolist())
    return out


if __name__ == "__main__":
    main()
