"""omni-imatrix: importance-matrix capture for quantization calibration.

Counterpart of the reference's tools/imatrix (1.3k LoC): run calibration
text through the model and accumulate, for every linear weight, the mean
square of its INPUT activations per input channel. llama-quant consumes
these as per-channel weights in the quantizer's scale search; our
quants.quantize(qweights=...) plays that role.

TPU-first shape: the capture pass is one jitted function per ubatch that
returns the Σx² vectors for all tap points alongside nothing else — no
eval-callback hooks into the graph (XLA would not allow them anyway).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp

from ..core import GGMLType, GGUFReader, GGUFWriter
from ..kernels.norms import rms_norm
from ..kernels.dequant_matmul import matmul
from ..models import qwen3


def capture_sums(params: dict, cfg: qwen3.Qwen3Config,
                 tokens: np.ndarray) -> tuple[dict[str, np.ndarray], int]:
    """One causal pass over `tokens` [T]; returns {gguf_weight_name: sum_x2
    [K]} for every 2-D weight input tap, plus the token count.

    Tap points mirror llm_build_qwen3's matmul inputs: attn_norm output
    (wq/wk/wv), attention output (wo), ffn_norm output (gate/up), the
    SwiGLU product (down), and the final norm output (output head).
    """
    t = int(tokens.shape[0])

    @jax.jit
    def run(params, toks):
        x = qwen3.embed(params, toks)
        pos = jnp.arange(t, dtype=jnp.int32)
        causal = jnp.tril(jnp.ones((t, t), bool))
        sums: dict[str, jax.Array] = {}

        def tap(name, v):
            sums[name] = jnp.sum(v.astype(jnp.float32) ** 2, axis=0)

        h = x.astype(jnp.bfloat16)
        for li, lp in enumerate(params["layers"]):
            h_in = h
            hn = rms_norm(h, lp["attn_norm"], cfg.rms_eps)
            for w in ("attn_q", "attn_k", "attn_v"):
                tap(f"blk.{li}.{w}.weight", hn)
            q = matmul(hn, lp["wq"]).reshape(t, cfg.n_heads, cfg.head_dim)
            k = matmul(hn, lp["wk"]).reshape(t, cfg.n_kv_heads, cfg.head_dim)
            v = matmul(hn, lp["wv"]).reshape(t, cfg.n_kv_heads, cfg.head_dim)
            if lp["q_norm"] is not None:
                q = rms_norm(q, lp["q_norm"], cfg.rms_eps)
            if lp["k_norm"] is not None:
                k = rms_norm(k, lp["k_norm"], cfg.rms_eps)
            from ..kernels.rope import apply_rope

            pos_b = pos
            q = apply_rope(q, pos_b, cfg.rope_base)
            k = apply_rope(k, pos_b, cfg.rope_base)
            g = cfg.n_heads // cfg.n_kv_heads
            qg = q.reshape(t, cfg.n_kv_heads, g, cfg.head_dim)
            scores = jnp.einsum("thgd,shd->hgts", qg, k,
                                preferred_element_type=jnp.float32)
            scores = scores / (cfg.head_dim ** 0.5)
            scores = jnp.where(causal[None, None], scores, -1e30)
            p = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
            attn = jnp.einsum("hgts,shd->thgd", p, v,
                              preferred_element_type=jnp.float32)
            attn = attn.reshape(t, -1).astype(jnp.bfloat16)
            tap(f"blk.{li}.attn_output.weight", attn)
            h = h_in + matmul(attn, lp["wo"])

            h_in = h
            hn = rms_norm(h, lp["ffn_norm"], cfg.rms_eps)
            tap(f"blk.{li}.ffn_gate.weight", hn)
            tap(f"blk.{li}.ffn_up.weight", hn)
            gate = matmul(hn, lp["w_gate"])
            up = matmul(hn, lp["w_up"])
            act = (jax.nn.silu(gate.astype(jnp.float32)).astype(jnp.bfloat16)
                   * up)
            tap(f"blk.{li}.ffn_down.weight", act)
            h = h_in + matmul(act, lp["w_down"])

        hidden = rms_norm(h, params["output_norm"], cfg.rms_eps)
        tap("output.weight", hidden)
        return sums

    out = run(params, jnp.asarray(tokens, jnp.int32))
    return {k: np.asarray(v) for k, v in out.items()}, t


def accumulate(model_path: str, token_chunks: list[np.ndarray]) -> dict:
    reader = GGUFReader(model_path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader)
    total: dict[str, np.ndarray] = {}
    n_tokens = 0
    for chunk in token_chunks:
        sums, t = capture_sums(params, cfg, np.asarray(chunk, np.int32))
        n_tokens += t
        for k, v in sums.items():
            total[k] = total.get(k, 0.0) + v
    return {"sums": total, "n_tokens": n_tokens}


def save_imatrix(path: str, data: dict) -> None:
    """Persist as a GGUF: tensor `<weight>.in_sum2` per tap + token count."""
    w = GGUFWriter(path)
    w.add_kv("general.architecture", "imatrix")
    w.add_kv("imatrix.n_tokens", int(data["n_tokens"]))
    for name, v in sorted(data["sums"].items()):
        w.add_tensor(name + ".in_sum2", np.asarray(v, np.float32))
    w.write()


def load_imatrix(path: str) -> dict[str, np.ndarray]:
    """-> {weight_name: mean_x2 [K]} (normalized by token count)."""
    r = GGUFReader(path)
    n = max(int(r.kv.get("imatrix.n_tokens", 1)), 1)
    out = {}
    for name, ti in r.tensors.items():
        if name.endswith(".in_sum2"):
            out[name[: -len(".in_sum2")]] = (
                np.asarray(ti.data, np.float32).reshape(-1) / n)
    return out


def main(argv=None):
    from .args import EnvArgumentParser

    ap = EnvArgumentParser("omni-imatrix")
    ap.add_argument("model")
    ap.add_argument("text", help="calibration text file")
    ap.add_argument("-o", "--output", default="imatrix.gguf")
    ap.add_argument("--chunk", type=int, default=512)
    ap.add_argument("--max-chunks", type=int, default=32)
    args = ap.parse_args(argv)

    from ..tokenizer import build_tokenizer

    reader = GGUFReader(args.model)
    tok = build_tokenizer(reader.kv)
    text = open(args.text, encoding="utf-8").read()
    ids = np.asarray(tok.encode(text), np.int32)
    chunks = [ids[i:i + args.chunk]
              for i in range(0, len(ids) - 1, args.chunk)][: args.max_chunks]
    print(f"capturing over {len(chunks)} chunks x {args.chunk} tokens",
          file=sys.stderr)
    data = accumulate(args.model, chunks)
    save_imatrix(args.output, data)
    print(f"wrote {args.output}: {len(data['sums'])} taps, "
          f"{data['n_tokens']} tokens")


if __name__ == "__main__":
    main()
