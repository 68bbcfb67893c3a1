"""omni-cvector: control-vector generation from paired prompts.

Counterpart of the reference's tools/cvector-generator: evaluate positive
and negative prompt sets, collect per-layer hidden states, and extract one
steering direction per layer — the first principal component of the
positive-minus-negative activation differences (PCA mode), sign-aligned to
point toward the positive set. Output is a `direction.N` GGUF loadable by
omni_tpu.runtime.adapter.load_control_vector (and by the reference).
"""

from __future__ import annotations

import numpy as np

from ..core import GGUFReader, GGUFWriter
from ..models import qwen3
from ..runtime.trace import trace_qwen3


def _layer_hiddens(params, cfg, tok, prompts: list[str]) -> dict[int, np.ndarray]:
    """-> {layer (1-based): [n_samples, d]} mean-pooled ffn_out states."""
    out: dict[int, list[np.ndarray]] = {}
    for text in prompts:
        ids = np.asarray(tok.encode(text), np.int32)
        entries = trace_qwen3(params, cfg, ids, keep_data=True)
        for e in entries:
            if e.name.endswith(".ffn_out"):
                li = int(e.name.split(".")[1]) + 1  # cvector layers are 1-based
                out.setdefault(li, []).append(e.data.mean(axis=0))
    return {li: np.stack(v) for li, v in out.items()}


def pca_direction(diffs: np.ndarray) -> np.ndarray:
    """First principal component of [n, d] difference rows, sign-aligned
    with their mean (the reference's PCA mode)."""
    centered = diffs - diffs.mean(axis=0, keepdims=True)
    if len(diffs) == 1 or np.allclose(centered, 0):
        v = diffs.mean(axis=0)
        n = np.linalg.norm(v)
        return v / n if n > 0 else v
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    v = vt[0]
    if v @ diffs.mean(axis=0) < 0:
        v = -v
    return v.astype(np.float32)


def generate_cvector(model_path: str, positives: list[str],
                     negatives: list[str], out_path: str,
                     mode: str = "pca") -> int:
    reader = GGUFReader(model_path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader)
    from ..tokenizer import build_tokenizer

    tok = build_tokenizer(reader.kv)
    pos = _layer_hiddens(params, cfg, tok, positives)
    neg = _layer_hiddens(params, cfg, tok, negatives)

    w = GGUFWriter(out_path)
    w.add_kv("general.architecture", "controlvector")
    w.add_kv("controlvector.model_hint", str(reader.kv.get(
        "general.architecture", "")))
    n = 0
    for li in sorted(pos):
        k = min(len(pos[li]), len(neg[li]))
        diffs = pos[li][:k] - neg[li][:k]
        if mode == "mean":
            v = diffs.mean(axis=0)
            nv = np.linalg.norm(v)
            v = v / nv if nv > 0 else v
        else:
            v = pca_direction(diffs)
        w.add_tensor(f"direction.{li}", v.astype(np.float32))
        n += 1
    w.add_kv("controlvector.layer_count", n)
    w.write()
    return n


def main(argv=None):
    from .args import EnvArgumentParser

    ap = EnvArgumentParser("omni-cvector")
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("--positive", required=True,
                    help="file with one positive prompt per line")
    ap.add_argument("--negative", required=True)
    ap.add_argument("-o", "--output", default="control_vector.gguf")
    ap.add_argument("--mode", choices=["pca", "mean"], default="pca")
    args = ap.parse_args(argv)
    positives = [l for l in open(args.positive).read().splitlines() if l]
    negatives = [l for l in open(args.negative).read().splitlines() if l]
    n = generate_cvector(args.model, positives, negatives, args.output,
                         args.mode)
    print(f"wrote {n} layer directions -> {args.output}")


if __name__ == "__main__":
    main()
