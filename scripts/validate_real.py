"""Real-model validation harness, ready to fire the day real weights land.

Counterpart of the reference's quality-validation trio:
- WikiText-2 perplexity + quant-delta (tools/perplexity/perplexity.cpp:295):
  `--llm F16.gguf --quant Q4_K_M.gguf --wikitext wiki.test.raw`
  runs both models through the chunked-NLL methodology and reports the
  Q4_K_M-vs-F16 PPL delta (north star: < 0.1).
- Tokenizer round-trip on the REAL vocab (test-tokenizer-0 role): encodes/
  decodes a battery of edge-case strings plus every vocab piece.
- Stagewise omni golden diff (tools/omni/omni.cpp:2191-2232 debug dumps):
  `--dumps DIR` reads the reference's logits_NNN.bin / hidden_states_NNN.bin
  (int32 index, int32 size, f32 data) and compares our per-token logits/
  hidden taps on the same token sequence (`--dump-tokens tokens.json`).
- WAV RMSE (`--wav-ref DIR --wav-out DIR`): T2W output goldens.

Every section runs only if its inputs are provided; the report JSON gets a
"skipped" entry otherwise — so CI can dry-run the harness on tiny models
today and the same command validates real checkpoints later.

Usage:
  python scripts/validate_real.py --llm model-f16.gguf \
      [--quant model-q4km.gguf] [--wikitext wiki.test.raw] [--chunks 16] \
      [--dumps ref_dumps/ --dump-tokens tokens.json] \
      [--wav-ref ref/ --wav-out ours/] [--out report.json]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import struct
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _load_ctx(path: str, n_ctx: int):
    from omni_tpu.core import GGUFReader
    from omni_tpu.models import qwen3
    from omni_tpu.runtime import Context, SamplerParams
    from omni_tpu.tokenizer import build_tokenizer

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    ctx = Context(cfg, qwen3.load_params(reader), qwen3.forward,
                  qwen3.embed, n_ctx=n_ctx,
                  sampler=SamplerParams(greedy=True))
    tok = build_tokenizer(reader.kv)
    return ctx, tok


def check_perplexity(args, report: dict) -> None:
    if not args.wikitext:
        report["perplexity"] = {"skipped": "no --wikitext"}
        return
    from omni_tpu.cli.perplexity import perplexity

    text = open(args.wikitext, encoding="utf-8").read()
    out = {}
    for name, path in (("f16", args.llm), ("quant", args.quant)):
        if not path:
            continue
        ctx, tok = _load_ctx(path, args.ctx)
        r = perplexity(ctx, tok, text, n_ctx=args.ctx,
                       max_chunks=args.chunks,
                       log=lambda m: print(f"  [{name}] {m}"))
        out[name] = {"ppl": r["ppl"], "nll": r["nll"]}
    if "f16" in out and "quant" in out:
        out["ppl_delta"] = out["quant"]["ppl"] - out["f16"]["ppl"]
        out["pass"] = out["ppl_delta"] < args.max_ppl_delta
    report["perplexity"] = out


_EDGE_STRINGS = [
    "Hello world", " Hello world", "Hello World!", "  leading spaces",
    "trailing spaces  ", "tab\tseparated\ttokens", "new\nlines\n\n",
    "numbers 1234567890 3.14159", "CamelCaseIdentifiers_and_snake_case",
    "üñïçödé tëxt", "中文文本测试", "日本語のテキスト", "한국어 텍스트",
    "🦙🚀 emoji test 🎉", "mixed 中文 and english 123",
    "'quotes' \"double\" `back`", "a", "", " ", "\n",
]


def check_tokenizer(args, report: dict) -> None:
    from omni_tpu.core import GGUFReader
    from omni_tpu.tokenizer import build_tokenizer

    tok = build_tokenizer(GGUFReader(args.llm).kv)
    fails = []
    for s in _EDGE_STRINGS:
        ids = tok.encode(s, add_special=False)
        back = tok.decode(ids)
        if back != s:
            fails.append({"text": s, "ids": list(map(int, ids)),
                          "decoded": back})
    report["tokenizer_roundtrip"] = {
        "strings": len(_EDGE_STRINGS), "failures": fails[:10],
        "n_failures": len(fails), "pass": not fails,
    }


def _read_dump(path: str) -> tuple[int, np.ndarray]:
    with open(path, "rb") as f:
        idx, size = struct.unpack("<ii", f.read(8))
        data = np.frombuffer(f.read(4 * size), np.float32)
    return idx, data


def check_dumps(args, report: dict) -> None:
    """Compare reference per-token logits/hidden dumps against our forward
    on the same token ids (the reference's save_logits_to_file /
    save_hidden_states_to_file binary format)."""
    if not args.dumps:
        report["stagewise_dumps"] = {"skipped": "no --dumps"}
        return
    if not args.dump_tokens:
        report["stagewise_dumps"] = {"skipped": "need --dump-tokens (the "
                                     "token ids the dump run evaluated)"}
        return
    from omni_tpu.runtime import Batch

    tokens = np.asarray(json.load(open(args.dump_tokens)), np.int32)
    ctx, _ = _load_ctx(args.llm, max(len(tokens) + 8, 128))
    logits, hidden = ctx.decode(Batch(tokens=tokens), return_hidden=True)
    logits, hidden = np.asarray(logits), np.asarray(hidden)

    rows = []
    for path in sorted(glob.glob(os.path.join(args.dumps, "logits_*.bin"))):
        idx, ref = _read_dump(path)
        if idx >= len(logits) or len(ref) != logits.shape[1]:
            rows.append({"file": os.path.basename(path), "skipped": True})
            continue
        ours = logits[idx]
        rows.append({
            "file": os.path.basename(path), "index": idx,
            "rmse": float(np.sqrt(np.mean((ours - ref) ** 2))),
            "argmax_match": bool(np.argmax(ours) == np.argmax(ref)),
        })
    hrows = []
    for path in sorted(glob.glob(
            os.path.join(args.dumps, "hidden_states_*.bin"))):
        idx, ref = _read_dump(path)
        if idx >= len(hidden) or len(ref) != hidden.shape[1]:
            hrows.append({"file": os.path.basename(path), "skipped": True})
            continue
        ours = hidden[idx]
        denom = float(np.sqrt(np.mean(ref ** 2))) or 1.0
        hrows.append({
            "file": os.path.basename(path), "index": idx,
            "rel_rmse": float(np.sqrt(np.mean((ours - ref) ** 2)) / denom),
        })
    ok = (all(r.get("argmax_match", True) for r in rows)
          and all(r.get("rel_rmse", 0.0) < 0.05 for r in hrows))
    report["stagewise_dumps"] = {"logits": rows, "hidden": hrows, "pass": ok}


def check_wav(args, report: dict) -> None:
    if not (args.wav_ref and args.wav_out):
        report["wav_rmse"] = {"skipped": "no --wav-ref/--wav-out"}
        return
    import wave

    def read_wav(p):
        with wave.open(p, "rb") as w:
            data = np.frombuffer(w.readframes(w.getnframes()), np.int16)
        return data.astype(np.float32) / 32768.0

    rows = []
    for ref_path in sorted(glob.glob(os.path.join(args.wav_ref, "*.wav"))):
        name = os.path.basename(ref_path)
        out_path = os.path.join(args.wav_out, name)
        if not os.path.exists(out_path):
            rows.append({"file": name, "missing": True})
            continue
        a, b = read_wav(ref_path), read_wav(out_path)
        n = min(len(a), len(b))
        rows.append({
            "file": name, "len_ref": len(a), "len_out": len(b),
            "rmse": float(np.sqrt(np.mean((a[:n] - b[:n]) ** 2))),
        })
    report["wav_rmse"] = {"files": rows}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--llm", required=True, help="F16/base LLM GGUF")
    ap.add_argument("--quant", help="quantized sibling (e.g. Q4_K_M) GGUF")
    ap.add_argument("--wikitext", help="wiki.test.raw path")
    ap.add_argument("--ctx", type=int, default=512)
    ap.add_argument("--chunks", type=int, default=None,
                    help="cap PPL chunks (full corpus if omitted)")
    ap.add_argument("--max-ppl-delta", type=float, default=0.1)
    ap.add_argument("--dumps", help="reference debug-dump dir (logits_*.bin)")
    ap.add_argument("--dump-tokens",
                    help="JSON list of token ids the dump run evaluated")
    ap.add_argument("--wav-ref", help="reference T2W wav dir")
    ap.add_argument("--wav-out", help="our T2W wav dir")
    ap.add_argument("--out", help="write report JSON here")
    args = ap.parse_args(argv)

    report: dict = {"llm": args.llm}
    check_tokenizer(args, report)
    check_perplexity(args, report)
    check_dumps(args, report)
    check_wav(args, report)

    blob = json.dumps(report, indent=2, ensure_ascii=False)
    print(blob)
    if args.out:
        with open(args.out, "w") as f:
            f.write(blob)
    checks = [v for v in report.values()
              if isinstance(v, dict) and "pass" in v]
    return 0 if all(c["pass"] for c in checks) else 1


if __name__ == "__main__":
    if "--cpu" in sys.argv:  # must precede first device use (the axon
        # plugin rewrites plain JAX_PLATFORMS env vars — NOTES.md trap)
        sys.argv.remove("--cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
    sys.exit(main())
