"""omni-export-lora: merge LoRA adapter(s) into a base GGUF.

Counterpart of the reference's export-lora tool
(/root/reference/tools/export-lora/export-lora.cpp): every base tensor
with a matching adapter pair is rewritten as W' = W + scale·(alpha/r)·B·A
(the same effective delta the runtime applies at inference,
runtime/adapter.py LoraWeight); everything else is copied through.
Merged tensors of quantized bases are re-encoded at --outtype (the
reference requantizes to the original type and warns about the
round-trip; we make the output type explicit instead).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

from ..core.dtypes import GGMLType
from ..core.gguf import GGUFReader, GGUFWriter
from ..core import quants


def merge(base_path: str, adapters: list[tuple[str, float]],
          out_path: str, outtype: str = "f16") -> list[str]:
    """-> names of the tensors that received a LoRA delta."""
    reader = GGUFReader(base_path)
    loras = []
    for path, scale in adapters:
        areader = GGUFReader(path)
        if areader.kv.get("adapter.type", "lora") != "lora":
            raise SystemExit(f"not a lora adapter: {path}")
        alpha = float(areader.kv.get("adapter.lora.alpha", 16.0))
        pairs: dict[str, dict[str, np.ndarray]] = {}
        for name, ti in areader.tensors.items():
            for sfx in (".lora_a", ".lora_b"):
                if name.endswith(sfx):
                    pairs.setdefault(name[: -len(sfx)], {})[sfx[-1]] = \
                        np.asarray(ti.data, np.float32)
        for base, ab in pairs.items():
            if "a" not in ab or "b" not in ab:
                raise SystemExit(f"incomplete lora pair for {base}")
        loras.append((pairs, alpha, scale))

    qt = {"f32": GGMLType.F32, "f16": GGMLType.F16,
          "q8_0": GGMLType.Q8_0, "q4_k": GGMLType.Q4_K}[outtype]
    w = GGUFWriter(out_path)
    for k, v in reader.kv.items():
        w.add_kv(k, v)
    merged = []
    for name, ti in reader.tensors.items():
        deltas = []
        for pairs, alpha, scale in loras:
            ab = pairs.get(name)
            if ab is not None:
                r = ab["a"].shape[0]
                deltas.append((scale * alpha / max(r, 1))
                              * (ab["b"] @ ab["a"]))
        if not deltas:
            # pass the original encoding through untouched
            w.add_tensor(name, ti.data, ti.ggml_type, ti.shape)
            continue
        dense = quants.dequantize(ti.data, ti.ggml_type, ti.shape) \
            if ti.ggml_type not in (GGMLType.F32, GGMLType.F16) \
            else np.asarray(ti.data, np.float32)
        dense = dense.reshape(ti.shape) + sum(deltas)
        if qt in (GGMLType.F32, GGMLType.F16):
            w.add_tensor(name, dense.astype(
                np.float32 if qt == GGMLType.F32 else np.float16), qt,
                ti.shape)
        else:
            w.add_tensor(name, quants.quantize(dense, qt), qt, ti.shape)
        merged.append(name)
    w.write()
    return merged


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="omni-export-lora",
        description="Merge LoRA adapter GGUF(s) into a base model GGUF")
    ap.add_argument("-m", "--model", required=True, help="base GGUF")
    ap.add_argument("-o", "--output", required=True)
    ap.add_argument("--lora", action="append", default=[],
                    help="adapter GGUF (repeatable)")
    ap.add_argument("--lora-scaled", action="append", nargs=2, default=[],
                    metavar=("PATH", "SCALE"),
                    help="adapter GGUF with a user scale (repeatable)")
    ap.add_argument("--outtype", choices=("f32", "f16", "q8_0", "q4_k"),
                    default="f16", help="type for MERGED tensors")
    args = ap.parse_args(argv)
    adapters = [(p, 1.0) for p in args.lora] + \
        [(p, float(s)) for p, s in args.lora_scaled]
    if not adapters:
        ap.error("need at least one --lora / --lora-scaled")
    merged = merge(args.model, adapters, args.output, args.outtype)
    size = os.path.getsize(args.output) / 1e6
    print(f"wrote {args.output}: {len(merged)} tensors merged "
          f"({args.outtype}), {size:.1f} MB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
