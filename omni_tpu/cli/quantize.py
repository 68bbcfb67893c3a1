"""omni-quantize: re-quantize a GGUF with per-tensor type rules.

Counterpart of the reference quantize driver (/root/reference/src/
llama-quant.cpp): named ftype recipes with the Q4_K_M per-tensor promotion
rules (llama-quant.cpp:185 use_more_bits, :302-361 Q4_K_M rules): output
head Q6_K, token embeddings stay Q4_K-class, attn_v / ffn_down promoted to
Q6_K on the use_more_bits layer schedule.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from ..core import GGMLType, GGUFReader, GGUFWriter, quants
from ..core.dtypes import type_traits


def use_more_bits(i_layer: int, n_layers: int) -> bool:
    """llama-quant.cpp:185."""
    return (i_layer < n_layers // 8 or i_layer >= 7 * n_layers // 8
            or (i_layer - n_layers // 8) % 3 == 2)


RECIPES = {
    "Q4_K_M": GGMLType.Q4_K,
    "Q4_K_S": GGMLType.Q4_K,
    "Q5_K_M": GGMLType.Q5_K,
    "Q6_K": GGMLType.Q6_K,
    "Q8_0": GGMLType.Q8_0,
    "Q4_0": GGMLType.Q4_0,
    "Q5_0": GGMLType.Q5_0,
    # ternary (BitNet-style) and OCP microscaling targets
    "TQ1_0": GGMLType.TQ1_0,
    "TQ2_0": GGMLType.TQ2_0,
    "MXFP4": GGMLType.MXFP4,
    # non-linear 4-bit codebook targets (no-imatrix encoder path)
    "IQ4_NL": GGMLType.IQ4_NL,
    "IQ4_XS": GGMLType.IQ4_XS,
}


def pick_type(name: str, ftype: str, default: GGMLType, n_layers: int) -> GGMLType:
    """Per-tensor type rules (Q4_K_M/Q5_K_M schedules)."""
    i_layer = -1
    if name.startswith("blk."):
        i_layer = int(name.split(".")[1])
    if name == "output.weight":
        return GGMLType.Q6_K
    if name == "token_embd.weight":
        return default
    if ftype in ("Q4_K_M", "Q5_K_M") and i_layer >= 0:
        if ".attn_v.weight" in name and use_more_bits(i_layer, n_layers):
            return GGMLType.Q6_K
        if ".ffn_down.weight" in name and use_more_bits(i_layer, n_layers):
            return GGMLType.Q6_K
    return default


def quantize_file(src: str, dst: str, ftype: str,
                  imatrix: dict | None = None) -> dict:
    default = RECIPES[ftype]
    r = GGUFReader(src)
    arch = r.kv.get("general.architecture", "")
    n_layers = int(r.kv.get(f"{arch}.block_count", 0))
    w = GGUFWriter(dst)
    for k, v in r.kv.items():
        w.add_kv(k, v)
    stats = {"n_quantized": 0, "n_kept": 0, "bytes_in": 0, "bytes_out": 0}
    for name, ti in r.tensors.items():
        stats["bytes_in"] += ti.nbytes
        tr = type_traits(ti.ggml_type)
        is_2d_big = len(ti.shape) == 2 and ti.shape[-1] % 256 == 0
        if is_2d_big and not tr.is_quantized:
            t = pick_type(name, ftype, default, n_layers)
            f32 = quants.dequantize(np.asarray(ti.data), ti.ggml_type, ti.shape)
            qw = None
            if imatrix is not None and name in imatrix:
                # per-input-channel importance, broadcast over output rows
                qw = np.broadcast_to(
                    imatrix[name].reshape(1, -1), f32.shape)
            blocks = quants.quantize(f32, t, qweights=qw)
            w.add_tensor(name, blocks, t, logical_shape=ti.shape)
            stats["n_quantized"] += 1
            stats["bytes_out"] += blocks.size * blocks.dtype.itemsize
        else:
            w.add_tensor(name, np.asarray(ti.data), ti.ggml_type,
                         logical_shape=ti.shape)
            stats["n_kept"] += 1
            stats["bytes_out"] += ti.nbytes
    w.write()
    return stats


def main(argv=None):
    from .args import EnvArgumentParser

    ap = EnvArgumentParser("omni-quantize")
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("ftype", choices=sorted(RECIPES), default="Q4_K_M",
                    nargs="?")
    ap.add_argument("--imatrix", help="importance matrix GGUF (omni-imatrix)")
    args = ap.parse_args(argv)
    t0 = time.time()
    imatrix = None
    if args.imatrix:
        from .imatrix import load_imatrix

        imatrix = load_imatrix(args.imatrix)
    stats = quantize_file(args.input, args.output, args.ftype, imatrix=imatrix)
    print(f"quantized {stats['n_quantized']} tensors "
          f"(kept {stats['n_kept']}), "
          f"{stats['bytes_in']/1e6:.1f} MB -> {stats['bytes_out']/1e6:.1f} MB "
          f"in {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
