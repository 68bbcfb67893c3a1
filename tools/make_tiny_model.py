"""Generate tiny random GGUF fixtures for driving the CLIs by hand.

Usage:
  python tools/make_tiny_model.py out.gguf [--arch qwen3|llama|qwen3moe]
      [--qtype Q4_K] [--tokenizer]     # --tokenizer = functional byte BPE
"""

import argparse


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("output")
    ap.add_argument("--arch", default="qwen3",
                    choices=["qwen3", "llama", "qwen3moe"])
    ap.add_argument("--qtype", default="Q8_0")
    ap.add_argument("--tokenizer", action="store_true")
    ap.add_argument("--d-model", type=int, default=128)
    ap.add_argument("--layers", type=int, default=2)
    args = ap.parse_args(argv)

    from omni_tpu.core import GGMLType
    from omni_tpu.testing import write_tiny_qwen3, write_tiny_qwen3moe

    if args.arch == "qwen3moe":
        write_tiny_qwen3moe(args.output, n_layers=args.layers,
                            d_model=args.d_model)
    else:
        write_tiny_qwen3(
            args.output, arch=args.arch, n_layers=args.layers,
            d_model=args.d_model, n_heads=4, n_kv_heads=2,
            head_dim=args.d_model // 4, d_ff=args.d_model,
            n_vocab=300 if args.tokenizer else 256,
            qtype=getattr(GGMLType, args.qtype),
            qk_norm=args.arch != "llama",
            byte_tokenizer=args.tokenizer, tied_head=False)
    print(f"wrote {args.output} ({args.arch}, {args.qtype})")


if __name__ == "__main__":
    main()
