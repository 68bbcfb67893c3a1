"""omni-tokenize: tokenize text with a GGUF model's tokenizer.

Counterpart of the reference's tokenize tool
(/root/reference/tools/tokenize/tokenize.cpp): prints one `id -> 'piece'`
line per token (or a bare id array with --ids), reading the prompt from
--prompt, --file or stdin. Works with vocab-only GGUFs (e.g. the
reference's models/ggml-vocab-*.gguf fixtures).
"""

from __future__ import annotations

import argparse
import sys

from ..core.gguf import GGUFReader
from ..tokenizer import build_tokenizer


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="omni-tokenize",
        description="Tokenize text with a GGUF model's tokenizer")
    ap.add_argument("-m", "--model", required=True,
                    help="model or vocab-only GGUF")
    ap.add_argument("-p", "--prompt", default=None)
    ap.add_argument("-f", "--file", default=None)
    ap.add_argument("--ids", action="store_true",
                    help="print a bare comma-separated id array")
    ap.add_argument("--no-bos", action="store_true",
                    help="do not prepend BOS even if the model wants it")
    ap.add_argument("--no-parse-special", action="store_true",
                    help="treat special-token text as plain text")
    ap.add_argument("--show-count", action="store_true")
    args = ap.parse_args(argv)

    if args.prompt is not None:
        text = args.prompt
    elif args.file is not None:
        with open(args.file, encoding="utf-8") as f:
            text = f.read()
    else:
        text = sys.stdin.read()

    reader = GGUFReader(args.model)
    tok = build_tokenizer(reader.kv)
    ids = tok.encode(text, add_special=not args.no_bos,
                     parse_special=not args.no_parse_special)

    if args.ids:
        print("[" + ", ".join(str(i) for i in ids) + "]")
    else:
        for i in ids:
            piece = tok.decode([i])
            print(f"{i:>8} -> '{piece}'")
    if args.show_count:
        print(f"Total number of tokens: {len(ids)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
