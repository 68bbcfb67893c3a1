"""omni-gguf-split: shard / merge GGUF files.

Counterpart of the reference's tools/gguf-split: splits a GGUF into
N-tensor shards carrying the reference's split metadata keys
(split.no / split.count / split.tensors.count, gguf-py constants), and
merges a shard set back into one file. Shard naming follows the reference:
`<prefix>-00001-of-00005.gguf`.
"""

from __future__ import annotations

import argparse
import os
import re

import numpy as np

from ..core import GGUFReader, GGUFWriter

KEY_SPLIT_NO = "split.no"
KEY_SPLIT_COUNT = "split.count"
KEY_SPLIT_TENSORS_COUNT = "split.tensors.count"


def shard_name(prefix: str, i: int, n: int) -> str:
    return f"{prefix}-{i + 1:05d}-of-{n:05d}.gguf"


def split_gguf(src: str, prefix: str, max_tensors: int = 128) -> list[str]:
    r = GGUFReader(src)
    names = list(r.tensors)
    groups = [names[i:i + max_tensors] for i in range(0, len(names), max_tensors)]
    n = len(groups)
    paths = []
    for i, group in enumerate(groups):
        path = shard_name(prefix, i, n)
        w = GGUFWriter(path)
        if i == 0:  # full metadata rides the first shard
            for k, v in r.kv.items():
                w.add_kv(k, v)
        w.add_kv(KEY_SPLIT_NO, np.uint16(i).item())
        w.add_kv(KEY_SPLIT_COUNT, np.uint16(n).item())
        w.add_kv(KEY_SPLIT_TENSORS_COUNT, len(r.tensors))
        for name in group:
            ti = r.tensors[name]
            w.add_tensor(name, np.asarray(ti.data), ti.ggml_type,
                         logical_shape=ti.shape)
        w.write()
        paths.append(path)
    return paths


def find_shards(first: str) -> list[str]:
    m = re.match(r"^(.*)-(\d{5})-of-(\d{5})\.gguf$", first)
    if not m:
        return [first]
    prefix, _, n = m.group(1), int(m.group(2)), int(m.group(3))
    return [shard_name(prefix, i, n) for i in range(n)]


def merge_gguf(first_shard: str, dst: str) -> int:
    shards = find_shards(first_shard)
    w = GGUFWriter(dst)
    n_tensors = 0
    for i, path in enumerate(shards):
        r = GGUFReader(path)
        if i == 0:
            for k, v in r.kv.items():
                if not k.startswith("split."):
                    w.add_kv(k, v)
        for name, ti in r.tensors.items():
            w.add_tensor(name, np.asarray(ti.data), ti.ggml_type,
                         logical_shape=ti.shape)
            n_tensors += 1
    w.write()
    return n_tensors


class ShardedReader:
    """Read a sharded model as one logical tensor directory (the capability
    of llama_model_loader's multi-shard support, src/llama-model-loader.cpp)."""

    def __init__(self, first_shard: str):
        self.readers = [GGUFReader(p) for p in find_shards(first_shard)]
        self.kv = dict(self.readers[0].kv)
        self.tensors = {}
        for r in self.readers:
            self.tensors.update(r.tensors)


def main(argv=None):
    ap = argparse.ArgumentParser("omni-gguf-split")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sp = sub.add_parser("split")
    sp.add_argument("input")
    sp.add_argument("prefix")
    sp.add_argument("--max-tensors", type=int, default=128)
    mp = sub.add_parser("merge")
    mp.add_argument("first_shard")
    mp.add_argument("output")
    args = ap.parse_args(argv)
    if args.cmd == "split":
        paths = split_gguf(args.input, args.prefix, args.max_tensors)
        print(f"wrote {len(paths)} shards: {paths[0]} ...")
    else:
        n = merge_gguf(args.first_shard, args.output)
        print(f"merged {n} tensors -> {args.output}")


if __name__ == "__main__":
    main()
