"""HF PEFT LoRA adapter -> GGUF adapter converter.

Counterpart of the reference's convert_lora_to_gguf.py: reads a PEFT
directory (adapter_config.json + adapter_model.safetensors / .bin), maps
the HF module names onto the GGUF tensor stems (the same mapping its
gguf-py tensor_mapping uses for the llama/qwen family), and writes an
adapter GGUF that `runtime.adapter.LoraAdapter.from_gguf` (and the
reference's llama_adapter_lora loader) consume:

- KV: general.type="adapter", adapter.type="lora",
  adapter.lora.alpha=<lora_alpha>, general.architecture=<arch>
- tensors: blk.N.<stem>.weight.lora_a [r, K], .lora_b [N, r] (f32)

Usage: python -m omni_tpu.convert.lora <peft_dir> -o adapter.gguf
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

# HF module suffix -> GGUF tensor stem (llama/qwen family; mirror of the
# reference gguf-py tensor_mapping entries used by convert_lora_to_gguf)
_HF_TO_GGUF = {
    "self_attn.q_proj": "attn_q",
    "self_attn.k_proj": "attn_k",
    "self_attn.v_proj": "attn_v",
    "self_attn.o_proj": "attn_output",
    "mlp.gate_proj": "ffn_gate",
    "mlp.up_proj": "ffn_up",
    "mlp.down_proj": "ffn_down",
}
_TOP_HF_TO_GGUF = {
    "lm_head": "output",
    "model.embed_tokens": "token_embd",
}

_ST_DTYPES = {
    "F32": np.float32, "F16": np.float16, "BF16": None, "F64": np.float64,
    "I32": np.int32, "I64": np.int64, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
}


def read_safetensors(path: str) -> dict[str, np.ndarray]:
    """Minimal dependency-free safetensors reader (header JSON + raw
    little-endian blobs)."""
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(n))
        blob = f.read()
    out = {}
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        b0, b1 = meta["data_offsets"]
        raw = blob[b0:b1]
        dt = meta["dtype"]
        if dt == "BF16":
            u16 = np.frombuffer(raw, np.uint16)
            x = (u16.astype(np.uint32) << 16).view(np.float32)
        else:
            x = np.frombuffer(raw, _ST_DTYPES[dt])
        out[name] = x.reshape(meta["shape"]).astype(np.float32)
    return out


def _load_adapter_tensors(peft_dir: str) -> dict[str, np.ndarray]:
    st = os.path.join(peft_dir, "adapter_model.safetensors")
    if os.path.exists(st):
        return read_safetensors(st)
    bin_path = os.path.join(peft_dir, "adapter_model.bin")
    if os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.float().numpy() for k, v in sd.items()}
    raise FileNotFoundError(
        f"no adapter_model.safetensors / .bin in {peft_dir}")


def _map_name(hf_name: str) -> str | None:
    """'base_model.model.model.layers.3.self_attn.q_proj.lora_A.weight'
    -> ('blk.3.attn_q.weight', 'a')."""
    name = hf_name
    for prefix in ("base_model.model.", "base_model."):
        if name.startswith(prefix):
            name = name[len(prefix):]
    for suffix, ab in ((".lora_A.weight", "lora_a"),
                       (".lora_B.weight", "lora_b")):
        if name.endswith(suffix):
            core = name[: -len(suffix)]
            break
    else:
        return None
    if core.startswith("model.layers."):
        rest = core[len("model.layers."):]
        idx, _, mod = rest.partition(".")
        stem = _HF_TO_GGUF.get(mod)
        if stem is None:
            raise ValueError(f"unmapped LoRA target module: {mod!r}")
        return f"blk.{idx}.{stem}.weight.{ab}"
    stem = _TOP_HF_TO_GGUF.get(core)
    if stem is None:
        raise ValueError(f"unmapped LoRA target: {core!r}")
    return f"{stem}.weight.{ab}"


def convert_lora_to_gguf(peft_dir: str, out_path: str,
                         arch: str = "qwen3") -> int:
    """Convert; returns the number of LoRA pairs written."""
    from ..core.gguf import GGUFWriter

    cfg_path = os.path.join(peft_dir, "adapter_config.json")
    cfg = json.load(open(cfg_path)) if os.path.exists(cfg_path) else {}
    if cfg.get("peft_type", "LORA").upper() != "LORA":
        raise ValueError(f"not a LoRA adapter: peft_type="
                         f"{cfg.get('peft_type')!r}")
    alpha = float(cfg.get("lora_alpha", cfg.get("alpha", 16.0)))

    tensors = _load_adapter_tensors(peft_dir)
    w = GGUFWriter(out_path)
    w.add_kv("general.type", "adapter")
    w.add_kv("adapter.type", "lora")
    w.add_kv("general.architecture", arch)
    w.add_kv("adapter.lora.alpha", alpha)
    n = 0
    for hf_name, arr in sorted(tensors.items()):
        mapped = _map_name(hf_name)
        if mapped is None:
            continue
        w.add_tensor(mapped, np.ascontiguousarray(arr, np.float32))
        n += 1
    if n == 0:
        raise ValueError(f"no LoRA tensors found in {peft_dir}")
    w.write()
    return n // 2


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser("convert-lora-to-gguf")
    ap.add_argument("peft_dir", help="HF PEFT adapter directory")
    ap.add_argument("-o", "--outfile", required=True)
    ap.add_argument("--arch", default="qwen3")
    args = ap.parse_args(argv)
    n = convert_lora_to_gguf(args.peft_dir, args.outfile, args.arch)
    print(f"wrote {n} LoRA pairs -> {args.outfile}")


if __name__ == "__main__":
    main()
