"""Runtime adapters: LoRA and control vectors.

Counterpart of the reference's src/llama-adapter.cpp (llama_adapter_lora +
llama_adapter_cvec): LoRA pairs load from a GGUF written by
convert_lora_to_gguf.py (tensors `<base>.lora_a` [r, K] / `<base>.lora_b`
[N, r], KV `adapter.lora.alpha`), and apply at RUNTIME — base weights stay
quantized in HBM; the low-rank delta rides two skinny MXU matmuls
(x @ A^T @ B^T * scale), exactly the role of the reference's extra
ggml_mul_mat pair in build_lora_mm. Hot-swap = rebuild the params pytree,
no weight rewrite (the server's LoRA hot-swap capability).

Control vectors (tensors `direction.<layer>`) add a steering vector to each
layer's output residual stream.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..core.gguf import GGUFReader


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class LoraWeight:
    """A base weight (QTensor or dense [N, K]) plus a low-rank delta."""

    base: Any
    a: jax.Array  # [r, K]
    b: jax.Array  # [N, r]
    scale: jax.Array  # scalar f32: user_scale * alpha / r

    @property
    def shape(self):
        return self.base.shape


@dataclasses.dataclass
class LoraAdapter:
    """Parsed LoRA GGUF: gguf tensor base-name -> (a, b)."""

    pairs: dict[str, tuple[jax.Array, jax.Array]]
    alpha: float

    @staticmethod
    def from_gguf(path) -> "LoraAdapter":
        reader = GGUFReader(path)
        if reader.kv.get("adapter.type", "lora") != "lora":
            raise ValueError(f"not a lora adapter: {path}")
        alpha = float(reader.kv.get("adapter.lora.alpha", 16.0))
        pairs: dict[str, tuple[jax.Array, jax.Array]] = {}
        partial: dict[str, dict[str, jax.Array]] = {}
        for name, ti in reader.tensors.items():
            for suffix in (".lora_a", ".lora_b"):
                if name.endswith(suffix):
                    base = name[: -len(suffix)]
                    arr = jnp.asarray(ti.data, jnp.float32)
                    partial.setdefault(base, {})[suffix[-1]] = arr
        for base, ab in partial.items():
            if "a" not in ab or "b" not in ab:
                raise ValueError(f"incomplete lora pair for {base}")
            pairs[base] = (ab["a"], ab["b"])
        return LoraAdapter(pairs=pairs, alpha=alpha)

    @property
    def rank(self) -> int:
        a, _ = next(iter(self.pairs.values()))
        return a.shape[0]


# param-pytree key -> GGUF tensor stem, for llama/qwen-family layer dicts
_LAYER_MAP = {
    "wq": "attn_q", "wk": "attn_k", "wv": "attn_v", "wo": "attn_output",
    "w_gate": "ffn_gate", "w_up": "ffn_up", "w_down": "ffn_down",
}
_TOP_MAP = {"output": "output", "token_embd": "token_embd"}


def apply_lora(params: dict, adapter: LoraAdapter, scale: float = 1.0) -> dict:
    """Return a params pytree with matched weights wrapped in LoraWeight.

    Idempotent layering: applying a second adapter wraps again (stacked
    adapters compose, like the reference's per-context lora list).
    """
    eff = jnp.float32(scale * adapter.alpha / max(adapter.rank, 1))

    def wrap(w, gguf_name):
        pair = adapter.pairs.get(f"{gguf_name}.weight")
        if pair is None or w is None:
            return w
        a, b = pair
        return LoraWeight(base=w, a=a.astype(jnp.bfloat16),
                          b=b.astype(jnp.bfloat16), scale=eff)

    out = dict(params)
    for key, stem in _TOP_MAP.items():
        if key in out:
            out[key] = wrap(out[key], stem)
    out["layers"] = [
        {k: (wrap(v, f"blk.{i}.{_LAYER_MAP[k]}") if k in _LAYER_MAP else v)
         for k, v in layer.items()}
        for i, layer in enumerate(params["layers"])
    ]
    return out


def remove_lora(params: dict) -> dict:
    """Strip every LoraWeight wrapper (server hot-swap: scale-to-zero/unload)."""
    def unwrap(w):
        while isinstance(w, LoraWeight):
            w = w.base
        return w

    out = {k: (unwrap(v) if not isinstance(v, (dict, list)) else v)
           for k, v in params.items()}
    out["layers"] = [{k: unwrap(v) for k, v in layer.items()}
                     for layer in params["layers"]]
    return out


# ---------------------------------------------------------------------------
# control vectors (llama_adapter_cvec)
# ---------------------------------------------------------------------------

def load_control_vector(path) -> dict[int, jax.Array]:
    """Read a control-vector GGUF: tensors `direction.<layer>` -> [d]."""
    reader = GGUFReader(path)
    out: dict[int, jax.Array] = {}
    for name, ti in reader.tensors.items():
        if name.startswith("direction."):
            out[int(name.split(".")[1])] = jnp.asarray(ti.data, jnp.float32)
    if not out:
        raise ValueError(f"no direction.* tensors in {path}")
    return out


def apply_control_vector(params: dict, directions: dict[int, jax.Array],
                         strength: float = 1.0) -> dict:
    """Attach per-layer steering vectors; the model adds them to each
    layer's output residual (reference: llm_graph_context cvec add).
    Layer indices are 1-based in cvector GGUFs (direction.1 = first block)."""
    out = dict(params)
    out["layers"] = [
        {**layer,
         "cvec": (jnp.float32(strength) * directions[i + 1]).astype(jnp.bfloat16)
         if (i + 1) in directions else layer.get("cvec")}
        for i, layer in enumerate(params["layers"])
    ]
    return out


def remove_control_vector(params: dict) -> dict:
    out = dict(params)
    out["layers"] = [{k: v for k, v in layer.items() if k != "cvec"}
                     for layer in params["layers"]]
    return out
