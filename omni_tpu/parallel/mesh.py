"""Device mesh + sharding rules.

The TPU-native replacement for the reference's multi-device machinery
(SURVEY.md §2.8): `LLAMA_SPLIT_MODE_ROW` weight-row sharding over CUDA
devices becomes megatron-style tensor parallelism expressed as
jax.sharding annotations — XLA/GSPMD inserts the all-reduces over ICI;
server-slot data parallelism becomes a `dp` mesh axis over hosts/DCN.

Axes: ("dp", "tp"). Column-parallel (wq/wk/wv, ffn gate/up) shards the
output-feature axis; row-parallel (wo, ffn down) shards the input-feature
axis; the KV cache shards over KV heads on tp. QTensor planes are all
[K', N]-shaped, so one rule per orientation covers every quant plane.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels.qformats import QTensor


def make_mesh(n_dp: int = 1, n_tp: int | None = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_tp is None:
        n_tp = len(devices) // n_dp
    assert n_dp * n_tp == len(devices), (n_dp, n_tp, len(devices))
    arr = np.array(devices).reshape(n_dp, n_tp)
    return Mesh(arr, ("dp", "tp"))


def _qtensor_spec(spec_n: P, spec_k: P, orientation: str) -> P:
    return spec_n if orientation == "col" else spec_k


def _layer_rules() -> dict[str, str]:
    """Param name -> orientation. col = shard output features (plane axis 1),
    row = shard input features (plane axis 0), rep = replicate."""
    return {
        "wq": "col", "wk": "col", "wv": "col", "wo": "row",
        "w_gate": "col", "w_up": "col", "w_down": "row",
        "wqkv": "col", "w_gateup": "col",  # fused decode layout
        "attn_norm": "rep", "ffn_norm": "rep",
        "q_norm": "rep", "k_norm": "rep",
        "attn_post_norm": "rep", "ffn_post_norm": "rep",  # gemma sandwich
        # qwen2 attention biases ride with their column-parallel weights
        "bq": "bias_col", "bk": "bias_col", "bv": "bias_col",
        "bqkv": "bias_col",
        # MoE: shard the EXPERT axis over tp (expert parallelism, §2.8)
        "gate_exps": "ep", "up_exps": "ep", "down_exps": "ep",
        "gate_inp": "rep",
    }


def _spec_for(value: Any, orientation: str) -> Any:
    """PartitionSpec pytree matching the structure of `value`."""
    if orientation == "ep":  # [E, ...] expert stacks: shard experts on tp
        return P(*(("tp",) + (None,) * (value.ndim - 1)))
    if orientation == "bias_col":  # 1-D bias of a col-parallel projection
        return P("tp")
    if orientation == "rep":
        return P() if not isinstance(value, QTensor) else jax.tree.map(
            lambda _: P(), value)
    if isinstance(value, QTensor):
        # every plane is [K', N]: col-parallel -> shard N, row-parallel -> K'
        spec = P(None, "tp") if orientation == "col" else P("tp", None)
        return jax.tree.map(lambda _: spec, value)
    # dense [N, K]: col -> shard N (axis 0), row -> shard K (axis 1)
    return P("tp", None) if orientation == "col" else P(None, "tp")


def param_specs(params: dict) -> dict:
    """PartitionSpec pytree for a Qwen3-family parameter dict."""
    rules = _layer_rules()
    out: dict[str, Any] = {
        # embeddings/head: shard vocab rows across tp (memory), gather on use
        "token_embd": P("tp", None),
        "output_norm": P(),
        "output": _spec_for(params.get("output"), "col")
        if params.get("output") is not None else None,
        "layers": [],
    }
    # replicate any other (small) top-level tensors, e.g. the rank head
    for k, v in params.items():
        if k not in out and k != "layers":
            out[k] = P() if v is not None else None
    for layer in params["layers"]:
        lp = {}
        for name, value in layer.items():
            if value is None:
                lp[name] = None
                continue
            lp[name] = _spec_for(value, rules.get(name, "rep"))
        out["layers"].append(lp)
    return out


def param_shardings(params: dict, mesh: Mesh) -> dict:
    specs = param_specs(params)
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Place a parameter pytree onto the mesh with TP shardings."""
    return jax.tree.map(jax.device_put, params, param_shardings(params, mesh))


def cache_sharding(mesh: Mesh) -> P:
    """KV cache k/v arrays [L, Hkv, S, D]: shard KV heads over tp."""
    return P(None, "tp", None, None)
