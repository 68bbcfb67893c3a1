"""Fused dequantize × matmul Pallas kernels.

Plays the role of the reference's CUDA quantized matmul kernels
(/root/reference/ggml/src/ggml-cuda/mmq.cu for GEMM,
mmvq.cu for GEMV): weights stay quantized in HBM, are DMA'd tile-by-tile
into VMEM, dequantized in vector registers, and fed to the MXU. One kernel
covers both prefill (large M) and decode (M = batch) — Pallas pipelines the
HBM→VMEM tile streams across the grid automatically.

Layouts come from `qformats.QTensor` (SoA; see that module). Dequant math is
f32 (bit-exact with the reference's scale semantics) then cast to bf16 for
the MXU with f32 accumulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.dtypes import GGMLType
from .qformats import QTensor, dequant


def _dequant_tile_f32(t: GGMLType, refs: dict[str, jax.Array], k: int) -> jax.Array:
    """Dequantize one [TN, K] weight tile inside the kernel. `refs` holds the
    already-loaded VMEM blocks."""
    if t == GGMLType.Q8_0:
        q = refs["q"].astype(jnp.float32)  # [TN, K] int8
        d = refs["d"]  # [TN, K/32] f32
        tn = q.shape[0]
        return (q.reshape(tn, k // 32, 32) * d[:, :, None]).reshape(tn, k)

    if t in (GGMLType.Q4_K, GGMLType.Q5_K):
        qp = refs["q"]  # [TN, K/2] uint8
        tn = qp.shape[0]
        q = jnp.concatenate([qp & jnp.uint8(0xF), qp >> jnp.uint8(4)], axis=1)
        q = q.astype(jnp.float32)
        if t == GGMLType.Q5_K:
            qh = refs["qh"]  # [TN, K/8] uint8
            sh = jnp.arange(8, dtype=jnp.uint8).reshape(1, 1, 8)
            bits = ((qh[:, :, None] >> sh) & jnp.uint8(1)).astype(jnp.float32)
            q = q + bits.reshape(tn, k) * 16.0
        nsb = k // 256
        dl = refs["d"][:, :, None] * refs["sc"].reshape(tn, nsb, 8).astype(jnp.float32)
        ml = refs["dm"][:, :, None] * refs["mn"].reshape(tn, nsb, 8).astype(jnp.float32)
        dl = dl.reshape(tn, k // 32)
        ml = ml.reshape(tn, k // 32)
        w = q.reshape(tn, k // 32, 32) * dl[:, :, None] - ml[:, :, None]
        return w.reshape(tn, k)

    if t == GGMLType.Q6_K:
        q = refs["q"].astype(jnp.float32)  # [TN, K] int8 (-32..31)
        tn = q.shape[0]
        nsb = k // 256
        dl = refs["d"][:, :, None] * refs["sc"].reshape(tn, nsb, 16).astype(jnp.float32)
        dl = dl.reshape(tn, k // 16)
        return (q.reshape(tn, k // 16, 16) * dl[:, :, None]).reshape(tn, k)

    raise NotImplementedError(t.name)


def _make_kernel(t: GGMLType, k: int, names: tuple[str, ...], out_dtype):
    def kernel(x_ref, *rest):
        refs = {nm: rest[i][...] for i, nm in enumerate(names)}
        o_ref = rest[len(names)]
        w = _dequant_tile_f32(t, refs, k).astype(jnp.bfloat16)  # [TN, K]
        x = x_ref[...].astype(jnp.bfloat16)  # [TM, K]
        acc = jax.lax.dot_general(
            x, w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        o_ref[...] = acc.astype(out_dtype)

    return kernel


def _qt_planes(qt: QTensor) -> dict[str, jax.Array]:
    planes = {"q": qt.q, "d": qt.d}
    if qt.sc is not None:
        planes["sc"] = qt.sc
    if qt.mn is not None:
        planes["mn"] = qt.mn
    if qt.dm is not None:
        planes["dm"] = qt.dm
    if qt.qh is not None:
        planes["qh"] = qt.qh
    return planes


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "out_dtype", "interpret")
)
def qmatmul_pallas(
    x: jax.Array,
    qt: QTensor,
    *,
    block_m: int = 256,
    block_n: int = 512,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """out[M, N] = x[M, K] @ dequant(W[N, K]).T via a fused Pallas kernel."""
    m, k = x.shape
    n, k2 = qt.shape
    assert k == k2, (x.shape, qt.shape)
    tm = min(block_m, m)
    tn = min(block_n, n)
    grid = (pl.cdiv(m, tm), pl.cdiv(n, tn))

    planes = _qt_planes(qt)
    names = tuple(planes)

    in_specs = [pl.BlockSpec((tm, k), lambda i, j: (i, 0), memory_space=pltpu.VMEM)]
    for nm in names:
        arr = planes[nm]
        cols = arr.shape[1]
        in_specs.append(
            pl.BlockSpec((tn, cols), lambda i, j: (j, 0), memory_space=pltpu.VMEM)
        )

    flops = 2 * m * n * k
    bytes_accessed = x.size * x.dtype.itemsize + qt.nbytes + m * n * 4
    out = pl.pallas_call(
        _make_kernel(qt.ggml_type, k, names, out_dtype),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(x, *[planes[nm] for nm in names])
    return out


def qmatmul_xla(x: jax.Array, qt: QTensor, out_dtype=jnp.bfloat16) -> jax.Array:
    """Reference/fallback path: full dequant via XLA then plain matmul."""
    w = dequant(qt, jnp.bfloat16)
    return jax.lax.dot_general(
        x.astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def matmul(x: jax.Array, w, out_dtype=jnp.bfloat16) -> jax.Array:
    """Unified linear: `w` is a QTensor (fused kernel on TPU, XLA fallback
    elsewhere) or a plain [N, K] array."""
    if isinstance(w, QTensor):
        if jax.default_backend() == "tpu":
            return qmatmul_pallas(x, w, out_dtype=out_dtype)
        return qmatmul_xla(x, w, out_dtype=out_dtype)
    return jax.lax.dot_general(
        x.astype(w.dtype), w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)
