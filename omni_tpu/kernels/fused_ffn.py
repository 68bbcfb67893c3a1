"""Fused quantized SwiGLU FFN: gate, up, activation, and down projection in
ONE Pallas kernel.

The decode cost model (docs/PERF.md): each pallas_call carries a 15-20 µs
floor and the [M, 2F] gate/up intermediate plus the silu pass cost an XLA
round-trip between the two fused matmuls. This kernel streams the gate/up
N-tiles and the matching down K-tiles through VMEM in lockstep — for each
chunk f of the hidden dimension F: h_f = silu(x@Wg_f) * (x@Wu_f) feeds
acc += h_f @ Wd_f immediately, so the [M, F] intermediate never exists and
the whole FFN is one dispatch (role of the reference's fused ffn path,
ggml-cuda mmvq back-to-back launches on one stream).

Grid: (M/TM, F/TF). The down accumulator [TM, N_out] lives in VMEM
scratch across the F axis (N_out = d_model ≤ 4096 fits easily); gate/up
tiles dequantize exactly like dequant_matmul (same plane layout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.dtypes import GGMLType
from .dequant_matmul import _PLANE_DIV
from .qformats import QTensor, dequant_tile, tile_granule


def _make_kernel(t_gu: GGMLType, t_dn: GGMLType, names_gu, names_dn,
                 nf: int, out_dtype, act: str, dn_3d):
    n_gu, n_dn = len(names_gu), len(names_dn)

    def kernel(x_ref, *rest):
        ff = pl.program_id(1)
        gate_p = {nm: rest[i][...] for i, nm in enumerate(names_gu)}
        up_p = {nm: rest[n_gu + i][...] for i, nm in enumerate(names_gu)}
        # down planes whose F tile is under Mosaic's 8-sublane block
        # minimum (scale planes: 1 row per 256-elt superblock) arrive as
        # 3D [nf, rows, N] blocked on the leading axis — the (rows, N)
        # trailing block equals the array dims, which Mosaic accepts
        down_p = {}
        for i, nm in enumerate(names_dn):
            v = rest[2 * n_gu + i][...]
            down_p[nm] = v[0] if nm in dn_3d else v
        o_ref = rest[2 * n_gu + n_dn]
        acc_ref = rest[2 * n_gu + n_dn + 1]

        @pl.when(ff == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        x = x_ref[...].astype(jnp.bfloat16)  # [TM, K]
        wg = dequant_tile(t_gu, gate_p, jnp.bfloat16)  # [K, TF]
        g = jax.lax.dot_general(x, wg, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        wu = dequant_tile(t_gu, up_p, jnp.bfloat16)
        u = jax.lax.dot_general(x, wu, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if act == "silu":
            h = g * jax.lax.logistic(g) * u
        else:  # gelu_tanh
            h = jax.nn.gelu(g, approximate=True) * u
        wd = dequant_tile(t_dn, down_p, jnp.bfloat16)  # [TF, N]
        acc_ref[...] += jax.lax.dot_general(
            h.astype(jnp.bfloat16), wd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(ff == nf - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(out_dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("block_m", "block_f",
                                             "out_dtype", "act", "interpret"))
def qffn_pallas(
    x: jax.Array,  # [M, K] (pre-normed hidden)
    gu: QTensor,  # [2F, K] fused gate;up (gate rows first)
    down: QTensor,  # [K_out, F]
    *,
    block_m: int = 256,
    block_f: int | None = None,
    out_dtype=jnp.bfloat16,
    act: str = "silu",
    interpret: bool = False,
) -> jax.Array:
    m, k = x.shape
    two_f, k2 = gu.shape
    n_out, f = down.shape
    assert k == k2 and two_f == 2 * f, (x.shape, gu.shape, down.shape)
    if block_f is None:
        # prefill (tall M) shrinks the F tile: the [TM, K] x tile and the
        # [TM, N] f32 accumulator are VMEM-resident across the whole F axis
        block_f = 256 if m > 32 else 512
    granule = tile_granule(gu.ggml_type)
    tf = max(granule, min(block_f, f))
    while f % tf != 0:
        tf -= granule
    tm = min(block_m, m)
    nf = f // tf
    grid = (pl.cdiv(m, tm), nf)

    gu_planes = gu.planes()
    dn_planes = down.planes()
    names_gu = tuple(gu_planes)
    names_dn = tuple(dn_planes)
    divs_gu = _PLANE_DIV[gu.ggml_type]
    divs_dn = _PLANE_DIV[down.ggml_type]

    in_specs = [pl.BlockSpec((tm, k), lambda i, ff: (i, 0),
                             memory_space=pltpu.VMEM)]
    # gate tiles: lane block ff of the [K', 2F] planes; up tiles: the same
    # planes offset by F (= nf lane blocks of width TF)
    for nm in names_gu:
        dv = divs_gu[nm]
        in_specs.append(pl.BlockSpec(
            (k // dv, tf), lambda i, ff: (0, ff), memory_space=pltpu.VMEM))
    for nm in names_gu:
        dv = divs_gu[nm]
        in_specs.append(pl.BlockSpec(
            (k // dv, tf), lambda i, ff, nf=nf: (0, nf + ff),
            memory_space=pltpu.VMEM))
    # down tiles: sublane block ff of the [F', N_out] planes; planes whose
    # tile would be under 8 sublanes (scale planes at small TF) are
    # reshaped to [nf, rows, N] and blocked on the leading axis instead
    dn_3d: set[str] = set()
    for nm in names_dn:
        dv = divs_dn[nm]
        rows = tf // dv
        if rows % 8 == 0 and rows >= 8:
            in_specs.append(pl.BlockSpec(
                (rows, n_out), lambda i, ff: (ff, 0),
                memory_space=pltpu.VMEM))
        else:
            dn_3d.add(nm)
            dn_planes[nm] = dn_planes[nm].reshape(nf, rows, n_out)
            in_specs.append(pl.BlockSpec(
                (1, rows, n_out), lambda i, ff: (ff, 0, 0),
                memory_space=pltpu.VMEM))

    flops = 2 * m * (2 * f * k + f * n_out)
    bytes_accessed = (x.size * x.dtype.itemsize + gu.nbytes + down.nbytes
                      + m * n_out * 4)
    gu_args = [gu_planes[nm] for nm in names_gu]
    return pl.pallas_call(
        _make_kernel(gu.ggml_type, down.ggml_type, names_gu, names_dn,
                     nf, out_dtype, act, dn_3d),
        out_shape=jax.ShapeDtypeStruct((m, n_out), out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tm, n_out), lambda i, ff: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tm, n_out), jnp.float32)],
        cost_estimate=pl.CostEstimate(flops=flops,
                                      bytes_accessed=bytes_accessed,
                                      transcendentals=m * f),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x, *gu_args, *gu_args, *[dn_planes[nm] for nm in names_dn])
