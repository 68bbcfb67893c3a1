"""Fused dequantize × matmul Pallas kernels.

Plays the role of the reference's CUDA quantized matmul kernels
(/root/reference/ggml/src/ggml-cuda/mmq.cu for GEMM, mmvq.cu for GEMV):
weights stay quantized in HBM, are DMA'd tile-by-tile into VMEM, dequantized
in vector registers (sublane-axis ops only — see qformats), and fed to the
MXU. One kernel covers prefill (large M) and decode (M = batch); the grid
is (M/TM, N/TN, K/TK) with an f32 VMEM accumulator over the K dimension, so
arbitrarily large K (ffn_down: 12288) stays within VMEM budget and Pallas
double-buffers the HBM tile streams automatically.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# group-parallel decode kernel (below): the production default for M=1.
# Served 8B Q4_K decode 12.92 -> 9.84 ms/token (full bench A/B on chip,
# round 4); OMNI_GP_DECODE=0 restores the plain fused kernel.
_GP_DECODE = os.environ.get("OMNI_GP_DECODE", "1") == "1"
# small-M extension (M=2..8: multi-slot batched decode, speculative verify
# rows); OMNI_GP_SMALLM=0 restores the plain kernel for M>1
_GP_SMALLM = os.environ.get("OMNI_GP_SMALLM", "1") == "1"
# split-half prefill kernel (M>8, halves-packed formats);
# OMNI_SH_PREFILL=0 restores the plain fused kernel
_SH_PREFILL = os.environ.get("OMNI_SH_PREFILL", "1") == "1"

from ..core.dtypes import GGMLType
from .qformats import QTensor, dequant_t, dequant_tile, tile_granule

# rows of ONE logical K element per plane, as a fraction: plane_rows = K // div
_PLANE_DIV = {
    GGMLType.Q8_0: {"q": 1, "d": 32},
    GGMLType.Q4_K: {"q": 2, "sc": 32, "mn": 32, "d": 256, "dm": 256},
    GGMLType.Q5_K: {"q": 2, "sc": 32, "mn": 32, "d": 256, "dm": 256, "qh": 8},
    GGMLType.Q6_K: {"q": 1, "sc": 16, "d": 256},
    GGMLType.Q4_0: {"q": 2, "d": 32},
    GGMLType.Q4_1: {"q": 2, "d": 32, "dm": 32},
    GGMLType.Q5_0: {"q": 2, "qh": 8, "d": 32},
    GGMLType.Q5_1: {"q": 2, "qh": 8, "d": 32, "dm": 32},
    GGMLType.IQ4_NL: {"q": 1, "d": 32},
    GGMLType.IQ4_XS: {"q": 1, "sc": 32, "d": 256},
    GGMLType.MXFP4: {"q": 1, "d": 32},
    GGMLType.Q2_K: {"q": 4, "sc": 16, "mn": 16, "d": 256, "dm": 256},
    GGMLType.Q3_K: {"q": 4, "sc": 16, "qh": 8, "d": 256},
}


def _make_kernel(t: GGMLType, names: tuple[str, ...], nk: int, out_dtype):
    def kernel(x_ref, *rest):
        refs = {nm: rest[i][...] for i, nm in enumerate(names)}
        o_ref = rest[len(names)]
        acc_ref = rest[len(names) + 1]
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        w = dequant_tile(t, refs, jnp.bfloat16)  # [TK, TN]
        x = x_ref[...].astype(jnp.bfloat16)  # [TM, TK]
        acc_ref[...] += jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

        @pl.when(kk == nk - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(out_dtype)

    return kernel


def _auto_tiles(m: int, n: int, k: int) -> tuple[int, int]:
    """Shape-aware (block_n, block_k), from on-chip sweeps (round 1 decode
    sweep + round 2 scripts/prefill_sweep.py): large K tiles amortize
    per-call overhead; decode (tiny M) wants wide N tiles, prefill (tall
    M) narrower ones (the M×N f32 accumulator competes for VMEM)."""
    bk = min(k, 4096)
    if m > 32:  # prefill: bn=512 beats 1024 at every swept shape (M=512
        # gateup: 35.6 vs 28-31 TF/s); 256 edges ahead only at M<=64
        return (256 if m <= 64 and n >= 8192 else 512), bk
    if n >= 8192:
        bn = 1024
    elif n > 4096:
        bn = 512  # fused wqkv shape (6144x4096): 314 vs 296 GB/s at 256
    elif n > 1024:
        bn = 256 if k <= 4096 else 512
    else:
        bn = 256
    return bn, bk


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "out_dtype",
                              "interpret", "vmem_limit")
)
def qmatmul_pallas(
    x: jax.Array,
    qt: QTensor,
    *,
    block_m: int = 256,
    block_n: int | None = None,
    block_k: int | None = None,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    vmem_limit: int | None = None,
) -> jax.Array:
    """out[M, N] = x[M, K] @ dequant(W).T_logical via the fused kernel."""
    m, k = x.shape
    n, k2 = qt.shape
    assert k == k2, (x.shape, qt.shape)
    if block_n is None or block_k is None:
        auto_n, auto_k = _auto_tiles(m, n, k)
        block_n = block_n or auto_n
        block_k = block_k or auto_k
    granule = tile_granule(qt.ggml_type)
    tm = min(block_m, m)
    tn = min(block_n, n)
    assert k % granule == 0, (k, granule)
    # K tiles must divide K exactly: a ragged K edge would accumulate
    # garbage (unlike masked M/N edges). Largest granule-multiple divisor:
    tk = max(granule, min(block_k, k))
    while k % tk != 0:
        tk -= granule
    grid = (pl.cdiv(m, tm), pl.cdiv(n, tn), pl.cdiv(k, tk))

    planes = qt.planes()
    names = tuple(planes)
    divs = _PLANE_DIV[qt.ggml_type]

    in_specs = [
        pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM)
    ]
    for nm in names:
        dv = divs[nm]
        in_specs.append(
            pl.BlockSpec(
                (tk // dv, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
            )
        )

    flops = 2 * m * n * k
    bytes_accessed = x.size * x.dtype.itemsize + qt.nbytes + m * n * 4
    return pl.pallas_call(
        _make_kernel(qt.ggml_type, names, grid[2], out_dtype),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        # M/N grid dims are independent; only K carries the accumulator —
        # the scheduling hint buys ~10% on decode shapes (round-2 A/B)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(x, *[planes[nm] for nm in names])


# --------------------------------------------------------------------------
# group-parallel decode kernel (M=1)
# --------------------------------------------------------------------------
# The plain fused kernel pays two full [K,N] VPU passes applying the group
# scale/min laws before the dot (measured ~25% of kernel time: 493 -> 358
# GB/s, docs/PERF.md). For decode (M=1) the scale math can ride the MXU
# instead: feed the RAW unpacked quants (exact in bf16) to the MXU against a
# BLOCK-DIAGONAL activation x_b[g, j] = x[j] * [j//gw == g], yielding
# per-group partial dots P[g, n] = sum_j x[g*gw+j] * q[g*gw+j, n]; then
#   out[n] = sum_g dl[g, n] * P[g, n] - ml[g, n] * xs[g]
# is a [K/gw, N]-sized VPU pass — 32x (gw) smaller than before. xs (group
# sums of x) comes free as a full-lane reduction of x_b. The k-tile is
# processed in sub-slices of depth KS so the block-diagonal zero padding
# (and with it the extra MXU MACs, M = KS/gw per dot) stays far below the
# weight-DMA time. Role model: mmvq.cu keeps quants packed until the dot
# (/root/reference/ggml/src/ggml-cuda/mmvq.cu); this is the TPU-shaped
# equivalent — MXU group-dots instead of DP4A lanes.

from .qformats import (_expand_rows, _unpack_sb_halves,  # noqa: E402
                       _unpack_sb_quarters)

_GP_QTYPES = (GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q8_0,
              GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
              GGMLType.IQ4_NL, GGMLType.IQ4_XS, GGMLType.MXFP4,
              GGMLType.Q2_K, GGMLType.Q3_K)
# group width of the scale law (everything else is per-32)
_GP_GW16 = (GGMLType.Q6_K, GGMLType.Q2_K, GGMLType.Q3_K)


def _gp_slice(t: GGMLType, refs, s: int, ks: int, tn: int):
    """Per-sub-slice (q_bf16 [ks, tn], dl [ks/gw, tn], ml|None, gw)."""
    i32, f32 = jnp.int32, jnp.float32

    def rows(nm, dv):  # static sublane slice of a plane for sub-slice s
        r = ks // dv
        return refs[nm][s * r:(s + 1) * r, :]

    if t in (GGMLType.Q4_K, GGMLType.Q5_K):
        q = _unpack_sb_halves(rows("q", 2))
        if t == GGMLType.Q5_K:
            qh = _expand_rows(rows("qh", 8).astype(i32), 8)
            sh = jax.lax.broadcasted_iota(i32, qh.shape, 0) % 8
            q = q + ((qh >> sh) & 1) * 16
        dl = _expand_rows(rows("d", 256), 8) * rows("sc", 32).astype(i32).astype(f32)
        ml = _expand_rows(rows("dm", 256), 8) * rows("mn", 32).astype(i32).astype(f32)
        return q.astype(f32).astype(jnp.bfloat16), dl, ml, 32
    if t == GGMLType.Q6_K:
        q = rows("q", 1).astype(i32).astype(f32)
        dl = _expand_rows(rows("d", 256), 16) * rows("sc", 16).astype(i32).astype(f32)
        return q.astype(jnp.bfloat16), dl, None, 16
    if t == GGMLType.Q2_K:
        q = _unpack_sb_quarters(rows("q", 4))
        dl = _expand_rows(rows("d", 256), 16) * rows("sc", 16).astype(i32).astype(f32)
        ml = _expand_rows(rows("dm", 256), 16) * rows("mn", 16).astype(i32).astype(f32)
        return q.astype(f32).astype(jnp.bfloat16), dl, ml, 16
    if t == GGMLType.Q3_K:
        q = _unpack_sb_quarters(rows("q", 4))
        qh = _expand_rows(rows("qh", 8).astype(i32), 8)
        sh = jax.lax.broadcasted_iota(i32, qh.shape, 0) % 8
        q = q + ((qh >> sh) & 1) * 4 - 4
        dl = _expand_rows(rows("d", 256), 16) * rows("sc", 16).astype(i32).astype(f32)
        return q.astype(f32).astype(jnp.bfloat16), dl, None, 16
    if t in (GGMLType.Q8_0, GGMLType.IQ4_NL, GGMLType.MXFP4):
        q = rows("q", 1).astype(i32).astype(f32)
        return q.astype(jnp.bfloat16), rows("d", 32), None, 32
    if t == GGMLType.IQ4_XS:
        q = rows("q", 1).astype(i32).astype(f32)
        dl = _expand_rows(rows("d", 256), 8) * rows("sc", 32).astype(i32).astype(f32)
        return q.astype(jnp.bfloat16), dl, None, 32
    if t in (GGMLType.Q4_0, GGMLType.Q4_1):
        q = _unpack_sb_halves(rows("q", 2))
        d = rows("d", 32)
        if t == GGMLType.Q4_0:  # (q - 8) * d: fold the offset into the min
            return (q.astype(f32).astype(jnp.bfloat16), d, 8.0 * d, 32)
        return q.astype(f32).astype(jnp.bfloat16), d, -rows("dm", 32), 32
    if t in (GGMLType.Q5_0, GGMLType.Q5_1):
        q = _unpack_sb_halves(rows("q", 2))
        qh = _expand_rows(rows("qh", 8).astype(i32), 8)
        sh = jax.lax.broadcasted_iota(i32, qh.shape, 0) % 8
        q = q + ((qh >> sh) & 1) * 16
        d = rows("d", 32)
        if t == GGMLType.Q5_0:
            return (q.astype(f32).astype(jnp.bfloat16), d, 16.0 * d, 32)
        return q.astype(f32).astype(jnp.bfloat16), d, -rows("dm", 32), 32
    raise NotImplementedError(t.name)


def _make_gp_kernel(t: GGMLType, names: tuple[str, ...], nk: int,
                    out_dtype, tk: int, tn: int, ks: int, m: int = 1):
    n_sl = tk // ks

    def kernel(x_ref, *rest):
        refs = {nm: rest[i] for i, nm in enumerate(names)}
        o_ref = rest[len(names)]
        acc_ref = rest[len(names) + 1]
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        x = x_ref[...]  # [m*gs, tk] bf16: row r = x[r // gs] (pre-broadcast
        # OUTSIDE the kernel: Mosaic's in-kernel sublane broadcast of a
        # lane-sliced vector crashes its backend)
        acc = jnp.zeros((m, tn), jnp.float32)
        for s in range(n_sl):
            q, dl, ml, gw = _gp_slice(t, refs, s, ks, tn)
            gs = ks // gw
            rows = m * gs
            xsl = x[:rows, s * ks:(s + 1) * ks]  # static slice
            grp = jax.lax.broadcasted_iota(jnp.int32, (rows, ks), 1) // gw
            row = jax.lax.broadcasted_iota(jnp.int32, (rows, ks), 0)
            if m > 1:
                row = row % gs  # each batch row owns a gs-row band
            xb = jnp.where(grp == row, xsl, jnp.bfloat16(0))
            p = jax.lax.dot_general(  # [m*gs, tn] per-group partial dots
                xb, q, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if m > 1:  # tile the [gs, tn] scale law over the m bands
                dl = jnp.concatenate([dl] * m, axis=0)
                if ml is not None:
                    ml_t = jnp.concatenate([ml] * m, axis=0)
            else:
                ml_t = ml
            c = dl * p
            if ml is not None:
                xs = jnp.sum(xb.astype(jnp.float32), axis=1, keepdims=True)
                c = c - ml_t * xs
            if m > 1:  # per-band reduction: [m*gs, tn] -> [m, tn]
                acc = acc + c.reshape(m, gs, tn).sum(axis=1)
            else:
                acc = acc + jnp.sum(c, axis=0, keepdims=True)
        acc_ref[...] += acc

        @pl.when(kk == nk - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(out_dtype)

    return kernel


# smallest K tile whose plane blocks all satisfy Mosaic's 8-sublane rule:
# superblock formats carry [K/256, N] d/dm planes -> tk >= 8*256
def _gp_min_tk(t: GGMLType) -> int:
    return 2048 if 256 in _PLANE_DIV[t].values() else 256


_GP_MAX_M = 8  # beyond this the block-diagonal MXU padding eats the win


def gp_supported(m: int, qt: QTensor) -> bool:
    """Can qmatmul_gp_pallas serve this (x, qt)? Small-M decode only:
    M=1 (single-stream) through M=8 (multi-slot batched decode /
    speculative verify rows)."""
    return (1 <= m <= _GP_MAX_M and qt.ggml_type in _GP_QTYPES
            and qt.shape[1] % _gp_min_tk(qt.ggml_type) == 0)


@functools.partial(
    jax.jit, static_argnames=("block_n", "block_k", "block_ks", "out_dtype",
                              "interpret", "vmem_limit")
)
def qmatmul_gp_pallas(
    x: jax.Array,
    qt: QTensor,
    *,
    block_n: int | None = None,
    block_k: int | None = None,
    block_ks: int | None = None,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    vmem_limit: int | None = None,
) -> jax.Array:
    """Small-M decode fused matmul with group-parallel MXU scale folding."""
    m, k = x.shape
    n, k2 = qt.shape
    assert 1 <= m <= _GP_MAX_M and k == k2, (x.shape, qt.shape)
    if block_n is None or block_k is None:
        auto_n, auto_k = _auto_tiles(1, n, k)  # decode-shaped tiles
        block_n = block_n or auto_n
        block_k = block_k or auto_k
    if block_ks is None:
        # on-chip sweep (scripts/gpdot_probe.py): wide-N shapes amortize
        # the larger block-diagonal dots, square wo-like shapes prefer
        # the shallower sub-slice. M>1 multiplies the dot rows, so shrink
        # the sub-slice to keep the MXU M-dim comparable.
        block_ks = (512 if n <= 4096 else 1024) // min(m, 4)
    granule = max(tile_granule(qt.ggml_type), _gp_min_tk(qt.ggml_type))
    tn = min(block_n, n)
    tk = max(granule, min(block_k, k))
    while k % tk != 0:
        tk -= granule
    # ks must be a 256-multiple divisor of tk (the sub-slice plane rows are
    # static slices), and the unroll count tk//ks must stay <=8 (16 unrolled
    # sub-slices hung Mosaic >9 min, round-4 note). Snap the swept target to
    # the smallest qualifying divisor — tk itself always qualifies.
    target = max(256, min(block_ks, tk), -(-tk // 8))
    ks = tk
    for cand in range(256, tk + 1, 256):
        if tk % cand == 0 and cand >= target:
            ks = cand
            break
    assert tk % ks == 0 and ks % 256 == 0, (tk, ks)
    grid = (1, pl.cdiv(n, tn), pl.cdiv(k, tk))

    # pre-broadcast x to [m*gs, K]: row r = x[r // gs] (in-kernel sublane
    # broadcast of lane-sliced vectors crashes the Mosaic backend)
    gw = 16 if qt.ggml_type in _GP_GW16 else 32
    gs = ks // gw
    xb = jnp.broadcast_to(x.astype(jnp.bfloat16)[:, None, :],
                          (m, gs, k)).reshape(m * gs, k)

    planes = qt.planes()
    names = tuple(planes)
    divs = _PLANE_DIV[qt.ggml_type]
    in_specs = [
        pl.BlockSpec((m * gs, tk), lambda i, j, kk: (0, kk),
                     memory_space=pltpu.VMEM)
    ]
    for nm in names:
        dv = divs[nm]
        in_specs.append(
            pl.BlockSpec(
                (tk // dv, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
            )
        )
    # block-diagonal dots: M·ks/gw rows per depth-ks dot -> k·m·(ks/gw)·n MACs
    # (m==1 keeps the exact round-4-tuned estimate — scheduling parity)
    flops = 2 * k * (ks // 32) * n if m == 1 else 2 * k * m * (ks // gw) * n
    bytes_accessed = x.size * x.dtype.itemsize + qt.nbytes + m * n * 4
    return pl.pallas_call(
        _make_gp_kernel(qt.ggml_type, names, grid[2], out_dtype, tk, tn, ks,
                        m=m),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (m, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((m, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(xb, *[planes[nm] for nm in names])


# --------------------------------------------------------------------------
# split-half prefill kernel (large M)
# --------------------------------------------------------------------------
# The plain kernel's per-element dequant costs ~9 VPU ops on a [TK, TN]
# tile (nibble unpack + a CONCAT materialization to restore element order +
# scale/min expand copies + mul + sub). At prefill M (>=~32) the kernel is
# VPU-bound on exactly that work (PERF.md: 12-15 TF/s at M=64 vs 197 peak),
# and the GP block-diagonal trick is analytically wrong there: its extra
# MXU MACs per weight element scale as M·(KS/gw) and its scale-plane pass
# as M/gw — both LOSE once M >= gw (32). This kernel instead restructures
# the dequant itself for the halves-packed formats:
#   - NO concat: the low/high nibble planes are contracted SEPARATELY
#     against a pre-split activation (x_lo, x_hi) whose K order matches the
#     plane layout (byte row r of superblock s holds elements s·256+r and
#     s·256+128+r) — the split is a cheap [M, K] lane reshape OUTSIDE the
#     kernel.
#   - min/offset term as a SIDE DOT on the MXU: out -= xs @ ml with xs the
#     per-32-group sums of x (computed outside) and ml the [K/32, N] group
#     min plane — 1/32 of the main dot's MACs, replacing a full [TK, TN]
#     subtract + expand.
# Per-element VPU work drops to mask/shift + cast + scale-mul + bf16 cast.
# Role model: mmq.cu (the reference's quantized GEMM for prompt
# processing, /root/reference/ggml/src/ggml-cuda/mmq.cu).

_SH_QTYPES = (GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q4_0, GGMLType.Q4_1,
              GGMLType.Q5_0, GGMLType.Q5_1)


def sh_supported(m: int, qt: QTensor) -> bool:
    """Can qmatmul_splith_pallas serve this (x, qt)? Prefill-shaped M on
    the halves-packed formats; K must hold whole superblocks (and >=2048
    for the K-quants' [K/256, N] plane 8-sublane rule)."""
    return (m > _GP_MAX_M and qt.ggml_type in _SH_QTYPES
            and qt.shape[1] % _gp_min_tk(qt.ggml_type) == 0)


def _sh_split_grp(a: jax.Array, tk: int, tn: int):
    """[tk/32, tn] original-group-order plane -> (lo, hi) halves, each
    [tk/64, tn]: superblock groups 0..3 are the low-nibble half, 4..7 the
    high half (sublane-axis reshape/slice only)."""
    g = a.reshape(tk // 256, 8, tn)
    return (g[:, :4, :].reshape(tk // 64, tn),
            g[:, 4:, :].reshape(tk // 64, tn))


def _sh_qh_halves(qh: jax.Array, tk: int, tn: int):
    """[tk/8, tn] original-order high-bit plane -> per-half expanded bit
    arrays [tk/2, tn] (int32 0/1). Original element o = s·256 + h·128 + r
    lives at qh row o//8 = s·32 + h·16 + r//8, bit r%8."""
    i32 = jnp.int32
    q = qh.astype(i32).reshape(tk // 256, 2, 16, tn)
    out = []
    for h in (0, 1):
        e = _expand_rows(q[:, h].reshape(tk // 16, tn), 8)  # [tk/2, tn]
        sh = jax.lax.broadcasted_iota(i32, e.shape, 0) % 8
        out.append((e >> sh) & 1)
    return out[0], out[1]


def _sh_scales(t: GGMLType, refs, tk: int, tn: int):
    """Per-format centered dequant pieces. The law w = q·dl − ml is
    rewritten w = (q − t)·dl − ml_res with t = ml/dl (so the bf16 weight
    keeps the reference's centered magnitude — rounding the uncentered
    q·dl costs ~2× the error) and ml_res = ml − t·dl, exactly zero except
    on dl==0 guard groups, folded back by an xs side-dot.

    Returns (dl_lo, dl_hi, t_lo, t_hi) expanded to [tk/2, tn] f32 — t as
    scalars for the const-offset legacy formats — plus ml_res
    [tk/32, tn] | None."""
    f32 = jnp.float32
    if t in (GGMLType.Q4_K, GGMLType.Q5_K):
        sc = refs["sc"][...].astype(jnp.int32).astype(f32)
        mn = refs["mn"][...].astype(jnp.int32).astype(f32)
        dl = _expand_rows(refs["d"][...], 8) * sc   # [tk/32, tn]
        ml = _expand_rows(refs["dm"][...], 8) * mn
        tt = jnp.where(dl != 0.0, ml / jnp.where(dl != 0.0, dl, 1.0), 0.0)
        ml_res = ml - tt * dl
        dlo, dhi = _sh_split_grp(dl, tk, tn)
        tlo, thi = _sh_split_grp(tt, tk, tn)
        return (_expand_rows(dlo, 32), _expand_rows(dhi, 32),
                _expand_rows(tlo, 32), _expand_rows(thi, 32), ml_res)
    d = refs["d"][...]  # legacy per-32 formats: [tk/32, tn]
    if t in (GGMLType.Q4_0, GGMLType.Q5_0):
        off = 8.0 if t == GGMLType.Q4_0 else 16.0
        dlo, dhi = _sh_split_grp(d, tk, tn)
        return (_expand_rows(dlo, 32), _expand_rows(dhi, 32),
                off, off, None)
    # Q4_1 / Q5_1: dequant is q*d + m -> ml = -m
    m = refs["dm"][...]
    tt = jnp.where(d != 0.0, -m / jnp.where(d != 0.0, d, 1.0), 0.0)
    ml_res = -m - tt * d
    dlo, dhi = _sh_split_grp(d, tk, tn)
    tlo, thi = _sh_split_grp(tt, tk, tn)
    return (_expand_rows(dlo, 32), _expand_rows(dhi, 32),
            _expand_rows(tlo, 32), _expand_rows(thi, 32), ml_res)


def _make_sh_kernel(t: GGMLType, names: tuple[str, ...], nk: int, out_dtype,
                    tk: int, tn: int):
    five_bit = t in (GGMLType.Q5_K, GGMLType.Q5_0, GGMLType.Q5_1)

    def kernel(xlo_ref, xhi_ref, xs_ref, *rest):
        refs = {nm: rest[i] for i, nm in enumerate(names)}
        o_ref = rest[len(names)]
        acc_ref = rest[len(names) + 1]
        kk = pl.program_id(2)

        @pl.when(kk == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        qp = refs["q"][...].astype(jnp.int32)        # [tk/2, tn]
        lo = (qp & 0xF).astype(jnp.float32)
        hi = (qp >> 4).astype(jnp.float32)
        dl_lo, dl_hi, t_lo, t_hi, ml_res = _sh_scales(t, refs, tk, tn)
        if five_bit:
            hb_lo, hb_hi = _sh_qh_halves(refs["qh"][...], tk, tn)
            lo = lo + hb_lo.astype(jnp.float32) * 16.0
            hi = hi + hb_hi.astype(jnp.float32) * 16.0
        w_lo = ((lo - t_lo) * dl_lo).astype(jnp.bfloat16)
        w_hi = ((hi - t_hi) * dl_hi).astype(jnp.bfloat16)
        dn = (((1,), (0,)), ((), ()))
        acc = jax.lax.dot_general(xlo_ref[...], w_lo, dn,
                                  preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(xhi_ref[...], w_hi, dn,
                                   preferred_element_type=jnp.float32)
        if ml_res is not None:
            # guard-group residual, exactly zero on normal groups; f32 dot
            # at 1/32 of the main MACs is free
            acc -= jax.lax.dot_general(xs_ref[...], ml_res, dn,
                                       preferred_element_type=jnp.float32)
        acc_ref[...] += acc

        @pl.when(kk == nk - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "out_dtype",
                              "interpret", "vmem_limit")
)
def qmatmul_splith_pallas(
    x: jax.Array,
    qt: QTensor,
    *,
    block_m: int = 256,
    block_n: int | None = None,
    block_k: int | None = None,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    vmem_limit: int | None = None,
) -> jax.Array:
    """Prefill (large-M) fused matmul: split-half dequant + min side-dot."""
    m, k = x.shape
    n, k2 = qt.shape
    assert k == k2 and qt.ggml_type in _SH_QTYPES, (x.shape, qt.shape)
    if block_n is None and os.environ.get("OMNI_SH_BN"):
        block_n = int(os.environ["OMNI_SH_BN"])  # tile-sweep override
    if block_n is None or block_k is None:
        auto_n, auto_k = _auto_tiles(m, n, k)
        block_n = block_n or auto_n
        block_k = block_k or auto_k
    granule = max(tile_granule(qt.ggml_type), _gp_min_tk(qt.ggml_type), 256)
    tm = min(block_m, m)
    tn = min(block_n, n)
    tk = max(granule, min(block_k, k))
    while k % tk != 0:
        tk -= granule
    grid = (pl.cdiv(m, tm), pl.cdiv(n, tn), pl.cdiv(k, tk))

    # pre-split x to the plane element order (lane-axis reshapes are fine
    # in XLA, unsupported inside Mosaic) + per-32-group sums for the side
    # dot. All three are tiny next to the [K, N] weight stream.
    xb = x.astype(jnp.bfloat16)
    xsb = xb.reshape(m, k // 256, 2, 128)
    x_lo = xsb[:, :, 0, :].reshape(m, k // 2)
    x_hi = xsb[:, :, 1, :].reshape(m, k // 2)
    xs = x.astype(jnp.float32).reshape(m, k // 32, 32).sum(-1)

    planes = qt.planes()
    names = tuple(planes)
    divs = _PLANE_DIV[qt.ggml_type]
    in_specs = [
        pl.BlockSpec((tm, tk // 2), lambda i, j, kk: (i, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, tk // 2), lambda i, j, kk: (i, kk),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, tk // 32), lambda i, j, kk: (i, kk),
                     memory_space=pltpu.VMEM),
    ]
    for nm in names:
        dv = divs[nm]
        in_specs.append(
            pl.BlockSpec(
                (tk // dv, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM
            )
        )

    flops = 2 * m * n * k
    bytes_accessed = 3 * x.size * 2 + qt.nbytes + m * n * 4
    return pl.pallas_call(
        _make_sh_kernel(qt.ggml_type, names, grid[2], out_dtype, tk, tn),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit),
        interpret=interpret,
    )(x_lo, x_hi, xs, *[planes[nm] for nm in names])


def qmatmul_xla(x: jax.Array, qt: QTensor, out_dtype=jnp.bfloat16) -> jax.Array:
    """Reference/fallback path: full dequant via XLA then plain matmul."""
    w_t = dequant_t(qt, jnp.bfloat16)  # [K, N]
    return jax.lax.dot_general(
        x.astype(jnp.bfloat16), w_t, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def matmul(x: jax.Array, w, out_dtype=jnp.bfloat16) -> jax.Array:
    """Unified linear: `w` is a QTensor (fused kernel on TPU, XLA fallback
    elsewhere), a plain [N, K] array, or a LoraWeight (base + low-rank
    delta via two skinny matmuls — reference build_lora_mm role)."""
    if type(w).__name__ == "LoraWeight":  # avoid circular import
        y = matmul(x, w.base, out_dtype=jnp.float32)
        xa = jax.lax.dot_general(
            x.astype(jnp.bfloat16), w.a.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        delta = jax.lax.dot_general(
            xa.astype(jnp.bfloat16), w.b.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        return (y + w.scale * delta).astype(out_dtype)
    if isinstance(w, QTensor):
        if jax.default_backend() == "tpu":
            if (_GP_DECODE and gp_supported(x.shape[0], w)
                    and (x.shape[0] == 1 or _GP_SMALLM)):
                return qmatmul_gp_pallas(x, w, out_dtype=out_dtype)
            if _SH_PREFILL and sh_supported(x.shape[0], w):
                return qmatmul_splith_pallas(x, w, out_dtype=out_dtype)
            return qmatmul_pallas(x, w, out_dtype=out_dtype)
        return qmatmul_xla(x, w, out_dtype=out_dtype)
    return jax.lax.dot_general(
        x.astype(w.dtype), w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)
