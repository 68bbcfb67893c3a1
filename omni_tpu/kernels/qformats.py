"""TPU-side quantized weight layouts.

GGUF block formats (AoS: scales and quants interleaved per block) are
hostile to TPU vector lanes, so at load time each quantized tensor is
repacked ONCE on the host into a structure-of-arrays `QTensor`, stored
**K-major (transposed)**: a weight W[N, K] becomes planes shaped [K', N].
Quant groups then lie along the *sublane* axis, where Mosaic supports the
broadcast-and-collapse needed to expand per-group scales (lane-axis
expansion does not lower); the matmul consumes the tile directly as the
RHS of x[M,K] @ W_t[K,N].

Planes per format (rows × N):
- Q8_0: q int8 [K], d f32 [K/32]
- Q4_K: q u8 [K/2] (superblock-local halves: byte row r of superblock s
  holds element s·256+r in the low nibble and s·256+128+r in the high),
  sc/mn int8 [K/32], d/dm f32 [K/256]
- Q5_K: Q4_K planes + qh u8 [K/8] (bit b of row r = high bit of element
  8r+b, original element order)
- Q6_K: q int8 [K] (sign-extended 6-bit), sc int8 [K/16], d f32 [K/256]

Dequantization stays bit-exact with the reference semantics
(/root/reference/ggml/src/ggml-quants.c): the effective group scale is the
single f32 product d*sc exactly as the reference computes it; repacking is
a pure permutation. This plays the role of the reference's CUDA
`convert.cu` / `mmq.cu` tile layouts, re-designed for TPU tiling.

Formats without native kernels are dequantized to bf16 at load time.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import GGMLType, QK_K, type_traits
from ..core import quants as nq

NATIVE_QTYPES = (
    GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q8_0,
    # round-3 additions (VERDICT r2 #6): legacy nibble/byte-plane formats
    # keep their packed nibbles + per-32 scales; the IQ4/MXFP4 codebook
    # formats repack to int8 VALUE planes (the Q6_K trade: byte loads over
    # in-kernel gathers), still 2x denser than bf16
    GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
    GGMLType.IQ4_NL, GGMLType.IQ4_XS, GGMLType.MXFP4,
    # round-4: the low-bit K-quants keep disk density in HBM — Q2_K packs
    # 4 values/byte (superblock-local quarters), Q3_K packs (q+4) as a
    # 2-bit quarter plane + a Q5_K-style high-bit plane
    GGMLType.Q2_K, GGMLType.Q3_K,
)

# minimum K multiple a format needs for the fused kernel's plane layout:
# nibble planes use superblock-half packing (256); int8-plane formats only
# need their 32-wide scale groups
_INT8_PLANE = (GGMLType.Q8_0, GGMLType.IQ4_NL, GGMLType.MXFP4)


def tile_granule(t: GGMLType) -> int:
    return 32 if t in _INT8_PLANE else 256


@jax.tree_util.register_pytree_node_class
@dataclass
class QTensor:
    """A quantized 2-D weight, logical shape [N, K], planes stored [K', N]."""

    ggml_type: GGMLType
    shape: tuple[int, ...]  # logical (N, K)
    q: jax.Array  # packed quants [K or K/2, N]
    sc: jax.Array | None  # int8 group sub-scales [K/g, N]
    mn: jax.Array | None  # int8 group sub-mins [K/g, N]
    d: jax.Array  # f32 super-scales [K/256 or K/32, N]
    dm: jax.Array | None  # f32 super-min-scales
    qh: jax.Array | None = None  # high-bit plane [K/8, N] (Q5_K)

    def tree_flatten(self):
        return (self.q, self.sc, self.mn, self.d, self.dm, self.qh), (
            self.ggml_type, self.shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], *children)

    @property
    def nbytes(self) -> int:
        return sum(a.size * a.dtype.itemsize for a in
                   (self.q, self.sc, self.mn, self.d, self.dm, self.qh)
                   if a is not None)

    def planes(self) -> dict[str, jax.Array]:
        out = {"q": self.q, "d": self.d}
        for nm in ("sc", "mn", "dm", "qh"):
            a = getattr(self, nm)
            if a is not None:
                out[nm] = a
        return out


# --------------------------------------------------------------------------
# host-side repack (numpy, once at load)
# --------------------------------------------------------------------------

def _pack_sb_halves(q: np.ndarray) -> np.ndarray:
    """[N, K] 4-bit values -> [N, K/2] bytes with superblock-local halves."""
    n, k = q.shape
    s = q.reshape(n, k // QK_K, 2, 128)
    return (s[:, :, 0, :] | (s[:, :, 1, :] << np.uint8(4))).reshape(n, k // 2)


def _pack_sb_quarters(q: np.ndarray) -> np.ndarray:
    """[N, K] 2-bit values -> [N, K/4] bytes with superblock-local
    quarters: byte row r of superblock s holds elements s*256 + j*64 + r
    at shift 2j."""
    n, k = q.shape
    s = q.reshape(n, k // QK_K, 4, 64)
    return (s[:, :, 0] | (s[:, :, 1] << np.uint8(2))
            | (s[:, :, 2] << np.uint8(4))
            | (s[:, :, 3] << np.uint8(6))).reshape(n, k // 4)


def repack(blocks: np.ndarray, ggml_type: GGMLType, shape: tuple[int, int]) -> QTensor:
    """GGUF block bytes -> K-major SoA QTensor. The multithreaded C++
    repacker (native/quants.cpp, bit-identical) takes the multi-GB
    load-time pass when built."""
    t = GGMLType(ggml_type)
    n, k = shape
    import os

    if os.environ.get("OMNI_NATIVE", "1") != "0":
        from .. import native_ext

        planes = native_ext.repack(int(t), np.ascontiguousarray(blocks), n, k)
        if planes is not None:
            j = {nm: jnp.asarray(a) for nm, a in planes.items()}
            return QTensor(t, shape, j["q"], j.get("sc"), j.get("mn"),
                           j["d"], j.get("dm"), qh=j.get("qh"))
    tr = type_traits(t)
    b = np.ascontiguousarray(blocks, dtype=np.uint8).reshape(-1, tr.type_size)
    nsb = b.shape[0] // n  # superblocks per row

    def T(a):  # host transpose -> device
        return jnp.asarray(np.ascontiguousarray(a.T))

    if t == GGMLType.Q8_0:
        d = nq._f16(b[:, :2]).reshape(n, k // 32)
        q = b[:, 2:].view(np.int8).reshape(n, k)
        return QTensor(t, shape, T(q), None, None, T(d), None)

    if t in (GGMLType.Q4_K, GGMLType.Q5_K):
        d = nq._f16(b[:, :2]).reshape(n, nsb)
        dm = nq._f16(b[:, 2:4]).reshape(n, nsb)
        sc6, mn6 = nq._unpack_scale_min_k4(b[:, 4:16])
        if t == GGMLType.Q4_K:
            q = nq._split_nibbles(b[:, 16:], 32).reshape(n, k)
            qh_plane = None
        else:
            hi = nq._expand_bits(b[:, 16:48], list(range(8)), 32, 1)
            lo = nq._split_nibbles(b[:, 48:], 32)
            q5 = (lo | (hi << np.uint8(4))).reshape(n, k)
            q = q5 & np.uint8(0xF)
            qh_plane = T(np.packbits(q5 >> 4, axis=-1, bitorder="little"))
        return QTensor(
            t, shape,
            T(_pack_sb_halves(q)),
            T(sc6.reshape(n, nsb * 8).view(np.int8)),
            T(mn6.reshape(n, nsb * 8).view(np.int8)),
            T(d), T(dm), qh=qh_plane,
        )

    if t == GGMLType.Q2_K:
        scales = b[:, :16]  # per-16 group: low 4 bits scale, high min
        d = nq._f16(b[:, 80:82]).reshape(n, nsb)
        dm = nq._f16(b[:, 82:84]).reshape(n, nsb)
        q = nq._expand_bits(b[:, 16:80], [0, 2, 4, 6], 32, 3).reshape(n, k)
        sc = (scales & np.uint8(0xF)).reshape(n, nsb * 16).view(np.int8)
        mn = (scales >> np.uint8(4)).reshape(n, nsb * 16).view(np.int8)
        return QTensor(t, shape, T(_pack_sb_quarters(q)), T(sc), T(mn),
                       T(d), T(dm))

    if t == GGMLType.Q3_K:
        hmask, qs, scales = b[:, :32], b[:, 32:96], b[:, 96:108]
        d = nq._f16(b[:, 108:110]).reshape(n, nsb)
        sc = nq._unpack_scales_q3k(scales).reshape(n, nsb * 16)  # int8
        ql = nq._expand_bits(qs, [0, 2, 4, 6], 32, 3)
        qh = nq._expand_bits(hmask, list(range(8)), 32, 1)
        # ggml: SET hmask bit means "do not subtract 4", i.e.
        # q = ql + 4*h - 4 -> store q+4 = ql + 4*h in [0, 7] as a 2-bit
        # quarter plane + a Q5_K-style high-bit plane
        qplus = (ql + (qh << np.uint8(2))).reshape(n, k)
        qh_plane = T(np.packbits(qplus >> 2, axis=-1, bitorder="little"))
        return QTensor(t, shape,
                       T(_pack_sb_quarters(qplus & np.uint8(3))),
                       T(sc), None, T(d), None, qh=qh_plane)

    if t == GGMLType.Q6_K:
        ql = nq._split_nibbles(b[:, :128], 64)
        qh = nq._expand_bits(b[:, 128:192], [0, 2, 4, 6], 32, 3)
        q = ((ql | (qh << np.uint8(4))).astype(np.int8) - np.int8(32)).reshape(n, k)
        scales = b[:, 192:208].view(np.int8).reshape(n, nsb * 16)
        d = nq._f16(b[:, 208:210]).reshape(n, nsb)
        # 6-bit values stored sign-extended int8: 8 bits vs 6.56 on disk,
        # traded for shift-free int8 sublane loads
        return QTensor(t, shape, T(q), T(scales), None, T(d), None)

    if t in (GGMLType.Q4_0, GGMLType.Q4_1):
        off = 2 if t == GGMLType.Q4_0 else 4
        d = nq._f16(b[:, :2]).reshape(n, k // 32)
        m = (None if t == GGMLType.Q4_0
             else T(nq._f16(b[:, 2:4]).reshape(n, k // 32)))
        q = nq._split_nibbles(b[:, off:], 16).reshape(n, k)
        return QTensor(t, shape, T(_pack_sb_halves(q)), None, None, T(d), m)

    if t in (GGMLType.Q5_0, GGMLType.Q5_1):
        off = 2 if t == GGMLType.Q5_0 else 4
        d = nq._f16(b[:, :2]).reshape(n, k // 32)
        m = (None if t == GGMLType.Q5_0
             else T(nq._f16(b[:, 2:4]).reshape(n, k // 32)))
        hi = nq._qh_bits(b[:, off:off + 4])
        lo = nq._split_nibbles(b[:, off + 4:], 16)
        q5 = (lo | (hi << np.uint8(4))).reshape(n, k)
        qh_plane = T(np.packbits(q5 >> 4, axis=-1, bitorder="little"))
        return QTensor(t, shape, T(_pack_sb_halves(q5 & np.uint8(0xF))),
                       None, None, T(d), m, qh=qh_plane)

    if t in (GGMLType.IQ4_NL, GGMLType.MXFP4):
        # int8 VALUE plane: the 16-entry codebook is applied at load
        if t == GGMLType.IQ4_NL:
            d = nq._f16(b[:, :2]).reshape(n, k // 32)
            idx = nq._split_nibbles(b[:, 2:], 16).astype(np.int64)
            vals = nq._IQ4NL_KVALUES[idx].reshape(n, k)
        else:
            d = nq._e8m0_half(b[:, :1]).reshape(n, k // 32)
            idx = nq._split_nibbles(b[:, 1:], 16).astype(np.int64)
            vals = nq._MXFP4_KVALUES[idx].astype(np.int8).reshape(n, k)
        return QTensor(t, shape, T(vals), None, None,
                       T(d.astype(np.float32)), None)

    if t == GGMLType.IQ4_XS:
        d = nq._f16(b[:, :2]).reshape(n, nsb)
        sh = b[:, 2:4].copy().view("<u2").astype(np.uint32)
        lo4 = nq._split_nibbles(b[:, 4:4 + QK_K // 64], 1)
        hi2 = ((sh >> (2 * np.arange(QK_K // 32, dtype=np.uint32)[None, :]))
               & np.uint32(3)).astype(np.uint8)
        scales = ((lo4 | (hi2 << np.uint8(4))).astype(np.int8)
                  .astype(np.int16) - 32).astype(np.int8)  # [-32, 31]
        idx = nq._split_nibbles(
            b[:, 4 + QK_K // 64:].reshape(b.shape[0] * (QK_K // 32), 16),
            16).astype(np.int64)
        vals = nq._IQ4NL_KVALUES[idx].reshape(n, k)
        return QTensor(t, shape, T(vals), T(scales.reshape(n, nsb * 8)),
                       None, T(d), None)

    raise NotImplementedError(f"repack: {t.name}")


# --------------------------------------------------------------------------
# tile dequantization — shared by the Pallas kernel and the XLA fallback.
# All ops are sublane-axis only (Mosaic-lowerable): leading-dim reshapes,
# sublane broadcast/collapse, iota on dim 0.
# --------------------------------------------------------------------------

def _expand_rows(a: jax.Array, r: int) -> jax.Array:
    """[G, N] -> [G*r, N], each row repeated r times (sublane broadcast)."""
    g, n = a.shape
    return jnp.broadcast_to(a[:, None, :], (g, r, n)).reshape(g * r, n)


def _unpack_sb_halves(qp: jax.Array) -> jax.Array:
    """[K/2, N] packed bytes -> [K, N] uint8-as-int32, original element order."""
    rows, n = qp.shape
    qp = qp.astype(jnp.int32)
    lo = (qp & 0xF).reshape(rows // 128, 1, 128, n)
    hi = (qp >> 4).reshape(rows // 128, 1, 128, n)
    return jnp.concatenate([lo, hi], axis=1).reshape(rows * 2, n)


def _unpack_sb_quarters(qp: jax.Array) -> jax.Array:
    """[K/4, N] packed 2-bit quarters -> [K, N] int32, original order."""
    rows, n = qp.shape
    qp = qp.astype(jnp.int32)
    parts = [((qp >> (2 * j)) & 3).reshape(rows // 64, 1, 64, n)
             for j in range(4)]
    return jnp.concatenate(parts, axis=1).reshape(rows * 4, n)


def dequant_tile(t: GGMLType, p: dict[str, jax.Array], dtype=jnp.float32) -> jax.Array:
    """Dequantize plane tile(s) -> [K_tile, N_tile] float. K_tile must be a
    multiple of the superblock (256) for K-quants / 32 for Q8_0."""
    if t == GGMLType.Q8_0:
        q = p["q"].astype(jnp.int32).astype(jnp.float32)
        return (q * _expand_rows(p["d"], 32)).astype(dtype)

    if t in (GGMLType.Q4_K, GGMLType.Q5_K):
        q = _unpack_sb_halves(p["q"]).astype(jnp.float32)
        kt, n = q.shape
        if t == GGMLType.Q5_K:
            qh = _expand_rows(p["qh"].astype(jnp.int32), 8)
            sh = jax.lax.broadcasted_iota(jnp.int32, qh.shape, 0) % 8
            q = q + ((qh >> sh) & 1).astype(jnp.float32) * 16.0
        sc = p["sc"].astype(jnp.int32).astype(jnp.float32)
        mn = p["mn"].astype(jnp.int32).astype(jnp.float32)
        dl = _expand_rows(p["d"], 8) * sc  # [K/32, N] f32, exact d*sc
        ml = _expand_rows(p["dm"], 8) * mn
        return (q * _expand_rows(dl, 32) - _expand_rows(ml, 32)).astype(dtype)

    if t == GGMLType.Q6_K:
        q = p["q"].astype(jnp.int32).astype(jnp.float32)
        sc = p["sc"].astype(jnp.int32).astype(jnp.float32)
        dl = _expand_rows(p["d"], 16) * sc  # [K/16, N]
        return (q * _expand_rows(dl, 16)).astype(dtype)

    if t == GGMLType.Q2_K:
        q = _unpack_sb_quarters(p["q"]).astype(jnp.float32)
        sc = p["sc"].astype(jnp.int32).astype(jnp.float32)
        mn = p["mn"].astype(jnp.int32).astype(jnp.float32)
        dl = _expand_rows(p["d"], 16) * sc  # [K/16, N]
        ml = _expand_rows(p["dm"], 16) * mn
        return (q * _expand_rows(dl, 16) - _expand_rows(ml, 16)).astype(dtype)

    if t == GGMLType.Q3_K:
        q = _unpack_sb_quarters(p["q"])
        qh = _expand_rows(p["qh"].astype(jnp.int32), 8)
        sh = jax.lax.broadcasted_iota(jnp.int32, qh.shape, 0) % 8
        q = (q + ((qh >> sh) & 1) * 4 - 4).astype(jnp.float32)
        sc = p["sc"].astype(jnp.int32).astype(jnp.float32)
        dl = _expand_rows(p["d"], 16) * sc
        return (q * _expand_rows(dl, 16)).astype(dtype)

    if t in (GGMLType.Q4_0, GGMLType.Q4_1):
        q = _unpack_sb_halves(p["q"]).astype(jnp.float32)
        d = _expand_rows(p["d"], 32)
        if t == GGMLType.Q4_0:
            return ((q - 8.0) * d).astype(dtype)
        return (q * d + _expand_rows(p["dm"], 32)).astype(dtype)

    if t in (GGMLType.Q5_0, GGMLType.Q5_1):
        q = _unpack_sb_halves(p["q"]).astype(jnp.float32)
        qh = _expand_rows(p["qh"].astype(jnp.int32), 8)
        sh = jax.lax.broadcasted_iota(jnp.int32, qh.shape, 0) % 8
        q = q + ((qh >> sh) & 1).astype(jnp.float32) * 16.0
        d = _expand_rows(p["d"], 32)
        if t == GGMLType.Q5_0:
            return ((q - 16.0) * d).astype(dtype)
        return (q * d + _expand_rows(p["dm"], 32)).astype(dtype)

    if t in (GGMLType.IQ4_NL, GGMLType.MXFP4):
        # int8 value plane: same law as Q8_0
        q = p["q"].astype(jnp.int32).astype(jnp.float32)
        return (q * _expand_rows(p["d"], 32)).astype(dtype)

    if t == GGMLType.IQ4_XS:
        q = p["q"].astype(jnp.int32).astype(jnp.float32)
        sc = p["sc"].astype(jnp.int32).astype(jnp.float32)
        dl = _expand_rows(p["d"], 8) * sc  # [K/32, N]
        return (q * _expand_rows(dl, 32)).astype(dtype)

    raise NotImplementedError(t.name)


def dequant_t(qt: QTensor, dtype=jnp.float32) -> jax.Array:
    """Full dequantization -> [K, N] (transposed) via XLA ops."""
    return dequant_tile(qt.ggml_type, qt.planes(), dtype)


def dequant(qt: QTensor, dtype=jnp.float32) -> jax.Array:
    """Full dequantization -> logical [N, K]."""
    return dequant_t(qt, dtype).T


@jax.tree_util.register_pytree_node_class
@dataclass
class QExpertStack:
    """A stack of E same-shape quantized experts: every QTensor plane gains
    a leading expert axis [E, K', N]. Built for MoE:

    - `expert(i)` (static i) views one expert's planes — the capacity
      (prefill) path runs the fused dequant×matmul per expert;
    - `gather_dequant(idx)` (traced idx) gathers only the SELECTED
      experts' planes from HBM and dequantizes them — the decode path's
      weight traffic is ∝ k/E (the mul_mat_id design point; a dense
      all-experts pass would defeat quantization)."""

    ggml_type: GGMLType
    shape: tuple[int, ...]  # logical (E, N, K)
    planes_e: dict[str, jax.Array]

    def tree_flatten(self):
        names = tuple(sorted(self.planes_e))
        return tuple(self.planes_e[n] for n in names), (
            self.ggml_type, self.shape, names)

    @classmethod
    def tree_unflatten(cls, aux, children):
        t, shape, names = aux
        return cls(t, shape, dict(zip(names, children)))

    @property
    def n_experts(self) -> int:
        return self.shape[0]

    @staticmethod
    def stack(qts: list[QTensor]) -> "QExpertStack":
        t = qts[0].ggml_type
        planes = {}
        for nm in qts[0].planes():
            planes[nm] = jnp.stack([q.planes()[nm] for q in qts])
        return QExpertStack(t, (len(qts),) + tuple(qts[0].shape), planes)

    def expert(self, i: int) -> QTensor:
        p = {nm: a[i] for nm, a in self.planes_e.items()}
        return QTensor(self.ggml_type, tuple(self.shape[1:]), p["q"],
                       p.get("sc"), p.get("mn"), p["d"], p.get("dm"),
                       qh=p.get("qh"))

    def gather_dequant(self, idx: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
        """idx [M] traced expert ids -> dequantized K-major weights
        [M, K, N]; HBM reads touch only the selected experts' planes."""
        gathered = {nm: a[idx] for nm, a in self.planes_e.items()}
        return jax.vmap(
            lambda p: dequant_tile(self.ggml_type, p, dtype))(gathered)


def concat_qtensors(qts: list[QTensor]) -> QTensor:
    """Concatenate same-K QTensors along the output-feature axis (plane
    axis 1) — fuses QKV / gate+up into ONE kernel launch per group, the
    per-call-overhead killer for single-token decode."""
    t = qts[0].ggml_type
    k = qts[0].shape[1]
    assert all(q.ggml_type == t and q.shape[1] == k for q in qts), qts
    n_total = sum(q.shape[0] for q in qts)

    def cat(name):
        arrs = [getattr(q, name) for q in qts]
        if arrs[0] is None:
            return None
        return jnp.concatenate(arrs, axis=1)

    return QTensor(t, (n_total, k), cat("q"), cat("sc"), cat("mn"),
                   cat("d"), cat("dm"), qh=cat("qh"))


def load_quantized(blocks: np.ndarray, ggml_type: GGMLType,
                   shape: tuple[int, ...], keep_quantized: bool = True,
                   dtype=jnp.bfloat16):
    """Load-time policy: native formats stay quantized (QTensor), everything
    else dequantizes to `dtype`. 1-D tensors (norms, biases) always widen."""
    t = GGMLType(ggml_type)
    tr = type_traits(t)
    if not tr.is_quantized:
        x = nq.dequantize(blocks, t, shape)
        return jnp.asarray(x, dtype=jnp.float32 if len(shape) == 1 else dtype)
    if (keep_quantized and t in NATIVE_QTYPES and len(shape) == 2
            and shape[1] % tile_granule(t) == 0):
        return repack(blocks, t, shape)  # type: ignore[arg-type]
    if keep_quantized and len(shape) == 2 and t not in NATIVE_QTYPES:
        # the reference serves every type from its packed form
        # (ggml-quants.c vec_dot per type); here the exotic sub-4-bit
        # codebook formats widen to dense bf16 — ~4x their file size in
        # HBM. Warn once per type so the cost is visible.
        if t not in _warned_dense:
            _warned_dense.add(t)
            from ..log import warn

            bpw = tr.type_size * 8 / tr.block_size
            warn(f"{t.name}: no fused TPU kernel — dequantizing to dense "
                 f"16-bit in HBM (~{16 / bpw:.1f}x file size)")
    x = nq.dequantize(np.asarray(blocks), t, shape)
    return jnp.asarray(x, dtype=jnp.float32 if len(shape) == 1 else dtype)


_warned_dense: set = set()
