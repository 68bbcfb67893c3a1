"""TPU-side quantized weight layouts.

GGUF block formats (AoS: scales and quants interleaved per block) are
hostile to TPU vector lanes, so at load time each quantized tensor is
repacked ONCE on the host into a structure-of-arrays `QTensor`:

- `q`     — bit-packed quants, laid out so unpacking is two slices +
            shifts (no lane interleave): byte j of a row holds element j in
            the low nibble and element j + K/2 in the high nibble.
- `sc/mn` — per-32/16-group integer sub-scales (int8), straight from the
            superblock's packed 6-bit lanes.
- `d/dm`  — per-superblock f16 super-scales widened to f32.

Dequantization stays bit-exact with the reference semantics
(/root/reference/ggml/src/ggml-quants.c): the effective group scale is the
single f32 product d*sc, exactly as the reference computes it; repacking is
a pure permutation. This plays the role of the reference's CUDA
`convert.cu` / `mmq.cu` tile layouts, re-designed for TPU lanes.

Formats with native kernels: Q4_K, Q5_K, Q6_K, Q8_0. Everything else is
dequantized to bf16/f32 at load time by `omni_tpu.core.quants`.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.dtypes import GGMLType, QK_K, type_traits
from ..core import quants as nq

NATIVE_QTYPES = (GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q8_0)


@jax.tree_util.register_pytree_node_class
@dataclass
class QTensor:
    """A quantized 2-D weight [N, K] in TPU SoA layout."""

    ggml_type: GGMLType
    shape: tuple[int, ...]  # logical (N, K)
    q: jax.Array  # packed quants
    sc: jax.Array | None  # int8 group sub-scales
    mn: jax.Array | None  # int8 group sub-mins (affine formats)
    d: jax.Array  # f32 super-scales
    dm: jax.Array | None  # f32 super-min-scales (affine formats)
    qh: jax.Array | None = None  # high-bit plane (Q5_K)

    def tree_flatten(self):
        return (self.q, self.sc, self.mn, self.d, self.dm, self.qh), (self.ggml_type, self.shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], *children)

    @property
    def nbytes(self) -> int:
        return sum(a.size * a.dtype.itemsize for a in
                   (self.q, self.sc, self.mn, self.d, self.dm) if a is not None)


# --------------------------------------------------------------------------
# host-side repack (numpy, once at load)
# --------------------------------------------------------------------------

def _pack_halves(q: np.ndarray) -> np.ndarray:
    """[N, K] 4-bit values -> [N, K/2] bytes, element j | element j+K/2 << 4."""
    n, k = q.shape
    return (q[:, : k // 2] | (q[:, k // 2 :] << np.uint8(4))).astype(np.uint8)


def repack(blocks: np.ndarray, ggml_type: GGMLType, shape: tuple[int, int]) -> QTensor:
    """GGUF block bytes -> SoA QTensor (host numpy -> device arrays)."""
    t = GGMLType(ggml_type)
    n, k = shape
    tr = type_traits(t)
    b = np.ascontiguousarray(blocks, dtype=np.uint8).reshape(-1, tr.type_size)
    nsb = b.shape[0] // n  # superblocks per row

    if t == GGMLType.Q8_0:
        d = nq._f16(b[:, :2]).reshape(n, k // 32)
        q = b[:, 2:].view(np.int8).reshape(n, k)
        return QTensor(t, shape, jnp.asarray(q), None, None, jnp.asarray(d), None)

    if t == GGMLType.Q4_K:
        d = nq._f16(b[:, :2]).reshape(n, nsb)
        dm = nq._f16(b[:, 2:4]).reshape(n, nsb)
        sc6, mn6 = nq._unpack_scale_min_k4(b[:, 4:16])
        q = nq._split_nibbles(b[:, 16:], 32).reshape(n, k)  # element order 0..255/superblock
        return QTensor(
            t, shape,
            jnp.asarray(_pack_halves(q)),
            jnp.asarray(sc6.reshape(n, nsb * 8).view(np.int8)),
            jnp.asarray(mn6.reshape(n, nsb * 8).view(np.int8)),
            jnp.asarray(d), jnp.asarray(dm),
        )

    if t == GGMLType.Q5_K:
        d = nq._f16(b[:, :2]).reshape(n, nsb)
        dm = nq._f16(b[:, 2:4]).reshape(n, nsb)
        sc6, mn6 = nq._unpack_scale_min_k4(b[:, 4:16])
        hi = nq._expand_bits(b[:, 16:48], list(range(8)), 32, 1)
        lo = nq._split_nibbles(b[:, 48:], 32)
        q = (lo | (hi << np.uint8(4))).reshape(n, k)  # 5-bit values 0..31
        # store 5-bit values as low nibble + separate high-bit plane
        q4 = _pack_halves(q & np.uint8(0xF))
        qh = np.packbits(q.reshape(n, k) >> 4, axis=-1, bitorder="little")
        return QTensor(
            t, shape,
            jnp.asarray(q4),
            jnp.asarray(sc6.reshape(n, nsb * 8).view(np.int8)),
            jnp.asarray(mn6.reshape(n, nsb * 8).view(np.int8)),
            jnp.asarray(d), jnp.asarray(dm),
            qh=jnp.asarray(qh),
        )

    if t == GGMLType.Q6_K:
        ql = nq._split_nibbles(b[:, :128], 64)
        qh = nq._expand_bits(b[:, 128:192], [0, 2, 4, 6], 32, 3)
        q = ((ql | (qh << np.uint8(4))).astype(np.int8) - np.int8(32)).reshape(n, k)
        scales = b[:, 192:208].view(np.int8).reshape(n, nsb * 16)
        d = nq._f16(b[:, 208:210]).reshape(n, nsb)
        # 6-bit values in [-32, 31] stored as int8 (sign-extended); 8 bits vs
        # 6.56 on disk — traded for shift-free int8 loads on the VPU.
        return QTensor(t, shape, jnp.asarray(q), jnp.asarray(scales), None,
                       jnp.asarray(d), None)

    raise NotImplementedError(f"repack: {t.name}")


# --------------------------------------------------------------------------
# jnp dequantization (XLA fallback path; also the kernels' reference)
# --------------------------------------------------------------------------

GROUP = {GGMLType.Q4_K: 32, GGMLType.Q5_K: 32, GGMLType.Q6_K: 16, GGMLType.Q8_0: 32}


def _unpack_halves(qp: jax.Array, k: int) -> jax.Array:
    """[N, K/2] bytes -> [N, K] uint8 (inverse of `_pack_halves`)."""
    return jnp.concatenate([qp & jnp.uint8(0xF), qp >> jnp.uint8(4)], axis=-1)


def dequant(qt: QTensor, dtype=jnp.float32) -> jax.Array:
    """Full dequantization of a QTensor via XLA ops (bit-exact in f32)."""
    n, k = qt.shape
    t = qt.ggml_type
    if t == GGMLType.Q8_0:
        d = jnp.repeat(qt.d, 32, axis=-1)
        return (qt.q.astype(jnp.float32) * d).astype(dtype)
    if t in (GGMLType.Q4_K, GGMLType.Q5_K):
        q = _unpack_halves(qt.q, k).astype(jnp.float32)
        if t == GGMLType.Q5_K:
            sh = jnp.arange(8, dtype=jnp.uint8).reshape(1, 1, 8)
            bits = ((qt.qh[..., None] >> sh) & jnp.uint8(1)).astype(jnp.float32)
            q = q + bits.reshape(n, k) * 16.0
        dl = (qt.d[..., None] * qt.sc.reshape(n, -1, 8).astype(jnp.float32)).reshape(n, k // 32)
        ml = (qt.dm[..., None] * qt.mn.reshape(n, -1, 8).astype(jnp.float32)).reshape(n, k // 32)
        out = q.reshape(n, k // 32, 32) * dl[..., None] - ml[..., None]
        return out.reshape(n, k).astype(dtype)
    if t == GGMLType.Q6_K:
        dl = (qt.d[..., None] * qt.sc.reshape(n, -1, 16).astype(jnp.float32)).reshape(n, k // 16)
        out = qt.q.astype(jnp.float32).reshape(n, k // 16, 16) * dl[..., None]
        return out.reshape(n, k).astype(dtype)
    raise NotImplementedError(t.name)


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
    if keep_quantized and t in NATIVE_QTYPES and len(shape) == 2:
        return repack(blocks, t, shape)  # type: ignore[arg-type]
    x = nq.dequantize(np.asarray(blocks), t, shape)
    return jnp.asarray(x, dtype=jnp.float32 if len(shape) == 1 else dtype)
