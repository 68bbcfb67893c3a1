"""Numpy reference quantization codecs for all GGUF block formats.

Dequantization is bit-exact to the reference semantics
(/root/reference/ggml/src/ggml-quants.c, layouts at
/root/reference/ggml/src/ggml-common.h:219-335): every scale is an f16
widened to f32, per-group effective scales are computed as f32 products, and
the element expansion order matches the on-disk block layout. Validated in
tests against the reference's own numpy codec (gguf-py) used as an oracle.

Quantization for the 32-element legacy formats matches the reference
round-to-nearest semantics; K-quant quantizers are quality-equivalent
re-designs (the reference uses iterative scale search in C,
ggml-quants.c `make_qkx2_quants`) — only *de*quantization must be bit-exact
for model-loading parity.

These run on the host at load/convert time; the TPU-side decode path uses
repacked layouts from `omni_tpu.kernels.qformats`.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from .dtypes import GGMLType, QK_K, type_traits

try:  # ml_dtypes ships with jax; used only for bf16 rounding
    import ml_dtypes

    _BF16 = np.dtype(ml_dtypes.bfloat16)
except ImportError:  # pragma: no cover
    _BF16 = None


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

def _f16(b: np.ndarray) -> np.ndarray:
    """f16 little-endian bytes -> f32."""
    return b.view("<f2").astype(np.float32)


def _to_f16_bytes(x: np.ndarray) -> np.ndarray:
    return x.astype("<f2").view(np.uint8)


def _split_nibbles(qs: np.ndarray, group: int) -> np.ndarray:
    """Expand nibble-packed bytes: each `group`-byte run yields `group` low
    nibbles followed by `group` high nibbles (the ggml convention)."""
    n = qs.shape[0]
    q = qs.reshape(n, -1, group)
    return np.stack([q & np.uint8(0xF), q >> np.uint8(4)], axis=2).reshape(n, -1)


def _pack_nibbles(q: np.ndarray, group: int) -> np.ndarray:
    """Inverse of `_split_nibbles`: q holds values 0..15."""
    n = q.shape[0]
    q = q.reshape(n, -1, 2, group)
    return (q[:, :, 0, :] | (q[:, :, 1, :] << np.uint8(4))).reshape(n, -1)


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """Round half away from zero, matching ggml's roundf()."""
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def _safe_inv(d: np.ndarray) -> np.ndarray:
    with np.errstate(divide="ignore"):
        return np.where(d == 0, 0.0, 1.0 / d).astype(np.float32)


def _expand_bits(b: np.ndarray, shifts: list[int], group: int, mask: int) -> np.ndarray:
    """Expand bit-packed bytes: each group of `group` bytes yields, for each
    shift in order, `group` values of (byte >> shift) & mask."""
    n = b.shape[0]
    q = b.reshape(n, -1, 1, group)
    sh = np.array(shifts, dtype=np.uint8).reshape(1, 1, len(shifts), 1)
    return ((q >> sh) & np.uint8(mask)).reshape(n, -1)


# --------------------------------------------------------------------------
# 32-element legacy formats
# --------------------------------------------------------------------------

def _deq_q4_0(b: np.ndarray) -> np.ndarray:
    d = _f16(b[:, :2])
    q = _split_nibbles(b[:, 2:], 16).astype(np.int8) - np.int8(8)
    return d * q.astype(np.float32)


def _q_q4_0(x: np.ndarray) -> np.ndarray:
    mx = np.take_along_axis(x, np.abs(x).argmax(axis=-1, keepdims=True), axis=-1)
    d = mx / -8
    q = np.trunc(x * _safe_inv(d) + np.float32(8.5)).astype(np.uint8).clip(0, 15)
    return np.concatenate([_to_f16_bytes(d), _pack_nibbles(q, 16)], axis=-1)


def _deq_q4_1(b: np.ndarray) -> np.ndarray:
    d, m = _f16(b[:, :2]), _f16(b[:, 2:4])
    q = _split_nibbles(b[:, 4:], 16).astype(np.float32)
    return d * q + m


def _q_q4_1(x: np.ndarray) -> np.ndarray:
    mn, mx = x.min(axis=-1, keepdims=True), x.max(axis=-1, keepdims=True)
    d = (mx - mn) / 15
    q = np.trunc((x - mn) * _safe_inv(d) + np.float32(0.5)).astype(np.uint8).clip(0, 15)
    return np.concatenate([_to_f16_bytes(d), _to_f16_bytes(mn), _pack_nibbles(q, 16)], axis=-1)


def _qh_bits(b4: np.ndarray) -> np.ndarray:
    """4-byte qh field -> 32 single bits per block."""
    n = b4.shape[0]
    qh = b4.reshape(n, 4).view("<u4").reshape(n, 1)
    return ((qh >> np.arange(32, dtype=np.uint32).reshape(1, 32)) & np.uint32(1)).astype(np.uint8)


def _pack_qh(bits: np.ndarray) -> np.ndarray:
    return np.packbits(bits.astype(np.uint8), axis=-1, bitorder="little")


def _deq_q5_0(b: np.ndarray) -> np.ndarray:
    d = _f16(b[:, :2])
    hi = _qh_bits(b[:, 2:6])
    lo = _split_nibbles(b[:, 6:], 16)
    q = (lo | (hi << np.uint8(4))).astype(np.int8) - np.int8(16)
    return d * q.astype(np.float32)


def _q_q5_0(x: np.ndarray) -> np.ndarray:
    mx = np.take_along_axis(x, np.abs(x).argmax(axis=-1, keepdims=True), axis=-1)
    d = mx / -16
    q = np.trunc(x * _safe_inv(d) + np.float32(16.5)).astype(np.uint8).clip(0, 31)
    return np.concatenate(
        [_to_f16_bytes(d), _pack_qh(q >> 4), _pack_nibbles(q & 0xF, 16)], axis=-1
    )


def _deq_q5_1(b: np.ndarray) -> np.ndarray:
    d, m = _f16(b[:, :2]), _f16(b[:, 2:4])
    hi = _qh_bits(b[:, 4:8])
    lo = _split_nibbles(b[:, 8:], 16)
    q = (lo | (hi << np.uint8(4))).astype(np.float32)
    return d * q + m


def _q_q5_1(x: np.ndarray) -> np.ndarray:
    mn, mx = x.min(axis=-1, keepdims=True), x.max(axis=-1, keepdims=True)
    d = (mx - mn) / 31
    q = np.trunc((x - mn) * _safe_inv(d) + np.float32(0.5)).astype(np.uint8).clip(0, 31)
    return np.concatenate(
        [_to_f16_bytes(d), _to_f16_bytes(mn), _pack_qh(q >> 4), _pack_nibbles(q & 0xF, 16)],
        axis=-1,
    )


def _deq_q8_0(b: np.ndarray) -> np.ndarray:
    d = _f16(b[:, :2])
    q = b[:, 2:].view(np.int8).astype(np.float32)
    return q * d


def _q_q8_0(x: np.ndarray) -> np.ndarray:
    d = np.abs(x).max(axis=-1, keepdims=True) / 127
    q = _round_half_away(x * _safe_inv(d)).astype(np.int8)
    return np.concatenate([_to_f16_bytes(d), q.view(np.uint8)], axis=-1)


# --------------------------------------------------------------------------
# K-quants (256-element superblocks)
# --------------------------------------------------------------------------

def _deq_q2_k(b: np.ndarray) -> np.ndarray:
    n = b.shape[0]
    scales, qs = b[:, :16], b[:, 16:80]
    d, dmin = _f16(b[:, 80:82]), _f16(b[:, 82:84])
    dl = (d * (scales & np.uint8(0xF)).astype(np.float32)).reshape(n, 16, 1)
    ml = (dmin * (scales >> np.uint8(4)).astype(np.float32)).reshape(n, 16, 1)
    q = _expand_bits(qs, [0, 2, 4, 6], 32, 3).reshape(n, 16, 16).astype(np.float32)
    return (dl * q - ml).reshape(n, QK_K)


def _q_q2_k(x: np.ndarray) -> np.ndarray:
    n = x.shape[0]
    xs = x.reshape(n, 16, 16)
    mn = np.minimum(xs.min(axis=-1), 0.0)
    mx = xs.max(axis=-1)
    sc_f = (mx - mn) / 3
    m_f = -mn
    d = (sc_f.max(axis=-1, keepdims=True) / 15).astype(np.float32)
    dmin = (m_f.max(axis=-1, keepdims=True) / 15).astype(np.float32)
    sc4 = _round_half_away(sc_f * _safe_inv(d)).clip(0, 15).astype(np.uint8)
    m4 = _round_half_away(m_f * _safe_inv(dmin)).clip(0, 15).astype(np.uint8)
    d16, dm16 = d.astype(np.float16).astype(np.float32), dmin.astype(np.float16).astype(np.float32)
    dl = d16 * sc4
    ml = dm16 * m4
    q = _round_half_away((xs + ml[..., None]) * _safe_inv(dl)[..., None]).clip(0, 3)
    q = q.astype(np.uint8).reshape(n, 2, 4, 32)
    sh = np.array([0, 2, 4, 6], dtype=np.uint8).reshape(1, 1, 4, 1)
    qs = np.bitwise_or.reduce(q << sh, axis=2).reshape(n, 64)
    scales = sc4 | (m4 << np.uint8(4))
    return np.concatenate(
        [scales, qs, _to_f16_bytes(d), _to_f16_bytes(dmin)], axis=-1
    )


def _unpack_scales_q3k(scales: np.ndarray) -> np.ndarray:
    """12 bytes -> 16 signed 6-bit scales (layout per ggml-quants.c)."""
    n = scales.shape[0]
    lo = _expand_bits(scales[:, :8], [0, 4], 8, 0xF)
    hi = _expand_bits(scales[:, 8:12], [0, 2, 4, 6], 4, 0x3)
    return (lo | (hi << np.uint8(4))).astype(np.int8) - np.int8(32)


def _pack_scales_q3k(sc: np.ndarray) -> np.ndarray:
    n = sc.shape[0]
    u = (sc.astype(np.int16) + 32).astype(np.uint8)  # 0..63
    lo, hi = u & np.uint8(0xF), u >> np.uint8(4)
    lo = lo.reshape(n, 2, 8)
    b07 = lo[:, 0, :] | (lo[:, 1, :] << np.uint8(4))
    hi = hi.reshape(n, 4, 4)
    sh = np.array([0, 2, 4, 6], dtype=np.uint8).reshape(1, 4, 1)
    b811 = np.bitwise_or.reduce(hi << sh, axis=1)
    return np.concatenate([b07, b811], axis=-1)


def _deq_q3_k(b: np.ndarray) -> np.ndarray:
    n = b.shape[0]
    hmask, qs, scales = b[:, :32], b[:, 32:96], b[:, 96:108]
    d = _f16(b[:, 108:110])
    sc = _unpack_scales_q3k(scales).astype(np.float32)
    dl = (d * sc).reshape(n, 16, 1)
    ql = _expand_bits(qs, [0, 2, 4, 6], 32, 3).reshape(n, 16, 16)
    qh = _expand_bits(hmask, list(range(8)), 32, 1).reshape(n, 16, 16)
    qh = qh ^ np.uint8(1)  # set hmask bit means "do not subtract 4"
    q = (ql.astype(np.int8) - (qh << np.uint8(2)).astype(np.int8)).astype(np.float32)
    return (dl * q).reshape(n, QK_K)


def _fit_subblock_scale(xs: np.ndarray, q_min: int, q_max: int,
                        n_iter: int = 3, w: np.ndarray | None = None) -> np.ndarray:
    """Per-sub-block signed scale fit: start from the abs-max heuristic and
    refine with alternating least squares (q fixed -> optimal s = Σwxq/Σwq²),
    the same idea as the reference's make_qx_quants (ggml-quants.c); `w` is
    the optional per-element importance (imatrix) weighting."""
    amax = np.abs(xs).max(axis=-1)
    s = amax / max(-q_min, q_max)
    ww = np.float32(1.0) if w is None else w
    for _ in range(n_iter):
        q = _round_half_away(xs * _safe_inv(s)[..., None]).clip(q_min, q_max)
        num = np.sum(ww * xs * q, axis=-1)
        den = np.sum(ww * q * q, axis=-1)
        s = np.where(den > 0, num / np.maximum(den, 1e-30), s).astype(np.float32)
    return s


def _q_q3_k(x: np.ndarray, w: np.ndarray | None = None) -> np.ndarray:
    n = x.shape[0]
    xs = x.reshape(n, 16, 16)
    s_f = _fit_subblock_scale(xs, -4, 3,
                              w=None if w is None else w.reshape(n, 16, 16))
    d = (np.abs(s_f).max(axis=-1, keepdims=True) / 31).astype(np.float32)
    sc = _round_half_away(s_f * _safe_inv(d)).clip(-32, 31).astype(np.int8)
    d16 = d.astype(np.float16).astype(np.float32)
    dl = d16 * sc
    q = _round_half_away(xs * _safe_inv(dl)[..., None]).clip(-4, 3).astype(np.int8)
    qp = (q + 4).astype(np.uint8)  # 0..7
    h = (qp >> 2) & 1  # 1 => no subtract
    ql = qp & np.uint8(3)
    ql = ql.reshape(n, 16, 16).reshape(n, 2, 4, 32)  # (half, shift, byte)
    sh = np.array([0, 2, 4, 6], dtype=np.uint8).reshape(1, 1, 4, 1)
    qs = np.bitwise_or.reduce(ql << sh, axis=2).reshape(n, 64)
    hb = h.reshape(n, 8, 32)  # bit index, byte
    shb = np.arange(8, dtype=np.uint8).reshape(1, 8, 1)
    hmask = np.bitwise_or.reduce(hb << shb, axis=1)
    return np.concatenate([hmask, qs, _pack_scales_q3k(sc), _to_f16_bytes(d)], axis=-1)


def _unpack_scale_min_k4(scales: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """12-byte packed 6-bit scales/mins -> (8 scales, 8 mins) per superblock,
    layout per ggml-quants.c get_scale_min_k4."""
    a, bb, c = scales[:, 0:4], scales[:, 4:8], scales[:, 8:12]
    sc = np.concatenate([a & 0x3F, (c & 0x0F) | ((a >> 2) & 0x30)], axis=-1)
    mn = np.concatenate([bb & 0x3F, (c >> 4) | ((bb >> 2) & 0x30)], axis=-1)
    return sc, mn


def _pack_scale_min_k4(sc: np.ndarray, mn: np.ndarray) -> np.ndarray:
    """Inverse of `_unpack_scale_min_k4`; sc/mn are uint8 0..63, shape (n, 8)."""
    a = sc[:, :4] | ((sc[:, 4:] >> 4) << 6)
    bb = mn[:, :4] | ((mn[:, 4:] >> 4) << 6)
    c = (sc[:, 4:] & 0x0F) | ((mn[:, 4:] & 0x0F) << 4)
    return np.concatenate([a, bb, c], axis=-1).astype(np.uint8)


def _deq_q4_k(b: np.ndarray) -> np.ndarray:
    n = b.shape[0]
    d, dmin = _f16(b[:, :2]), _f16(b[:, 2:4])
    sc, mn = _unpack_scale_min_k4(b[:, 4:16])
    dl = (d * sc.astype(np.float32)).reshape(n, 8, 1)
    ml = (dmin * mn.astype(np.float32)).reshape(n, 8, 1)
    q = _split_nibbles(b[:, 16:], 32).reshape(n, 8, 32).astype(np.float32)
    return (dl * q - ml).reshape(n, QK_K)


def _wls_affine_refine(xs: np.ndarray, w: np.ndarray, s0: np.ndarray,
                       m0: np.ndarray, q_max: int, n_iter: int = 2) -> tuple:
    """Importance-weighted refinement of the affine sub-block fit: with q
    fixed, (s, m) minimizing sum w (x - (s q - m))^2 solve a 2x2 system —
    the role of the reference's weighted make_qkx2_quants search."""
    s_f, m_f = s0.astype(np.float32), m0.astype(np.float32)
    for _ in range(n_iter):
        q = _round_half_away(
            (xs + m_f[..., None]) * _safe_inv(s_f)[..., None]).clip(0, q_max)
        sw = np.sum(w, axis=-1)
        swq = np.sum(w * q, axis=-1)
        swq2 = np.sum(w * q * q, axis=-1)
        swx = np.sum(w * xs, axis=-1)
        swxq = np.sum(w * xs * q, axis=-1)
        det = swq2 * sw - swq * swq
        ok = det > 1e-20
        new_s = np.where(ok, (swxq * sw - swx * swq) / np.where(ok, det, 1), s_f)
        new_m = np.where(ok, (new_s * swq - swx) * _safe_inv(sw), m_f)
        s_f = np.maximum(new_s, 0.0).astype(np.float32)
        m_f = np.maximum(new_m, 0.0).astype(np.float32)
    return s_f, m_f


def _kquant_scale_min(xs: np.ndarray, q_max: int,
                      w: np.ndarray | None = None) -> tuple:
    """Shared affine sub-block fit for Q4_K/Q5_K/Q2_K-style formats."""
    mn = np.minimum(xs.min(axis=-1), 0.0)
    mx = xs.max(axis=-1)
    sc_f = (mx - mn) / q_max
    m_f = -mn
    if w is not None:
        sc_f, m_f = _wls_affine_refine(xs, w, sc_f, m_f, q_max)
    d = (sc_f.max(axis=-1, keepdims=True) / 63).astype(np.float32)
    dmin = (m_f.max(axis=-1, keepdims=True) / 63).astype(np.float32)
    sc6 = _round_half_away(sc_f * _safe_inv(d)).clip(0, 63).astype(np.uint8)
    m6 = _round_half_away(m_f * _safe_inv(dmin)).clip(0, 63).astype(np.uint8)
    d16 = d.astype(np.float16).astype(np.float32)
    dm16 = dmin.astype(np.float16).astype(np.float32)
    q = _round_half_away(
        (xs + (dm16 * m6)[..., None]) * _safe_inv(d16 * sc6)[..., None]
    ).clip(0, q_max).astype(np.uint8)
    return d, dmin, sc6, m6, q


def _q_q4_k(x: np.ndarray, w: np.ndarray | None = None) -> np.ndarray:
    n = x.shape[0]
    d, dmin, sc6, m6, q = _kquant_scale_min(
        x.reshape(n, 8, 32), 15,
        w=None if w is None else w.reshape(n, 8, 32))
    qs = _pack_nibbles(q.reshape(n, 8, 32).reshape(n, 4, 64), 32)
    return np.concatenate(
        [_to_f16_bytes(d), _to_f16_bytes(dmin), _pack_scale_min_k4(sc6, m6), qs], axis=-1
    )


def _deq_q5_k(b: np.ndarray) -> np.ndarray:
    n = b.shape[0]
    d, dmin = _f16(b[:, :2]), _f16(b[:, 2:4])
    sc, mn = _unpack_scale_min_k4(b[:, 4:16])
    dl = (d * sc.astype(np.float32)).reshape(n, 8, 1)
    ml = (dmin * mn.astype(np.float32)).reshape(n, 8, 1)
    hi = _expand_bits(b[:, 16:48], list(range(8)), 32, 1).reshape(n, 8, 32)
    lo = _split_nibbles(b[:, 48:], 32).reshape(n, 8, 32)
    q = (lo | (hi << np.uint8(4))).astype(np.float32)
    return (dl * q - ml).reshape(n, QK_K)


def _q_q5_k(x: np.ndarray, w: np.ndarray | None = None) -> np.ndarray:
    n = x.shape[0]
    d, dmin, sc6, m6, q = _kquant_scale_min(
        x.reshape(n, 8, 32), 31,
        w=None if w is None else w.reshape(n, 8, 32))
    lo = _pack_nibbles((q & 0xF).reshape(n, 4, 64), 32)
    hb = (q >> 4).reshape(n, 8, 32)
    shb = np.arange(8, dtype=np.uint8).reshape(1, 8, 1)
    qh = np.bitwise_or.reduce(hb << shb, axis=1)
    return np.concatenate(
        [_to_f16_bytes(d), _to_f16_bytes(dmin), _pack_scale_min_k4(sc6, m6), qh, lo],
        axis=-1,
    )


def _deq_q6_k(b: np.ndarray) -> np.ndarray:
    n = b.shape[0]
    ql, qh, scales = b[:, :128], b[:, 128:192], b[:, 192:208]
    d = _f16(b[:, 208:210])
    dl = (d * scales.view(np.int8).astype(np.float32)).reshape(n, 16, 1)
    lo = _split_nibbles(ql, 64).reshape(n, -1, 32)
    hi = _expand_bits(qh, [0, 2, 4, 6], 32, 3).reshape(n, -1, 32)
    q = ((lo | (hi << np.uint8(4))).astype(np.int8) - np.int8(32)).astype(np.float32)
    return (dl * q.reshape(n, 16, 16)).reshape(n, QK_K)


def _q_q6_k(x: np.ndarray, w: np.ndarray | None = None) -> np.ndarray:
    n = x.shape[0]
    xs = x.reshape(n, 16, 16)
    s_f = _fit_subblock_scale(xs, -32, 31,
                              w=None if w is None else w.reshape(n, 16, 16))
    d = (np.abs(s_f).max(axis=-1, keepdims=True) / 127).astype(np.float32)
    sc = _round_half_away(s_f * _safe_inv(d)).clip(-128, 127).astype(np.int8)
    d16 = d.astype(np.float16).astype(np.float32)
    dl = d16 * sc
    q = _round_half_away(xs * _safe_inv(dl)[..., None]).clip(-32, 31).astype(np.int8)
    qp = (q.reshape(n, QK_K) + 32).astype(np.uint8)  # 0..63
    # inverse of the dequant expansion: per 128-half, [g0..g3] of 32 values
    g = qp.reshape(n, 2, 4, 32)
    lo4 = g & np.uint8(0xF)
    hi2 = (g >> np.uint8(4)).astype(np.uint8)
    sh = np.array([0, 2, 4, 6], dtype=np.uint8).reshape(1, 1, 4, 1)
    qh = np.bitwise_or.reduce(hi2 << sh, axis=2).reshape(n, 64)
    return np.concatenate([_fix_ql_q6k(n, lo4), qh, sc.view(np.uint8), _to_f16_bytes(d)], axis=-1)


def _fix_ql_q6k(n: int, lo4: np.ndarray) -> np.ndarray:
    """Pack Q6_K low nibbles: per 128-half, bytes l<32 hold (g0 | g2<<4),
    bytes 32..63 hold (g1 | g3<<4)."""
    b_lo = lo4[:, :, 0, :] | (lo4[:, :, 2, :] << np.uint8(4))  # (n, 2, 32)
    b_hi = lo4[:, :, 1, :] | (lo4[:, :, 3, :] << np.uint8(4))
    return np.concatenate([b_lo, b_hi], axis=2).reshape(n, 128)


# --------------------------------------------------------------------------
# registry / public API
# --------------------------------------------------------------------------

# --------------------------------------------------------------------------
# i-quants (non-linear / E8-codebook formats; ggml-quants.c:2275-2390,
# ggml-common.h layouts + kvalues_iq4nl)
# --------------------------------------------------------------------------

_IQ4NL_KVALUES = np.array(
    [-127, -104, -83, -65, -49, -35, -22, -10, 1, 13, 25, 38, 53, 69, 89, 113],
    np.int8)


def _deq_iq4_nl(b: np.ndarray) -> np.ndarray:
    """IQ4_NL: f16 scale + 16 nibble-packed codebook indices per 32 elems
    (element e<16 = low nibble of byte e, e>=16 = high nibble)."""
    d = _f16(b[:, :2])
    idx = _split_nibbles(b[:, 2:], 16).astype(np.int64)
    return d * _IQ4NL_KVALUES[idx].astype(np.float32)


def _deq_iq4_xs(b: np.ndarray) -> np.ndarray:
    """IQ4_XS: super f16 scale, per-32-group 6-bit subscales (4 low bits in
    nibble-packed scales_l, 2 high bits in a packed u16), IQ4_NL codebook."""
    n = b.shape[0]
    d = _f16(b[:, :2])
    sh = b[:, 2:4].copy().view("<u2").astype(np.uint32)  # [n, 1]
    sl = b[:, 4:4 + QK_K // 64]
    lo4 = _split_nibbles(sl, 1)  # [n, 8] group low bits (interleaved lo/hi)
    hi2 = ((sh >> (2 * np.arange(QK_K // 32, dtype=np.uint32)[None, :]))
           & np.uint32(3)).astype(np.uint8)
    scales = ((lo4 | (hi2 << np.uint8(4))).astype(np.int8)
              .astype(np.int16) - 32)  # [n, 8]
    dl = d * scales.astype(np.float32)  # [n, 8]
    idx = _split_nibbles(b[:, 4 + QK_K // 64:].reshape(n * (QK_K // 32), 16),
                         16).astype(np.int64)  # per-32-group element order
    vals = _IQ4NL_KVALUES[idx].astype(np.float32).reshape(n, QK_K // 32, 32)
    return (dl[:, :, None] * vals).reshape(n, QK_K)


def _iq_signs(sign_fields: np.ndarray) -> np.ndarray:
    """7-bit sign fields [..] -> per-element sign multipliers [..., 8]
    (odd-parity completion, ksigns_iq2xs law)."""
    from .iq_grids import KSIGNS_IQ2XS

    s = KSIGNS_IQ2XS[sign_fields.astype(np.int64)]
    bits = (s[..., None] >> np.arange(8, dtype=np.uint8)) & 1
    return np.where(bits != 0, np.float32(-1), np.float32(1))


def _deq_iq2_xxs(b: np.ndarray) -> np.ndarray:
    """IQ2_XXS: per 32-element group, 4 E8 codebook indices (8 magnitudes
    each from iq2xxs_grid) + packed 7-bit sign fields + a 4-bit group
    scale: db = d*(0.5 + aux32[1]>>28)*0.25 (ggml-quants.c:2275)."""
    from .iq_grids import IQ2XXS_GRID

    n = b.shape[0]
    d = _f16(b[:, :2])  # [n, 1]
    blk = b[:, 2:].reshape(n, QK_K // 32, 8)
    gidx = blk[:, :, :4].astype(np.int64)  # [n, 8, 4] codebook indices
    aux = (np.ascontiguousarray(blk[:, :, 4:]).view("<u4")
           .reshape(n, QK_K // 32))  # signs+scale word
    db = d * (0.5 + (aux >> 28).astype(np.float32)) * 0.25  # [n, 8]
    mags = IQ2XXS_GRID[gidx].copy().view(np.uint8).astype(np.float32)
    mags = mags.reshape(n, QK_K // 32, 4, 8)
    sf = (aux[:, :, None] >> (7 * np.arange(4, dtype=np.uint32)[None, None, :])
          ) & np.uint32(127)
    signs = _iq_signs(sf)  # [n, 8, 4, 8]
    return (db[:, :, None, None] * mags * signs).reshape(n, QK_K)


def _deq_iq3_xxs(b: np.ndarray) -> np.ndarray:
    """IQ3_XXS: per 32-element group, 8 codebook indices (4 magnitudes each
    from iq3xxs_grid) + the IQ2-style sign/scale word:
    db = d*(0.5 + aux32>>28)*0.5 (ggml-quants.c:2362)."""
    from .iq_grids import IQ3XXS_GRID

    n = b.shape[0]
    d = _f16(b[:, :2])
    qs = b[:, 2:2 + QK_K // 4].reshape(n, QK_K // 32, 8).astype(np.int64)
    aux = np.ascontiguousarray(b[:, 2 + QK_K // 4:]).view("<u4")  # [n, 8]
    db = d * (0.5 + (aux >> 28).astype(np.float32)) * 0.5
    mags = IQ3XXS_GRID[qs].copy().view(np.uint8).astype(np.float32)
    mags = mags.reshape(n, QK_K // 32, 8, 4)
    sf = (aux[:, :, None] >> (7 * np.arange(4, dtype=np.uint32)[None, None, :])
          ) & np.uint32(127)
    signs = _iq_signs(sf)  # [n, 8, 4, 8]: 8 signs per l-subgroup
    # subgroup l covers indices 2l, 2l+1: grid1 -> signs[..,:4], grid2 -> [..,4:]
    signs = signs.reshape(n, QK_K // 32, 8, 4)  # pairs (grid1/grid2) in order
    return (db[:, :, None, None] * mags * signs).reshape(n, QK_K)


def _deq_iq2_xs(b: np.ndarray) -> np.ndarray:
    """IQ2_XS: per u16 entry a 9-bit index into iq2xs_grid (8 E8 magnitudes)
    plus an explicit 7-bit sign field (odd-parity completed); one 4-bit
    subscale per 16 elements: db = d*(0.5+s)*0.25
    (ggml-quants.c dequantize_row_iq2_xs, layout ggml-common.h:595)."""
    from .iq_grids import IQ2XS_GRID

    n = b.shape[0]
    d = _f16(b[:, :2])  # [n, 1]
    qs = (np.ascontiguousarray(b[:, 2:2 + QK_K // 4]).view("<u2")
          .reshape(n, QK_K // 8).astype(np.uint32))  # [n, 32]
    sub = _split_nibbles(b[:, 2 + QK_K // 4:], 1).astype(np.float32)  # [n,16]
    db = d * (0.5 + sub) * 0.25  # one subscale per 16 elems (2 u16 entries)
    mags = IQ2XS_GRID[(qs & np.uint32(511)).astype(np.int64)].copy()
    mags = mags.view(np.uint8).astype(np.float32).reshape(n, QK_K // 8, 8)
    signs = _iq_signs(qs >> np.uint32(9))  # [n, 32, 8]
    vals = (mags * signs).reshape(n, QK_K // 16, 16)
    return (db[:, :, None] * vals).reshape(n, QK_K)


def _deq_iq2_s(b: np.ndarray) -> np.ndarray:
    """IQ2_S: 10-bit grid indices (8 low bits in qs, 2 high bits packed in
    qh) into iq2s_grid, EXPLICIT per-element sign bytes (no parity law),
    4-bit subscale per 16 elements: db = d*(0.5+s)*0.25
    (ggml-quants.c dequantize_row_iq2_s)."""
    from .iq_grids import IQ2S_GRID

    n = b.shape[0]
    d = _f16(b[:, :2])
    qs = b[:, 2:2 + QK_K // 8].astype(np.uint16)          # [n, 32]
    sgn = b[:, 2 + QK_K // 8:2 + QK_K // 4]               # [n, 32]
    qh = b[:, 2 + QK_K // 4:2 + QK_K // 4 + QK_K // 32]   # [n, 8]
    sub = _split_nibbles(b[:, 2 + QK_K // 4 + QK_K // 32:], 1)
    db = d * (0.5 + sub.astype(np.float32)) * 0.25        # [n, 16]
    hi = ((qh[:, :, None].astype(np.uint16)
           >> np.array([0, 2, 4, 6], dtype=np.uint16)[None, None, :])
          & np.uint16(3))
    idx = (qs.reshape(n, -1, 4) | (hi << 8)).reshape(n, QK_K // 8)
    mags = IQ2S_GRID[idx.astype(np.int64)].copy().view(np.uint8)
    mags = mags.astype(np.float32).reshape(n, QK_K // 8, 8)
    bits = (sgn[:, :, None] >> np.arange(8, dtype=np.uint8)) & 1
    signs = np.where(bits != 0, np.float32(-1), np.float32(1))
    vals = (mags * signs).reshape(n, QK_K // 16, 16)
    return (db[:, :, None] * vals).reshape(n, QK_K)


def _deq_iq3_s(b: np.ndarray) -> np.ndarray:
    """IQ3_S: 9-bit grid indices (qh holds one high bit per entry) into
    iq3s_grid (4 magnitudes each), explicit sign bytes, 4-bit subscale per
    32 elements: db = d*(1+2s) (ggml-quants.c dequantize_row_iq3_s)."""
    from .iq_grids import IQ3S_GRID

    n = b.shape[0]
    d = _f16(b[:, :2])
    qs = b[:, 2:2 + QK_K // 4].astype(np.uint16)            # [n, 64]
    qh = b[:, 2 + QK_K // 4:2 + QK_K // 4 + QK_K // 32]     # [n, 8]
    sgn = b[:, 2 + QK_K // 4 + QK_K // 32:
            2 + QK_K // 4 + QK_K // 32 + QK_K // 8]         # [n, 32]
    sub = _split_nibbles(b[:, 2 + QK_K // 4 + QK_K // 32 + QK_K // 8:], 1)
    db = d * (1.0 + 2.0 * sub.astype(np.float32))           # [n, 8]
    hibit = (((qh[:, :, None] >> np.arange(8, dtype=np.uint8)) & 1)
             .astype(np.uint16).reshape(n, QK_K // 4))
    idx = (qs | (hibit << 8)).astype(np.int64)
    mags = IQ3S_GRID[idx].copy().view(np.uint8)
    mags = mags.astype(np.float32).reshape(n, QK_K // 4, 4)
    bits = (sgn[:, :, None] >> np.arange(8, dtype=np.uint8)) & 1
    signs = np.where(bits != 0, np.float32(-1), np.float32(1))
    vals = (mags * signs.reshape(n, QK_K // 4, 4)).reshape(n, QK_K // 32, 32)
    return (db[:, :, None] * vals).reshape(n, QK_K)


# IQ1 ternary-grid offset (ggml-quants.c IQ1S_DELTA; IQ1_M shares it)
_IQ1_DELTA = np.float32(0.125)


def _deq_iq1_s(b: np.ndarray) -> np.ndarray:
    """IQ1_S: 11-bit indices into the ternary iq1s_grid (8 elements in
    {-1,0,1} each), per-32-group 3-bit scale dl = d*(2s+1) and signed
    delta offset from qh bit 15 (ggml-quants.c dequantize_row_iq1_s)."""
    from .iq_grids import IQ1S_GRID

    n = b.shape[0]
    d = _f16(b[:, :2])
    qs = b[:, 2:2 + QK_K // 8].astype(np.uint16)            # [n, 32]
    qh = np.ascontiguousarray(b[:, 2 + QK_K // 8:]).view("<u2")  # [n, 8]
    dl = d * (2.0 * ((qh >> 12) & 7).astype(np.float32) + 1.0)   # [n, 8]
    delta = np.where((qh & np.uint16(0x8000)) == 0, _IQ1_DELTA, -_IQ1_DELTA)
    hi = ((qh[:, :, None] >> np.array([0, 3, 6, 9], dtype=np.uint16)[None, None, :])
          & np.uint16(7)).reshape(n, QK_K // 8)
    idx = (qs | (hi << 8)).astype(np.int64)
    g = IQ1S_GRID[idx].copy().view(np.int8).astype(np.float32)
    g = g.reshape(n, QK_K // 32, 32)
    return (dl[:, :, None] * (g + delta[:, :, None])).reshape(n, QK_K)


def _deq_iq1_m(b: np.ndarray) -> np.ndarray:
    """IQ1_M: iq1s_grid indices with 3-bit highs in qh nibbles (nibble bit
    3 is the delta sign), 3-bit subscales packed in a u16 quad whose top
    nibbles reassemble the f16 super-scale
    (ggml-quants.c dequantize_row_iq1_m)."""
    from .iq_grids import IQ1S_GRID

    n = b.shape[0]
    qs = b[:, :QK_K // 8].astype(np.uint16)                 # [n, 32]
    qh = b[:, QK_K // 8:QK_K // 8 + QK_K // 16]             # [n, 16]
    sc = np.ascontiguousarray(b[:, QK_K // 8 + QK_K // 16:]).view("<u2")
    dbits = ((sc & np.uint16(0xF000))
             >> np.array([12, 8, 4, 0], dtype=np.uint16)[None, :])
    d16 = (dbits[:, 0] | dbits[:, 1] | dbits[:, 2] | dbits[:, 3])
    d = d16.astype(np.uint16).view(np.float16).astype(np.float32)[:, None]
    sub = ((sc[:, :, None] >> np.array([0, 3, 6, 9], dtype=np.uint16)[None, None, :])
           & np.uint16(7)).reshape(n, 16).astype(np.float32)
    dl = d * (2.0 * sub + 1.0)                              # [n, 16]
    nib = _split_nibbles(qh, 1)                             # [n, 32]
    idx = (qs | ((nib & np.uint8(7)).astype(np.uint16) << 8)).astype(np.int64)
    delta = np.where((nib & np.uint8(8)) == 0, _IQ1_DELTA, -_IQ1_DELTA)
    g = IQ1S_GRID[idx].copy().view(np.int8).astype(np.float32)
    g = g.reshape(n, QK_K // 8, 8)
    vals = (g + delta[:, :, None]).reshape(n, QK_K // 16, 16)
    return (dl[:, :, None] * vals).reshape(n, QK_K)


def _deq_tq1_0(b: np.ndarray) -> np.ndarray:
    """TQ1_0 (BitNet ternary): 5 trits packed per byte in base 3 via the
    fixed-point law trit_k = ((q*3^k mod 256)*3) >> 8 in {0,1,2} -> {-1,0,1};
    element planes of 32/16/4 per multiplier (ggml-common.h block_tq1_0,
    ggml-quants.c dequantize_row_tq1_0)."""
    n = b.shape[0]
    nq = (QK_K - 4 * QK_K // 64) // 5  # 48 base-243 bytes
    qs, qh, d = b[:, :nq], b[:, nq:nq + QK_K // 64], _f16(b[:, nq + QK_K // 64:])
    pow3 = np.array([1, 3, 9, 27, 81], dtype=np.uint8)

    def trit_planes(q: np.ndarray, width: int, p: np.ndarray) -> np.ndarray:
        # uint8 multiply wraps mod 256, matching the reference fixed-point law
        x = q.reshape(n, -1, 1, width) * p.reshape(1, 1, -1, 1)
        x = x.reshape(n, -1).astype(np.uint16)
        return ((x * np.uint16(3)) >> 8).astype(np.int8) - np.int8(1)

    t = np.concatenate([
        trit_planes(qs[:, :32], 32, pow3),      # 160 elements
        trit_planes(qs[:, 32:], 16, pow3),      # 80 elements
        trit_planes(qh, QK_K // 64, pow3[:4]),  # 16 elements
    ], axis=1)
    return d * t.astype(np.float32)


def _deq_tq2_0(b: np.ndarray) -> np.ndarray:
    """TQ2_0 (BitNet ternary): 4 trits per byte as plain 2-bit fields
    (0..2 -> -1..1), element planes of 32 per shift
    (ggml-common.h block_tq2_0)."""
    n = b.shape[0]
    qs, d = b[:, :QK_K // 4], _f16(b[:, QK_K // 4:])
    sh = np.array([0, 2, 4, 6], dtype=np.uint8).reshape(1, 1, 4, 1)
    t = (qs.reshape(n, -1, 1, 32) >> sh) & np.uint8(3)
    return d * (t.reshape(n, QK_K).astype(np.int8) - np.int8(1)).astype(np.float32)


# MXFP4 e2m1 codebook, pre-doubled so the e8m0 scale can drop one exponent
# step (ggml-impl.h ggml_e8m0_to_fp32_half convention).
_MXFP4_KVALUES = np.array(
    [0, 1, 2, 3, 4, 6, 8, 12, 0, -1, -2, -3, -4, -6, -8, -12],
    dtype=np.float32)


def _e8m0_half(e: np.ndarray) -> np.ndarray:
    """e8m0 exponent byte -> 2^(e-127)/2 as f32 (subnormal below e=2)."""
    e = e.astype(np.uint32)
    bits = np.where(e < 2, np.uint32(0x0020_0000) << e,
                    (e - np.uint32(1)) << np.uint32(23))
    return bits.view(np.float32)


def _deq_mxfp4(b: np.ndarray) -> np.ndarray:
    """MXFP4 (OCP microscaling): one e8m0 scale byte + 32 nibble-packed
    e2m1 values per block (element e<16 = low nibble of byte e)."""
    d = _e8m0_half(b[:, :1])
    idx = _split_nibbles(b[:, 1:], 16).astype(np.int64)
    return d * _MXFP4_KVALUES[idx]


def _best_iq4_index(al: np.ndarray) -> np.ndarray:
    """Nearest IQ4 codebook index per element (the values are sorted, so
    nearest-neighbour over the 16-entry table; ggml best_index_int8)."""
    vals = _IQ4NL_KVALUES.astype(np.float32)
    # searchsorted gives the first v >= al; compare with the left neighbour
    mu = np.clip(np.searchsorted(vals, al), 1, 15)
    left_closer = (al - vals[mu - 1]) < (vals[mu] - al)
    return np.where(al <= vals[0], 0,
                    np.where(al >= vals[15], 15,
                             np.where(left_closer, mu - 1, mu)))


def _iq4_fit_scales(xb: np.ndarray, ntry: int = 7) -> np.ndarray:
    """Per-32-block weighted-LS scale fit over the IQ4 codebook
    (semantics of ggml quantize_row_iq4_nl_impl's candidate search:
    initial d = -max/vals[0] plus 2*ntry+1 grid candidates, keep the one
    maximizing sumqx^2/sumq2 with first-wins ties). xb: [n, 32]."""
    vals = _IQ4NL_KVALUES.astype(np.float32)
    n = xb.shape[0]
    w = xb * xb  # weight = x^2 (no imatrix)
    am = np.argmax(np.abs(xb), axis=-1)
    mx = xb[np.arange(n), am]  # signed value of the abs-max element
    amax = np.abs(mx)
    dead = amax < 1e-15  # GROUP_MAX_EPS
    safe_mx = np.where(dead, 1.0, mx)

    # candidate inverse scales: [n, 1 + 2*ntry + 1] (slot 0 = initial fit)
    itry = np.arange(-ntry, ntry + 1, dtype=np.float32)
    ids = np.concatenate([
        (1.0 / (-safe_mx / vals[0]))[:, None],
        (itry[None, :] + vals[0]) / safe_mx[:, None],
    ], axis=1)  # [n, C]
    q = vals[_best_iq4_index(ids[:, :, None] * xb[:, None, :])]  # [n,C,32]
    sumqx = (w[:, None, :] * q * xb[:, None, :]).sum(-1)
    sumq2 = (w[:, None, :] * q * q).sum(-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        obj = np.where(sumq2 > 0, sumqx * sumqx / sumq2, -np.inf)
        # slot 0 is the least-squares refit of the initial rounding (the
        # pre-loop d = sumqx/sumq2), which always participates
        best = np.argmax(obj, axis=1)  # first-wins on ties, like the loop
        d = sumqx[np.arange(n), best] / sumq2[np.arange(n), best]
    return np.where(dead, 0.0, d).astype(np.float32)


def _q_iq4_nl(x: np.ndarray) -> np.ndarray:
    """IQ4_NL encoder (no-imatrix path of ggml quantize_iq4_nl): per-32
    block, candidate-search scale fit + nearest-codebook rounding."""
    d = _iq4_fit_scales(x)
    inv = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 0.0)
    idx = _best_iq4_index(inv[:, None] * x).astype(np.uint8)  # [n, 32]
    q4 = idx[:, :16] | (idx[:, 16:] << np.uint8(4))
    return np.concatenate([_to_f16_bytes(d[:, None]), q4], axis=-1)


def _q_iq4_xs(x: np.ndarray) -> np.ndarray:
    """IQ4_XS encoder: the IQ4_NL per-32-group fit, then 6-bit sub-scales
    against the super-scale d = -max_scale/32 (ggml quantize_iq4_xs)."""
    n = x.shape[0]
    xg = x.reshape(n * (QK_K // 32), 32)
    scales = _iq4_fit_scales(xg).reshape(n, QK_K // 32)
    mix = np.argmax(np.abs(scales), axis=-1)
    max_scale = scales[np.arange(n), mix]
    d = -max_scale / 32.0
    inv_d = np.where(d != 0, 1.0 / np.where(d == 0, 1.0, d), 0.0)
    l = np.clip(np.rint(inv_d[:, None] * scales).astype(np.int32), -32, 31)
    dl = d[:, None] * l
    idl = np.where(dl != 0, 1.0 / np.where(dl == 0, 1.0, dl), 0.0)
    idx = _best_iq4_index(idl[:, :, None]
                          * x.reshape(n, QK_K // 32, 32)).astype(np.uint8)
    lq = (l + 32).astype(np.uint16)
    sl = _pack_nibbles((lq & 0xF).astype(np.uint8), 1)  # [n, 4]
    sh = np.zeros(n, np.uint16)
    for g in range(QK_K // 32):
        sh |= (lq[:, g] >> 4) << np.uint16(2 * g)
    qs = (idx[:, :, :16] | (idx[:, :, 16:] << np.uint8(4))).reshape(n, -1)
    return np.concatenate([
        _to_f16_bytes(d[:, None]), sh[:, None].copy().view(np.uint8),
        sl, qs], axis=-1)


def _q_tq1_0(x: np.ndarray) -> np.ndarray:
    """TQ1_0 encoder: round to {-1,0,1} against the block absmax, then
    pack 5 trits per byte base-243 with the ceil-rescale to the 0..255
    fixed-point domain ((q*256 + 242) // 243)."""
    d = np.abs(x).max(axis=-1, keepdims=True)
    t = (_round_half_away(x * _safe_inv(d)).astype(np.int8) + 1).astype(np.uint8)
    n = x.shape[0]
    p5 = np.array([81, 27, 9, 3, 1], dtype=np.uint8).reshape(1, 1, 5, 1)
    q0 = (t[:, :160].reshape(n, -1, 5, 32) * p5).sum(axis=-2, dtype=np.uint8)
    q1 = (t[:, 160:240].reshape(n, -1, 5, 16) * p5).sum(axis=-2, dtype=np.uint8)
    p4 = np.array([81, 27, 9, 3], dtype=np.uint8).reshape(1, 1, 4, 1)
    qh = (t[:, 240:].reshape(n, -1, 4, 4) * p4).sum(axis=-2, dtype=np.uint8)
    q = np.concatenate([q0.reshape(n, -1), q1.reshape(n, -1),
                        qh.reshape(n, -1)], axis=-1)
    q = ((q.astype(np.uint16) * 256 + 242) // 243).astype(np.uint8)
    return np.concatenate([q, _to_f16_bytes(d)], axis=-1)


def _q_tq2_0(x: np.ndarray) -> np.ndarray:
    """TQ2_0 encoder: round to {-1,0,1}, pack 4 trits per byte as 2-bit
    fields over 32-element planes."""
    d = np.abs(x).max(axis=-1, keepdims=True)
    t = (_round_half_away(x * _safe_inv(d)).astype(np.int8) + 1).astype(np.uint8)
    n = x.shape[0]
    sh = np.array([0, 2, 4, 6], dtype=np.uint8).reshape(1, 1, 4, 1)
    q = t.reshape(n, -1, 4, 32) << sh
    q = (q[:, :, 0] | q[:, :, 1] | q[:, :, 2] | q[:, :, 3]).reshape(n, -1)
    return np.concatenate([q, _to_f16_bytes(d)], axis=-1)


def _q_mxfp4(x: np.ndarray) -> np.ndarray:
    """MXFP4 encoder: e8m0 scale = floor(log2(absmax)) - 2 (biased), then
    nearest-codebook-entry per element."""
    n = x.shape[0]
    d = np.abs(x).max(axis=-1, keepdims=True)
    with np.errstate(divide="ignore"):
        e = np.where(d > 0, np.floor(np.log2(d)) - 2 + 127, 0).astype(np.uint8)
    scale = _e8m0_half(e)
    errs = np.abs(scale[:, :, None] * _MXFP4_KVALUES[None, None, :]
                  - x[:, :, None])
    best = np.argmin(errs, axis=-1).astype(np.uint8)  # [n, 32]
    q = best.reshape(n, 2, 16)
    return np.concatenate([e, q[:, 0] | (q[:, 1] << np.uint8(4))], axis=-1)


_DEQUANT: dict[GGMLType, Callable[[np.ndarray], np.ndarray]] = {
    GGMLType.Q4_0: _deq_q4_0,
    GGMLType.Q4_1: _deq_q4_1,
    GGMLType.Q5_0: _deq_q5_0,
    GGMLType.Q5_1: _deq_q5_1,
    GGMLType.Q8_0: _deq_q8_0,
    GGMLType.Q2_K: _deq_q2_k,
    GGMLType.Q3_K: _deq_q3_k,
    GGMLType.Q4_K: _deq_q4_k,
    GGMLType.Q5_K: _deq_q5_k,
    GGMLType.Q6_K: _deq_q6_k,
    GGMLType.IQ4_NL: _deq_iq4_nl,
    GGMLType.IQ4_XS: _deq_iq4_xs,
    GGMLType.IQ2_XXS: _deq_iq2_xxs,
    GGMLType.IQ2_XS: _deq_iq2_xs,
    GGMLType.IQ2_S: _deq_iq2_s,
    GGMLType.IQ3_XXS: _deq_iq3_xxs,
    GGMLType.IQ3_S: _deq_iq3_s,
    GGMLType.IQ1_S: _deq_iq1_s,
    GGMLType.IQ1_M: _deq_iq1_m,
    GGMLType.TQ1_0: _deq_tq1_0,
    GGMLType.TQ2_0: _deq_tq2_0,
    GGMLType.MXFP4: _deq_mxfp4,
}

_QUANT: dict[GGMLType, Callable[[np.ndarray], np.ndarray]] = {
    GGMLType.Q4_0: _q_q4_0,
    GGMLType.Q4_1: _q_q4_1,
    GGMLType.Q5_0: _q_q5_0,
    GGMLType.Q5_1: _q_q5_1,
    GGMLType.Q8_0: _q_q8_0,
    GGMLType.Q2_K: _q_q2_k,
    GGMLType.Q3_K: _q_q3_k,
    GGMLType.Q4_K: _q_q4_k,
    GGMLType.Q5_K: _q_q5_k,
    GGMLType.Q6_K: _q_q6_k,
    GGMLType.TQ1_0: _q_tq1_0,
    GGMLType.TQ2_0: _q_tq2_0,
    GGMLType.MXFP4: _q_mxfp4,
    GGMLType.IQ4_NL: _q_iq4_nl,
    GGMLType.IQ4_XS: _q_iq4_xs,
}


def _native_enabled() -> bool:
    import os

    return os.environ.get("OMNI_NATIVE", "1") != "0"


def dequantize(blocks: np.ndarray, ggml_type: GGMLType | int,
               shape: tuple[int, ...] | None = None) -> np.ndarray:
    """Block bytes -> float32 array (optionally reshaped to `shape`).
    Uses the multithreaded C++ codec (native/quants.cpp) when built —
    bit-identical to this numpy path (tests/test_native.py)."""
    t = GGMLType(ggml_type)
    if t in _DEQUANT and _native_enabled():
        from .. import native_ext

        tr = type_traits(t)
        raw = np.ascontiguousarray(blocks, dtype=np.uint8)
        n_elems = raw.size // tr.type_size * tr.block_size
        out = native_ext.dequantize(int(t), raw, n_elems)
        if out is not None:
            return out.reshape(shape) if shape is not None else out
    if t == GGMLType.F32:
        out = np.asarray(blocks, dtype=np.float32)
    elif t == GGMLType.F16:
        out = np.asarray(blocks).astype(np.float32)
    elif t == GGMLType.BF16:
        bits = np.asarray(blocks).view(np.uint16).astype(np.uint32) << 16
        out = bits.view(np.float32)
    elif t in _DEQUANT:
        tr = type_traits(t)
        b = np.ascontiguousarray(blocks, dtype=np.uint8).reshape(-1, tr.type_size)
        out = _DEQUANT[t](b)
    else:
        raise NotImplementedError(f"dequantize: {t.name}")
    return out.reshape(shape) if shape is not None else out.reshape(-1)


_WEIGHTED = {GGMLType.Q3_K, GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K}


def quantize(data: np.ndarray, ggml_type: GGMLType | int,
             qweights: np.ndarray | None = None) -> np.ndarray:
    """float array -> block bytes (uint8, shape [n_blocks, type_size]).
    `qweights`: optional per-element importance (imatrix), same shape as
    `data` — steers the K-quant scale fits toward important channels."""
    t = GGMLType(ggml_type)
    x = np.ascontiguousarray(data, dtype=np.float32)
    if qweights is not None and t in _WEIGHTED:
        tr = type_traits(t)
        w = np.broadcast_to(np.asarray(qweights, np.float32), data.shape)
        return _QUANT[t](x.reshape(-1, tr.block_size),
                         w.reshape(-1, tr.block_size)).reshape(-1, tr.type_size)
    if t in _QUANT and _native_enabled():
        from .. import native_ext

        tr = type_traits(t)
        if x.size % tr.block_size == 0:
            out = native_ext.quantize(int(t), x,
                                      x.size // tr.block_size * tr.type_size)
            if out is not None:
                return out.reshape(-1, tr.type_size)
    if t == GGMLType.F32:
        return x
    if t == GGMLType.F16:
        return x.astype(np.float16)
    if t == GGMLType.BF16:
        if _BF16 is None:
            raise RuntimeError("bf16 quantization requires ml_dtypes")
        return x.astype(_BF16).view(np.uint16)
    if t in _QUANT:
        tr = type_traits(t)
        if x.size % tr.block_size != 0:
            raise ValueError(f"{t.name}: size {x.size} not divisible by {tr.block_size}")
        return _QUANT[t](x.reshape(-1, tr.block_size)).reshape(-1, tr.type_size)
    raise NotImplementedError(f"quantize: {t.name}")


def supported_quant_types() -> list[GGMLType]:
    return sorted(_DEQUANT)
