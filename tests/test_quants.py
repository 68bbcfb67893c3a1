"""Quantization codec tests.

Strategy (mirrors the reference's tests/test-quantize-fns.cpp): round-trip
RMSE bounds per format, plus bit-exact dequantization cross-checked against
the reference's own numpy codec (gguf-py) as an oracle.
"""

import numpy as np
import pytest

from omni_tpu.core import GGMLType, quants, type_traits

# (type, max round-trip RMSE for N(0,1) data) — bounds chosen analogous to
# the reference's MAX_QUANTIZATION_TOTAL_ERROR thresholds.
FORMATS = [
    (GGMLType.Q4_0, 0.12),
    (GGMLType.Q4_1, 0.10),
    (GGMLType.Q5_0, 0.06),
    (GGMLType.Q5_1, 0.05),
    (GGMLType.Q8_0, 0.01),
    (GGMLType.Q2_K, 0.35),
    (GGMLType.Q3_K, 0.18),
    (GGMLType.Q4_K, 0.10),
    (GGMLType.Q5_K, 0.05),
    (GGMLType.Q6_K, 0.03),
    # ternary: N(0,1) data rounds to {-d,0,d} against the block absmax, so
    # the bound is inherently coarse (BitNet models are trained ternary)
    (GGMLType.TQ1_0, 0.85),
    (GGMLType.TQ2_0, 0.85),
    (GGMLType.MXFP4, 0.15),
    # non-linear 4-bit codebook encoders (candidate-search scale fit)
    (GGMLType.IQ4_NL, 0.09),
    (GGMLType.IQ4_XS, 0.09),
]


@pytest.mark.parametrize("qtype,max_rmse", FORMATS, ids=lambda p: getattr(p, "name", p))
def test_round_trip_rmse(qtype, max_rmse, rng):
    x = rng.standard_normal((8, 512), dtype=np.float32)
    q = quants.quantize(x, qtype)
    y = quants.dequantize(q, qtype, x.shape)
    rmse = float(np.sqrt(np.mean((x - y) ** 2)))
    assert rmse < max_rmse, f"{qtype.name}: rmse {rmse}"


@pytest.mark.parametrize("qtype,_", FORMATS, ids=lambda p: getattr(p, "name", p))
def test_dequant_bit_exact_vs_oracle(qtype, _, oracle, rng):
    """Our dequantization of arbitrary valid block bytes must agree bit-for-
    bit with the reference numpy codec."""
    from gguf.constants import GGMLQuantizationType as OT

    x = rng.standard_normal((4, 1024), dtype=np.float32) * 3.0
    blocks = quants.quantize(x, qtype)  # valid on-disk bytes
    raw = np.ascontiguousarray(blocks).view(np.uint8).reshape(4, -1)
    theirs = oracle.dequantize(raw, OT(int(qtype)))
    ours = quants.dequantize(blocks, qtype, theirs.shape)
    np.testing.assert_array_equal(ours, theirs.astype(np.float32))


@pytest.mark.parametrize("qtype", [GGMLType.TQ1_0, GGMLType.TQ2_0,
                                   GGMLType.MXFP4],
                         ids=lambda p: p.name)
def test_ternary_mx_quantize_bit_exact_vs_oracle(qtype, oracle, rng):
    """TQ1_0/TQ2_0/MXFP4 encoders match the reference numpy codec
    bit-for-bit (order-independent arithmetic, no imatrix needed)."""
    from gguf.constants import GGMLQuantizationType as OT

    x = (rng.standard_normal(8 * 256) * 0.1).astype(np.float32)
    ours = quants.quantize(x, qtype)
    theirs = oracle.quantize(x, OT(int(qtype)))
    np.testing.assert_array_equal(ours.reshape(-1), theirs.reshape(-1))


@pytest.mark.parametrize("qtype", [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0,
                                   GGMLType.Q5_1, GGMLType.Q8_0],
                         ids=lambda p: p.name)
def test_quantize_bit_exact_vs_oracle(qtype, oracle, rng):
    """For legacy 32-element formats our quantizer matches the reference's
    rounding semantics byte-for-byte."""
    from gguf.constants import GGMLQuantizationType as OT

    x = rng.standard_normal((4, 256), dtype=np.float32)
    ours = np.ascontiguousarray(quants.quantize(x, qtype)).view(np.uint8).reshape(4, -1)
    theirs = oracle.quantize(x, OT(int(qtype)))
    np.testing.assert_array_equal(ours, theirs)


def test_f16_bf16_roundtrip(rng):
    x = rng.standard_normal((2, 64), dtype=np.float32)
    f16 = quants.quantize(x, GGMLType.F16)
    assert f16.dtype == np.float16
    np.testing.assert_allclose(quants.dequantize(f16, GGMLType.F16, x.shape), x,
                               atol=2e-3, rtol=2e-3)
    bf16 = quants.quantize(x, GGMLType.BF16)
    assert bf16.dtype == np.uint16
    np.testing.assert_allclose(quants.dequantize(bf16, GGMLType.BF16, x.shape), x,
                               atol=2e-2, rtol=2e-2)


def test_block_geometry():
    for qtype, _ in FORMATS:
        tr = type_traits(qtype)
        x = np.zeros((tr.block_size * 2,), dtype=np.float32)
        q = quants.quantize(x, qtype)
        assert q.shape == (2, tr.type_size)
        y = quants.dequantize(q, qtype)
        assert y.shape == (tr.block_size * 2,)
        assert np.all(y == 0)


IQ_FORMATS = [GGMLType.IQ4_NL, GGMLType.IQ4_XS, GGMLType.IQ2_XXS,
              GGMLType.IQ3_XXS, GGMLType.IQ2_S, GGMLType.IQ3_S,
              GGMLType.IQ1_S]


@pytest.mark.parametrize("qtype", IQ_FORMATS, ids=lambda p: p.name)
def test_iquant_dequant_bit_exact_vs_oracle(qtype, oracle, rng):
    """i-quant (codebook) formats: dequantization of random valid block
    bytes matches the reference numpy codec bit-for-bit (we only need
    DEquantization — i-quant encoders require imatrix calibration)."""
    from gguf.constants import GGMLQuantizationType as OT

    tr = type_traits(qtype)
    rows, blocks_per_row = 4, 8
    raw = rng.integers(0, 256, (rows, blocks_per_row, tr.type_size),
                       dtype=np.uint8)
    # keep the f16 super-scale finite and sane
    d = (rng.random((rows, blocks_per_row)).astype(np.float16) + 0.25)
    raw[:, :, :2] = d[..., None].view(np.uint8).reshape(rows, blocks_per_row, 2)
    raw = raw.reshape(rows, -1)
    theirs = oracle.dequantize(raw, OT(int(qtype))).astype(np.float32)
    ours = quants.dequantize(raw, qtype, theirs.shape)
    np.testing.assert_array_equal(ours, theirs)


# trailing-scale (ternary), nibble-packed-scale and e8m0-scale formats:
# the scale byte offset differs from the IQ convention
TAIL_FORMATS = [GGMLType.TQ1_0, GGMLType.TQ2_0, GGMLType.IQ2_XS,
                GGMLType.MXFP4, GGMLType.IQ1_M]


@pytest.mark.parametrize("qtype", TAIL_FORMATS, ids=lambda p: p.name)
def test_ternary_mx_dequant_bit_exact_vs_oracle(qtype, oracle, rng):
    """TQ1_0/TQ2_0 (ternary), IQ2_XS and MXFP4: dequantization of random
    valid block bytes matches the reference numpy codec bit-for-bit."""
    from gguf.constants import GGMLQuantizationType as OT

    tr = type_traits(qtype)
    rows, blocks_per_row = 4, 8
    raw = rng.integers(0, 256, (rows, blocks_per_row, tr.type_size),
                       dtype=np.uint8)
    if qtype in (GGMLType.TQ1_0, GGMLType.TQ2_0):
        # f16 scale sits at the END of the block — keep it finite
        d = (rng.random((rows, blocks_per_row)).astype(np.float16) + 0.25)
        raw[:, :, -2:] = d[..., None].view(np.uint8).reshape(
            rows, blocks_per_row, 2)
    elif qtype is GGMLType.IQ2_XS:
        d = (rng.random((rows, blocks_per_row)).astype(np.float16) + 0.25)
        raw[:, :, :2] = d[..., None].view(np.uint8).reshape(
            rows, blocks_per_row, 2)
    elif qtype is GGMLType.IQ1_M:
        # f16 super-scale is scattered across the top nibbles of the 4
        # trailing scale words — keep those nibbles in a finite range
        raw[:, :, -8:] &= 0x7F  # clear each word's high nibble top bit
    else:  # MXFP4: single e8m0 exponent byte, keep it mid-range
        raw[:, :, 0] = rng.integers(100, 150, (rows, blocks_per_row),
                                    dtype=np.uint8)
    raw = raw.reshape(rows, -1)
    theirs = oracle.dequantize(raw, OT(int(qtype))).astype(np.float32)
    ours = quants.dequantize(raw, qtype, theirs.shape)
    np.testing.assert_array_equal(ours, theirs)


def test_iq4_encoder_beats_q4_0(rng):
    """The IQ4_NL non-linear codebook fit must beat linear Q4_0 on N(0,1)
    data — the point of the format (ggml quantize_iq4_nl)."""
    x = rng.standard_normal(16 * 256).astype(np.float32)

    def rmse(t):
        y = quants.dequantize(quants.quantize(x, t), t, x.shape)
        return float(np.sqrt(np.mean((x - y) ** 2)))

    assert rmse(GGMLType.IQ4_NL) < rmse(GGMLType.Q4_0)
    assert rmse(GGMLType.IQ4_XS) < rmse(GGMLType.Q4_0)
