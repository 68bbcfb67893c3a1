"""Quantized-weight kernel tests (TPU analog of the reference's
tests/test-backend-ops.cpp op-conformance harness: numpy codec is the
oracle, the XLA path and the Pallas kernel must agree with it)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_tpu.core import GGMLType, quants
from omni_tpu.kernels import (
    QTensor,
    dequant,
    matmul,
    qmatmul_pallas,
    qmatmul_xla,
    repack,
)

NATIVE = [GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q8_0,
          GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
          GGMLType.IQ4_NL, GGMLType.IQ4_XS, GGMLType.MXFP4,
          GGMLType.Q2_K, GGMLType.Q3_K]


def _make_qtensor(rng, qtype, n=16, k=512):
    w = rng.standard_normal((n, k), dtype=np.float32)
    blocks = quants.quantize(w, qtype)
    ref = quants.dequantize(blocks, qtype, (n, k))  # bit-exact f32 reference
    return repack(blocks, qtype, (n, k)), ref


@pytest.mark.parametrize("qtype", NATIVE, ids=lambda t: t.name)
def test_repack_dequant_bit_exact(qtype, rng):
    """XLA dequant of the repacked SoA layout == numpy block dequant, bitwise."""
    qt, ref = _make_qtensor(rng, qtype)
    got = np.asarray(dequant(qt, jnp.float32))
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("qtype", NATIVE, ids=lambda t: t.name)
def test_qmatmul_xla_matches_dense(qtype, rng):
    qt, ref = _make_qtensor(rng, qtype)
    x = rng.standard_normal((4, qt.shape[1]), dtype=np.float32)
    got = np.asarray(qmatmul_xla(jnp.asarray(x), qt, out_dtype=jnp.float32))
    want = x.astype(np.float32) @ ref.T
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-1)


@pytest.mark.parametrize("qtype", NATIVE, ids=lambda t: t.name)
def test_qmatmul_gp_interpret_matches_xla(qtype, rng):
    """The group-parallel decode kernel (M=1 production default on TPU:
    raw quants to the MXU against a block-diagonal activation, scale law
    applied on the [K/gw, N] plane) must agree with the XLA fallback,
    including ragged N edges and multi-k-tile K."""
    from omni_tpu.kernels.dequant_matmul import gp_supported, qmatmul_gp_pallas

    qt, _ = _make_qtensor(rng, qtype, n=24, k=4096 + 2048)  # ragged N,
    # K = 3 sub-slices x 2048: exercises tile edge + slice unroll
    assert gp_supported(1, qt)
    x = jnp.asarray(rng.standard_normal((1, qt.shape[1]), dtype=np.float32))
    got = qmatmul_gp_pallas(x, qt, block_n=16, out_dtype=jnp.float32,
                            interpret=True)
    want = qmatmul_xla(x, qt, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2,
                               atol=2e-1)


@pytest.mark.parametrize("qtype", NATIVE, ids=lambda t: t.name)
@pytest.mark.parametrize("m", [2, 3, 8], ids=lambda m: f"m{m}")
def test_qmatmul_gp_smallm_matches_xla(qtype, m, rng):
    """Small-M group-parallel extension (M=2..8: multi-slot batched decode
    and speculative-verify rows): each batch row rides its own block-
    diagonal band; per-band reduction must match the XLA fallback."""
    from omni_tpu.kernels.dequant_matmul import gp_supported, qmatmul_gp_pallas

    qt, _ = _make_qtensor(rng, qtype, n=24, k=4096)
    assert gp_supported(m, qt)
    x = jnp.asarray(rng.standard_normal((m, qt.shape[1]), dtype=np.float32))
    got = qmatmul_gp_pallas(x, qt, block_n=16, out_dtype=jnp.float32,
                            interpret=True)
    want = qmatmul_xla(x, qt, out_dtype=jnp.float32)
    # atol 0.4: both paths accumulate bf16 products over K=4096; near-zero
    # outputs (cancellation) land within ~0.3 of the f64 oracle on either
    # side (checked element-wise against the dense f64 dot)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2,
                               atol=4e-1)


@pytest.mark.parametrize("qtype", [GGMLType.Q4_K, GGMLType.Q8_0, GGMLType.Q6_K],
                         ids=lambda t: t.name)
@pytest.mark.parametrize("m", [2, 3, 8], ids=lambda m: f"m{m}")
def test_qmatmul_gp_smallm_wide_n(qtype, m, rng):
    """Regression (round-4 advisor, high): the n>4096 block_ks branch picked
    a non-divisor sub-slice for m=3 (1024//3=341, AssertionError at the
    standard 24576x4096 gateup shape). ks must snap to a 256-multiple
    divisor of tk for every small M. n is kept modest via block_n override;
    the branch under test depends only on the FULL n."""
    from omni_tpu.kernels.dequant_matmul import gp_supported, qmatmul_gp_pallas

    qt, _ = _make_qtensor(rng, qtype, n=4096 + 128, k=4096)
    assert gp_supported(m, qt)
    x = jnp.asarray(rng.standard_normal((m, qt.shape[1]), dtype=np.float32))
    got = qmatmul_gp_pallas(x, qt, block_n=128, out_dtype=jnp.float32,
                            interpret=True)
    want = qmatmul_xla(x, qt, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2,
                               atol=4e-1)


SH_TYPES = [GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q4_0, GGMLType.Q4_1,
            GGMLType.Q5_0, GGMLType.Q5_1]


@pytest.mark.parametrize("qtype", SH_TYPES, ids=lambda t: t.name)
@pytest.mark.parametrize("m", [48, 300], ids=lambda m: f"m{m}")
def test_qmatmul_splith_matches_xla(qtype, m, rng):
    """Split-half prefill kernel (M>8 on halves-packed formats): separate
    low/high nibble-plane contractions against a pre-split activation +
    the group-min law as an MXU side dot must agree with the XLA fallback,
    including a ragged N edge and multi-k-tile K."""
    from omni_tpu.kernels.dequant_matmul import (sh_supported,
                                                 qmatmul_splith_pallas)

    qt, _ = _make_qtensor(rng, qtype, n=24, k=4096)
    assert sh_supported(m, qt) and not sh_supported(8, qt)
    x = jnp.asarray(rng.standard_normal((m, qt.shape[1]), dtype=np.float32))
    got = qmatmul_splith_pallas(x, qt, block_m=64, block_n=16, block_k=2048,
                                out_dtype=jnp.float32, interpret=True)
    want = qmatmul_xla(x, qt, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2,
                               atol=4e-1)


@pytest.mark.parametrize("m", [1, 2], ids=lambda m: f"m{m}")
def test_qmatmul_gp_odd_k_divisor(m, rng):
    """Regression (round-4 advisor, low): K=1280 (gpt2-large) is a valid
    gp_supported shape but the default ks=512 does not divide tk=1280 —
    the divisor snap must land on a working sub-slice."""
    from omni_tpu.kernels.dequant_matmul import gp_supported, qmatmul_gp_pallas

    qt, _ = _make_qtensor(rng, GGMLType.Q8_0, n=24, k=1280)
    assert gp_supported(m, qt)
    x = jnp.asarray(rng.standard_normal((m, qt.shape[1]), dtype=np.float32))
    got = qmatmul_gp_pallas(x, qt, block_n=16, out_dtype=jnp.float32,
                            interpret=True)
    want = qmatmul_xla(x, qt, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2,
                               atol=2e-1)


@pytest.mark.parametrize("qtype", NATIVE, ids=lambda t: t.name)
@pytest.mark.parametrize("m", [1, 4, 48], ids=lambda m: f"m{m}")
def test_qmatmul_pallas_interpret_matches_xla(qtype, m, rng):
    """The fused Pallas kernel (interpret mode on CPU) must agree with the
    XLA fallback to bf16 tolerance, including ragged N edges."""
    qt, _ = _make_qtensor(rng, qtype, n=24, k=512)  # n=24 < block_n: ragged
    x = jnp.asarray(rng.standard_normal((m, qt.shape[1]), dtype=np.float32))
    got = qmatmul_pallas(x, qt, block_m=32, block_n=16, out_dtype=jnp.float32,
                         interpret=True)
    want = qmatmul_xla(x, qt, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-1)


def test_matmul_dense_path(rng):
    x = jnp.asarray(rng.standard_normal((3, 64), dtype=np.float32))
    w = jnp.asarray(rng.standard_normal((32, 64), dtype=np.float32))
    got = matmul(x, w, out_dtype=jnp.float32)
    # matmuls run at DEFAULT (bf16-ish) precision by policy
    np.testing.assert_allclose(np.asarray(got), np.asarray(x) @ np.asarray(w).T,
                               rtol=2e-2, atol=1e-1)


def test_qtensor_is_pytree(rng):
    qt, _ = _make_qtensor(rng, GGMLType.Q5_K)
    leaves, treedef = jax.tree_util.tree_flatten(qt)
    qt2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert qt2.ggml_type == qt.ggml_type and qt2.shape == qt.shape
    assert qt2.qh is not None

    @jax.jit
    def f(q, x):
        return qmatmul_xla(x, q, out_dtype=jnp.float32)

    x = jnp.ones((2, qt.shape[1]), jnp.float32)
    out = f(qt, x)
    assert out.shape == (2, qt.shape[0])


@pytest.mark.parametrize("types", [
    (GGMLType.Q4_K, GGMLType.Q6_K),  # Q4_K_M recipe: down is Q6_K
    (GGMLType.Q8_0, GGMLType.Q8_0),
    (GGMLType.Q4_0, GGMLType.Q4_0),
], ids=lambda t: f"{t[0].name}-{t[1].name}")
@pytest.mark.parametrize("m", [1, 40], ids=lambda m: f"m{m}")
@pytest.mark.parametrize("act", ["silu", "gelu_tanh"])
def test_qffn_fused_matches_composition(types, m, act, rng):
    """One-dispatch SwiGLU FFN (gate/up/act/down in a single Pallas call,
    interpret mode) == the two-call qmatmul composition."""
    from omni_tpu.kernels.fused_ffn import qffn_pallas

    t_gu, t_dn = types
    k, f = 512, 768
    gu, gu_ref = _make_qtensor(rng, t_gu, n=2 * f, k=k)
    dn, dn_ref = _make_qtensor(rng, t_dn, n=k, k=f)
    x = jnp.asarray(rng.standard_normal((m, k), dtype=np.float32) * 0.1,
                    jnp.bfloat16)

    got = np.asarray(qffn_pallas(x, gu, dn, block_m=32, block_f=256,
                                 act=act, out_dtype=jnp.float32,
                                 interpret=True))

    g_u = qmatmul_xla(x, gu, out_dtype=jnp.float32)
    g, u = g_u[:, :f], g_u[:, f:]
    if act == "silu":
        h = jax.nn.silu(g) * u
    else:
        h = jax.nn.gelu(g, approximate=True) * u
    want = np.asarray(qmatmul_xla(h.astype(jnp.bfloat16), dn,
                                  out_dtype=jnp.float32))
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-2)
