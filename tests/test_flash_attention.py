"""Flash-decode kernel vs the XLA reference attention (interpret mode —
the CPU-as-oracle strategy of the reference's test-backend-ops)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_tpu.kernels.attention import cache_attention
from omni_tpu.kernels.flash_attention import flash_decode


def _mk(t=1, hq=8, hkv=2, d=128, s=512, seed=0, quant=False):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((t, hq, d)) * 0.3, jnp.float32)
    kf = (rng.standard_normal((hkv, s, d)) * 0.3).astype(np.float32)
    vf = (rng.standard_normal((hkv, s, d)) * 0.3).astype(np.float32)
    # mask: causal-ish random with some fully-masked tail cells
    mask = rng.random((t, s)) < 0.7
    mask[:, -s // 8:] = False
    mask[:, 0] = True  # never a fully-masked query row
    if not quant:
        return q, jnp.asarray(kf), jnp.asarray(vf), None, None, jnp.asarray(mask)
    amax = np.abs(kf).max(-1)
    ks = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    kq = np.round(kf / ks[..., None]).astype(np.int8)
    amax = np.abs(vf).max(-1)
    vs = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
    vq = np.round(vf / vs[..., None]).astype(np.int8)
    return (q, jnp.asarray(kq), jnp.asarray(vq), jnp.asarray(ks),
            jnp.asarray(vs), jnp.asarray(mask))


@pytest.mark.parametrize("t", [1, 4])
@pytest.mark.parametrize("s", [256, 768])
def test_flash_matches_reference_bf16(t, s):
    q, k, v, _, _, mask = _mk(t=t, s=s)
    ref = np.asarray(cache_attention(q, k, v, mask))
    got = np.asarray(flash_decode(q, k, v, mask, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)


def test_flash_matches_reference_int8_kv(ow=None):
    q, kq, vq, ks, vs, mask = _mk(t=2, s=512, quant=True)
    kd = kq.astype(jnp.float32) * ks[..., None]
    vd = vq.astype(jnp.float32) * vs[..., None]
    ref = np.asarray(cache_attention(q, kd, vd, mask))
    got = np.asarray(flash_decode(q, kq, vq, mask, k_scale=ks, v_scale=vs,
                                  interpret=True))
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)


def test_flash_gqa_grouping():
    """Each q head must attend through its own kv group."""
    q, k, v, _, _, mask = _mk(t=1, hq=4, hkv=4, s=256, seed=3)
    ref = np.asarray(cache_attention(q, k, v, mask))
    got = np.asarray(flash_decode(q, k, v, mask, interpret=True))
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)


def test_flash_fully_masked_rows_are_finite():
    q, k, v, _, _, mask = _mk(t=2, s=256, seed=4)
    mask = jnp.zeros_like(mask)  # everything masked
    got = np.asarray(flash_decode(q, k, v, mask, interpret=True))
    assert np.isfinite(got).all()


@pytest.mark.parametrize("t", [1, 2])
def test_flash_matches_reference_int4_kv(t):
    """Packed-int4 KV kernel vs XLA attention on the dequantized pool —
    the q4_0 KV-cache analog (reference include/llama.h:330 type_k)."""
    from omni_tpu.runtime.kv_cache import _dequant4, _quant_rows4

    q, k, v, _, _, mask = _mk(t=t, s=512, seed=7)
    ks, kq = _quant_rows4(k)
    vs, vq = _quant_rows4(v)
    kd = _dequant4(kq, ks).astype(jnp.float32)
    vd = _dequant4(vq, vs).astype(jnp.float32)
    ref = np.asarray(cache_attention(q, kd, vd, mask))
    got = np.asarray(flash_decode(q, kq, vq, mask, k_scale=ks, v_scale=vs,
                                  interpret=True))
    np.testing.assert_allclose(got, ref, rtol=3e-2, atol=3e-2)


def test_int4_pack_roundtrip_and_rmse():
    rng = np.random.default_rng(0)
    from omni_tpu.runtime.kv_cache import _dequant4, _quant_rows4

    x = jnp.asarray(rng.standard_normal((4, 64, 128)) * 0.5, jnp.float32)
    s, q = _quant_rows4(x)
    assert q.dtype == jnp.uint8 and q.shape == (4, 64, 64)
    back = np.asarray(_dequant4(q, s), np.float32)
    # 4-bit symmetric round-trip: error bounded by scale/2 per element
    # (x1.05 + 0.01 slack for the bf16 dequant product rounding)
    bound = np.asarray(s)[..., None] * 0.5 * 1.05 + 0.01
    assert (np.abs(back - np.asarray(x)) <= bound).all()
