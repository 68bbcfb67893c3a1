"""Native C++ layer parity tests: every libomni_native codec is validated
bit-for-bit (or quality-equivalently where summation order matters) against
the numpy reference implementations — the same cross-validation strategy the
reference uses between device backends and its CPU oracle (SURVEY.md §4.1).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module", autouse=True)
def ensure_native():
    from omni_tpu import native_ext

    if not native_ext.available():
        script = os.path.join(REPO, "scripts", "build_native.sh")
        try:
            subprocess.run([script], check=True, capture_output=True,
                           timeout=300)
        except Exception as e:  # pragma: no cover
            pytest.skip(f"native build unavailable: {e}")
        native_ext._lib.cache_clear()
        if not native_ext.available():  # pragma: no cover
            pytest.skip("libomni_native did not load")
    return native_ext


from omni_tpu.core import GGMLType  # noqa: E402
from omni_tpu.core import quants as pyq  # noqa: E402
from omni_tpu.core.dtypes import row_nbytes, type_traits  # noqa: E402

ALL_FORMATS = [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
               GGMLType.Q8_0, GGMLType.Q2_K, GGMLType.Q3_K, GGMLType.Q4_K,
               GGMLType.Q5_K, GGMLType.Q6_K]
# quantizers whose arithmetic is order-independent => bit-exact with numpy
EXACT_QUANT = [GGMLType.Q4_0, GGMLType.Q4_1, GGMLType.Q5_0, GGMLType.Q5_1,
               GGMLType.Q8_0, GGMLType.Q2_K, GGMLType.Q4_K, GGMLType.Q5_K,
               GGMLType.TQ1_0, GGMLType.TQ2_0, GGMLType.MXFP4]



def _numpy_path(fn, *a, **k):
    """Run a dual-path entry point with the native dispatch disabled, so the
    parity tests compare truly independent implementations."""
    prev = os.environ.get("OMNI_NATIVE")
    os.environ["OMNI_NATIVE"] = "0"
    try:
        return fn(*a, **k)
    finally:
        if prev is None:
            os.environ.pop("OMNI_NATIVE", None)
        else:
            os.environ["OMNI_NATIVE"] = prev


def _rand(n, seed=0):
    return (np.random.default_rng(seed).standard_normal(n) * 0.1).astype(np.float32)


@pytest.mark.parametrize("t", ALL_FORMATS, ids=lambda t: t.name)
def test_dequantize_bit_exact(ensure_native, t):
    x = _rand(4 * 256, seed=t.value)
    blocks = _numpy_path(pyq.quantize, x, t)
    ref = _numpy_path(pyq.dequantize, blocks, t)
    out = ensure_native.dequantize(int(t), blocks, x.size)
    assert out is not None
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("t", [GGMLType.F16, GGMLType.BF16],
                         ids=lambda t: t.name)
def test_dequantize_float_formats(ensure_native, t):
    x = _rand(512, seed=9)
    blocks = _numpy_path(pyq.quantize, x, t)
    ref = _numpy_path(pyq.dequantize, blocks, t)
    out = ensure_native.dequantize(int(t), np.ascontiguousarray(blocks), x.size)
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("t", EXACT_QUANT, ids=lambda t: t.name)
def test_quantize_bit_exact(ensure_native, t):
    x = _rand(8 * 256, seed=100 + t.value)
    ref = _numpy_path(pyq.quantize, x, t).reshape(-1).view(np.uint8)
    out = ensure_native.quantize(int(t), x, ref.size)
    assert out is not None
    np.testing.assert_array_equal(out, ref)


@pytest.mark.parametrize("t", [GGMLType.Q3_K, GGMLType.Q6_K],
                         ids=lambda t: t.name)
def test_quantize_quality_equivalent(ensure_native, t):
    """ALS scale fits accumulate sums, so bytes may differ from numpy
    (summation order); the round-trip quality must be equivalent."""
    x = _rand(8 * 256, seed=200 + t.value)
    nbytes = row_nbytes(t, x.size)
    out = ensure_native.quantize(int(t), x, nbytes)
    rt_native = _numpy_path(pyq.dequantize, out, t)
    rt_py = _numpy_path(pyq.dequantize, _numpy_path(pyq.quantize, x, t), t)
    rmse_n = np.sqrt(np.mean((rt_native - x) ** 2))
    rmse_p = np.sqrt(np.mean((rt_py - x) ** 2))
    assert rmse_n <= rmse_p * 1.02
    np.testing.assert_allclose(rt_native, rt_py, rtol=0.2, atol=0.02)


@pytest.mark.parametrize("t", [GGMLType.Q8_0, GGMLType.Q4_K, GGMLType.Q5_K,
                               GGMLType.Q6_K, GGMLType.Q4_0, GGMLType.Q4_1,
                               GGMLType.Q5_0, GGMLType.Q5_1,
                               GGMLType.IQ4_NL, GGMLType.IQ4_XS,
                               GGMLType.MXFP4], ids=lambda t: t.name)
def test_repack_matches_numpy(ensure_native, t):
    """Native repack planes == kernels.qformats numpy repack, bit for bit."""
    from omni_tpu.kernels.qformats import repack as np_repack

    n, k = 6, 512
    x = _rand(n * k, seed=300 + t.value).reshape(n, k)
    blocks = _numpy_path(pyq.quantize, x, t)
    ref = _numpy_path(np_repack, blocks, t, (n, k))
    out = ensure_native.repack(int(t), blocks, n, k)
    assert out is not None
    for name, arr in out.items():
        ref_arr = np.asarray(getattr(ref, name))
        np.testing.assert_array_equal(arr, ref_arr, err_msg=f"plane {name}")


def test_native_gguf_loader(ensure_native, tmp_path):
    from omni_tpu.core import GGUFReader
    from omni_tpu.testing import write_tiny_qwen3

    path = tmp_path / "tiny.gguf"
    write_tiny_qwen3(path, qtype=GGMLType.Q4_K, d_model=256, d_ff=256,
                     n_heads=4, n_kv_heads=2, head_dim=32)
    py = GGUFReader(path)
    nat = ensure_native.NativeGGUF(str(path))
    assert nat.version == 3
    assert set(nat.tensors) == set(py.tensors)
    for name, (t, shape, nbytes) in nat.tensors.items():
        ti = py.tensors[name]
        assert t == int(ti.ggml_type), name
        assert tuple(shape) == tuple(ti.shape), name
        raw_py = np.ascontiguousarray(ti.data).view(np.uint8).reshape(-1)
        raw_nat = nat.tensor_bytes(name)
        np.testing.assert_array_equal(raw_nat, raw_py, err_msg=name)
    nat.close()


def test_log_mel_matches_numpy(ensure_native):
    from omni_tpu.omni.audio import log_mel_spectrogram

    rng = np.random.default_rng(0)
    samples = (rng.standard_normal(16000) * 0.1).astype(np.float32)
    mel_filters = rng.random((80, 201), dtype=np.float32) * 0.01
    ref = _numpy_path(log_mel_spectrogram, samples, mel_filters)
    out = ensure_native.log_mel(samples, mel_filters)
    assert out is not None
    assert out.shape == ref.shape == (100, 80)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_wav_roundtrip_and_parity(ensure_native, tmp_path):
    from omni_tpu.omni.audio import load_wav_mono_16k, write_wav

    rng = np.random.default_rng(1)
    samples = (rng.standard_normal(16000) * 0.3).clip(-1, 1).astype(np.float32)
    p16 = tmp_path / "a.wav"
    write_wav(str(p16), samples, rate=16000)

    ref = _numpy_path(load_wav_mono_16k, str(p16))
    out = ensure_native.read_wav_mono_16k(str(p16))
    assert out is not None
    np.testing.assert_allclose(out, ref, atol=1e-6)

    # native writer -> python reader round trip
    p2 = tmp_path / "b.wav"
    assert ensure_native.write_wav(str(p2), samples, rate=16000)
    back = _numpy_path(load_wav_mono_16k, str(p2))
    # write scale 32767 vs read scale 32768 => ~2 LSB bound
    np.testing.assert_allclose(back, samples, atol=2.1 / 32767)


def test_wav_resample_parity(ensure_native, tmp_path):
    """24 kHz -> 16 kHz linear resample matches np.interp within fp noise."""
    from omni_tpu.omni.audio import load_wav_mono_16k, write_wav

    rng = np.random.default_rng(2)
    samples = (np.sin(np.arange(24000) * 0.05)
               + rng.standard_normal(24000) * 0.01).astype(np.float32) * 0.5
    p = tmp_path / "c.wav"
    write_wav(str(p), samples, rate=24000)
    ref = _numpy_path(load_wav_mono_16k, str(p))
    out = ensure_native.read_wav_mono_16k(str(p))
    assert out is not None
    assert abs(len(out) - len(ref)) <= 1
    m = min(len(out), len(ref))
    np.testing.assert_allclose(out[:m], ref[:m], atol=1e-5)


def test_reference_wav_fixture(ensure_native):
    """Real WAV from the reference's committed omni test assets."""
    import glob

    from omni_tpu.omni.audio import load_wav_mono_16k

    fixtures = sorted(glob.glob(
        "/root/reference/tools/omni/assets/test_case/**/*.wav",
        recursive=True))
    if not fixtures:
        pytest.skip("reference assets not mounted")
    ref = _numpy_path(load_wav_mono_16k, fixtures[0])
    out = ensure_native.read_wav_mono_16k(fixtures[0])
    assert out is not None
    m = min(len(out), len(ref))
    assert m > 1000
    np.testing.assert_allclose(out[:m], ref[:m], atol=1e-4)


def test_f16_conversion_exhaustive(ensure_native):
    """All 65536 f16 bit patterns -> f32 must match numpy exactly (this
    caught a subnormal off-by-one in the first native implementation)."""
    allh = np.arange(65536, dtype=np.uint16)
    out = ensure_native.dequantize(1, allh.view(np.uint8), 65536)
    ref = allh.view(np.float16).astype(np.float32)
    mask = ~np.isnan(ref)
    np.testing.assert_array_equal(out[mask], ref[mask])
    assert np.isnan(out[~mask]).all()


def test_f16_subnormal_scale_block(ensure_native):
    """Q6_K block whose superscale lands in the f16 subnormal range."""
    x = (np.random.default_rng(214).standard_normal(256) * 0.1).astype(np.float32)
    bp = _numpy_path(pyq.quantize, x, GGMLType.Q6_K).reshape(-1).view(np.uint8)
    bn = ensure_native.quantize(int(GGMLType.Q6_K), x, bp.size)
    np.testing.assert_array_equal(bn, bp)


IQ_FORMATS = [GGMLType.IQ4_NL, GGMLType.IQ4_XS, GGMLType.IQ2_XXS,
              GGMLType.IQ3_XXS, GGMLType.IQ2_S, GGMLType.IQ3_S,
              GGMLType.IQ1_S]


@pytest.mark.parametrize("t", IQ_FORMATS, ids=lambda t: t.name)
def test_iquant_dequantize_bit_exact(ensure_native, t):
    """i-quants have no encoder; native dequant of random valid block
    bytes must match the numpy codec bit-for-bit."""
    from omni_tpu.core import type_traits

    tr = type_traits(t)
    rng = np.random.default_rng(t.value)
    raw = rng.integers(0, 256, (32, tr.type_size), dtype=np.uint8)
    d = (rng.random(32).astype(np.float16) + 0.25)
    raw[:, :2] = d[:, None].view(np.uint8).reshape(32, 2)
    raw = raw.reshape(-1)
    ref = _numpy_path(pyq.dequantize, raw, t)
    out = ensure_native.dequantize(int(t), raw, 32 * tr.block_size)
    assert out is not None
    np.testing.assert_array_equal(out, ref)


TAIL_FORMATS = [GGMLType.TQ1_0, GGMLType.TQ2_0, GGMLType.IQ2_XS,
                GGMLType.MXFP4, GGMLType.IQ1_M]


@pytest.mark.parametrize("t", TAIL_FORMATS, ids=lambda t: t.name)
def test_ternary_mx_dequantize_bit_exact(ensure_native, t):
    """ternary / IQ2_XS / MXFP4 native dequant of random valid block bytes
    matches the numpy codec bit-for-bit (scale byte position per format)."""
    from omni_tpu.core import type_traits

    tr = type_traits(t)
    rng = np.random.default_rng(t.value)
    raw = rng.integers(0, 256, (32, tr.type_size), dtype=np.uint8)
    if t in (GGMLType.TQ1_0, GGMLType.TQ2_0):
        d = (rng.random(32).astype(np.float16) + 0.25)
        raw[:, -2:] = d[:, None].view(np.uint8).reshape(32, 2)
    elif t is GGMLType.IQ2_XS:
        d = (rng.random(32).astype(np.float16) + 0.25)
        raw[:, :2] = d[:, None].view(np.uint8).reshape(32, 2)
    elif t is GGMLType.IQ1_M:
        raw[:, -8:] &= 0x7F  # keep the scattered f16 super-scale finite
    else:  # MXFP4: e8m0 exponent byte, keep mid-range
        raw[:, 0] = rng.integers(100, 150, 32, dtype=np.uint8)
    raw = raw.reshape(-1)
    ref = _numpy_path(pyq.dequantize, raw, t)
    out = ensure_native.dequantize(int(t), raw, 32 * tr.block_size)
    assert out is not None
    np.testing.assert_array_equal(out, ref)
