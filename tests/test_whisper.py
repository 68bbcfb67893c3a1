"""APM streaming encoder tests (tiny random weights, real code paths)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_tpu.models import whisper
from omni_tpu.omni.audio import HOP, SAMPLE_RATE, hann_window, log_mel_spectrogram


def tiny_cfg():
    return whisper.WhisperConfig(n_layers=2, d_model=64, n_heads=4,
                                 n_audio_ctx=300, n_mels=16, d_out=32)


def tiny_params(cfg, seed=0):
    rng = np.random.default_rng(seed)

    def r(*shape, s=0.1):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * s)

    d = cfg.d_model
    p = {
        "conv1_w": r(d, cfg.n_mels, 3), "conv1_b": r(d),
        "conv2_w": r(d, d, 3), "conv2_b": r(d),
        "pos": r(cfg.n_audio_ctx, d),
        "ln_post_w": jnp.ones(d), "ln_post_b": jnp.zeros(d),
        "proj1_w": r(cfg.d_out, d), "proj1_b": r(cfg.d_out),
        "proj2_w": r(cfg.d_out, cfg.d_out), "proj2_b": r(cfg.d_out),
        "layers": [],
    }
    for _ in range(cfg.n_layers):
        p["layers"].append({
            "attn_ln_w": jnp.ones(d), "attn_ln_b": jnp.zeros(d),
            "wq": r(d, d), "bq": r(d), "wk": r(d, d),
            "wv": r(d, d), "bv": r(d), "wo": r(d, d), "bo": r(d),
            "mlp_ln_w": jnp.ones(d), "mlp_ln_b": jnp.zeros(d),
            "w1": r(2 * d, d), "b1": r(2 * d), "w2": r(d, 2 * d), "b2": r(d),
        })
    return p


def test_chunk_shapes_and_cadence(rng):
    """1 s -> 100 mel -> 50 conv frames -> 10 output tokens."""
    cfg = tiny_cfg()
    p = tiny_params(cfg)
    state = whisper.WhisperState.create(cfg)
    mel = jnp.asarray(rng.standard_normal((100, cfg.n_mels)), jnp.float32)
    out, state = whisper.encode_chunk(p, cfg, mel, state)
    assert out.shape == (10, cfg.d_out)
    assert int(state.n_cached) == 50


def test_streaming_cache_grows_and_changes_output(rng):
    """Chunk 2 attends over chunk 1's cache: output differs from a fresh
    state, and pos-embed offset advances."""
    cfg = tiny_cfg()
    p = tiny_params(cfg)
    mel1 = jnp.asarray(rng.standard_normal((100, cfg.n_mels)), jnp.float32)
    mel2 = jnp.asarray(rng.standard_normal((100, cfg.n_mels)), jnp.float32)

    s0 = whisper.WhisperState.create(cfg)
    _, s1 = whisper.encode_chunk(p, cfg, mel1, s0)
    out_ctx, s2 = whisper.encode_chunk(p, cfg, mel2, s1)
    assert int(s2.n_cached) == 100

    out_fresh, _ = whisper.encode_chunk(p, cfg, mel2, whisper.WhisperState.create(cfg))
    assert not np.allclose(np.asarray(out_ctx), np.asarray(out_fresh))


def test_cache_garbage_beyond_valid_is_masked(rng):
    """Cells past n_cached must not influence the result."""
    import dataclasses

    cfg = tiny_cfg()
    p = tiny_params(cfg)
    mel = jnp.asarray(rng.standard_normal((100, cfg.n_mels)), jnp.float32)
    s = whisper.WhisperState.create(cfg)
    out_a, _ = whisper.encode_chunk(p, cfg, mel, s)
    s_garbage = dataclasses.replace(
        s, k=s.k + 100.0, v=s.v - 50.0)  # garbage everywhere (all unused)
    out_b, _ = whisper.encode_chunk(p, cfg, mel, s_garbage)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-5, atol=1e-5)


def test_log_mel_contract(rng):
    """100 frames per second; normalization range (x+4)/4 with max-8 floor."""
    mel_filters = np.abs(rng.standard_normal((16, 201)).astype(np.float32)) * 0.01
    audio = rng.standard_normal(SAMPLE_RATE).astype(np.float32) * 0.1
    m = log_mel_spectrogram(audio, mel_filters)
    assert m.shape == (100, 16)
    span = m.max() - m.min()
    assert span <= 2.0 + 1e-5  # 8 dB window / 4
    w = hann_window()
    assert w.shape == (400,) and abs(float(w[0])) < 1e-6


def test_encode_chunk_jits(rng):
    cfg = tiny_cfg()
    p = tiny_params(cfg)
    f = jax.jit(lambda p, m, s: whisper.encode_chunk(p, cfg, m, s))
    mel = jnp.asarray(rng.standard_normal((100, cfg.n_mels)), jnp.float32)
    out, s = f(p, mel, whisper.WhisperState.create(cfg))
    out2, s = f(p, mel, s)
    assert out.shape == out2.shape == (10, cfg.d_out)
    assert int(s.n_cached) == 100
