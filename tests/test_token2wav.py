"""Token2Wav pipeline tests: DiT/CFM streaming, conformer upsampler cadence,
HiFiGAN vocoder shape/energy, and the windowed session protocol
(25+3 tokens -> 1 s of 24 kHz audio)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import omni_tpu.models.token2wav as t2w
from omni_tpu.models.token2wav import conformer as conf
from omni_tpu.models.token2wav import dit as ditm
from omni_tpu.models.token2wav import hifigan as hg


# ---------------------------------------------------------------------------
# tiny parameter builders
# ---------------------------------------------------------------------------

from omni_tpu.testing_t2w import r, tiny_conformer, tiny_dit, tiny_hifigan


@pytest.fixture(scope="module")
def rng0():
    return np.random.default_rng(0)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_dit_cfm_chunk_shapes_and_stream(rng0):
    p, cfg = tiny_dit(rng0)
    state = ditm.CFMState.create(cfg, n_steps=2)
    mu = r(rng0, 8, cfg.out_channels)
    spk = r(rng0, cfg.out_channels)
    mel1, state = ditm.cfm_solve_chunk(p, cfg, mu, spk, state, n_timesteps=2)
    assert mel1.shape == (8, cfg.out_channels)
    assert int(state.n) == 8
    mel2, state = ditm.cfm_solve_chunk(p, cfg, mu, spk, state, n_timesteps=2)
    assert int(state.n) == 16
    # context changes the result
    assert not np.allclose(np.asarray(mel1), np.asarray(mel2))
    assert np.isfinite(np.asarray(mel2)).all()


def test_dit_noise_is_position_deterministic(rng0):
    n1 = np.asarray(ditm._noise(4, 6, 0, 1.0))
    n2 = np.asarray(ditm._noise(4, 6, 0, 1.0))
    n3 = np.asarray(ditm._noise(4, 6, 3, 1.0))
    np.testing.assert_array_equal(n1, n2)
    np.testing.assert_array_equal(n1[0, 3:], n3[0, :3])  # position-aligned


def test_conformer_chunk_cadence(rng0):
    p, cfg = tiny_conformer(rng0)
    state = conf.ConformerState.create(cfg)
    xs = r(rng0, 28, cfg.d_model)
    feats, state = conf.encode_chunk(p, cfg, xs, state)
    # 28 tokens - 3 lookahead = 25 -> x2 upsample = 50 output frames
    assert feats.shape == (50, cfg.d_model)
    assert int(state.n1) == 25 and int(state.n2) == 50
    feats2, state = conf.encode_chunk(p, cfg, xs, state)
    assert feats2.shape == (50, cfg.d_model)
    assert not np.allclose(np.asarray(feats), np.asarray(feats2))


def test_conformer_final_chunk_pads(rng0):
    p, cfg = tiny_conformer(rng0)
    state = conf.ConformerState.create(cfg)
    xs = r(rng0, 28, cfg.d_model)
    feats, _ = conf.encode_chunk(p, cfg, xs, state, last_chunk=True)
    assert feats.shape == (56, cfg.d_model)  # all 28 tokens upsampled


def test_hifigan_shapes(rng0):
    p = tiny_hifigan(rng0)
    mel = r(rng0, 10, 16, s=1.0)
    wave, source = hg.vocode(p, mel)
    assert wave.shape == (10 * 480,)
    assert source.shape == (10 * 480,)
    assert np.isfinite(np.asarray(wave)).all()
    assert np.abs(np.asarray(wave)).max() <= hg.AUDIO_LIMIT + 1e-6


def test_stft_istft_roundtrip(rng0):
    x = jnp.asarray(np.sin(np.arange(480) * 0.05).astype(np.float32))
    real, imag = hg.stft16(x)
    assert real.shape == (9, 120)
    y = np.asarray(hg.istft16(real, imag))
    # reconstruction up to boundary frames
    np.testing.assert_allclose(y[16:-16], np.asarray(x)[16:-16], atol=1e-3)


def test_token2wav_session_window_protocol(rng0):
    dit_p, dit_cfg = tiny_dit(rng0)
    conf_p, conf_cfg = tiny_conformer(rng0, d=32)
    voc_p = tiny_hifigan(rng0)
    extra = {
        "input_embedding": r(rng0, 5000, conf_cfg.d_model),
        "spk_affine_w": r(rng0, dit_cfg.out_channels, t2w.SPK_DIM),
        "spk_affine_b": r(rng0, dit_cfg.out_channels),
        "encoder_proj_w": r(rng0, dit_cfg.out_channels, conf_cfg.d_model),
        "encoder_proj_b": r(rng0, dit_cfg.out_channels),
    }
    sess = t2w.Token2Wav(conf_p, conf_cfg, extra, dit_p, dit_cfg, voc_p,
                         spk=np.random.default_rng(1).standard_normal(192),
                         n_timesteps=2)

    tokens = np.arange(28) % 100
    wave1 = sess.feed_window(tokens)
    # 25 main tokens -> 50 mel -> 1 s of 24 kHz audio (first window: no cache)
    assert wave1.shape == (24000,)
    wave2 = sess.feed_window(tokens)
    # later windows include the 8-frame regenerated head (reference contract)
    assert wave2.shape == (24000 + 8 * 480,)
    assert np.isfinite(wave2).all()

    sess.reset()
    w = sess.feed_tokens(np.arange(30) % 100, is_final=True)
    assert len(w) > 0


def test_prime_with_prompt_conditions_later_windows():
    """Reference-voice priming (start_stream_with_prompt): caches fill with
    the prompt, later windows see it; waveform caches stay empty."""
    rng0 = np.random.default_rng(5)
    conf_p, conf_cfg = tiny_conformer(rng0)
    dit_p, dit_cfg = tiny_dit(rng0)
    voc_p = tiny_hifigan(rng0)
    from omni_tpu.models.token2wav import DT, Token2Wav

    def mk():
        t2w = Token2Wav.__new__(Token2Wav)
        t2w.enc_p, t2w.enc_cfg = conf_p, conf_cfg
        t2w.dit_p, t2w.dit_cfg = dit_p, dit_cfg
        t2w.voc_p = voc_p
        t2w.extra = {
            "input_embedding": r(rng0, 50, conf_cfg.d_model),
            "encoder_proj_w": r(rng0, dit_cfg.out_channels, conf_cfg.d_model),
            "encoder_proj_b": r(rng0, dit_cfg.out_channels),
        }
        t2w.spk80 = r(rng0, dit_cfg.out_channels)
        t2w.n_timesteps = 2
        t2w.temperature = 1.0
        t2w.reset()
        return t2w

    prompt = np.arange(30, dtype=np.int32) % 40

    a = mk()
    a.prime_with_prompt(prompt)
    assert int(a.enc_state.n1) > 0  # encoder history filled
    assert len(a.speech_cache) == 0  # no audible prompt

    window = (np.arange(28) % 40).astype(np.int32)
    wav_primed = a.feed_window(window)

    b = mk()
    wav_cold = b.feed_window(window)
    assert wav_primed.shape == wav_cold.shape
    # the prompt context must actually change the generation
    assert not np.allclose(wav_primed, wav_cold, atol=1e-4)


def test_prompt_cache_gguf_roundtrip(tmp_path, rng0):
    """Packed prompt_cache.gguf (reference v2 layout) round-trip: prime by
    replay -> export -> import -> states match exactly; a fresh session
    built from the imported caches produces the primed voice."""
    from omni_tpu.core import GGUFReader
    from omni_tpu.models.token2wav import Token2Wav, prompt_cache as pc

    conf_p, conf_cfg = tiny_conformer(rng0)
    dit_p, dit_cfg = tiny_dit(rng0)
    voc_p = tiny_hifigan(rng0)
    extra = {
        "input_embedding": r(rng0, 5000, conf_cfg.d_model),
        "spk_affine_w": r(rng0, dit_cfg.out_channels, t2w.SPK_DIM),
        "spk_affine_b": r(rng0, dit_cfg.out_channels),
        "encoder_proj_w": r(rng0, dit_cfg.out_channels, conf_cfg.d_model),
        "encoder_proj_b": r(rng0, dit_cfg.out_channels),
    }
    spk = np.random.default_rng(2).standard_normal(192).astype(np.float32)
    a = t2w.Token2Wav(conf_p, conf_cfg, extra, dit_p, dit_cfg, voc_p,
                      spk=spk, n_timesteps=2)
    a.prime_with_prompt(np.arange(30, dtype=np.int32) % 40)
    path = tmp_path / "prompt_cache.gguf"
    a.export_prompt_cache(path)

    reader = GGUFReader(path)
    assert pc.has_cache_tensors(reader)
    spk_i, enc_state, cfm_state = pc.import_states(reader, conf_cfg, dit_cfg,
                                                   n_timesteps=2)
    np.testing.assert_allclose(spk_i, spk, rtol=1e-6, atol=1e-6)
    # exact state round-trip (valid regions)
    n1, n2 = int(a.enc_state.n1), int(a.enc_state.n2)
    assert int(enc_state.n1) == n1 and int(enc_state.n2) == n2
    np.testing.assert_allclose(np.asarray(enc_state.k1[:, :n1]),
                               np.asarray(a.enc_state.k1[:, :n1]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(enc_state.k2[:, :n2]),
                               np.asarray(a.enc_state.k2[:, :n2]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(enc_state.v2[:, :n2]),
                               np.asarray(a.enc_state.v2[:, :n2]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(enc_state.prelook_tail),
                               np.asarray(a.enc_state.prelook_tail),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(enc_state.up_tail),
                               np.asarray(a.enc_state.up_tail),
                               rtol=1e-6, atol=1e-6)
    nt = int(a.cfm_state.n)
    assert int(cfm_state.n) == nt
    np.testing.assert_array_equal(np.asarray(cfm_state.k[:, :, :, :nt]),
                                  np.asarray(a.cfm_state.k[:, :, :, :nt]))
    np.testing.assert_array_equal(np.asarray(cfm_state.conv1),
                                  np.asarray(a.cfm_state.conv1))

    # a session initialized from the imported caches generates the SAME
    # audio as the replay-primed one
    b = t2w.Token2Wav(conf_p, conf_cfg, extra, dit_p, dit_cfg, voc_p,
                      spk=spk_i, n_timesteps=2)
    b.enc_state, b.cfm_state = enc_state, cfm_state
    window = (np.arange(28) % 40).astype(np.int32)
    np.testing.assert_allclose(a.feed_window(window), b.feed_window(window),
                               rtol=2e-4, atol=2e-4)


def test_prompt_cache_missing_fails_loudly(tmp_path, rng0):
    """A prompt_cache.gguf with neither caches nor tokens must raise."""
    from omni_tpu.core.gguf import GGUFWriter
    from omni_tpu.models.token2wav import Token2Wav, prompt_cache as pc
    from omni_tpu.testing_gguf import write_tiny_token2wav

    paths = write_tiny_token2wav(tmp_path / "t2w")
    bad = tmp_path / "empty_prompt.gguf"
    w = GGUFWriter(bad)
    w.add_tensor("prompt_cache.spk_cb",
                 np.zeros((1, 192), np.float32))
    w.write()
    with pytest.raises(pc.PromptCacheError):
        Token2Wav.from_gguf(paths["t2w_encoder"], paths["t2w_flow"],
                            paths["t2w_extra"], paths["t2w_vocoder"],
                            str(bad), n_timesteps=2)
