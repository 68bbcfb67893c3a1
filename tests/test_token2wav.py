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

def r(rng, *shape, s=0.1):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * s)


@pytest.fixture(scope="module")
def rng0():
    return np.random.default_rng(0)


def tiny_dit(rng, mel=16, hidden=32, depth=2, heads=2):
    cfg = ditm.DiTConfig(in_channels=mel * 4, out_channels=mel, depth=depth,
                         num_heads=heads, head_dim=hidden // heads,
                         hidden=hidden, freq_embed=16, max_t_cache=64,
                         conv_kernel=3)
    p = {
        "in_proj_w": r(rng, hidden, mel * 4), "in_proj_b": r(rng, hidden),
        "t_mlp1_w": r(rng, hidden, 16), "t_mlp1_b": r(rng, hidden),
        "t_mlp2_w": r(rng, hidden, hidden), "t_mlp2_b": r(rng, hidden),
        "final_ada_w": r(rng, 2 * hidden, hidden), "final_ada_b": r(rng, 2 * hidden),
        "final_w": r(rng, mel, hidden), "final_b": r(rng, mel),
        "blocks": [],
    }
    for _ in range(depth):
        p["blocks"].append({
            "ada_w": r(rng, 9 * hidden, hidden), "ada_b": r(rng, 9 * hidden),
            "q_w": r(rng, hidden, hidden), "q_b": r(rng, hidden),
            "k_w": r(rng, hidden, hidden), "k_b": r(rng, hidden),
            "v_w": r(rng, hidden, hidden), "v_b": r(rng, hidden),
            "qn_w": jnp.ones(hidden // heads), "qn_b": jnp.zeros(hidden // heads),
            "kn_w": jnp.ones(hidden // heads), "kn_b": jnp.zeros(hidden // heads),
            "proj_w": r(rng, hidden, hidden), "proj_b": r(rng, hidden),
            "conv1_w": r(rng, hidden, hidden, 3), "conv1_b": r(rng, hidden),
            "conv_ln_w": jnp.ones(hidden), "conv_ln_b": jnp.zeros(hidden),
            "conv2_w": r(rng, hidden, hidden, 3), "conv2_b": r(rng, hidden),
            "fc1_w": r(rng, 2 * hidden, hidden), "fc1_b": r(rng, 2 * hidden),
            "fc2_w": r(rng, hidden, 2 * hidden), "fc2_b": r(rng, hidden),
        })
    return p, cfg


def tiny_conformer(rng, d=32, heads=4, ff=64):
    cfg = conf.ConformerConfig(d_model=d, n_heads=heads, d_ff=ff,
                               n_blocks=2, n_up_blocks=1, max_tokens=128)
    p = {
        "embed_w": r(rng, d, d), "embed_b": r(rng, d),
        "embed_ln_w": jnp.ones(d), "embed_ln_b": jnp.zeros(d),
        "prelook1_w": r(rng, d, d, 4), "prelook1_b": r(rng, d),
        "prelook2_w": r(rng, d, d, 3), "prelook2_b": r(rng, d),
        "up_conv_w": r(rng, d, d, 5), "up_conv_b": r(rng, d),
        "up_embed_w": r(rng, d, d), "up_embed_b": r(rng, d),
        "up_embed_ln_w": jnp.ones(d), "up_embed_ln_b": jnp.zeros(d),
        "after_norm_w": jnp.ones(d), "after_norm_b": jnp.zeros(d),
        "encoders": [], "up_encoders": [],
    }

    def layer():
        return {
            "norm_ff_w": jnp.ones(d), "norm_ff_b": jnp.zeros(d),
            "norm_mha_w": jnp.ones(d), "norm_mha_b": jnp.zeros(d),
            "q_w": r(rng, d, d), "q_b": r(rng, d),
            "k_w": r(rng, d, d), "k_b": r(rng, d),
            "v_w": r(rng, d, d), "v_b": r(rng, d),
            "o_w": r(rng, d, d), "o_b": r(rng, d),
            "pos_w": r(rng, d, d),
            "pos_bias_u": r(rng, heads, d // heads),
            "pos_bias_v": r(rng, heads, d // heads),
            "ff1_w": r(rng, ff, d), "ff1_b": r(rng, ff),
            "ff2_w": r(rng, d, ff), "ff2_b": r(rng, d),
        }

    p["encoders"] = [layer() for _ in range(cfg.n_blocks)]
    p["up_encoders"] = [layer() for _ in range(cfg.n_up_blocks)]
    return p, cfg


def tiny_hifigan(rng, mel=16):
    ch = [16, 8, 4, 2]  # conv_pre out, then after each upsample
    p = {
        "conv_pre_w": r(rng, ch[0], mel, 7), "conv_pre_b": r(rng, ch[0]),
        "conv_post_w": r(rng, 18, ch[3], 7), "conv_post_b": r(rng, 18),
        "f0_lin_w": r(rng, 1, 8), "f0_lin_b": r(rng, 1),
        "nsf_lin_w": r(rng, 1, hg.HARMONICS), "nsf_lin_b": r(rng, 1),
    }
    c = mel
    for i in range(5):
        p[f"f0_conv{i}_w"] = r(rng, 8, c, 3)
        p[f"f0_conv{i}_b"] = r(rng, 8)
        c = 8
    strides = [8, 5, 3]
    up_k = [16, 11, 7]  # HiFT upsample kernels
    for s in range(3):
        p[f"up{s}_w"] = r(rng, ch[s], ch[s + 1], up_k[s])  # [Cin, Cout, K]
        p[f"up{s}_b"] = r(rng, ch[s + 1])
        p[f"sd{s}_w"] = r(rng, ch[s + 1], 18, (29, 5, 1)[s])  # k = 2u-1
        p[f"sd{s}_b"] = r(rng, ch[s + 1])
        _mk_resblock(p, rng, f"s{s}", ch[s + 1], n=1)
    for i in range(9):
        _mk_resblock(p, rng, f"{i}", ch[i // 3 + 1], n=2)
    return p


def _mk_resblock(p, rng, key, c, n):
    p[f"rb{key}_c1"] = [(r(rng, c, c, 3), r(rng, c), (1, 3, 5)[i]) for i in range(n)]
    p[f"rb{key}_c2"] = [(r(rng, c, c, 3), r(rng, c), 1) for i in range(n)]
    p[f"rb{key}_a1"] = [jnp.ones(c) for _ in range(n)]
    p[f"rb{key}_a2"] = [jnp.ones(c) for _ in range(n)]


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
