"""WavTokenizer decoder + OuteTTS driver tests (reference
llm_build_wavtokenizer_dec + tools/tts/tts.cpp)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_tpu.models import wavtokenizer as wt

torch = pytest.importorskip("torch")


def test_istft_reconstructs_signal():
    """embd_to_audio inverts an STFT built with the same Hann/hop law:
    interior samples reconstruct the original signal."""
    rng = np.random.default_rng(0)
    n = wt.N_HOP * 40
    x = rng.standard_normal(n + wt.N_FFT).astype(np.float32)
    # frames at hop offsets, windowed, rfft -> (log-mag | phase) embd
    idx = np.arange(wt.N_FFT)
    hann = 0.5 - 0.5 * np.cos(2 * np.pi * idx / wt.N_FFT)
    starts = np.arange(0, n, wt.N_HOP)
    frames = np.stack([x[s:s + wt.N_FFT] * hann for s in starts])
    spec = np.fft.rfft(frames, axis=-1)
    mag = np.abs(spec)
    emb = np.concatenate([np.log(np.maximum(mag, 1e-10)),
                          np.angle(spec)], axis=-1)
    audio = wt.embd_to_audio(emb)
    # compare away from the trimmed/unnormalised edges
    n_pad = (wt.N_FFT - wt.N_HOP) // 2
    a = audio[wt.N_FFT:-wt.N_FFT]
    b = x[n_pad + wt.N_FFT:n_pad + wt.N_FFT + len(a)]
    rmse = np.sqrt(np.mean((a - b) ** 2))
    assert rmse < 1e-3, rmse


def test_conv_and_groupnorm_match_torch():
    """The decoder's conv/GroupNorm building blocks == torch ops."""
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    c_in, c_out, t, k = 8, 12, 33, 7
    x = rng.standard_normal((c_in, t)).astype(np.float32)
    w = rng.standard_normal((c_out, c_in, k)).astype(np.float32) * 0.1
    b = rng.standard_normal(c_out).astype(np.float32)
    got = np.asarray(wt._conv1d_same(jnp.asarray(x), jnp.asarray(w),
                                     jnp.asarray(b)))
    want = F.conv1d(torch.tensor(x[None]), torch.tensor(w),
                    torch.tensor(b), padding="same")[0].numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)

    wdw = rng.standard_normal((c_in, 1, k)).astype(np.float32) * 0.1
    bdw = rng.standard_normal(c_in).astype(np.float32)
    got = np.asarray(wt._dwconv1d_same(jnp.asarray(x), jnp.asarray(wdw),
                                       jnp.asarray(bdw)))
    want = F.conv1d(torch.tensor(x[None]), torch.tensor(wdw),
                    torch.tensor(bdw), padding="same",
                    groups=c_in)[0].numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)

    gw = rng.standard_normal(c_in).astype(np.float32)
    gb = rng.standard_normal(c_in).astype(np.float32)
    got = np.asarray(wt._group_norm(jnp.asarray(x), jnp.asarray(gw),
                                    jnp.asarray(gb), 4, 1e-6))
    want = F.group_norm(torch.tensor(x[None]), 4, torch.tensor(gw),
                        torch.tensor(gb), 1e-6)[0].numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def _write_tiny_wavtok(path, cfg):
    from omni_tpu.core import GGMLType
    from omni_tpu.core.gguf import GGUFWriter

    rng = np.random.default_rng(2)
    w = GGUFWriter(str(path))
    arch = "wavtokenizer-dec"
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.vocab_size", cfg.n_vocab)
    w.add_kv(f"{arch}.embedding_length", cfg.n_embd)
    w.add_kv(f"{arch}.features_length", cfg.n_embd_features)
    w.add_kv(f"{arch}.feed_forward_length", cfg.n_ff)
    w.add_kv(f"{arch}.posnet.embedding_length", cfg.n_embd_posnet)
    w.add_kv(f"{arch}.posnet.block_count", cfg.n_posnet)
    w.add_kv(f"{arch}.convnext.embedding_length", cfg.n_embd_convnext)
    w.add_kv(f"{arch}.convnext.block_count", cfg.n_convnext)
    w.add_kv(f"{arch}.attention.group_norm_groups", cfg.n_groups)
    w.add_kv(f"{arch}.attention.group_norm_epsilon", cfg.group_eps)
    w.add_kv(f"{arch}.attention.layer_norm_epsilon", cfg.ln_eps)

    def put(name, *shape, scale=0.1):
        arr = (rng.standard_normal(shape) * scale).astype(np.float32)
        w.add_tensor(name, arr, GGMLType.F32, shape)

    cp = cfg.n_embd_posnet
    put("token_embd.weight", cfg.n_vocab, cfg.n_embd_features, scale=0.3)
    put("token_embd_norm.weight", cp)
    put("token_embd_norm.bias", cp)
    put("conv1d.weight", cp, cfg.n_embd_features, 7)
    put("conv1d.bias", cp)
    put("output_norm.weight", cfg.n_embd_convnext)
    put("output_norm.bias", cfg.n_embd_convnext)
    put("output.weight", cfg.n_embd, cfg.n_embd_convnext)
    put("output.bias", cfg.n_embd)
    for i in range(cfg.n_posnet):
        p = f"posnet.{i}."
        if i == 2:
            put(p + "attn_norm.weight", cp)
            put(p + "attn_norm.bias", cp)
            for nm in ("attn_q", "attn_k", "attn_v", "attn_output"):
                put(p + nm + ".weight", cp, cp, 1)
                put(p + nm + ".bias", cp)
        elif i == 5:
            put(p + "norm.weight", cp)
            put(p + "norm.bias", cp)
        else:
            put(p + "norm1.weight", cp)
            put(p + "norm1.bias", cp)
            put(p + "conv1.weight", cp, cp, 3)
            put(p + "conv1.bias", cp)
            put(p + "norm2.weight", cp)
            put(p + "norm2.bias", cp)
            put(p + "conv2.weight", cp, cp, 3)
            put(p + "conv2.bias", cp)
    for i in range(cfg.n_convnext):
        p = f"convnext.{i}."
        put(p + "dw.weight", cfg.n_embd_convnext, 1, 7)
        put(p + "dw.bias", cfg.n_embd_convnext)
        put(p + "norm.weight", cfg.n_embd_convnext)
        put(p + "norm.bias", cfg.n_embd_convnext)
        put(p + "pw1.weight", cfg.n_ff, cfg.n_embd_convnext)
        put(p + "pw1.bias", cfg.n_ff)
        put(p + "pw2.weight", cfg.n_embd_convnext, cfg.n_ff)
        put(p + "pw2.bias", cfg.n_embd_convnext)
        put(p + "gamma.weight", cfg.n_embd_convnext)
    w.write()


def test_decoder_gguf_roundtrip(tmp_path):
    """Tiny wavtokenizer-dec GGUF loads and decodes codes to audio of the
    reference's exact length law: (T-1)*hop + n_fft - 2*pad samples."""
    from omni_tpu.core.gguf import GGUFReader

    cfg = wt.WavTokConfig(
        n_embd=2 * (wt.N_FFT // 2 + 1), n_embd_features=16,
        n_embd_posnet=16, n_embd_convnext=16, n_ff=32, n_posnet=6,
        n_convnext=2, n_groups=4, n_vocab=64)
    path = tmp_path / "wavtok.gguf"
    _write_tiny_wavtok(path, cfg)
    reader = GGUFReader(str(path))
    cfg2 = wt.WavTokConfig.from_gguf(reader.kv)
    assert (cfg2.n_embd, cfg2.n_embd_posnet, cfg2.n_convnext,
            cfg2.n_groups) == (cfg.n_embd, cfg.n_embd_posnet,
                               cfg.n_convnext, cfg.n_groups)
    assert cfg2.group_eps == pytest.approx(cfg.group_eps)
    params = wt.load_params(reader, cfg2)
    assert len(params["posnet"]) == 6 and "attn_q" in params["posnet"][2]

    codes = np.arange(12) % cfg.n_vocab
    audio = wt.decode_audio(params, cfg2, codes)
    n_pad = (wt.N_FFT - wt.N_HOP) // 2
    assert audio.shape == ((len(codes) - 1) * wt.N_HOP + wt.N_FFT
                           - 2 * n_pad,)
    assert np.isfinite(audio).all()
    # deterministic
    audio2 = wt.decode_audio(params, cfg2, codes)
    np.testing.assert_array_equal(audio, audio2)


def test_outetts_code_extraction():
    """generate_codes strips non-audio tokens and the 151672 offset
    (tts.cpp:1003-1013), stops on <|audio_end|>."""
    from omni_tpu.cli.tts import CODE_BASE, build_prompt, generate_codes

    class FakeTok:
        class vocab:
            token_to_id = {"<|audio_end|>": 99}

            @staticmethod
            def is_eog(t):
                return False

        @staticmethod
        def encode(text, add_special=True):
            return [1, 2, 3]

    seq = [CODE_BASE + 5, 42, CODE_BASE + 7, CODE_BASE + 4100, 99]

    class FakeCtx:
        def __init__(self):
            self.i = 0

        def decode(self, batch, **kw):
            tok = seq[self.i]
            self.i = min(self.i + 1, len(seq) - 1)
            logits = np.full((1, 160000), -1e9, np.float32)
            logits[0, tok] = 0.0
            return logits, None

    out = generate_codes(FakeCtx(), FakeTok(), build_prompt("Hello, world"),
                         n_predict=10, log=lambda *_: None)
    assert out == [5, 7, 4100]


def test_prompt_protocol():
    from omni_tpu.cli.tts import build_prompt

    p = build_prompt("Hello, World. test-case")
    assert p.startswith("<|im_start|>\n<|text_start|>")
    assert "hello<|text_sep|>world<|text_sep|>test<|text_sep|>case" in p
    assert p.endswith("<|text_end|>\n<|audio_start|>\n")
