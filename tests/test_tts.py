"""TTS decoder tests: conditioning math, sampling semantics, and an
end-to-end audio-token generation loop on tiny random weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_tpu.models import qwen3, tts
from omni_tpu.runtime import Batch, Context


def tiny_extras(rng, d_llm=64, d_tts=32, n_codes=50, n_text=100):
    def r(*s, sc=0.2):
        return jnp.asarray(rng.standard_normal(s).astype(np.float32) * sc)

    return {
        "emb_text": r(n_text, d_tts),
        "emb_code": r(n_codes, d_tts),
        "head_code": r(n_codes, d_tts),
        "proj_sem_w1": r(d_tts, d_llm), "proj_sem_b1": r(d_tts),
        "proj_sem_w2": r(d_tts, d_tts), "proj_sem_b2": r(d_tts),
    }


def test_condition_shape_and_semantics(rng):
    ex = tiny_extras(rng)
    toks = jnp.array([3, 7, 11])
    hid = jnp.asarray(rng.standard_normal((3, 64)).astype(np.float32))
    # monkey-view: text_eos id must be inside tiny emb_text table
    import omni_tpu.models.tts as tts_mod

    old = tts_mod.TEXT_EOS_ID
    tts_mod.TEXT_EOS_ID = 5
    try:
        cond = tts.build_condition(ex, toks, hid, end_of_turn=True)
        assert cond.shape == (5, 32)  # 3 tokens + text_eos + audio_bos
        manual = np.asarray(ex["emb_text"])[np.asarray(toks)] + np.asarray(
            tts.projector_semantic(ex, hid))
        np.testing.assert_allclose(np.asarray(cond[:3]), manual, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(cond[3]), np.asarray(ex["emb_text"][5]),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(cond[4]), np.asarray(ex["emb_code"][0]),
                                   rtol=1e-6, atol=1e-6)
    finally:
        tts_mod.TEXT_EOS_ID = old


def test_speaker_embed_and_chunk0_prepend(rng):
    """Voice-clone conditioning (omni.cpp:5041, 2504-2518, 6176): chunk-0
    condition = [spk_embed, cond..., text_eos?, audio_bos]; spk_embed =
    projector_spk(mean ref hidden) for a cloned voice, emb_text[21143]
    default."""
    d_llm, d_tts = 64, 32
    ex = tiny_extras(rng)
    ex.update({
        "proj_spk_w1": jnp.asarray(rng.standard_normal((d_tts, d_llm)).astype(np.float32) * 0.2),
        "proj_spk_b1": jnp.asarray(rng.standard_normal(d_tts).astype(np.float32) * 0.2),
        "proj_spk_w2": jnp.asarray(rng.standard_normal((d_tts, d_tts)).astype(np.float32) * 0.2),
        "proj_spk_b2": jnp.asarray(rng.standard_normal(d_tts).astype(np.float32) * 0.2),
    })
    ref_hidden = rng.standard_normal((7, d_llm)).astype(np.float32)
    spk = tts.speaker_embed(ex, ref_hidden)
    assert spk.shape == (d_tts,)
    # manual: ReLU MLP over the mean-pooled hidden
    pooled = ref_hidden.mean(axis=0)
    h = np.maximum(pooled @ np.asarray(ex["proj_spk_w1"]).T
                   + np.asarray(ex["proj_spk_b1"]), 0)
    manual = h @ np.asarray(ex["proj_spk_w2"]).T + np.asarray(ex["proj_spk_b2"])
    np.testing.assert_allclose(np.asarray(spk), manual, rtol=1e-4, atol=1e-4)

    # default voice falls back to emb_text[spk_emb id]
    import omni_tpu.models.tts as tts_mod

    old = tts_mod.SPK_EMB_ID
    tts_mod.SPK_EMB_ID = 9
    try:
        np.testing.assert_array_equal(
            np.asarray(tts.speaker_embed(ex)), np.asarray(ex["emb_text"][9]))
        # no projector weights -> fallback even with ref hidden
        ex2 = {k: v for k, v in ex.items() if not k.startswith("proj_spk")}
        np.testing.assert_array_equal(
            np.asarray(tts.speaker_embed(ex2, ref_hidden)),
            np.asarray(ex["emb_text"][9]))
    finally:
        tts_mod.SPK_EMB_ID = old

    # chunk-0 KV layout: spk + 3 cond + audio_bos
    toks = jnp.array([3, 7, 11])
    hid = jnp.asarray(rng.standard_normal((3, d_llm)).astype(np.float32))
    cond = tts.build_condition(ex, toks, hid, spk_embed=spk)
    assert cond.shape == (5, d_tts)
    np.testing.assert_allclose(np.asarray(cond[0]), np.asarray(spk),
                               rtol=1e-6, atol=1e-6)
    # without spk (chunk > 0): no prepend
    assert tts.build_condition(ex, toks, hid).shape == (4, d_tts)


def test_repetition_penalty_matches_reference_semantics(rng):
    logits = jnp.asarray([1.0, -1.0, 2.0, 0.5])
    prev = jnp.asarray([0, 0, 1, -1], jnp.int32)  # token0 x2, token1 x1
    out = np.asarray(tts.apply_repetition_penalty(logits, prev, 1.5, 16))
    assert out[0] == pytest.approx(1.0 / 1.5 ** 2)
    assert out[1] == pytest.approx(-1.0 * 1.5)
    assert out[2] == pytest.approx(2.0)  # untouched
    assert out[3] == pytest.approx(0.5)


def test_force_no_eos_blocks_eos(rng):
    key = jax.random.PRNGKey(0)
    # logits hugely favoring EOS
    logits = jnp.full((tts.NUM_AUDIO_TOKENS,), -10.0).at[tts.AUDIO_EOS_REL].set(50.0)
    prev = jnp.full((16,), -1, jnp.int32)
    for i in range(5):
        tok = tts.sample_audio_token(logits, jax.random.fold_in(key, i), prev,
                                     force_no_eos=True)
        assert int(tok) != tts.AUDIO_EOS_REL
    tok = tts.sample_audio_token(logits, key, prev, force_no_eos=False)
    assert int(tok) == tts.AUDIO_EOS_REL


def test_nucleus_respects_top_k(rng):
    key = jax.random.PRNGKey(1)
    logits = jnp.asarray(np.linspace(5.0, -5.0, 100).astype(np.float32))
    draws = {int(tts.nucleus_sample(logits, jax.random.fold_in(key, i),
                                    top_p=0.99, top_k=3, min_keep=1))
             for i in range(50)}
    assert draws <= {0, 1, 2}


def test_ras_fallback_on_repetition(rng):
    key = jax.random.PRNGKey(2)
    logits = jnp.full((50,), -10.0).at[7].set(20.0)
    rep_prev = jnp.full((16,), 7, jnp.int32)  # token 7 everywhere
    fresh_prev = jnp.full((16,), -1, jnp.int32)
    # without repetition: candidate 7 sticks
    assert int(tts.ras_sample(logits, key, fresh_prev)) == 7
    # with repetition: falls back to multinomial over ALL tokens — with such
    # peaked logits it still usually draws 7, so instead check determinism
    # changed: run many keys, expect at least the code path to not error
    outs = {int(tts.ras_sample(logits, jax.random.fold_in(key, i), rep_prev))
            for i in range(10)}
    assert all(0 <= o < 50 for o in outs)


def test_audio_generation_loop(rng, tmp_path):
    """Full micro TTS round: condition prefill -> autoregressive audio codes
    through the shared decoder runtime."""
    from omni_tpu.core import GGMLType, GGUFReader
    from omni_tpu.testing import write_tiny_qwen3

    path = tmp_path / "tts.gguf"
    write_tiny_qwen3(path, n_layers=2, d_model=32, n_heads=2, n_kv_heads=2,
                     head_dim=16, d_ff=64, n_vocab=64, qk_norm=False,
                     qtype=GGMLType.F32)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader)
    ex = tiny_extras(rng, d_llm=64, d_tts=32, n_codes=50)

    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=64)
    cond = tts.build_condition(
        ex, jnp.array([1, 2, 3]),
        jnp.asarray(rng.standard_normal((3, 64)).astype(np.float32)))
    _, hidden = ctx.decode(Batch(embeds=np.asarray(cond)), return_hidden=True)

    key = jax.random.PRNGKey(0)
    prev = jnp.full((16,), -1, jnp.int32)
    codes = []
    for i in range(8):
        logits = tts.audio_logits(ex, jnp.asarray(hidden[-1]))
        key, sub = jax.random.split(key)
        rel = tts.sample_audio_token(logits, sub, prev,
                                     skip_processors=(i == 0))
        codes.append(int(rel))
        prev = jnp.concatenate([prev[1:], rel[None]])
        emb = tts.code_embedding(ex, rel)
        _, hidden = ctx.decode(Batch(embeds=np.asarray(emb)[None]),
                               return_hidden=True)
    assert len(codes) == 8
    assert all(0 <= c < 50 for c in codes)


def test_tts_decode_scan_on_device():
    """Fused audio-code generation: one lax.scan, early-eos frozen carry."""
    import jax
    import jax.numpy as jnp

    from omni_tpu.core import GGMLType, GGUFReader
    from omni_tpu.models import qwen3
    from omni_tpu.models.tts import (TTSSamplingParams, build_condition,
                                     tts_decode_scan)
    from omni_tpu.runtime.kv_cache import KVCache
    from omni_tpu.testing import write_tiny_qwen3
    import tempfile, pathlib

    d = pathlib.Path(tempfile.mkdtemp())
    write_tiny_qwen3(d / "tts.gguf", n_layers=2, d_model=32, n_heads=2,
                     n_kv_heads=2, head_dim=16, d_ff=64, n_vocab=64,
                     qk_norm=False, qtype=GGMLType.F32)
    reader = GGUFReader(d / "tts.gguf")
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader)

    rng = np.random.default_rng(0)
    n_codes = 50
    extras = {
        "emb_text": jnp.asarray(rng.standard_normal((200, 32)) * 0.1, jnp.float32),
        "emb_code": jnp.asarray(rng.standard_normal((n_codes, 32)) * 0.1, jnp.float32),
        "head_code": jnp.asarray(rng.standard_normal((n_codes, 32)) * 0.1, jnp.float32),
        "proj_sem_w1": jnp.asarray(rng.standard_normal((32, 48)) * 0.1, jnp.float32),
        "proj_sem_b1": jnp.zeros(32, jnp.float32),
        "proj_sem_w2": jnp.asarray(rng.standard_normal((32, 32)) * 0.1, jnp.float32),
        "proj_sem_b2": jnp.zeros(32, jnp.float32),
    }

    cache = KVCache.create(cfg.n_layers, 128, cfg.n_kv_heads, cfg.head_dim,
                           rope_base=cfg.rope_base, rope_neox=cfg.rope_neox)
    # prefill a fake condition of 5 frames
    cond = np.asarray(rng.standard_normal((5, 32)) * 0.1, np.float32)
    slots = cache.find_slots(5)
    import jax.numpy as jnp2

    logits, hidden, cache = qwen3.forward(
        params, cfg, jnp.asarray(cond), jnp.arange(5, dtype=jnp.int32),
        jnp.zeros(5, jnp.int32), cache, slots)

    sp = TTSSamplingParams(win_size=8)
    codes, n_valid, cache, _, h_last, prev, pos_out, done = tts_decode_scan(
        params, cfg, extras, cache, hidden[-1], jnp.int32(5),
        jax.random.PRNGKey(0), n_steps=20, sp=sp)
    codes = np.asarray(codes)
    n_valid = int(n_valid)
    assert codes.shape == (20,)
    # valid prefix then -1 padding after eos (if any)
    if n_valid < 20:
        assert (codes[n_valid:] == -1).all()
    assert ((codes[:n_valid] >= 0) & (codes[:n_valid] < n_codes)).all()
    # continuation carry-outs: last hidden + repetition ring
    assert h_last.shape == (32,)
    assert prev.shape == (sp.win_size,)
    if n_valid == 20:
        # ring tail holds the trailing codes
        np.testing.assert_array_equal(np.asarray(prev)[-3:], codes[-3:])
        # continuation scan keeps generating from the carry
        codes2, n_valid2, cache, _, _, _, _, _ = tts_decode_scan(
            params, cfg, extras, cache, h_last, pos_out,
            jax.random.PRNGKey(1), n_steps=20, sp=sp, prev0=prev,
            done_in=done)
        assert int(n_valid2) >= 0
    else:
        # done chain: a successor scan after eos emits nothing
        codes3, n_valid3, cache, _, _, _, _, _ = tts_decode_scan(
            params, cfg, extras, cache, h_last, pos_out,
            jax.random.PRNGKey(2), n_steps=20, sp=sp, prev0=prev,
            done_in=done)
        assert int(n_valid3) == 0
