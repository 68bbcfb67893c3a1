"""End-to-end omni pipeline test: tiny LLM + TTS + Token2Wav wired through
the real orchestrator (queues, workers, special-token protocol, sliding
window). Random weights — this validates plumbing and protocol, not audio
quality (that's the per-model tests' job)."""

import queue
import time

import numpy as np
import pytest

import jax.numpy as jnp

from omni_tpu.core import GGMLType, GGUFReader
from omni_tpu.models import qwen3
import omni_tpu.models.token2wav as t2w_mod
from omni_tpu.omni.pipeline import OmniPipeline, SessionConfig
from omni_tpu.runtime import Context, SamplerParams
from omni_tpu.testing import write_tiny_qwen3
from omni_tpu.testing_t2w import r, tiny_conformer, tiny_dit, tiny_hifigan


class ToyTokenizer:
    """Char-level tokenizer with the omni special tokens; enough for the
    protocol (real runs use the GGUF BPE tokenizer)."""

    SPECIALS = ["<|speak|>", "<|listen|>", "<|chunk_eos|>", "<|turn_eos|>",
                "<|tts_eos|>", "</s>", "<|tts_bos|>", "</unit>", "<unit>",
                "<|im_end|>", "<|im_start|>", "<|audio_start|>",
                "<|audio_end|>", "<think>", "</think>",
                "<image>", "</image>", "<slice>", "</slice>"]

    def __init__(self, n_base=180):
        self.n_base = n_base
        names = {s: n_base + i for i, s in enumerate(self.SPECIALS)}

        class V:
            token_to_id = names

            @staticmethod
            def is_eog(tid):
                return tid == names["</s>"]

        self.vocab = V()
        self._id2special = {v: k for k, v in names.items()}

    def encode(self, text, add_special=False, parse_special=True):
        ids = []
        rest = text
        while rest:
            matched = False
            for s, tid in self.vocab.token_to_id.items():
                if rest.startswith(s):
                    ids.append(tid)
                    rest = rest[len(s):]
                    matched = True
                    break
            if not matched:
                ids.append(ord(rest[0]) % self.n_base)
                rest = rest[1:]
        return ids

    def decode(self, ids):
        out = []
        for i in ids:
            i = int(i)
            if i in self._id2special:
                out.append(self._id2special[i])
            else:
                out.append(chr(97 + i % 26))
        return "".join(out)


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    rng = np.random.default_rng(3)
    d_llm = 64

    # LLM: vocab 256 > special ids (180..)
    path = tmp_path_factory.mktemp("p") / "llm.gguf"
    write_tiny_qwen3(path, n_layers=2, d_model=d_llm, n_heads=4, n_kv_heads=2,
                     head_dim=16, d_ff=64, n_vocab=256, qtype=GGMLType.F32)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    llm = Context(cfg, qwen3.load_params(reader), qwen3.forward, qwen3.embed,
                  n_ctx=512, sampler=SamplerParams(temp=1.0, top_k=50, seed=1))

    # TTS: separate tiny llama + extras (50 audio codes)
    tpath = tmp_path_factory.mktemp("p") / "tts.gguf"
    write_tiny_qwen3(tpath, n_layers=2, d_model=32, n_heads=2, n_kv_heads=2,
                     head_dim=16, d_ff=64, n_vocab=64, qk_norm=False,
                     qtype=GGMLType.F32)
    treader = GGUFReader(tpath)
    tcfg = qwen3.Qwen3Config.from_gguf(treader.kv)
    tts_ctx = Context(tcfg, qwen3.load_params(treader), qwen3.forward,
                      qwen3.embed, n_ctx=512)
    import omni_tpu.models.tts as tts_mod

    tts_mod_text_eos_orig = tts_mod.TEXT_EOS_ID
    tts_mod.TEXT_EOS_ID = 5
    n_codes = 50
    tts_mod_audio_eos_orig = tts_mod.AUDIO_EOS_REL
    tts_mod.AUDIO_EOS_REL = n_codes - 1
    extras = {
        "emb_text": r(rng, 256, 32), "emb_code": r(rng, n_codes, 32),
        "head_code": r(rng, n_codes, 32),
        "proj_sem_w1": r(rng, 32, d_llm), "proj_sem_b1": r(rng, 32),
        "proj_sem_w2": r(rng, 32, 32), "proj_sem_b2": r(rng, 32),
    }

    # Token2Wav tiny session
    dit_p, dit_cfg = tiny_dit(rng)
    conf_p, conf_cfg = tiny_conformer(rng, d=32)
    voc_p = tiny_hifigan(rng)
    extra_t2w = {
        "input_embedding": r(rng, 5000, conf_cfg.d_model),
        "spk_affine_w": r(rng, dit_cfg.out_channels, 192),
        "spk_affine_b": r(rng, dit_cfg.out_channels),
        "encoder_proj_w": r(rng, dit_cfg.out_channels, conf_cfg.d_model),
        "encoder_proj_b": r(rng, dit_cfg.out_channels),
    }
    t2w = t2w_mod.Token2Wav(conf_p, conf_cfg, extra_t2w, dit_p, dit_cfg,
                            voc_p, spk=rng.standard_normal(192), n_timesteps=2)

    pipe = OmniPipeline(
        llm=llm,
        tokenizer=ToyTokenizer(),
        tts_ctx=tts_ctx,
        tts_extras=extras,
        token2wav=t2w,
        audio_encoder=lambda wav: rng.standard_normal((10, d_llm)).astype(np.float32) * 0.1,
        config=SessionConfig(duplex=False, max_new_tokens=40),
    )
    yield pipe
    pipe.shutdown()
    tts_mod.TEXT_EOS_ID = tts_mod_text_eos_orig
    tts_mod.AUDIO_EOS_REL = tts_mod_audio_eos_orig


def test_full_simplex_round(pipeline):
    pipe = pipeline
    # session init: system prompt + reference voice
    pipe.stream_prefill(index=0, system_prompt="You are a voice assistant.",
                        ref_audio=np.zeros(16000, np.float32))
    assert pipe.n_keep > 0

    # one 1-second audio chunk
    pipe.stream_prefill(audio=np.zeros(16000, np.float32), index=1)

    # decode one turn
    pipe.stream_decode(round_idx=0, max_new_tokens=25)

    texts, got_stop = [], False
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            ev = pipe.text_out.get(timeout=1.0)
        except queue.Empty:
            continue
        if ev.get("stop"):
            got_stop = True
            break
        texts.append(ev["content"])
    assert got_stop
    # audio should flow end-to-end within the window cadence
    deadline = time.time() + 120
    waves = []
    while time.time() < deadline and not waves:
        try:
            waves.append(pipe.wav_out.get(timeout=2.0))
        except queue.Empty:
            pass
    assert waves, "no audio produced by the T2W worker"
    assert waves[0].ndim == 1 and len(waves[0]) > 0


def test_round_boundaries_and_window(pipeline):
    pipe = pipeline
    assert len(pipe.rounds) >= 1
    r0 = pipe.rounds[0]
    assert r0.start_pos >= pipe.n_keep
    assert r0.end_pos > r0.start_pos


def test_stop_speak_drains(pipeline):
    pipe = pipeline
    pipe.text_out.put({"content": "x", "stop": False})
    pipe.stop_speak()
    assert pipe.text_out.empty()
    assert pipe.break_event.is_set()


def test_unit_granular_sliding_window(pipeline):
    """Duplex unit window (#39, omni.cpp:3107-3405): drop whole closed units
    past high-water down to low-water, protect n_keep, re-base positions."""
    from omni_tpu.omni.pipeline import UnitEntry

    pipe = pipeline
    pipe.clean_kvcache()  # module-scoped fixture: reset session state
    pipe.cfg.duplex = True
    pipe.cfg.high_water = 60
    pipe.cfg.low_water = 40

    # fake a session: system prompt of 10, then 8 closed units of 10 each
    import numpy as np
    toks = np.arange(10, dtype=np.int32) % pipe.llm.cfg.n_vocab
    from omni_tpu.runtime import Batch
    pipe.llm.decode(Batch(tokens=toks))
    pipe.n_keep = pipe.llm.n_past[0]
    for _ in range(8):
        pipe._register_unit_start()
        pipe.llm.decode(Batch(tokens=toks))
        pipe._register_unit_end()
    assert pipe.llm.n_past[0] == 90

    pipe._enforce_unit_window()
    n_past = pipe.llm.n_past[0]
    assert n_past <= 40
    # system prompt intact: positions 0..9 still owned by seq 0
    import numpy as _np
    pos = _np.asarray(pipe.llm.cache.pos)
    mask = _np.asarray(pipe.llm.cache.seq_mask) != 0
    kept = set(pos[mask].tolist())
    assert set(range(10)) <= kept
    # positions re-based: contiguous 0..n_past-1
    assert kept == set(range(n_past))
    # remaining unit bookkeeping consistent
    for u in pipe.units:
        assert u.start_pos >= pipe.n_keep
        assert u.closed and u.end_pos <= n_past


def test_wav_file_delivery(pipeline, tmp_path):
    """Out-of-band audio contract (§A.5): wav files under
    round_XXX/tts_wav/ plus generation_done.flag."""
    import os

    pipe = pipeline
    pipe.clean_kvcache()
    pipe.cfg.duplex = False
    pipe.cfg.use_tts = True
    pipe.cfg.output_dir = str(tmp_path / "out")
    pipe.current_round = 2
    pipe._wav_index = 0
    from omni_tpu.omni.pipeline import SILENCE_TOKEN

    pipe._t2w_buffer[:] = [SILENCE_TOKEN] * 3  # reset window state
    pipe._start_workers()  # running regardless of test order

    # drive the t2w writer directly with enough codes for one window
    for code in range(30):
        pipe.t2w_queue.put(code % 40)
    pipe.t2w_queue.put(None)  # end of turn
    import time

    # generous: two fresh feed_window compiles on the 1-core CI host
    deadline = time.time() + 240
    flag = tmp_path / "out" / "round_002" / "generation_done.flag"
    while time.time() < deadline and not flag.exists():
        time.sleep(0.2)
    assert flag.exists()
    wavs = sorted((tmp_path / "out" / "round_002" / "tts_wav").glob("wav_*.wav"))
    assert len(wavs) >= 1
    from omni_tpu.omni.audio import load_wav_mono_16k

    # wav files decode (24k -> resampled 16k mono)
    x = load_wav_mono_16k(str(wavs[0]))
    assert len(x) > 1000


def test_duplex_cap_force_replaces_sampled_token(pipeline):
    """Chunk-cap semantics (omni.cpp:9317-9344): the sampled token that
    breaches the 26-token cap is force-REPLACED by <|chunk_eos|></unit> —
    it must never enter the KV; the next sample comes from the
    post-</unit> logits."""
    from omni_tpu.omni.pipeline import DUPLEX_CHUNK_CAP

    pipe = pipeline
    pipe.clean_kvcache()
    pipe.cfg.duplex = True
    pipe.cfg.use_tts = False
    pipe.cfg.high_water = 10_000  # no window interference
    pipe.cfg.fused_decode = False  # host loop: monkeypatched sampling below
    pipe.prefill_done.set()

    base_tok = 42  # plain text token, never special
    orig_sample = pipe.llm.sample_token
    fed: list[int] = []
    orig_decode = pipe.llm.decode

    def spy_decode(batch, **kw):
        if batch.tokens is not None:
            fed.extend(int(t) for t in np.asarray(batch.tokens))
        return orig_decode(batch, **kw)

    pipe.llm.sample_token = lambda lg: base_tok
    pipe.llm.decode = spy_decode
    try:
        limit = DUPLEX_CHUNK_CAP + 4
        pipe.stream_decode(round_idx=0, max_new_tokens=limit)
    finally:
        pipe.llm.sample_token = orig_sample
        pipe.llm.decode = orig_decode
        pipe.cfg.duplex = False
        pipe.cfg.use_tts = True
        pipe.cfg.high_water = 4000
        pipe.cfg.fused_decode = True
    while not pipe.text_out.empty():
        pipe.text_out.get_nowait()

    eos_id = pipe.special["<|chunk_eos|>"]
    unit_end_id = pipe.special["</unit>"]
    assert eos_id in fed and unit_end_id in fed
    i_eos = fed.index(eos_id)
    # exactly cap-1 sampled tokens fed before the forced chunk_eos (the
    # cap-th sampled token was discarded, not fed)
    assert fed[:i_eos].count(base_tok) == DUPLEX_CHUNK_CAP - 1
    assert fed[i_eos + 1] == unit_end_id
    # total sampled-token feeds: limit samples, one discarded at the cap,
    # and the final sample is never fed (loop exits) => limit - 2
    assert fed.count(base_tok) == limit - 2


def test_prefill_done_counts_outstanding_chunks(pipeline):
    """prefill_done must only signal when EVERY enqueued chunk is fully in
    the KV (cv-guarded prefill_done of the reference, omni.cpp:8649-8658)."""
    pipe = pipeline
    pipe.clean_kvcache()
    pipe.cfg.duplex = False
    pipe.stream_prefill(index=0, system_prompt="sys",
                        ref_audio=np.zeros(1600, np.float32))
    n0 = pipe.llm.n_past[0]
    for i in range(1, 4):  # three 10-token audio chunks, enqueued rapidly
        pipe.stream_prefill(audio=np.zeros(1600, np.float32), index=i)
    assert pipe.prefill_done.wait(timeout=120)
    assert pipe._prefill_pending == 0
    # each chunk = <|audio_start|>(1) + 10 embeds + <|audio_end|>(1)
    assert pipe.llm.n_past[0] == n0 + 3 * 12


def _spy_feeds(pipe):
    """Record the exact (token-or-embed) sequence entering the LLM KV."""
    feeds = []
    orig_decode = pipe.llm.decode

    def spy(batch, **kw):
        if batch.tokens is not None:
            feeds.extend(("tok", int(t)) for t in np.asarray(batch.tokens))
        else:
            feeds.append(("emb", len(batch.embeds)))
        return orig_decode(batch, **kw)

    pipe.llm.decode = spy
    return feeds, orig_decode


def test_vision_slice_marker_protocol(pipeline):
    """Exact slice schema (omni.cpp:4317-4345):
    simplex: <image>(ov)</image><slice>(s1)</slice><slice>(s2)</slice>\\n
             + <|audio_start|>audio<|audio_end|>
    duplex : <unit><image>... + raw audio embeds (no audio markers)."""
    pipe = pipeline
    d = pipe.llm.cfg.d_model
    rng = np.random.default_rng(0)
    # fake 2-slice encoder: overview + 2 slices, 4 tokens each
    pipe.vision_encoder = lambda img, max_slice_nums=None: [
        rng.standard_normal((4, d)).astype(np.float32) * 0.1 for _ in range(3)]
    sp = pipe.special
    nl = pipe.tok.encode("\n")[0]

    for duplex in (False, True):
        pipe.clean_kvcache()
        pipe.cfg.duplex = duplex
        pipe.cfg.use_tts = False
        feeds, orig = _spy_feeds(pipe)
        try:
            pipe.stream_prefill(index=0, system_prompt="s")
            feeds.clear()
            pipe.stream_prefill(audio=np.zeros(1600, np.float32),
                                image=np.zeros((8, 8, 3), np.uint8), index=1)
            assert pipe.prefill_done.wait(timeout=60)
        finally:
            pipe.llm.decode = orig
            pipe.vision_encoder = None if duplex else pipe.vision_encoder
        img_part = [("tok", sp["<image>"]), ("emb", 4), ("tok", sp["</image>"]),
                    ("tok", sp["<slice>"]), ("emb", 4), ("tok", sp["</slice>"]),
                    ("tok", sp["<slice>"]), ("emb", 4), ("tok", sp["</slice>"]),
                    ("tok", nl)]
        if duplex:
            want = [("tok", sp["<unit>"])] + img_part + [("emb", 10)]
        else:
            want = img_part + [("tok", sp["<|audio_start|>"]), ("emb", 10),
                               ("tok", sp["<|audio_end|>"])]
        assert feeds == want, f"duplex={duplex}: {feeds} != {want}"
    pipe.cfg.duplex = False
    pipe.cfg.use_tts = True


def test_high_image_forces_two_slices(pipeline):
    pipe = pipeline
    seen = {}

    def enc(img, max_slice_nums=None):
        seen["msn"] = max_slice_nums
        return [np.zeros((4, pipe.llm.cfg.d_model), np.float32)]

    pipe.vision_encoder = enc
    pipe.cfg.high_image = True
    try:
        parts = pipe._encode_image_parts(np.zeros((8, 8, 3), np.uint8))
    finally:
        pipe.cfg.high_image = False
        pipe.vision_encoder = None
    assert seen["msn"] == 2 and len(parts) == 1


def test_high_refresh_frame_stacking():
    from omni_tpu.omni.image import stack_frames

    frames = [np.full((6, 8, 3), i, np.uint8) for i in range(4)]
    stacked = stack_frames(frames)
    assert stacked.shape == (12, 16, 3)  # 2x2 grid of 6x8 frames
    assert (stacked[:6, :8] == 0).all() and (stacked[:6, 8:] == 1).all()
    assert (stacked[6:, :8] == 2).all() and (stacked[6:, 8:] == 3).all()


def test_fused_decode_matches_host_loop(pipeline):
    """The fused on-device scan loop (production path) must emit exactly
    the token stream of the one-dispatch-per-token host loop under greedy
    sampling — the served path IS the benched path."""
    from omni_tpu.runtime import SamplerParams

    pipe = pipeline
    orig_sampler = pipe.llm.sampler

    def run(fused: bool):
        pipe.clean_kvcache()
        pipe.cfg.duplex = False
        pipe.cfg.use_tts = False
        pipe.cfg.fused_decode = fused
        pipe.llm.sampler = SamplerParams(greedy=True)
        import jax as _jax
        import jax.numpy as _jnp

        pipe.llm.key = _jax.random.PRNGKey(0)
        pipe.llm.prev_tokens = _jnp.full((64,), -1, _jnp.int32)
        pipe.prefill_done.set()
        pipe.stream_prefill(index=0, system_prompt="deterministic")
        pipe.stream_decode(round_idx=0, max_new_tokens=23)
        texts = []
        while True:
            ev = pipe.text_out.get(timeout=30)
            if ev.get("stop"):
                break
            texts.append(ev["content"])
        return "".join(texts), pipe.llm.n_past.get(0, 0)

    try:
        host_text, host_past = run(fused=False)
        fused_text, fused_past = run(fused=True)
    finally:
        pipe.llm.sampler = orig_sampler
        pipe.cfg.use_tts = True
        pipe.cfg.fused_decode = True
    assert fused_text == host_text
    assert fused_past == host_past


def test_tts_chunk0_speaker_conditioning(pipeline):
    """Chunk-0 TTS KV layout (voice clone, omni.cpp:5041/2504-2518):
    [spk_embed, cond x n, audio_bos] prefilled into a FRESH KV, condition
    saved for the first-token re-forward contract."""
    from omni_tpu.omni.pipeline import LLMOut

    pipe = pipeline
    pipe.clean_kvcache()
    rng = np.random.default_rng(5)
    spk = rng.standard_normal(32).astype(np.float32)
    pipe.spk_embed = spk
    n = 4
    out = LLMOut(text="abcd",
                 token_ids=[10, 11, 12, 13],
                 hidden_states=rng.standard_normal((n, 64)).astype(np.float32),
                 end_of_turn=False, is_final=False)
    codes = pipe._tts_generate(out, first_chunk=True)
    # saved condition layout: spk + n cond + audio_bos
    assert pipe._tts_condition is not None
    assert pipe._tts_condition.shape[0] == 1 + n + 1
    np.testing.assert_allclose(pipe._tts_condition[0], spk, rtol=1e-5,
                               atol=1e-5)
    # KV holds exactly the condition + generated codes (fresh at chunk 0)
    assert pipe.tts_ctx.n_past[0] == (1 + n + 1) + len(codes)
    # chunk 1: NO spk prepend, KV continues
    n_past1 = pipe.tts_ctx.n_past[0]
    codes2 = pipe._tts_generate(out, first_chunk=False)
    assert pipe.tts_ctx.n_past[0] == n_past1 + (n + 1) + len(codes2)
    pipe.spk_embed = None


def test_session_checkpoint_resume(pipeline):
    """Omni session save -> fresh-state restore reproduces the KV session."""
    import numpy as np

    pipe = pipeline
    pipe.clean_kvcache()
    pipe.cfg.duplex = False
    from omni_tpu.runtime import Batch

    toks = np.arange(12, dtype=np.int32) % pipe.llm.cfg.n_vocab
    pipe.llm.decode(Batch(tokens=toks))
    pipe.n_keep = 5
    from omni_tpu.omni.pipeline import RoundBoundary

    pipe.rounds.append(RoundBoundary(5, 12))
    blob = pipe.session_state_bytes()

    pipe.clean_kvcache()
    assert pipe.llm.n_past.get(0, 0) == 0
    pipe.load_session_state_bytes(blob)
    assert pipe.llm.n_past[0] == 12
    assert pipe.n_keep == 5
    assert pipe.rounds[0].end_pos == 12
    # the restored KV continues identically to an unbroken session
    lg, _ = pipe.llm.decode(Batch(tokens=np.array([3], np.int32)))
    assert np.isfinite(np.asarray(lg)).all()


def test_break_during_fused_decode_keeps_kv_accounting(pipeline):
    """A barge-in (break_event) mid-turn abandons in-flight speculative
    scans whose tokens are already in the KV — host n_past/cells_used must
    be drained to match the device, or every later round corrupts."""
    import threading as _th
    import jax.numpy as _jnp

    pipe = pipeline
    pipe.clean_kvcache()
    pipe.cfg.duplex = False
    pipe.cfg.use_tts = False
    pipe.cfg.fused_decode = True
    pipe.prefill_done.set()
    pipe.stream_prefill(index=0, system_prompt="barge")

    done = _th.Event()

    def run():
        pipe.stream_decode(round_idx=0, max_new_tokens=300)
        done.set()

    t = _th.Thread(target=run, daemon=True)
    t.start()
    pipe.text_out.get(timeout=60)  # first event -> decode is mid-flight
    pipe.break_event.set()
    assert done.wait(timeout=60)
    while not pipe.text_out.empty():
        pipe.text_out.get_nowait()
    # host accounting matches the device exactly
    used_dev = int(pipe.llm.cache.n_used())
    assert pipe.llm.cells_used == used_dev, (pipe.llm.cells_used, used_dev)
    # positions are consistent: every owned cell sits below n_past
    import numpy as _np

    pos = _np.asarray(pipe.llm.cache.pos)
    mask = _np.asarray(pipe.llm.cache.seq_mask) != 0
    assert pos[mask].max() + 1 == pipe.llm.n_past[0]
    # and the next round still generates cleanly
    pipe.break_event.clear()
    pipe.stream_decode(round_idx=1, max_new_tokens=12)
    while True:
        ev = pipe.text_out.get(timeout=30)
        if ev.get("stop"):
            break
    pipe.cfg.use_tts = True


def test_long_session_window_soak(pipeline):
    """Multi-round soak: fused decode + round-window slides over many
    turns must keep host cell/position accounting exactly in sync with
    the device KV (the interaction the per-round tests never exercise)."""
    pipe = pipeline
    pipe.clean_kvcache()
    pipe.cfg.duplex = False
    pipe.cfg.use_tts = False
    pipe.cfg.fused_decode = True
    saved_wm = pipe.cfg.max_preserved_context
    pipe.cfg.max_preserved_context = 120  # force slides every ~2 rounds
    try:
        pipe.stream_prefill(index=0, system_prompt="soak",
                            ref_audio=np.zeros(1600, np.float32))
        for r in range(6):
            pipe.stream_prefill(audio=np.zeros(1600, np.float32),
                                index=r + 1)
            pipe.stream_decode(round_idx=r, max_new_tokens=30)
            while True:
                ev = pipe.text_out.get(timeout=60)
                if ev.get("stop"):
                    break
            # invariants after every round
            used_dev = int(pipe.llm.cache.n_used())
            assert pipe.llm.cells_used == used_dev, (r, pipe.llm.cells_used,
                                                     used_dev)
            pos = np.asarray(pipe.llm.cache.pos)
            mask = np.asarray(pipe.llm.cache.seq_mask) != 0
            n_past = pipe.llm.n_past[0]
            assert pos[mask].max() + 1 == n_past, (r, pos[mask].max(), n_past)
            # positions contiguous 0..n_past-1 (window re-base correctness)
            assert set(pos[mask].tolist()) == set(range(n_past)), r
            # the system prompt never slides out
            assert set(range(pipe.n_keep)) <= set(pos[mask].tolist())
        # the watermark held
        assert pipe.llm.n_past[0] <= pipe.cfg.max_preserved_context + 80
    finally:
        pipe.cfg.max_preserved_context = saved_wm
        pipe.cfg.use_tts = True


def test_long_duplex_unit_window_soak(pipeline):
    """Duplex soak: unit-granular window enforcement across many rounds
    with the fused loop; host/device KV accounting must stay exact."""
    pipe = pipeline
    pipe.clean_kvcache()
    pipe.cfg.duplex = True
    pipe.cfg.use_tts = False
    pipe.cfg.fused_decode = True
    saved = (pipe.cfg.high_water, pipe.cfg.low_water)
    pipe.cfg.high_water, pipe.cfg.low_water = 150, 100
    try:
        pipe.stream_prefill(index=0, system_prompt="dsoak",
                            ref_audio=np.zeros(1600, np.float32))
        for r in range(6):
            pipe.stream_prefill(audio=np.zeros(1600, np.float32),
                                index=r + 1)
            pipe.stream_decode(round_idx=r, max_new_tokens=30)
            while True:
                ev = pipe.text_out.get(timeout=60)
                if ev.get("stop"):
                    break
            used_dev = int(pipe.llm.cache.n_used())
            assert pipe.llm.cells_used == used_dev, (r,)
            pos = np.asarray(pipe.llm.cache.pos)
            mask = np.asarray(pipe.llm.cache.seq_mask) != 0
            assert pos[mask].max() + 1 == pipe.llm.n_past[0], (r,)
            for u in pipe.units:
                assert u.start_pos >= pipe.n_keep
        assert pipe.llm.n_past[0] <= 150 + 60  # water marks held
    finally:
        pipe.cfg.high_water, pipe.cfg.low_water = saved
        pipe.cfg.duplex = False
        pipe.cfg.use_tts = True
