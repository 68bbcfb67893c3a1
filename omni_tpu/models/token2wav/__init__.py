"""Token2Wav: streaming flow-matching token → mel → waveform pipeline.

Top-level session semantics from the reference
(/root/reference/tools/omni/token2wav/token2wav.cpp Token2WavSession and
token2wav-impl.cpp Token2Mel/Token2Wav):

- feed_window(tokens[≤28], is_final): pad to 28 with token 4218, run one
  chunk (token-embed → conformer upsampler ×2 → encoder_proj → mu →
  CFM(5 steps, CFG 0.7) → 56 mel frames, cropped to 2·n_tokens), then
  vocoder over [8-frame mel cache | new mel] with source-prefix reuse and
  a hamming crossfade over the first 3840 samples against the previous
  chunk's tail. 25 main tokens ⇒ exactly 1 s of 24 kHz audio.
- Speaker conditioning: L2-normalized 192-dim x-vector → affine → 80-dim,
  loaded (with priming caches) from the reference's prompt_cache.gguf.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from . import conformer as conf
from . import dit as ditm
from . import hifigan as hg

PAD_TOKEN = 4218
CHUNK_MAIN = 25
PRE_LOOKAHEAD = 3
DT = CHUNK_MAIN + PRE_LOOKAHEAD
MEL_CHANNELS = 80
SPK_DIM = 192


class Token2Wav:
    """Streaming token→wav session (counterpart of flow::Token2WavSession)."""

    def __init__(self, encoder_params, encoder_cfg, flow_extra, dit_params,
                 dit_cfg, voc_params, spk: np.ndarray,
                 n_timesteps: int = 5, temperature: float = 1.0):
        self.enc_p = encoder_params
        self.enc_cfg = encoder_cfg
        self.extra = flow_extra  # input_embedding, spk_affine, encoder_proj
        self.dit_p = dit_params
        self.dit_cfg = dit_cfg
        self.voc_p = voc_params
        self.n_timesteps = n_timesteps
        self.temperature = temperature

        self.spk = np.asarray(spk, np.float32).reshape(-1)[:SPK_DIM]
        self.spk80 = self._spk_affine(self.spk)
        self.reset()

    def _spk_affine(self, spk: np.ndarray):
        """192-d x-vector -> normalized 80-d conditioning row."""
        spk_n = spk / (np.linalg.norm(spk) + 1e-12)
        return jnp.asarray(
            spk_n @ np.asarray(self.extra["spk_affine_w"]).T
            + np.asarray(self.extra["spk_affine_b"]))

    # -- session state -------------------------------------------------------
    def reset(self):
        self.enc_state = conf.ConformerState.create(self.enc_cfg)
        self.cfm_state = ditm.CFMState.create(self.dit_cfg, self.n_timesteps)
        self.mel_cache = np.zeros((0, self.dit_cfg.out_channels), np.float32)
        self.source_cache = np.zeros((0,), np.float32)
        self.speech_cache = np.zeros((0,), np.float32)

    @classmethod
    def from_gguf(cls, encoder_gguf: str, flow_matching_gguf: str,
                  flow_extra_gguf: str, vocoder_gguf: str,
                  prompt_cache_gguf: str | None = None,
                  spk: np.ndarray | None = None,
                  n_timesteps: int = 5, temperature: float = 1.0) -> "Token2Wav":
        from ...core import GGUFReader, quants

        enc_p, enc_cfg = conf.load_conformer_params(GGUFReader(encoder_gguf))
        dit_p, dit_cfg = ditm.load_dit_params(GGUFReader(flow_matching_gguf))
        fx = GGUFReader(flow_extra_gguf)

        def get(r, name):
            ti = r.tensors[name]
            return jnp.asarray(quants.dequantize(ti.data, ti.ggml_type, ti.shape))

        extra = {
            "input_embedding": get(fx, "input_embedding.weight"),
            "spk_affine_w": get(fx, "spk_embed_affine_layer.weight"),
            "spk_affine_b": get(fx, "spk_embed_affine_layer.bias"),
            "encoder_proj_w": get(fx, "encoder_proj.weight"),
            "encoder_proj_b": get(fx, "encoder_proj.bias"),
        }
        voc_p = hg.load_hifigan_params(GGUFReader(vocoder_gguf))

        spk_given = spk is not None
        if spk is None and prompt_cache_gguf:
            pc = GGUFReader(prompt_cache_gguf)
            if "prompt_cache.spk_cb" in pc.tensors:
                ti = pc.tensors["prompt_cache.spk_cb"]
                spk = np.asarray(
                    quants.dequantize(ti.data, ti.ggml_type, ti.shape))
                spk_given = True
        if spk is None:
            spk = np.zeros(SPK_DIM, np.float32)
        t2w = cls(enc_p, enc_cfg, extra, dit_p, dit_cfg, voc_p, spk,
                  n_timesteps, temperature)
        # reference-voice priming, in order of fidelity
        # (Token2WavSession::init_from_prompt_cache_gguf,
        # token2wav/token2wav.cpp:8-27 → token2wav-impl.cpp:8182):
        #   1. packed streaming-cache tensors -> direct state import;
        #   2. prompt TOKENS -> prime by replay (prompt-bundle semantics);
        #   3. neither -> FAIL LOUDLY (a wrong voice must never be silent).
        if prompt_cache_gguf:
            from . import prompt_cache as pc_mod

            pc = GGUFReader(prompt_cache_gguf)
            if pc_mod.has_cache_tensors(pc):
                spk_i, t2w.enc_state, t2w.cfm_state = pc_mod.import_states(
                    pc, enc_cfg, dit_cfg, n_timesteps)
                if not spk_given:  # cache's own x-vector wins over the
                    t2w.set_spk(spk_i)  # zero-vector default
            else:
                for name in ("prompt_cache.prompt_tokens", "prompt_tokens"):
                    if name in pc.tensors:
                        ti = pc.tensors[name]
                        t2w.prime_with_prompt(np.asarray(ti.data).reshape(-1))
                        break
                else:
                    raise pc_mod.PromptCacheError(
                        f"{prompt_cache_gguf} carries neither packed cache "
                        "tensors nor prompt tokens — cannot prime the "
                        "reference voice")
        return t2w

    def set_spk(self, spk: np.ndarray) -> None:
        """Replace the speaker x-vector (recomputes the 80-d affine)."""
        self.spk = np.asarray(spk, np.float32)
        self.spk80 = self._spk_affine(self.spk)

    def export_prompt_cache(self, path) -> None:
        """Persist the current streaming caches as prompt_cache.gguf (the
        reference's auto-export, token2wav-impl.cpp:8119-8169)."""
        from . import prompt_cache as pc_mod

        pc_mod.export_states(path, self.spk, self.enc_state, self.cfm_state,
                             self.enc_cfg, self.dit_cfg, self.n_timesteps,
                             self.temperature)

    def prime_with_prompt(self, prompt_tokens) -> None:
        """Warm the streaming caches with the reference voice's prompt
        tokens (Token2Wav::start_stream_with_prompt / prompt-bundle init):
        the conformer attention history and CFM estimator caches then
        condition every later window on the reference voice. Audio output
        of the prompt is discarded (it precedes the stream)."""
        toks = np.asarray(prompt_tokens, np.int32).reshape(-1)
        for i in range(0, len(toks), CHUNK_MAIN):
            win = toks[i: i + DT]
            chunk = np.full(DT, PAD_TOKEN, np.int32)
            chunk[: len(win)] = win
            self._token2mel(chunk, last=False)
        # waveform-side caches stay empty: no audible prompt in the stream
        self.mel_cache = np.zeros((0, self.dit_cfg.out_channels), np.float32)
        self.source_cache = np.zeros((0,), np.float32)
        self.speech_cache = np.zeros((0,), np.float32)

    # -- one chunk -----------------------------------------------------------
    def _token2mel(self, tokens: np.ndarray, last: bool) -> np.ndarray:
        mel, self.enc_state, self.cfm_state = _token2mel_fused(
            self.enc_p, self.enc_cfg, self.dit_p, self.dit_cfg, self.extra,
            jnp.asarray(tokens, jnp.int32), self.enc_state, self.cfm_state,
            self.spk80, self.n_timesteps, self.temperature, last)
        return mel  # [T_mel, 80] DEVICE array (callers fetch once at most)

    def feed_window(self, tokens, is_final: bool = False) -> np.ndarray:
        """25(+3 lookahead) audio codes -> 24 kHz float wave (1 s per full
        window). Mirrors Token2Wav::push_tokens_window incl. caches/fade.

        Latency/compile discipline: the mel window is ALWAYS the full
        padded DT*2 frames (a partial final window pads with silence
        tokens and the wave is trimmed to the valid samples afterwards) —
        variable-length mels would trigger a fresh ~10 s vocoder compile
        per distinct final-window size. The silence padding can bleed into
        the last valid samples within the vocoder's receptive field; that
        boundary precedes inter-turn silence, an accepted trade."""
        tokens = np.asarray(tokens, np.int32)
        n = len(tokens)
        assert 0 <= n <= DT, n
        if n == 0:
            return np.zeros(0, np.float32)
        chunk = np.full(DT, PAD_TOKEN, np.int32)
        chunk[:n] = tokens
        mel = self._token2mel(chunk, is_final)  # [DT*2, 80] device
        cache_len = int(self.mel_cache.shape[0])
        n_valid_mel = cache_len + n * 2

        mel_in = (jnp.concatenate([jnp.asarray(self.mel_cache), mel], axis=0)
                  if cache_len else mel)
        cached_src = (jnp.asarray(self.source_cache)
                      if len(self.source_cache) else None)
        wave_d, source_d = hg.vocode(self.voc_p, mel_in, cached_src)
        valid = n_valid_mel * hg.SAMPLES_PER_MEL
        # ONE host fetch for both outputs (each round-trip costs ~35 ms)
        ws = np.asarray(jnp.stack([wave_d, source_d]), np.float32)
        wave, source = ws[0, :valid], ws[1, :valid]

        if len(self.speech_cache):
            wave = _fade_in_out(wave, self.speech_cache)

        # caches reflect only the VALID region (device-resident mel tail)
        self.mel_cache = mel_in[:n_valid_mel][-hg.MEL_CACHE:]
        self.source_cache = source[-hg.SOURCE_CACHE:]
        self.speech_cache = wave[-hg.SOURCE_CACHE:]
        # the reference emits the full (crossfaded) window including the
        # regenerated cached-mel head — observable contract preserved
        return wave

    def feed_tokens(self, tokens, is_final: bool = False) -> np.ndarray:
        """Auto-windowing variant (Token2WavSession::feed_tokens)."""
        self_pending = getattr(self, "_pending", [])
        self_pending.extend(np.asarray(tokens, np.int32).tolist())
        out = []
        while len(self_pending) >= DT:
            window = np.asarray(self_pending[:DT], np.int32)
            out.append(self.feed_window(window, False))
            del self_pending[:CHUNK_MAIN]
        if is_final and self_pending:
            out.append(self.feed_window(np.asarray(self_pending, np.int32), True))
            self_pending.clear()
        self._pending = self_pending
        return np.concatenate(out) if out else np.zeros(0, np.float32)


def _fade_in_out(wave: np.ndarray, prev_tail: np.ndarray) -> np.ndarray:
    """Hamming-window crossfade over the overlap (token2wav_utils::fade_in_out)."""
    n = min(len(prev_tail), len(wave))
    if n == 0:
        return wave
    t = np.arange(2 * n, dtype=np.float32)
    window = 0.54 - 0.46 * np.cos(2 * np.pi * t / (2 * n - 1))
    fade_in = window[:n]
    fade_out = window[n:]
    out = wave.copy()
    out[:n] = wave[:n] * fade_in + prev_tail[:n] * fade_out
    return out


import functools


@functools.partial(jax.jit, static_argnames=("enc_cfg", "dit_cfg",
                                             "n_timesteps", "last"))
def _token2mel_fused(enc_p, enc_cfg, dit_p, dit_cfg, extra, tokens,
                     enc_state, cfm_state, spk80, n_timesteps, temperature,
                     last):
    """Token window -> mel in ONE device dispatch: embedding lookup,
    conformer chunk, encoder projection, and the 5-step CFM solve fuse into
    a single jit — the per-dispatch host round-trip (~35 ms on the tunnel)
    would otherwise be paid three times per 1 s window (TTFT path)."""
    emb = extra["input_embedding"][tokens]
    feats, enc_state = conf.encode_chunk(enc_p, enc_cfg, emb, enc_state,
                                         last_chunk=last)
    mu = jnp.einsum("tc,nc->tn", feats, extra["encoder_proj_w"],
                    preferred_element_type=jnp.float32) \
        + extra["encoder_proj_b"]
    mel, cfm_state = ditm.cfm_solve_chunk(dit_p, dit_cfg, mu, spk80,
                                          cfm_state, n_timesteps, temperature)
    return mel, enc_state, cfm_state
