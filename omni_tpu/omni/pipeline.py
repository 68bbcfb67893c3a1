"""Full-duplex omni-modal streaming pipeline orchestrator.

Re-design of the reference's omni engine (/root/reference/tools/omni/
omni.{h,cpp}; SURVEY.md §2.3/§3/§A.3-A.7): owns the five model contexts and
three worker stages (LLM prefill / TTS / Token2Wav) connected by bounded
queues with the reference's cadence and back-pressure:

- prefill-embeds queue cap 1000, TTS queue cap 1, T2W queue cap 25
  (omni.cpp:3713-3722) — the LLM never runs more than one text chunk
  ahead of TTS.
- LLM→TTS chunks of 10 valid text tokens with their hidden states;
  duplex speak segments capped at 26 tokens/chunk (omni.h:233).
- TTS→T2W chunks of 25 audio codes; T2W buffer primed with 3 silence
  tokens (4218) and consuming 28 (25+3 lookahead) per 1 s window
  (omni.cpp:3817-3821, 8292-8298).
- Special-token protocol (ids cached from the vocab at init,
  omni.cpp:3939-3983): <|speak|>, <|listen|>, <|chunk_eos|>, <|turn_eos|>,
  <|tts_eos|>, </s>, <unit>, </unit> with simplex/duplex semantics.
- Session prompts per §A.4 (simplex system/assistant/turn-end templates,
  duplex unit protocol).
- Round-granular sliding window: evict oldest full rounds past the
  watermark, protect n_keep system-prompt tokens, re-base positions with
  seq_add (omni.cpp:686-820).

Threading mirrors the reference but with Python queues; all device work
happens inside the jitted model steps.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from typing import Any, Callable

import numpy as np

import jax
import jax.numpy as jnp

from ..models import tts as tts_mod
from ..runtime import Batch, Context

# queue capacities (omni.cpp:3713-3722)
PREFILL_QUEUE_CAP = 1000
TTS_QUEUE_CAP = 1
T2W_QUEUE_CAP = 25

STEP_SIZE = 10  # LLM tokens per TTS chunk (omni.cpp:9120)
DUPLEX_CHUNK_CAP = 26  # omni.h:233
SIMPLEX_AUDIO_CAP = 500  # audio codes per text chunk (omni.cpp:4976)
T2W_MAIN = 25
T2W_LOOKAHEAD = 3
SILENCE_TOKEN = 4218

# special-token literals (ids resolved from the model vocab at init)
SPECIALS = [
    "<|speak|>", "<|listen|>", "<|chunk_eos|>", "<|chunk_tts_eos|>",
    "<|turn_eos|>", "<|tts_eos|>", "</s>", "<|tts_bos|>", "</unit>",
    "<unit>", "<|tts_pad|>", "<|im_end|>", "<|im_start|>",
    "<|audio_start|>", "<|audio_end|>", "<think>", "</think>",
    "<image>", "</image>", "<slice>", "</slice>",
]

SIMPLEX_ASSISTANT_PROMPT = (
    "<|im_end|>\n<|im_start|>assistant\n<think>\n\n</think>\n\n<|tts_bos|>"
)
SIMPLEX_TURN_END = "<|im_end|>\n<|im_start|>user\n"


@dataclasses.dataclass
class SessionConfig:
    """Runtime-mutable session config (update_session_config contract)."""

    duplex: bool = False
    use_tts: bool = True
    media_type: int = 1  # 1=audio, 2=omni(audio+vision)
    max_slice_nums: int = -1  # vision slice override (-1 = model default)
    # high-res mode: max_slice_nums forced to 2 (reference omni.h:258-263,
    # server.cpp:6062-6070); high-refresh: 5 fps frame stacking — frame 0 is
    # the main image, the following frames merge into one stacked image
    high_image: bool = False
    high_refresh: bool = False
    # fused decode: drive the LLM hot loop as on-device scans of STEP_SIZE
    # tokens per host dispatch (~2 ms tunnel cost each) instead of one
    # dispatch per token; disabled automatically for mirostat sampling
    fused_decode: bool = True
    max_preserved_context: int = 3072  # round-window watermark
    high_water: int = 4000  # duplex unit-window marks (omni.h:81-94)
    low_water: int = 3500
    max_new_tokens: int = 512
    # out-of-band audio delivery (reference §A.5: wav files + done flag
    # under {output_dir}/round_XXX/tts_wav/, omni-cli.cpp:370-377)
    output_dir: str | None = None


@dataclasses.dataclass
class LLMOut:
    """LLM→TTS chunk (struct LLMOut, omni.cpp:256)."""

    text: str
    token_ids: list[int]
    hidden_states: np.ndarray  # [n, d_llm]
    end_of_turn: bool = False
    is_final: bool = False


@dataclasses.dataclass
class RoundBoundary:
    start_pos: int
    end_pos: int


@dataclasses.dataclass
class UnitEntry:
    """One duplex <unit>...</unit> span in the KV (UnitEntry, omni.h:96-103)."""

    start_pos: int
    end_pos: int = -1  # -1 = still open

    @property
    def closed(self) -> bool:
        return self.end_pos >= 0


class OmniPipeline:
    """Session orchestrator. Model contexts are injected, which keeps the
    pipeline testable with tiny models and lets the server own lifetimes."""

    def __init__(
        self,
        llm: Context,
        tokenizer,
        tts_ctx: Context | None = None,
        tts_extras: dict | None = None,
        token2wav=None,  # models.token2wav.Token2Wav
        audio_encoder: Callable | None = None,  # wav[np] -> embeds [T, d_llm]
        vision_encoder: Callable | None = None,  # img[np] -> embeds [64, d_llm]
        config: SessionConfig | None = None,
    ):
        self.llm = llm
        self.tok = tokenizer
        self.tts_ctx = tts_ctx
        self.tts_extras = tts_extras
        self.t2w = token2wav
        self.audio_encoder = audio_encoder
        self.vision_encoder = vision_encoder
        self.cfg = config or SessionConfig()

        self.special = {}
        for s in SPECIALS:
            tid = tokenizer.vocab.token_to_id.get(s) if tokenizer else None
            if tid is not None:
                self.special[s] = tid
        self._filter_ids = set(self.special.values())

        # threading / state
        self.embed_queue: queue.Queue = queue.Queue(PREFILL_QUEUE_CAP)
        self.tts_queue: queue.Queue = queue.Queue(TTS_QUEUE_CAP)
        self.t2w_queue: queue.Queue = queue.Queue(T2W_QUEUE_CAP)
        self.text_out: queue.Queue = queue.Queue()
        self.wav_out: queue.Queue = queue.Queue()
        self.break_event = threading.Event()
        self.session_stop = threading.Event()
        self.prefill_done = threading.Event()
        # set when the turn's first Token2Wav window is being dispatched
        # (TTFT ordering gate for the LLM's speculative scans)
        self._first_window_dispatched = threading.Event()
        self._first_window_dispatched.set()
        # outstanding-prefill counter closes the enqueue/`queue.Empty` race:
        # prefill_done only sets when every enqueued chunk has been fully
        # evaluated (the reference's cv-guarded prefill_done,
        # omni.cpp:8649-8658). Guarded by _prefill_mtx.
        self._prefill_pending = 0
        self._prefill_mtx = threading.Lock()
        self.llama_mtx = threading.Lock()  # serializes LLM ctx (omni.h:287)
        self.n_keep = 0
        self.rounds: list[RoundBoundary] = []
        self.units: list[UnitEntry] = []  # duplex unit registry (#39)
        # voice cloning: speaker embedding prepended at TTS chunk 0
        # (default voice until a reference audio sets it at index-0 prefill)
        self.spk_embed: np.ndarray | None = None
        if tts_extras is not None:
            self.spk_embed = np.asarray(tts_mod.speaker_embed(tts_extras))
        # saved chunk-0 condition (spk + cond + bos): the reference
        # re-forwards it for the first audio token (omni.cpp:2504-2518)
        self._tts_condition: np.ndarray | None = None
        self._threads: list[threading.Thread] = []
        self._t2w_buffer: list[int] = [SILENCE_TOKEN] * 3
        self.current_round = 0
        self._wav_index = 0
        self._tts_key = jax.random.PRNGKey(0)
        self._workers_started = False
        # in-flight worker activity (drain/quiesce visibility: queue
        # emptiness alone cannot see a worker mid-generation)
        self._tts_active = False
        self._t2w_active = False
        self.last_error: Exception | None = None  # worker-surface errors

    # ------------------------------------------------------------------ util
    def busy(self) -> bool:
        """True while any stage still holds queued or in-flight work —
        the drain condition for shutdown / between-round measurement."""
        with self._prefill_mtx:
            prefilling = self._prefill_pending > 0
        return (prefilling or not self.embed_queue.empty()
                or not self.tts_queue.empty() or not self.t2w_queue.empty()
                or self._tts_active or self._t2w_active)

    def _encode(self, text: str) -> np.ndarray:
        return np.asarray(self.tok.encode(text, add_special=False), np.int32)

    def _eval_text(self, text: str):
        toks = self._encode(text)
        if len(toks):
            with self.llama_mtx:
                # non-blocking enqueue: marker/prompt evals cost one
                # dispatch, not a ~35 ms round-trip each (TTFT path)
                logits, _ = self.llm.decode(Batch(tokens=toks), block=False)
            return logits[-1]
        return None

    def _eval_embeds(self, emb: np.ndarray, return_hidden: bool = False):
        with self.llama_mtx:
            _, hidden = self.llm.decode(
                Batch(embeds=emb if isinstance(emb, jax.Array)
                      else np.asarray(emb, np.float32)),
                return_hidden=return_hidden, block=False)
        return hidden

    def is_end_token(self, tid: int) -> bool:
        names = ("<|turn_eos|>", "<|tts_eos|>", "</s>") if not self.cfg.duplex \
            else ("<|turn_eos|>", "</s>",)
        return any(self.special.get(n) == tid for n in names) or \
            (self.tok.vocab.is_eog(tid) if self.tok else False)

    def is_valid_tts_token(self, tid: int) -> bool:
        """TTS-conditioning filter (omni.cpp:4432-4476): no special ids,
        nothing ≥150000."""
        return tid < 150000 and tid not in self._filter_ids

    def _end_ids(self) -> tuple[int, ...]:
        """Concrete end-token id set for the on-device classifier: the
        protocol end names (is_end_token) plus every EOG id in the vocab."""
        cache = getattr(self, "_end_ids_cache", None)
        if cache is None:
            cache = self._end_ids_cache = {}
        if self.cfg.duplex not in cache:
            names = (("<|turn_eos|>", "<|tts_eos|>", "</s>")
                     if not self.cfg.duplex else ("<|turn_eos|>", "</s>"))
            ids = {self.special[n] for n in names if n in self.special}
            v = self.tok.vocab if self.tok else None
            if v is not None:
                eos = getattr(v, "eos_id", None)
                if eos is not None:
                    ids.add(int(eos))
                for _, tid in getattr(v, "token_to_id", {}).items():
                    if v.is_eog(tid):
                        ids.add(int(tid))
            cache[self.cfg.duplex] = tuple(sorted(ids))
        return cache[self.cfg.duplex]

    # ------------------------------------------------------------- prefill
    def effective_max_slice_nums(self) -> int:
        """Runtime slice override: high_image forces 2, else the session's
        max_slice_nums (-1 = model/encoder default). Reference
        vision.cpp:182-183 + server.cpp:6070."""
        if self.cfg.high_image:
            return 2
        return self.cfg.max_slice_nums

    def _encode_image_parts(self, image: np.ndarray,
                            max_slice_nums: int | None = None) -> list[np.ndarray]:
        """Encoder call returning per-part embeds [overview, slice1, ...].
        Supports both the new list-returning encoder contract and a legacy
        single-array encoder (treated as one part)."""
        msn = (max_slice_nums if max_slice_nums is not None
               and max_slice_nums >= 0 else self.effective_max_slice_nums())
        # signature-based dispatch: a TypeError raised INSIDE the encoder
        # must not silently drop the slice override
        import inspect

        try:
            takes_msn = "max_slice_nums" in inspect.signature(
                self.vision_encoder).parameters
        except (TypeError, ValueError):
            takes_msn = False
        if takes_msn:
            parts = self.vision_encoder(image, max_slice_nums=msn)
        else:
            parts = self.vision_encoder(image)
        if isinstance(parts, np.ndarray):
            parts = [parts]
        return [np.asarray(p, np.float32) for p in parts]

    def stream_prefill(self, audio: np.ndarray | None = None,
                       image: np.ndarray | None = None,
                       index: int = 0,
                       system_prompt: str = "",
                       ref_audio: np.ndarray | None = None,
                       frames: list | None = None,
                       max_slice_nums: int = -1) -> None:
        """Per-1s-chunk ingestion (omni.cpp:8637). index==0 = session init:
        system prompt + reference-voice audio; workers are spawned.
        `frames` (high-refresh mode): a list of video frames for this
        second — frame 0 becomes the main image, the rest merge into one
        stacked image (the reference flags high_refresh and leaves the
        stacking to the Python caller, omni.h:258-263; here it is part of
        the pipeline)."""
        if index == 0:
            if ref_audio is None and audio is not None:
                # server contract: prefill cnt=0 passes the reference voice
                # as the chunk audio (omni.cpp:8724-8803, server.cpp:5824)
                ref_audio = audio
            if self.cfg.duplex:
                pre = "<|im_start|>system\nStreaming Duplex Conversation!" + \
                    (system_prompt or "") + "<|audio_start|>"
                suf = "<|audio_end|><|im_end|>\n"
            else:
                pre = ("<|im_start|>system\n" + (system_prompt or "") +
                       "\n<|audio_start|>")
                suf = "<|audio_end|><|im_end|>\n<|im_start|>user\n"
            self._eval_text(pre)
            if ref_audio is not None and self.audio_encoder is not None:
                # the reference-voice span conditions BOTH the LLM (voice-
                # clone system prompt) and the TTS speaker embedding
                # (projector_spk over its hidden states, chunk-0 prepend)
                hid = self._eval_embeds(self.audio_encoder(ref_audio),
                                        return_hidden=True)
                if self.tts_extras is not None:
                    self.spk_embed = np.asarray(
                        tts_mod.speaker_embed(self.tts_extras, hid))
            self._eval_text(suf)
            self.n_keep = self.llm.n_past.get(0, 0)
            self._start_workers()
            self.prefill_done.set()
            return

        # async: encode on caller thread, enqueue for the LLM worker
        item: dict[str, Any] = {"index": index}
        if audio is not None and self.audio_encoder is not None:
            item["audio_embeds"] = self.audio_encoder(audio)
        images: list[np.ndarray] = []
        if frames:  # high-refresh: main frame + one stacked image
            from .image import stack_frames

            images.append(np.asarray(frames[0]))
            if len(frames) > 1 and self.cfg.high_refresh:
                images.append(stack_frames([np.asarray(f) for f in frames[1:]]))
        elif image is not None:
            images.append(image)
        if images and self.vision_encoder is not None:
            # per-image list of per-part embeds [overview, slice1, ...];
            # max_slice_nums >= 0 overrides the session setting for this
            # request only (server prefill contract, server.cpp:5585)
            item["image_parts"] = [
                self._encode_image_parts(im, max_slice_nums=max_slice_nums)
                for im in images]
        with self._prefill_mtx:
            self._prefill_pending += 1
            self.prefill_done.clear()
        self.embed_queue.put(item)

    def _llm_prefill_worker(self) -> None:
        """Consumes encoder embeds, wraps with markers, prefills LLM KV
        (llm_thread_func, omni.cpp:4229-4425)."""
        while not self.session_stop.is_set():
            try:
                item = self.embed_queue.get(timeout=0.01)
            except queue.Empty:
                continue
            try:
                # marker layout per reference llm_thread_func
                # (omni.cpp:4317-4383):
                #   duplex+vision : <unit><image>(ov)</image>
                #                   [<slice>(si)</slice>]*\n  + raw audio
                #   simplex+vision: <image>(ov)</image>[<slice>..]*\n
                #                   + <|audio_start|>audio<|audio_end|>
                #   duplex audio  : <unit> + raw audio embeds (no markers)
                #   simplex audio : <|audio_start|>audio<|audio_end|>
                if self.cfg.duplex:
                    self._register_unit_start()
                image_parts = item.get("image_parts") or []
                if "image_embeds" in item:  # legacy single-block callers
                    image_parts = image_parts + [[item["image_embeds"]]]
                first = True
                for parts in image_parts:
                    if first and self.cfg.duplex:
                        self._eval_text("<unit><image>")
                    else:
                        self._eval_text("<image>")
                    first = False
                    self._eval_embeds(parts[0])  # overview
                    self._eval_text("</image>")
                    if len(parts) > 1:  # V2.6 slice schema
                        for sl in parts[1:]:
                            self._eval_text("<slice>")
                            self._eval_embeds(sl)
                            self._eval_text("</slice>")
                        self._eval_text("\n")
                if self.cfg.duplex and not image_parts:
                    self._eval_text("<unit>")
                if "audio_embeds" in item:
                    if self.cfg.duplex:
                        self._eval_embeds(item["audio_embeds"])
                    else:
                        self._eval_text("<|audio_start|>")
                        self._eval_embeds(item["audio_embeds"])
                        self._eval_text("<|audio_end|>")
            except Exception as e:  # noqa: BLE001 — the worker must survive
                # (e.g. KVCacheFull from misconfigured windows); the chunk
                # is dropped but later chunks and decode keep working, and
                # the error is surfaced on the session
                from .. import log

                log.error("prefill worker: %s: %s", type(e).__name__, e)
                self.last_error = e
            finally:
                # signal only when EVERY enqueued chunk is fully in the KV —
                # decrementing after the evals closes the window where a
                # fresh put lands between an empty() check and set()
                with self._prefill_mtx:
                    self._prefill_pending -= 1
                    if self._prefill_pending == 0:
                        self.prefill_done.set()

    # -------------------------------------------------------------- decode
    def stream_decode(self, round_idx: int = 0,
                      max_new_tokens: int | None = None) -> None:
        """One response turn (omni.cpp:8950). Text chunks appear on
        `text_out`; audio (if TTS enabled) on `wav_out`."""
        limit = max_new_tokens or self.cfg.max_new_tokens
        self.prefill_done.wait(timeout=30.0)
        self.break_event.clear()
        # TTFT ordering: the tunnel executes dispatches IN ORDER, so the
        # turn's first Token2Wav window must reach the queue before the
        # LLM's speculative scan 2 (round-4 measurement: the spec scan
        # ahead of the first window cost ~100 ms of the p50-min gap)
        self._first_window_dispatched.clear()
        if not (self.cfg.use_tts and self.tts_ctx is not None
                and self.t2w is not None):
            self._first_window_dispatched.set()
        if round_idx >= 0:
            self.current_round = round_idx
        self._wav_index = 0
        round_start = self.llm.n_past.get(0, 0)

        if not self.cfg.duplex:
            last_logits = self._eval_text(SIMPLEX_ASSISTANT_PROMPT)
        else:
            last_logits = self._eval_text("<|speak|>" if "<|speak|>" in
                                          self.special else "\n")

        chunk_tokens: list[int] = []
        chunk_hiddens: list[np.ndarray] = []
        n_new = 0
        segment_tokens = 0
        ended_with_listen = False

        use_fused = (self.cfg.fused_decode
                     and self.llm.sampler.mirostat == 0)
        if use_fused:
            n_new, ended_with_listen = self._decode_loop_fused(
                last_logits, limit, chunk_tokens, chunk_hiddens)
        else:
            n_new, ended_with_listen = self._decode_loop_host(
                last_logits, limit, chunk_tokens, chunk_hiddens)

        if chunk_tokens:
            self._emit_chunk(chunk_tokens, chunk_hiddens, True)
        else:
            self._emit_chunk([], [], True)

        if not self.cfg.duplex and not ended_with_listen:
            self._eval_text(SIMPLEX_TURN_END)
        self.rounds.append(RoundBoundary(round_start, self.llm.n_past.get(0, 0)))
        if self.cfg.duplex:
            self._register_unit_end()
            self._enforce_unit_window()
        else:
            self._slide_window_if_needed()
        self.text_out.put({"content": "", "stop": True,
                           "end_of_turn": not ended_with_listen})

    def _decode_loop_host(self, last_logits, limit, chunk_tokens,
                          chunk_hiddens) -> tuple[int, bool]:
        """One-dispatch-per-token loop (kept for mirostat sampling, which
        carries host-side mu state). Same protocol as the fused loop."""
        n_new = 0
        segment_tokens = 0
        tok = None
        while n_new < limit and not self.break_event.is_set():
            if tok is not None:
                with self.llama_mtx:
                    logits, hidden = self.llm.decode(
                        Batch(tokens=np.array([tok], np.int32)),
                        return_hidden=True)
                last_logits = logits[0]
                if self.is_valid_tts_token(int(tok)):
                    chunk_tokens.append(int(tok))
                    chunk_hiddens.append(np.asarray(hidden[0]))
            tok = self.llm.sample_token(last_logits)
            n_new += 1
            segment_tokens += 1

            if self.special.get("<|listen|>") == tok:
                # duplex: end speak segment WITHOUT KV cleanup (omni.cpp:9281)
                self.text_out.put({"content": "", "is_listen": True,
                                   "stop": True})
                return n_new, True
            if self.is_end_token(tok):
                return n_new, False
            if self.cfg.duplex and segment_tokens >= DUPLEX_CHUNK_CAP:
                # cap hit: the sampled token is force-REPLACED by
                # <|chunk_eos|> + engine-appended </unit> — it must never
                # enter the KV (omni.cpp:9317-9344); the next sample comes
                # from the post-</unit> logits
                last_logits = self._force_chunk_end(last_logits)
                segment_tokens = 0
                tok = None  # discard the cap-breaching sampled token

            if len(chunk_tokens) >= STEP_SIZE:
                self._emit_chunk(chunk_tokens, chunk_hiddens, False)
                del chunk_tokens[:], chunk_hiddens[:]
        return n_new, False

    def _decode_loop_fused(self, last_logits, limit, chunk_tokens,
                           chunk_hiddens) -> tuple[int, bool]:
        """The SERVED hot loop: STEP_SIZE-token on-device scans with
        in-graph sampling + special-token classification + hidden taps
        (runtime.loop.omni_decode_scan), SOFTWARE-PIPELINED: the next scan
        is issued speculatively (its `done_in` chains the prior scan's
        frozen flag, so a terminated turn makes it a no-op) before the
        prior scan's results are fetched — the ~35 ms/round-trip host
        tunnel latency overlaps with on-device compute, so served ms/token
        approaches the raw fused-scan number. Reference hot loop #1
        (omni.cpp:9138-9469) pays 2 host trips per token here."""
        from ..runtime.loop import omni_decode_scan
        from ..runtime.context import KVCacheFull

        llm = self.llm
        listen_id = self.special.get("<|listen|>", -3)
        end_ids = self._end_ids()
        n_new = 0
        segment_tokens = 0
        # device-chained scan state (never synced while pipelining)
        st = {
            "logits": jnp.asarray(last_logits),
            "pos": jnp.int32(llm.n_past.get(0, 0)),
            "key": llm.key, "prev": llm.prev_tokens, "done": None,
        }
        # host-side bound on in-flight fed tokens (for the overflow guard)
        inflight = [0]
        # one ragged-KV bucket for the whole turn: occupied cells + the
        # full token budget + assistant/turn-end eval margin
        turn_kvb = [llm.kv_bucket(max(llm.kv_high, llm.cells_used)
                                  + limit + 4 * STEP_SIZE)]

        def feed_budget(n_new_b, seg_b):
            b = limit - n_new_b
            if self.cfg.duplex:
                b = min(b, DUPLEX_CHUNK_CAP - seg_b)
            return b - 1  # the terminal sample is never fed

        def issue(stop_feed):
            free = llm.cache.size - llm.cells_used - inflight[0]
            if free < STEP_SIZE:
                raise KVCacheFull(
                    f"omni decode: need {STEP_SIZE} free KV cells, have "
                    f"{free}; session windows are misconfigured")
            # ragged-KV bound, fixed for the WHOLE turn (chosen below from
            # the turn budget): a mid-turn bucket crossing would recompile
            # the scan (~10-30 s) inside the hot loop. Guard the invariant
            # anyway — an unexpected mid-turn eval could push cells past it.
            kvb = turn_kvb[0]
            if kvb is not None and (max(llm.kv_high, llm.cells_used)
                                    + inflight[0] + STEP_SIZE) > kvb:
                kvb = turn_kvb[0] = llm.kv_bucket(
                    max(llm.kv_high, llm.cells_used) + inflight[0]
                    + STEP_SIZE)
            with self.llama_mtx:
                packed, hiddens, st["logits"], llm.cache, st["key"], \
                    st["prev"], st["pos"], st["done"] = omni_decode_scan(
                        llm._forward, llm._embed, llm.cfg, llm.params,
                        llm.cache, st["logits"], st["pos"], jnp.int32(0),
                        st["key"], st["prev"],
                        n_steps=STEP_SIZE, sp=llm.sampler,
                        end_ids=end_ids, listen_id=listen_id,
                        stop_after=jnp.int32(min(stop_feed, STEP_SIZE)),
                        done_in=st["done"], kv_limit=kvb)
            inflight[0] += STEP_SIZE
            return packed, hiddens

        pending = None  # (packed, hiddens) device handles awaiting fetch
        # TTFT ordering gate: while the turn's first Token2Wav window has
        # not been dispatched, run scans SEQUENTIALLY so the TTS scan +
        # first window enter the in-order device queue ahead of LLM scan 2
        # (the round-4 p50-min gap). Bounded to the first few scans so a
        # text-only turn (no valid TTS tokens) regains pipelining.
        gate_iters = [0 if not self._first_window_dispatched.is_set()
                      else 99]

        def drain(handle):
            """Account an in-flight scan's committed tokens without
            emitting them (break path: the KV keeps whatever was fed, so
            host position/cell bookkeeping must follow — ghost cells would
            corrupt every later round)."""
            nonlocal n_new, segment_tokens
            if handle is None:
                return
            n_fed = int(np.asarray(handle[0])[1].sum())
            inflight[0] -= STEP_SIZE
            llm.n_past[0] = llm.n_past.get(0, 0) + n_fed
            llm.cells_used += n_fed
            llm.kv_high = max(llm.kv_high, llm.cells_used)
            n_new += n_fed
            segment_tokens += n_fed

        while not self.break_event.is_set():
            if pending is None:
                b = feed_budget(n_new, segment_tokens)
                if n_new >= limit or b < 0:
                    break
                pending = issue(b)
            # speculate: issue the next scan before fetching this one, but
            # only when both scans are free-running (no cap/limit freeze
            # possible) — edge chunks run sequentially
            b_now = feed_budget(n_new, segment_tokens)
            b_spec = feed_budget(n_new + STEP_SIZE,
                                 segment_tokens + STEP_SIZE)
            spec = None
            gated = (gate_iters[0] < 3
                     and not self._first_window_dispatched.is_set())
            if (not gated and b_now >= STEP_SIZE and b_spec >= STEP_SIZE
                    and llm.cache.size - llm.cells_used - inflight[0]
                    >= STEP_SIZE):
                spec = issue(b_spec)

            packed_np = np.asarray(pending[0])  # ONE fetch: toks+fed
            toks_np, fed_np = packed_np[0], packed_np[1]
            hid_np = (np.asarray(pending[1])
                      if (self.cfg.use_tts and self.tts_ctx is not None)
                      else None)
            n_fed = int(fed_np.sum())
            inflight[0] -= STEP_SIZE
            llm.n_past[0] = llm.n_past.get(0, 0) + n_fed
            llm.cells_used += n_fed
            llm.kv_high = max(llm.kv_high, llm.cells_used)
            n_new += n_fed
            segment_tokens += n_fed
            emitted = False
            for j in range(n_fed):
                t = int(toks_np[j])
                if self.is_valid_tts_token(t):
                    chunk_tokens.append(t)
                    chunk_hiddens.append(
                        hid_np[j] if hid_np is not None
                        else np.zeros(llm.cfg.d_model, np.float32))
                if len(chunk_tokens) >= STEP_SIZE:
                    self._emit_chunk(chunk_tokens, chunk_hiddens, False)
                    del chunk_tokens[:], chunk_hiddens[:]
                    emitted = True
            if gated:
                gate_iters[0] += 1
                if emitted:
                    # the first text chunk is in flight to TTS: hold the
                    # next LLM dispatch until the first Token2Wav window
                    # has entered the device queue (bounded wait — a
                    # short/filtered chunk may never reach 28 codes)
                    self._first_window_dispatched.wait(timeout=0.5)
                    gate_iters[0] = 99
            if n_fed < STEP_SIZE:  # the scan froze: classify the stopper
                # a speculative successor (if any) fed nothing: done_in
                # chained True through it — its cache/pos are no-ops
                if spec is not None:
                    inflight[0] -= STEP_SIZE
                stop_tok = int(toks_np[n_fed])
                n_new += 1
                segment_tokens += 1
                if stop_tok == listen_id:
                    self.llm.key, self.llm.prev_tokens = st["key"], st["prev"]
                    self.text_out.put({"content": "", "is_listen": True,
                                       "stop": True})
                    return n_new, True
                if stop_tok in end_ids or self.is_end_token(stop_tok):
                    self.llm.key, self.llm.prev_tokens = st["key"], st["prev"]
                    return n_new, False
                if (self.cfg.duplex
                        and segment_tokens >= DUPLEX_CHUNK_CAP):
                    st["logits"] = jnp.asarray(
                        self._force_chunk_end(st["logits"]))
                    segment_tokens = 0
                # host intervention / budget stop: re-sync device state
                st["pos"] = jnp.int32(llm.n_past.get(0, 0))
                st["done"] = None
                pending = None
            else:
                pending = spec
        drain(pending)  # break/budget exit: account any in-flight scan
        self.llm.key, self.llm.prev_tokens = st["key"], st["prev"]
        return n_new, False

    def _force_chunk_end(self, last_logits):
        """Force-replace at the duplex cap: eval <|chunk_eos|></unit>,
        return the post-</unit> logits (omni.cpp:9317-9344)."""
        forced = "".join(s for s in ("<|chunk_eos|>", "</unit>")
                         if s in self.special)
        if forced:
            lg = self._eval_text(forced)
            if lg is not None:
                last_logits = lg
        self._register_unit_end()
        return last_logits

    def _emit_chunk(self, tokens: list[int], hiddens: list[np.ndarray],
                    final: bool) -> None:
        text = self.tok.decode(tokens) if (self.tok and tokens) else ""
        if text:
            self.text_out.put({"content": text, "stop": False})
        out = LLMOut(text=text, token_ids=list(tokens),
                     hidden_states=np.stack(hiddens) if hiddens else
                     np.zeros((0, self.llm.cfg.d_model), np.float32),
                     end_of_turn=final, is_final=final)
        if self.cfg.use_tts and self.tts_ctx is not None:
            self.tts_queue.put(out)  # blocks at depth 1 = back-pressure

    # ------------------------------------------------------------------ TTS
    def _tts_worker(self) -> None:
        """LLMOut chunks -> audio codes (tts_thread_func, omni.cpp:6093)."""
        first_chunk = True
        while not self.session_stop.is_set():
            try:
                out: LLMOut = self.tts_queue.get(timeout=0.01)
            except queue.Empty:
                continue
            if self.break_event.is_set():
                first_chunk = True
                continue
            # codes stream to T2W BETWEEN 25-step scan dispatches (emit
            # callback), so the first 1 s window starts vocoding while the
            # TTS decoder is still generating — the reference's per-token
            # streaming cadence at scan granularity
            self._tts_active = True
            try:
                self._tts_generate(out, first_chunk,
                                   emit=self.t2w_queue.put)
            finally:
                self._tts_active = False
            first_chunk = out.is_final  # reset at end of turn
            if out.is_final:
                self.t2w_queue.put(None)  # turn-end sentinel

    def _tts_generate(self, out: LLMOut, first_chunk: bool,
                      emit=None) -> list[int]:
        if not out.token_ids and not out.is_final:
            return []
        ex = self.tts_extras
        cond = tts_mod.build_condition(
            ex,
            jnp.asarray(np.asarray(out.token_ids, np.int32))
            if out.token_ids else jnp.zeros((0,), jnp.int32),
            jnp.asarray(out.hidden_states, jnp.float32),
            end_of_turn=out.end_of_turn,
            # chunk 0: speaker embedding prepended (voice clone,
            # omni.cpp:5041 / Python TTSStreamingGenerator)
            spk_embed=jnp.asarray(self.spk_embed)
            if (first_chunk and self.spk_embed is not None) else None,
        )
        if first_chunk:
            # clear KV and save the condition; the saved layout
            # [spk, cond..., (text_eos), audio_bos] is what the reference
            # re-forwards for the first audio token (omni.cpp:2504-2518) —
            # prefilling it into the fresh KV once IS that re-forward
            # (the reference's double-prefill rebuilds the identical KV)
            self.tts_ctx.clear_kv()
            self._tts_condition = cond  # lazy device array (fetch on use)
        _, hidden = self.tts_ctx.decode(Batch(embeds=cond),
                                        return_hidden=True, block=False)
        cap = DUPLEX_CHUNK_CAP if self.cfg.duplex else SIMPLEX_AUDIO_CAP
        # fused on-device generation (head_code logits, nucleus sampling
        # with the repetition ring, decoder step; ~1.7 ms/audio token at
        # full size vs the reference's 8.5, docs/PERF.md) in T2W_MAIN-step
        # scan dispatches, SOFTWARE-PIPELINED like the LLM loop: the next
        # scan issues (its done_in chains the eos flag, so a finished
        # generation makes it a no-op) before the current codes are
        # fetched — the ~35 ms fetch round-trip overlaps decoder compute,
        # and codes still stream to Token2Wav between scans (§A.3 cadence)
        ctx = self.tts_ctx
        all_codes: list[int] = []
        st = {"h": jnp.asarray(hidden[-1]), "prev": None, "done": None,
              "pos": jnp.int32(ctx.n_past.get(0, 0))}
        force = bool(self.cfg.duplex and not out.is_final)
        first_scan = [True]

        def issue(n_steps):
            self._tts_key, sub = jax.random.split(self._tts_key)
            codes_d, _nv, ctx.cache, _, st["h"], st["prev"], st["pos"], \
                st["done"] = tts_mod.tts_decode_scan(
                    ctx.params, ctx.cfg, ex, ctx.cache, st["h"], st["pos"],
                    sub, n_steps=n_steps,
                    first_chunk=first_chunk and first_scan[0],
                    force_no_eos=force, prev0=st["prev"],
                    done_in=st["done"])
            first_scan[0] = False
            return codes_d, n_steps

        n0 = min(T2W_MAIN, int(cap))
        pending = issue(n0)
        inflight = n0
        issued_total = n0
        while pending is not None and not self.break_event.is_set():
            spec = None
            nxt = min(T2W_MAIN, int(cap) - issued_total)
            # transfers complete IN ORDER behind queued compute on the
            # tunnel: speculation during the turn's FIRST chunk queues
            # device work ahead of Token2Wav's first-window dispatches and
            # inflates TTFT — the throughput win only matters for the long
            # later chunks
            can_spec = not first_chunk
            if can_spec and nxt > 0 and (ctx.cache.size - ctx.cells_used
                                         - inflight) >= nxt:
                spec = issue(nxt)
                inflight += nxt
                issued_total += nxt
            codes_np = np.asarray(pending[0])  # ONE fetch; n_valid derived
            n_valid = int((codes_np >= 0).sum())
            inflight -= pending[1]
            ctx.n_past[0] = ctx.n_past.get(0, 0) + n_valid
            ctx.cells_used += n_valid  # scan KV writes bypass Context.decode
            codes = codes_np[:n_valid].tolist()
            all_codes.extend(codes)
            if emit is not None:
                for c in codes:
                    emit(c)
            if n_valid < pending[1]:  # audio_eos: a spec scan is a no-op
                break
            if spec is None:
                # speculation was skipped (first fetch / headroom): issue
                # the continuation now if budget remains
                nxt2 = min(T2W_MAIN, int(cap) - issued_total)
                if nxt2 > 0:
                    if first_chunk:
                        # the first 25 codes are already streaming to
                        # Token2Wav (3-silence primer + 25 = one full
                        # window): hold this dispatch until that window
                        # completes so it can't queue ahead of it
                        self._first_window_dispatched.wait(timeout=0.4)
                    pending = issue(nxt2)
                    inflight += nxt2
                    issued_total += nxt2
                else:
                    pending = None
            else:
                pending = spec
        return all_codes

    # ------------------------------------------------------------------ T2W
    def _t2w_worker(self) -> None:
        """25+3 sliding window (t2w_thread_func_cpp, omni.cpp:8284)."""
        while not self.session_stop.is_set():
            try:
                item = self.t2w_queue.get(timeout=0.01)
            except queue.Empty:
                continue
            final = item is None
            self._t2w_active = True
            if not final:
                self._t2w_buffer.append(int(item))
            while len(self._t2w_buffer) >= T2W_MAIN + T2W_LOOKAHEAD or (
                    final and len(self._t2w_buffer) > 3):
                window = self._t2w_buffer[: T2W_MAIN + T2W_LOOKAHEAD]
                last = final and len(self._t2w_buffer) <= T2W_MAIN + T2W_LOOKAHEAD
                if self.t2w is not None:
                    wave = self.t2w.feed_window(np.asarray(window, np.int32),
                                                is_final=last)
                    # unblock the LLM/TTS scans only now: feed_window
                    # makes SEVERAL host-gapped dispatches (conformer,
                    # 5 CFM steps, vocoder) and a ~100 ms LLM scan
                    # slipping into any gap lands ahead of the next one
                    # on the in-order tunnel (round-5 measurement: the
                    # 402-vs-554 ms TTFT bimodality)
                    self._first_window_dispatched.set()
                    self.wav_out.put(wave)
                    self._write_wav_file(wave, final=last)
                consume = min(T2W_MAIN, len(self._t2w_buffer))
                del self._t2w_buffer[:consume]
                if last:
                    self._t2w_buffer = [SILENCE_TOKEN] * 3
                    break
            self._t2w_active = False

    def _write_wav_file(self, wave, final: bool) -> None:
        """Out-of-band audio files (reference t2w thread + omni-cli
        generation_done.flag contract)."""
        if not self.cfg.output_dir:
            return
        import os

        from .audio import write_wav

        d = os.path.join(self.cfg.output_dir,
                         f"round_{self.current_round:03d}", "tts_wav")
        os.makedirs(d, exist_ok=True)
        write_wav(os.path.join(d, f"wav_{self._wav_index}.wav"),
                  np.asarray(wave, np.float32), rate=24000)
        self._wav_index += 1
        if final:
            flag = os.path.join(self.cfg.output_dir,
                                f"round_{self.current_round:03d}",
                                "generation_done.flag")
            open(flag, "w").close()

    # ----------------------------------------------------------- lifecycle
    def _start_workers(self) -> None:
        if self._workers_started:
            return
        self._workers_started = True
        for fn in (self._llm_prefill_worker, self._tts_worker, self._t2w_worker):
            t = threading.Thread(target=fn, daemon=True)
            t.start()
            self._threads.append(t)

    def warm_decode(self) -> None:
        """Pre-compile the fused decode scan at every ragged-KV bucket the
        session can reach, via no-op scans (done_in=True feeds nothing, so
        the KV is semantically untouched). A mid-session bucket crossing
        otherwise pays a fresh XLA compile (~10-30 s) inside the hot loop;
        the server calls this right after omni_init, the bench after its
        warm turn."""
        from ..runtime.loop import omni_decode_scan

        llm = self.llm
        if not getattr(llm, "_fwd_takes_kv_limit", False):
            return
        kvbs = {llm.kv_bucket(b) for b in llm.kv_buckets} | {None}
        for kvb in sorted((b for b in kvbs if b is not None)) + [None]:
            # a turn's FIRST scan passes done_in=None (static structure) and
            # later ones a chained bool array — two distinct jit signatures,
            # both must be compiled to keep the hot loop compile-free
            for done in (None, jnp.bool_(True)):
                with self.llama_mtx:
                    _, _, _, llm.cache, _, _, _, _ = omni_decode_scan(
                        llm._forward, llm._embed, llm.cfg, llm.params,
                        llm.cache, jnp.zeros(llm.cfg.n_vocab, jnp.float32),
                        jnp.int32(0), jnp.int32(0), llm.key,
                        llm.prev_tokens, n_steps=STEP_SIZE, sp=llm.sampler,
                        end_ids=self._end_ids(),
                        listen_id=self.special.get("<|listen|>", -3),
                        stop_after=jnp.int32(0), done_in=done,
                        kv_limit=kvb)

    def stop_speak(self) -> None:
        """Break: stop generation + drain downstream queues (omni.cpp:9548)."""
        self.break_event.set()
        for q in (self.tts_queue, self.t2w_queue, self.text_out):
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass

    def clean_kvcache(self) -> None:
        self.llm.clear_kv()
        if self.tts_ctx:
            self.tts_ctx.clear_kv()
        self.n_keep = 0
        self.rounds.clear()
        self.units.clear()  # sliding_window_reset (omni.cpp:3107)
        self._tts_condition = None  # tts_condition_saved=false on reset

    def shutdown(self) -> None:
        self.session_stop.set()
        for t in self._threads:
            t.join(timeout=1.0)

    # ------------------------------------------------------- sliding window
    def _slide_window_if_needed(self) -> None:
        """Round-granular eviction (kv_cache_slide_window, omni.cpp:686-820):
        drop oldest full rounds, never touch n_keep, re-base positions."""
        n_past = self.llm.n_past.get(0, 0)
        if n_past <= self.cfg.max_preserved_context:
            return
        while self.rounds and n_past > self.cfg.max_preserved_context:
            r = self.rounds[0]
            if r.start_pos < self.n_keep:
                break
            drop = r.end_pos - r.start_pos
            self.llm.seq_rm(0, r.start_pos, r.end_pos)
            self.llm.seq_add(0, r.end_pos, -1, -drop)
            self.rounds.pop(0)
            for rb in self.rounds:
                rb.start_pos -= drop
                rb.end_pos -= drop
            n_past -= drop
        self.llm.n_past[0] = n_past

    # ---------------------------------------- unit-granular window (duplex)
    # Reference #39 (tools/omni/omni.cpp:3107-3405): register <unit>
    # boundaries, enforce high/low water marks by dropping whole units, keep
    # the system prompt (n_keep) inviolable, re-base RoPE positions.
    def _register_unit_start(self) -> None:
        pos = self.llm.n_past.get(0, 0)
        if self.units and not self.units[-1].closed:
            self.units[-1].end_pos = pos  # implicit close at next unit
        self.units.append(UnitEntry(start_pos=pos))

    def _register_unit_end(self) -> None:
        if self.units and not self.units[-1].closed:
            self.units[-1].end_pos = self.llm.n_past.get(0, 0)

    def _enforce_unit_window(self) -> None:
        n_past = self.llm.n_past.get(0, 0)
        if n_past <= self.cfg.high_water:
            return
        while self.units and n_past > self.cfg.low_water:
            u = self.units[0]
            if not u.closed or u.start_pos < self.n_keep:
                break
            drop = u.end_pos - u.start_pos
            if drop <= 0:
                self.units.pop(0)
                continue
            self.llm.seq_rm(0, u.start_pos, u.end_pos)
            self.llm.seq_add(0, u.end_pos, -1, -drop)
            self.units.pop(0)
            for uu in self.units:
                uu.start_pos -= drop
                if uu.closed:
                    uu.end_pos -= drop
            for rb in self.rounds:
                rb.start_pos = max(rb.start_pos - drop, self.n_keep)
                rb.end_pos = max(rb.end_pos - drop, self.n_keep)
            n_past -= drop
        self.llm.n_past[0] = n_past

    # ------------------------------------------------------------ checkpoint
    def session_state_bytes(self) -> bytes:
        """Serialize the whole omni session: LLM KV + positions + window
        registries (the reference's session IS its KV cache, SURVEY §5
        checkpoint/resume; this adds the persistence it lacks)."""
        import io
        import pickle

        meta = {
            "n_keep": self.n_keep,
            "rounds": [(r.start_pos, r.end_pos) for r in self.rounds],
            "units": [(u.start_pos, u.end_pos) for u in self.units],
            "current_round": self.current_round,
            "cfg": dataclasses.asdict(self.cfg),
        }
        buf = io.BytesIO()
        pickle.dump({"meta": meta, "llm": self.llm.state_bytes()}, buf)
        return buf.getvalue()

    def load_session_state_bytes(self, data: bytes) -> None:
        import io
        import pickle

        blob = pickle.load(io.BytesIO(data))
        self.llm.load_state_bytes(blob["llm"])
        meta = blob["meta"]
        self.n_keep = meta["n_keep"]
        self.rounds = [RoundBoundary(a, b) for a, b in meta["rounds"]]
        self.units = [UnitEntry(a, b) for a, b in meta["units"]]
        self.current_round = meta["current_round"]
        for k, v in meta["cfg"].items():
            setattr(self.cfg, k, v)
        if self.tts_ctx is not None:
            self.tts_ctx.clear_kv()  # TTS KV is per-chunk, restarts clean
