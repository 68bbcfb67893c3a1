"""omni-warmup — pre-compile the serving executables into the persistent cache.

Cold-start shipping (the reference loads and serves in seconds via mmap,
src/llama-model-loader.cpp; on TPU the equivalent cost is XLA compilation of
the decode/prefill/scan executables, 40-95 s each on the compile service).
This CLI compiles every executable a serving session reaches — prefill
buckets, the fused omni decode scan at every ragged-KV bucket, and the warm
prefill/decode steps — so that:

- run before a server accepts traffic, the first request is served warm;
- run once with `--seed` on the target TPU generation, the resulting cache
  entries are written into `omni_tpu/_warmcache/` and SHIP WITH THE PACKAGE:
  the first process in a completely fresh environment starts warm
  (omni_tpu.__init__ picks the shipped directory up automatically).

With no --model, warms the flagship synthetic 8B Q4_K configuration —
exactly the executables bench.py and the omni server compile.
"""

from __future__ import annotations

import os
import sys
import time


def _log(msg: str) -> None:
    print(f"[warmup {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr)


class _Tok:
    """Byte tokenizer stand-in for synthetic warmups (no EOG tokens)."""

    class _V:
        token_to_id: dict = {}
        eos_id = None

        @staticmethod
        def is_eog(tid):
            return False

    vocab = _V()

    def encode(self, text, add_special=False, parse_special=True):
        return [b % 1000 for b in text.encode()]

    def decode(self, ids):
        return "".join(chr(97 + int(i) % 26) for i in ids)


def warm_llm_session(llm, tokenizer, *, n_ctx: int, n_prefill: int = 64,
                     decode_tokens: int = 32) -> None:
    """Compile the full serving set for one LLM Context: session prefill,
    the fused omni decode scan (first + chained signatures, every KV
    bucket), and the plain prefill-continuation step."""
    import queue

    import numpy as np

    from ..omni.pipeline import OmniPipeline, SessionConfig
    from ..runtime import Batch

    pipe = OmniPipeline(
        llm=llm, tokenizer=tokenizer,
        config=SessionConfig(duplex=False, use_tts=False,
                             max_preserved_context=n_ctx))
    rng = np.random.default_rng(0)
    prompt = "".join(chr(65 + int(c) % 26)
                     for c in rng.integers(0, 26, n_prefill))
    t0 = time.perf_counter()
    pipe.stream_prefill(index=0, system_prompt=prompt)
    _log(f"prefill buckets: {time.perf_counter() - t0:.1f} s")

    t0 = time.perf_counter()
    pipe.stream_decode(round_idx=0, max_new_tokens=decode_tokens)
    while True:
        try:
            pipe.text_out.get_nowait()
        except queue.Empty:
            break
    _log(f"decode scan: {time.perf_counter() - t0:.1f} s")

    t0 = time.perf_counter()
    pipe.warm_decode()
    _log(f"kv-bucket scans: {time.perf_counter() - t0:.1f} s")

    cont = np.asarray(rng.integers(0, 1000, n_prefill), np.int32)
    t0 = time.perf_counter()
    llm.decode(Batch(tokens=cont))
    _log(f"continuation prefill: {time.perf_counter() - t0:.1f} s")
    llm.clear_kv()  # leave no warmup tokens behind (server reuses the ctx)


def main(argv=None):
    from .args import EnvArgumentParser

    ap = EnvArgumentParser("omni-warmup")
    ap.add_argument("-m", "--model", default=None,
                    help="LLM GGUF to warm (default: flagship synthetic "
                         "8B Q4_K — the bench/server shapes)")
    ap.add_argument("-c", "--ctx-size", type=int, default=2048)
    ap.add_argument("--n-prefill", type=int, default=64)
    ap.add_argument("--seed", action="store_true",
                    help="write cache entries into the package's "
                         "_warmcache/ directory (ships with the package)")
    ap.add_argument("--cache-dir", default=None,
                    help="explicit compilation-cache directory")
    args = ap.parse_args(argv)

    cache_dir = args.cache_dir
    if args.seed and cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "_warmcache")
    if cache_dir is not None:
        # must win over the auto-selected directory: set before jax init
        os.environ["OMNI_COMPILE_CACHE"] = cache_dir
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # an explicit dir means "persist this warmup": no time threshold
        # (tiny-model compiles on CPU land under the default 0.1 s)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        try:
            # the cache object initializes ONCE per process; in a process
            # that already compiled something the dir update is otherwise
            # silently ignored
            from jax._src import compilation_cache as _cc

            _cc.reset_cache()
        except Exception:  # noqa: BLE001 — jax-internal API
            pass

    import jax

    from ..models import qwen3
    from ..runtime import Context, SamplerParams

    t_all = time.perf_counter()
    if args.model:
        from ..core import GGUFReader
        from ..tokenizer import build_tokenizer

        reader = GGUFReader(args.model)
        cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
        params = qwen3.load_params(reader)
        tokenizer = build_tokenizer(reader.kv)
    else:
        from ..testing_synth import QWEN3_8B, synth_qwen3_params

        cfg = QWEN3_8B
        _log("building synthetic 8B params...")
        params = synth_qwen3_params(cfg, fuse=True)
        tokenizer = _Tok()
    jax.block_until_ready(params["layers"][-1]["w_down"].q
                          if not args.model else params["token_embd"])
    llm = Context(cfg, params, qwen3.forward, qwen3.embed,
                  n_ctx=args.ctx_size, sampler=SamplerParams(greedy=True))
    warm_llm_session(llm, tokenizer, n_ctx=args.ctx_size,
                     n_prefill=args.n_prefill)
    _log(f"total: {time.perf_counter() - t_all:.1f} s; cache dir: "
         f"{jax.config.jax_compilation_cache_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
