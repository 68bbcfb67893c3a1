"""Profiling: jax.profiler traces + stage timers.

The TPU counterpart of the reference's tracing toolbox (SURVEY.md §5:
llama_perf counters, GGML_SCHED_DEBUG splits, per-stage wall-clock logs):
`trace(dir)` captures a TensorBoard-loadable device trace; `StageTimer`
gives the omni pipeline the per-stage latency lines the reference prints
(prefill/decode/tts/t2w ms per chunk).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

from . import log


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (TensorBoard / Perfetto viewable)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info("profiler trace written to %s", log_dir)


class StageTimer:
    """Accumulates wall-clock per named stage; print like the reference's
    wav_timing / per-stage latency logs."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {name: {"total_ms": self.totals[name] * 1e3,
                       "count": self.counts[name],
                       "avg_ms": self.totals[name] * 1e3 / max(self.counts[name], 1)}
                for name in self.totals}

    def print(self, prefix: str = "stages") -> None:
        for name, s in sorted(self.summary().items()):
            log.info("%s: %-12s %6d calls  avg %.2f ms  total %.1f ms",
                     prefix, name, s["count"], s["avg_ms"], s["total_ms"])
