"""Leveled, timestamped logging + performance counters.

Counterpart of the reference's common/log.cpp (levels, timestamps, env
control via LLAMA_LOG_*; here OMNI_LOG_LEVEL / OMNI_LOG_TIMESTAMPS) and of
llama_perf_context (include/llama.h:1343-1366: prefill/decode token counts
and wall-clock, printed by every tool).
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

LEVELS = {"debug": 10, "info": 20, "warn": 30, "error": 40, "off": 99}


def _level() -> int:
    return LEVELS.get(os.environ.get("OMNI_LOG_LEVEL", "info").lower(), 20)


def _stamp() -> str:
    if os.environ.get("OMNI_LOG_TIMESTAMPS", "1") == "0":
        return ""
    t = time.time()
    ms = int((t % 1) * 1000)
    return time.strftime("%H:%M:%S", time.localtime(t)) + f".{ms:03d} "


def _log(level: str, msg: str, *args) -> None:
    if LEVELS[level] < _level():
        return
    text = msg % args if args else msg
    print(f"{_stamp()}[{level[0].upper()}] {text}", file=sys.stderr, flush=True)


def debug(msg: str, *args) -> None:
    _log("debug", msg, *args)


def info(msg: str, *args) -> None:
    _log("info", msg, *args)


def warn(msg: str, *args) -> None:
    _log("warn", msg, *args)


def error(msg: str, *args) -> None:
    _log("error", msg, *args)


@dataclasses.dataclass
class PerfCounters:
    """llama_perf_context counterpart; attach one per Context."""

    t_start: float = dataclasses.field(default_factory=time.perf_counter)
    n_p_eval: int = 0  # prompt tokens evaluated (batch > 1)
    n_eval: int = 0  # decode tokens evaluated
    t_p_eval: float = 0.0  # seconds in prefill decodes
    t_eval: float = 0.0  # seconds in single-token decodes
    n_sample: int = 0
    t_sample: float = 0.0

    def record_decode(self, n_tokens: int, dt: float) -> None:
        if n_tokens > 1:
            self.n_p_eval += n_tokens
            self.t_p_eval += dt
        else:
            self.n_eval += n_tokens
            self.t_eval += dt

    def record_sample(self, dt: float) -> None:
        self.n_sample += 1
        self.t_sample += dt

    def reset(self) -> None:
        self.__init__()

    def summary(self) -> dict:
        return {
            "load_ms": None,
            "prompt_tokens": self.n_p_eval,
            "prompt_ms_per_token": 1e3 * self.t_p_eval / max(self.n_p_eval, 1),
            "prompt_tokens_per_s": self.n_p_eval / max(self.t_p_eval, 1e-9),
            "eval_tokens": self.n_eval,
            "eval_ms_per_token": 1e3 * self.t_eval / max(self.n_eval, 1),
            "eval_tokens_per_s": self.n_eval / max(self.t_eval, 1e-9),
            "sample_ms": 1e3 * self.t_sample / max(self.n_sample, 1),
            "total_s": time.perf_counter() - self.t_start,
        }

    def print(self, prefix: str = "perf") -> None:
        s = self.summary()
        info("%s: prompt %d tok (%.2f ms/tok, %.1f tok/s) | "
             "eval %d tok (%.2f ms/tok, %.1f tok/s) | sample %.3f ms/tok",
             prefix, s["prompt_tokens"], s["prompt_ms_per_token"],
             s["prompt_tokens_per_s"], s["eval_tokens"],
             s["eval_ms_per_token"], s["eval_tokens_per_s"], s["sample_ms"])
