"""Serving shim for the recurrent / hybrid model families.

The reference serves every architecture through the same llama_decode
loop (tools/server); our unified-KV SlotScheduler only drives the shared
transformer engine, so the state-carrying families (Mamba, RWKV, the
hybrid stacks) get this thin session instead: fresh per-request state,
chunked prefill, host-side sampler chain — enough to serve /completion
and /v1/chat/completions with the standard sampling params. Batched
continuous batching for recurrent state is intentionally out of scope
(one request computes at a time, like the reference's single-slot mode).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .sampler import SamplerParams, sample, update_prev_tokens

# saved cross-turn state: reuse the recurrent state when the next request's
# prompt extends the previous turn's (prompt + generated) token stream — the
# recurrent analog of the reference server's slot prompt-cache common-prefix
# reuse (tools/server/server.cpp cache_tokens). A recurrent state summarizes
# exactly one token prefix, so unlike the KV cache no partial trim is
# possible: either the new prompt extends the saved stream or we start over.

# arch -> (module name, config class, needs_cfg_in_load, cache kv_size)
_FAMILIES = {
    "mamba": ("ssm", "SSMConfig", False, False),
    "mamba2": ("ssm", "SSMConfig", False, False),
    "rwkv6": ("rwkv6", "RWKV6Config", False, False),
    "rwkv6qwen2": ("rwkv6", "RWKV6Config", False, False),
    "rwkv7": ("rwkv7", "RWKV7Config", False, False),
    "arwkv7": ("rwkv7", "RWKV7Config", False, False),
    "jamba": ("jamba", "JambaConfig", True, True),
    "falcon-h1": ("falcon_h1", "FalconH1Config", True, True),
    "granitehybrid": ("granite_hybrid", "GraniteHybridConfig", True, True),
    "lfm2": ("lfm2", "Lfm2Config", True, True),
    "lfm2moe": ("lfm2", "Lfm2Config", True, True),
    "nemotron_h": ("nemotron_h", "NemotronHConfig", True, True),
    "plamo2": ("plamo2", "Plamo2Config", True, True),
}


def is_recurrent_arch(arch: str) -> bool:
    return arch in _FAMILIES


class RecurrentSession:
    """One GGUF-loaded recurrent/hybrid model, servable via generate()."""

    def __init__(self, reader, n_ctx: int = 4096):
        import importlib

        arch = reader.kv.get("general.architecture")
        mod_name, cfg_name, cfg_in_load, kv_sized = _FAMILIES[arch]
        self.mod = importlib.import_module(f"..models.{mod_name}",
                                           __package__)
        self.cfg = getattr(self.mod, cfg_name).from_gguf(reader.kv)
        self.params = (self.mod.load_params(reader, self.cfg)
                       if cfg_in_load else self.mod.load_params(reader))
        self.n_ctx = n_ctx
        self._kv_sized = kv_sized
        self._fwd = jax.jit(self.mod.forward, static_argnums=(1,))
        self.n_vocab = getattr(self.cfg, "n_vocab", 0)
        # (tokens fed so far, state after them, logits of the last one)
        self._saved: tuple[np.ndarray, object, object] | None = None

    def reset(self) -> None:
        """Drop the saved cross-turn state (wired to the server's
        /v1/stream/reset route — the state-carrying analog of the
        reference's session-KV clear, tools/server/server.cpp:5990+)."""
        self._saved = None

    def _fresh_cache(self):
        if self._kv_sized:
            return self.mod.make_cache(self.cfg, self.n_ctx, n_seqs=1)
        return self.mod.make_cache(self.cfg, 1)

    def generate(self, prompt_tokens, max_new: int,
                 sampler: SamplerParams, stop_tokens=(),
                 stream_cb=None, chunk: int = 64):
        """-> (tokens, timings dict). Fresh state per request; prompt
        prefilled in fixed chunks (bucketed compile reuse)."""
        import time

        t0 = time.time()
        toks = np.asarray(prompt_tokens, np.int32)
        cache, start, logits = None, 0, None
        if self._saved is not None:
            stoks, scache, slast = self._saved
            n = len(stoks)
            if (0 < n <= len(toks) and np.array_equal(toks[:n], stoks)
                    and (not self._kv_sized
                         or len(toks) + max_new <= self.n_ctx)):
                cache, start, logits = scache, n, slast
        if cache is None:
            cache, start = self._fresh_cache(), 0
        n_cached = start
        for i in range(start, len(toks), chunk):
            part = toks[i:i + chunk]
            logits, cache = self._fwd(self.params, self.cfg,
                                      jnp.asarray(part), cache, 0)
        prompt_ms = (time.time() - t0) * 1e3

        key = jax.random.PRNGKey(int(sampler.seed or 0))
        prev = jnp.full((64,), -1, jnp.int32)
        mu = (jnp.float32(2.0 * sampler.mirostat_tau)
              if sampler.mirostat else None)
        out = []
        t1 = time.time()
        last = logits[-1]
        for _ in range(max_new):
            key, sub = jax.random.split(key)
            if mu is not None:
                tok, mu = sample(jnp.asarray(last), sub, sampler, prev,
                                 mu=mu)
            else:
                tok = sample(jnp.asarray(last), sub, sampler, prev)
            tok = int(tok)
            if tok in stop_tokens:
                if stream_cb and out:
                    stream_cb(out[-1], True)
                break
            prev = update_prev_tokens(prev, jnp.int32(tok))
            out.append(tok)
            if stream_cb:
                stream_cb(tok, len(out) == max_new)
            logits, cache = self._fwd(self.params, self.cfg,
                                      jnp.asarray([tok], jnp.int32),
                                      cache, 0)
            last = logits[-1]
        # every token in (prompt + out) has been fed through the state;
        # the next turn extends this stream (chat history + reply)
        self._saved = (np.concatenate([toks, np.asarray(out, np.int32)]),
                       cache, logits)
        return out, {"prompt_ms": prompt_ms,
                     "predicted_ms": (time.time() - t1) * 1e3,
                     "n_decoded": len(out),
                     "n_prompt_cached": n_cached}
