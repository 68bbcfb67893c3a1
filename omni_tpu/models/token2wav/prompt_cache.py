"""Token2Wav prompt-cache import/export (reference-voice priming).

The reference ships the default voice as packed streaming-cache tensors in
`prompt_cache.gguf` v2 (exported by Token2Mel, token2wav-impl.cpp:8119-8169;
loaded by start_stream_with_prompt_cache_gguf, :8182 →
init_from_host_caches, :7591). Tensor inventory and layouts (verified
against the reference source; element order follows its host buffers,
B = 1 throughout):

- `prompt_cache.spk_cb`              — speaker x-vector, [B, 192]
  (spk_ne check at token2wav-impl.cpp:7939).
- `prompt_cache.conformer_att_cache` — upsample-conformer attention
  history, `att_cache_lbhte` layout [L, B, H, T, 2*Dh] (k | v on the last
  axis; token2wav-impl.h:956). L packs the 6 stage-1 encoders THEN the 4
  up-rate encoders (build_forward_chunk_graph packs along the layer dim,
  stage-1 first); T is the up-rate length — stage-1 layers hold their
  history in the first T/2 rows (`offset1 = att_cache->ne[1] / 2`).
- `prompt_cache.conformer_cnn_cache` — conv left-context tails,
  `cnn_cache_bct` [B, C, Tc] with Tc = 2 (pre-lookahead conv2 tail)
  + up-conv tail (ueCnnCacheSpec, token2wav-impl.h:947-950).
- `prompt_cache.estimator_att_cache` — DiT K/V history per
  (timestep, block): [2B, steps*depth*H, Tc, 2*Dh]
  (fm_cfm_view_att_cache_packed slot math, token2wav-impl.cpp:509-526).
- `prompt_cache.estimator_cnn_cache` — DiT causal-conv tails per
  (timestep, block): [2B, steps*depth, k-1, 2*hidden] (conv1 | conv2 on
  the last axis; fm_cfm_view_cnn_cache_packed, :528-541).
- KV: `mtmd.prompt_cache.{version,n_timesteps,temperature,pre_lookahead,
  chunk_main,chunk_total,up_rate}`.

Import maps these onto this framework's ConformerState / CFMState; export
writes the current states back in the same layout (so a session primed by
replay can persist its voice). Round-tripping is exact (unit-tested); a
real reference file additionally needs only its n_timesteps to match.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax.numpy as jnp

from . import conformer as conf
from . import dit as ditm


class PromptCacheError(ValueError):
    """Raised when a prompt_cache.gguf carries neither cache tensors nor
    prompt tokens — priming must fail loudly, never silently no-op."""


def has_cache_tensors(reader) -> bool:
    return "prompt_cache.conformer_att_cache" in reader.tensors


def _get(reader, name):
    from ...core import quants

    ti = reader.tensors[name]
    return np.asarray(quants.dequantize(ti.data, ti.ggml_type, ti.shape),
                      np.float32)


def import_states(reader, enc_cfg: conf.ConformerConfig,
                  dit_cfg: ditm.DiTConfig, n_timesteps: int
                  ) -> tuple[np.ndarray, conf.ConformerState, ditm.CFMState]:
    """prompt_cache.gguf (v2 packed tensors) -> (spk[192], ConformerState,
    CFMState). Shapes adapt to the configured state capacity (histories
    longer than Tmax keep the most recent rows)."""
    kv_steps = reader.kv.get("mtmd.prompt_cache.n_timesteps")
    if kv_steps is not None and int(kv_steps) != n_timesteps:
        raise PromptCacheError(
            f"prompt cache was exported with n_timesteps={int(kv_steps)}, "
            f"session uses {n_timesteps}")

    spk = _get(reader, "prompt_cache.spk_cb").reshape(-1, 192)[0]

    # ---- conformer -------------------------------------------------------
    att = _get(reader, "prompt_cache.conformer_att_cache")
    att = att.reshape(-1, enc_cfg.n_heads, att.shape[-2], att.shape[-1])
    n_l1, n_l2 = enc_cfg.n_blocks, enc_cfg.n_up_blocks
    if att.shape[0] != n_l1 + n_l2:
        raise PromptCacheError(
            f"conformer att cache has {att.shape[0]} layers, model has "
            f"{n_l1}+{n_l2}")
    dh = enc_cfg.head_dim
    t2 = att.shape[2]
    t1 = t2 // 2
    state = conf.ConformerState.create(enc_cfg)
    n1 = min(t1, state.k1.shape[1])
    n2 = min(t2, state.k2.shape[1])

    def kv_split(a, t_keep):  # [H, T, 2D] -> (k, v) [T, H, D], last t_keep
        a = np.transpose(a[:, -t_keep:] if t_keep else a[:, :0], (1, 0, 2))
        return a[..., :dh], a[..., dh:]

    k1 = np.zeros_like(np.asarray(state.k1))
    v1 = np.zeros_like(k1)
    for li in range(n_l1):
        k, v = kv_split(att[li][:, :t1], n1)
        k1[li, :n1], v1[li, :n1] = k, v
    k2 = np.zeros_like(np.asarray(state.k2))
    v2 = np.zeros_like(k2)
    for lj in range(n_l2):
        k, v = kv_split(att[n_l1 + lj], n2)
        k2[lj, :n2], v2[lj, :n2] = k, v

    cnn = _get(reader, "prompt_cache.conformer_cnn_cache")
    cnn = cnn.reshape(-1, cnn.shape[-1])  # [C, Tc] (B=1)
    pre_t = 2  # uePreLookaheadLayer::cache_t (token2wav-impl.h:948)
    prelook_tail = cnn[:, :pre_t].T  # [2, d]
    up_tail_src = cnn[:, pre_t:].T  # [Tc-2, d]
    up_tail = np.zeros_like(np.asarray(state.up_tail))
    n_up = min(len(up_tail_src), len(up_tail))
    if n_up:
        up_tail[-n_up:] = up_tail_src[-n_up:]

    enc_state = dataclasses.replace(
        state,
        k1=jnp.asarray(k1), v1=jnp.asarray(v1), n1=jnp.int32(n1),
        k2=jnp.asarray(k2), v2=jnp.asarray(v2), n2=jnp.int32(n2),
        prelook_tail=jnp.asarray(prelook_tail, jnp.float32),
        up_tail=jnp.asarray(up_tail, jnp.float32),
    )

    # ---- estimator (DiT/CFM) --------------------------------------------
    eatt = _get(reader, "prompt_cache.estimator_att_cache")
    steps, depth, h, dhd = (n_timesteps, dit_cfg.depth, dit_cfg.num_heads,
                            dit_cfg.head_dim)
    tc = eatt.shape[-2]
    eatt = eatt.reshape(2, steps, depth, h, tc, 2 * dhd)
    cfm = ditm.CFMState.create(dit_cfg, n_timesteps)
    tkeep = min(tc, cfm.k.shape[3])
    # [2B, s, d, H, T, 2D] -> [s, d, 2, T, H, D]
    ek = np.transpose(eatt[..., -tkeep:, :dhd], (1, 2, 0, 4, 3, 5))
    ev = np.transpose(eatt[..., -tkeep:, dhd:], (1, 2, 0, 4, 3, 5))
    k = np.zeros(cfm.k.shape, np.float32)
    v = np.zeros_like(k)
    k[:, :, :, :tkeep] = ek
    v[:, :, :, :tkeep] = ev

    ecnn = _get(reader, "prompt_cache.estimator_cnn_cache")
    pad = ecnn.shape[-2]
    ecnn = ecnn.reshape(2, steps, depth, pad, 2 * dit_cfg.hidden)
    # [2B, s, d, pad, 2C] -> conv1/conv2 [s, d, 2, pad, C]
    c1 = np.transpose(ecnn[..., :dit_cfg.hidden], (1, 2, 0, 3, 4))
    c2 = np.transpose(ecnn[..., dit_cfg.hidden:], (1, 2, 0, 3, 4))
    if pad != dit_cfg.conv_kernel - 1:
        raise PromptCacheError(
            f"estimator cnn cache pad {pad} != conv_kernel-1 "
            f"({dit_cfg.conv_kernel - 1})")

    cfm_state = ditm.CFMState(
        k=jnp.asarray(k, cfm.k.dtype), v=jnp.asarray(v, cfm.v.dtype),
        conv1=jnp.asarray(c1, cfm.conv1.dtype),
        conv2=jnp.asarray(c2, cfm.conv2.dtype),
        n=jnp.int32(tkeep),
    )
    return spk, enc_state, cfm_state


def export_states(path, spk: np.ndarray, enc_state: conf.ConformerState,
                  cfm_state: ditm.CFMState, enc_cfg: conf.ConformerConfig,
                  dit_cfg: ditm.DiTConfig, n_timesteps: int,
                  temperature: float = 1.0) -> None:
    """Write the current streaming caches as a prompt_cache.gguf (v2
    layout above) — a session primed by replay can persist its voice."""
    from ...core.gguf import GGUFWriter

    w = GGUFWriter(path)
    w.add_kv("mtmd.prompt_cache.version", 2)
    w.add_kv("mtmd.prompt_cache.n_timesteps", n_timesteps)
    w.add_kv("mtmd.prompt_cache.temperature", float(temperature))
    w.add_kv("mtmd.prompt_cache.pre_lookahead", 3)
    w.add_kv("mtmd.prompt_cache.chunk_main", 25)
    w.add_kv("mtmd.prompt_cache.chunk_total", 28)
    w.add_kv("mtmd.prompt_cache.up_rate", enc_cfg.up_stride)
    w.add_tensor("prompt_cache.spk_cb",
                 np.asarray(spk, np.float32).reshape(1, 192))

    n1 = int(enc_state.n1)
    n2 = int(enc_state.n2)
    t2 = max(2 * n1, n2)
    t2 += t2 % 2  # even: stage-1 prefix is t2 // 2
    h, dh = enc_cfg.n_heads, enc_cfg.head_dim
    n_l = enc_cfg.n_blocks + enc_cfg.n_up_blocks
    att = np.zeros((n_l, h, t2, 2 * dh), np.float32)

    def kv_rows(karr, varr, li, n):  # [T, H, D] valid prefix -> [H, n, 2D]
        k = np.transpose(np.asarray(karr[li][:n], np.float32), (1, 0, 2))
        v = np.transpose(np.asarray(varr[li][:n], np.float32), (1, 0, 2))
        return np.concatenate([k, v], axis=-1)

    for li in range(enc_cfg.n_blocks):
        att[li, :, t2 // 2 - n1: t2 // 2] = kv_rows(
            enc_state.k1, enc_state.v1, li, n1)
    for lj in range(enc_cfg.n_up_blocks):
        att[enc_cfg.n_blocks + lj, :, t2 - n2: t2] = kv_rows(
            enc_state.k2, enc_state.v2, lj, n2)
    w.add_tensor("prompt_cache.conformer_att_cache", att)

    pre = np.asarray(enc_state.prelook_tail, np.float32).T  # [d, 2]
    up = np.asarray(enc_state.up_tail, np.float32).T  # [d, Tu]
    w.add_tensor("prompt_cache.conformer_cnn_cache",
                 np.concatenate([pre, up], axis=1))

    n = int(cfm_state.n)
    # [s, d, 2, T, H, D] -> [2, s, d, H, T, 2D]
    ek = np.transpose(np.asarray(cfm_state.k[:, :, :, :n], np.float32),
                      (2, 0, 1, 4, 3, 5))
    ev = np.transpose(np.asarray(cfm_state.v[:, :, :, :n], np.float32),
                      (2, 0, 1, 4, 3, 5))
    w.add_tensor("prompt_cache.estimator_att_cache",
                 np.concatenate([ek, ev], axis=-1).reshape(
                     2, -1, n, 2 * dit_cfg.head_dim))
    c1 = np.transpose(np.asarray(cfm_state.conv1, np.float32),
                      (2, 0, 1, 3, 4))
    c2 = np.transpose(np.asarray(cfm_state.conv2, np.float32),
                      (2, 0, 1, 3, 4))
    w.add_tensor("prompt_cache.estimator_cnn_cache",
                 np.concatenate([c1, c2], axis=-1).reshape(
                     2, -1, dit_cfg.conv_kernel - 1, 2 * dit_cfg.hidden))
    w.write()
