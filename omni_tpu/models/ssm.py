"""Mamba-style selective state-space mixer (recurrent-memory model family).

Counterpart of the reference's Mamba support (llm_build_mamba in
src/llama-model.cpp + llama_memory_recurrent): a causal conv1d window plus
a selective SSM (S6) recurrence h' = exp(dt*A) h + dt*B x, y = C h + D x.
TPU-first shapes: chunked prefill is ONE lax.scan over time (compiler-
friendly sequential recurrence), single-token decode updates the
RecurrentCache state in place. Both paths share the same step function, so
prefill-then-decode equals all-decode exactly.

Tensor naming follows llama.cpp's Mamba GGUF export (blk.N.ssm_in, ssm_out,
ssm_x? -> we use: ssm_in [2*d_inner, d], ssm_conv1d [d_inner, d_conv],
ssm_dt [d_inner, dt_rank], ssm_a [d_inner, d_state], ssm_d [d_inner],
ssm_x [dt_rank + 2*d_state, d_inner], ssm_out [d, d_inner]).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..kernels.norms import rms_norm
from ..runtime.recurrent import RecurrentCache


@dataclasses.dataclass(frozen=True)
class SSMConfig:
    n_layers: int
    d_model: int
    d_inner: int
    d_conv: int = 4
    d_state: int = 16
    dt_rank: int = 8
    n_vocab: int = 256
    rms_eps: float = 1e-6
    # --- Mamba2 (SSD, llm_build_mamba2_layer) ---
    variant: str = "mamba"  # "mamba2": scalar-per-head A, grouped B/C
    n_group: int = 1        # ssm.group_count
    # mamba2 heads = ssm.time_step_rank (dt is one scalar per head)

    @property
    def n_head(self) -> int:
        return self.dt_rank

    @property
    def head_dim(self) -> int:
        return self.d_inner // self.dt_rank

    @property
    def conv_channels(self) -> int:
        """Channels through the causal conv: mamba2 convolves x|B|C."""
        if self.variant == "mamba2":
            return self.d_inner + 2 * self.n_group * self.d_state
        return self.d_inner

    @staticmethod
    def from_gguf(kv: dict[str, Any]) -> "SSMConfig":
        arch = kv.get("general.architecture", "mamba")
        g = lambda key, default: kv.get(f"{arch}.{key}", default)
        d = int(g("embedding_length", 256))
        return SSMConfig(
            n_layers=int(g("block_count", 2)),
            d_model=d,
            d_inner=int(g("ssm.inner_size", 2 * d)),
            d_conv=int(g("ssm.conv_kernel", 4)),
            d_state=int(g("ssm.state_size", 16)),
            dt_rank=int(g("ssm.time_step_rank", max(d // 16, 1))),
            n_vocab=int(g("vocab_size", 256)),
            rms_eps=float(g("attention.layer_norm_rms_epsilon", 1e-6)),
            variant="mamba2" if arch == "mamba2" else "mamba",
            n_group=int(g("ssm.group_count", 1)),
        )


def _ssm_step(lp: dict, cfg: SSMConfig, x_t: jax.Array,
              conv_state: jax.Array, ssm_state: jax.Array):
    """One timestep of one layer. x_t [d_model]; conv_state
    [d_conv-1, d_inner]; ssm_state [d_inner, d_state]."""
    xz = lp["ssm_in"] @ x_t  # [2*d_inner]
    xi, z = jnp.split(xz, 2)

    # causal conv1d over the rolling window
    window = jnp.concatenate([conv_state, xi[None, :]], axis=0)  # [d_conv, di]
    conv = jnp.sum(window * lp["ssm_conv1d"].T, axis=0) + lp["ssm_conv1d_b"]
    xi = jax.nn.silu(conv)
    new_conv_state = window[1:]

    # input-dependent (selective) dt, B, C
    dbc = lp["ssm_x"] @ xi  # [dt_rank + 2*d_state]
    dtr = dbc[: cfg.dt_rank]
    b = dbc[cfg.dt_rank: cfg.dt_rank + cfg.d_state]
    c = dbc[cfg.dt_rank + cfg.d_state:]
    if lp.get("dt_norm") is not None:
        # Jamba / FalconMamba RMS-normalize dt, B, C before the dt
        # projection (llama-model.cpp:11760-11765 build_mamba_layer)
        def _rn(v, w):
            return v * jax.lax.rsqrt(jnp.mean(v * v) + 1e-6) * w

        dtr = _rn(dtr, lp["dt_norm"])
        b = _rn(b, lp["b_norm"])
        c = _rn(c, lp["c_norm"])
    dt = jax.nn.softplus(lp["ssm_dt"] @ dtr + lp["ssm_dt_b"])

    a = -jnp.exp(lp["ssm_a"])  # [d_inner, d_state], negative for stability
    da = jnp.exp(dt[:, None] * a)  # [d_inner, d_state]
    db = dt[:, None] * b[None, :]  # [d_inner, d_state]
    new_ssm_state = da * ssm_state + db * xi[:, None]
    y = new_ssm_state @ c + lp["ssm_d"] * xi  # [d_inner]
    y = y * jax.nn.silu(z)
    return lp["ssm_out"] @ y, new_conv_state, new_ssm_state


def _ssm2_step(lp: dict, cfg: SSMConfig, x_t: jax.Array,
               conv_state: jax.Array, ssm_state: jax.Array):
    """One Mamba2 (SSD) timestep (build_mamba2_layer,
    llama-model.cpp:11812): fused in_proj -> [z | xBC | dt]; the causal
    conv covers x AND the grouped B/C; A is a scalar per head; the state
    update is an outer product dt·x ⊗ B per head. x_t [d_model];
    conv_state [d_conv-1, d_inner + 2GS]; ssm_state [d_inner, d_state]."""
    h_, g_, s_ = cfg.n_head, cfg.n_group, cfg.d_state
    p_ = cfg.head_dim
    di = cfg.d_inner
    zxbcdt = lp["ssm_in"] @ x_t  # [2*di + 2*G*S + H]
    z = zxbcdt[:di]
    xbc = zxbcdt[di: 2 * di + 2 * g_ * s_]
    dt = zxbcdt[2 * di + 2 * g_ * s_:]

    window = jnp.concatenate([conv_state, xbc[None, :]], axis=0)
    conv = jnp.sum(window * lp["ssm_conv1d"].T, axis=0) + lp["ssm_conv1d_b"]
    xbc = jax.nn.silu(conv)
    new_conv_state = window[1:]

    x = xbc[:di].reshape(h_, p_)
    b = xbc[di: di + g_ * s_].reshape(g_, s_)
    c = xbc[di + g_ * s_:].reshape(g_, s_)
    dt = jax.nn.softplus(dt + lp["ssm_dt_b"])  # [H]
    a = -jnp.exp(lp["ssm_a"])  # [H]
    da = jnp.exp(dt * a)  # [H]
    # heads h use group h // (H/G)
    rep = h_ // g_
    b_h = jnp.repeat(b, rep, axis=0)  # [H, S]
    c_h = jnp.repeat(c, rep, axis=0)
    st = ssm_state.reshape(h_, p_, s_)
    st = da[:, None, None] * st + (dt[:, None] * x)[..., None] * b_h[:, None, :]
    y = jnp.einsum("hps,hs->hp", st, c_h) + lp["ssm_d"][:, None] * x  # [H,P]
    y = y.reshape(di)
    y = y * jax.nn.silu(z)
    if lp.get("ssm_norm") is not None:
        # grouped RMS norm over d_inner/G elements per group
        yg = y.reshape(g_, di // g_)
        yg = yg * jax.lax.rsqrt(
            jnp.mean(yg * yg, axis=-1, keepdims=True) + cfg.rms_eps)
        y = (yg * lp["ssm_norm"].reshape(g_, di // g_)).reshape(di)
    return lp["ssm_out"] @ y, new_conv_state, st.reshape(di, s_)


def forward(params: dict, cfg: SSMConfig, tokens: jax.Array,
            cache: RecurrentCache, seq_id) -> tuple[jax.Array, RecurrentCache]:
    """Sequential forward over [T] tokens for one sequence: logits [T, V]
    and the updated cache. T=1 is decode; T>1 is chunked prefill — one
    lax.scan, same step function."""
    x = params["token_embd"][tokens].astype(jnp.float32)  # [T, d]

    new_convs, new_ssms = [], []
    h = x
    for li, lp in enumerate(params["layers"]):
        conv0, ssm0 = cache.read(li, seq_id)

        step_fn = _ssm2_step if cfg.variant == "mamba2" else _ssm_step

        def step(carry, h_t, lp=lp, step_fn=step_fn):
            conv_s, ssm_s = carry
            y, conv_s, ssm_s = step_fn(lp, cfg, h_t, conv_s, ssm_s)
            return (conv_s, ssm_s), y

        hn = jax.vmap(lambda v: rms_norm(v[None], lp["norm"], cfg.rms_eps)[0])(h)
        (conv1, ssm1), y = jax.lax.scan(step, (conv0, ssm0), hn)
        h = h + y
        new_convs.append(conv1)
        new_ssms.append(ssm1)

    for li in range(cfg.n_layers):
        cache = cache.write(li, seq_id, new_convs[li], new_ssms[li])
    cache = cache.advance(seq_id, tokens.shape[0])

    hidden = rms_norm(h, params["output_norm"], cfg.rms_eps)
    head = params.get("output", params["token_embd"])
    logits = hidden @ head.T.astype(hidden.dtype)
    return logits, cache


def make_cache(cfg: SSMConfig, n_seqs: int = 1) -> RecurrentCache:
    """State cache sized for the variant (mamba2's conv covers x|B|C)."""
    return RecurrentCache.create(cfg.n_layers, n_seqs, cfg.d_conv,
                                 cfg.d_inner, cfg.d_state,
                                 conv_channels=cfg.conv_channels)


def load_params(reader) -> dict:
    """GGUF arch "mamba" -> the forward() parameter pytree (tensor names
    from the reference converter, convert_hf_to_gguf.py MambaModel)."""
    from ..kernels import load_quantized

    def get(name, required=True):
        if name not in reader.tensors:
            if required:
                raise KeyError(f"missing tensor {name}")
            return None
        ti = reader.tensors[name]
        # the recurrence runs in f32 (VPU-bound, numerically sensitive)
        return jnp.asarray(load_quantized(ti.data, ti.ggml_type, ti.shape,
                                          False, dtype=jnp.float32),
                           jnp.float32)

    params = {
        "token_embd": get("token_embd.weight"),
        "output_norm": get("output_norm.weight"),
        "layers": [],
    }
    out = get("output.weight", required=False)
    if out is not None:
        params["output"] = out
    i = 0
    while f"blk.{i}.ssm_in.weight" in reader.tensors:
        p = f"blk.{i}."
        mamba2 = f"{p}ssm_x.weight" not in reader.tensors
        params["layers"].append({
            "norm": get(p + "attn_norm.weight"),
            "ssm_in": get(p + "ssm_in.weight"),
            "ssm_conv1d": get(p + "ssm_conv1d.weight"),
            "ssm_conv1d_b": get(p + "ssm_conv1d.bias"),
            # mamba2 folds dt into ssm_in (one scalar per head) and has
            # no x_proj/dt_proj; only the dt bias remains
            "ssm_x": get(p + "ssm_x.weight", required=not mamba2),
            "ssm_dt": get(p + "ssm_dt.weight", required=not mamba2),
            "ssm_dt_b": get(p + "ssm_dt.bias"),
            "ssm_a": get(p + "ssm_a"),
            "ssm_d": get(p + "ssm_d"),
            "ssm_norm": get(p + "ssm_norm.weight", required=False),
            "ssm_out": get(p + "ssm_out.weight"),
        })
        i += 1
    return params


def init_params(cfg: SSMConfig, seed: int = 0) -> dict:
    """Random small-init parameter pytree (for tests/examples; GGUF-loaded
    Mamba checkpoints use the same tensor names)."""
    rng = jax.random.PRNGKey(seed)
    ks = iter(jax.random.split(rng, 4 + 10 * cfg.n_layers))

    def w(*shape, scale=0.05):
        return jax.random.normal(next(ks), shape, jnp.float32) * scale

    params = {
        "token_embd": w(cfg.n_vocab, cfg.d_model, scale=0.02),
        "output_norm": jnp.ones(cfg.d_model),
        "layers": [],
    }
    for _ in range(cfg.n_layers):
        params["layers"].append({
            "norm": jnp.ones(cfg.d_model),
            "ssm_in": w(2 * cfg.d_inner, cfg.d_model),
            "ssm_conv1d": w(cfg.d_inner, cfg.d_conv),
            "ssm_conv1d_b": jnp.zeros(cfg.d_inner),
            "ssm_x": w(cfg.dt_rank + 2 * cfg.d_state, cfg.d_inner),
            "ssm_dt": w(cfg.d_inner, cfg.dt_rank),
            "ssm_dt_b": jnp.zeros(cfg.d_inner) + 0.5,
            "ssm_a": w(cfg.d_inner, cfg.d_state, scale=0.1),
            "ssm_d": jnp.ones(cfg.d_inner),
            "ssm_out": w(cfg.d_model, cfg.d_inner),
        })
    return params
