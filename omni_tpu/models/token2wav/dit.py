"""Flow-matching estimator: causal DiT + CFM Euler solver.

Contract from the reference (/root/reference/tools/omni/token2wav/
token2wav-impl.{h,cpp}): fmDiT(in=320, out=80, mlp_ratio=4, depth=16,
heads=8, head_dim=64, hidden=512); each block is adaLN-9 modulation
(msa/conv/mlp shift+scale+gate) around attention (per-head LN on q/k),
a causal conv block (conv k → LN(1e-5) → mish → conv k), and a GELU MLP;
final layer = adaLN-2 + LN(no affine) + linear. Timestep embedding:
t*1000 → 256-dim [cos|sin] (max_period 10000) → SiLU MLP → 512.

CFM solver (fmCausalConditionalCFM): classifier-free guidance rate 0.7
(main and cfg branches batched as B_total=2), cosine t-span
t_i = 1 - cos(i/N · π/2), Euler steps x += dt·((1+cfg)·dφ_main - cfg·dφ_cfg),
x0 = temperature · N(0,1) noise. Streaming: per (step, block) attention K/V
and conv-tail caches, trailing window capped at `max_t` frames (reference
default 600 via TOKEN2WAV_FM_MAX_T_CACHE).

Noise source: counter-based PRNG keyed by absolute frame position (the
reference draws from a seeded global mt19937 stream; ours is
position-stable which is equivalent in distribution and recompute-safe).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import functools

import jax
import jax.numpy as jnp
import numpy as np

LN_EPS = 1e-6  # fmDiT kLnEps
CONV_LN_EPS = 1e-5


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    in_channels: int = 320
    out_channels: int = 80
    mlp_ratio: float = 4.0
    depth: int = 16
    num_heads: int = 8
    head_dim: int = 64
    hidden: int = 512
    freq_embed: int = 256
    t_scale: float = 1000.0
    cfg_rate: float = 0.7
    conv_kernel: int = 3  # causal conv block kernel (from weights at load)
    max_t_cache: int = 600


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CFMState:
    """Streaming caches for all (step, block) pairs. B_total = 2 (CFG)."""

    k: jax.Array  # [steps, depth, 2, Tmax, H, D]
    v: jax.Array
    conv1: jax.Array  # [steps, depth, 2, k-1, hidden]
    conv2: jax.Array  # [steps, depth, 2, k-1, hidden]
    n: jax.Array  # [] int32 cached frames

    @staticmethod
    def create(cfg: DiTConfig, n_steps: int, dtype=jnp.bfloat16) -> "CFMState":
        tmax = cfg.max_t_cache
        return CFMState(
            k=jnp.zeros((n_steps, cfg.depth, 2, tmax, cfg.num_heads, cfg.head_dim), dtype),
            v=jnp.zeros((n_steps, cfg.depth, 2, tmax, cfg.num_heads, cfg.head_dim), dtype),
            conv1=jnp.zeros((n_steps, cfg.depth, 2, cfg.conv_kernel - 1, cfg.hidden), dtype),
            conv2=jnp.zeros((n_steps, cfg.depth, 2, cfg.conv_kernel - 1, cfg.hidden), dtype),
            n=jnp.int32(0),
        )


def _lin(x, w, b=None):
    out = jnp.einsum("...d,nd->...n", x, w, preferred_element_type=jnp.float32)
    return out + b if b is not None else out


def _ln(x, w=None, b=None, eps=LN_EPS):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    out = (x - m) * jax.lax.rsqrt(v + eps)
    if w is not None:
        out = out * w
    if b is not None:
        out = out + b
    return out


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def timestep_embedding(t: jax.Array, p: dict, cfg: DiTConfig) -> jax.Array:
    """t [B] -> [B, hidden]: [cos|sin] frequency embedding + SiLU MLP."""
    half = cfg.freq_embed // 2
    freqs = jnp.exp(-np.log(10000.0) * jnp.arange(half) / half)
    args = (t * cfg.t_scale)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    h = jax.nn.silu(_lin(emb, p["t_mlp1_w"], p["t_mlp1_b"]))
    return _lin(h, p["t_mlp2_w"], p["t_mlp2_b"])


def _causal_conv(x: jax.Array, w: jax.Array, b: jax.Array,
                 tail: jax.Array) -> tuple[jax.Array, jax.Array]:
    """x [B, T, C] with explicit left context `tail` [B, k-1, C] ->
    (y [B, T, Cout], new tail). Weight [Cout, Cin, K]."""
    k = w.shape[-1]
    xin = jnp.concatenate([tail.astype(x.dtype), x], axis=1)
    y = jax.lax.conv_general_dilated(
        xin, w, (1,), padding="VALID", dimension_numbers=("NTC", "OIT", "NTC"))
    new_tail = xin[:, xin.shape[1] - (k - 1):, :]
    return y + b, new_tail


def dit_block(
    x: jax.Array,  # [2, T, hidden]
    c: jax.Array,  # [2, hidden] timestep conditioning
    bp: dict,
    cfg: DiTConfig,
    kv_cache: tuple[jax.Array, jax.Array] | None,  # ([2, Tc, H, D], ...)
    n_cached: jax.Array | int,
    conv_tails: tuple[jax.Array, jax.Array],
):
    """One DiT block step over the current chunk with streaming caches.
    Returns (x, new_k_chunk, new_v_chunk, new_conv_tails)."""
    b, t, hdim = x.shape
    h9 = _lin(jax.nn.silu(c), bp["ada_w"], bp["ada_b"])  # [2, 9*hidden]
    ch = h9.reshape(b, 9, hdim)[:, :, None, :]  # broadcast over T

    def modulate(xn, i_shift, i_scale):
        return xn * (1.0 + ch[:, i_scale, 0][:, None, :]) + ch[:, i_shift, 0][:, None, :]

    # --- attention (adaLN msa) ---
    xn = modulate(_ln(x), 0, 1)
    q = _lin(xn, bp["q_w"], bp["q_b"]).reshape(b, t, cfg.num_heads, cfg.head_dim)
    k = _lin(xn, bp["k_w"], bp["k_b"]).reshape(b, t, cfg.num_heads, cfg.head_dim)
    v = _lin(xn, bp["v_w"], bp["v_b"]).reshape(b, t, cfg.num_heads, cfg.head_dim)
    q = _ln(q, bp["qn_w"], bp["qn_b"])
    k = _ln(k, bp["kn_w"], bp["kn_b"])

    if kv_cache is not None:
        kc, vc = kv_cache
        tc = kc.shape[1]
        k_all = jnp.concatenate([kc.astype(k.dtype), k], axis=1)
        v_all = jnp.concatenate([vc.astype(v.dtype), v], axis=1)
        valid = jnp.concatenate([
            jnp.arange(tc) < n_cached, jnp.ones((t,), bool)])
    else:
        k_all, v_all = k, v
        valid = jnp.ones((t,), bool)

    scale = 1.0 / np.sqrt(cfg.head_dim)
    scores = jnp.einsum("bthd,bshd->bhts", q, k_all,
                        preferred_element_type=jnp.float32) * scale
    scores = jnp.where(valid[None, None, None, :], scores, -1e30)
    att = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", att, v_all,
                     preferred_element_type=jnp.float32)
    out = _lin(out.reshape(b, t, hdim), bp["proj_w"], bp["proj_b"])
    x = x + out * ch[:, 2, 0][:, None, :]

    # --- causal conv block (adaLN conv) ---
    xn = modulate(_ln(x), 6, 7)
    t1, t2 = conv_tails
    y, nt1 = _causal_conv(xn, bp["conv1_w"], bp["conv1_b"], t1)
    y = _mish(_ln(y, bp["conv_ln_w"], bp["conv_ln_b"], CONV_LN_EPS))
    y, nt2 = _causal_conv(y, bp["conv2_w"], bp["conv2_b"], t2)
    x = x + y * ch[:, 8, 0][:, None, :]

    # --- MLP (adaLN mlp) ---
    xn = modulate(_ln(x), 3, 4)
    y = _lin(jax.nn.gelu(_lin(xn, bp["fc1_w"], bp["fc1_b"]), approximate=True),
             bp["fc2_w"], bp["fc2_b"])
    x = x + y * ch[:, 5, 0][:, None, :]
    return x, k, v, (nt1, nt2)


def dit_forward_chunk(
    params: dict, cfg: DiTConfig,
    x: jax.Array,  # [2, T, 80] noisy mel (main + cfg copies)
    mu: jax.Array,  # [2, T, 80] (cfg copy zeroed)
    t: jax.Array,  # [2]
    spk: jax.Array,  # [2, 80]
    cond: jax.Array,  # [2, T, 80]
    step_caches,  # dict with k/v [depth, 2, Tmax, H, D], conv tails, or None
    n_cached,
):
    """One estimator evaluation. Returns (dphi [2, T, 80], new per-block
    k/v chunks and conv tails, stacked over depth)."""
    b, t_len, _ = x.shape
    t_embed = timestep_embedding(t, params, cfg)  # [2, hidden]
    spk_t = jnp.broadcast_to(spk[:, None, :], (b, t_len, spk.shape[-1]))
    x_cat = jnp.concatenate([x, mu, spk_t, cond], axis=-1)  # [2, T, 320]
    h = _lin(x_cat, params["in_proj_w"], params["in_proj_b"])

    new_k, new_v, new_t1, new_t2 = [], [], [], []
    for i, bp in enumerate(params["blocks"]):
        if step_caches is not None:
            kv = (step_caches["k"][i], step_caches["v"][i])
            tails = (step_caches["conv1"][i], step_caches["conv2"][i])
        else:
            kv = None
            k1 = cfg.conv_kernel - 1
            tails = (jnp.zeros((b, k1, cfg.hidden), h.dtype),
                     jnp.zeros((b, k1, cfg.hidden), h.dtype))
        h, kc, vc, (t1n, t2n) = dit_block(h, t_embed, bp, cfg, kv, n_cached, tails)
        new_k.append(kc)
        new_v.append(vc)
        new_t1.append(t1n)
        new_t2.append(t2n)

    # final layer: adaLN-2 + LN(no affine) + linear
    h2 = _lin(jax.nn.silu(t_embed), params["final_ada_w"], params["final_ada_b"])
    shift, scale = jnp.split(h2, 2, axis=-1)
    hn = _ln(h) * (1.0 + scale[:, None, :]) + shift[:, None, :]
    y = _lin(hn, params["final_w"], params["final_b"])
    return y, (jnp.stack(new_k), jnp.stack(new_v),
               jnp.stack(new_t1), jnp.stack(new_t2))


def cosine_t_span(n_steps: int) -> np.ndarray:
    u = np.arange(n_steps + 1) / n_steps
    return (1.0 - np.cos(u * 0.5 * np.pi)).astype(np.float32)


def _noise(c: int, t_len: int, start_frame, temperature: float) -> jax.Array:
    """Position-keyed deterministic N(0,1) noise, [1, T, C]."""
    def one(i):
        key = jax.random.fold_in(jax.random.PRNGKey(42), start_frame + i)
        return jax.random.normal(key, (c,), jnp.float32)

    return (jax.vmap(one)(jnp.arange(t_len)) * temperature)[None]


@functools.partial(jax.jit, static_argnames=('cfg', 'n_timesteps'))
def cfm_solve_chunk(
    params: dict, cfg: DiTConfig,
    mu: jax.Array,  # [T, 80] encoder output for this chunk
    spk: jax.Array,  # [80] projected speaker embedding
    state: CFMState,
    n_timesteps: int = 5,
    temperature: float = 1.0,
) -> tuple[jax.Array, CFMState]:
    """CFG Euler solve for one chunk; updates per-step caches."""
    t_len, c = mu.shape
    mu_in = jnp.stack([mu, jnp.zeros_like(mu)])  # [2, T, 80]
    spk_in = jnp.stack([spk, jnp.zeros_like(spk)])
    cond_in = jnp.zeros_like(mu_in)
    x = jnp.concatenate([_noise(c, t_len, state.n, temperature)] * 2, axis=0)

    span = cosine_t_span(n_timesteps)
    new_k, new_v, new_c1, new_c2 = [], [], [], []
    for s in range(n_timesteps):
        t_val = jnp.full((2,), span[s], jnp.float32)
        dt = float(span[s + 1] - span[s])
        step_cache = {
            "k": state.k[s], "v": state.v[s],
            "conv1": state.conv1[s], "conv2": state.conv2[s],
        }
        dphi, (kc, vc, t1, t2) = dit_forward_chunk(
            params, cfg, x, mu_in, t_val, spk_in, cond_in, step_cache, state.n)
        dphi_upd = (1.0 + cfg.cfg_rate) * dphi[0] - cfg.cfg_rate * dphi[1]
        x = x + dt * jnp.stack([dphi_upd, dphi_upd])
        new_k.append(kc)
        new_v.append(vc)
        new_c1.append(t1)
        new_c2.append(t2)

    # roll chunk K/V into the fixed-size trailing-window caches
    kc = jnp.stack(new_k)  # [steps, depth, 2, T, H, D]
    vc = jnp.stack(new_v)
    tmax = cfg.max_t_cache

    def update(cache, chunk):
        # shift left by t_len once full; then write chunk at position n
        n = jnp.minimum(state.n, tmax - t_len)
        shifted = jnp.where(state.n + t_len > tmax,
                            jnp.roll(cache, -t_len, axis=3), cache)
        return jax.lax.dynamic_update_slice_in_dim(
            shifted, chunk.astype(cache.dtype), n, axis=3), n + t_len

    k_new, n_new = update(state.k, kc)
    v_new, _ = update(state.v, vc)
    state = CFMState(
        k=k_new, v=v_new,
        conv1=jnp.stack(new_c1).astype(state.conv1.dtype),
        conv2=jnp.stack(new_c2).astype(state.conv2.dtype),
        n=n_new,
    )
    return x[0], state


def load_dit_params(reader) -> tuple[dict, DiTConfig]:
    """flow_matching GGUF -> params (tensor names per fm_loader_bind_all_weights)."""
    import numpy as np

    from ...core import quants

    def get(name):
        ti = reader.tensors[name]
        return jnp.asarray(quants.dequantize(ti.data, ti.ggml_type, ti.shape))

    params = {
        "in_proj_w": get("estimator.in_proj.weight"),
        "in_proj_b": get("estimator.in_proj.bias"),
        "t_mlp1_w": get("estimator.t_embedder.mlp.0.weight"),
        "t_mlp1_b": get("estimator.t_embedder.mlp.0.bias"),
        "t_mlp2_w": get("estimator.t_embedder.mlp.2.weight"),
        "t_mlp2_b": get("estimator.t_embedder.mlp.2.bias"),
        "final_ada_w": get("estimator.final_layer.adaLN_modulation.1.weight"),
        "final_ada_b": get("estimator.final_layer.adaLN_modulation.1.bias"),
        "final_w": get("estimator.final_layer.linear.weight"),
        "final_b": get("estimator.final_layer.linear.bias"),
        "blocks": [],
    }
    i = 0
    while f"estimator.blocks.{i}.attn.to_q.weight" in reader.tensors:
        p = f"estimator.blocks.{i}."
        params["blocks"].append({
            "ada_w": get(p + "adaLN_modulation.1.weight"),
            "ada_b": get(p + "adaLN_modulation.1.bias"),
            "q_w": get(p + "attn.to_q.weight"), "q_b": get(p + "attn.to_q.bias"),
            "k_w": get(p + "attn.to_k.weight"), "k_b": get(p + "attn.to_k.bias"),
            "v_w": get(p + "attn.to_v.weight"), "v_b": get(p + "attn.to_v.bias"),
            "qn_w": get(p + "attn.q_norm.weight"), "qn_b": get(p + "attn.q_norm.bias"),
            "kn_w": get(p + "attn.k_norm.weight"), "kn_b": get(p + "attn.k_norm.bias"),
            "proj_w": get(p + "attn.proj.weight"), "proj_b": get(p + "attn.proj.bias"),
            "conv1_w": get(p + "conv.block.1.weight"),
            "conv1_b": get(p + "conv.block.1.bias"),
            "conv_ln_w": get(p + "conv.block.3.weight"),
            "conv_ln_b": get(p + "conv.block.3.bias"),
            "conv2_w": get(p + "conv.block.6.weight"),
            "conv2_b": get(p + "conv.block.6.bias"),
            "fc1_w": get(p + "mlp.fc1.weight"), "fc1_b": get(p + "mlp.fc1.bias"),
            "fc2_w": get(p + "mlp.fc2.weight"), "fc2_b": get(p + "mlp.fc2.bias"),
        })
        i += 1
    k = int(params["blocks"][0]["conv1_w"].shape[-1])
    hidden = int(params["in_proj_w"].shape[0])
    in_ch = int(params["in_proj_w"].shape[1])
    out_ch = int(params["final_w"].shape[0])
    # heads/head_dim recoverable from the per-head q_norm weight shape;
    # freq_embed from the t-embedder input width
    head_dim = int(params["blocks"][0]["qn_w"].shape[0])
    cfg = DiTConfig(in_channels=in_ch, out_channels=out_ch, depth=i,
                    hidden=hidden, conv_kernel=k,
                    num_heads=max(hidden // head_dim, 1), head_dim=head_dim,
                    freq_embed=int(params["t_mlp1_w"].shape[1]))
    return params, cfg
