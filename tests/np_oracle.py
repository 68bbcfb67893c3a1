"""Independent numpy f32 reference for arch-parity tests whose HF
modeling code is not available locally (trust_remote_code archs).

Each helper mirrors one reference graph building block
(/root/reference/src/llama-model.cpp llm_build_*): the test composes
them per that arch's graph and compares the engine's logits against
this oracle. This is a REAL oracle — a second, independent
implementation of the published semantics — not the engine testing
itself."""

import math

import numpy as np


def rms_norm(x, w, eps=1e-6):
    v = x / np.sqrt((x * x).mean(-1, keepdims=True) + eps)
    return v * w


def layer_norm(x, w, b, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    y = (x - mu) / np.sqrt(var + eps)
    return y * w + (0.0 if b is None else b)


def silu(x):
    return x / (1.0 + np.exp(-x))


def gelu(x):
    return 0.5 * x * (1.0 + np.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * x ** 3)))


def rope(x, pos, base=10000.0, neox=True, rot_dim=None, freqs=None,
         scale=1.0):
    """x [T, H, D]; rotate the first rot_dim columns (default all)."""
    t, h, d = x.shape
    r = rot_dim or d
    freqs = (1.0 / base ** (np.arange(0, r, 2) / r)
             if freqs is None else freqs)
    ang = pos[:, None].astype(np.float64) * freqs  # [T, r/2]
    cos = np.cos(ang)[:, None, :] * scale
    sin = np.sin(ang)[:, None, :] * scale
    out = x.astype(np.float64).copy()
    if neox:
        x1 = out[..., : r // 2].copy()
        x2 = out[..., r // 2: r].copy()
        out[..., : r // 2] = x1 * cos - x2 * sin
        out[..., r // 2: r] = x1 * sin + x2 * cos
    else:
        x1, x2 = out[..., 0:r:2].copy(), out[..., 1:r:2].copy()
        out[..., 0:r:2] = x1 * cos - x2 * sin
        out[..., 1:r:2] = x1 * sin + x2 * cos
    return out.astype(np.float32)


def alibi_slopes(n_heads, max_bias=8.0):
    base = 2 ** math.floor(math.log2(n_heads))
    m0 = 2.0 ** (-max_bias / base)
    m1 = 2.0 ** (-max_bias / 2.0 / base)
    return np.array([m0 ** (i + 1) if i < base
                     else m1 ** (2 * (i - base) + 1)
                     for i in range(n_heads)], np.float32)


def attention(q, k, v, scale=None, causal=True, alibi_bias=None,
              pos=None, swa_window=0):
    """q [T,H,D], k/v [T,KV,D] (GQA repeat applied here).
    alibi_bias: per-head slopes -> slope*-|i-j| added to scores."""
    t, h, d = q.shape
    kv = k.shape[1]
    rep = h // kv
    k = np.repeat(k, rep, axis=1)
    v = np.repeat(v, rep, axis=1)
    scale = 1.0 / math.sqrt(d) if scale is None else scale
    scores = np.einsum("thd,shd->hts", q, k).astype(np.float64) * scale
    idx = np.arange(t) if pos is None else pos
    if alibi_bias is not None:
        dist = -np.abs(idx[:, None] - idx[None, :])
        scores = scores + alibi_bias[:, None, None] * dist
    if causal:
        mask = idx[None, :] > idx[:, None]
        scores = np.where(mask[None], -np.inf, scores)
    if swa_window:
        mask = idx[None, :] <= idx[:, None] - swa_window
        scores = np.where(mask[None], -np.inf, scores)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("hts,shd->thd", p, v).astype(np.float32)


def moe(x, router_w, gate_e, up_e, down_e, k, norm_w=True, scale_w=1.0,
        act=silu, router_x=None, gating="softmax"):
    """Routed expert mix: x [T,D]; gate_e/up_e [E,F,D]; down_e [E,D,F].
    router_x overrides the router input (smallthinker routes on the
    layer input)."""
    logits = (x if router_x is None else router_x) @ router_w.T  # [T,E]
    if gating == "sigmoid":
        probs = 1.0 / (1.0 + np.exp(-logits))
    else:
        m = logits.max(-1, keepdims=True)
        probs = np.exp(logits - m)
        probs = probs / probs.sum(-1, keepdims=True)
    top = np.argsort(-probs, axis=-1)[:, :k]  # [T,k]
    w = np.take_along_axis(probs, top, axis=-1)
    if norm_w:
        w = w / w.sum(-1, keepdims=True)
    w = w * scale_w
    out = np.zeros_like(x)
    for ti in range(x.shape[0]):
        for j in range(k):
            e = top[ti, j]
            h = act(x[ti] @ gate_e[e].T) * (x[ti] @ up_e[e].T)
            out[ti] += w[ti, j] * (h @ down_e[e].T)
    return out


def swiglu_ffn(x, w_gate, w_up, w_down, act=silu,
               b_gate=None, b_up=None, b_down=None):
    g = x @ w_gate.T + (0.0 if b_gate is None else b_gate)
    u = x @ w_up.T + (0.0 if b_up is None else b_up)
    y = act(g) * u @ w_down.T
    return y + (0.0 if b_down is None else b_down)


def ungated_ffn(x, w_up, w_down, act=gelu, b_up=None, b_down=None):
    u = x @ w_up.T + (0.0 if b_up is None else b_up)
    y = act(u) @ w_down.T
    return y + (0.0 if b_down is None else b_down)
