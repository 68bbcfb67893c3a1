"""Tiny random Token2Wav parameter builders (tests/bench fixtures)."""

import numpy as np
import jax.numpy as jnp

from .models.token2wav import conformer as conf
from .models.token2wav import dit as ditm
from .models.token2wav import hifigan as hg

def r(rng, *shape, s=0.1):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * s)




def tiny_dit(rng, mel=16, hidden=32, depth=2, heads=2):
    cfg = ditm.DiTConfig(in_channels=mel * 4, out_channels=mel, depth=depth,
                         num_heads=heads, head_dim=hidden // heads,
                         hidden=hidden, freq_embed=16, max_t_cache=64,
                         conv_kernel=3)
    p = {
        "in_proj_w": r(rng, hidden, mel * 4), "in_proj_b": r(rng, hidden),
        "t_mlp1_w": r(rng, hidden, 16), "t_mlp1_b": r(rng, hidden),
        "t_mlp2_w": r(rng, hidden, hidden), "t_mlp2_b": r(rng, hidden),
        "final_ada_w": r(rng, 2 * hidden, hidden), "final_ada_b": r(rng, 2 * hidden),
        "final_w": r(rng, mel, hidden), "final_b": r(rng, mel),
        "blocks": [],
    }
    for _ in range(depth):
        p["blocks"].append({
            "ada_w": r(rng, 9 * hidden, hidden), "ada_b": r(rng, 9 * hidden),
            "q_w": r(rng, hidden, hidden), "q_b": r(rng, hidden),
            "k_w": r(rng, hidden, hidden), "k_b": r(rng, hidden),
            "v_w": r(rng, hidden, hidden), "v_b": r(rng, hidden),
            "qn_w": jnp.ones(hidden // heads), "qn_b": jnp.zeros(hidden // heads),
            "kn_w": jnp.ones(hidden // heads), "kn_b": jnp.zeros(hidden // heads),
            "proj_w": r(rng, hidden, hidden), "proj_b": r(rng, hidden),
            "conv1_w": r(rng, hidden, hidden, 3), "conv1_b": r(rng, hidden),
            "conv_ln_w": jnp.ones(hidden), "conv_ln_b": jnp.zeros(hidden),
            "conv2_w": r(rng, hidden, hidden, 3), "conv2_b": r(rng, hidden),
            "fc1_w": r(rng, 2 * hidden, hidden), "fc1_b": r(rng, 2 * hidden),
            "fc2_w": r(rng, hidden, 2 * hidden), "fc2_b": r(rng, hidden),
        })
    return p, cfg


def tiny_conformer(rng, d=32, heads=4, ff=64):
    cfg = conf.ConformerConfig(d_model=d, n_heads=heads, d_ff=ff,
                               n_blocks=2, n_up_blocks=1, max_tokens=128)
    p = {
        "embed_w": r(rng, d, d), "embed_b": r(rng, d),
        "embed_ln_w": jnp.ones(d), "embed_ln_b": jnp.zeros(d),
        "prelook1_w": r(rng, d, d, 4), "prelook1_b": r(rng, d),
        "prelook2_w": r(rng, d, d, 3), "prelook2_b": r(rng, d),
        "up_conv_w": r(rng, d, d, 5), "up_conv_b": r(rng, d),
        "up_embed_w": r(rng, d, d), "up_embed_b": r(rng, d),
        "up_embed_ln_w": jnp.ones(d), "up_embed_ln_b": jnp.zeros(d),
        "after_norm_w": jnp.ones(d), "after_norm_b": jnp.zeros(d),
        "encoders": [], "up_encoders": [],
    }

    def layer():
        return {
            "norm_ff_w": jnp.ones(d), "norm_ff_b": jnp.zeros(d),
            "norm_mha_w": jnp.ones(d), "norm_mha_b": jnp.zeros(d),
            "q_w": r(rng, d, d), "q_b": r(rng, d),
            "k_w": r(rng, d, d), "k_b": r(rng, d),
            "v_w": r(rng, d, d), "v_b": r(rng, d),
            "o_w": r(rng, d, d), "o_b": r(rng, d),
            "pos_w": r(rng, d, d),
            "pos_bias_u": r(rng, heads, d // heads),
            "pos_bias_v": r(rng, heads, d // heads),
            "ff1_w": r(rng, ff, d), "ff1_b": r(rng, ff),
            "ff2_w": r(rng, d, ff), "ff2_b": r(rng, d),
        }

    p["encoders"] = [layer() for _ in range(cfg.n_blocks)]
    p["up_encoders"] = [layer() for _ in range(cfg.n_up_blocks)]
    return p, cfg


def tiny_hifigan(rng, mel=16):
    ch = [16, 8, 4, 2]  # conv_pre out, then after each upsample
    p = {
        "conv_pre_w": r(rng, ch[0], mel, 7), "conv_pre_b": r(rng, ch[0]),
        "conv_post_w": r(rng, 18, ch[3], 7), "conv_post_b": r(rng, 18),
        "f0_lin_w": r(rng, 1, 8), "f0_lin_b": r(rng, 1),
        "nsf_lin_w": r(rng, 1, hg.HARMONICS), "nsf_lin_b": r(rng, 1),
    }
    c = mel
    for i in range(5):
        p[f"f0_conv{i}_w"] = r(rng, 8, c, 3)
        p[f"f0_conv{i}_b"] = r(rng, 8)
        c = 8
    strides = [8, 5, 3]
    up_k = [16, 11, 7]  # HiFT upsample kernels
    for s in range(3):
        p[f"up{s}_w"] = r(rng, ch[s], ch[s + 1], up_k[s])  # [Cin, Cout, K]
        p[f"up{s}_b"] = r(rng, ch[s + 1])
        p[f"sd{s}_w"] = r(rng, ch[s + 1], 18, (29, 5, 1)[s])  # k = 2u-1
        p[f"sd{s}_b"] = r(rng, ch[s + 1])
        _mk_resblock(p, rng, f"s{s}", ch[s + 1], n=1)
    for i in range(9):
        _mk_resblock(p, rng, f"{i}", ch[i // 3 + 1], n=2)
    return p


def _mk_resblock(p, rng, key, c, n):
    p[f"rb{key}_c1"] = [(r(rng, c, c, 3), r(rng, c)) for i in range(n)]
    p[f"rb{key}_c2"] = [(r(rng, c, c, 3), r(rng, c)) for i in range(n)]
    p[f"rb{key}_a1"] = [jnp.ones(c) for _ in range(n)]
    p[f"rb{key}_a2"] = [jnp.ones(c) for _ in range(n)]


