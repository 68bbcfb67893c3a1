"""VPM tests: SigLip encoder + resampler (tiny random weights) and the
LLaVA-UHD slicing algorithm."""

import numpy as np
import pytest

import jax.numpy as jnp

from omni_tpu.models import siglip
from omni_tpu.omni.image import (
    get_slice_instructions,
    normalize,
    preprocess_uhd,
    slice_image,
)


def tiny_cfg():
    return siglip.SigLipConfig(n_layers=2, d_model=32, n_heads=4, d_ff=64,
                               patch_size=14, d_out=256, n_queries=8)


def tiny_params(cfg, seed=0):
    rng = np.random.default_rng(seed)

    def r(*shape, s=0.1):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * s)

    d, do = cfg.d_model, cfg.d_out
    p = {
        "patch_w": r(d, 3, cfg.patch_size, cfg.patch_size),
        "patch_b": r(d),
        "pos": r(cfg.pos_buckets ** 2, d),
        "post_ln_w": jnp.ones(d), "post_ln_b": jnp.zeros(d),
        "pre_ln_w": None, "pre_ln_b": None,
        "rs_query": r(cfg.n_queries, do),
        "rs_kv_proj": r(do, d),
        "rs_q_w": r(do, do), "rs_q_b": r(do),
        "rs_k_w": r(do, do), "rs_k_b": r(do),
        "rs_v_w": r(do, do), "rs_v_b": r(do),
        "rs_o_w": r(do, do), "rs_o_b": r(do),
        "rs_ln_q_w": jnp.ones(do), "rs_ln_q_b": jnp.zeros(do),
        "rs_ln_kv_w": jnp.ones(do), "rs_ln_kv_b": jnp.zeros(do),
        "rs_ln_post_w": jnp.ones(do), "rs_ln_post_b": jnp.zeros(do),
        "rs_proj": r(do, do),
        "layers": [],
    }
    for _ in range(cfg.n_layers):
        p["layers"].append({
            "ln1_w": jnp.ones(d), "ln1_b": jnp.zeros(d),
            "wq": r(d, d), "bq": r(d), "wk": r(d, d), "bk": r(d),
            "wv": r(d, d), "bv": r(d), "wo": r(d, d), "bo": r(d),
            "ln2_w": jnp.ones(d), "ln2_b": jnp.zeros(d),
            "w_up": r(cfg.d_ff, d), "b_up": r(cfg.d_ff),
            "w_down": r(d, cfg.d_ff), "b_down": r(d),
        })
    return p


def test_encode_shapes(rng):
    cfg = tiny_cfg()
    p = tiny_params(cfg)
    img = rng.standard_normal((56, 70, 3)).astype(np.float32)  # 4x5 patches
    out = siglip.encode_image_np(p, cfg, img)
    assert out.shape == (cfg.n_queries, cfg.d_out)
    assert np.isfinite(out).all()


def test_bucket_positions():
    pos = siglip.bucket_positions(2, 3, buckets=70)
    assert pos.shape == (6,)
    assert pos[0] == 0 and pos[1] == 23 and pos[3] == 35 * 70
    assert (pos < 70 * 70).all()


def test_sincos_pos_embed_structure():
    pe = siglip.sincos_pos_embed_2d(64, w=3, h=2)
    assert pe.shape == (6, 64)
    # first half encodes the column: rows with same col index agree
    np.testing.assert_allclose(pe[0, :32], pe[3, :32], atol=1e-7)  # col 0
    np.testing.assert_allclose(pe[1, :32], pe[4, :32], atol=1e-7)  # col 1
    # second half encodes the row
    np.testing.assert_allclose(pe[0, 32:], pe[1, 32:], atol=1e-7)  # row 0
    np.testing.assert_allclose(pe[3, 32:], pe[5, 32:], atol=1e-7)  # row 1
    assert not np.allclose(pe[0, 32:], pe[3, 32:])


def test_slice_instructions_small_image_no_slices():
    inst = get_slice_instructions(300, 200, slice_size=448)
    assert inst.slices == []
    # upscaled to ~448 area, divisible by 14
    assert inst.overview_size[0] % 14 == 0 and inst.overview_size[1] % 14 == 0


def test_slice_instructions_large_image():
    inst = get_slice_instructions(1920, 1080, slice_size=448, max_slice_nums=9)
    gx, gy = inst.grid
    assert len(inst.slices) == gx * gy
    assert 1 < gx * gy <= 9
    rw, rh = inst.refined_size
    assert rw % gx == 0 and rh % gy == 0
    for x, y, w, h in inst.slices:
        assert x + w <= rw and y + h <= rh
        assert w % 14 == 0 and h % 14 == 0


def test_slice_image_and_normalize(rng):
    img = (rng.random((600, 900, 3)) * 255).astype(np.uint8)
    parts = preprocess_uhd(img, mean=[0.5] * 3, std=[0.5] * 3)
    assert len(parts) >= 2  # overview + slices
    for p in parts:
        assert p.dtype == np.float32
        assert p.shape[0] % 14 == 0 and p.shape[1] % 14 == 0
        assert -1.1 <= p.min() and p.max() <= 1.1


def test_high_res_mode_override():
    """max_slice_nums=2 (high-res video mode) limits slice count."""
    inst = get_slice_instructions(1920, 1080, max_slice_nums=2)
    assert len(inst.slices) <= 2
