"""Tensor-parallel inference tests on the virtual 8-device CPU mesh
(SURVEY.md §2.8: the row-split capability, TPU-native as GSPMD shardings)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_tpu.core import GGMLType, GGUFReader
from omni_tpu.models import qwen3
from omni_tpu.parallel import make_mesh
from omni_tpu.parallel.infer import shard_context
from omni_tpu.runtime import Batch, Context, SamplerParams
from omni_tpu.testing import write_tiny_qwen3

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs multi-device mesh")


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    path = tmp_path_factory.mktemp("tp") / "m.gguf"
    # heads divisible by tp=4
    write_tiny_qwen3(path, n_layers=2, d_model=128, n_heads=4, n_kv_heads=4,
                     head_dim=32, d_ff=256, n_vocab=256, qtype=GGMLType.Q8_0,
                     tied_head=False)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)

    def make():
        return Context(cfg, qwen3.load_params(reader), qwen3.forward,
                       qwen3.embed, n_ctx=64,
                       sampler=SamplerParams(greedy=True))
    return make


TOKS = np.array([3, 9, 42, 7, 1], np.int32)


def test_tp_decode_matches_single_device(model):
    ref_logits, _ = model().decode(Batch(tokens=TOKS))

    mesh = make_mesh(n_dp=1, n_tp=4, devices=jax.devices()[:4])
    ctx = shard_context(model(), mesh)
    tp_logits, _ = ctx.decode(Batch(tokens=TOKS))

    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(np.asarray(tp_logits).argmax(-1),
                                  np.asarray(ref_logits).argmax(-1))


def test_tp_generation_and_seq_ops(model):
    mesh = make_mesh(n_dp=1, n_tp=4, devices=jax.devices()[:4])
    ctx = shard_context(model(), mesh)
    out = ctx.generate(TOKS, max_new=8)
    assert len(out) == 8

    ref = model().generate(TOKS, max_new=8)
    assert out == ref

    # KV session ops still work on sharded cache
    ctx.seq_rm(0, 3, -1)
    ctx.seq_cp(0, 1)
    ctx.clear_kv()
    assert int(ctx.cache.n_used()) == 0


def test_dp_tp_mesh_decode(model):
    """2x4 (dp, tp) mesh: decode under a 2-axis mesh placement."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(n_dp=2, n_tp=4)
    ctx = shard_context(model(), mesh)
    logits, _ = ctx.decode(Batch(tokens=TOKS))
    assert np.isfinite(np.asarray(logits)).all()


def test_pipeline_parallel_forward(tmp_path):
    """GPipe layer-split pipeline (LLAMA_SPLIT_MODE_LAYER + n_copies
    micro-batching counterpart): 4-stage pipelined forward over the pp
    mesh axis == single-device forward_train."""
    from omni_tpu.parallel.pp import (make_pp_mesh, pp_forward,
                                      shard_pp_params, stack_stage_params)

    path = tmp_path / "pp.gguf"
    write_tiny_qwen3(path, n_layers=4, d_model=64, n_heads=4, n_kv_heads=2,
                     head_dim=16, d_ff=64, n_vocab=128, qtype=GGMLType.F32,
                     tied_head=False)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader, keep_quantized=False)

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 128, (4, 8)), jnp.int32)
    ref = np.asarray(qwen3.forward_train(params, cfg, tokens))

    mesh = make_pp_mesh(4)
    pp_params = shard_pp_params(stack_stage_params(params, 4), mesh)
    got = np.asarray(pp_forward(pp_params, cfg, tokens, mesh, n_micro=2))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
    np.testing.assert_array_equal(got.argmax(-1), ref.argmax(-1))


def test_pipeline_plus_tensor_parallel_forward(tmp_path):
    """PP(2) x TP(4) combined mesh: stage-split layers whose weights are
    themselves megatron-sharded (a composition the reference cannot
    express — LAYER vs ROW split modes are exclusive,
    /root/reference/include/llama.h:190-193)."""
    from omni_tpu.parallel.pp import (make_pp_mesh, pp_forward,
                                      shard_pp_params, stack_stage_params)

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")

    path = tmp_path / "pptp.gguf"
    write_tiny_qwen3(path, n_layers=4, d_model=64, n_heads=4, n_kv_heads=4,
                     head_dim=16, d_ff=128, n_vocab=128, qtype=GGMLType.F32,
                     tied_head=False)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader, keep_quantized=False)

    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(0, 128, (4, 8)), jnp.int32)
    ref = np.asarray(qwen3.forward_train(params, cfg, tokens))

    mesh = make_pp_mesh(2, n_tp=4)
    assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {"pp": 2, "tp": 4}
    pp_params = shard_pp_params(stack_stage_params(params, 2), mesh)
    got = np.asarray(pp_forward(pp_params, cfg, tokens, mesh, n_micro=2))
    np.testing.assert_allclose(got, ref, rtol=5e-2, atol=5e-2)
    # argmax may flip only on near-ties (bf16 psum reordering): wherever it
    # differs, the reference's top-2 logit gap must be inside the noise
    ga, ra = got.argmax(-1), ref.argmax(-1)
    diff = ga != ra
    if diff.any():
        top2 = np.sort(ref, axis=-1)[..., -2:]
        gap = top2[..., 1] - top2[..., 0]
        assert (gap[diff] < 5e-2).all(), gap[diff]


def test_pipelined_decode(tmp_path):
    """Continuous pipelined DECODE (ggml-backend.cpp:700-714 n_copies
    overlap counterpart): G=4 groups stream around a 2-stage pp ring in
    ONE jitted scan — sampled tokens ride the ring back to stage 0 —
    and the greedy tokens match cache-free single-device decoding."""
    from omni_tpu.parallel.pp import (make_pp_mesh, shard_pp_params,
                                      stack_stage_params)
    from omni_tpu.parallel.pp_decode import pp_decode

    path = tmp_path / "ppd.gguf"
    write_tiny_qwen3(path, n_layers=4, d_model=64, n_heads=4, n_kv_heads=2,
                     head_dim=16, d_ff=64, n_vocab=128, qtype=GGMLType.F32,
                     tied_head=False)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader, keep_quantized=False)

    rng = np.random.default_rng(3)
    G, B, T0, N = 4, 2, 6, 5
    toks = rng.integers(0, 128, (G, B, T0))

    # oracle: cache-free greedy continuation per row via forward_train
    ref = np.zeros((G, B, N), np.int64)
    for g in range(G):
        for b in range(B):
            seq = list(toks[g, b])
            for j in range(N):
                lg = np.asarray(qwen3.forward_train(
                    params, cfg, jnp.asarray([seq], jnp.int32)))[0, -1]
                nxt = int(lg.argmax())
                ref[g, b, j] = nxt
                seq.append(nxt)

    mesh = make_pp_mesh(2)
    pp_params = shard_pp_params(stack_stage_params(params, 2), mesh)
    got = np.asarray(pp_decode(pp_params, cfg,
                               jnp.asarray(toks, jnp.int32), mesh, N))
    np.testing.assert_array_equal(got, ref)

    # G < n_stages must be rejected (pipeline would starve)
    import pytest as _pytest
    with _pytest.raises(AssertionError):
        pp_decode(pp_params, cfg, jnp.asarray(toks[:1], jnp.int32), mesh, N)
