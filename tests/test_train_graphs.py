"""forward_train topology coverage (reference ggml-opt trains any graph
it can build — examples/training): beyond the qwen3/llama graph, the
cache-free training forward must match the inference engine on
Gemma-family sandwich-norm graphs and dense-stack MoE graphs, and be
differentiable end to end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from omni_tpu.core import GGUFReader
from omni_tpu.models import qwen3
from omni_tpu.runtime import Batch, Context


def _inference_logits(reader, toks):
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader, keep_quantized=False)
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    return cfg, params, np.asarray(logits)


def test_train_matches_inference_gemma2(tmp_path):
    """Sandwich norms + sqrt(d) embedding scale + gelu + attn/final
    softcaps (T kept inside the sliding window so the SWA mask is
    inactive — forward_train is full-causal)."""
    from test_gemma import _hf_to_gguf, _tiny_gemma2_hf

    model, hcfg = _tiny_gemma2_hf()
    path = tmp_path / "g2.gguf"
    _hf_to_gguf(model, hcfg, path)
    reader = GGUFReader(path)
    toks = np.array([3, 11, 7, 29, 13], np.int32)  # T=5 < window 6
    cfg, params, want = _inference_logits(reader, toks)
    assert cfg.sandwich_norms and cfg.emb_scale != 1.0

    got = np.asarray(qwen3.forward_train(params, cfg, toks[None]))[0]
    np.testing.assert_allclose(got, want, atol=0.03)
    assert np.array_equal(got.argmax(-1), want.argmax(-1))


def test_train_matches_inference_moe(tmp_path):
    from omni_tpu.testing import write_tiny_qwen3moe

    path = tmp_path / "moe.gguf"
    write_tiny_qwen3moe(path)
    reader = GGUFReader(path)
    toks = np.array([5, 2, 17, 9, 30, 4], np.int32)
    cfg, params, want = _inference_logits(reader, toks)
    assert cfg.n_experts > 0

    got = np.asarray(qwen3.forward_train(params, cfg, toks[None]))[0]
    np.testing.assert_allclose(got, want, atol=0.03)
    assert np.array_equal(got.argmax(-1), want.argmax(-1))


@pytest.mark.parametrize("which", ["gemma2", "moe"])
def test_train_loss_differentiable(tmp_path, which):
    """grad(train_loss) is finite and an SGD step reduces the loss on the
    new topologies (the reference's ggml-opt finetune contract)."""
    if which == "gemma2":
        from test_gemma import _hf_to_gguf, _tiny_gemma2_hf

        model, hcfg = _tiny_gemma2_hf()
        path = tmp_path / "g2.gguf"
        _hf_to_gguf(model, hcfg, path)
    else:
        from omni_tpu.testing import write_tiny_qwen3moe

        path = tmp_path / "moe.gguf"
        write_tiny_qwen3moe(path)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader, keep_quantized=False)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.float32) if a is not None else None, params)
    toks = jnp.asarray(
        np.random.default_rng(0).integers(2, 60, (2, 8)), jnp.int32)

    loss_fn = lambda p: qwen3.train_loss(p, cfg, toks)
    l0, grads = jax.value_and_grad(loss_fn)(params)
    leaves = [g for g in jax.tree_util.tree_leaves(grads)]
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)

    lr = 5e-2
    params2 = jax.tree_util.tree_map(
        lambda p, g: p - lr * g if p is not None else None, params, grads)
    l1 = loss_fn(params2)
    assert float(l1) < float(l0)
