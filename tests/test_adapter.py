"""LoRA adapter + control vector tests (reference src/llama-adapter.cpp)."""

import numpy as np
import pytest

import jax.numpy as jnp

from omni_tpu.core import GGMLType, GGUFReader
from omni_tpu.core.gguf import GGUFWriter
from omni_tpu.models import qwen3
from omni_tpu.runtime import Batch, Context, SamplerParams
from omni_tpu.runtime.adapter import (LoraAdapter, apply_control_vector,
                                      apply_lora, load_control_vector,
                                      remove_control_vector, remove_lora)
from omni_tpu.testing import write_tiny_qwen3

D, FF, HEADS, KVH, HD, RANK, ALPHA = 64, 96, 4, 2, 16, 4, 8.0
TOKS = np.array([3, 11, 42, 7], np.int32)


@pytest.fixture(scope="module")
def base(tmp_path_factory):
    d = tmp_path_factory.mktemp("lora")
    mpath = d / "m.gguf"
    write_tiny_qwen3(mpath, qtype=GGMLType.F32, d_model=D, d_ff=FF,
                     n_heads=HEADS, n_kv_heads=KVH, head_dim=HD,
                     tied_head=False)
    reader = GGUFReader(mpath)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    return d, reader, cfg


def _write_lora(path, pairs: dict[str, tuple[np.ndarray, np.ndarray]],
                alpha=ALPHA):
    w = GGUFWriter(path)
    w.add_kv("general.type", "adapter")
    w.add_kv("adapter.type", "lora")
    w.add_kv("adapter.lora.alpha", float(alpha))
    for stem, (a, b) in pairs.items():
        w.add_tensor(f"{stem}.lora_a", a.astype(np.float32))
        w.add_tensor(f"{stem}.lora_b", b.astype(np.float32))
    w.write()


def _logits(cfg, params):
    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32,
                  sampler=SamplerParams(greedy=True))
    logits, _ = ctx.decode(Batch(tokens=TOKS))
    return np.asarray(logits)


def test_zero_lora_is_identity(base):
    d, reader, cfg = base
    rng = np.random.default_rng(0)
    qd = HEADS * HD
    _write_lora(d / "zero.gguf", {
        "blk.0.attn_q.weight": (rng.standard_normal((RANK, D)),
                                np.zeros((qd, RANK))),
    })
    params = qwen3.load_params(reader, keep_quantized=False)
    adapter = LoraAdapter.from_gguf(d / "zero.gguf")
    assert adapter.rank == RANK
    ref = _logits(cfg, params)
    out = _logits(cfg, apply_lora(params, adapter))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_lora_matches_dense_merge_oracle(base):
    """Runtime LoRA == merging scale*alpha/r * B@A into the dense weight."""
    d, reader, cfg = base
    rng = np.random.default_rng(1)
    qd = HEADS * HD
    a = rng.standard_normal((RANK, D)) * 0.05
    b = rng.standard_normal((qd, RANK)) * 0.05
    _write_lora(d / "real.gguf", {"blk.0.attn_q.weight": (a, b)})
    adapter = LoraAdapter.from_gguf(d / "real.gguf")

    params = qwen3.load_params(reader, keep_quantized=False)
    out_runtime = _logits(cfg, apply_lora(params, adapter, scale=1.0))

    merged = {**params, "layers": [dict(l) for l in params["layers"]]}
    eff = ALPHA / RANK
    w = np.asarray(merged["layers"][0]["wq"], np.float32)
    merged["layers"][0]["wq"] = jnp.asarray(
        w + eff * (b.astype(np.float32) @ a.astype(np.float32)), jnp.float32)
    out_merged = _logits(cfg, merged)

    assert not np.allclose(out_runtime, _logits(cfg, params), atol=1e-3)
    np.testing.assert_allclose(out_runtime, out_merged, rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(out_runtime.argmax(-1), out_merged.argmax(-1))


def test_lora_on_quantized_base(base):
    """LoRA wraps QTensor bases too (weights stay quantized in HBM)."""
    d, reader, cfg = base
    rng = np.random.default_rng(2)
    _write_lora(d / "ffn.gguf", {
        "blk.1.ffn_down.weight": (rng.standard_normal((RANK, FF)) * 0.05,
                                  rng.standard_normal((D, RANK)) * 0.05),
    })
    adapter = LoraAdapter.from_gguf(d / "ffn.gguf")
    params_q = qwen3.load_params(reader)  # keep_quantized
    ref = _logits(cfg, params_q)
    out = _logits(cfg, apply_lora(params_q, adapter))
    assert out.shape == ref.shape
    assert not np.allclose(out, ref, atol=1e-4)


def test_remove_lora_restores(base):
    d, reader, cfg = base
    adapter = LoraAdapter.from_gguf(d / "real.gguf")
    params = qwen3.load_params(reader, keep_quantized=False)
    ref = _logits(cfg, params)
    wrapped = apply_lora(params, adapter)
    restored = remove_lora(wrapped)
    np.testing.assert_allclose(_logits(cfg, restored), ref, rtol=1e-6, atol=1e-6)


def test_control_vector(base):
    d, reader, cfg = base
    rng = np.random.default_rng(3)
    w = GGUFWriter(d / "cvec.gguf")
    w.add_kv("general.architecture", "controlvector")
    vec = rng.standard_normal((D,)).astype(np.float32) * 0.5
    w.add_tensor("direction.1", vec)
    w.add_tensor("direction.2", -vec)
    w.write()

    directions = load_control_vector(d / "cvec.gguf")
    assert set(directions) == {1, 2}
    params = qwen3.load_params(reader, keep_quantized=False)
    ref = _logits(cfg, params)

    steered = apply_control_vector(params, directions, strength=1.0)
    out = _logits(cfg, steered)
    assert not np.allclose(out, ref, atol=1e-3)

    # strength 0: same math, but the extra add changes XLA fusion and thus
    # bf16 rounding — compare loosely plus exact greedy agreement
    zero_out = _logits(cfg, apply_control_vector(params, directions, 0.0))
    np.testing.assert_allclose(zero_out, ref, rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(zero_out.argmax(-1), ref.argmax(-1))

    np.testing.assert_allclose(_logits(cfg, remove_control_vector(steered)),
                               ref, rtol=1e-6, atol=1e-6)


def test_convert_lora_from_hf_peft(tmp_path, base):
    """convert_lora_to_gguf counterpart: HF PEFT dir (safetensors +
    adapter_config.json) -> adapter GGUF -> runtime apply, delta-exact."""
    import json
    import struct

    from omni_tpu.convert.lora import convert_lora_to_gguf, read_safetensors

    _, reader, cfg = base
    params = qwen3.load_params(reader)
    rng = np.random.default_rng(7)
    r = 2
    d = cfg.d_model

    def st_write(path, tensors):
        header = {}
        blobs = []
        off = 0
        for name, arr in tensors.items():
            raw = np.ascontiguousarray(arr, np.float32).tobytes()
            header[name] = {"dtype": "F32", "shape": list(arr.shape),
                            "data_offsets": [off, off + len(raw)]}
            blobs.append(raw)
            off += len(raw)
        hj = json.dumps(header).encode()
        with open(path, "wb") as f:
            f.write(struct.pack("<Q", len(hj)))
            f.write(hj)
            for b in blobs:
                f.write(b)

    peft = tmp_path / "peft"
    peft.mkdir()
    a0 = rng.standard_normal((r, d)).astype(np.float32) * 0.1
    b0 = rng.standard_normal((cfg.n_heads * cfg.head_dim, r)).astype(np.float32) * 0.1
    a1 = rng.standard_normal((r, d)).astype(np.float32) * 0.1
    b1 = rng.standard_normal((cfg.d_ff, r)).astype(np.float32) * 0.1
    st_write(peft / "adapter_model.safetensors", {
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight": a0,
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": b0,
        "base_model.model.model.layers.1.mlp.up_proj.lora_A.weight": a1,
        "base_model.model.model.layers.1.mlp.up_proj.lora_B.weight": b1,
    })
    (peft / "adapter_config.json").write_text(json.dumps(
        {"peft_type": "LORA", "r": r, "lora_alpha": 8.0,
         "target_modules": ["q_proj", "up_proj"]}))

    out = tmp_path / "adapter.gguf"
    n = convert_lora_to_gguf(str(peft), str(out))
    assert n == 2

    # round-trip through the minimal safetensors reader too
    rt = read_safetensors(str(peft / "adapter_model.safetensors"))
    np.testing.assert_array_equal(rt[
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight"], a0)

    adapter = LoraAdapter.from_gguf(str(out))
    assert adapter.alpha == 8.0 and adapter.rank == r
    assert set(adapter.pairs) == {"blk.0.attn_q.weight",
                                  "blk.1.ffn_up.weight"}
    np.testing.assert_allclose(np.asarray(adapter.pairs[
        "blk.0.attn_q.weight"][0]), a0, rtol=1e-6)

    # applies at runtime and changes the logits
    ref = _logits(cfg, params)
    got = _logits(cfg, apply_lora(params, adapter))
    assert not np.allclose(np.asarray(ref), np.asarray(got), atol=1e-5)
