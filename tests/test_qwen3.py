"""End-to-end LLM runtime tests on a tiny random Qwen3 GGUF.

Covers the llama_decode contract (SURVEY.md §3.4/§A.6): batch-vs-
incremental logit consistency, hidden-state tap, embedding injection,
sequence isolation, and state save/load."""

import numpy as np
import pytest

import jax.numpy as jnp

from omni_tpu.core import GGMLType, GGUFReader
from omni_tpu.models import qwen3
from omni_tpu.runtime import Batch, Context, SamplerParams
from omni_tpu.testing import write_tiny_qwen3


@pytest.fixture(scope="module")
def ctx_factory(tmp_path_factory):
    path = tmp_path_factory.mktemp("m") / "tiny_qwen3.gguf"
    write_tiny_qwen3(path, qtype=GGMLType.Q4_K, d_model=256, d_ff=256,
                     n_heads=4, n_kv_heads=2, head_dim=32, tied_head=False)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader)

    def make(n_ctx=128, **kw):
        return Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=n_ctx, **kw)

    return make


def test_config_and_load(ctx_factory):
    ctx = ctx_factory()
    assert ctx.cfg.n_layers == 2
    assert ctx.cfg.n_vocab == 256
    assert ctx.cfg.rope_base == 1000000.0


def test_batch_vs_incremental_consistency(ctx_factory):
    """Decoding token-by-token must produce the same final logits as one
    batched prefill (same KV contents, same mask semantics)."""
    toks = np.array([5, 17, 99, 3, 42, 7], np.int32)

    ctx_a = ctx_factory()
    logits_a, _ = ctx_a.decode(Batch(tokens=toks))

    ctx_b = ctx_factory()
    outs = []
    for i, t in enumerate(toks):
        lg, _ = ctx_b.decode(Batch(tokens=np.array([t], np.int32),
                                   pos=np.array([i], np.int32)))
        outs.append(np.asarray(lg[0]))

    # bf16 matmul tiling differs between bucket sizes; compare loosely plus
    # exact greedy agreement below
    np.testing.assert_allclose(np.asarray(logits_a[-1]), outs[-1],
                               rtol=7e-2, atol=7e-2)
    # greedy argmax must agree exactly at every position
    np.testing.assert_array_equal(
        np.argmax(np.asarray(logits_a), -1),
        np.argmax(np.stack(outs), -1),
    )


def test_hidden_state_tap(ctx_factory):
    ctx = ctx_factory()
    logits, hidden = ctx.decode(Batch(tokens=np.array([1, 2, 3], np.int32)),
                                return_hidden=True)
    assert hidden.shape == (3, ctx.cfg.d_model)
    assert logits.shape == (3, ctx.cfg.n_vocab)
    assert np.isfinite(np.asarray(hidden)).all()


def test_embedding_injection_matches_token_path(ctx_factory):
    """Feeding embed(token) as raw embeddings == feeding the token id
    (the encoder-output injection path)."""
    toks = np.array([9, 12, 50], np.int32)
    ctx_a = ctx_factory()
    la, _ = ctx_a.decode(Batch(tokens=toks))

    ctx_b = ctx_factory()
    emb = np.asarray(qwen3.embed(ctx_b.params, jnp.asarray(toks)), np.float32)
    lb, _ = ctx_b.decode(Batch(embeds=emb))
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=2e-2, atol=2e-2)


def test_sequence_isolation(ctx_factory):
    """Two interleaved sequences must not contaminate each other."""
    ctx = ctx_factory()
    solo = ctx_factory()
    a = np.array([10, 20, 30], np.int32)
    b = np.array([7, 7, 7], np.int32)
    mixed_tokens = np.array([10, 7, 20, 7, 30, 7], np.int32)
    mixed_pos = np.array([0, 0, 1, 1, 2, 2], np.int32)
    mixed_seq = np.array([0, 1, 0, 1, 0, 1], np.int32)
    lm, _ = ctx.decode(Batch(tokens=mixed_tokens, pos=mixed_pos, seq_id=mixed_seq))
    ls, _ = solo.decode(Batch(tokens=a))
    np.testing.assert_allclose(np.asarray(lm[4]), np.asarray(ls[2]),
                               rtol=2e-2, atol=2e-2)


def test_seq_rm_then_regenerate(ctx_factory):
    """seq_rm of a suffix then re-decode reproduces the fresh result."""
    ctx = ctx_factory()
    toks = np.array([5, 6, 7, 8], np.int32)
    l_full, _ = ctx.decode(Batch(tokens=toks))
    ctx.seq_rm(0, 2, -1)  # drop pos 2,3
    ctx.n_past[0] = 2
    l_redo, _ = ctx.decode(Batch(tokens=toks[2:], pos=np.array([2, 3], np.int32)))
    np.testing.assert_allclose(np.asarray(l_full[2:]), np.asarray(l_redo),
                               rtol=2e-2, atol=2e-2)


def test_state_save_load(ctx_factory):
    ctx = ctx_factory()
    ctx.decode(Batch(tokens=np.array([1, 2, 3, 4], np.int32)))
    blob = ctx.state_bytes()

    ctx2 = ctx_factory()
    ctx2.load_state_bytes(blob)
    l_a, _ = ctx.decode(Batch(tokens=np.array([5], np.int32)))
    l_b, _ = ctx2.decode(Batch(tokens=np.array([5], np.int32)))
    np.testing.assert_allclose(np.asarray(l_a), np.asarray(l_b), rtol=1e-5, atol=1e-5)


def test_generate_greedy_deterministic(ctx_factory):
    ctx = ctx_factory(sampler=SamplerParams(greedy=True))
    out1 = ctx.generate(np.array([3, 1, 4], np.int32), max_new=8)
    ctx2 = ctx_factory(sampler=SamplerParams(greedy=True))
    out2 = ctx2.generate(np.array([3, 1, 4], np.int32), max_new=8)
    assert out1 == out2
    assert len(out1) == 8


def test_int4_kv_decode_close_to_bf16(ctx_factory):
    """End-to-end decode with the packed-int4 KV cache (q4_0 analog,
    reference -ctk q4_0): logits must stay close to the bf16-KV run —
    4-bit KV noise dilutes through softmax, it must not corrupt."""
    toks = np.array([5, 17, 99, 3, 42, 7], np.int32)
    ref, _ = ctx_factory().decode(Batch(tokens=toks))
    got, _ = ctx_factory(kv_dtype="q4_0").decode(Batch(tokens=toks))
    a = np.asarray(ref[-1], np.float32)
    b = np.asarray(got[-1], np.float32)
    assert np.isfinite(b).all()
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9)
    # random weights make 4-bit KV noise worst-case (no learned structure);
    # measured 0.976 on this fixture, trained models sit far higher
    assert cos > 0.95, cos
    # incremental decode (pool reads through read_layer) also works
    ctx = ctx_factory(kv_dtype="q4_0")
    for i, t in enumerate(toks[:3]):
        lg, _ = ctx.decode(Batch(tokens=np.array([t], np.int32),
                                 pos=np.array([i], np.int32)))
        assert np.isfinite(np.asarray(lg)).all()


def test_fused_qkv_gateup_matches_unfused(tmp_path):
    """fuse=True (one kernel for QKV, one for gate+up) must reproduce the
    unfused forward exactly at F32."""
    from omni_tpu.runtime import Batch, Context, SamplerParams

    path = tmp_path / "fused.gguf"
    write_tiny_qwen3(path, qtype=GGMLType.F32, d_model=128, d_ff=192,
                     n_heads=4, n_kv_heads=2, head_dim=32, tied_head=False)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    toks = np.array([5, 17, 99, 3], np.int32)

    def run(fuse):
        ctx = Context(cfg, qwen3.load_params(reader, fuse=fuse),
                      qwen3.forward, qwen3.embed, n_ctx=32,
                      sampler=SamplerParams(greedy=True))
        logits, _ = ctx.decode(Batch(tokens=toks))
        return np.asarray(logits)

    a, b = run(False), run(True)
    np.testing.assert_allclose(b, a, rtol=5e-2, atol=5e-2)
    np.testing.assert_array_equal(b.argmax(-1), a.argmax(-1))


def test_fused_quantized_runs(tmp_path):
    from omni_tpu.runtime import Batch, Context

    path = tmp_path / "fusedq.gguf"
    write_tiny_qwen3(path, qtype=GGMLType.Q4_K, d_model=256, d_ff=256,
                     n_heads=4, n_kv_heads=2, head_dim=64, tied_head=False)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    ctx = Context(cfg, qwen3.load_params(reader, fuse=True), qwen3.forward,
                  qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=np.array([1, 2, 3], np.int32)))
    assert np.isfinite(np.asarray(logits)).all()


def test_qwen3_logits_match_transformers(tmp_path):
    """Gold parity vs HF eager Qwen3ForCausalLM (independent implementation):
    NeoX rope needs NO q/k permute, per-head q/k RMS norms included."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm

    torch.manual_seed(0)
    hcfg = Qwen3Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=128, rope_theta=10000.0,
        attn_implementation="eager", tie_word_embeddings=True,
    )
    model = Qwen3ForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "q3.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="qwen3")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    assert cfg.rope_neox is True
    params = qwen3.load_params(reader)

    toks = np.array([3, 11, 7, 29, 13, 5, 41, 2], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()

    ctx = Context(cfg, params, qwen3.forward, qwen3.embed, n_ctx=32)
    logits, _ = ctx.decode(Batch(tokens=toks))
    ours = np.asarray(logits)
    np.testing.assert_allclose(ours, ref, atol=0.02)
    for i in range(len(toks)):
        top2 = np.sort(ref[i])[-2:]
        if top2[1] - top2[0] > 0.02:
            assert np.argmax(ours[i]) == np.argmax(ref[i]), i


def test_qwen2_logits_match_transformers(tmp_path):
    """Qwen-2/2.5 family: attention projection BIASES (no q/k norm) — gold
    parity vs HF eager Qwen2ForCausalLM, both unfused and fused (bqkv)
    parameter layouts."""
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from omni_tpu.convert.hf_to_gguf import convert_llm

    torch.manual_seed(0)
    hcfg = Qwen2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        attn_implementation="eager", tie_word_embeddings=True)
    model = Qwen2ForCausalLM(hcfg).eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    path = tmp_path / "q2.gguf"
    convert_llm(sd, hcfg.to_dict(), path, arch="qwen2")

    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    params = qwen3.load_params(reader)
    assert params["layers"][0]["bq"] is not None

    toks = np.array([3, 11, 7, 29, 13, 5, 41, 2], np.int32)
    with torch.no_grad():
        ref = model(torch.tensor(toks[None].astype(np.int64))).logits[0].numpy()

    for fuse in (False, True):
        p = qwen3.load_params(reader, fuse=fuse)
        ctx = Context(cfg, p, qwen3.forward, qwen3.embed, n_ctx=32)
        logits, _ = ctx.decode(Batch(tokens=toks))
        ours = np.asarray(logits)
        np.testing.assert_allclose(ours, ref, atol=0.02)
        for i in range(len(toks)):
            top2 = np.sort(ref[i])[-2:]
            if top2[1] - top2[0] > 0.02:
                assert np.argmax(ours[i]) == np.argmax(ref[i]), (fuse, i)
