"""Test/bench fixtures: tiny random models in real GGUF containers.

Plays the role of the reference's tiny-model fixtures (15M tinyllama etc.,
tests/CMakeLists.txt:188-192) without network access: the models are random
but structurally faithful, so every loader/decode/KV/sampler path runs.
"""

from __future__ import annotations

import numpy as np

from .core import GGMLType, GGUFWriter, quants


def write_tiny_qwen3moe(
    path,
    n_layers: int = 2,
    d_model: int = 64,
    n_heads: int = 4,
    n_kv_heads: int = 2,
    head_dim: int = 16,
    d_ff: int = 64,
    n_vocab: int = 256,
    n_experts: int = 4,
    n_experts_used: int = 2,
    seed: int = 0,
    expert_qtype: GGMLType | None = None,  # quantize the 3-D expert stacks
) -> None:
    """Random qwen3moe-architecture GGUF (reference MoE tensor naming:
    blk.N.ffn_{gate_inp,gate_exps,up_exps,down_exps})."""
    rng = np.random.default_rng(seed)
    arch = "qwen3moe"
    w = GGUFWriter(path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length", d_ff)
    w.add_kv(f"{arch}.attention.head_count", n_heads)
    w.add_kv(f"{arch}.attention.head_count_kv", n_kv_heads)
    w.add_kv(f"{arch}.attention.key_length", head_dim)
    w.add_kv(f"{arch}.attention.value_length", head_dim)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_kv(f"{arch}.rope.freq_base", 1000000.0)
    w.add_kv(f"{arch}.expert_count", n_experts)
    w.add_kv(f"{arch}.expert_used_count", n_experts_used)
    w.add_kv(f"{arch}.vocab_size", n_vocab)
    w.add_kv("tokenizer.ggml.tokens", [f"<t{i}>" for i in range(n_vocab)])

    def t(name, shape, scale=0.08):
        w.add_tensor(name, (rng.standard_normal(shape) * scale).astype(np.float32))

    t("token_embd.weight", (n_vocab, d_model), 0.02)
    w.add_tensor("output_norm.weight", np.ones(d_model, np.float32))
    t("output.weight", (n_vocab, d_model), 0.02)
    qd, kvd = n_heads * head_dim, n_kv_heads * head_dim
    for i in range(n_layers):
        p = f"blk.{i}."
        w.add_tensor(p + "attn_norm.weight", np.ones(d_model, np.float32))
        t(p + "attn_q.weight", (qd, d_model))
        t(p + "attn_k.weight", (kvd, d_model))
        t(p + "attn_v.weight", (kvd, d_model))
        t(p + "attn_output.weight", (d_model, qd))
        w.add_tensor(p + "attn_q_norm.weight", np.ones(head_dim, np.float32))
        w.add_tensor(p + "attn_k_norm.weight", np.ones(head_dim, np.float32))
        w.add_tensor(p + "ffn_norm.weight", np.ones(d_model, np.float32))
        t(p + "ffn_gate_inp.weight", (n_experts, d_model))

        def texp(name, shape):
            x = (rng.standard_normal(shape) * 0.08).astype(np.float32)
            if expert_qtype is not None:
                w.add_tensor(name, quants.quantize(x, expert_qtype),
                             expert_qtype, logical_shape=shape)
            else:
                w.add_tensor(name, x)

        texp(p + "ffn_gate_exps.weight", (n_experts, d_ff, d_model))
        texp(p + "ffn_up_exps.weight", (n_experts, d_ff, d_model))
        texp(p + "ffn_down_exps.weight", (n_experts, d_model, d_ff))
    w.write()


def write_tiny_qwen3(
    path,
    n_layers: int = 2,
    d_model: int = 64,
    n_heads: int = 4,
    n_kv_heads: int = 2,
    head_dim: int = 16,
    d_ff: int = 128,
    n_vocab: int = 256,
    qtype: GGMLType = GGMLType.F16,
    seed: int = 0,
    qk_norm: bool = True,
    tied_head: bool = True,
    byte_tokenizer: bool = False,
    arch: str = "qwen3",
    extra_tensors: dict | None = None,
    extra_kv: dict | None = None,
    sandwich_norms: bool = False,
) -> None:
    """Random Qwen3-architecture GGUF (llama.cpp tensor naming).

    byte_tokenizer=True writes a functional byte-level BPE vocab (the 256
    GPT-2 byte alphabet + control tokens) so build_tokenizer() works on the
    fixture; n_vocab must be >= 300 in that case."""
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path)
    w.add_kv("general.architecture", arch)
    w.add_kv(f"{arch}.block_count", n_layers)
    w.add_kv(f"{arch}.embedding_length", d_model)
    w.add_kv(f"{arch}.feed_forward_length", d_ff)
    w.add_kv(f"{arch}.attention.head_count", n_heads)
    w.add_kv(f"{arch}.attention.head_count_kv", n_kv_heads)
    w.add_kv(f"{arch}.attention.key_length", head_dim)
    w.add_kv(f"{arch}.attention.value_length", head_dim)
    w.add_kv(f"{arch}.attention.layer_norm_rms_epsilon", 1e-6)
    w.add_kv(f"{arch}.rope.freq_base", 1000000.0)
    w.add_kv(f"{arch}.context_length", 4096)
    for k, v in (extra_kv or {}).items():
        w.add_kv(f"{arch}.{k}", v)
    w.add_kv("tokenizer.ggml.model", "gpt2")
    w.add_kv("tokenizer.ggml.pre", "qwen2")
    if byte_tokenizer:
        from .tokenizer.bpe import bytes_to_unicode
        from .tokenizer.vocab import TYPE_CONTROL, TYPE_NORMAL

        alphabet = [bytes_to_unicode()[b] for b in range(256)]
        specials = ["<|endoftext|>", "<|im_start|>", "<|im_end|>",
                    "<|tts_bos|>", "<|tts_eos|>", "<|speak|>", "<|listen|>",
                    "<|chunk_eos|>", "<|turn_eos|>", "</s>", "<unit>",
                    "</unit>", "<|audio_start|>", "<|audio_end|>",
                    "<image>", "</image>", "<slice>", "</slice>",
                    "<think>", "</think>", "<|tts_pad|>"]
        toks = alphabet + specials
        assert n_vocab >= len(toks), (n_vocab, len(toks))
        toks += [f"<pad{i}>" for i in range(n_vocab - len(toks))]
        w.add_kv("tokenizer.ggml.tokens", toks)
        w.add_kv("tokenizer.ggml.token_type",
                 [TYPE_NORMAL] * 256 + [TYPE_CONTROL] * (n_vocab - 256))
        w.add_kv("tokenizer.ggml.merges", ["Ġ t", "h e"])
        w.add_kv("tokenizer.ggml.eos_token_id", 256)  # <|endoftext|>
    else:
        w.add_kv("tokenizer.ggml.tokens", [f"<t{i}>" for i in range(n_vocab)])

    def t(name: str, shape: tuple[int, ...], scale: float = 0.08,
          force_type: GGMLType | None = None):
        x = (rng.standard_normal(shape) * scale).astype(np.float32)
        tt = force_type if force_type is not None else (
            qtype if len(shape) == 2 and shape[-1] % 256 == 0 else GGMLType.F32
        )
        if tt == GGMLType.F32:
            w.add_tensor(name, x)
        elif tt == GGMLType.F16:
            w.add_tensor(name, x.astype(np.float16))
        else:
            w.add_tensor(name, quants.quantize(x, tt), tt, logical_shape=shape)
        return x

    t("token_embd.weight", (n_vocab, d_model), 0.5)
    t("output_norm.weight", (d_model,), 1.0)
    if not tied_head:
        t("output.weight", (n_vocab, d_model))
    for i in range(n_layers):
        p = f"blk.{i}."
        t(p + "attn_norm.weight", (d_model,), 1.0)
        t(p + "attn_q.weight", (n_heads * head_dim, d_model))
        t(p + "attn_k.weight", (n_kv_heads * head_dim, d_model))
        t(p + "attn_v.weight", (n_kv_heads * head_dim, d_model))
        t(p + "attn_output.weight", (d_model, n_heads * head_dim))
        if qk_norm:
            t(p + "attn_q_norm.weight", (head_dim,), 1.0)
            t(p + "attn_k_norm.weight", (head_dim,), 1.0)
        if sandwich_norms:  # Gemma-2/3 post-attention / post-ffw norms
            t(p + "post_attention_norm.weight", (d_model,), 1.0)
            t(p + "post_ffw_norm.weight", (d_model,), 1.0)
        t(p + "ffn_norm.weight", (d_model,), 1.0)
        t(p + "ffn_gate.weight", (d_ff, d_model))
        t(p + "ffn_up.weight", (d_ff, d_model))
        t(p + "ffn_down.weight", (d_model, d_ff))
    for name, arr in (extra_tensors or {}).items():
        w.add_tensor(name, np.asarray(arr, np.float32))
    w.write()
