"""Full-duplex TTFT benchmark: time-to-first-audio on one TPU chip.

The reference's headline (README.md:66-86, BASELINE.md): TTFT < 550 ms on a
4090 — APM prefill ~21-65 ms, 3 LLM tokens ~115 ms, 25 TTS tokens ~215 ms,
Token2Wav RTF 0.15 (~150 ms per 1 s window). This script measures the same
stage chain at FULL model sizes with synthetic weights (throughput is
content-independent): APM 1 s chunk -> LLM prefill + 3-token decode with
hidden taps -> TTS condition + 25 audio codes -> Token2Wav window.

Run: python scripts/ttft_bench.py  (prints a stage table + the TTFT sum)
"""

import time

import numpy as np

import jax
import jax.numpy as jnp


def r(key, *shape, s=0.02, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype) * s


def timeit(fn, reps=5):
    fn()  # compile
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def bench_apm():
    from omni_tpu.models import whisper

    cfg = whisper.WhisperConfig()  # 24L, d=1024, full size
    keys = iter(jax.random.split(jax.random.PRNGKey(0), 500))
    d, ff = cfg.d_model, 4096
    p = {
        "conv1_w": r(next(keys), d, cfg.n_mels, 3),
        "conv1_b": jnp.zeros(d),
        "conv2_w": r(next(keys), d, d, 3), "conv2_b": jnp.zeros(d),
        "pos": r(next(keys), cfg.n_audio_ctx, d),
        "ln_post_w": jnp.ones(d), "ln_post_b": jnp.zeros(d),
        "proj1_w": r(next(keys), cfg.d_out, d), "proj1_b": jnp.zeros(cfg.d_out),
        "proj2_w": r(next(keys), cfg.d_out, cfg.d_out),
        "proj2_b": jnp.zeros(cfg.d_out),
        "layers": [],
    }
    for _ in range(cfg.n_layers):
        p["layers"].append({
            "attn_ln_w": jnp.ones(d), "attn_ln_b": jnp.zeros(d),
            "wq": r(next(keys), d, d), "bq": jnp.zeros(d),
            "wk": r(next(keys), d, d),
            "wv": r(next(keys), d, d), "bv": jnp.zeros(d),
            "wo": r(next(keys), d, d), "bo": jnp.zeros(d),
            "mlp_ln_w": jnp.ones(d), "mlp_ln_b": jnp.zeros(d),
            "w1": r(next(keys), ff, d), "b1": jnp.zeros(ff),
            "w2": r(next(keys), d, ff), "b2": jnp.zeros(d),
        })
    mel = r(next(keys), 100, cfg.n_mels, s=0.1)  # 1 s -> 100 mel frames
    state = whisper.WhisperState.create(cfg)

    def run():
        emb, _ = whisper.encode_chunk(p, cfg, mel, state)
        jax.block_until_ready(emb)

    return timeit(run)


def bench_llm():
    from omni_tpu.models import qwen3
    from omni_tpu.runtime.kv_cache import KVCache
    from omni_tpu.runtime.loop import decode_scan
    from omni_tpu.testing_synth import QWEN3_8B, synth_qwen3_params

    cfg = QWEN3_8B
    params = synth_qwen3_params(cfg, fuse=True)
    cache = KVCache.create(cfg.n_layers, 2048, cfg.n_kv_heads, cfg.head_dim,
                           dtype=jnp.bfloat16, rope_base=cfg.rope_base)

    # prefill: 30 tokens (system fragment + 10 audio embeds + markers)
    @jax.jit
    def prefill(params, cache, tokens):
        x = qwen3.embed(params, tokens)
        pos = jnp.arange(tokens.shape[0], dtype=jnp.int32)
        slots = cache.find_slots(tokens.shape[0])
        logits, _, cache = qwen3.forward(params, cfg, x, pos,
                                         jnp.zeros_like(pos), cache, slots)
        return logits[-1], cache

    toks = jnp.arange(30, dtype=jnp.int32)
    logits, cache2 = prefill(params, cache, toks)
    jax.block_until_ready(logits)
    t0 = time.perf_counter()
    logits, cache2 = prefill(params, cache, toks)
    jax.block_until_ready(logits)
    t_prefill = (time.perf_counter() - t0) * 1e3

    # first 3 decode tokens with hidden taps
    args = dict(forward=qwen3.forward, embed=qwen3.embed, cfg=cfg,
                n_steps=3, greedy=True)
    key = jax.random.PRNGKey(0)
    out = decode_scan(params=params, cache=cache2, first_token=jnp.int32(1),
                      start_pos=jnp.int32(30), seq_id=jnp.int32(0), key=key,
                      **args)
    np.asarray(out[0])
    cache3 = out[3]
    t0 = time.perf_counter()
    out = decode_scan(params=params, cache=cache3, first_token=jnp.int32(1),
                      start_pos=jnp.int32(33), seq_id=jnp.int32(0), key=key,
                      **args)
    np.asarray(out[0])
    t_decode3 = (time.perf_counter() - t0) * 1e3
    return t_prefill, t_decode3


def bench_tts():
    from omni_tpu.models import qwen3
    from omni_tpu.models import tts as T
    from omni_tpu.models.qwen3 import Qwen3Config
    from omni_tpu.runtime.kv_cache import KVCache
    from omni_tpu.testing_synth import synth_qwen3_params

    cfg = Qwen3Config(n_layers=20, d_model=768, n_heads=12, n_kv_heads=12,
                      head_dim=64, d_ff=3072, n_vocab=T.NUM_AUDIO_TOKENS,
                      rope_base=10000.0, rope_neox=False)
    params = synth_qwen3_params(cfg, tied_head=True)
    params["output"] = None
    params["token_embd"] = None
    for l in params["layers"]:
        l["q_norm"] = l["k_norm"] = None
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    extras = {
        "emb_code": r(ks[0], T.NUM_AUDIO_TOKENS, 768),
        "head_code": r(ks[1], T.NUM_AUDIO_TOKENS, 768),
    }
    cache = KVCache.create(cfg.n_layers, 1024, cfg.n_kv_heads, cfg.head_dim,
                           rope_base=cfg.rope_base, rope_neox=False)
    cond = r(ks[2], 12, 768, s=0.1, dtype=jnp.bfloat16)
    slots = cache.find_slots(12)
    fwd = jax.jit(qwen3.forward, static_argnums=(1,))
    _, hidden, cache = fwd(params, cfg, cond, jnp.arange(12, dtype=jnp.int32),
                           jnp.zeros(12, jnp.int32), cache, slots)

    key = jax.random.PRNGKey(2)
    codes, nv, cache2, _ = T.tts_decode_scan(
        params, cfg, extras, cache, hidden[-1], jnp.int32(12), key,
        n_steps=25, force_no_eos=True)
    np.asarray(codes)
    t0 = time.perf_counter()
    codes, nv, cache3, _ = T.tts_decode_scan(
        params, cfg, extras, cache2, hidden[-1], jnp.int32(37), key,
        n_steps=25, force_no_eos=True)
    np.asarray(codes)
    return (time.perf_counter() - t0) * 1e3


def bench_t2w():
    from omni_tpu.models.token2wav import Token2Wav
    from omni_tpu.models.token2wav import conformer as conf
    from omni_tpu.models.token2wav import dit as ditm
    from omni_tpu.testing_t2w import tiny_conformer, tiny_dit, tiny_hifigan

    rng = np.random.default_rng(0)
    # full-ish sizes: conformer d=512/6+4 blocks, DiT hidden 512 depth 12,
    # HiFT vocoder mel 80 (synthetic weights; shapes drive the cost)
    enc_p, enc_cfg = tiny_conformer(rng, d=512, heads=8, ff=2048)
    enc_cfg = conf.ConformerConfig(d_model=512, n_heads=8, d_ff=2048,
                                   n_blocks=6, n_up_blocks=4, max_tokens=512)
    enc_p["encoders"] = enc_p["encoders"] * 3  # 2 -> 6
    enc_p["up_encoders"] = enc_p["up_encoders"] * 4
    dit_p, dit_cfg = tiny_dit(rng, mel=80, hidden=512, depth=12, heads=8)
    voc_p = tiny_hifigan(rng, mel=80)

    t2w = Token2Wav.__new__(Token2Wav)
    t2w.enc_p, t2w.enc_cfg = enc_p, enc_cfg
    t2w.dit_p, t2w.dit_cfg = dit_p, dit_cfg
    t2w.voc_p = voc_p
    t2w.extra = {
        "input_embedding": jnp.asarray(
            rng.standard_normal((6562, 512)).astype(np.float32) * 0.02),
        "encoder_proj_w": jnp.asarray(
            rng.standard_normal((80, 512)).astype(np.float32) * 0.02),
        "encoder_proj_b": jnp.zeros(80),
    }
    t2w.spk80 = jnp.zeros(80)
    t2w.n_timesteps = 5
    t2w.temperature = 1.0
    t2w.enc_state = conf.ConformerState.create(enc_cfg)
    t2w.cfm_state = ditm.CFMState.create(dit_cfg, t2w.n_timesteps)
    t2w.mel_cache = np.zeros((0, 80), np.float32)
    t2w.source_cache = np.zeros(0, np.float32)
    t2w.speech_cache = np.zeros(0, np.float32)

    window = rng.integers(0, 6000, 28).astype(np.int32)
    t2w.feed_window(window)  # compile

    def run():
        t2w.feed_window(window)

    return timeit(run, reps=3)


def main():
    rows = []

    def add(name, ms, ref):
        rows.append((name, ms, ref))
        print(f"{name:40s} {ms:9.1f} ms", flush=True)

    add("APM encode (1 s chunk, 24L/1024)", bench_apm(), "~21-65")
    pf, d3 = bench_llm()
    add("LLM prefill (30 tok, 8B Q4_K)", pf, "~65")
    add("LLM first 3 tokens (hidden taps)", d3, "~115")
    add("TTS 25 audio codes (20L/768)", bench_tts(), "~215")
    add("Token2Wav 1 s window", bench_t2w(), "~150 (RTF .15)")

    print(f"\n{'stage':40s} {'tpu ms':>9s} {'4090 ms':>15s}")
    total = 0.0
    for name, ms, ref in rows:
        total += ms
        print(f"{name:40s} {ms:9.1f} {ref:>15s}")
    print(f"{'TTFT (sum)':40s} {total:9.1f} {'<550':>15s}")
    import json

    print(json.dumps({"metric": "ttft_ms_full_duplex", "value": round(total, 1),
                      "unit": "ms", "vs_baseline": round(550.0 / total, 3)}))


if __name__ == "__main__":
    main()
