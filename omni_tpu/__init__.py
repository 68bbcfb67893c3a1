"""omni_tpu — TPU-native full-duplex omni-modal streaming inference framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
tc-mb/llama.cpp-omni (MiniCPM-o 4.5 full-duplex omni engine): GGUF model
loading (all quant formats), a Qwen3-class LLM runtime with continuous
batching and KV-cache session semantics, SigLip2 vision encoder + resampler,
streaming Whisper audio encoder, LLaMA-arch TTS decoder, flow-matching
Token2Wav vocoder, an async streaming pipeline, HTTP serving, and
tensor/data-parallel scaling over TPU meshes.

Reference capability map: /root/reference (llama.cpp-omni); see SURVEY.md.
"""

__version__ = "0.1.0"


def _setup_compile_cache() -> None:
    """Enable JAX's persistent compilation cache by default.

    On the TPU compile service a cold 8B prefill/scan compile costs
    40-95 s; the on-disk cache cuts later processes to <0.5 s (measured:
    95.2 -> 0.34 s for a Pallas dequant-matmul module). Plays the role
    of the reference's CUDA-graph/ptx caching for session startup UX.

    Opt out with OMNI_COMPILE_CACHE=0; point elsewhere with
    OMNI_COMPILE_CACHE=<dir>. A user-set jax_compilation_cache_dir wins.
    """
    import os

    d = os.environ.get("OMNI_COMPILE_CACHE")
    if d in ("0", ""):
        return
    if d is None:
        d = os.path.join(os.path.expanduser("~"), ".cache", "omni_tpu",
                         "xla")
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            os.makedirs(d, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", d)
            # cache everything that took real compile time (default 1 s
            # would skip the many small marker/eval steps that still
            # cost a tunnel round-trip each)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              0.1)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass


_setup_compile_cache()
