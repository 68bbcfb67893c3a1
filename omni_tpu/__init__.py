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
