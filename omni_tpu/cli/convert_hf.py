"""omni-convert-hf: HuggingFace checkpoint directory -> GGUF.

Counterpart of the reference's convert_hf_to_gguf.py script for the LLM
architectures this framework serves (qwen3, qwen3moe, llama/minicpm with
the rope permute, gemma2/gemma3 with sandwich-norm mapping and +1 RMS
norms). Reads config.json + *.safetensors (single- or multi-shard via
model.safetensors.index.json) with the dependency-free reader.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

from ..core.dtypes import GGMLType

ARCHES = ("qwen2", "qwen3", "qwen3moe", "llama", "minicpm", "gemma2",
          "gemma3", "phi3", "granite", "gpt-oss", "olmo2", "command-r",
          "deepseek2", "mamba", "bert", "rwkv6", "jamba", "gpt2",
          "starcoder2", "phi2", "gptneox", "stablelm", "falcon", "t5",
          "t5encoder", "smollm3", "qwen2moe", "glm4", "nemotron",
          "olmoe", "arcee", "ernie4_5", "granitemoe", "olmo", "gemma",
          "cohere2", "bloom", "mpt", "llama4", "seed_oss", "exaone4",
          "glm4moe", "dots1", "ernie4_5-moe", "mamba2", "dbrx",
          "hunyuan-moe", "hunyuan-dense", "apertus", "bitnet", "lfm2",
          "granitehybrid", "falcon-h1", "phimoe", "starcoder",
          "baichuan", "xverse", "internlm2", "exaone", "orion", "qwen",
          "plamo", "refact", "jais", "codeshell", "gptj", "chatglm",
          "deepseek", "bailingmoe", "llada", "dream", "llada_moe",
          "arctic", "grok", "smallthinker", "minicpm3", "plm",
          "rwkv7", "arwkv7", "nemotron_h", "deci", "openelm",
          "nomic-bert", "nomic-bert-moe", "jina-bert-v2", "jina-bert-v3",
          "neo-bert", "rwkv6qwen2", "gemma-embedding", "lfm2moe",
          "grovemoe", "plamo2", "gemma3n")

_HF_ARCH_MAP = {
    "Qwen2ForCausalLM": "qwen2",
    "Qwen3ForCausalLM": "qwen3",
    "Qwen3MoeForCausalLM": "qwen3moe",
    "LlamaForCausalLM": "llama",
    "Llama4ForCausalLM": "llama4",
    "Llama4ForConditionalGeneration": "llama4",
    "MistralForCausalLM": "llama",
    "MixtralForCausalLM": "llama",
    "MiniCPMForCausalLM": "minicpm",
    "Gemma2ForCausalLM": "gemma2",
    "Gemma3ForCausalLM": "gemma3",
    "Gemma3ForConditionalGeneration": "gemma3",
    "Phi3ForCausalLM": "phi3",
    "GraniteForCausalLM": "granite",
    "GraniteMoeForCausalLM": "granitemoe",
    "GptOssForCausalLM": "gpt-oss",
    "Olmo2ForCausalLM": "olmo2",
    "OlmoForCausalLM": "olmo",
    "GemmaForCausalLM": "gemma",
    "CohereForCausalLM": "command-r",
    "Cohere2ForCausalLM": "cohere2",
    "DeepseekV2ForCausalLM": "deepseek2",
    "DeepseekV3ForCausalLM": "deepseek2",
    "MambaForCausalLM": "mamba",
    "Mamba2ForCausalLM": "mamba2",
    "Rwkv6ForCausalLM": "rwkv6",
    "RWKV6Qwen2ForCausalLM": "rwkv6qwen2",
    "JambaForCausalLM": "jamba",
    "GPT2LMHeadModel": "gpt2",
    "BloomForCausalLM": "bloom",
    "MptForCausalLM": "mpt",
    "Starcoder2ForCausalLM": "starcoder2",
    "PhiForCausalLM": "phi2",
    "GPTNeoXForCausalLM": "gptneox",
    "FalconForCausalLM": "falcon",
    "T5ForConditionalGeneration": "t5",
    "MT5ForConditionalGeneration": "t5",
    "T5EncoderModel": "t5encoder",
    "SmolLM3ForCausalLM": "smollm3",
    "Qwen2MoeForCausalLM": "qwen2moe",
    "Glm4ForCausalLM": "glm4",
    "NemotronForCausalLM": "nemotron",
    "OlmoeForCausalLM": "olmoe",
    "ArceeForCausalLM": "arcee",
    "Ernie4_5ForCausalLM": "ernie4_5",
    "Ernie4_5_MoeForCausalLM": "ernie4_5-moe",
    "SeedOssForCausalLM": "seed_oss",
    "Exaone4ForCausalLM": "exaone4",
    "Glm4MoeForCausalLM": "glm4moe",
    "Dots1ForCausalLM": "dots1",
    "DbrxForCausalLM": "dbrx",
    "ApertusForCausalLM": "apertus",
    "Lfm2ForCausalLM": "lfm2",
    "Lfm2MoeForCausalLM": "lfm2moe",
    "GroveMoeForCausalLM": "grovemoe",
    "Plamo2ForCausalLM": "plamo2",
    "PLaMo2ForCausalLM": "plamo2",
    "Gemma3nForCausalLM": "gemma3n",
    "Gemma3nForConditionalGeneration": "gemma3n",
    "GraniteMoeHybridForCausalLM": "granitehybrid",
    "FalconH1ForCausalLM": "falcon-h1",
    "PhimoeForCausalLM": "phimoe",
    "GPTBigCodeForCausalLM": "starcoder",
    "BaichuanForCausalLM": "baichuan",
    "BaiChuanForCausalLM": "baichuan",
    "XverseForCausalLM": "xverse",
    "InternLM2ForCausalLM": "internlm2",
    "ExaoneForCausalLM": "exaone",
    "OrionForCausalLM": "orion",
    "QWenLMHeadModel": "qwen",
    "BitNetForCausalLM": "bitnet",
    "HunYuanMoEV1ForCausalLM": "hunyuan-moe",
    "HunYuanDenseV1ForCausalLM": "hunyuan-dense",
    "StableLmForCausalLM": "stablelm",
    "BertModel": "bert",
    "BertForMaskedLM": "bert",
    "BertForSequenceClassification": "bert",
    "PlamoForCausalLM": "plamo",
    "RefactForCausalLM": "refact",
    "JAISLMHeadModel": "jais",
    "CodeShellForCausalLM": "codeshell",
    "GPTJForCausalLM": "gptj",
    "ChatGLMModel": "chatglm",
    "ChatGLMForConditionalGeneration": "chatglm",
    "DeepseekForCausalLM": "deepseek",
    "BailingMoeForCausalLM": "bailingmoe",
    "LLaDAModelLM": "llada",
    "DreamModel": "dream",
    "LLaDAMoEModelLM": "llada_moe",
    "ArcticForCausalLM": "arctic",
    "Grok1ForCausalLM": "grok",
    "SmallThinkerForCausalLM": "smallthinker",
    "SmallthinkerForCausalLM": "smallthinker",
    "MiniCPM3ForCausalLM": "minicpm3",
    "PLMForCausalLM": "plm",
    "Rwkv7ForCausalLM": "rwkv7",
    "RWKV7ForCausalLM": "rwkv7",
    "RwkvHybridForCausalLM": "arwkv7",
    "NemotronHForCausalLM": "nemotron_h",
    "DeciLMForCausalLM": "deci",
    "OpenELMForCausalLM": "openelm",
}


def load_hf_dir(model_dir: str) -> tuple[dict, dict]:
    """-> (state_dict, config) from a HF checkpoint directory."""
    from ..convert.lora import read_safetensors

    with open(os.path.join(model_dir, "config.json")) as f:
        config = json.load(f)
    # multimodal wrappers nest the text config
    if "text_config" in config:
        config = {**config, **config["text_config"]}

    idx_path = os.path.join(model_dir, "model.safetensors.index.json")
    state: dict = {}
    if os.path.exists(idx_path):
        with open(idx_path) as f:
            shards = sorted(set(json.load(f)["weight_map"].values()))
        for s in shards:
            state.update(read_safetensors(os.path.join(model_dir, s)))
    else:
        files = sorted(fn for fn in os.listdir(model_dir)
                       if fn.endswith(".safetensors"))
        if not files:
            raise FileNotFoundError(f"no *.safetensors under {model_dir}")
        for fn in files:
            state.update(read_safetensors(os.path.join(model_dir, fn)))
    return state, config


def detect_arch(config: dict) -> str:
    for a in config.get("architectures") or []:
        # embedding-BERT families fork on config, not class (reference
        # NomicBertModel.__init__ / XLMRobertaModel.__init__)
        if a == "NomicBertModel":
            return ("nomic-bert-moe"
                    if config.get("moe_every_n_layers") else "nomic-bert")
        if a in ("JinaBertModel", "JinaBertForMaskedLM"):
            return "jina-bert-v2"
        if a.startswith("XLMRoberta"):
            return ("jina-bert-v3"
                    if config.get("lora_adaptations") else "bert")
        if a.startswith("NeoBERT"):
            return "neo-bert"
        if a == "Gemma3TextModel":
            # EmbeddingGemma registers the bare text model class
            # (reference convert_hf_to_gguf.py EmbeddingGemma)
            return "gemma-embedding"
        if a in _HF_ARCH_MAP:
            return _HF_ARCH_MAP[a]
    mt = config.get("model_type", "")
    if mt in ("deepseek_v2", "deepseek_v3"):
        return "deepseek2"
    for a in ARCHES:
        if mt.replace("_", "") == a or mt == a:
            return a
    raise SystemExit(f"unsupported architecture: "
                     f"{config.get('architectures')} / {mt!r}; "
                     f"supported: {', '.join(ARCHES)}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="omni-convert-hf",
        description="Convert a HF LLM checkpoint directory to GGUF")
    ap.add_argument("model_dir")
    ap.add_argument("out_path")
    ap.add_argument("--arch", choices=ARCHES, default=None,
                    help="override architecture autodetection")
    ap.add_argument("--outtype", choices=("f32", "f16", "q8_0", "q4_k"),
                    default="f16")
    args = ap.parse_args(argv)

    from ..convert.hf_to_gguf import convert_llm

    state, config = load_hf_dir(args.model_dir)
    arch = args.arch or detect_arch(config)
    qtype = {"f32": GGMLType.F32, "f16": GGMLType.F16,
             "q8_0": GGMLType.Q8_0, "q4_k": GGMLType.Q4_K}[args.outtype]
    written = convert_llm(state, config, args.out_path, qtype=qtype,
                          arch=arch)
    size = os.path.getsize(args.out_path) / 1e6
    print(f"wrote {args.out_path}: arch={arch} {len(written)} tensors "
          f"({args.outtype}), {size:.1f} MB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
