"""Model conversion: HF checkpoints -> the 5-module GGUF set.

Counterpart of the reference's conversion layer (SURVEY.md §2.7 / L7):
convert_hf_to_gguf.py for the LLM, tools/omni/convert/{surgery.py,
convert_vpm.py, convert_apm.py, convert_tts.py, convert_projector.py} for
the omni modules. Output GGUFs use the same tensor naming the reference's
converters produce, so they load in BOTH frameworks.
"""

from .surgery import MODULE_PREFIXES, split_checkpoint
from .hf_to_gguf import (convert_llm, convert_apm, convert_tts,
                         convert_vpm, merge_weight_norm)

__all__ = [
    "MODULE_PREFIXES",
    "split_checkpoint",
    "convert_llm",
    "convert_apm",
    "convert_tts",
    "convert_vpm",
    "merge_weight_norm",
]
