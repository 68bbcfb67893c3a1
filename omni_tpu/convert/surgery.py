"""Checkpoint surgery: split a MiniCPM-o HF checkpoint into module dicts.

Capability of the reference's tools/omni/convert/surgery.py (which loads
the monolithic torch checkpoint and saves per-module state dicts): the omni
model is one HF repo whose top-level attributes are llm / vpm / resampler /
apm / audio_projection_layer / tts, and the Token2Wav weights ship
separately. Everything here is plain dict surgery over tensor names —
framework-free (values may be numpy arrays or torch tensors).
"""

from __future__ import annotations

from typing import Any, Mapping

# module -> (prefixes claimed by the module, strip_prefix)
MODULE_PREFIXES: dict[str, list[str]] = {
    "llm": ["llm.", "model.llm."],
    "vpm": ["vpm.", "resampler."],  # encoder + resampler travel together
    "apm": ["apm.", "audio_projection_layer."],
    "tts": ["tts."],
    "token2wav": ["token2wav.", "flow.", "hift."],
}


def split_checkpoint(state: Mapping[str, Any],
                     keep_prefix_for: tuple[str, ...] = ("resampler.",
                                                         "audio_projection_layer.")
                     ) -> dict[str, dict[str, Any]]:
    """Split a flat state dict into per-module dicts.

    Keys matching a module prefix are stripped of the module's own prefix
    (llm.model.layers.0... -> model.layers.0...), except sub-modules that
    keep their name inside the target GGUF (resampler.*,
    audio_projection_layer.* — the reference converters keep those).
    Unmatched keys land in "other".
    """
    out: dict[str, dict[str, Any]] = {m: {} for m in MODULE_PREFIXES}
    out["other"] = {}
    for key, val in state.items():
        for module, prefixes in MODULE_PREFIXES.items():
            hit = next((p for p in prefixes if key.startswith(p)), None)
            if hit is not None:
                new_key = key if hit in keep_prefix_for else key[len(hit):]
                out[module][new_key] = val
                break
        else:
            out["other"][key] = val
    return out


def load_hf_state(path: str) -> dict[str, Any]:
    """Load a HF checkpoint directory (safetensors shards or torch .bin)
    into one flat numpy state dict. Lazy per-tensor reads where possible."""
    import glob
    import os

    import numpy as np

    state: dict[str, Any] = {}
    st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if st_files:
        from safetensors import safe_open

        for f in st_files:
            with safe_open(f, framework="np") as sf:
                for k in sf.keys():
                    state[k] = sf.get_tensor(k)
        return state
    bin_files = sorted(glob.glob(os.path.join(path, "*.bin")))
    if bin_files:
        import torch

        for f in bin_files:
            sd = torch.load(f, map_location="cpu", weights_only=True)
            for k, v in sd.items():
                state[k] = v.float().numpy() if hasattr(v, "numpy") else np.asarray(v)
        return state
    raise FileNotFoundError(f"no safetensors/bin shards under {path}")
