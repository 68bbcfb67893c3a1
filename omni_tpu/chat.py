"""Built-in chat templates per model family.

Counterpart of the reference's src/llama-chat.cpp (llm_chat_apply_template +
llm_chat_detect_template): a registry of hand-rolled template renderers keyed
by family name, plus detection from a GGUF `tokenizer.chat_template` Jinja
string (we key on its distinctive markers exactly like the reference does —
no Jinja engine in the hot path).

Messages are [{"role": "system"|"user"|"assistant", "content": str}, ...].
"""

from __future__ import annotations

from typing import Callable

Renderer = Callable[[list[dict], bool], str]
_REGISTRY: dict[str, Renderer] = {}


def register(name: str):
    def deco(fn: Renderer) -> Renderer:
        _REGISTRY[name] = fn
        return fn
    return deco


def known_templates() -> list[str]:
    return sorted(_REGISTRY)


def apply_chat_template(template: str, messages: list[dict],
                        add_assistant: bool = True) -> str:
    """Render `messages` with a named family template, or auto-detect the
    family from a raw Jinja template string (llama_chat_apply_template)."""
    name = template if template in _REGISTRY else detect_template(template)
    if name is None:
        raise ValueError(f"unknown chat template {template[:80]!r}")
    return _REGISTRY[name](messages, add_assistant)


def detect_template(jinja: str) -> str | None:
    """Map a Jinja chat-template string to a family (llm_chat_detect_template)."""
    if "<|im_start|>" in jinja:
        return "chatml"
    if "<|start_header_id|>" in jinja and "<|eot_id|>" in jinja:
        return "llama3"
    if "[INST]" in jinja:
        return "mistral" if "' [INST] ' + system_message" in jinja or "[/INST]" in jinja else "llama2"
    if "<start_of_turn>" in jinja:
        return "gemma"
    if "<|assistant|>" in jinja and "<|end|>" in jinja:
        return "phi3"
    if "<|user|>" in jinja and "</s>" in jinja:
        return "zephyr"
    if "<|START_OF_TURN_TOKEN|>" in jinja:
        return "command-r"
    if "请" in jinja or "User: " in jinja and "Assistant: " in jinja:
        return "deepseek"
    if "ASSISTANT:" in jinja:
        return "vicuna"
    if "<|start_of_role|>" in jinja:
        return "granite"
    return None


def _system_and_turns(messages: list[dict]) -> tuple[str, list[dict]]:
    sys_txt = ""
    turns = []
    for m in messages:
        if m["role"] == "system":
            sys_txt = m["content"]
        else:
            turns.append(m)
    return sys_txt, turns


@register("chatml")
def _chatml(messages, add_assistant):
    out = "".join(
        f"<|im_start|>{m['role']}\n{m['content']}<|im_end|>\n" for m in messages)
    if add_assistant:
        out += "<|im_start|>assistant\n"
    return out


@register("llama2")
def _llama2(messages, add_assistant):
    sys_txt, turns = _system_and_turns(messages)
    out = ""
    first = True
    for m in turns:
        if m["role"] == "user":
            inner = m["content"]
            if first and sys_txt:
                inner = f"<<SYS>>\n{sys_txt}\n<</SYS>>\n\n{inner}"
            out += f"<s>[INST] {inner} [/INST]"
            first = False
        else:
            out += f" {m['content']} </s>"
    return out


@register("llama3")
def _llama3(messages, add_assistant):
    out = "<|begin_of_text|>"
    for m in messages:
        out += (f"<|start_header_id|>{m['role']}<|end_header_id|>\n\n"
                f"{m['content']}<|eot_id|>")
    if add_assistant:
        out += "<|start_header_id|>assistant<|end_header_id|>\n\n"
    return out


@register("mistral")
def _mistral(messages, add_assistant):
    sys_txt, turns = _system_and_turns(messages)
    out = "<s>"
    first = True
    for m in turns:
        if m["role"] == "user":
            inner = m["content"]
            if first and sys_txt:
                inner = f"{sys_txt}\n\n{inner}"
            out += f"[INST] {inner} [/INST]"
            first = False
        else:
            out += f" {m['content']}</s>"
    return out


@register("gemma")
def _gemma(messages, add_assistant):
    sys_txt, turns = _system_and_turns(messages)
    out = ""
    for i, m in enumerate(turns):
        role = "model" if m["role"] == "assistant" else "user"
        inner = m["content"]
        if i == 0 and sys_txt and role == "user":
            inner = f"{sys_txt}\n\n{inner}"
        out += f"<start_of_turn>{role}\n{inner}<end_of_turn>\n"
    if add_assistant:
        out += "<start_of_turn>model\n"
    return out


@register("phi3")
def _phi3(messages, add_assistant):
    out = "".join(f"<|{m['role']}|>\n{m['content']}<|end|>\n" for m in messages)
    if add_assistant:
        out += "<|assistant|>\n"
    return out


@register("zephyr")
def _zephyr(messages, add_assistant):
    out = "".join(f"<|{m['role']}|>\n{m['content']}</s>\n" for m in messages)
    if add_assistant:
        out += "<|assistant|>\n"
    return out


@register("vicuna")
def _vicuna(messages, add_assistant):
    sys_txt, turns = _system_and_turns(messages)
    out = f"{sys_txt}\n\n" if sys_txt else ""
    for m in turns:
        if m["role"] == "user":
            out += f"USER: {m['content']}\n"
        else:
            out += f"ASSISTANT: {m['content']}</s>\n"
    if add_assistant:
        out += "ASSISTANT:"
    return out


@register("deepseek")
def _deepseek(messages, add_assistant):
    sys_txt, turns = _system_and_turns(messages)
    out = sys_txt + "\n\n" if sys_txt else ""
    for m in turns:
        if m["role"] == "user":
            out += f"User: {m['content']}\n\n"
        else:
            out += f"Assistant: {m['content']}<｜end▁of▁sentence｜>"
    if add_assistant:
        out += "Assistant:"
    return out


@register("command-r")
def _command_r(messages, add_assistant):
    role_map = {"system": "SYSTEM", "user": "USER", "assistant": "CHATBOT"}
    out = ""
    for m in messages:
        out += (f"<|START_OF_TURN_TOKEN|><|{role_map[m['role']]}_TOKEN|>"
                f"{m['content']}<|END_OF_TURN_TOKEN|>")
    if add_assistant:
        out += "<|START_OF_TURN_TOKEN|><|CHATBOT_TOKEN|>"
    return out


@register("granite")
def _granite(messages, add_assistant):
    out = "".join(
        f"<|start_of_role|>{m['role']}<|end_of_role|>{m['content']}<|end_of_text|>\n"
        for m in messages)
    if add_assistant:
        out += "<|start_of_role|>assistant<|end_of_role|>"
    return out


@register("minicpm")
def _minicpm(messages, add_assistant):
    # MiniCPM-o uses ChatML with the Qwen vocab (reference omni prompts,
    # tools/omni/omni.cpp:3518-3538)
    return _chatml(messages, add_assistant)
