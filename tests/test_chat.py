"""Chat template tests (reference tests/test-chat-template.cpp coverage)."""

import pytest

from omni_tpu.chat import apply_chat_template, detect_template, known_templates

MSGS = [
    {"role": "system", "content": "You are helpful."},
    {"role": "user", "content": "Hi"},
    {"role": "assistant", "content": "Hello!"},
    {"role": "user", "content": "Bye"},
]


def test_chatml():
    out = apply_chat_template("chatml", MSGS)
    assert out == (
        "<|im_start|>system\nYou are helpful.<|im_end|>\n"
        "<|im_start|>user\nHi<|im_end|>\n"
        "<|im_start|>assistant\nHello!<|im_end|>\n"
        "<|im_start|>user\nBye<|im_end|>\n"
        "<|im_start|>assistant\n"
    )


def test_llama2_system_folded_into_first_user():
    out = apply_chat_template("llama2", MSGS)
    assert out.startswith("<s>[INST] <<SYS>>\nYou are helpful.\n<</SYS>>\n\nHi [/INST]")
    assert " Hello! </s>" in out
    assert out.endswith("<s>[INST] Bye [/INST]")


def test_llama3():
    out = apply_chat_template("llama3", MSGS)
    assert out.startswith("<|begin_of_text|><|start_header_id|>system<|end_header_id|>")
    assert out.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")
    assert "Hi<|eot_id|>" in out


def test_gemma_maps_assistant_to_model():
    out = apply_chat_template("gemma", MSGS)
    assert "<start_of_turn>model\nHello!<end_of_turn>" in out
    assert "You are helpful.\n\nHi" in out  # system folded into first user
    assert out.endswith("<start_of_turn>model\n")


def test_no_generation_prompt():
    out = apply_chat_template("chatml", MSGS, add_assistant=False)
    assert not out.endswith("<|im_start|>assistant\n")


def test_detection_from_jinja():
    cases = {
        "chatml": "{% for m in messages %}<|im_start|>{{m.role}}...",
        "llama3": "<|start_header_id|>{{ role }}<|end_header_id|> ... <|eot_id|>",
        "gemma": "<start_of_turn>user ...",
        "phi3": "<|assistant|> ... <|end|>",
        "command-r": "<|START_OF_TURN_TOKEN|><|USER_TOKEN|>",
        "granite": "<|start_of_role|>",
    }
    for family, jinja in cases.items():
        assert detect_template(jinja) == family


def test_unknown_template_raises():
    with pytest.raises(ValueError):
        apply_chat_template("totally-unknown {{ xyz }}", MSGS)


def test_all_registered_render():
    for name in known_templates():
        out = apply_chat_template(name, MSGS)
        assert "Hi" in out and "Hello!" in out
