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


MSGS4 = [{"role": "system", "content": "sys"},
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "yo"},
        {"role": "user", "content": "again"}]


@pytest.mark.parametrize("name,frags,tail", [
    ("phi4", ["<|im_start|>system<|im_sep|>sys<|im_end|>",
              "<|im_start|>user<|im_sep|>hi<|im_end|>"],
     "<|im_start|>assistant<|im_sep|>"),
    ("falcon3", ["<|system|>\nsys\n", "<|user|>\nhi\n"], "<|assistant|>\n"),
    ("monarch", ["system\nsys</s>\n", "<s>user\nhi</s>\n"], "<s>assistant\n"),
    ("openchat", ["sys<|end_of_turn|>", "GPT4 Correct User: hi<|end_of_turn|>",
                  "GPT4 Correct Assistant: yo<|end_of_turn|>"],
     "GPT4 Correct Assistant:"),
    ("vicuna-orca", ["SYSTEM: sys\n", "USER: hi\n", "ASSISTANT: yo</s>\n"],
     "ASSISTANT:"),
    ("deepseek-coder", ["sys", "### Instruction:\nhi\n",
                        "### Response:\nyo\n<|EOT|>\n"], "### Response:\n"),
    ("deepseek3", ["sys\n\n", "<｜User｜>hi",
                   "<｜Assistant｜>yo<｜end▁of▁sentence｜>"], "<｜Assistant｜>"),
    ("chatglm4", ["[gMASK]<sop>", "<|system|>\nsys", "<|user|>\nhi"],
     "<|assistant|>\n"),
    ("exaone3", ["[|system|]sys[|endofturn|]\n", "[|user|]hi\n",
                 "[|assistant|]yo[|endofturn|]\n"], "[|assistant|]"),
    ("gigachat", ["<s>sys<|message_sep|>",
                  "user<|role_sep|>hi<|message_sep|>available functions"
                  "<|role_sep|>[]<|message_sep|>",
                  "assistant<|role_sep|>yo<|message_sep|>"],
     "assistant<|role_sep|>"),
    ("megrez", ["<|role_start|>system<|role_end|>sys<|turn_end|>"],
     "<|role_start|>assistant<|role_end|>"),
    ("yandex", [" Пользователь: hi\n\n", " Ассистент: yo\n\n"],
     " Ассистент:[SEP]"),
    ("bailing", ["<role>SYSTEM</role>sys", "<role>HUMAN</role>hi",
                 "<role>ASSISTANT</role>yo"], "<role>ASSISTANT</role>"),
    ("llama4", ["<|header_start|>system<|header_end|>\n\nsys<|eot|>"],
     "<|header_start|>assistant<|header_end|>\n\n"),
    ("smolvlm", ["<|im_start|>sys\n\n", "User: hi<end_of_utterance>\n",
                 "Assistant: yo<end_of_utterance>\n"], "Assistant:"),
    ("dots1", ["<|system|>sys<|endofsystem|>",
               "<|userprompt|>hi<|endofuserprompt|>",
               "<|response|>yo<|endofresponse|>"], "<|response|>"),
    ("gpt-oss", ["<|start|>system<|message|>sys<|end|>",
                 "<|start|>assistant<|message|>yo<|return|>"],
     "<|start|>assistant"),
    ("kimi-k2", ["<|im_system|>system<|im_middle|>sys<|im_end|>",
                 "<|im_user|>user<|im_middle|>hi<|im_end|>"],
     "<|im_assistant|>assistant<|im_middle|>"),
    ("seed-oss", ["<seed:bos>system\nsys<seed:eos>",
                  "<seed:bos>user\nhi<seed:eos>"], "<seed:bos>assistant\n"),
    ("grok2", ["System: sys<|separator|>\n\n", "Human: hi<|separator|>\n\n",
               "Assistant: yo<|separator|>\n\n"], "Assistant:"),
])
def test_new_builtin_templates(name, frags, tail):
    """Round-3 template batch: surface forms pinned to llama-chat.cpp's
    formatter output for a canonical 4-message conversation."""
    out = apply_chat_template(name, MSGS4, add_assistant=True)
    for f in frags:
        assert f in out, (name, f, out)
    assert out.endswith(tail), (name, out[-60:])


def test_rwkv_world_template():
    out = apply_chat_template("rwkv-world", MSGS4, add_assistant=True)
    assert "System: sys\n\n" in out and "User: hi\n\n" in out
    assert out.endswith("User: again\n\nAssistant:")


def test_hunyuan_templates():
    out = apply_chat_template("hunyuan-moe", MSGS4, add_assistant=False)
    assert out.startswith("<|startoftext|>sys<|extra_4|>")
    assert "<|startoftext|>hi<|extra_0|>" in out and "yo<|eos|>" in out
    out = apply_chat_template("hunyuan-dense", MSGS4, add_assistant=False)
    assert "<｜hy_User｜>hi<｜hy_Assistant｜>" in out


def test_new_template_detection():
    """Jinja-marker detection precedence matches llm_chat_detect_template."""
    cases = [
        ("...<|im_start|>...<|im_sep|>...", "phi4"),
        ("...<|im_start|>...<end_of_utterance>...", "smolvlm"),
        ("...<|im_start|>...", "chatml"),
        ("...[gMASK]<sop>...", "chatglm4"),
        ("...<|assistant|>...<|user|>...</s>...", "falcon3"),
        ("...<|assistant|>...<|user|>...", "glmedge"),
        ("...bos_token + message['role']...", "monarch"),
        ("...GPT4 Correct ...", "openchat"),
        ("...USER: ...ASSISTANT: ...SYSTEM: ...", "vicuna-orca"),
        ("...### Instruction:...<|EOT|>...", "deepseek-coder"),
        ("...<｜User｜>...<｜Assistant｜>...", "deepseek3"),
        ("...[|system|]...[|endofturn|]...", "exaone3"),
        ("...<|role_start|>...", "megrez"),
        ("... Ассистент:...", "yandex"),
        ("...<role>ASSISTANT</role>...'HUMAN'...", "bailing"),
        ("...<|header_start|>...<|header_end|>...", "llama4"),
        ("...<|endofuserprompt|>...", "dots1"),
        ("...<|extra_0|>...<|extra_4|>...", "hunyuan-moe"),
        ("...<|start|>...<|channel|>...", "gpt-oss"),
        ("...<|im_middle|>...<|im_assistant|>...", "kimi-k2"),
        ("...<seed:bos>...", "seed-oss"),
        ("...Human: ...<|separator|>...", "grok2"),
    ]
    for jinja, want in cases:
        assert detect_template(jinja) == want, (jinja, want)
