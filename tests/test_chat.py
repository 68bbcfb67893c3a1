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


def test_llama2_base_inlines_system_without_sys_tags():
    # base llama2 has no <<SYS>> support (llama-chat.cpp:276-307); the
    # tokenizer adds the leading BOS
    out = apply_chat_template("llama2", MSGS)
    assert out == ("[INST] You are helpful.\nHi [/INST]Hello!</s>"
                   "[INST] Bye [/INST]")


def test_llama2_sys_variants():
    out = apply_chat_template("llama2-sys", MSGS)
    assert out == ("[INST] <<SYS>>\nYou are helpful.\n<</SYS>>\n\n"
                   "Hi [/INST]Hello!</s>[INST] Bye [/INST]")
    out = apply_chat_template("llama2-sys-bos", MSGS)
    assert "</s><s>[INST] Bye [/INST]" in out
    out = apply_chat_template("llama2-sys-strip", [
        {"role": "system", "content": "  sys  "},
        {"role": "user", "content": " hi "}])
    assert out == "[INST] <<SYS>>\nsys\n<</SYS>>\n\nhi [/INST]"


def test_mistral_official_variants():
    msgs = [{"role": "system", "content": "sys"},
            {"role": "user", "content": "hi"},
            {"role": "assistant", "content": " yo "},
            {"role": "user", "content": "again"}]
    # v1: space before [INST] and [/INST]
    assert apply_chat_template("mistral-v1", msgs) == (
        " [INST] sys\n\nhi [/INST]  yo </s> [INST] again [/INST]")
    # v3: no leading space, trims the assistant message
    assert apply_chat_template("mistral-v3", msgs) == (
        "[INST] sys\n\nhi[/INST] yo</s>[INST] again[/INST]")
    # v3-tekken: no spaces at all, no trim
    assert apply_chat_template("mistral-v3-tekken", msgs) == (
        "[INST]sys\n\nhi[/INST] yo </s>[INST]again[/INST]")
    # v7: [SYSTEM_PROMPT] sections with trailing space
    assert apply_chat_template("mistral-v7", msgs) == (
        "[SYSTEM_PROMPT] sys[/SYSTEM_PROMPT][INST] hi[/INST]  yo </s>"
        "[INST] again[/INST]")
    # v7-tekken: same, no spaces (shipping format for current Mistral)
    assert apply_chat_template("mistral-v7-tekken", msgs) == (
        "[SYSTEM_PROMPT]sys[/SYSTEM_PROMPT][INST]hi[/INST] yo </s>"
        "[INST]again[/INST]")


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
        # mistral/llama2 family precedence (llama-chat.cpp:101-135)
        ("...[INST]...[SYSTEM_PROMPT]...", "mistral-v7"),
        ("...' [INST] ' + system_message... [INST]...", "mistral-v1"),
        ('...[AVAILABLE_TOOLS]..."[INST]"...', "mistral-v3-tekken"),
        ("...[AVAILABLE_TOOLS]...[INST]...", "mistral-v3"),
        ("...[INST]...content.strip()...<<SYS>>...", "llama2-sys-strip"),
        ("...bos_token + '[INST]...<<SYS>>...", "llama2-sys-bos"),
        ("...[INST]...<<SYS>>...", "llama2-sys"),
        ("...[INST]...[/INST]...", "llama2"),
        ("...<用户>...<AI>...", "minicpm"),
        ("...'Assistant: ' + message['content'] + eos_token...", "deepseek2"),
        ("...[|system|]...[|endofturn|]...[|tool|]...", "exaone4"),
    ]
    for jinja, want in cases:
        assert detect_template(jinja) == want, (jinja, want)


def test_known_templates_counts_46():
    """Every named template of the reference registry
    (src/llama-chat.h:8-54, 45 named + dots1) must be renderable."""
    names = set(known_templates())
    ref_names = {
        "chatml", "llama2", "llama2-sys", "llama2-sys-bos",
        "llama2-sys-strip", "mistral-v1", "mistral-v3", "mistral-v3-tekken",
        "mistral-v7", "mistral-v7-tekken", "phi3", "phi4", "falcon3",
        "zephyr", "monarch", "gemma", "orion", "openchat", "vicuna",
        "vicuna-orca", "deepseek", "deepseek2", "deepseek3", "command-r",
        "llama3", "chatglm3", "chatglm4", "glmedge", "minicpm", "exaone3",
        "exaone4", "rwkv-world", "granite", "gigachat", "megrez", "yandex",
        "bailing", "llama4", "smolvlm", "hunyuan-moe", "gpt-oss",
        "hunyuan-dense", "kimi-k2", "grok2", "seed-oss", "dots1",
    }
    assert len(ref_names) == 46
    missing = ref_names - names
    assert not missing, missing
    assert len(names) >= 46
