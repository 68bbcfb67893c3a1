"""Tool-call format parsers + Jinja chat templating (common/chat.cpp +
chat-parser.cpp counterpart)."""

import json

from omni_tpu.chat_parser import (apply_jinja_template, detect_format,
                                  parse_response)


def _one_call(parsed, name):
    assert len(parsed["tool_calls"]) == 1
    fn = parsed["tool_calls"][0]["function"]
    assert fn["name"] == name
    return json.loads(fn["arguments"])


def test_detect_format():
    assert detect_format("{% if x %}<tool_call>{% endif %}") == "hermes"
    assert detect_format("...[TOOL_CALLS]...") == "mistral_nemo"
    assert detect_format("a tool▁calls▁begin b") == "deepseek_r1"
    assert detect_format("x >>>all y") == "functionary_v3_2"
    assert detect_format("<|python_tag|>") == "llama_3_x"
    assert detect_format("{{ messages }}") == "generic"
    assert detect_format(None) == "content_only"


def test_hermes_parse():
    text = ('I will check the weather.\n<tool_call>\n'
            '{"name": "get_weather", "arguments": {"city": "Paris"}}\n'
            '</tool_call>')
    p = parse_response(text, "hermes")
    args = _one_call(p, "get_weather")
    assert args == {"city": "Paris"}
    assert p["content"] == "I will check the weather."


def test_hermes_multiple_calls():
    text = ('<tool_call>{"name": "a", "arguments": {}}</tool_call>'
            '<tool_call>{"name": "b", "arguments": {"x": 1}}</tool_call>')
    p = parse_response(text, "hermes")
    assert [c["function"]["name"] for c in p["tool_calls"]] == ["a", "b"]


def test_mistral_nemo_parse():
    text = ('[TOOL_CALLS][{"name": "sum", "arguments": {"a": 1, "b": 2}, '
            '"id": "123456789"}]')
    p = parse_response(text, "mistral_nemo")
    assert _one_call(p, "sum") == {"a": 1, "b": 2}


def test_llama3_json_and_python_tag():
    p = parse_response('{"name": "lookup", "parameters": {"q": "x"}}',
                       "llama_3_x")
    assert _one_call(p, "lookup") == {"q": "x"}
    p2 = parse_response(
        '<|python_tag|>brave_search.call(query="llamas")', "llama_3_x")
    assert _one_call(p2, "brave_search") == {"query": "llamas"}


def test_deepseek_r1_parse_with_reasoning():
    text = ("<think>weigh the options</think>"
            "Sure.<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function"
            "<｜tool▁sep｜>get_time\n```json\n{\"tz\": \"UTC\"}\n```"
            "<｜tool▁call▁end｜><｜tool▁calls▁end｜>")
    p = parse_response(text, "deepseek_r1")
    assert p["reasoning_content"] == "weigh the options"
    assert _one_call(p, "get_time") == {"tz": "UTC"}
    assert p["content"] == "Sure."


def test_functionary_v3_2_parse():
    text = '>>>get_weather\n{"city": "Tokyo"}'
    p = parse_response(text, "functionary_v3_2")
    assert _one_call(p, "get_weather") == {"city": "Tokyo"}


def test_generic_parse_and_content_only():
    p = parse_response('{"name": "f", "arguments": {"k": 2}}', "generic")
    assert _one_call(p, "f") == {"k": 2}
    p2 = parse_response("just text", "content_only")
    assert p2["tool_calls"] == [] and p2["content"] == "just text"


def test_reasoning_split_any_format():
    p = parse_response("<think>hmm</think>answer", "content_only")
    assert p["reasoning_content"] == "hmm" and p["content"] == "answer"


CHATML_TMPL = (
    "{% for message in messages %}"
    "{{'<|im_start|>' + message['role'] + '\n' + message['content'] "
    "+ '<|im_end|>' + '\n'}}{% endfor %}"
    "{% if add_generation_prompt %}{{ '<|im_start|>assistant\n' }}"
    "{% endif %}")


def test_jinja_template_render():
    out = apply_jinja_template(
        CHATML_TMPL,
        [{"role": "system", "content": "be brief"},
         {"role": "user", "content": "hi"}])
    assert out == ("<|im_start|>system\nbe brief<|im_end|>\n"
                   "<|im_start|>user\nhi<|im_end|>\n<|im_start|>assistant\n")


def test_jinja_template_with_tools():
    tmpl = ("{% if tools %}TOOLS:{% for t in tools %}"
            "{{ t.function.name }};{% endfor %}\n{% endif %}"
            "{% for m in messages %}{{ m.content }}{% endfor %}")
    out = apply_jinja_template(
        tmpl, [{"role": "user", "content": "go"}],
        tools=[{"type": "function", "function": {"name": "f1"}},
               {"type": "function", "function": {"name": "f2"}}])
    # trim_blocks eats the newline after {% endif %} (HF convention)
    assert out == "TOOLS:f1;f2;go"
    # no tools -> the block disappears entirely
    out2 = apply_jinja_template(tmpl, [{"role": "user", "content": "go"}])
    assert out2 == "go"


def test_render_prompt_family_fallback(tmp_path):
    """A GGUF template the mini-Jinja engine cannot render (raises) must
    fall back to the built-in family renderer detected from its markers —
    the reference's non-Jinja llm_chat_apply_template path — instead of
    silently mis-rendering ChatML (round-4 verdict: mistral-v7-tekken and
    llama2-sys-strip checkpoints)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from omni_tpu.core import GGMLType, GGUFReader
    from omni_tpu.models import qwen3
    from omni_tpu.runtime import Context
    from omni_tpu.server.main import ServerState
    from omni_tpu.testing import write_tiny_qwen3
    from omni_tpu.tokenizer import build_tokenizer

    path = tmp_path / "m.gguf"
    write_tiny_qwen3(path, n_layers=1, d_model=64, n_heads=4, n_kv_heads=2,
                     head_dim=16, d_ff=64, n_vocab=300, qtype=GGMLType.F32,
                     byte_tokenizer=True)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    ctx = Context(cfg, qwen3.load_params(reader), qwen3.forward, qwen3.embed,
                  n_ctx=128)
    # real mistral templates guard role order with raise_exception; markers
    # identify the family even when the render path is unsupported
    tmpl = ("{{ raise_exception('unsupported') }}"
            "[SYSTEM_PROMPT][INST][/INST]")
    state = ServerState(ctx, build_tokenizer(reader.kv), n_slots=1,
                        chat_template=tmpl)
    msgs = [{"role": "system", "content": "s"},
            {"role": "user", "content": "u"}]
    p, fmt = state.render_prompt(msgs)
    assert p == "[SYSTEM_PROMPT] s[/SYSTEM_PROMPT][INST] u[/INST]"
    assert fmt == "generic"
    # a renderable template still goes through Jinja (priority unchanged)
    state2 = ServerState(ctx, build_tokenizer(reader.kv), n_slots=1,
                         chat_template=CHATML_TMPL)
    p2, _ = state2.render_prompt(msgs)
    assert p2.startswith("<|im_start|>system\ns<|im_end|>")
    # no template at all -> None (caller falls back to ChatML default)
    state3 = ServerState(ctx, build_tokenizer(reader.kv), n_slots=1)
    assert state3.render_prompt(msgs) == (None, "generic")


def test_server_uses_gguf_chat_template(tmp_path):
    """End-to-end: a GGUF chat template drives /v1/chat/completions prompt
    construction (ChatML here, so output tokens are well-formed)."""
    import threading
    import urllib.request

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from omni_tpu.core import GGMLType, GGUFReader
    from omni_tpu.models import qwen3
    from omni_tpu.runtime import Context
    from omni_tpu.server.main import ServerState, serve
    from omni_tpu.testing import write_tiny_qwen3
    from omni_tpu.tokenizer import build_tokenizer

    path = tmp_path / "m.gguf"
    write_tiny_qwen3(path, n_layers=2, d_model=64, n_heads=4, n_kv_heads=2,
                     head_dim=16, d_ff=64, n_vocab=300, qtype=GGMLType.F32,
                     byte_tokenizer=True)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    ctx = Context(cfg, qwen3.load_params(reader), qwen3.forward, qwen3.embed,
                  n_ctx=512)
    state = ServerState(ctx, build_tokenizer(reader.kv), n_slots=2,
                        chat_template=CHATML_TMPL)
    assert state.chat_format == "generic"
    httpd = serve(state, "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/chat/completions",
        json.dumps({"messages": [{"role": "user", "content": "hey"}],
                    "max_tokens": 4}).encode(),
        {"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        out = json.loads(r.read())
    assert out["choices"][0]["message"]["role"] == "assistant"
    httpd.shutdown()


def test_mistral_nemo_trailing_text():
    """A stop-token race can leave text after the JSON payload; the call
    must still parse (leading-JSON tolerance) instead of leaking raw
    [TOOL_CALLS] syntax as content."""
    text = ('[TOOL_CALLS][{"name": "sum", "arguments": {"a": 1}}] Done.')
    p = parse_response(text, "mistral_nemo")
    assert _one_call(p, "sum") == {"a": 1}
    assert "[TOOL_CALLS]" not in p["content"]
    assert "Done." in p["content"]


def test_detect_format_round2_families():
    assert detect_format("<|START_THINKING|><|START_ACTION|>") == "command_r7b"
    assert detect_format("x <seed:think> y") == "seed_oss"
    assert detect_format("<|channel|>final<|message|>") == "gpt_oss"
    assert detect_format("<TOOLCALL>[...]</TOOLCALL>") == "nemotron_v2"
    assert detect_format("say functools[ stuff") == "firefunction_v2"
    assert detect_format("<|tool_call|>[]") == "granite"
    assert detect_format("[THINK]x[/THINK]") == "magistral"
    assert detect_format("call <function=foo> now") == "functionary_v3_1"


def test_command_r7b_parse():
    text = ("<|START_THINKING|>plan the call<|END_THINKING|>"
            '<|START_ACTION|>[{"tool_call_id": "0", "tool_name": "get_time",'
            ' "parameters": {"tz": "UTC"}}]<|END_ACTION|>')
    p = parse_response(text, "command_r7b")
    assert p["reasoning_content"] == "plan the call"
    assert _one_call(p, "get_time") == {"tz": "UTC"}
    # plain response path
    p = parse_response("<|START_RESPONSE|>hey there<|END_RESPONSE|>",
                       "command_r7b")
    assert p["content"] == "hey there" and not p["tool_calls"]


def test_granite_parse():
    text = ('<think>hmm</think><response>done</response>'
            '<|tool_call|>[{"name": "lookup", "arguments": {"q": "x"}}]')
    p = parse_response(text, "granite")
    assert p["reasoning_content"] == "hmm"
    assert _one_call(p, "lookup") == {"q": "x"}
    assert p["content"] == "done"


def test_nemotron_v2_parse():
    text = ('<think>t</think>ok '
            '<TOOLCALL>[{"name": "add", "arguments": {"a": 2}}]</TOOLCALL>')
    p = parse_response(text, "nemotron_v2")
    assert p["reasoning_content"] == "t"
    assert _one_call(p, "add") == {"a": 2}
    assert p["content"] == "ok"


def test_seed_oss_parse():
    text = ("<seed:think>reason</seed:think>calling now "
            "<seed:tool_call><function=search>"
            "<parameter=query>cats</parameter>"
            "<parameter=limit>3</parameter>"
            "</function></seed:tool_call>")
    p = parse_response(text, "seed_oss")
    assert p["reasoning_content"] == "reason"
    assert _one_call(p, "search") == {"query": "cats", "limit": 3}
    assert p["content"] == "calling now"


def test_firefunction_v2_parse():
    text = ' functools[{"name": "ping", "arguments": {"host": "a"}}]'
    p = parse_response(text, "firefunction_v2")
    assert _one_call(p, "ping") == {"host": "a"}
    assert p["content"] == ""


def test_functionary_v3_1_parse():
    text = ('hi <function=mul>{"x": 4}</function>')
    p = parse_response(text, "functionary_v3_1")
    assert _one_call(p, "mul") == {"x": 4}
    assert p["content"] == "hi"
    p = parse_response("<|python_tag|>print(1)", "functionary_v3_1")
    assert _one_call(p, "python") == {"code": "print(1)"}


def test_magistral_parse():
    text = ('[THINK]let me[/THINK]'
            '[TOOL_CALLS][{"name": "f", "arguments": {"k": 1}}]')
    p = parse_response(text, "magistral")
    assert p["reasoning_content"] == "let me"
    assert _one_call(p, "f") == {"k": 1}


def test_gpt_oss_parse():
    text = ("<|channel|>analysis<|message|>think hard<|end|>"
            "<|start|>assistant to=functions.get_weather<|channel|>"
            'commentary json<|message|>{"city": "SF"}<|end|>'
            "<|start|>assistant<|channel|>final<|message|>It is sunny.")
    p = parse_response(text, "gpt_oss")
    assert p["reasoning_content"] == "think hard"
    assert _one_call(p, "get_weather") == {"city": "SF"}
    assert p["content"] == "It is sunny."


def test_server_hermes_forced_tool_call(tmp_path):
    """End-to-end: a hermes-format template + tool_choice=required makes
    the server apply the <tool_call> wrapper grammar — the (random) model
    is FORCED to emit a well-formed call that parses into tool_calls."""
    import threading
    import urllib.request

    import jax

    jax.config.update("jax_platforms", "cpu")

    from omni_tpu.core import GGMLType, GGUFReader
    from omni_tpu.models import qwen3
    from omni_tpu.runtime import Context
    from omni_tpu.server.main import ServerState, serve
    from omni_tpu.testing import write_tiny_qwen3
    from omni_tpu.tokenizer import build_tokenizer

    hermes_tmpl = (CHATML_TMPL.replace(
        "{% for message in messages %}",
        "{% if tools %}<tool_call></tool_call>{% endif %}"
        "{% for message in messages %}"))
    path = tmp_path / "m.gguf"
    write_tiny_qwen3(path, n_layers=2, d_model=64, n_heads=4, n_kv_heads=2,
                     head_dim=16, d_ff=64, n_vocab=300, qtype=GGMLType.F32,
                     byte_tokenizer=True)
    reader = GGUFReader(path)
    cfg = qwen3.Qwen3Config.from_gguf(reader.kv)
    ctx = Context(cfg, qwen3.load_params(reader), qwen3.forward, qwen3.embed,
                  n_ctx=1024)
    state = ServerState(ctx, build_tokenizer(reader.kv), n_slots=2,
                        chat_template=hermes_tmpl)
    assert state.chat_format == "hermes"
    httpd = serve(state, "127.0.0.1", 0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/chat/completions",
        json.dumps({
            "messages": [{"role": "user", "content": "add 2 and 3"}],
            "max_tokens": 96,
            "tools": [{"type": "function", "function": {
                "name": "add",
                "parameters": {"type": "object",
                               "properties": {"a": {"type": "integer"}},
                               "required": ["a"],
                               "additionalProperties": False}}}],
            "tool_choice": "required",
        }).encode(),
        {"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        out = json.loads(r.read())
    msg = out["choices"][0]["message"]
    assert msg["tool_calls"], out
    assert msg["tool_calls"][0]["function"]["name"] == "add"
    args = json.loads(msg["tool_calls"][0]["function"]["arguments"])
    assert isinstance(args.get("a"), int)
    httpd.shutdown()


def test_apertus_parse():
    """Apertus: <|inner_prefix|> reasoning + <|tools_prefix|> single-key
    short-form calls (chat.cpp:2471-2500)."""
    text = ("<|inner_prefix|>let me check<|inner_suffix|>sure "
            '<|tools_prefix|>[{"get_weather": {"city": "Bern"}}, '
            '{"search": {"q": "x"}}]<|tools_suffix|>')
    p = parse_response(text, "apertus")
    assert p["reasoning_content"] == "let me check"
    assert len(p["tool_calls"]) == 2
    import json as _json
    f0 = p["tool_calls"][0]["function"]
    assert f0["name"] == "get_weather"
    assert _json.loads(f0["arguments"]) == {"city": "Bern"}
    assert p["content"] == "sure"


def test_apertus_no_tools_passthrough():
    p = parse_response("plain answer", "apertus")
    assert p["content"] == "plain answer"
    assert not p["tool_calls"]


def test_apertus_detected_from_template():
    assert detect_format("...<|tools_prefix|>...") == "apertus"
    assert detect_format("{% if thinking %}<|inner_prefix|>{% endif %}") == "apertus"
