"""Model-native chat output parsing + Jinja chat templating.

Counterpart of the reference's common/chat.cpp + common/chat-parser.cpp
(minja engine + per-format tool-call parsers): GGUF chat templates render
through real Jinja (jinja2 plays the vendored minja's role), the template
string identifies the model's native tool-call FORMAT, and responses parse
into {content, reasoning_content, tool_calls} per that format's syntax —
the model emits its own calling convention, no grammar forcing required.

Formats (marker syntax per common/chat.cpp):
- hermes      : <tool_call>{"name":…,"arguments":{…}}</tool_call>  (also
                Qwen2/3; chat.cpp:2142-2249)
- mistral_nemo: [TOOL_CALLS][{"name":…,"arguments":{…},"id":…}, …]
                (chat.cpp:978-1065)
- llama_3_x   : {"name":…,"parameters":{…}} bare JSON, or the builtin
                <|python_tag|>name.call(k=v,…) form (chat.cpp:1201-1267)
- deepseek_r1 : <｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function<｜tool▁sep｜>
                NAME\n```json\nARGS\n```<｜tool▁call▁end｜>… (chat.cpp:1509-1596)
- functionary_v3_2: >>>NAME\nARGS_JSON (chat.cpp)
- generic     : one JSON object {"name":…,"arguments":{…}} or
                {"tool_calls":[…]} (the grammar-forced fallback)
- content_only: no tool syntax.

Reasoning blocks (<think>…</think>) split off for every format
(common_chat_parser reasoning handling).
"""

from __future__ import annotations

import json
import re
import uuid


def detect_format(template: str | None) -> str:
    """Chat-template string -> native tool-call format (the detection
    heuristics of common_chat_templates_apply)."""
    if not template:
        return "content_only"
    if "<tool_call>" in template:
        return "hermes"
    if "[TOOL_CALLS]" in template:
        return "mistral_nemo"
    if "tool▁calls▁begin" in template or "tool_calls_begin" in template:
        return "deepseek_r1"
    if ">>>all" in template:
        return "functionary_v3_2"
    if "<|python_tag|>" in template or "ipython" in template:
        return "llama_3_x"
    return "generic"


def _mk_call(name: str, arguments) -> dict:
    if not isinstance(arguments, str):
        arguments = json.dumps(arguments)
    return {"id": f"call_{uuid.uuid4().hex[:12]}", "type": "function",
            "function": {"name": name, "arguments": arguments}}


def _try_json(s: str):
    try:
        return json.loads(s)
    except Exception:  # noqa: BLE001
        return None


def _try_json_prefix(s: str):
    """Parse a leading JSON value, tolerating trailing text (a stop-token
    race can leave content after the call payload). Returns (value, rest)."""
    try:
        val, end = json.JSONDecoder().raw_decode(s)
        return val, s[end:]
    except Exception:  # noqa: BLE001
        return None, s


_THINK_RE = re.compile(r"<think>(.*?)</think>\s*", re.S)
_HERMES_RE = re.compile(r"<tool_call>\s*(\{.*?\})\s*</tool_call>", re.S)
_DSR1_CALL_RE = re.compile(
    r"<｜tool▁call▁begin｜>(?:function)?(?:<｜tool▁sep｜>)?"
    r"\s*([\w.\-]+)\s*\n```json\n(.*?)\n```\s*<｜tool▁call▁end｜>", re.S)
_PYTAG_RE = re.compile(r"<\|python_tag\|>([\w.\-]+)\.call\((.*)\)\s*$", re.S)
_FUNCTIONARY_RE = re.compile(r">>>([\w.\-]+)\n(\{.*?\})(?=\s*>>>|\s*$)", re.S)


def parse_response(text: str, fmt: str = "generic") -> dict:
    """-> {"content", "reasoning_content", "tool_calls"} (the
    common_chat_msg contract)."""
    reasoning = None
    m = _THINK_RE.search(text)
    if m:
        reasoning = m.group(1).strip()
        text = _THINK_RE.sub("", text, count=1)

    calls: list[dict] = []
    content = text

    if fmt == "hermes":
        for m in _HERMES_RE.finditer(text):
            obj = _try_json(m.group(1))
            if obj and "name" in obj:
                calls.append(_mk_call(obj["name"],
                                      obj.get("arguments", obj.get("parameters", {}))))
        content = _HERMES_RE.sub("", text).strip()
    elif fmt == "mistral_nemo":
        at = text.find("[TOOL_CALLS]")
        if at != -1:
            arr, rest = _try_json_prefix(
                text[at + len("[TOOL_CALLS]"):].strip())
            if isinstance(arr, dict):
                arr = [arr]
            for obj in arr or []:
                if isinstance(obj, dict) and "name" in obj:
                    calls.append(_mk_call(obj["name"], obj.get("arguments", {})))
            content = ((text[:at] + rest).strip() if calls else text)
    elif fmt == "deepseek_r1":
        for m in _DSR1_CALL_RE.finditer(text):
            args = _try_json(m.group(2))
            calls.append(_mk_call(m.group(1), args if args is not None
                                  else m.group(2)))
        if calls:
            content = text[: text.find("<｜tool▁calls▁begin｜>")
                           if "<｜tool▁calls▁begin｜>" in text else
                           text.find("<｜tool▁call▁begin｜>")].strip()
    elif fmt == "llama_3_x":
        m = _PYTAG_RE.search(text)
        if m:  # builtin-tool python-call syntax
            kwargs = {}
            for kv in re.findall(r"([\w]+)\s*=\s*(\"[^\"]*\"|[^,]+)",
                                 m.group(2)):
                v = _try_json(kv[1])
                kwargs[kv[0]] = v if v is not None else kv[1].strip('"')
            calls.append(_mk_call(m.group(1), kwargs))
            content = text[: m.start()].strip()
        else:
            obj = _try_json(text.strip())
            if isinstance(obj, dict) and "name" in obj and (
                    "parameters" in obj or "arguments" in obj):
                calls.append(_mk_call(
                    obj["name"], obj.get("parameters",
                                         obj.get("arguments", {}))))
                content = ""
    elif fmt == "functionary_v3_2":
        for m in _FUNCTIONARY_RE.finditer(text):
            if m.group(1) == "all":
                continue
            args = _try_json(m.group(2))
            if args is not None:
                calls.append(_mk_call(m.group(1), args))
        if calls:
            content = text[: text.find(">>>")].strip()
    elif fmt == "generic":
        obj = _try_json(text.strip())
        if isinstance(obj, dict):
            if "tool_calls" in obj:
                for c in obj["tool_calls"]:
                    if "name" in c:
                        calls.append(_mk_call(c["name"],
                                              c.get("arguments", {})))
                content = str(obj.get("response", ""))
            elif "name" in obj and "arguments" in obj:
                calls.append(_mk_call(obj["name"], obj["arguments"]))
                content = ""

    return {"content": content, "reasoning_content": reasoning,
            "tool_calls": calls}


# ---------------------------------------------------------------------------
# Jinja chat templating (minja role)
# ---------------------------------------------------------------------------

def apply_jinja_template(template: str, messages: list[dict],
                         tools: list[dict] | None = None,
                         add_generation_prompt: bool = True,
                         bos_token: str = "", eos_token: str = "",
                         **extra) -> str:
    """Render a GGUF `tokenizer.chat_template` with jinja2 under the HF
    chat-template conventions (the reference renders these with vendored
    minja, common/chat.cpp common_chat_templates_apply)."""
    import datetime

    import jinja2

    env = jinja2.Environment(
        trim_blocks=True, lstrip_blocks=True,
        undefined=jinja2.ChainableUndefined,
    )

    def raise_exception(msg):
        raise jinja2.TemplateError(msg)

    def strftime_now(fmt):
        return datetime.datetime.now().strftime(fmt)

    env.globals.update(raise_exception=raise_exception,
                       strftime_now=strftime_now)
    env.filters["tojson"] = lambda x, **kw: json.dumps(x, **kw)
    return env.from_string(template).render(
        messages=messages, tools=tools or None,
        add_generation_prompt=add_generation_prompt,
        bos_token=bos_token, eos_token=eos_token, **extra)
