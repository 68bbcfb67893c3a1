"""GBNF grammar engine + JSON-schema converter tests.

Mirrors the reference's test-grammar-parser / test-grammar-integration /
test-json-schema-to-grammar coverage (tests/CMakeLists.txt:138-150).
"""

import json

import pytest

from omni_tpu.grammar import (Grammar, GrammarError, VocabTrie,
                              json_schema_to_gbnf, parse_gbnf)


def accepts(g: Grammar, text: str, complete: bool = True) -> bool:
    g = g.copy()
    try:
        g.accept(text)
    except GrammarError:
        return False
    return g.eos_allowed if complete else True


# ---------------------------------------------------------------------------
# parser + matcher
# ---------------------------------------------------------------------------

def test_literal_and_alternates():
    g = parse_gbnf('root ::= "ab" | "cd"')
    assert accepts(g, "ab")
    assert accepts(g, "cd")
    assert not accepts(g, "ad")
    assert not accepts(g, "a")  # incomplete


def test_char_class_and_ranges():
    g = parse_gbnf("root ::= [a-z0-9_]")
    for ch in "az059_":
        assert accepts(g, ch)
    assert not accepts(g, "A")
    g = parse_gbnf('root ::= [^a-z] ')
    assert accepts(g, "A")
    assert not accepts(g, "q")


def test_repetition_star_plus_question():
    g = parse_gbnf('root ::= "a"* "b"+ "c"?')
    assert accepts(g, "b")
    assert accepts(g, "aaabbc")
    assert accepts(g, "bbb")
    assert not accepts(g, "a")
    assert not accepts(g, "c")


def test_bounded_repetition():
    g = parse_gbnf('root ::= "x"{2,4}')
    assert not accepts(g, "x")
    assert accepts(g, "xx")
    assert accepts(g, "xxxx")
    assert not accepts(g, "xxxxx")
    g = parse_gbnf('root ::= "x"{3}')
    assert accepts(g, "xxx")
    assert not accepts(g, "xx")
    g = parse_gbnf('root ::= "x"{2,}')
    assert accepts(g, "xxxxxxx")
    assert not accepts(g, "x")


def test_nested_rules_and_groups():
    g = parse_gbnf('''
        root  ::= expr
        expr  ::= term (("+" | "-") term)*
        term  ::= [0-9]+
    ''')
    assert accepts(g, "1+2-33")
    assert accepts(g, "7")
    assert not accepts(g, "1+")
    assert not accepts(g, "+1")


def test_escapes():
    g = parse_gbnf(r'root ::= "\"" [a] "\\" "\n" "\x41" "B"')
    assert accepts(g, '"a\\\nAB')


def test_comments_and_multiline():
    g = parse_gbnf('''
        # a grammar
        root ::= item   # trailing comment
        item ::= "hi" | "yo"
    ''')
    assert accepts(g, "hi")
    assert accepts(g, "yo")


def test_undefined_and_missing_root():
    with pytest.raises(GrammarError):
        parse_gbnf('root ::= nope')
    with pytest.raises(GrammarError):
        parse_gbnf('a ::= "x"')


def test_incremental_accept_and_eos():
    g = parse_gbnf('root ::= "ab" "c"*')
    g.accept("a")
    assert not g.eos_allowed
    g.accept("b")
    assert g.eos_allowed
    g.accept("cc")
    assert g.eos_allowed
    assert g.accepts_prefix("c")
    assert not g.accepts_prefix("d")


def test_vocab_trie_filtering():
    g = parse_gbnf('root ::= "yes" | "no"')
    vocab = [(0, "y"), (1, "yes"), (2, "no"), (3, "maybe"), (4, "n"),
             (5, "es"), (6, "<eos>")]
    trie = VocabTrie(vocab)
    allowed = set(g.allowed_tokens(trie))
    assert allowed == {0, 1, 2, 4}
    g.accept("y")
    allowed = set(g.allowed_tokens(trie))
    assert allowed == {5}  # only "es" completes "y"


def test_exhausted():
    g = parse_gbnf('root ::= "hi"')
    g.accept("hi")
    assert g.exhausted and g.eos_allowed


# ---------------------------------------------------------------------------
# JSON schema -> GBNF
# ---------------------------------------------------------------------------

def roundtrip(schema, good, bad):
    gbnf = json_schema_to_gbnf(schema)
    g = parse_gbnf(gbnf)
    for doc in good:
        text = json.dumps(doc) if not isinstance(doc, str) else doc
        assert accepts(g, text), f"{text} should match\n{gbnf}"
    for doc in bad:
        text = json.dumps(doc) if not isinstance(doc, str) else doc
        assert not accepts(g, text), f"{text} should NOT match\n{gbnf}"


def test_schema_primitives():
    roundtrip({"type": "boolean"}, [True, False], ['1', '"x"'])
    roundtrip({"type": "integer"}, [0, -5, 123], ['1.5', '"a"', '01'])
    roundtrip({"type": "number"}, [0, -5, 1.25, 1e3], ['"a"'])
    roundtrip({"type": "string"}, ['"hi"', '"a\\nb"', '""'], ['hi', '123'])
    roundtrip({"type": "null"}, [None], ['0'])


def test_schema_enum_const():
    roundtrip({"enum": ["a", "b", 3]}, ['"a"', '"b"', '3'], ['"c"', '4'])
    roundtrip({"const": 42}, ['42'], ['41', '"42"'])


def test_schema_object_required_optional():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
        },
        "required": ["name"],
        "additionalProperties": False,
    }
    roundtrip(
        schema,
        [{"name": "x"}, {"name": "x", "age": 3}],
        [{"age": 3}, {"name": 1}, {"name": "x", "extra": 1}],
    )


def test_schema_all_optional_object():
    schema = {
        "type": "object",
        "properties": {"a": {"type": "integer"}, "b": {"type": "boolean"}},
        "additionalProperties": False,
    }
    roundtrip(schema, [{}, {"a": 1}, {"b": True}, {"a": 1, "b": False}],
              [{"c": 1}])


def test_schema_array():
    roundtrip({"type": "array", "items": {"type": "integer"}},
              [[], [1], [1, 2, 3]], [['"a"'], '"x"'])
    roundtrip({"type": "array", "items": {"type": "integer"},
               "minItems": 2, "maxItems": 3},
              [[1, 2], [1, 2, 3]], [[1], [1, 2, 3, 4]])
    roundtrip({"type": "array",
               "prefixItems": [{"type": "integer"}, {"type": "string"}]},
              [[1, "a"]], [[1], ["a", 1]])


def test_schema_anyof_ref():
    schema = {
        "$defs": {"id": {"type": "integer"}},
        "anyOf": [{"$ref": "#/$defs/id"}, {"type": "string"}],
    }
    roundtrip(schema, ['5', '"x"'], ['true'])


def test_schema_nested():
    schema = {
        "type": "object",
        "properties": {
            "items": {"type": "array",
                      "items": {"type": "object",
                                "properties": {"q": {"type": "string"}},
                                "required": ["q"],
                                "additionalProperties": False}},
        },
        "required": ["items"],
        "additionalProperties": False,
    }
    roundtrip(schema, [{"items": []}, {"items": [{"q": "a"}, {"q": "b"}]}],
              [{"items": [{"p": "a"}]}])


def test_schema_string_length():
    roundtrip({"type": "string", "minLength": 2, "maxLength": 3},
              ['"ab"', '"abc"'], ['"a"', '"abcd"'])


def test_schema_type_list():
    roundtrip({"type": ["integer", "null"]}, ['3', 'null'], ['"x"'])
