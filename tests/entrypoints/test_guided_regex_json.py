"""Guided regex/json decoding: the dependency-free regex->DFA compiler
(reference: outlines FSM behavior, vllm guided_decoding dispatch).

The `regex` package's partial-match API is used as a correctness oracle
for the DFA on host; engine-level enforcement is covered by the masked
sampler path shared with guided_choice.
"""
import json

import pytest
import regex as re_mod

from nmvllm_tpu.guided_decoding.json_schema import (json_object_regex,
                                                    schema_to_regex,
                                                    to_regex)
from nmvllm_tpu.guided_decoding.regex_fsm import RegexGuide


def _oracle_prefix_ok(pattern: str, text: str) -> bool:
    m = re_mod.fullmatch(pattern, text, partial=True)
    return m is not None


def _oracle_full(pattern: str, text: str) -> bool:
    m = re_mod.fullmatch(pattern, text)
    return m is not None


PATTERNS = [
    r"abc",
    r"a+b*c?",
    r"(ab|cd)+",
    r"[a-f0-9]{2,4}",
    r"-?\d+(\.\d+)?",
    r'"[^"]*"',
    r"(foo|bar|baz)(,(foo|bar|baz))*",
    r"a{3}",
    r"x(yz){1,2}w",
    r"[^abc]+d",
    r"\w+@\w+\.(com|org)",
]

PROBES = ["", "a", "ab", "abc", "abcd", "aabbc", "cdab", "12", "3f", "x",
          "-12.5", "-", '"hi"', '"', "foo,bar", "foo,", "aaa", "aaaa",
          "xyzw", "xyzyzw", "dd", "zd", "u@v.com", "u@v.", "u@v.net"]


@pytest.mark.parametrize("pattern", PATTERNS)
def test_dfa_matches_oracle(pattern):
    guide = RegexGuide(pattern)
    for text in PROBES:
        state = guide.walk_string(0, text)
        assert (state >= 0) == _oracle_prefix_ok(pattern, text), (
            pattern, text, "prefix viability")
        if state >= 0:
            assert guide.is_final(state) == _oracle_full(pattern, text), (
                pattern, text, "final-state")


def test_char_classes_and_escapes():
    guide = RegexGuide(r"[A-Z]\d\s?[^0-9]+")
    assert guide.is_final(guide.walk_string(0, "A5 xy"))
    assert guide.is_final(guide.walk_string(0, "B7z"))
    assert guide.walk_string(0, "a5") == -1
    assert guide.walk_string(0, "A5 123") == -1


def test_token_level_masks():
    guide = RegexGuide(r"(cat|car|dog)s?", eos_token_id=99)
    vocab = {0: "ca", 1: "t", 2: "r", 3: "dog", 4: "s", 5: "x", 99: None}
    strings = [vocab.get(i) for i in range(100)]
    guide.set_vocab(strings)
    allowed0 = guide.allowed_tokens(0)
    assert 0 in allowed0 and 3 in allowed0 and 5 not in allowed0
    assert 99 not in allowed0  # not final yet
    s1 = guide.step_token(0, 0)       # "ca"
    a1 = guide.allowed_tokens(s1)
    assert a1 == {1, 2}               # t | r
    s2 = guide.step_token(s1, 1)      # "cat"
    a2 = guide.allowed_tokens(s2)
    assert 4 in a2 and 99 in a2       # plural or eos


# ---------------------------------------------------------------- json
def _gen_from_schema(schema, value):
    """Check that a JSON-encoded value matches the schema's regex."""
    pattern = to_regex(schema)
    return _oracle_full(pattern, json.dumps(value, separators=(",", ":")))


def test_json_primitives():
    assert _gen_from_schema({"type": "integer"}, 42)
    assert _gen_from_schema({"type": "integer"}, -7)
    assert not _gen_from_schema({"type": "integer"}, 1.5)
    assert _gen_from_schema({"type": "number"}, 3.14)
    assert _gen_from_schema({"type": "boolean"}, True)
    assert _gen_from_schema({"type": "string"}, "hi there")
    assert _gen_from_schema({"type": "null"}, None)


def test_json_enum_const():
    assert _gen_from_schema({"enum": ["a", "b"]}, "a")
    assert not _gen_from_schema({"enum": ["a", "b"]}, "c")
    assert _gen_from_schema({"const": 5}, 5)


def test_json_object_required():
    schema = {
        "type": "object",
        "properties": {"name": {"type": "string"},
                       "age": {"type": "integer"}},
        "required": ["name", "age"],
    }
    assert _gen_from_schema(schema, {"name": "bob", "age": 3})
    assert not _gen_from_schema(schema, {"age": 3, "name": "bob"})  # order
    assert not _gen_from_schema(schema, {"name": "bob"})


def test_json_array_bounds():
    schema = {"type": "array", "items": {"type": "integer"},
              "minItems": 1, "maxItems": 3}
    assert _gen_from_schema(schema, [1])
    assert _gen_from_schema(schema, [1, 2, 3])
    assert not _gen_from_schema(schema, [])
    assert not _gen_from_schema(schema, [1, 2, 3, 4])


def test_json_nested_and_ref():
    schema = {
        "type": "object",
        "properties": {
            "tags": {"type": "array", "items": {"type": "string"}},
            "child": {"$ref": "#/$defs/leaf"},
        },
        "required": ["tags", "child"],
        "$defs": {"leaf": {"type": "object",
                           "properties": {"v": {"type": "number"}},
                           "required": ["v"]}},
    }
    assert _gen_from_schema(schema, {"tags": ["a", "b"],
                                     "child": {"v": 1.5}})


def test_json_anyof():
    schema = {"anyOf": [{"type": "integer"}, {"type": "string"}]}
    assert _gen_from_schema(schema, 3)
    assert _gen_from_schema(schema, "x")
    assert not _gen_from_schema(schema, True)


def test_json_object_regex_generic():
    pattern = json_object_regex()
    ok = json.dumps({"a": [1, "x"], "b": {"c": None}},
                    separators=(",", ":"))
    assert _oracle_full(pattern, ok)
    assert not _oracle_full(pattern, "[1,2]")


def test_schema_to_regex_accepts_string_input():
    pattern = schema_to_regex('{"type": "integer"}')
    assert _oracle_full(pattern, "123")


def test_dfa_on_schema_regex_end_to_end():
    # The DFA must accept a valid generation path token by token.
    schema = {"type": "object",
              "properties": {"ok": {"type": "boolean"}},
              "required": ["ok"]}
    pattern = to_regex(schema)
    guide = RegexGuide(pattern, eos_token_id=7)
    text = '{"ok":true}'
    state = guide.walk_string(0, text)
    assert state >= 0 and guide.is_final(state)
    assert guide.walk_string(0, '{"ok":maybe') == -1


def test_regex_processor_with_byte_tokenizer():
    from nmvllm_tpu.guided_decoding.regex_fsm import RegexLogitsProcessor
    from nmvllm_tpu.transformers_utils.tokenizer import ByteTokenizer
    tok = ByteTokenizer()
    proc = RegexLogitsProcessor(tok, r"(yes|no)!")
    first = proc.allowed_token_ids([])
    assert first == {ord("y"), ord("n")}
    after_y = proc.allowed_token_ids([ord("y")])
    assert after_y == {ord("e")}
    done = proc.allowed_token_ids(
        [ord("y"), ord("e"), ord("s"), ord("!")])
    assert done == {tok.eos_token_id}


def test_json_processor_with_byte_tokenizer():
    from nmvllm_tpu.guided_decoding import (
        get_guided_decoding_logits_processors_sync)
    from nmvllm_tpu.transformers_utils.tokenizer import ByteTokenizer

    class Req:
        guided_json = {"type": "object",
                       "properties": {"a": {"type": "integer"}},
                       "required": ["a"]}
        guided_regex = None
        guided_choice = None
        guided_grammar = None
        response_format = None

    tok = ByteTokenizer()
    procs = get_guided_decoding_logits_processors_sync(Req(), tok)
    assert len(procs) == 1
    proc = procs[0]
    assert proc.allowed_token_ids([]) == {ord("{")}
    path = [ord(c) for c in '{"a":1']
    allowed = proc.allowed_token_ids(path)
    digits = {ord(str(d)) for d in range(10)}
    assert digits <= allowed
    assert ord(",") not in allowed  # single-property object
    assert ord("}") in allowed
