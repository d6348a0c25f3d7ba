"""Guided grammar decoding: Lark-subset CFG -> Earley recognizer
(reference: outlines CFGGuide behavior, vllm guided_grammar dispatch)."""
import json

import pytest

from nmvllm_tpu.guided_decoding.grammar_fsm import (EarleyMachine,
                                                    GrammarError,
                                                    GrammarLogitsProcessor)

ARITH = r"""
start : expr
expr  : term (("+" | "-") term)*
term  : factor (("*" | "/") factor)*
factor: NUMBER | "(" expr ")"
NUMBER: /[0-9]+/
"""

JSON_G = r"""
start : value
value : object | array | STRING | NUMBER | "true" | "false" | "null"
object: "{" (pair ("," pair)*)? "}"
pair  : STRING ":" value
array : "[" (value ("," value)*)? "]"
STRING: /"[a-z]*"/
NUMBER: /-?[0-9]+/
"""


def _accepts(m: EarleyMachine, text: str) -> bool:
    st = m.initial_state()
    for ch in text:
        st = m.scan(st, ord(ch))
        if st is None:
            return False
    return m.is_accepting(st)


def _viable_prefix(m: EarleyMachine, text: str) -> bool:
    st = m.initial_state()
    for ch in text:
        st = m.scan(st, ord(ch))
        if st is None:
            return False
    return True


def test_arith_grammar_membership():
    m = EarleyMachine(ARITH)
    for good in ["1", "12+3", "1+2*3", "(1+2)*3", "((7))", "1*2/3-4"]:
        assert _accepts(m, good), good
    for bad in ["", "+", "1+", "1++2", "(1", "1)2", "a"]:
        assert not _accepts(m, bad), bad
    # Viable prefixes of valid strings stay alive.
    for pre in ["(", "(1+", "1+2*"]:
        assert _viable_prefix(m, pre), pre


def test_json_grammar_membership():
    m = EarleyMachine(JSON_G)
    for good in ['{}', '[]', '"abc"', '-12', 'true',
                 '{"a":1,"b":[true,null]}', '[{"x":"y"},2]']:
        assert _accepts(m, good), good
    for bad in ['{', '{"a"}', '[1,]', '{"a":}', 'tru', '"A"']:
        assert not _accepts(m, bad), bad


def test_recursion_depth():
    m = EarleyMachine(ARITH)
    deep = "(" * 30 + "5" + ")" * 30
    assert _accepts(m, deep)


def test_undefined_rule_raises():
    with pytest.raises(GrammarError):
        EarleyMachine("start : missing\n")


class _FakeTok:
    """Tiny char-level tokenizer for mask tests."""

    eos_token_id = 0
    all_special_ids = [0]

    def __init__(self, alphabet="0123456789+-*/()"):
        self.alphabet = list(alphabet)
        self.vocab_size = len(self.alphabet) + 1

    def decode(self, ids):
        return "".join(self.alphabet[i - 1] for i in ids if i > 0)


def test_grammar_processor_masks():
    tok = _FakeTok()
    proc = GrammarLogitsProcessor(tok, ARITH)

    def chars(allowed):
        return sorted(tok.alphabet[i - 1] for i in allowed if i > 0)

    a0 = proc.allowed_token_ids([])
    assert 0 not in a0  # empty string is not a valid expression
    assert set("0123456789(") <= set(chars(a0))
    assert "+" not in chars(a0)

    gen = [tok.alphabet.index("1") + 1]  # "1"
    a1 = proc.allowed_token_ids(gen)
    assert 0 in a1  # "1" is a complete expr -> EOS allowed
    assert {"+", "-", "*", "/"} <= set(chars(a1))
    assert "(" not in chars(a1)

    gen += [tok.alphabet.index("+") + 1]  # "1+"
    a2 = proc.allowed_token_ids(gen)
    assert 0 not in a2
    assert set("0123456789(") <= set(chars(a2))


def test_grammar_generates_valid_sentence():
    """Greedy walk through the mask always yields a grammar-valid string."""
    import numpy as np
    rng = np.random.default_rng(0)
    tok = _FakeTok()
    m = EarleyMachine(ARITH)
    proc = GrammarLogitsProcessor(tok, ARITH)
    gen = []
    for _ in range(40):
        allowed = sorted(proc.allowed_token_ids(gen))
        assert allowed
        pick = int(rng.choice(allowed))
        if pick == tok.eos_token_id:
            break
        gen.append(pick)
    text = tok.decode(gen)
    assert _accepts(m, text), text
