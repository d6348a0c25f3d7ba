"""Guided (constrained) decoding.

Reference: vllm/model_executor/guided_decoding/__init__.py:13-29 (outlines /
lm-format-enforcer FSM logits processors, compiled in a thread pool).

TPU design: constraints compile to a per-request token-level automaton on
the host; each step the automaton's allowed-token mask for every guided row
is shipped with the sampling tensors and applied in-graph (the
``banned_tokens`` mechanism generalized to an allow-list mask). The native
backend implements `choice` via a token trie and `json`/`regex` via a
dependency-free regex->DFA compiler (regex_fsm.py); `grammar` via a
Lark-subset CFG -> char-level Earley recognizer (grammar_fsm.py).
"""
import asyncio
from typing import List, Optional

from nmvllm_tpu.guided_decoding.choice_fsm import ChoiceLogitsProcessor
from nmvllm_tpu.guided_decoding.regex_fsm import RegexLogitsProcessor


def _extract(request):
    return (getattr(request, "guided_json", None),
            getattr(request, "guided_regex", None),
            getattr(request, "guided_choice", None),
            getattr(request, "guided_grammar", None),
            getattr(request, "response_format", None))


async def get_guided_decoding_logits_processors(request, tokenizer
                                                ) -> List:
    json_c, regex_c, choice_c, grammar_c, response_format = _extract(request)
    given = [c for c in (json_c, regex_c, choice_c, grammar_c)
             if c is not None]
    if len(given) > 1:
        raise ValueError(
            "You can only use one kind of guided decoding "
            "(guided_json/guided_regex/guided_choice/guided_grammar).")
    loop = asyncio.get_event_loop()
    factory = _processor_factory(json_c, regex_c, choice_c, grammar_c,
                                 response_format)
    if factory is None:
        return []
    # FSM/DFA compilation can be slow (vocab walk): thread pool, like the
    # reference's outlines compile-in-executor.
    return [await loop.run_in_executor(None, factory, tokenizer)]


def _processor_factory(json_c, regex_c, choice_c, grammar_c,
                       response_format):
    if choice_c is not None:
        return lambda tok: ChoiceLogitsProcessor(tok, choice_c)
    if regex_c is not None:
        return lambda tok: RegexLogitsProcessor(tok, regex_c)
    if json_c is not None:
        from nmvllm_tpu.guided_decoding.json_schema import schema_to_regex
        pattern = schema_to_regex(json_c)
        return lambda tok: RegexLogitsProcessor(tok, pattern)
    if grammar_c is not None:
        from nmvllm_tpu.guided_decoding.grammar_fsm import (
            GrammarLogitsProcessor)
        return lambda tok: GrammarLogitsProcessor(tok, grammar_c)
    rf_type = getattr(response_format, "type", None) if response_format \
        is not None else None
    if rf_type is None and isinstance(response_format, dict):
        rf_type = response_format.get("type")
    if rf_type == "json_object":
        from nmvllm_tpu.guided_decoding.json_schema import json_object_regex
        pattern = json_object_regex()
        return lambda tok: RegexLogitsProcessor(tok, pattern)
    return None


def get_guided_decoding_logits_processors_sync(request, tokenizer) -> List:
    json_c, regex_c, choice_c, grammar_c, response_format = _extract(request)
    factory = _processor_factory(json_c, regex_c, choice_c, grammar_c,
                                 response_format)
    return [factory(tokenizer)] if factory is not None else []
