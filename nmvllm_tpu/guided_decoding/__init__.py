"""Guided (constrained) decoding.

Reference: vllm/model_executor/guided_decoding/__init__.py:13-29 (outlines /
lm-format-enforcer FSM logits processors, compiled in a thread pool).

TPU design: constraints compile to a per-request token-level automaton on
the host; each step the automaton's allowed-token mask for every guided row
is shipped with the sampling tensors and applied in-graph (the
``banned_tokens`` mechanism generalized to an allow-list mask). The native
backend implements `choice` via a token trie; `json`/`regex`/`grammar` are
staged for a later round.
"""
import asyncio
from typing import List, Optional

from nmvllm_tpu.guided_decoding.choice_fsm import ChoiceLogitsProcessor


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
    if choice_c is not None:
        loop = asyncio.get_event_loop()
        return [await loop.run_in_executor(
            None, ChoiceLogitsProcessor, tokenizer, choice_c)]
    if json_c is not None or regex_c is not None or grammar_c is not None:
        raise ValueError(
            "guided_json/guided_regex/guided_grammar are not yet supported "
            "by the native TPU guided-decoding backend; use guided_choice.")
    return []


def get_guided_decoding_logits_processors_sync(request, tokenizer) -> List:
    json_c, regex_c, choice_c, grammar_c, _ = _extract(request)
    if choice_c is not None:
        return [ChoiceLogitsProcessor(tokenizer, choice_c)]
    if json_c is not None or regex_c is not None or grammar_c is not None:
        raise ValueError("Only guided_choice is supported currently.")
    return []
