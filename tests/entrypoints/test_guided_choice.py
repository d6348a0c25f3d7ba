"""Guided-choice trie processor tests (reference tests for guided
decoding dispatch, model_executor/guided_decoding)."""
import numpy as np
import pytest

from nmvllm_tpu.guided_decoding.choice_fsm import ChoiceLogitsProcessor
from nmvllm_tpu.transformers_utils.tokenizer import ByteTokenizer


def test_choice_trie_allows_only_continuations():
    tok = ByteTokenizer()
    proc = ChoiceLogitsProcessor(tok, ["cat", "car", "dog"])
    first = proc.allowed_token_ids([])
    assert first == {ord("c"), ord("d")}
    after_c = proc.allowed_token_ids([ord("c")])
    assert after_c == {ord("a")}
    after_ca = proc.allowed_token_ids([ord("c"), ord("a")])
    assert after_ca == {ord("t"), ord("r")}
    done = proc.allowed_token_ids([ord("c"), ord("a"), ord("t")])
    assert done == {tok.eos_token_id}


def test_choice_mask_application():
    tok = ByteTokenizer()
    proc = ChoiceLogitsProcessor(tok, ["ab"])
    logits = np.zeros(300, np.float32)
    out = proc([], logits)
    assert out[ord("a")] == 0.0
    assert np.isneginf(out[ord("b")])
