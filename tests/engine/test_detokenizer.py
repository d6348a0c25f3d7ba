"""Incremental detokenization + stop checker unit tests
(reference tests/engine/test_stop_strings.py, tokenization tests)."""
import pytest

from nmvllm_tpu.engine.output_processor import (Detokenizer, StopChecker,
                                                detokenize_incrementally)
from nmvllm_tpu.sampling_params import SamplingParams
from nmvllm_tpu.sequence import Logprob, Sequence, SequenceStatus
from nmvllm_tpu.transformers_utils.tokenizer import ByteTokenizer


@pytest.fixture
def tokenizer():
    return ByteTokenizer()


def make_seq(tokenizer, prompt="hi"):
    ids = tokenizer.encode(prompt)
    return Sequence(0, prompt, ids, block_size=16,
                    eos_token_id=tokenizer.eos_token_id)


def test_incremental_matches_full_decode(tokenizer):
    text = "hello world, this is a test!"
    seq = make_seq(tokenizer, "x")
    detok = Detokenizer(tokenizer)
    params = SamplingParams()
    for b in text.encode():
        seq.append_token_id(int(b), {int(b): Logprob(0.0)})
        detok.decode_sequence_inplace(seq, params)
    assert seq.output_text == text


def test_incremental_multibyte_utf8(tokenizer):
    text = "héllo ⚡ wörld"
    seq = make_seq(tokenizer)
    detok = Detokenizer(tokenizer)
    params = SamplingParams()
    for b in text.encode("utf-8"):
        seq.append_token_id(int(b), {int(b): Logprob(0.0)})
        detok.decode_sequence_inplace(seq, params)
    assert seq.output_text == text


def test_stop_string_trims_output(tokenizer):
    seq = make_seq(tokenizer)
    detok = Detokenizer(tokenizer)
    params = SamplingParams(stop=["END"], max_tokens=100)
    checker = StopChecker(max_model_len=1000)
    for b in "abcENDxyz".encode():
        seq.append_token_id(int(b), {int(b): Logprob(0.0)})
        n = detok.decode_sequence_inplace(seq, params)
        checker.maybe_stop_sequence(seq, n, params)
        if seq.is_finished():
            break
    assert seq.status == SequenceStatus.FINISHED_STOPPED
    assert seq.output_text == "abc"
    assert seq.stop_reason == "END"


def test_stop_string_included_when_requested(tokenizer):
    seq = make_seq(tokenizer)
    detok = Detokenizer(tokenizer)
    params = SamplingParams(stop=["END"], include_stop_str_in_output=True,
                            max_tokens=100)
    checker = StopChecker(max_model_len=1000)
    for b in "abcENDxyz".encode():
        seq.append_token_id(int(b), {int(b): Logprob(0.0)})
        n = detok.decode_sequence_inplace(seq, params)
        checker.maybe_stop_sequence(seq, n, params)
        if seq.is_finished():
            break
    assert seq.output_text == "abcEND"


def test_eos_stops(tokenizer):
    seq = make_seq(tokenizer)
    params = SamplingParams(max_tokens=100)
    params.update_from_generation_config(tokenizer.eos_token_id)
    checker = StopChecker(max_model_len=1000)
    seq.append_token_id(tokenizer.eos_token_id,
                        {tokenizer.eos_token_id: Logprob(0.0)})
    checker.maybe_stop_sequence(seq, 0, params)
    assert seq.status == SequenceStatus.FINISHED_STOPPED


def test_max_tokens_stops(tokenizer):
    seq = make_seq(tokenizer)
    params = SamplingParams(max_tokens=2)
    checker = StopChecker(max_model_len=1000)
    for b in b"ab":
        seq.append_token_id(int(b), {int(b): Logprob(0.0)})
        checker.maybe_stop_sequence(seq, 1, params)
    assert seq.status == SequenceStatus.FINISHED_LENGTH_CAPPED


def test_min_tokens_defers_eos(tokenizer):
    seq = make_seq(tokenizer)
    params = SamplingParams(min_tokens=3, max_tokens=10)
    params.update_from_generation_config(tokenizer.eos_token_id)
    checker = StopChecker(max_model_len=1000)
    seq.append_token_id(tokenizer.eos_token_id,
                        {tokenizer.eos_token_id: Logprob(0.0)})
    checker.maybe_stop_sequence(seq, 0, params)
    assert not seq.is_finished()
