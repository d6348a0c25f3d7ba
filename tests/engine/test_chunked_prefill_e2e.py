"""Chunked prefill + prefix caching end-to-end correctness: greedy output
must match the non-chunked engine (reference
tests/basic_correctness/test_chunked_prefill.py)."""
import pytest

from nmvllm_tpu import LLM, SamplingParams

pytestmark = pytest.mark.e2e

PROMPT = "Chunked prefill correctness probe prompt with enough tokens."
SP = SamplingParams(temperature=0.0, max_tokens=8)


@pytest.fixture(scope="module")
def baseline_tokens():
    llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256)
    out = llm.generate([PROMPT], SP)
    return out[0].outputs[0].token_ids


def test_chunked_prefill_matches(baseline_tokens):
    llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256,
              enable_chunked_prefill=True, max_num_batched_tokens=32)
    out = llm.generate([PROMPT], SP)
    assert out[0].outputs[0].token_ids == baseline_tokens


def test_prefix_caching_matches(baseline_tokens):
    llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256,
              enable_prefix_caching=True)
    out1 = llm.generate([PROMPT], SP)
    assert out1[0].outputs[0].token_ids == baseline_tokens
    # Second identical request hits the prefix cache (fewer new tokens) and
    # must still produce identical output.
    out2 = llm.generate([PROMPT], SP)
    assert out2[0].outputs[0].token_ids == baseline_tokens
