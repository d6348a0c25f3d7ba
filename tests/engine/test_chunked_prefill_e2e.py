"""Chunked prefill + prefix caching end-to-end: outputs must be
logprob-close to the non-chunked engine (reference
tests/basic_correctness/test_chunked_prefill.py; comparison per
tests/models/utils.py check_logprobs_close — bf16 numerics may flip
near-ties on random weights, exactly like the reference's TP-vs-golden
caveat in SURVEY §4)."""
import pytest

from nmvllm_tpu import LLM, SamplingParams
from tests.models.utils import check_logprobs_close

pytestmark = pytest.mark.e2e

PROMPT = "Chunked prefill correctness probe prompt with enough tokens."
SP = SamplingParams(temperature=0.0, max_tokens=8, logprobs=5)


@pytest.fixture(scope="module")
def baseline():
    llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256)
    return llm.generate([PROMPT], SP)


def test_chunked_prefill_close(baseline):
    llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256,
              enable_chunked_prefill=True, max_num_batched_tokens=32)
    out = llm.generate([PROMPT], SP)
    check_logprobs_close(out, baseline, "chunked", "baseline")


def test_prefix_caching_close(baseline):
    llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256,
              enable_prefix_caching=True)
    out1 = llm.generate([PROMPT], SP)
    check_logprobs_close(out1, baseline, "prefix1", "baseline")
    # Second identical request hits the prefix cache and must agree.
    out2 = llm.generate([PROMPT], SP)
    check_logprobs_close(out2, baseline, "prefix2", "baseline")
