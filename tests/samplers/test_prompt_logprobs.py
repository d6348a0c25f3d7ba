"""Prompt logprobs (reference: SamplingParams.prompt_logprobs flowing
through process_prompt_logprob)."""
import pytest

from nmvllm_tpu import LLM, SamplingParams

pytestmark = pytest.mark.e2e


@pytest.fixture(scope="module")
def llm():
    return LLM(model="debug-llama", num_gpu_blocks_override=64,
               max_num_seqs=8, max_model_len=256)


def _check(out):
    plp = out[0].prompt_logprobs
    ids = out[0].prompt_token_ids
    assert plp is not None and plp[0] is None
    assert len(plp) == len(ids)
    for i, d in enumerate(plp[1:], 1):
        assert ids[i] in d
        assert len(d) >= 3
        # Actual token's logprob must be a finite float.
        assert d[ids[i]].logprob == d[ids[i]].logprob


def test_prompt_logprobs_single_prefill(llm):
    out = llm.generate(["hello world test prompt"],
                       SamplingParams(temperature=0.0, max_tokens=4,
                                      prompt_logprobs=3))
    _check(out)


def test_prompt_logprobs_with_sampled_logprobs(llm):
    out = llm.generate(["another prompt here"],
                       SamplingParams(temperature=0.0, max_tokens=4,
                                      prompt_logprobs=2, logprobs=2))
    _check(out)
    assert out[0].outputs[0].logprobs is not None


def test_prompt_logprobs_chunked():
    llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256,
              enable_chunked_prefill=True, max_num_batched_tokens=8)
    out = llm.generate(
        ["hello world test prompt with quite a few more tokens here"],
        SamplingParams(temperature=0.0, max_tokens=4, prompt_logprobs=3))
    _check(out)
