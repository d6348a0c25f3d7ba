"""End-to-end engine tests on the debug model
(reference tests/basic_correctness + tests/engine)."""
import pytest

from nmvllm_tpu import LLM, SamplingParams

pytestmark = pytest.mark.e2e


@pytest.fixture(scope="module")
def llm():
    return LLM(model="debug-llama", num_gpu_blocks_override=64,
               max_num_seqs=8, max_model_len=256)


def test_greedy_deterministic(llm):
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    out1 = llm.generate(["Hello world"], sp)
    out2 = llm.generate(["Hello world"], sp)
    assert out1[0].outputs[0].token_ids == out2[0].outputs[0].token_ids
    assert len(out1[0].outputs[0].token_ids) == 8
    assert out1[0].outputs[0].finish_reason == "length"


def test_batch_matches_single(llm):
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    single = llm.generate(["Quick brown"], sp)
    batch = llm.generate(["Hello world", "Quick brown", "abc"], sp)
    assert batch[1].outputs[0].token_ids == single[0].outputs[0].token_ids


def test_seeded_sampling_reproducible(llm):
    sp = SamplingParams(temperature=0.9, seed=1234, max_tokens=8)
    out1 = llm.generate(["Hello"], sp)
    out2 = llm.generate(["Hello"], sp)
    assert out1[0].outputs[0].token_ids == out2[0].outputs[0].token_ids


def test_logprobs_returned(llm):
    sp = SamplingParams(temperature=0.0, max_tokens=4, logprobs=3)
    out = llm.generate(["Hello"], sp)
    lps = out[0].outputs[0].logprobs
    assert lps is not None and len(lps) == 4
    for pos, tid in zip(lps, out[0].outputs[0].token_ids):
        assert tid in pos
        assert len(pos) >= 3


def test_stop_token(llm):
    # Force-stop on the first generated token by banning nothing and using
    # stop_token_ids with the greedy-argmax token from a probe run.
    probe = llm.generate(["Hello"],
                         SamplingParams(temperature=0.0, max_tokens=1))
    tok = probe[0].outputs[0].token_ids[0]
    out = llm.generate(["Hello"],
                       SamplingParams(temperature=0.0, max_tokens=8,
                                      stop_token_ids=[tok]))
    assert out[0].outputs[0].finish_reason == "stop"
    assert len(out[0].outputs[0].token_ids) == 1
