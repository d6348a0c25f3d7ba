"""Behavior-pinning edge cases (reference tests/test_regression.py +
engine/test_skip_tokenizer_init.py scope)."""
import pytest

from nmvllm_tpu import LLM, SamplingParams

pytestmark = pytest.mark.e2e


@pytest.fixture(scope="module")
def llm():
    return LLM(model="debug-llama", num_gpu_blocks_override=64,
               max_num_seqs=4, max_model_len=64)


def test_oversized_prompt_ignored_not_crashing(llm):
    """A prompt longer than max_model_len is finished-ignored while the
    rest of the batch generates (reference issue #1655 shape)."""
    outs = llm.generate(["short prompt", "x " * 500],
                        SamplingParams(temperature=0.0, max_tokens=4,
                                       ignore_eos=True))
    assert len(outs) == 2
    assert len(outs[0].outputs[0].token_ids) == 4
    assert outs[1].finished
    assert len(outs[1].outputs[0].token_ids) == 0


def test_max_tokens_none_caps_at_model_len(llm):
    outs = llm.generate(["hello"],
                        SamplingParams(temperature=0.0, max_tokens=None,
                                       ignore_eos=True))
    assert outs[0].finished
    n_prompt = len(outs[0].prompt_token_ids)
    assert len(outs[0].outputs[0].token_ids) == 64 - n_prompt
    assert outs[0].outputs[0].finish_reason == "length"


def test_n_greater_than_one_returns_n_sequences(llm):
    outs = llm.generate(["multi sample"],
                        SamplingParams(n=3, temperature=0.8, seed=7,
                                       max_tokens=4, ignore_eos=True))
    assert len(outs[0].outputs) == 3
    assert all(len(o.token_ids) == 4 for o in outs[0].outputs)


def test_skip_tokenizer_init_token_ids_only():
    llm = LLM(model="debug-llama", num_gpu_blocks_override=32,
              max_num_seqs=4, max_model_len=64,
              skip_tokenizer_init=True)
    outs = llm.generate(prompt_token_ids=[[5, 6, 7]],
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=4,
                            ignore_eos=True))
    assert len(outs[0].outputs[0].token_ids) == 4
    # Text prompts cannot work without a tokenizer.
    with pytest.raises((ValueError, AttributeError, TypeError)):
        llm.generate(["text prompt"], SamplingParams(max_tokens=2))


def test_zero_max_tokens_rejected():
    # Reference sampling_params.py:225 rejects max_tokens < 1 too.
    with pytest.raises(ValueError, match="max_tokens"):
        SamplingParams(temperature=0.0, max_tokens=0)
