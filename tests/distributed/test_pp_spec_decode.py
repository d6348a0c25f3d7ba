"""Speculative decoding under pipeline parallelism — BEYOND the
reference (its synchronous engine refuses PP outright and its spec
worker is single-stage). ngram drafts verify through the stage ring
(worker/pp_runner.py::_get_spec_decode_fn); greedy outputs must stay
logprob-close to the non-spec PP engine."""
import pytest

from nmvllm_tpu import LLM, SamplingParams

pytestmark = pytest.mark.e2e

PROMPTS = [
    "the cat sat on the mat the cat sat on the",
    "one two three one two three one two",
    "Hello world",
    "a b c d a b c d a b",
]


def test_pp_spec_greedy_equality():
    from tests.models.utils import check_logprobs_close
    sp = SamplingParams(temperature=0.0, max_tokens=16, logprobs=5)

    base_llm = LLM(model="debug-llama", pipeline_parallel_size=2,
                   num_gpu_blocks_override=64, max_num_seqs=8,
                   max_model_len=256)
    base = base_llm.generate(PROMPTS, sp)
    del base_llm

    spec_llm = LLM(model="debug-llama", pipeline_parallel_size=2,
                   num_gpu_blocks_override=64, max_num_seqs=8,
                   max_model_len=256, ngram_prompt_lookup_max=3,
                   ngram_prompt_lookup_min=1, num_speculative_tokens=4)
    spec = spec_llm.generate(PROMPTS, sp)
    engine = spec_llm.llm_engine
    assert engine.spec_stats["num_spec_steps"] > 0
    assert engine.spec_stats["num_accepted"] > 0
    del spec_llm

    check_logprobs_close(base, spec, "pp-baseline", "pp-spec")


def test_pp_spec_with_tp():
    sp = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    llm = LLM(model="debug-llama-tp", pipeline_parallel_size=2,
              tensor_parallel_size=2, num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256,
              ngram_prompt_lookup_max=3, ngram_prompt_lookup_min=1,
              num_speculative_tokens=3)
    out = llm.generate(["x y z x y z x y z"], sp)
    assert len(out[0].outputs[0].token_ids) == 12
    assert llm.llm_engine.spec_stats["num_spec_steps"] > 0


def test_pp_draft_model_spec_greedy_equality():
    """Draft-model spec under PP (beyond reference): the draft runs as a
    plain runner replicated over the pp mesh axis; its k-step proposal
    scan feeds the stage-ring multi-query verifier."""
    from tests.models.utils import check_logprobs_close
    sp = SamplingParams(temperature=0.0, max_tokens=16, logprobs=5)

    base_llm = LLM(model="debug-llama", pipeline_parallel_size=2,
                   num_gpu_blocks_override=64, max_num_seqs=8,
                   max_model_len=256)
    base = base_llm.generate(PROMPTS, sp)
    del base_llm

    spec_llm = LLM(model="debug-llama", pipeline_parallel_size=2,
                   num_gpu_blocks_override=64, max_num_seqs=8,
                   max_model_len=256, speculative_model="debug-llama",
                   num_speculative_tokens=3)
    spec = spec_llm.generate(PROMPTS, sp)
    engine = spec_llm.llm_engine
    assert engine.spec_stats["num_spec_steps"] > 0
    # Identical draft and target => near-total acceptance.
    assert engine.spec_stats["num_accepted"] > 0
    del spec_llm

    check_logprobs_close(base, spec, "pp-baseline", "pp-draft-spec")


def test_pp_mlp_speculator_rejected():
    with pytest.raises(ValueError, match="MLP-speculator"):
        LLM(model="debug-llama", pipeline_parallel_size=2,
            num_gpu_blocks_override=32, max_model_len=128,
            speculative_model="debug-mlp-speculator",
            num_speculative_tokens=3)
