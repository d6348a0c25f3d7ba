"""Parallel sampling (n / best_of > 1) e2e
(reference tests/samplers tier)."""
import pytest

from nmvllm_tpu import LLM, SamplingParams

pytestmark = pytest.mark.e2e


def test_n_greater_one():
    llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256)
    sp = SamplingParams(n=2, temperature=0.9, seed=11, max_tokens=6)
    out = llm.generate(["Parallel probe"], sp)
    assert len(out[0].outputs) == 2
    a, b = out[0].outputs
    assert len(a.token_ids) == 6 and len(b.token_ids) == 6
    assert a.index != b.index
    # Distinct sibling keys make identical outputs very unlikely (vocab 512,
    # 6 steps) — tolerate but flag equality via cumulative logprob identity.
    assert (a.token_ids != b.token_ids
            or a.cumulative_logprob == b.cumulative_logprob)


def test_best_of_pruning():
    llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256)
    sp = SamplingParams(n=1, best_of=3, temperature=0.9, seed=5,
                        max_tokens=4)
    out = llm.generate(["Best of probe"], sp)
    # n=1: only the best (highest cumulative logprob) sequence returned.
    assert len(out[0].outputs) == 1
