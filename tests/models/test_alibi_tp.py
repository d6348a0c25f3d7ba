"""Alibi models under tensor parallelism: per-shard slope slicing
(models/llama.py:_alibi_args) must reproduce the single-shard model.

The reference slices slopes host-side per rank (bloom.py/mpt.py
`alibi_slopes[head_start:head_end]`); here the full table is a trace-time
constant and each shard takes its contiguous head range by mesh rank.
"""
import pytest

import jax

from nmvllm_tpu import LLM, SamplingParams

SP = SamplingParams(temperature=0.0, max_tokens=8, logprobs=2)


def _gen(model: str, tp: int):
    llm = LLM(model=model, num_gpu_blocks_override=64, max_num_seqs=4,
              max_model_len=256, seed=0, dtype="float32",
              tensor_parallel_size=tp)
    out = llm.generate(["Alibi shard probe", "second row"], SP)
    toks = [list(o.outputs[0].token_ids) for o in out]
    lps = [o.outputs[0].logprobs[0][o.outputs[0].token_ids[0]].logprob
           for o in out]
    return toks, lps


@pytest.mark.parametrize("model", ["debug-bloom", "debug-mpt"])
def test_alibi_tp2_matches_tp1(model):
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 virtual devices")
    toks1, lps1 = _gen(model, 1)
    toks2, lps2 = _gen(model, 2)
    assert toks1 == toks2
    for a, b in zip(lps1, lps2):
        assert abs(a - b) < 2e-3, (a, b)
