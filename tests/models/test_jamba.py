"""Jamba hybrid (Mamba + attention + MoE) engine tests (reference
vllm tests for jamba; Mamba state slots replace the paged KV for SSM
layers)."""
import numpy as np
import pytest

from nmvllm_tpu import LLM, SamplingParams

pytestmark = pytest.mark.e2e

SP = SamplingParams(temperature=0.0, max_tokens=6, logprobs=3)


def _make_llm(**kw):
    return LLM(model="debug-jamba", num_gpu_blocks_override=64,
               max_num_seqs=8, max_model_len=256, dtype="float32",
               seed=0, **kw)


def test_jamba_generates():
    llm = _make_llm()
    outs = llm.generate(["A hybrid SSM model", "Second prompt"], SP)
    for o in outs:
        assert len(o.outputs[0].token_ids) == 6
    # State slots freed after finish.
    runner = llm.llm_engine.executor.runner
    assert runner._state_slots == {}


def test_jamba_prefill_decode_consistency():
    """Logprob of token k predicted at prefill of [prompt + k tokens]
    should match the decode-produced logprob (state recurrence correct
    across the prefill/decode boundary)."""
    llm = _make_llm()
    prompt_ids = list(range(3, 19))
    out = llm.generate(prompt_token_ids=[prompt_ids],
                       sampling_params=SP)[0].outputs[0]
    toks = list(out.token_ids)
    lp_decode = out.logprobs[1][toks[1]].logprob

    # Re-run with the first generated token appended to the prompt: the
    # next-token logprobs (prompt_logprobs of the following position /
    # first sampled token) must be close.
    out2 = llm.generate(prompt_token_ids=[prompt_ids + toks[:1]],
                        sampling_params=SP)[0].outputs[0]
    assert out2.token_ids[0] == toks[1]
    lp_prefill = out2.logprobs[0][out2.token_ids[0]].logprob
    assert abs(lp_decode - lp_prefill) < 5e-2, (lp_decode, lp_prefill)


def test_jamba_chunked_prefill():
    llm = _make_llm(enable_chunked_prefill=True,
                    max_num_batched_tokens=16)
    long_prompt = [list(range(3, 45))]
    out = llm.generate(prompt_token_ids=long_prompt,
                       sampling_params=SP)[0].outputs[0]
    assert len(out.token_ids) == 6

    llm2 = _make_llm()
    out2 = llm2.generate(prompt_token_ids=long_prompt,
                        sampling_params=SP)[0].outputs[0]
    # Same model weights (same seed): chunked == unchunked.
    assert list(out.token_ids) == list(out2.token_ids)
