"""Phi-3-Small e2e: gegelu MLP, muP scalings, LayerNorms, blocksparse /
dense alternating layers, dummy-token logit masking (reference
phi3_small.py)."""
import numpy as np
import pytest

from nmvllm_tpu import LLM, SamplingParams

pytestmark = pytest.mark.e2e


@pytest.fixture(scope="module")
def llm():
    return LLM(model="debug-phi3-small", num_gpu_blocks_override=96,
               max_num_seqs=8, max_model_len=256, seed=0)


def test_generates_and_masks_dummy_tokens(llm):
    out = llm.generate(
        prompt_token_ids=[[1, 2, 3, 4]],
        sampling_params=SamplingParams(temperature=0.0, max_tokens=8,
                                       logprobs=2))
    toks = out[0].outputs[0].token_ids
    assert len(toks) == 8
    # dummy_token_indices = [510, 511] are -inf in the logits.
    assert not set(toks) & {510, 511}


def test_blocksparse_layers_configured(llm):
    model = llm.llm_engine.executor.runner.model
    # dense_attention_every_n_layers=2: layers 1 and 3 dense.
    flags = [l.self_attn.blocksparse is not None for l in model.layers]
    assert flags == [True, False, True, False]
    assert model.layers[0].self_attn.blocksparse == (16, 2, 4, False)
    # mup_attn_multiplier=1.0, head_dim=128 -> scale 1/128 (not rsqrt).
    assert abs(model.layers[0].self_attn.scale - 1.0 / 128) < 1e-9
    assert model.embedding_multiplier == 10.0
    assert abs(model.logit_scale - 1.0 / 8.0) < 1e-9


def test_long_context_decode_consistency(llm):
    """Decode (paged kernel mask) must agree with a fresh prefill over
    the same tokens: generate greedily, then re-score the full sequence
    and check the continuation is reproduced."""
    sp = SamplingParams(temperature=0.0, max_tokens=40)
    prompt = list(range(1, 40))
    first = llm.generate(prompt_token_ids=[prompt],
                         sampling_params=sp)[0].outputs[0].token_ids
    # Re-run with the first half of the generated tokens appended: the
    # model should continue with the same next tokens (prefill mask ==
    # decode mask).
    k = 20
    second = llm.generate(
        prompt_token_ids=[prompt + list(first[:k])],
        sampling_params=SamplingParams(temperature=0.0,
                                       max_tokens=10))[0].outputs[0]
    assert list(second.token_ids) == list(first[k:k + 10])
