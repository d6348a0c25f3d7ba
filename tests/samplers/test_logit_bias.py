"""OpenAI logit_bias applied in-graph (reference: logit_bias ->
logits processors in serving; here a SamplingTensors bias scatter)."""
import pytest

from nmvllm_tpu import LLM, SamplingParams

pytestmark = pytest.mark.e2e


@pytest.fixture(scope="module")
def llm():
    return LLM(model="debug-llama", num_gpu_blocks_override=64,
               max_num_seqs=8, max_model_len=256)


def test_positive_bias_pins_token(llm):
    base = llm.generate(["bias probe"],
                        SamplingParams(temperature=0.0, max_tokens=3))
    t0 = base[0].outputs[0].token_ids[0]
    target = (t0 + 7) % 500
    out = llm.generate(["bias probe"],
                       SamplingParams(temperature=0.0, max_tokens=3,
                                      logit_bias={target: 100.0}))
    assert all(t == target for t in out[0].outputs[0].token_ids)


def test_negative_bias_bans_token(llm):
    base = llm.generate(["bias probe"],
                        SamplingParams(temperature=0.0, max_tokens=1))
    t0 = base[0].outputs[0].token_ids[0]
    out = llm.generate(["bias probe"],
                       SamplingParams(temperature=0.0, max_tokens=1,
                                      logit_bias={t0: -100.0}))
    assert out[0].outputs[0].token_ids[0] != t0


def test_mixed_batch_bias_isolated(llm):
    base = llm.generate(["bias probe"],
                        SamplingParams(temperature=0.0, max_tokens=1))
    t0 = base[0].outputs[0].token_ids[0]
    target = (t0 + 11) % 500
    sps = [SamplingParams(temperature=0.0, max_tokens=1,
                          logit_bias={target: 100.0}),
           SamplingParams(temperature=0.0, max_tokens=1)]
    outs = llm.generate(["bias probe", "bias probe"], sps)
    assert outs[0].outputs[0].token_ids[0] == target
    assert outs[1].outputs[0].token_ids[0] == t0
