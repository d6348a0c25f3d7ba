"""Preemption under KV pressure: tiny block pool forces recompute
preemption mid-decode; all requests must still complete correctly
(reference tests/basic_correctness/test_preemption.py)."""
import pytest

from nmvllm_tpu import LLM, SamplingParams
from tests.models.utils import check_logprobs_close

pytestmark = pytest.mark.e2e

PROMPTS = ["pre alpha", "pre beta", "pre gamma", "pre delta"]
SP = SamplingParams(temperature=0.0, max_tokens=12, logprobs=5,
                    ignore_eos=True)


def test_preemption_recompute_outputs_close():
    # Plenty of blocks: baseline.
    llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256)
    baseline = llm.generate(PROMPTS, SP)
    assert all(len(o.outputs[0].token_ids) == 12 for o in baseline)

    # Starved pool: 4 seqs x up to ~2 blocks each vs only 6 blocks total
    # forces preemptions (watermark + growth).
    llm2 = LLM(model="debug-llama", num_gpu_blocks_override=6,
               max_num_seqs=8, max_model_len=256)
    out = llm2.generate(PROMPTS, SP)
    assert all(len(o.outputs[0].token_ids) == 12 for o in out)
    assert llm2.llm_engine.scheduler.num_cumulative_preemption > 0
    check_logprobs_close(out, baseline, "preempted", "baseline")
