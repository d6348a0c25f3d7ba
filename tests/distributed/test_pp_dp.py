"""PP×DP combined meshes (beyond the reference, whose DP is an external
load balancer and whose PP workers are per-stage processes): the GPipe
stage ring runs over the `pp` mesh axis while batch rows and the KV
block pool shard over the `data` axis. pp=2×dp=2 (and ×tp=2) must match
the single-chip engine token-for-token on the virtual CPU mesh."""
import pytest

from nmvllm_tpu import LLM, SamplingParams

pytestmark = pytest.mark.e2e

PROMPTS = [
    "data parallel decode test " * 3,
    "hello world",
    "the quick brown fox jumps over the lazy dog",
    "a b c d e f g",
    "pipeline and data parallel together",
    "one two three four five six",
]


def _run(**kw):
    llm = LLM(model=kw.pop("model", "debug-llama"),
              num_gpu_blocks_override=64, max_num_seqs=8,
              max_model_len=128, **kw)
    out = llm.generate(PROMPTS, SamplingParams(temperature=0.0,
                                               max_tokens=16, logprobs=5))
    del llm
    return out


def test_pp2_dp2_matches_single():
    # Logprob-closeness, not token equality: the random-init debug model
    # has near-tied logits that bf16 partitioning noise can flip (the
    # single-axis PP tests use the same tolerance).
    from tests.models.utils import check_logprobs_close
    base = _run()
    combined = _run(pipeline_parallel_size=2, data_parallel_size=2)
    check_logprobs_close(base, combined, "single", "pp2xdp2")


def test_pp2_dp2_tp2_matches_single():
    from tests.models.utils import check_logprobs_close
    base = _run(model="debug-llama-tp")
    combined = _run(model="debug-llama-tp", pipeline_parallel_size=2,
                    data_parallel_size=2, tensor_parallel_size=2)
    check_logprobs_close(base, combined, "single", "pp2xdp2xtp2")


def test_pp_dp_rejects_spec_and_lora():
    with pytest.raises(ValueError, match="data_parallel_size"):
        LLM(model="debug-llama", pipeline_parallel_size=2,
            data_parallel_size=2, num_gpu_blocks_override=64,
            max_model_len=128, ngram_prompt_lookup_max=3,
            num_speculative_tokens=3)
    with pytest.raises(ValueError, match="data_parallel_size"):
        LLM(model="debug-llama", pipeline_parallel_size=2,
            data_parallel_size=2, num_gpu_blocks_override=64,
            max_model_len=128, enable_lora=True)
