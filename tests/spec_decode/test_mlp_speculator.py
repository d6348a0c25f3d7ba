"""MLP-speculator speculative decoding (reference
mlp_speculator.py + spec_decode/mlp_speculator_worker.py): KV-less draft
head over the target's hidden states; output must match non-spec greedy."""
import numpy as np
import pytest

import jax

from nmvllm_tpu import LLM, SamplingParams

PROMPTS = ["The quick brown fox", "speculation target"]


@pytest.fixture(scope="module")
def baseline_llm():
    return LLM(model="debug-llama", num_gpu_blocks_override=64,
               max_num_seqs=8, max_model_len=256)


@pytest.fixture(scope="module")
def mlp_spec_llm():
    return LLM(model="debug-llama", num_gpu_blocks_override=64,
               max_num_seqs=8, max_model_len=256,
               speculative_model="debug-mlp-speculator",
               num_speculative_tokens=3)


def test_propose_shapes():
    from nmvllm_tpu.models.mlp_speculator import MLPSpeculator
    from nmvllm_tpu.transformers_utils.config import get_hf_config
    cfg = get_hf_config("debug-mlp-speculator")
    spec = MLPSpeculator(cfg)
    params = spec.init(jax.random.PRNGKey(0))
    toks = spec.propose(params, np.asarray([3, 5], np.int32),
                        np.ones((2, cfg.emb_dim), np.float32), 3)
    assert toks.shape == (2, 3)
    assert (np.asarray(toks) >= 0).all()
    assert (np.asarray(toks) < cfg.vocab_size).all()
    # Deterministic given (token, hidden).
    toks2 = spec.propose(params, np.asarray([3, 5], np.int32),
                         np.ones((2, cfg.emb_dim), np.float32), 3)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))


def test_mlp_spec_matches_baseline(baseline_llm, mlp_spec_llm):
    from tests.models.utils import check_logprobs_close
    sp = SamplingParams(temperature=0.0, max_tokens=16, logprobs=5)
    base = baseline_llm.generate(PROMPTS, sp)
    spec = mlp_spec_llm.generate(PROMPTS, sp)
    check_logprobs_close(base, spec, "baseline", "mlp-spec")
    st = mlp_spec_llm.llm_engine.spec_stats
    assert st["num_spec_steps"] > 0
    assert st["num_drafted"] > 0
    # A random draft head rarely matches the target: emitted tokens must
    # still be exactly the target's (verification correctness).
    assert st["num_emitted"] >= st["num_spec_steps"]


def test_hidden_state_capture(mlp_spec_llm):
    runner = mlp_spec_llm.llm_engine.executor.runner
    assert runner.capture_hidden
    mlp_spec_llm.generate(["capture probe"],
                          SamplingParams(temperature=0.0, max_tokens=4))
    # Hidden entries are freed when sequences finish.
    assert len(runner.seq_hidden) == 0
