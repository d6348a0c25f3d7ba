"""disable_sliding_window (reference vllm/config.py:87,121 and
tests/prefix_caching/test_disable_sliding_window.py): serve a
sliding-window checkpoint with FULL attention, capping max_model_len to
the window, so prefix caching (incompatible with windowed eviction)
becomes available."""
import pytest

from nmvllm_tpu import LLM, SamplingParams
from nmvllm_tpu.config import ModelConfig

pytestmark = pytest.mark.e2e


def test_config_caps_max_len_and_hides_window():
    mc = ModelConfig(model="debug-mistral", tokenizer="debug-mistral",
                     tokenizer_mode="auto", trust_remote_code=False,
                     dtype="auto", seed=0)
    assert mc.get_sliding_window() == 64
    assert mc.max_model_len == 2048

    mc = ModelConfig(model="debug-mistral", tokenizer="debug-mistral",
                     tokenizer_mode="auto", trust_remote_code=False,
                     dtype="auto", seed=0, disable_sliding_window=True)
    assert mc.get_sliding_window() is None
    assert mc.max_model_len == 64
    # Structural enforcement: model layers read the window from the HF
    # config, so the flag must clear it there too (not rely on the cap).
    assert mc.shape_config.use_sliding_window is False


def test_explicit_max_len_beyond_window_raises():
    # Reference _get_and_verify_max_len: an explicit user max_model_len
    # larger than the window errors instead of silently capping.
    with pytest.raises(ValueError, match="sliding window"):
        ModelConfig(model="debug-mistral", tokenizer="debug-mistral",
                    tokenizer_mode="auto", trust_remote_code=False,
                    dtype="auto", seed=0, disable_sliding_window=True,
                    max_model_len=128)
    # At or below the window is fine.
    mc = ModelConfig(model="debug-mistral", tokenizer="debug-mistral",
                     tokenizer_mode="auto", trust_remote_code=False,
                     dtype="auto", seed=0, disable_sliding_window=True,
                     max_model_len=32)
    assert mc.max_model_len == 32


def test_prefix_caching_works_with_disabled_window():
    # Windowed model + prefix caching is refused (windowed eviction and
    # hash-shared blocks conflict)...
    with pytest.raises((NotImplementedError, ValueError)):
        llm = LLM(model="debug-mistral", enable_prefix_caching=True,
                  num_gpu_blocks_override=64, max_num_seqs=4)
        llm.generate(["x"], SamplingParams(max_tokens=1))

    # ...but with the window disabled the model serves full attention
    # and prefix caching works; outputs match the windowed engine for
    # sequences shorter than the window (the mask never clips there).
    sp = SamplingParams(temperature=0.0, max_tokens=8, logprobs=5)
    prompts = ["the quick brown fox", "the quick brown dog"]

    base_llm = LLM(model="debug-mistral", num_gpu_blocks_override=64,
                   max_num_seqs=4, max_model_len=64)
    base = base_llm.generate(prompts, sp)
    del base_llm

    llm = LLM(model="debug-mistral", disable_sliding_window=True,
              enable_prefix_caching=True, num_gpu_blocks_override=64,
              max_num_seqs=4)
    assert llm.llm_engine.model_config.max_model_len == 64
    out = llm.generate(prompts, sp)
    del llm

    from tests.models.utils import check_logprobs_close
    check_logprobs_close(base, out, "windowed", "full-attn-capped")
