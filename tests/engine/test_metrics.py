"""Engine metrics (reference tests/metrics/test_metrics.py)."""
import time

import pytest

from nmvllm_tpu.engine.metrics import Metrics, StatLogger, Stats


def _stats(**kw):
    base = dict(now=time.time(), num_running_sys=2, num_waiting_sys=1,
                num_swapped_sys=0, gpu_cache_usage_sys=0.25,
                num_prompt_tokens_iter=10, num_generation_tokens_iter=4,
                time_to_first_tokens_iter=[0.1],
                time_per_output_tokens_iter=[0.02, 0.02],
                time_e2e_requests=[0.5],
                finished_reason_requests=["stop", "length"])
    base.update(kw)
    return Stats(**base)


def test_stat_logger_accumulates_and_resets():
    sl = StatLogger(local_interval=0.0, labels={"model_name": "m"})
    sl.log(_stats())
    # interval elapsed (0.0): accumulators flush.
    assert sl.num_prompt_tokens == [] and sl.num_generation_tokens == []
    sl2 = StatLogger(local_interval=3600.0, labels={"model_name": "m"})
    sl2.log(_stats())
    sl2.log(_stats())
    assert sl2.num_prompt_tokens == [10, 10]


def test_prometheus_series_names_and_values():
    prom = pytest.importorskip("prometheus_client")
    sl = StatLogger(local_interval=3600.0, labels={"model_name": "m"})
    if sl.metrics is None:
        pytest.skip("prometheus_client unavailable")
    sl.log(_stats())
    from prometheus_client import REGISTRY
    running = REGISTRY.get_sample_value(
        "nmvllm:num_requests_running", {"model_name": "m"})
    assert running == 2.0
    waiting = REGISTRY.get_sample_value(
        "nmvllm:num_requests_waiting", {"model_name": "m"})
    assert waiting == 1.0
    # Counters accumulate across log() calls.
    before = REGISTRY.get_sample_value(
        "nmvllm:prompt_tokens_total", {"model_name": "m"})
    sl.log(_stats())
    after = REGISTRY.get_sample_value(
        "nmvllm:prompt_tokens_total", {"model_name": "m"})
    assert after == before + 10
    success = REGISTRY.get_sample_value(
        "nmvllm:request_success_total",
        {"model_name": "m", "finished_reason": "stop"})
    assert success and success >= 1.0


def test_metrics_singleton():
    assert Metrics(["model_name"]) is Metrics(["model_name"])


@pytest.mark.e2e
def test_engine_stats_from_real_steps():
    """LLMEngine.step() produces Stats with token counts (reference
    test_metrics.py::test_metric_counter_prompt_tokens)."""
    from nmvllm_tpu import LLM, SamplingParams
    llm = LLM(model="debug-llama", num_gpu_blocks_override=32,
              max_num_seqs=4, max_model_len=64, disable_log_stats=False)
    prompts = ["metrics test prompt"]
    llm.generate(prompts, SamplingParams(temperature=0.0, max_tokens=4,
                                         ignore_eos=True))
    engine = llm.llm_engine
    assert engine.stat_logger is not None
    # The engine logged prompt + generation tokens across its steps.
    logged_prompt = sum(engine.stat_logger.num_prompt_tokens)
    logged_gen = sum(engine.stat_logger.num_generation_tokens)
    ntok = len(engine.tokenizer.encode(prompts[0]))
    assert logged_prompt == ntok or logged_prompt == 0  # may have flushed
    assert logged_gen <= 4
