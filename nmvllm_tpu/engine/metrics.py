"""Engine metrics: Prometheus + periodic logging.

Reference: vllm/engine/metrics.py (Metrics:31 — gauges/counters/histograms,
LoggingStatLogger:267, Stats built per step llm_engine.py:907-1074).
"""
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from nmvllm_tpu.logger import init_logger

logger = init_logger(__name__)

try:
    import prometheus_client
    _HAS_PROM = True
    prometheus_client.disable_created_metrics()
except Exception:  # pragma: no cover
    _HAS_PROM = False


@dataclass
class Stats:
    """Snapshot of one engine iteration (reference metrics.py Stats)."""
    now: float
    num_running_sys: int = 0
    num_waiting_sys: int = 0
    num_swapped_sys: int = 0
    gpu_cache_usage_sys: float = 0.0
    cpu_cache_usage_sys: float = 0.0
    num_prompt_tokens_iter: int = 0
    num_generation_tokens_iter: int = 0
    num_preemption_iter: int = 0
    time_to_first_tokens_iter: List[float] = field(default_factory=list)
    time_per_output_tokens_iter: List[float] = field(default_factory=list)
    time_e2e_requests: List[float] = field(default_factory=list)
    finished_reason_requests: List[str] = field(default_factory=list)
    spec_decode_metrics: Optional[object] = None


class Metrics:
    """Prometheus metric family (reference metrics.py:31)."""

    _instance = None

    def __new__(cls, labelnames):
        # Prometheus registries are process-global; keep one instance.
        if cls._instance is None:
            cls._instance = super().__new__(cls)
            cls._instance._init(labelnames)
        return cls._instance

    def _init(self, labelnames):
        if not _HAS_PROM:
            return
        from prometheus_client import Counter, Gauge, Histogram
        ns = "nmvllm"
        self.gauge_scheduler_running = Gauge(
            f"{ns}:num_requests_running",
            "Number of requests currently running.", labelnames)
        self.gauge_scheduler_waiting = Gauge(
            f"{ns}:num_requests_waiting", "Number of waiting requests.",
            labelnames)
        self.gauge_scheduler_swapped = Gauge(
            f"{ns}:num_requests_swapped", "Number of swapped requests.",
            labelnames)
        self.gauge_gpu_cache_usage = Gauge(
            f"{ns}:gpu_cache_usage_perc", "Device KV-cache usage (1=100%).",
            labelnames)
        self.gauge_cpu_cache_usage = Gauge(
            f"{ns}:cpu_cache_usage_perc", "Host KV-cache usage (1=100%).",
            labelnames)
        self.counter_prompt_tokens = Counter(
            f"{ns}:prompt_tokens_total", "Prefill tokens processed.",
            labelnames)
        self.counter_generation_tokens = Counter(
            f"{ns}:generation_tokens_total", "Generation tokens processed.",
            labelnames)
        self.counter_num_preemption = Counter(
            f"{ns}:num_preemptions_total", "Cumulative preemptions.",
            labelnames)
        self.histogram_time_to_first_token = Histogram(
            f"{ns}:time_to_first_token_seconds", "TTFT histogram.",
            labelnames,
            buckets=[0.001, 0.005, 0.01, 0.02, 0.04, 0.06, 0.08, 0.1, 0.25,
                     0.5, 0.75, 1.0, 2.5, 5.0, 7.5, 10.0])
        self.histogram_time_per_output_token = Histogram(
            f"{ns}:time_per_output_token_seconds", "TPOT histogram.",
            labelnames,
            buckets=[0.01, 0.025, 0.05, 0.075, 0.1, 0.15, 0.2, 0.3, 0.4,
                     0.5, 0.75, 1.0, 2.5])
        self.histogram_e2e_request_latency = Histogram(
            f"{ns}:e2e_request_latency_seconds", "End-to-end latency.",
            labelnames,
            buckets=[1.0, 2.5, 5.0, 10.0, 15.0, 20.0, 30.0, 40.0, 50.0,
                     60.0])
        self.counter_request_success = Counter(
            f"{ns}:request_success_total", "Finished requests.",
            labelnames + ["finished_reason"])


class StatLogger:
    """Logs throughput summaries every `local_interval` seconds and pushes
    Prometheus series (reference LoggingStatLogger metrics.py:267)."""

    def __init__(self, local_interval: float,
                 labels: Dict[str, str]) -> None:
        self.local_interval = local_interval
        self.labels = labels
        self.last_local_log = time.time()
        self.num_prompt_tokens: List[int] = []
        self.num_generation_tokens: List[int] = []
        self.metrics = Metrics(list(labels.keys())) if _HAS_PROM else None

    def _local_interval_elapsed(self, now: float) -> bool:
        return now - self.last_local_log >= self.local_interval

    def log(self, stats: Stats) -> None:
        self.num_prompt_tokens.append(stats.num_prompt_tokens_iter)
        self.num_generation_tokens.append(stats.num_generation_tokens_iter)
        if self.metrics is not None:
            self._log_prometheus(stats)
        now = stats.now
        if self._local_interval_elapsed(now):
            elapsed = now - self.last_local_log
            prompt_tput = sum(self.num_prompt_tokens) / elapsed
            gen_tput = sum(self.num_generation_tokens) / elapsed
            logger.info(
                "Avg prompt throughput: %.1f tokens/s, Avg generation "
                "throughput: %.1f tokens/s, Running: %d reqs, Swapped: %d "
                "reqs, Pending: %d reqs, KV cache usage: %.1f%%",
                prompt_tput, gen_tput, stats.num_running_sys,
                stats.num_swapped_sys, stats.num_waiting_sys,
                stats.gpu_cache_usage_sys * 100)
            self.num_prompt_tokens = []
            self.num_generation_tokens = []
            self.last_local_log = now

    def _log_prometheus(self, stats: Stats) -> None:
        m = self.metrics
        lv = self.labels
        m.gauge_scheduler_running.labels(**lv).set(stats.num_running_sys)
        m.gauge_scheduler_waiting.labels(**lv).set(stats.num_waiting_sys)
        m.gauge_scheduler_swapped.labels(**lv).set(stats.num_swapped_sys)
        m.gauge_gpu_cache_usage.labels(**lv).set(stats.gpu_cache_usage_sys)
        m.gauge_cpu_cache_usage.labels(**lv).set(stats.cpu_cache_usage_sys)
        m.counter_prompt_tokens.labels(**lv).inc(
            stats.num_prompt_tokens_iter)
        m.counter_generation_tokens.labels(**lv).inc(
            stats.num_generation_tokens_iter)
        m.counter_num_preemption.labels(**lv).inc(stats.num_preemption_iter)
        for v in stats.time_to_first_tokens_iter:
            m.histogram_time_to_first_token.labels(**lv).observe(v)
        for v in stats.time_per_output_tokens_iter:
            m.histogram_time_per_output_token.labels(**lv).observe(v)
        for v in stats.time_e2e_requests:
            m.histogram_e2e_request_latency.labels(**lv).observe(v)
        for reason in stats.finished_reason_requests:
            m.counter_request_success.labels(
                **{**lv, "finished_reason": reason}).inc()
