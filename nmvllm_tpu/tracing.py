"""OpenTelemetry request tracing (reference: vllm/tracing.py:42-120 and the
per-request span emission in llm_engine.py:1095-1149).

opentelemetry is an optional dependency; when it is absent a no-op tracer
records spans into memory so tests can assert on them.
"""
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

from nmvllm_tpu.logger import init_logger

logger = init_logger(__name__)


class SpanAttributes:
    LLM_REQUEST_ID = "gen_ai.request.id"
    LLM_REQUEST_MODEL = "gen_ai.request.model"
    LLM_REQUEST_TEMPERATURE = "gen_ai.request.temperature"
    LLM_REQUEST_TOP_P = "gen_ai.request.top_p"
    LLM_REQUEST_MAX_TOKENS = "gen_ai.request.max_tokens"
    LLM_REQUEST_BEST_OF = "gen_ai.request.best_of"
    LLM_REQUEST_N = "gen_ai.request.n"
    LLM_USAGE_PROMPT_TOKENS = "gen_ai.usage.prompt_tokens"
    LLM_USAGE_COMPLETION_TOKENS = "gen_ai.usage.completion_tokens"
    LLM_LATENCY_TIME_IN_QUEUE = "gen_ai.latency.time_in_queue"
    LLM_LATENCY_TIME_TO_FIRST_TOKEN = "gen_ai.latency.time_to_first_token"
    LLM_LATENCY_E2E = "gen_ai.latency.e2e"


@dataclass
class RecordedSpan:
    name: str
    attributes: Dict[str, Any] = field(default_factory=dict)
    start_time: float = 0.0
    end_time: float = 0.0


class InMemoryTracer:
    """Fallback tracer storing spans locally (used when otel is missing,
    and by tests/tracing)."""

    def __init__(self, endpoint: Optional[str] = None):
        self.endpoint = endpoint
        self.spans: List[RecordedSpan] = []

    def record_span(self, name: str, attributes: Dict[str, Any],
                    start_time: float, end_time: float) -> None:
        self.spans.append(RecordedSpan(name, attributes, start_time,
                                       end_time))


def is_otel_installed() -> bool:
    try:
        import opentelemetry  # noqa: F401
        return True
    except ImportError:
        return False


def init_tracer(instrumenting_module_name: str,
                otlp_traces_endpoint: str):
    try:
        # A partial install (opentelemetry-api without the OTLP
        # exporter/sdk) must fall back too — probe the full chain.
        from opentelemetry import trace
        from opentelemetry.exporter.otlp.proto.grpc.trace_exporter import (
            OTLPSpanExporter)
        from opentelemetry.sdk.trace import TracerProvider
        from opentelemetry.sdk.trace.export import BatchSpanProcessor
    except ImportError:
        logger.warning(
            "OpenTelemetry (with OTLP exporter) is not installed; using "
            "in-memory tracer (endpoint %s not contacted).",
            otlp_traces_endpoint)
        return InMemoryTracer(otlp_traces_endpoint)
    provider = TracerProvider()
    provider.add_span_processor(
        BatchSpanProcessor(OTLPSpanExporter(
            endpoint=otlp_traces_endpoint)))
    trace.set_tracer_provider(provider)
    return trace.get_tracer(instrumenting_module_name)


def emit_request_span(tracer, seq_group) -> None:
    """One span per finished request with latency attributes
    (reference llm_engine.py:1095-1149)."""
    metrics = seq_group.metrics
    sp = seq_group.sampling_params
    attrs = {
        SpanAttributes.LLM_REQUEST_ID: seq_group.request_id,
        SpanAttributes.LLM_USAGE_PROMPT_TOKENS:
            len(seq_group.prompt_token_ids),
        SpanAttributes.LLM_USAGE_COMPLETION_TOKENS: sum(
            s.get_output_len() for s in seq_group.get_seqs()),
    }
    if sp is not None:
        attrs.update({
            SpanAttributes.LLM_REQUEST_TEMPERATURE: sp.temperature,
            SpanAttributes.LLM_REQUEST_TOP_P: sp.top_p,
            SpanAttributes.LLM_REQUEST_MAX_TOKENS: sp.max_tokens,
            SpanAttributes.LLM_REQUEST_N: sp.n,
        })
    if metrics.time_in_queue is not None:
        attrs[SpanAttributes.LLM_LATENCY_TIME_IN_QUEUE] = \
            metrics.time_in_queue
    if metrics.first_token_time is not None:
        attrs[SpanAttributes.LLM_LATENCY_TIME_TO_FIRST_TOKEN] = (
            metrics.first_token_time - metrics.arrival_time)
    end = metrics.finished_time or time.time()
    attrs[SpanAttributes.LLM_LATENCY_E2E] = end - metrics.arrival_time
    if isinstance(tracer, InMemoryTracer):
        tracer.record_span("llm_request", attrs, metrics.arrival_time, end)
    else:
        span = tracer.start_span("llm_request",
                                 start_time=int(metrics.arrival_time * 1e9))
        for k, v in attrs.items():
            span.set_attribute(k, v)
        span.end(end_time=int(end * 1e9))
