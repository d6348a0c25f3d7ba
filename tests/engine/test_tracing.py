"""Request tracing (reference tests/tracing/test_tracing.py): spans carry
the gen_ai.* attributes; the in-memory tracer records them without otel."""
import pytest

from nmvllm_tpu.tracing import InMemoryTracer, SpanAttributes, init_tracer


def test_init_tracer_falls_back_in_memory():
    tracer = init_tracer("nmvllm.test", "grpc://unreachable:4317")
    assert tracer is not None


@pytest.mark.e2e
def test_request_span_attributes_from_engine():
    from nmvllm_tpu import LLM, SamplingParams
    from nmvllm_tpu.config import ObservabilityConfig

    llm = LLM(model="debug-llama", num_gpu_blocks_override=32,
              max_num_seqs=4, max_model_len=64,
              otlp_traces_endpoint="memory://test")
    engine = llm.llm_engine
    # Force the in-memory tracer so span contents are inspectable.
    if not isinstance(engine.tracer, InMemoryTracer):
        engine.tracer = InMemoryTracer("memory://test")
    prompts = ["trace me"]
    llm.generate(prompts, SamplingParams(temperature=0.7, top_p=0.9,
                                         max_tokens=3, ignore_eos=True,
                                         n=1))
    spans = engine.tracer.spans
    assert spans, "no spans recorded"
    attrs = spans[-1].attributes
    assert attrs[SpanAttributes.LLM_REQUEST_TEMPERATURE] == \
        pytest.approx(0.7)
    assert attrs[SpanAttributes.LLM_REQUEST_TOP_P] == pytest.approx(0.9)
    assert attrs[SpanAttributes.LLM_REQUEST_MAX_TOKENS] == 3
    assert attrs[SpanAttributes.LLM_USAGE_COMPLETION_TOKENS] == 3
    ntok = len(engine.tokenizer.encode(prompts[0]))
    assert attrs[SpanAttributes.LLM_USAGE_PROMPT_TOKENS] == ntok
    assert attrs[SpanAttributes.LLM_LATENCY_E2E] >= \
        attrs[SpanAttributes.LLM_LATENCY_TIME_TO_FIRST_TOKEN] >= 0.0
