"""Named tool_choice -> guided-json function call (reference
serving_chat.py:530 tool_calls path)."""
import asyncio
import json

import pytest

pytestmark = pytest.mark.e2e


@pytest.fixture(scope="module")
def loop():
    loop = asyncio.new_event_loop()
    asyncio.set_event_loop(loop)
    yield loop
    loop.close()


@pytest.fixture(scope="module")
def serving(loop):
    from nmvllm_tpu.engine.arg_utils import AsyncEngineArgs
    from nmvllm_tpu.engine.async_llm_engine import AsyncLLMEngine
    from nmvllm_tpu.entrypoints.serving import OpenAIServingChat

    engine = AsyncLLMEngine.from_engine_args(AsyncEngineArgs(
        model="debug-llama", num_gpu_blocks_override=64, max_num_seqs=8,
        max_model_len=256, disable_log_stats=True))
    chat = OpenAIServingChat(engine, ["debug-llama"])
    loop.run_until_complete(chat._post_init())
    return chat


TOOLS = [{
    "type": "function",
    "function": {
        "name": "get_weather",
        "description": "Weather lookup",
        "parameters": {
            "type": "object",
            "properties": {"celsius": {"type": "boolean"},
                           "days": {"enum": [1, 3, 7]}},
            "required": ["celsius", "days"],
        },
    },
}]


def _run(serving, loop, **overrides):
    from nmvllm_tpu.entrypoints.protocol import ChatCompletionRequest
    body = dict(model="debug-llama",
                messages=[{"role": "user", "content": "Weather in Paris"}],
                max_tokens=48, temperature=0.0, tools=TOOLS,
                tool_choice={"type": "function",
                             "function": {"name": "get_weather"}})
    body.update(overrides)
    req = ChatCompletionRequest(**body)
    return loop.run_until_complete(serving.create_chat_completion(req))


def test_named_tool_choice_emits_schema_valid_call(serving, loop):
    resp = _run(serving, loop)
    choice = resp.choices[0]
    assert choice.message.content is None
    (call,) = choice.message.tool_calls
    assert call.function.name == "get_weather"
    args = json.loads(call.function.arguments)
    assert isinstance(args["celsius"], bool)
    assert isinstance(args["days"], int)


def test_unknown_tool_rejected(serving, loop):
    resp = _run(serving, loop, tool_choice={"type": "function",
                                      "function": {"name": "nope"}})
    from nmvllm_tpu.entrypoints.protocol import ErrorResponse
    assert isinstance(resp, ErrorResponse)


def test_tool_choice_none_is_plain_chat(serving, loop):
    resp = _run(serving, loop, tool_choice="none")
    assert resp.choices[0].message.tool_calls is None
    assert resp.choices[0].message.content is not None
