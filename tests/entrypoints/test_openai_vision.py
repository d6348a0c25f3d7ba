"""OpenAI chat completions with image content parts
(reference tests/entrypoints/test_openai_vision.py: image_url chat parts
routed into the multimodal engine path)."""
import asyncio
import base64
import io
import json

import pytest

from tests.entrypoints.test_openai_server import _request

pytestmark = pytest.mark.e2e

PORT = 18127


@pytest.fixture(scope="module")
def vision_server():
    from nmvllm_tpu.engine.arg_utils import AsyncEngineArgs
    from nmvllm_tpu.engine.async_llm_engine import AsyncLLMEngine
    from nmvllm_tpu.entrypoints.api_server import build_server

    engine_args = AsyncEngineArgs(model="debug-llava",
                                  num_gpu_blocks_override=96,
                                  max_num_seqs=8, max_model_len=256,
                                  disable_log_stats=True)
    engine = AsyncLLMEngine.from_engine_args(engine_args)
    return build_server(engine, ["debug-llava"], host="127.0.0.1",
                        port=PORT)


def _data_url(value: int) -> str:
    from PIL import Image
    img = Image.new("RGB", (64, 64), (value, value, value))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()
    return f"data:image/png;base64,{b64}"


def _chat_body(image_url, text="describe"):
    return {
        "model": "debug-llava",
        "max_tokens": 4,
        "temperature": 0.0,
        "messages": [{
            "role": "user",
            "content": [
                {"type": "image_url", "image_url": {"url": image_url}},
                {"type": "text", "text": text},
            ],
        }],
    }


def test_chat_with_image(vision_server):
    server = vision_server

    async def run():
        await server.start()
        try:
            # Image-conditioned chat completion succeeds.
            status, body = await _request(
                "POST", "/v1/chat/completions",
                _chat_body(_data_url(0)), port=PORT)
            assert status == 200, body
            resp = json.loads(body)
            text0 = resp["choices"][0]["message"]["content"]
            assert resp["usage"]["completion_tokens"] > 0

            # Different image -> (deterministically) different output.
            status, body = await _request(
                "POST", "/v1/chat/completions",
                _chat_body(_data_url(255)), port=PORT)
            assert status == 200, body
            text1 = json.loads(body)["choices"][0]["message"]["content"]

            status, body = await _request(
                "POST", "/v1/chat/completions",
                _chat_body(_data_url(0)), port=PORT)
            assert status == 200, body
            text0b = json.loads(body)["choices"][0]["message"]["content"]
            assert text0 == text0b
            assert text0 != text1

            # Non-data URL rejected (zero-egress).
            status, body = await _request(
                "POST", "/v1/chat/completions",
                _chat_body("https://example.com/x.png"), port=PORT)
            assert status == 400, body

            # Plain string content still works on a vision model.
            status, body = await _request(
                "POST", "/v1/chat/completions",
                {"model": "debug-llava", "max_tokens": 4,
                 "messages": [{"role": "user", "content": "hi"}]},
                port=PORT)
            assert status == 200, body
        finally:
            await server.stop()

    asyncio.run(run())
