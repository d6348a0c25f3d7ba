"""OpenAI-compatible server end-to-end over real sockets
(reference tests/entrypoints/test_openai_server.py via ServerContext)."""
import asyncio
import json

import pytest

pytestmark = pytest.mark.e2e


@pytest.fixture(scope="module")
def server_setup():
    from nmvllm_tpu.engine.arg_utils import AsyncEngineArgs
    from nmvllm_tpu.engine.async_llm_engine import AsyncLLMEngine
    from nmvllm_tpu.entrypoints.api_server import build_server

    engine_args = AsyncEngineArgs(model="debug-llama",
                                  num_gpu_blocks_override=64,
                                  max_num_seqs=8, max_model_len=256,
                                  disable_log_stats=True)
    engine = AsyncLLMEngine.from_engine_args(engine_args)
    server = build_server(engine, ["debug-llama"], host="127.0.0.1",
                          port=18123)
    return server


async def _request(method, path, body=None, port=18123):
    reader, writer = await asyncio.open_connection("127.0.0.1", port)
    payload = json.dumps(body).encode() if body is not None else b""
    head = (f"{method} {path} HTTP/1.1\r\nHost: localhost\r\n"
            f"Content-Type: application/json\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n")
    writer.write(head.encode() + payload)
    await writer.drain()
    status_line = await reader.readline()
    status = int(status_line.split()[1])
    headers = {}
    while True:
        line = await reader.readline()
        if line in (b"\r\n", b"\n"):
            break
        k, v = line.decode().split(":", 1)
        headers[k.strip().lower()] = v.strip()
    chunks = []
    if headers.get("transfer-encoding") == "chunked":
        while True:
            size_line = await reader.readline()
            size = int(size_line.strip(), 16)
            if size == 0:
                await reader.readline()
                break
            chunks.append(await reader.readexactly(size))
            await reader.readexactly(2)
        body_bytes = b"".join(chunks)
    else:
        length = int(headers.get("content-length", "0"))
        body_bytes = await reader.readexactly(length) if length else b""
    writer.close()
    return status, body_bytes


def test_server_endpoints(server_setup):
    server = server_setup

    async def run():
        await server.start()
        try:
            status, body = await _request("GET", "/health")
            assert status == 200
            status, body = await _request("GET", "/v1/models")
            assert status == 200
            models = json.loads(body)
            assert models["data"][0]["id"] == "debug-llama"
            status, body = await _request(
                "POST", "/tokenize",
                {"prompt": "hello", "model": "debug-llama"})
            assert status == 200
            assert json.loads(body)["count"] > 0

            status, body = await _request(
                "POST", "/v1/completions",
                {"model": "debug-llama", "prompt": "Hello", "max_tokens": 4,
                 "temperature": 0})
            assert status == 200, body
            resp = json.loads(body)
            assert resp["object"] == "text_completion"
            assert len(resp["choices"]) == 1
            assert resp["usage"]["completion_tokens"] == 4

            status, body = await _request(
                "POST", "/v1/chat/completions",
                {"model": "debug-llama", "max_tokens": 4, "temperature": 0,
                 "messages": [{"role": "user", "content": "Hi"}]})
            assert status == 200, body
            resp = json.loads(body)
            assert resp["choices"][0]["message"]["role"] == "assistant"

            # Streaming completion: SSE chunks ending with [DONE].
            status, body = await _request(
                "POST", "/v1/completions",
                {"model": "debug-llama", "prompt": "Hey", "max_tokens": 4,
                 "temperature": 0, "stream": True})
            assert status == 200
            text = body.decode()
            assert "data: [DONE]" in text
            assert text.count("data:") >= 2

            # Unknown model -> 404 error payload.
            status, body = await _request(
                "POST", "/v1/completions",
                {"model": "nope", "prompt": "x", "max_tokens": 1})
            assert json.loads(body)["error"]["code"] == 404
        finally:
            await server.stop()

    asyncio.run(run())
