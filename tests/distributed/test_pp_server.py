"""OpenAI server over a pipeline-parallel engine (reference
tests/distributed/test_pipeline_parallel.py runs a PPxTP server grid).
The async engine needs no PP-specific plumbing — the whole stage ring
advances inside the executor's compiled step — so this verifies the full
socket -> AsyncLLMEngine -> PP runner path on the virtual CPU mesh."""
import asyncio
import json
import os

import jax
import pytest

os.environ.setdefault("NMVLLM_DISABLE_PALLAS", "1")

pytestmark = pytest.mark.e2e

PORT = 18131


@pytest.fixture(scope="module")
def pp_server():
    if len(jax.devices()) < 2:
        pytest.skip("needs more virtual devices")
    from nmvllm_tpu.engine.arg_utils import AsyncEngineArgs
    from nmvllm_tpu.engine.async_llm_engine import AsyncLLMEngine
    from nmvllm_tpu.entrypoints.api_server import build_server

    engine_args = AsyncEngineArgs(model="debug-llama",
                                  pipeline_parallel_size=2,
                                  num_gpu_blocks_override=64,
                                  max_num_seqs=8, max_model_len=256,
                                  disable_log_stats=True)
    engine = AsyncLLMEngine.from_engine_args(engine_args)
    return build_server(engine, ["debug-llama"], host="127.0.0.1",
                        port=PORT)


async def _post(path, body):
    reader, writer = await asyncio.open_connection("127.0.0.1", PORT)
    payload = json.dumps(body).encode()
    head = (f"POST {path} HTTP/1.1\r\nHost: localhost\r\n"
            f"Content-Type: application/json\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n")
    writer.write(head.encode() + payload)
    await writer.drain()
    status = int((await reader.readline()).split()[1])
    length = 0
    while True:
        line = await reader.readline()
        if line in (b"\r\n", b"\n"):
            break
        k, v = line.decode().split(":", 1)
        if k.strip().lower() == "content-length":
            length = int(v)
    body_bytes = await reader.readexactly(length) if length else b""
    writer.close()
    return status, json.loads(body_bytes or b"{}")


def test_pp_server_completions(pp_server):
    async def run():
        server = pp_server
        await server.start()
        try:
            status, body = await _post(
                "/v1/completions",
                {"model": "debug-llama", "prompt": "pipeline server",
                 "max_tokens": 6, "temperature": 0})
            assert status == 200, body
            assert len(body["choices"]) == 1
            assert body["usage"]["completion_tokens"] == 6
            status, body = await _post(
                "/v1/chat/completions",
                {"model": "debug-llama", "max_tokens": 4,
                 "temperature": 0,
                 "messages": [{"role": "user", "content": "hi"}]})
            assert status == 200, body
        finally:
            await server.stop()
    asyncio.run(run())
