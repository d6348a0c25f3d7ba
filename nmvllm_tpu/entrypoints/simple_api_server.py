"""Simple /generate demo server (reference:
vllm/entrypoints/api_server.py:34 — non-OpenAI test server)."""
import argparse
import asyncio
import json

from nmvllm_tpu.engine.arg_utils import AsyncEngineArgs
from nmvllm_tpu.engine.async_llm_engine import AsyncLLMEngine
from nmvllm_tpu.entrypoints.http import (HTTPServer, Request, Response,
                                         StreamingResponse)
from nmvllm_tpu.sampling_params import SamplingParams
from nmvllm_tpu.utils import random_uuid


def build_app(engine: AsyncLLMEngine, host: str, port: int) -> HTTPServer:
    server = HTTPServer(host, port)

    @server.route("GET", "/health")
    async def health(request: Request):
        return Response(200, b"", content_type="text/plain")

    @server.route("POST", "/generate")
    async def generate(request: Request):
        payload = request.json() or {}
        prompt = payload.pop("prompt", "")
        stream = payload.pop("stream", False)
        sampling_params = SamplingParams(**payload)
        request_id = random_uuid()
        results = engine.generate(prompt, sampling_params, request_id)

        if stream:
            async def gen():
                async for output in results:
                    text = [(output.prompt or "") + o.text
                            for o in output.outputs]
                    yield json.dumps({"text": text}) + "\0"
            return StreamingResponse(gen(),
                                     content_type="application/json")
        final = None
        async for output in results:
            final = output
        text = [(final.prompt or "") + o.text for o in final.outputs]
        return {"text": text}

    return server


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    AsyncEngineArgs.add_cli_args(parser)
    args = parser.parse_args()
    engine = AsyncLLMEngine.from_engine_args(
        AsyncEngineArgs.from_cli_args(args))

    async def run():
        server = build_app(engine, args.host, args.port)
        await server.serve()

    asyncio.run(run())


if __name__ == "__main__":
    main()
