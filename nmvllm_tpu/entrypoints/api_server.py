"""OpenAI-compatible API server.

Reference: vllm/entrypoints/openai/api_server.py:129,145,159 — routes
/v1/chat/completions, /v1/completions, /v1/embeddings, /health:88,
/tokenize:95, /detokenize:106, /v1/models:117, /metrics (:74-79) and
/version. Served by the stdlib asyncio HTTP core (entrypoints/http.py).

Run: python -m nmvllm_tpu.entrypoints.api_server --model <model> [flags]
"""
import argparse
import asyncio
import json
from typing import Optional

from nmvllm_tpu import envs
from nmvllm_tpu.engine.arg_utils import AsyncEngineArgs
from nmvllm_tpu.engine.async_llm_engine import AsyncLLMEngine
from nmvllm_tpu.entrypoints.http import (HTTPServer, Request, Response,
                                         StreamingResponse)
from nmvllm_tpu.entrypoints.protocol import (ChatCompletionRequest,
                                             CompletionRequest,
                                             DetokenizeRequest,
                                             DetokenizeResponse,
                                             ErrorResponse, TokenizeRequest,
                                             TokenizeResponse)
from nmvllm_tpu.entrypoints.serving import (OpenAIServingChat,
                                            OpenAIServingEmbedding,
                                            OpenAIServingCompletion)
from nmvllm_tpu.logger import init_logger
from nmvllm_tpu.version import __version__

logger = init_logger(__name__)


def build_server(engine: AsyncLLMEngine, served_model_names,
                 host: str = "0.0.0.0", port: int = 8000,
                 api_key: str = "",
                 response_role: str = "assistant",
                 chat_template: Optional[str] = None) -> HTTPServer:
    server = HTTPServer(host, port, api_key=api_key)
    serving_chat = OpenAIServingChat(engine, served_model_names,
                                     response_role=response_role,
                                     chat_template=chat_template)
    serving_completion = OpenAIServingCompletion(engine, served_model_names)
    serving_embedding = OpenAIServingEmbedding(engine, served_model_names)

    async def ensure_init():
        if serving_chat.tokenizer is None:
            await serving_chat._post_init()
            await serving_completion._post_init()
            await serving_embedding._post_init()

    @server.route("GET", "/health")
    async def health(request: Request):
        await engine.check_health()
        return Response(200, b"", content_type="text/plain")

    @server.route("GET", "/version")
    async def version(request: Request):
        return {"version": __version__}

    @server.route("GET", "/v1/models")
    async def models(request: Request):
        await ensure_init()
        return (await serving_chat.show_available_models()).model_dump()

    @server.route("GET", "/metrics")
    async def metrics(request: Request):
        try:
            import prometheus_client
            data = prometheus_client.generate_latest()
            return Response(200, data, content_type="text/plain")
        except Exception:
            return Response(200, b"", content_type="text/plain")

    @server.route("POST", "/tokenize")
    async def tokenize(request: Request):
        await ensure_init()
        req = TokenizeRequest(**request.json())
        ids = serving_chat.tokenizer.encode(
            req.prompt, add_special_tokens=req.add_special_tokens) \
            if hasattr(serving_chat.tokenizer, "encode") else []
        return TokenizeResponse(
            tokens=list(ids), count=len(ids),
            max_model_len=serving_chat.max_model_len).model_dump()

    @server.route("POST", "/detokenize")
    async def detokenize(request: Request):
        await ensure_init()
        req = DetokenizeRequest(**request.json())
        text = serving_chat.tokenizer.decode(req.tokens)
        return DetokenizeResponse(prompt=text).model_dump()

    def _result_to_response(result):
        if isinstance(result, ErrorResponse):
            return Response(result.code,
                            {"error": result.model_dump()})
        if hasattr(result, "model_dump"):
            return Response(200, result.model_dump(exclude_none=True))
        return StreamingResponse(result)

    @server.route("POST", "/v1/chat/completions")
    async def chat_completions(request: Request):
        await ensure_init()
        try:
            req = ChatCompletionRequest(**request.json())
        except Exception as e:
            return Response(422, {"error": {"message": str(e),
                                            "type": "ValidationError"}})
        result = await serving_chat.create_chat_completion(req)
        return _result_to_response(result)

    @server.route("POST", "/v1/embeddings")
    async def embeddings(request: Request):
        await ensure_init()
        from nmvllm_tpu.entrypoints.protocol import EmbeddingRequest
        try:
            req = EmbeddingRequest(**request.json())
        except Exception as e:
            return Response(422, {"error": {"message": str(e),
                                            "type": "ValidationError"}})
        result = await serving_embedding.create_embedding(req)
        return _result_to_response(result)

    @server.route("POST", "/v1/completions")
    async def completions(request: Request):
        await ensure_init()
        try:
            req = CompletionRequest(**request.json())
        except Exception as e:
            return Response(422, {"error": {"message": str(e),
                                            "type": "ValidationError"}})
        result = await serving_completion.create_completion(req)
        return _result_to_response(result)

    return server


def make_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        description="nmvllm_tpu OpenAI-compatible API server")
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=envs.NMVLLM_PORT)
    parser.add_argument("--api-key", type=str,
                        default=envs.NMVLLM_API_KEY)
    # --served-model-name is registered by EngineArgs.add_cli_args below.
    parser.add_argument("--response-role", type=str, default="assistant")
    parser.add_argument("--chat-template", type=str, default=None)
    AsyncEngineArgs.add_cli_args(parser)
    return parser


async def run_server(args) -> None:
    engine_args = AsyncEngineArgs.from_cli_args(args)
    engine = AsyncLLMEngine.from_engine_args(engine_args)
    served = [args.served_model_name or engine_args.model]
    server = build_server(engine, served, host=args.host, port=args.port,
                          api_key=args.api_key,
                          response_role=args.response_role,
                          chat_template=args.chat_template)
    await server.serve()


def main() -> None:
    parser = make_arg_parser()
    args = parser.parse_args()
    asyncio.run(run_server(args))


if __name__ == "__main__":
    main()
