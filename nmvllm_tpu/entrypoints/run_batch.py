"""OpenAI batch-file runner (reference: vllm/entrypoints/openai/run_batch.py).

Reads an OpenAI batch-format JSONL (one request per line:
``{"custom_id", "method": "POST", "url": "/v1/chat/completions",
"body": {...}}``), runs every request through the async engine
concurrently, and writes a response JSONL
(``{"id", "custom_id", "response": {...}, "error": ...}``).

Usage:
  python -m nmvllm_tpu.entrypoints.run_batch \
      -i requests.jsonl -o results.jsonl --model <model>
"""
import argparse
import asyncio
import json
import sys
from typing import Optional

from nmvllm_tpu.engine.arg_utils import AsyncEngineArgs
from nmvllm_tpu.engine.async_llm_engine import AsyncLLMEngine
from nmvllm_tpu.entrypoints.protocol import (ChatCompletionRequest,
                                             EmbeddingRequest,
                                             ErrorResponse)
from nmvllm_tpu.entrypoints.serving import (OpenAIServingChat,
                                            OpenAIServingEmbedding)
from nmvllm_tpu.logger import init_logger
from nmvllm_tpu.utils import random_uuid

logger = init_logger(__name__)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="nmvllm_tpu OpenAI batch runner")
    parser.add_argument("-i", "--input-file", required=True,
                        help="Input batch JSONL path")
    parser.add_argument("-o", "--output-file", required=True,
                        help="Output results JSONL path")
    parser.add_argument("--response-role", default="assistant")
    parser = AsyncEngineArgs.add_cli_args(parser)
    return parser.parse_args(argv)


async def run_request(serving_chat: OpenAIServingChat,
                      serving_embedding: OpenAIServingEmbedding,
                      line: str) -> Optional[dict]:
    line = line.strip()
    if not line:
        return None
    try:
        req = json.loads(line)
    except json.JSONDecodeError as e:
        return {"id": f"nmvllm-{random_uuid()}", "custom_id": None,
                "response": None, "error": f"invalid JSON: {e}"}
    custom_id = req.get("custom_id")
    url = req.get("url", "/v1/chat/completions")
    out = {"id": f"nmvllm-{random_uuid()}", "custom_id": custom_id,
           "response": None, "error": None}
    try:
        if url.endswith("/chat/completions"):
            body = ChatCompletionRequest(**req.get("body", {}))
            if body.stream:
                raise ValueError("streaming is not supported in batch mode")
            resp = await serving_chat.create_chat_completion(body)
        elif url.endswith("/embeddings"):
            body = EmbeddingRequest(**req.get("body", {}))
            resp = await serving_embedding.create_embedding(body)
        else:
            raise ValueError(f"unsupported batch url {url!r} (supported: "
                             "/v1/chat/completions, /v1/embeddings)")
        if isinstance(resp, ErrorResponse):
            out["response"] = {"status_code": resp.code,
                               "request_id": out["id"],
                               "body": resp.model_dump()}
            out["error"] = resp.message
        else:
            out["response"] = {"status_code": 200,
                               "request_id": out["id"],
                               "body": resp.model_dump()}
    except Exception as e:  # per-line isolation, like the reference
        out["error"] = str(e)
    return out


async def amain(args) -> None:
    engine_args = AsyncEngineArgs.from_cli_args(args)
    engine = AsyncLLMEngine.from_engine_args(engine_args)
    served = [args.served_model_name or args.model]
    serving_chat = OpenAIServingChat(engine, served,
                                     response_role=args.response_role)
    serving_embedding = OpenAIServingEmbedding(engine, served)
    await serving_chat._post_init()
    await serving_embedding._post_init()

    with open(args.input_file) as f:
        lines = f.readlines()
    results = await asyncio.gather(*[
        run_request(serving_chat, serving_embedding, line)
        for line in lines])
    n_err = 0
    with open(args.output_file, "w") as f:
        for r in results:
            if r is None:
                continue
            n_err += int(r.get("error") is not None)
            f.write(json.dumps(r) + "\n")
    logger.info("Batch complete: %d results (%d errors) -> %s",
                sum(r is not None for r in results), n_err,
                args.output_file)


def main(argv=None):
    args = parse_args(argv)
    asyncio.run(amain(args))


if __name__ == "__main__":
    main()
