"""Online serving benchmark: TTFT / TPOT / ITL percentiles + throughput.

Reference: benchmarks/benchmark_serving.py (BenchmarkMetrics :54-70,
computed :205-252) — same metric definitions, implemented with stdlib
asyncio HTTP against the OpenAI-compatible server.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), *([".."] * (1))))
import asyncio
import json
import random
import time
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np


@dataclass
class RequestResult:
    success: bool = False
    prompt_len: int = 0
    output_len: int = 0
    ttft: float = 0.0
    latency: float = 0.0
    itls: List[float] = field(default_factory=list)


async def send_request(host: str, port: int, model: str, prompt: str,
                       output_len: int) -> RequestResult:
    result = RequestResult(prompt_len=len(prompt))
    payload = json.dumps({
        "model": model, "prompt": prompt, "max_tokens": output_len,
        "temperature": 0.0, "stream": True, "ignore_eos": True,
    }).encode()
    start = time.perf_counter()
    try:
        reader, writer = await asyncio.open_connection(host, port)
        writer.write(
            (f"POST /v1/completions HTTP/1.1\r\nHost: {host}\r\n"
             f"Content-Type: application/json\r\n"
             f"Content-Length: {len(payload)}\r\n\r\n").encode() + payload)
        await writer.drain()
        last_token_time = start
        num_chunks = 0
        while True:
            line = await reader.readline()
            if not line:
                break
            text = line.decode(errors="replace").strip()
            if '"text"' in text or "data: {" in text:
                now = time.perf_counter()
                if num_chunks == 0:
                    result.ttft = now - start
                else:
                    result.itls.append(now - last_token_time)
                last_token_time = now
                num_chunks += 1
            if "data: [DONE]" in text:
                break
        result.latency = time.perf_counter() - start
        result.output_len = num_chunks
        result.success = num_chunks > 0
        writer.close()
        await writer.wait_closed()
    except Exception:
        result.success = False
    return result


async def run(args):
    rng = random.Random(args.seed)
    prompts = ["".join(rng.choice("abcdefghij klmnop")
                       for _ in range(args.input_len))
               for _ in range(args.num_prompts)]

    sem = asyncio.Semaphore(args.max_concurrency)

    async def bounded(prompt):
        async with sem:
            return await send_request(args.host, args.port, args.model,
                                      prompt, args.output_len)

    bench_start = time.perf_counter()
    tasks = []
    for prompt in prompts:
        tasks.append(asyncio.create_task(bounded(prompt)))
        if args.request_rate < float("inf"):
            await asyncio.sleep(1.0 / args.request_rate)
    results = await asyncio.gather(*tasks)
    duration = time.perf_counter() - bench_start

    ok = [r for r in results if r.success]
    if not ok:
        print(json.dumps({"error": "no successful requests"}))
        return
    ttfts = [r.ttft for r in ok]
    tpots = [(r.latency - r.ttft) / max(r.output_len - 1, 1) for r in ok]
    itls = [i for r in ok for i in r.itls]
    metrics = {
        "completed": len(ok),
        "duration_s": duration,
        "request_throughput": len(ok) / duration,
        "output_token_throughput": sum(r.output_len for r in ok) / duration,
        "mean_ttft_ms": float(np.mean(ttfts)) * 1000,
        "median_ttft_ms": float(np.median(ttfts)) * 1000,
        "p99_ttft_ms": float(np.percentile(ttfts, 99)) * 1000,
        "mean_tpot_ms": float(np.mean(tpots)) * 1000,
        "median_tpot_ms": float(np.median(tpots)) * 1000,
        "p99_tpot_ms": float(np.percentile(tpots, 99)) * 1000,
        "p99_itl_ms": (float(np.percentile(itls, 99)) * 1000
                       if itls else None),
    }
    print(json.dumps(metrics, indent=2))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--model", type=str, default="debug-llama")
    parser.add_argument("--num-prompts", type=int, default=32)
    parser.add_argument("--input-len", type=int, default=64)
    parser.add_argument("--output-len", type=int, default=64)
    parser.add_argument("--request-rate", type=float, default=float("inf"))
    parser.add_argument("--max-concurrency", type=int, default=16)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    asyncio.run(run(args))


if __name__ == "__main__":
    main()
