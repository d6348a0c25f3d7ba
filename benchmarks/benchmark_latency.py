"""Batch end-to-end latency benchmark
(reference: benchmarks/benchmark_latency.py)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), *([".."] * (1))))
import json
import time

import numpy as np

from nmvllm_tpu import LLM, SamplingParams


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="debug-llama")
    parser.add_argument("--quantization", type=str, default=None)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--input-len", type=int, default=32)
    parser.add_argument("--output-len", type=int, default=128)
    parser.add_argument("--num-iters-warmup", type=int, default=1)
    parser.add_argument("--num-iters", type=int, default=3)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    llm = LLM(model=args.model, quantization=args.quantization,
              max_num_seqs=args.batch_size,
              max_model_len=args.input_len + args.output_len + 16)
    vocab = llm.llm_engine.model_config.get_vocab_size()
    rng = np.random.default_rng(args.seed)
    prompts = rng.integers(3, vocab - 1,
                           (args.batch_size, args.input_len)).tolist()
    sp = SamplingParams(temperature=0.0, max_tokens=args.output_len,
                        ignore_eos=True)

    def run():
        t0 = time.perf_counter()
        llm.generate(prompt_token_ids=prompts, sampling_params=sp)
        return time.perf_counter() - t0

    for _ in range(args.num_iters_warmup):
        run()
    latencies = [run() for _ in range(args.num_iters)]
    print(json.dumps({
        "avg_latency": float(np.mean(latencies)),
        "p50_latency": float(np.percentile(latencies, 50)),
        "p99_latency": float(np.percentile(latencies, 99)),
        "latencies": latencies,
    }))


if __name__ == "__main__":
    main()
