"""Offline engine throughput benchmark
(reference: benchmarks/benchmark_throughput.py + NM variants
neuralmagic/benchmarks/scripts/benchmark_throughput.py with
prefill/decode-isolating configs)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), *([".."] * (1))))
import json
import random
import time

from nmvllm_tpu import LLM, SamplingParams


def make_prompts(num_prompts: int, input_len: int, vocab: int, seed: int):
    rng = random.Random(seed)
    return [[rng.randrange(3, vocab - 1) for _ in range(input_len)]
            for _ in range(num_prompts)]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, default="debug-llama")
    parser.add_argument("--quantization", type=str, default=None)
    parser.add_argument("--sparsity", type=str, default=None)
    parser.add_argument("--num-prompts", type=int, default=64)
    parser.add_argument("--input-len", type=int, default=128)
    parser.add_argument("--output-len", type=int, default=128)
    parser.add_argument("--max-num-seqs", type=int, default=64)
    parser.add_argument("--max-model-len", type=int, default=None)
    parser.add_argument("--block-size", type=int, default=16)
    parser.add_argument("--kv-cache-dtype", type=str, default="auto")
    parser.add_argument("--enable-chunked-prefill", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output-json", type=str, default=None)
    args = parser.parse_args()

    max_model_len = args.max_model_len or (args.input_len + args.output_len +
                                           16)
    llm = LLM(model=args.model, quantization=args.quantization,
              sparsity=args.sparsity, max_num_seqs=args.max_num_seqs,
              max_model_len=max_model_len, block_size=args.block_size,
              kv_cache_dtype=args.kv_cache_dtype,
              enable_chunked_prefill=args.enable_chunked_prefill,
              seed=args.seed)
    vocab = llm.llm_engine.model_config.get_vocab_size()
    prompts = make_prompts(args.num_prompts, args.input_len, vocab,
                           args.seed)
    sp = SamplingParams(temperature=0.0, max_tokens=args.output_len,
                        ignore_eos=True)

    # Warmup to populate the compile cache before timing.
    llm.generate(prompt_token_ids=[prompts[0]],
                 sampling_params=SamplingParams(temperature=0.0,
                                                max_tokens=4,
                                                ignore_eos=True))

    start = time.perf_counter()
    outputs = llm.generate(prompt_token_ids=prompts, sampling_params=sp)
    elapsed = time.perf_counter() - start
    total_in = sum(len(p) for p in prompts)
    total_out = sum(len(o.outputs[0].token_ids) for o in outputs)
    result = {
        "elapsed_time": elapsed,
        "num_requests": args.num_prompts,
        "total_input_tokens": total_in,
        "total_output_tokens": total_out,
        "requests_per_second": args.num_prompts / elapsed,
        "tokens_per_second": (total_in + total_out) / elapsed,
        "output_tokens_per_second": total_out / elapsed,
    }
    print(json.dumps(result))
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
