"""Quantized / sparse inference (reference:
examples-neuralmagic offline_inference_sparse path + quantization docs).

Works with either a local GPTQ/AWQ checkpoint directory or a preset with
runtime random weights (for smoke testing kernels).
"""
import argparse

from nmvllm_tpu import LLM, SamplingParams


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", default="debug-llama")
    parser.add_argument("--quantization", default="gptq",
                        help="gptq | awq | fp8 | compressed-tensors | None")
    parser.add_argument("--sparsity", default=None,
                        help="sparse_w16a16 | semi_structured_sparse_w16a16")
    args = parser.parse_args()

    llm = LLM(model=args.model,
              quantization=args.quantization or None,
              sparsity=args.sparsity,
              kv_cache_dtype="auto")
    out = llm.generate(["Compressed inference says:"],
                       SamplingParams(temperature=0.0, max_tokens=16))
    print(out[0].outputs[0].text)


if __name__ == "__main__":
    main()
