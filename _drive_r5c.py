"""Verify drive: engine through the public LLM surface with the round-5c
fused-a8p-MLP flag off (default) and on, logprob-compared."""
import os
import sys

os.environ["NMVLLM_INT4_A8"] = "packed"
mode = sys.argv[1] if len(sys.argv) > 1 else "0"
os.environ["NMVLLM_FUSED_MLP_A8"] = mode

from nmvllm_tpu import LLM, SamplingParams

llm = LLM(model="debug-llama-tp", quantization="gptq",
          num_gpu_blocks_override=64, max_num_seqs=8, max_model_len=256)
out = llm.generate(["the quick brown fox", "hello world"],
                   SamplingParams(temperature=0.0, max_tokens=8,
                                  logprobs=1))
for o in out:
    toks = o.outputs[0].token_ids
    lps = [next(iter(d.values())).logprob for d in o.outputs[0].logprobs]
    print("TOKENS", toks)
    print("LOGPROBS", [round(float(x), 4) for x in lps])
assert all(len(o.outputs[0].token_ids) == 8 for o in out)
print("VERIFY OK mode=" + mode, flush=True)
