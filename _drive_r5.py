"""Round-5 verify drive: engine through the public LLM surface on TPU,
exercising the W4A8-packed weight path and the fp8-KV fast dequant."""
import os
os.environ["NMVLLM_INT4_A8"] = "packed"
from nmvllm_tpu import LLM, SamplingParams

# Leg 1: W4A8-packed INT4 serving (gptq debug model).
llm = LLM(model="debug-llama", quantization="gptq",
          num_gpu_blocks_override=64, max_num_seqs=8, max_model_len=256)
out = llm.generate(["the quick brown fox", "jumps over"],
                   SamplingParams(temperature=0.0, max_tokens=8))
print("A8P tokens:", [o.outputs[0].token_ids for o in out], flush=True)
assert all(len(o.outputs[0].token_ids) == 8 for o in out)
del llm

# Leg 2: fp8 KV cache fast dequant (decode reads fp8 pages in-kernel).
llm2 = LLM(model="debug-llama", kv_cache_dtype="fp8",
           num_gpu_blocks_override=64, max_num_seqs=8, max_model_len=256)
out2 = llm2.generate(["hello world this is"],
                     SamplingParams(temperature=0.0, max_tokens=12))
print("FP8-KV tokens:", out2[0].outputs[0].token_ids, flush=True)
assert len(out2[0].outputs[0].token_ids) == 12
print("VERIFY OK", flush=True)
