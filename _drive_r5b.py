"""Verify drive 2: mixtral INT4 experts + a8p-inq through the LLM surface."""
import os
os.environ["NMVLLM_INT4_A8"] = "packed"
from nmvllm_tpu import LLM, SamplingParams
llm = LLM(model="debug-mixtral", quantization="gptq",
          num_gpu_blocks_override=64, max_num_seqs=8, max_model_len=256)
out = llm.generate(["the quick brown fox", "hello"],
                   SamplingParams(temperature=0.0, max_tokens=8))
print("MIXTRAL-INT4 tokens:", [o.outputs[0].token_ids for o in out],
      flush=True)
assert all(len(o.outputs[0].token_ids) == 8 for o in out)
print("VERIFY OK", flush=True)
