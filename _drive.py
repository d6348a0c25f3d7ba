"""Verify drive: Mixtral MoE through the unified moe_apply dispatch on TPU."""
from nmvllm_tpu import LLM, SamplingParams

llm = LLM(model="debug-mixtral", num_gpu_blocks_override=64,
          max_num_seqs=8, max_model_len=256)
out = llm.generate(["Experts on TPU"], SamplingParams(
    temperature=0.0, max_tokens=8))
toks = list(out[0].outputs[0].token_ids)
print("mixtral tokens:", toks)
assert len(toks) == 8
print("VERIFY OK")
