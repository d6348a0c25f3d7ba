"""Verify drive: engine decode through the public LLM surface, with
prefix caching (chained native hashing) and the native batch assembly."""
from nmvllm_tpu import LLM, SamplingParams

llm = LLM(model="debug-llama", num_gpu_blocks_override=64, max_num_seqs=8,
          max_model_len=256, enable_prefix_caching=True)
prompts = ["the quick brown fox " * 8, "the quick brown fox " * 8 + "jumps",
           "hello world"]
out = llm.generate(prompts, SamplingParams(temperature=0.0, max_tokens=24))
for o in out:
    assert len(o.outputs[0].token_ids) == 24, o
print("tokens:", [o.outputs[0].token_ids[:6] for o in out])

# Native assembly must actually be active (not silently fallen back).
runner = llm.llm_engine.executor.runner
assert runner._native_reg not in (None, False), "native registry inactive"
assert runner._native_map, "native mirror never populated"
print("native mirror entries:", len(runner._native_map))

# Second pass reuses cached prefix blocks (hash chain path).
out2 = llm.generate(prompts[:1],
                    SamplingParams(temperature=0.0, max_tokens=8))
print("prefix-cached rerun tokens:", out2[0].outputs[0].token_ids)
print("DRIVE OK")
