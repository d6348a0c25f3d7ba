"""Verify drive: engine e2e on TPU after the read-only decode-kernel
split (no aliased kv output when the cache write is not fused)."""
from nmvllm_tpu import LLM, SamplingParams

SP = SamplingParams(temperature=0.0, max_tokens=8, logprobs=2)

print("=== 1. plain greedy decode (fused-write kernel) ===")
llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
          max_num_seqs=8, max_model_len=256)
outs = llm.generate(["The quick brown fox", "Paged attention on TPU"], SP)
for o in outs:
    print(o.request_id, list(o.outputs[0].token_ids))
assert all(len(o.outputs[0].token_ids) == 8 for o in outs)
del llm

print("=== 2. ngram spec decode (read-only verify path) ===")
llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
          max_num_seqs=8, max_model_len=256,
          ngram_prompt_lookup_max=3, num_speculative_tokens=3)
outs = llm.generate(["one two three one two three one two"], SP)
print("spec tokens:", list(outs[0].outputs[0].token_ids))
print("spec stats:", llm.llm_engine.spec_stats)
assert len(outs[0].outputs[0].token_ids) == 8
print("VERIFY OK")
