"""Verify drive: engine e2e on TPU over fused projections + fused-write
decode attention."""
from nmvllm_tpu import LLM, SamplingParams

SP = SamplingParams(temperature=0.0, max_tokens=8, logprobs=3)

print("=== 1. debug-llama greedy (fused qkv/gate_up + fused-write) ===")
llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
          max_num_seqs=8, max_model_len=256, block_size=32)
sa = llm.llm_engine.executor.runner.model.layers[0].self_attn
assert sa._qkv_fused is not None, "fusion inactive"
outs = llm.generate(["The quick brown fox", "Paged attention on TPU"], SP)
for o in outs:
    print(o.request_id, o.outputs[0].token_ids)
assert all(len(o.outputs[0].token_ids) == 8 for o in outs)

print("=== 2. chunked prefill + prefix caching ===")
llm3 = LLM(model="debug-llama", num_gpu_blocks_override=64,
           max_num_seqs=8, max_model_len=256, block_size=32,
           enable_chunked_prefill=True, enable_prefix_caching=True,
           max_num_batched_tokens=32)
long_prompt = "word " * 40
o3 = llm3.generate([long_prompt, long_prompt + "tail"], SP)
print([o.outputs[0].token_ids for o in o3])
assert all(len(o.outputs[0].token_ids) == 8 for o in o3)
print("VERIFY OK")
