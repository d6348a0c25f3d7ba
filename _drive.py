"""Round-4 verify drive: disable_sliding_window config hardening +
PP draft-spec support through the public LLM surface."""
from nmvllm_tpu import LLM, SamplingParams
from nmvllm_tpu.config import ModelConfig

# 1. Explicit over-window max_model_len now raises.
try:
    ModelConfig(model="debug-mistral", tokenizer="debug-mistral",
                tokenizer_mode="auto", trust_remote_code=False,
                dtype="auto", seed=0, disable_sliding_window=True,
                max_model_len=128)
    raise SystemExit("FAIL: over-window max_model_len did not raise")
except ValueError as e:
    print("over-window raise OK:", e)

# 2. disable_sliding_window still serves full attention end-to-end.
llm = LLM(model="debug-mistral", disable_sliding_window=True,
          enable_prefix_caching=True, num_gpu_blocks_override=64,
          max_num_seqs=4)
out = llm.generate(["the quick brown fox"],
                   SamplingParams(temperature=0.0, max_tokens=8))
print("full-attn tokens:", out[0].outputs[0].token_ids)
assert len(out[0].outputs[0].token_ids) == 8
del llm

# 3. Draft-model spec under PP still generates (executor assert path).
llm = LLM(model="debug-llama", pipeline_parallel_size=2,
          num_gpu_blocks_override=64, max_num_seqs=8, max_model_len=256,
          speculative_model="debug-llama", num_speculative_tokens=3)
out = llm.generate(["a b c d a b c d a b"],
                   SamplingParams(temperature=0.0, max_tokens=12,
                                  ignore_eos=True))
print("pp draft-spec tokens:", out[0].outputs[0].token_ids)
assert len(out[0].outputs[0].token_ids) == 12
print("DRIVE OK")
