"""Verify-skill drive: ngram speculative decoding on the TPU tunnel
through the public LLM surface (exercises the refactored
spec_accept_and_sample in-graph acceptance)."""
from nmvllm_tpu import LLM, SamplingParams

llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
          max_num_seqs=8, max_model_len=256,
          ngram_prompt_lookup_max=3, ngram_prompt_lookup_min=1,
          num_speculative_tokens=4)
out = llm.generate(["the cat sat on the mat the cat sat on the",
                    "one two three one two three one two"],
                   SamplingParams(temperature=0.0, max_tokens=16,
                                  ignore_eos=True))
stats = llm.llm_engine.spec_stats
assert stats["num_spec_steps"] > 0, stats
assert all(len(o.outputs[0].token_ids) == 16 for o in out)
print("TPU spec drive OK:", stats)
