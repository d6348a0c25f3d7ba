"""Ngram speculative decoding example (reference: vllm speculative
decoding docs / examples). Greedy output is identical to the
non-speculative engine; repetitive text gets multi-token accepts."""
from nmvllm_tpu import LLM, SamplingParams

llm = LLM(model="debug-llama", max_model_len=256,
          ngram_prompt_lookup_max=3, ngram_prompt_lookup_min=1,
          num_speculative_tokens=4)
out = llm.generate(
    ["the quick brown fox jumps over the lazy dog the quick brown"],
    SamplingParams(temperature=0.0, max_tokens=32))
print(out[0].outputs[0].text)
print("spec stats:", llm.llm_engine.spec_stats)
