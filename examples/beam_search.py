"""Beam search example (reference: SamplingParams(use_beam_search=True))."""
from nmvllm_tpu import LLM, SamplingParams

llm = LLM(model="debug-llama", max_model_len=256)
out = llm.generate(
    ["The capital of France is"],
    SamplingParams(use_beam_search=True, temperature=0.0, best_of=4, n=4,
                   max_tokens=16, length_penalty=1.0))
for i, comp in enumerate(out[0].outputs):
    print(f"beam {i}: score={comp.cumulative_logprob:.2f} {comp.text!r}")
