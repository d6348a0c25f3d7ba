"""Round-4 verify drive: large-prompt prefill through the public LLM
surface on the real chip (the VMEM-OOM fix scenario)."""
from nmvllm_tpu import LLM, SamplingParams

llm = LLM(model="llama-3-8b", quantization="gptq", max_num_seqs=4,
          max_model_len=4096, num_gpu_blocks_override=256)
prompt_ids = list(range(100, 2100))   # 2000-token prompt
out = llm.generate(prompt_token_ids=[prompt_ids],
                   sampling_params=SamplingParams(temperature=0.0,
                                                  max_tokens=4))
toks = out[0].outputs[0].token_ids
print("large-prompt tokens:", toks)
assert len(toks) == 4
print("DRIVE OK")
