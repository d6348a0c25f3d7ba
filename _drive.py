from nmvllm_tpu import LLM, SamplingParams
llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
          max_num_seqs=8, max_model_len=256)
out = llm.generate(["verify pp-dp round: single-chip engine smoke",
                    "second prompt"],
                   SamplingParams(temperature=0.0, max_tokens=8))
for o in out:
    print("TOKENS", o.outputs[0].token_ids)
print("VERIFY_OK")
