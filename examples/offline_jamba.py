"""Jamba (hybrid Mamba/attention MoE) offline inference.

The recurrent SSM state lives in per-layer slot pools instead of paged KV
(models/jamba.py); everything else — chunked prefill, continuous batching,
sampling — works unchanged. Swap `debug-jamba` for a local
`ai21labs/AI21-Jamba-*` checkpoint directory to run the real model.
"""
from nmvllm_tpu import LLM, SamplingParams

llm = LLM(model="debug-jamba", max_model_len=512, max_num_seqs=8,
          num_gpu_blocks_override=128)

prompts = [
    "The hybrid architecture combines",
    "State-space models scale linearly because",
]
outputs = llm.generate(prompts, SamplingParams(temperature=0.0,
                                               max_tokens=32))
for out in outputs:
    print(f"{out.prompt!r} -> {out.outputs[0].token_ids}")
