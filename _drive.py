"""Verify drive: multi-LoRA routing through the engine on the real TPU
(covers the _named_linears refactor + LoRA stack plumbing)."""
import json

import numpy as np
from safetensors.numpy import save_file

from nmvllm_tpu import LLM, SamplingParams
from nmvllm_tpu.lora.request import LoRARequest

import os
import tempfile

SP = SamplingParams(temperature=0.0, max_tokens=4)

d = tempfile.mkdtemp(prefix="lora_drive_")
rng = np.random.default_rng(7)
with open(os.path.join(d, "adapter_config.json"), "w") as f:
    json.dump({"r": 8, "lora_alpha": 16, "target_modules": ["q_proj"]}, f)
tensors = {}
for i in range(2):
    pre = f"base_model.model.model.layers.{i}.self_attn.q_proj"
    tensors[pre + ".lora_A.weight"] = rng.normal(
        size=(8, 256)).astype(np.float32) * 0.3
    tensors[pre + ".lora_B.weight"] = rng.normal(
        size=(256, 8)).astype(np.float32) * 0.3
save_file(tensors, os.path.join(d, "adapter_model.safetensors"))

llm = LLM(model="debug-llama", num_gpu_blocks_override=64, max_num_seqs=8,
          max_model_len=256, enable_lora=True, max_loras=2,
          max_lora_rank=8, seed=0)
eng = llm.llm_engine
base = llm.generate(["Adapter probe"], SP)[0].outputs[0]
eng.add_request("l1", prompt="Adapter probe", sampling_params=SP,
                lora_request=LoRARequest("a1", 1, d))
eng.add_request("b0", prompt="Adapter probe", sampling_params=SP)
outs = {}
while eng.has_unfinished_requests():
    for o in eng.step():
        if o.finished:
            outs[o.request_id] = o.outputs[0]
print("base:", list(base.token_ids))
print("lora:", list(outs["l1"].token_ids))
print("b0  :", list(outs["b0"].token_ids))
assert list(outs["b0"].token_ids) == list(base.token_ids)
print("VERIFY OK")
