"""Multi-LoRA engine integration: adapter requests produce different
outputs than the base model, base requests are unaffected, and per-LoRA
routing works within a batch (reference tests/lora e2e tier)."""
import json

import numpy as np
import pytest
from safetensors.numpy import save_file

from nmvllm_tpu import LLM, SamplingParams
from nmvllm_tpu.lora.request import LoRARequest

pytestmark = pytest.mark.e2e

SP = SamplingParams(temperature=0.0, max_tokens=4, logprobs=5)


def make_adapter(tmp_path, name, scale):
    d = tmp_path / name
    d.mkdir()
    rng = np.random.default_rng(hash(name) % 2**31)
    with open(d / "adapter_config.json", "w") as f:
        json.dump({"r": 8, "lora_alpha": 16,
                   "target_modules": ["q_proj"]}, f)
    tensors = {}
    for i in range(2):  # debug-llama has 2 layers
        pre = f"base_model.model.model.layers.{i}.self_attn.q_proj"
        tensors[pre + ".lora_A.weight"] = (
            rng.normal(size=(8, 256)).astype(np.float32) * scale)
        tensors[pre + ".lora_B.weight"] = (
            rng.normal(size=(256, 8)).astype(np.float32) * scale)
    save_file(tensors, str(d / "adapter_model.safetensors"))
    return str(d)


def test_lora_routing(tmp_path):
    path1 = make_adapter(tmp_path, "a1", 0.2)
    path2 = make_adapter(tmp_path, "a2", 0.3)
    llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256, enable_lora=True,
              max_loras=2, max_lora_rank=8)
    eng = llm.llm_engine

    base = llm.generate(["Routing probe"], SP)[0].outputs[0]

    eng.add_request("l1", prompt="Routing probe", sampling_params=SP,
                    lora_request=LoRARequest("a1", 1, path1))
    eng.add_request("l2", prompt="Routing probe", sampling_params=SP,
                    lora_request=LoRARequest("a2", 2, path2))
    eng.add_request("b0", prompt="Routing probe", sampling_params=SP)
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.outputs[0]
    assert set(outs) == {"l1", "l2", "b0"}
    # Base request within the LoRA batch must match the pure-base run.
    assert outs["b0"].token_ids == base.token_ids
    # Adapters change the logits (first-token logprob differs from base).
    lp = lambda o: o.logprobs[0][o.token_ids[0]].logprob
    assert (outs["l1"].token_ids != base.token_ids
            or abs(lp(outs["l1"]) - lp(base)) > 1e-4)
    assert (outs["l2"].token_ids != outs["l1"].token_ids
            or abs(lp(outs["l2"]) - lp(outs["l1"])) > 1e-4)
