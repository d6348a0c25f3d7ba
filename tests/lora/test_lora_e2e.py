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


def make_adapter_tp(tmp_path, name, scale, hidden=1024, layers=2):
    """Adapter targeting q_proj (column-parallel) AND o_proj
    (row-parallel) of debug-llama-tp. Fixed seed: the same adapter must
    be reproducible across tp runs."""
    d = tmp_path / name
    d.mkdir()
    rng = np.random.default_rng(1234)
    with open(d / "adapter_config.json", "w") as f:
        json.dump({"r": 8, "lora_alpha": 16,
                   "target_modules": ["q_proj", "o_proj"]}, f)
    tensors = {}
    for i in range(layers):
        pre = f"base_model.model.model.layers.{i}.self_attn"
        tensors[pre + ".q_proj.lora_A.weight"] = (
            rng.normal(size=(8, hidden)).astype(np.float32) * scale)
        tensors[pre + ".q_proj.lora_B.weight"] = (
            rng.normal(size=(hidden, 8)).astype(np.float32) * scale)
        tensors[pre + ".o_proj.lora_A.weight"] = (
            rng.normal(size=(8, hidden)).astype(np.float32) * scale)
        tensors[pre + ".o_proj.lora_B.weight"] = (
            rng.normal(size=(hidden, 8)).astype(np.float32) * scale)
    save_file(tensors, str(d / "adapter_model.safetensors"))
    return str(d)


def _run_tp_lora(tmp_path, tp):
    """Same adapter + prompt at a given tp; returns (tokens, logprob)."""
    path = make_adapter_tp(tmp_path, f"tp{tp}", 0.02)
    llm = LLM(model="debug-llama-tp", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256, enable_lora=True,
              max_loras=2, max_lora_rank=8, tensor_parallel_size=tp,
              seed=0)
    eng = llm.llm_engine
    eng.add_request("l1", prompt="TP probe", sampling_params=SP,
                    lora_request=LoRARequest("a", 1, path))
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.outputs[0]
    out = outs["l1"]
    return out.token_ids, out.logprobs[0][out.token_ids[0]].logprob


def test_lora_tp_sharded_matches_tp1(tmp_path):
    """TP-sharded adapter stacks (column: B on N; row: A on K, delta in
    the layer psum) must reproduce the tp=1 result."""
    toks1, lp1 = _run_tp_lora(tmp_path, 1)
    toks2, lp2 = _run_tp_lora(tmp_path, 2)
    assert toks1 == toks2
    assert abs(lp1 - lp2) < 5e-2, (lp1, lp2)
