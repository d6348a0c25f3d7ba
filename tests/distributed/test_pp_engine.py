"""Engine-level pipeline parallelism: LLM(pipeline_parallel_size=2) must
produce the same greedy tokens as the single-stage engine on the virtual
CPU mesh (reference: tests/distributed/test_pipeline_parallel.py runs a
PPxTP server grid; here the engine is driven directly, debug model)."""
import os

import jax
import pytest

os.environ.setdefault("NMVLLM_DISABLE_PALLAS", "1")

from nmvllm_tpu import LLM, SamplingParams


def _generate(prompts, model="debug-llama", **kwargs):
    llm = LLM(model=model, dtype="float32",
              num_gpu_blocks_override=64, max_num_seqs=8,
              max_model_len=128, swap_space=0.01, **kwargs)
    outs = llm.generate(prompts,
                        SamplingParams(temperature=0.0, max_tokens=8))
    return [tuple(o.outputs[0].token_ids) for o in outs]


@pytest.mark.parametrize("pp,tp,model", [
    (2, 1, "debug-llama"),
    (2, 2, "debug-llama-tp"),
    (2, 1, "debug-mixtral"),  # MoE expert stacks ride the stage scan
])
def test_pp_engine_matches_single_stage(pp, tp, model, example_prompts):
    if len(jax.devices()) < max(pp * tp, 2):
        pytest.skip("needs more virtual devices")
    base = _generate(example_prompts, model=model)
    pp_toks = _generate(example_prompts, model=model,
                        pipeline_parallel_size=pp,
                        tensor_parallel_size=tp)
    assert pp_toks == base


def test_pp_rejects_unsupported_combos():
    if len(jax.devices()) < 2:
        pytest.skip("needs more virtual devices")
    # ngram AND draft-model spec are SUPPORTED under PP
    # (test_pp_spec_decode.py); only MLP-speculators are rejected — they
    # need the target's hidden states, which the stage scan never
    # exposes (executor.py MLP-speculator guard).
    with pytest.raises(ValueError, match="MLP-speculator"):
        LLM(model="debug-llama", dtype="float32",
            num_gpu_blocks_override=16, max_model_len=64,
            pipeline_parallel_size=2,
            speculative_model="debug-mlp-speculator",
            num_speculative_tokens=2)


@pytest.mark.parametrize("feature", ["prefix_caching", "chunked_prefill"])
def test_pp_engine_with_prefill_features(feature, example_prompts):
    if len(jax.devices()) < 2:
        pytest.skip("needs more virtual devices")
    kwargs = ({"enable_prefix_caching": True} if feature == "prefix_caching"
              else {"enable_chunked_prefill": True,
                    "max_num_batched_tokens": 32})
    # Shared prefix exercises the paged-prefix pipeline prefill path.
    prompts = [example_prompts[0] + " one", example_prompts[0] + " two"]
    base = _generate(prompts, **kwargs)
    pp = _generate(prompts, pipeline_parallel_size=2, **kwargs)
    assert pp == base


def test_pp_engine_best_of(example_prompts):
    if len(jax.devices()) < 2:
        pytest.skip("needs more virtual devices")
    from nmvllm_tpu import LLM, SamplingParams
    sp = SamplingParams(temperature=0.7, seed=3, n=2, max_tokens=6)

    def run(**kw):
        llm = LLM(model="debug-llama", dtype="float32",
                  num_gpu_blocks_override=64, max_num_seqs=8,
                  max_model_len=128, **kw)
        out = llm.generate([example_prompts[0]], sp)
        return [tuple(c.token_ids) for c in out[0].outputs]

    base = run()
    pp = run(pipeline_parallel_size=2)
    assert len(pp) == 2
    assert pp == base  # CoW fork + seeded siblings through the ring


def test_pp_prompt_logprobs_match_single_stage(example_prompts):
    if len(jax.devices()) < 2:
        pytest.skip("needs more virtual devices")

    def run(**kw):
        llm = LLM(model="debug-llama", dtype="float32",
                  num_gpu_blocks_override=64, max_num_seqs=8,
                  max_model_len=128, **kw)
        out = llm.generate(
            [example_prompts[0]],
            SamplingParams(temperature=0.0, max_tokens=4,
                           prompt_logprobs=3))[0]
        return tuple(out.outputs[0].token_ids), out.prompt_logprobs

    toks_b, plp_b = run()
    toks_p, plp_p = run(pipeline_parallel_size=2)
    assert toks_p == toks_b
    assert plp_b is not None and plp_p is not None
    assert len(plp_p) == len(plp_b)
    # First entry is None (no prefix); later entries: same top sets,
    # logprobs close.
    for a, b in zip(plp_b, plp_p):
        if a is None or b is None:
            assert a is None and b is None
            continue
        assert set(a.keys()) == set(b.keys())
        for tid in a:
            assert abs(a[tid].logprob - b[tid].logprob) < 2e-3


def _make_pp_adapter(tmp_path, name, scale, hidden=256):
    """q_proj (column) + o_proj (row) adapter (debug models have 2
    layers), distinct weights per layer — catches any per-layer stack
    misalignment in the stage scan."""
    import json

    import numpy as np
    from safetensors.numpy import save_file
    d = tmp_path / name
    d.mkdir()
    rng = np.random.default_rng(77)
    with open(d / "adapter_config.json", "w") as f:
        json.dump({"r": 8, "lora_alpha": 16,
                   "target_modules": ["q_proj", "o_proj"]}, f)
    tensors = {}
    for i in range(2):
        pre = f"base_model.model.model.layers.{i}.self_attn"
        for mod in ("q_proj", "o_proj"):
            tensors[f"{pre}.{mod}.lora_A.weight"] = (
                rng.normal(size=(8, hidden)).astype(np.float32)
                * scale * (i + 1))
            tensors[f"{pre}.{mod}.lora_B.weight"] = (
                rng.normal(size=(hidden, 8)).astype(np.float32) * scale)
    save_file(tensors, str(d / "adapter_model.safetensors"))
    return str(d)


def _run_lora(tmp_path, pp, tp=1, model="debug-llama", hidden=256):
    from nmvllm_tpu.lora.request import LoRARequest
    path = _make_pp_adapter(tmp_path, f"pp{pp}tp{tp}", 0.05, hidden)
    llm = LLM(model=model, dtype="float32",
              num_gpu_blocks_override=64, max_num_seqs=8,
              max_model_len=128, enable_lora=True, max_loras=2,
              max_lora_rank=8, pipeline_parallel_size=pp,
              tensor_parallel_size=tp, seed=0)
    eng = llm.llm_engine
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    eng.add_request("lora", prompt="PP adapter probe", sampling_params=sp,
                    lora_request=LoRARequest("a", 1, path))
    eng.add_request("base", prompt="PP adapter probe", sampling_params=sp)
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = tuple(o.outputs[0].token_ids)
    return outs


def test_pp_lora_matches_single_stage(tmp_path):
    """Multi-LoRA under PP: the pp-sharded positional adapter stacks
    reproduce the single-stage result for a mixed adapter/base batch."""
    if len(jax.devices()) < 2:
        pytest.skip("needs more virtual devices")
    base = _run_lora(tmp_path, pp=1)
    pp = _run_lora(tmp_path, pp=2)
    assert pp == base
    # The adapter actually changed the output somewhere in the batch.
    assert base["lora"] != base["base"]


def test_pp_lora_with_tp(tmp_path):
    """PP x TP mesh with TP-split adapter stacks (column: B on N, row:
    A on K) matches the unsharded run."""
    if len(jax.devices()) < 4:
        pytest.skip("needs more virtual devices")
    base = _run_lora(tmp_path, pp=1, model="debug-llama-tp", hidden=1024)
    pp_tp = _run_lora(tmp_path, pp=2, tp=2, model="debug-llama-tp",
                      hidden=1024)
    assert pp_tp == base
