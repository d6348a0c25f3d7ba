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
    with pytest.raises(ValueError, match="peculative"):
        LLM(model="debug-llama", dtype="float32",
            num_gpu_blocks_override=16, max_model_len=64,
            pipeline_parallel_size=2, ngram_prompt_lookup_max=2,
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
