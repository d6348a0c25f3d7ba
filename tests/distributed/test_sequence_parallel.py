"""Sequence-parallel (ring attention) prefill — engine hook.

Beyond the reference (which has NO sequence parallelism; long context is
RoPE scaling + chunked prefill, SURVEY §2.3): prefill tokens shard over
the ``sp`` mesh axis and attention runs as a K/V ring
(parallel/ring_attention.py::ring_prefill_attention) with the KV pool
taking the full chunk on every sp replica. sp=N must match sp=1
token-for-token and logprob-close on the virtual CPU mesh.
"""
import numpy as np
import pytest


def _run(sp, prompts, max_tokens=12, logprobs=False):
    from nmvllm_tpu import LLM, SamplingParams
    llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256,
              sequence_parallel_size=sp)
    params = SamplingParams(temperature=0.0, max_tokens=max_tokens,
                            logprobs=1 if logprobs else None,
                            prompt_logprobs=1 if logprobs else None)
    out = llm.generate(prompts, params)
    del llm
    return out


@pytest.mark.e2e
def test_engine_sp4_matches_sp1_tokens_and_logprobs():
    prompts = ["sequence parallel ring attention prefill " * 4,
               "hello world",
               "the quick brown fox jumps over the lazy dog " * 3,
               "a b c"]
    o1 = _run(1, prompts, logprobs=True)
    o4 = _run(4, prompts, logprobs=True)
    for a, b in zip(o1, o4):
        assert tuple(a.outputs[0].token_ids) == \
            tuple(b.outputs[0].token_ids)
        # Prompt scoring must agree too (the ring path computes every
        # prefill position, not just the last token).
        pa, pb = a.prompt_logprobs, b.prompt_logprobs
        assert len(pa) == len(pb)
        for la, lb in zip(pa[1:], pb[1:]):
            ta = next(iter(la)); tb = next(iter(lb))
            assert np.isclose(la[ta].logprob, lb[tb].logprob,
                              atol=0.05), (la, lb)


@pytest.mark.e2e
def test_sp_with_tp_composes():
    # debug-llama-tp: 8 q/kv heads, so tp=2 shards heads while sp=2
    # shards the prefill tokens.
    prompts = ["ring attention with tensor parallel " * 5]
    from nmvllm_tpu import LLM, SamplingParams
    params = SamplingParams(temperature=0.0, max_tokens=12)

    def run(sp, tp):
        llm = LLM(model="debug-llama-tp", num_gpu_blocks_override=64,
                  max_num_seqs=8, max_model_len=256,
                  sequence_parallel_size=sp, tensor_parallel_size=tp)
        out = llm.generate(prompts, params)
        del llm
        return tuple(out[0].outputs[0].token_ids)

    assert run(2, 2) == run(1, 1)


@pytest.mark.e2e
def test_sp_long_prompt_many_blocks():
    # A prompt spanning many KV pages; decode after a ring prefill must
    # read a consistent cache.
    prompts = ["x " * 150]
    o1 = _run(1, prompts, max_tokens=8)
    o4 = _run(4, prompts, max_tokens=8)
    assert tuple(o1[0].outputs[0].token_ids) == \
        tuple(o4[0].outputs[0].token_ids)


def test_sp_rejects_chunked_prefill_and_prefix_caching():
    from nmvllm_tpu import LLM
    with pytest.raises(ValueError, match="chunked"):
        LLM(model="debug-llama", sequence_parallel_size=2,
            num_gpu_blocks_override=16, enable_chunked_prefill=True)
    with pytest.raises(ValueError, match="prefix"):
        LLM(model="debug-llama", sequence_parallel_size=2,
            num_gpu_blocks_override=16, enable_prefix_caching=True)


def test_parallel_config_sp_composition_rules():
    from nmvllm_tpu.config import ParallelConfig
    with pytest.raises(ValueError):
        ParallelConfig(sequence_parallel_size=2, data_parallel_size=2)
    with pytest.raises(ValueError):
        ParallelConfig(sequence_parallel_size=2, pipeline_parallel_size=2)
    cfg = ParallelConfig(sequence_parallel_size=2, tensor_parallel_size=2)
    assert cfg.world_size == 4
    assert cfg.mesh_shape == (1, 2, 2)


def test_sp_rejects_models_without_ring_hook():
    """Only families whose attention implements the ring-prefill hook
    (LlamaAttention lineage) may run sp>1; custom-attention families
    (DeepSeek-V2 MLA) would silently shard prefill attention
    incorrectly (review finding)."""
    from nmvllm_tpu import LLM
    with pytest.raises(ValueError, match="ring-prefill hook"):
        LLM(model="debug-deepseek-v2", sequence_parallel_size=2,
            num_gpu_blocks_override=16, max_model_len=64)


def test_sp_must_be_power_of_two():
    from nmvllm_tpu.config import ParallelConfig
    with pytest.raises(ValueError, match="power of two"):
        ParallelConfig(sequence_parallel_size=3)
