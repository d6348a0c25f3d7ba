"""Prefix caching end-to-end (reference tests/prefix_caching/
test_prefix_caching.py): cached-prefix generations must be
token-identical to uncached, and cache hits must actually occur."""
import pytest


@pytest.mark.e2e
def test_prefix_cached_generation_token_identical():
    from nmvllm_tpu import LLM, SamplingParams
    shared = "the quick brown fox jumps over the lazy dog " * 3
    prompts = [shared + "alpha", shared + "beta", shared + "gamma"]
    params = SamplingParams(temperature=0.0, max_tokens=12,
                            ignore_eos=True)

    def run(cache):
        llm = LLM(model="debug-llama", num_gpu_blocks_override=128,
                  max_num_seqs=4, max_model_len=256,
                  enable_prefix_caching=cache)
        # Two rounds: the second sees the first round's cached blocks.
        out1 = llm.generate(prompts, params)
        out2 = llm.generate(prompts, params)
        bm = llm.llm_engine.scheduler.block_manager
        del llm
        return ([tuple(o.outputs[0].token_ids) for o in out1],
                [tuple(o.outputs[0].token_ids) for o in out2], bm)

    base1, base2, _ = run(cache=False)
    hit1, hit2, bm = run(cache=True)
    assert base1 == hit1
    assert base2 == hit2
    assert base1 == base2          # greedy determinism across rounds


@pytest.mark.e2e
def test_prefix_cache_reduces_prefill_work():
    """The second identical prompt must prefill only the uncovered
    tail (scheduler grants computed-block credit)."""
    from nmvllm_tpu import LLM, SamplingParams
    llm = LLM(model="debug-llama", num_gpu_blocks_override=128,
              max_num_seqs=4, max_model_len=256,
              enable_prefix_caching=True, block_size=16)
    prompt = "a repeated shared context " * 8
    params = SamplingParams(temperature=0.0, max_tokens=2,
                            ignore_eos=True)
    llm.generate([prompt], params)
    engine = llm.llm_engine
    ntok = len(engine.tokenizer.encode(prompt))
    # Second submission: engine step stats should show far fewer prompt
    # tokens than the prompt length (only the partial tail block).
    engine.add_request("probe", prompt, params)
    _, scheduler_outputs = engine.scheduler.schedule(), None
    metas, out = _
    covered = ntok - out.num_batched_tokens
    assert covered >= (ntok // 16) * 16 - 16, (ntok, out.num_batched_tokens)
    assert out.num_batched_tokens < ntok
