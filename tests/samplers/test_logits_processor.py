"""Custom logits processors (reference tests/test_logits_processor.py):
per-request callables reshape the distribution before sampling."""
import numpy as np
import pytest


@pytest.mark.e2e
def test_force_token_logits_processor():
    from nmvllm_tpu import LLM, SamplingParams

    FORCED = 7

    def force(token_ids, logits):
        out = np.full_like(np.asarray(logits), -1e9)
        out[FORCED] = 0.0
        return out

    llm = LLM(model="debug-llama", num_gpu_blocks_override=32,
              max_num_seqs=4, max_model_len=64)
    out = llm.generate(["force me"], SamplingParams(
        temperature=0.0, max_tokens=4, ignore_eos=True,
        logits_processors=[force]))
    assert list(out[0].outputs[0].token_ids) == [FORCED] * 4


@pytest.mark.e2e
def test_stateful_processor_sees_generated_prefix():
    """The processor receives the previously generated token ids
    (reference semantics: processor(token_ids, logits))."""
    from nmvllm_tpu import LLM, SamplingParams

    seen = []

    def staircase(token_ids, logits):
        seen.append(list(token_ids))
        out = np.full_like(np.asarray(logits), -1e9)
        out[len(token_ids) % 10] = 0.0
        return out

    llm = LLM(model="debug-llama", num_gpu_blocks_override=32,
              max_num_seqs=4, max_model_len=64)
    out = llm.generate(["stateful"], SamplingParams(
        temperature=0.0, max_tokens=4, ignore_eos=True,
        logits_processors=[staircase]))
    assert list(out[0].outputs[0].token_ids) == [0, 1, 2, 3]
    # First call saw no generated tokens; later calls saw the prefix.
    assert seen[0] == []
    assert seen[-1] == [0, 1, 2]


@pytest.mark.e2e
def test_processor_mixes_with_unprocessed_requests():
    from nmvllm_tpu import LLM, SamplingParams

    def force_three(token_ids, logits):
        out = np.full_like(np.asarray(logits), -1e9)
        out[3] = 0.0
        return out

    llm = LLM(model="debug-llama", num_gpu_blocks_override=32,
              max_num_seqs=4, max_model_len=64)
    outs = llm.generate(
        prompt_token_ids=[[5, 6, 7], [5, 6, 7]],
        sampling_params=[
            SamplingParams(temperature=0.0, max_tokens=3, ignore_eos=True,
                           logits_processors=[force_three]),
            SamplingParams(temperature=0.0, max_tokens=3,
                           ignore_eos=True),
        ])
    assert list(outs[0].outputs[0].token_ids) == [3, 3, 3]
    assert list(outs[1].outputs[0].token_ids) != [3, 3, 3]


@pytest.mark.e2e
def test_processor_row_keeps_penalties():
    """Host-side resampling must still honor penalties (review finding:
    the first implementation dropped them for processor rows)."""
    from nmvllm_tpu import LLM, SamplingParams

    TOKS = [11, 12]

    def two_choices(token_ids, logits):
        out = np.full_like(np.asarray(logits), -1e9)
        out[TOKS[0]] = 5.0
        out[TOKS[1]] = 4.9   # close second
        return out

    llm = LLM(model="debug-llama", num_gpu_blocks_override=32,
              max_num_seqs=4, max_model_len=64)
    # Greedy without penalties: token 11 forever.
    out = llm.generate(["p"], SamplingParams(
        temperature=0.0, max_tokens=4, ignore_eos=True,
        logits_processors=[two_choices]))
    assert list(out[0].outputs[0].token_ids) == [11, 11, 11, 11]
    # A strong presence penalty flips step 2 to the runner-up; once BOTH
    # are in the history they are penalized equally and 11 wins again.
    out = llm.generate(["p"], SamplingParams(
        temperature=0.0, max_tokens=4, ignore_eos=True,
        presence_penalty=2.0, logits_processors=[two_choices]))
    assert list(out[0].outputs[0].token_ids) == [11, 12, 11, 11]


@pytest.mark.e2e
def test_seeded_processor_row_advances_per_step():
    """Seeded stochastic sampling on a processor row must draw a fresh
    sample each step (review finding: a fresh default_rng(seed) per
    step repeated the first draw forever)."""
    from nmvllm_tpu import LLM, SamplingParams

    CANDS = list(range(20, 30))

    def uniform_cands(token_ids, logits):
        out = np.full_like(np.asarray(logits), -1e9)
        for c in CANDS:
            out[c] = 0.0
        return out

    llm = LLM(model="debug-llama", num_gpu_blocks_override=32,
              max_num_seqs=4, max_model_len=64)
    out = llm.generate(["p"], SamplingParams(
        temperature=1.0, seed=42, max_tokens=12, ignore_eos=True,
        logits_processors=[uniform_cands]))
    toks = list(out[0].outputs[0].token_ids)
    assert all(t in CANDS for t in toks)
    assert len(set(toks)) > 1, toks          # stream advances
    # And the seeded stream is reproducible.
    out2 = llm.generate(["p"], SamplingParams(
        temperature=1.0, seed=42, max_tokens=12, ignore_eos=True,
        logits_processors=[uniform_cands]))
    assert list(out2[0].outputs[0].token_ids) == toks
