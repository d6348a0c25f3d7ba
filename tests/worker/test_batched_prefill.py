"""Batched multi-prompt prefill (reference pads+batches prompt
sequences into one forward: vllm/worker/tpu_model_runner.py:199-247,
model_runner.py:332): several eligible prompt groups run in ONE
compiled dispatch and must be token-identical to the per-group path."""
import os

import pytest

os.environ.setdefault("NMVLLM_DISABLE_PALLAS", "1")

from nmvllm_tpu import LLM, SamplingParams

PROMPTS = [
    "the quick brown fox jumps over",
    "a b c",
    "one two three four five six seven eight nine ten",
    "hello world this is a test",
]


def _generate(batched: bool, monkeypatch, prompts=PROMPTS, **kwargs):
    monkeypatch.setenv("NMVLLM_BATCHED_PREFILL", "1" if batched else "0")
    llm = LLM(model="debug-llama", dtype="float32",
              num_gpu_blocks_override=64, max_num_seqs=8,
              max_model_len=128, **kwargs)
    outs = llm.generate(prompts,
                        SamplingParams(temperature=0.0, max_tokens=8))
    return [tuple(o.outputs[0].token_ids) for o in outs]


def test_batched_prefill_matches_single(monkeypatch):
    base = _generate(False, monkeypatch)
    batched = _generate(True, monkeypatch)
    assert batched == base


def test_batched_prefill_single_dispatch(monkeypatch):
    """4 eligible prompts arriving together -> exactly ONE
    execute_prefill-path dispatch (the batched one)."""
    monkeypatch.setenv("NMVLLM_BATCHED_PREFILL", "1")
    llm = LLM(model="debug-llama", dtype="float32",
              num_gpu_blocks_override=64, max_num_seqs=8,
              max_model_len=128)
    runner = llm.llm_engine.executor.runner
    calls = {"single": 0, "batch": 0, "batch_sizes": []}
    orig_single = runner.execute_prefill
    orig_batch = runner.execute_prefill_batch

    def spy_single(meta, kv):
        calls["single"] += 1
        return orig_single(meta, kv)

    def spy_batch(metas, kv):
        calls["batch"] += 1
        calls["batch_sizes"].append(len(metas))
        return orig_batch(metas, kv)

    runner.execute_prefill = spy_single
    runner.execute_prefill_batch = spy_batch
    out = llm.generate(PROMPTS,
                       SamplingParams(temperature=0.0, max_tokens=4))
    assert len(out) == 4
    assert calls["batch"] == 1 and calls["batch_sizes"] == [4]
    assert calls["single"] == 0


def test_batched_prefill_mixed_features_fall_back(monkeypatch):
    """best_of / prompt_logprobs groups take the single path while plain
    groups still batch; outputs match the unbatched engine."""
    monkeypatch.setenv("NMVLLM_BATCHED_PREFILL", "1")

    def run(batched):
        monkeypatch.setenv("NMVLLM_BATCHED_PREFILL",
                           "1" if batched else "0")
        llm = LLM(model="debug-llama", dtype="float32",
                  num_gpu_blocks_override=64, max_num_seqs=8,
                  max_model_len=128)
        eng = llm.llm_engine
        eng.add_request("plain1", prompt=PROMPTS[0],
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=4))
        eng.add_request("plain2", prompt=PROMPTS[1],
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=4))
        eng.add_request("plp", prompt=PROMPTS[2],
                        sampling_params=SamplingParams(
                            temperature=0.0, max_tokens=4,
                            prompt_logprobs=2))
        outs = {}
        while eng.has_unfinished_requests():
            for o in eng.step():
                if o.finished:
                    outs[o.request_id] = tuple(
                        o.outputs[0].token_ids)
        return outs

    assert run(True) == run(False)


def test_batched_prefill_with_prefix_caching(monkeypatch):
    """Shared-prefix prompts: some rows carry a paged prefix; the batch
    rides the paged-prefix step with per-row prefix lens."""
    shared = "the quick brown fox jumps over the lazy dog again and"
    prompts = [shared + " one", shared + " two", shared + " three"]
    base = _generate(False, monkeypatch, prompts,
                     enable_prefix_caching=True)
    batched = _generate(True, monkeypatch, prompts,
                        enable_prefix_caching=True)
    assert batched == base


def test_batched_prefill_chunked(monkeypatch):
    base = _generate(False, monkeypatch,
                     enable_chunked_prefill=True,
                     max_num_batched_tokens=32)
    batched = _generate(True, monkeypatch,
                        enable_chunked_prefill=True,
                        max_num_batched_tokens=32)
    assert batched == base


def test_batched_prefill_sampling_seeds(monkeypatch):
    """Seeded random sampling must reproduce across batched/unbatched
    dispatch (per-row keys, not batch-position-dependent)."""
    sp = SamplingParams(temperature=0.8, seed=7, max_tokens=6)

    def run(batched):
        monkeypatch.setenv("NMVLLM_BATCHED_PREFILL",
                           "1" if batched else "0")
        llm = LLM(model="debug-llama", dtype="float32",
                  num_gpu_blocks_override=64, max_num_seqs=8,
                  max_model_len=128)
        outs = llm.generate(PROMPTS[:3], sp)
        return [tuple(o.outputs[0].token_ids) for o in outs]

    assert run(True) == run(False)
