"""SamplingParams validation (reference vllm/sampling_params.py rules)."""
import pytest

from nmvllm_tpu.sampling_params import SamplingParams, SamplingType


def test_defaults():
    sp = SamplingParams()
    assert sp.n == 1 and sp.best_of == 1
    assert sp.sampling_type == SamplingType.RANDOM


def test_greedy():
    sp = SamplingParams(temperature=0.0)
    assert sp.sampling_type == SamplingType.GREEDY
    assert sp.top_p == 1.0 and sp.top_k == -1


def test_seeded():
    sp = SamplingParams(seed=42)
    assert sp.sampling_type == SamplingType.RANDOM_SEED


@pytest.mark.parametrize("kwargs", [
    dict(n=0),
    dict(best_of=0, n=1),
    dict(presence_penalty=3.0),
    dict(frequency_penalty=-2.5),
    dict(repetition_penalty=0.0),
    dict(temperature=-0.1),
    dict(top_p=0.0),
    dict(top_k=0),
    dict(min_p=1.5),
    dict(max_tokens=0),
    dict(min_tokens=-1),
    dict(min_tokens=30, max_tokens=10),
    dict(logprobs=-1),
    dict(stop=[""]),
    dict(temperature=0.0, best_of=4, n=4),
])
def test_invalid(kwargs):
    with pytest.raises(ValueError):
        SamplingParams(**kwargs)


def test_beam_validation():
    with pytest.raises(ValueError):
        SamplingParams(use_beam_search=True, best_of=1)
    with pytest.raises(ValueError):
        SamplingParams(use_beam_search=True, best_of=4, temperature=0.7)
    sp = SamplingParams(use_beam_search=True, best_of=4, temperature=0.0,
                        n=2)
    assert sp.sampling_type == SamplingType.BEAM


def test_stop_and_eos_merge():
    sp = SamplingParams(stop_token_ids=[7])
    sp.update_from_generation_config(eos_token_id=2)
    assert sp.all_stop_token_ids == {7, 2}
    sp2 = SamplingParams(ignore_eos=True)
    sp2.update_from_generation_config(eos_token_id=2)
    assert 2 not in sp2.all_stop_token_ids
