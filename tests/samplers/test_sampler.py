"""In-graph sampler unit tests (reference tests/samplers/test_sampler.py):
greedy, temperature, top-k/p, penalties, min-tokens bans, seeds,
logprobs."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nmvllm_tpu.layers.sampler import (SamplingTensors, make_key_data,
                                       sample)

VOCAB = 32


def make_tensors(b, temperature=0.0, top_k=0, top_p=1.0, min_p=0.0,
                 presence=0.0, frequency=0.0, repetition=1.0,
                 output_tokens=None, prompt_tokens=None, banned=None,
                 seeds=None):
    def vec(x, dtype=np.float32):
        return jnp.asarray(np.full((b,), x, dtype))
    key_data = np.zeros((b, 2), np.uint32)
    for i in range(b):
        key_data[i] = make_key_data(seeds[i] if seeds else i, 0)
    def toks(lst, width):
        arr = np.full((b, width), VOCAB, np.int32)
        if lst is not None:
            for i, row in enumerate(lst):
                arr[i, :len(row)] = row
        return jnp.asarray(arr)
    return SamplingTensors(
        temperature=vec(temperature), top_k=vec(top_k, np.int32),
        top_p=vec(top_p), min_p=vec(min_p),
        presence_penalty=vec(presence), frequency_penalty=vec(frequency),
        repetition_penalty=vec(repetition),
        key_data=jnp.asarray(key_data),
        output_tokens=toks(output_tokens, 8),
        prompt_tokens=toks(prompt_tokens, 8),
        banned_tokens=toks(banned, 8))


def test_greedy_picks_argmax(rng):
    logits = jax.random.normal(rng, (4, VOCAB))
    out = sample(logits, make_tensors(4), vocab_size=VOCAB)
    np.testing.assert_array_equal(np.asarray(out.next_tokens),
                                  np.asarray(jnp.argmax(logits, -1)))
    # Chosen logprob = log_softmax at argmax.
    lp = jax.nn.log_softmax(logits / 1e-5, axis=-1)


def test_top_k_one_is_greedy(rng):
    logits = jax.random.normal(rng, (4, VOCAB))
    t = make_tensors(4, temperature=1.0, top_k=1)
    out = sample(logits, t, vocab_size=VOCAB, do_top_k_top_p=True)
    np.testing.assert_array_equal(np.asarray(out.next_tokens),
                                  np.asarray(jnp.argmax(logits, -1)))


def test_top_p_excludes_tail(rng):
    # One dominant token (prob > 0.9): top_p=0.5 must always pick it.
    logits = jnp.zeros((2, VOCAB)).at[:, 3].set(10.0)
    t = make_tensors(2, temperature=1.0, top_p=0.5)
    out = sample(logits, t, vocab_size=VOCAB, do_top_k_top_p=True)
    assert np.all(np.asarray(out.next_tokens) == 3)


def test_seeded_sampling_is_deterministic(rng):
    row = jax.random.normal(rng, (1, VOCAB))
    logits = jnp.tile(row, (4, 1))
    t = make_tensors(4, temperature=1.0, seeds=[7, 7, 8, 9])
    out1 = sample(logits, t, vocab_size=VOCAB)
    out2 = sample(logits, t, vocab_size=VOCAB)
    np.testing.assert_array_equal(np.asarray(out1.next_tokens),
                                  np.asarray(out2.next_tokens))
    # Same seed + same logits -> same sample across rows 0,1.
    assert out1.next_tokens[0] == out1.next_tokens[1]


def test_presence_penalty_bans_repeats(rng):
    logits = jnp.zeros((1, VOCAB)).at[0, 5].set(1.0)
    # Token 5 heavily penalized after being generated.
    t = make_tensors(1, temperature=0.0, presence=2.0,
                     output_tokens=[[5]])
    out = sample(logits, t, vocab_size=VOCAB, do_penalties=True)
    assert int(out.next_tokens[0]) != 5 or float(
        logits[0, 5]) - 2.0 > float(jnp.max(logits.at[0, 5].set(-1e9)))


def test_repetition_penalty_prompt_tokens(rng):
    logits = jnp.zeros((1, VOCAB)).at[0, 5].set(2.0).at[0, 6].set(1.9)
    t = make_tensors(1, temperature=0.0, repetition=2.0,
                     prompt_tokens=[[5]])
    out = sample(logits, t, vocab_size=VOCAB, do_penalties=True)
    # 5 gets halved to 1.0 < 1.9, so 6 wins.
    assert int(out.next_tokens[0]) == 6


def test_min_tokens_bans_stop_ids(rng):
    logits = jnp.zeros((1, VOCAB)).at[0, 2].set(5.0).at[0, 9].set(1.0)
    t = make_tensors(1, temperature=0.0, banned=[[2]])
    out = sample(logits, t, vocab_size=VOCAB, do_min_tokens=True)
    assert int(out.next_tokens[0]) == 9


def test_logprobs_topk(rng):
    logits = jax.random.normal(rng, (3, VOCAB))
    t = make_tensors(3)
    out = sample(logits, t, vocab_size=VOCAB, num_logprobs=5)
    assert out.topk_ids.shape == (3, 5)
    lp = np.asarray(jax.nn.log_softmax(np.asarray(logits) / 1e-5, -1))
    for i in range(3):
        order = np.argsort(-lp[i])[:5]
        np.testing.assert_array_equal(np.asarray(out.topk_ids[i]), order)


def test_vocab_padding_masked(rng):
    # Padded vocab ids >= vocab_size must never be sampled.
    logits = jnp.full((2, VOCAB + 8), 10.0)
    t = make_tensors(2, temperature=1.0)
    out = sample(logits, t, vocab_size=VOCAB)
    assert np.all(np.asarray(out.next_tokens) < VOCAB)
