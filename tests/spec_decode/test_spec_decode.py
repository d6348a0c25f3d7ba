"""Speculative-decoding component tests
(reference tests/spec_decode/ unit tier)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nmvllm_tpu.spec_decode import (NGramProposer, rejection_sample,
                                    rejection_sample_greedy)
from nmvllm_tpu.layers.sampler import make_key_data


def test_ngram_proposer_finds_repeat():
    prop = NGramProposer(ngram_min=2, ngram_max=3,
                         num_speculative_tokens=3)
    # ... 5 6 7 8 ... 5 6 -> propose 7 8
    tokens = [1, 2, 5, 6, 7, 8, 9, 3, 4, 5, 6]
    assert prop.propose(tokens) == [7, 8, 9]


def test_ngram_proposer_none_when_no_match():
    prop = NGramProposer(ngram_min=2, ngram_max=3)
    assert prop.propose([1, 2, 3, 4, 5]) is None
    assert prop.propose([1]) is None


def test_greedy_rejection_accepts_matching_prefix():
    proposed = jnp.asarray([[5, 6, 7], [5, 9, 7]], jnp.int32)
    target = jnp.asarray([[5, 6, 7, 8], [5, 6, 7, 8]], jnp.int32)
    out, n_acc = rejection_sample_greedy(proposed, target)
    np.testing.assert_array_equal(np.asarray(n_acc), [3, 1])
    # Row 0: all accepted + bonus token 8.
    np.testing.assert_array_equal(np.asarray(out[0]), [5, 6, 7, 8])
    # Row 1: first accepted, then correction token 6, rest padding.
    np.testing.assert_array_equal(np.asarray(out[1]), [5, 6, -1, -1])


def test_stochastic_rejection_identical_dists_accepts():
    # p == q -> acceptance prob 1 -> all proposals accepted + bonus.
    b, k, v = 2, 3, 16
    rng = jax.random.PRNGKey(0)
    logits = jax.random.normal(rng, (b, k + 1, v))
    probs = jax.nn.softmax(logits, -1)
    proposed = jnp.argmax(probs[:, :k], -1).astype(jnp.int32)
    keys = jnp.asarray(np.stack([make_key_data(7, i) for i in range(b)]))
    out, n_acc = rejection_sample(proposed, probs[:, :k], probs, keys)
    np.testing.assert_array_equal(np.asarray(n_acc), [k, k])
    np.testing.assert_array_equal(np.asarray(out[:, :k]),
                                  np.asarray(proposed))
    assert np.all(np.asarray(out[:, k]) >= 0)


def test_stochastic_rejection_disjoint_dists_rejects():
    # q puts all mass on token 0, p on token 1 -> reject at pos 0,
    # correction token must be 1.
    b, k, v = 1, 2, 8
    q = jnp.zeros((b, k, v)).at[:, :, 0].set(1.0)
    p = jnp.zeros((b, k + 1, v)).at[:, :, 1].set(1.0)
    proposed = jnp.zeros((b, k), jnp.int32)
    keys = jnp.asarray(np.stack([make_key_data(3, 0)]))
    out, n_acc = rejection_sample(proposed, q, p, keys)
    assert int(n_acc[0]) == 0
    assert int(out[0, 0]) == 1
    assert int(out[0, 1]) == -1
