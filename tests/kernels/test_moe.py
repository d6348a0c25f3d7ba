"""Fused MoE vs dense one-hot reference
(mirrors reference tests/kernels/test_moe.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nmvllm_tpu.ops.moe import fused_moe, fused_moe_reference, topk_softmax


def test_topk_softmax_renormalizes(rng):
    logits = jax.random.normal(rng, (6, 8))
    w, ids = topk_softmax(logits, 2)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), np.ones(6), atol=1e-6)
    assert ids.shape == (6, 2)
    top1 = jnp.argmax(logits, -1)
    np.testing.assert_array_equal(np.asarray(ids[:, 0]), np.asarray(top1))


@pytest.mark.parametrize("t,e,topk", [(16, 4, 2), (7, 8, 2)])
def test_fused_moe_matches_reference(rng, t, e, topk):
    h, inter = 64, 128
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    x = jax.random.normal(k1, (t, h), jnp.float32)
    w1 = jax.random.normal(k2, (e, h, 2 * inter), jnp.float32) * 0.05
    w2 = jax.random.normal(k3, (e, inter, h), jnp.float32) * 0.05
    gate = jax.random.normal(k4, (t, e), jnp.float32)
    ref = fused_moe_reference(x, w1, w2, gate, topk)
    out = fused_moe(x, w1, w2, gate, topk)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4,
                               rtol=2e-4)
