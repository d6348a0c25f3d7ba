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


def test_fused_moe_quant_stack_matches_dequant(rng):
    """A8P expert stacks (round 5) vs the same stacks dequantized to
    dense: differences are int8-activation noise only."""
    from nmvllm_tpu.ops.moe import fused_moe
    from nmvllm_tpu.ops.moe_quant import (quantize_expert_stack,
                                          dequant_expert_stack)
    e, h, i, t, k = 4, 256, 512, 24, 2
    ks = jax.random.split(rng, 3)
    w1 = jax.random.normal(ks[0], (e, h, 2 * i), jnp.float32) * h**-0.5
    w2 = jax.random.normal(ks[1], (e, i, h), jnp.float32) * i**-0.5
    x = jax.random.normal(ks[2], (t, h), jnp.bfloat16)
    gate = jax.random.normal(jax.random.fold_in(rng, 9), (t, e),
                             jnp.float32)
    s1 = quantize_expert_stack(w1, 128)
    s2 = quantize_expert_stack(w2, 128)
    d1 = dequant_expert_stack(s1, h, 128, jnp.bfloat16)
    d2 = dequant_expert_stack(s2, i, 128, jnp.bfloat16)
    got = fused_moe(x, s1, s2, gate, k)
    want = fused_moe(x, d1, d2, gate, k)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) -
                                want.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(want.astype(jnp.float32)))) + 1e-9
    assert err / scale < 0.06, (err, scale)


def test_ragged_quant_dot_grouping(rng):
    """Zero-sized and unbalanced expert groups through the block plan."""
    from nmvllm_tpu.ops.moe_quant import (quantize_expert_stack,
                                          ragged_quant_dot_a8p,
                                          dequant_expert_stack)
    e, kdim, n, r = 5, 256, 384, 40
    w = jax.random.normal(rng, (e, kdim, n), jnp.float32) * 0.05
    stack = quantize_expert_stack(w, 128)
    gs = jnp.asarray([0, 17, 0, 23, 0], jnp.int32)
    x = jax.random.normal(jax.random.fold_in(rng, 1), (r, kdim),
                          jnp.bfloat16)
    y = ragged_quant_dot_a8p(x, stack, gs, group_size=128)
    dense = dequant_expert_stack(stack, kdim, 128)
    from nmvllm_tpu.ops.quant_matmul import _quantize_acts_a8p
    xq, _, sx = _quantize_acts_a8p(x, 128, 128)
    import numpy as np
    ends = np.cumsum(np.asarray(gs))
    starts = ends - np.asarray(gs)
    ref = np.zeros((r, n), np.float32)
    for ei in range(e):
        sl = slice(starts[ei], ends[ei])
        ref[sl] = (np.asarray(xq[sl], np.float32) @
                   np.asarray(dense[ei])) * np.asarray(sx[sl])
    err = np.abs(np.asarray(y) - ref).max()
    assert err / (np.abs(ref).max() + 1e-9) < 2e-2, err
