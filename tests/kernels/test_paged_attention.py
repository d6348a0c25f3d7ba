"""Pallas paged-attention decode kernel vs jnp reference
(mirrors reference tests/kernels/test_attention.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nmvllm_tpu.ops.paged_attention import (paged_attention,
                                            paged_attention_reference)


def _make_inputs(key, batch, num_q_heads, num_kv_heads, head_dim, block_size,
                 num_blocks, max_ctx, dtype, kv_dtype=None):
    kq, kk, kv, kl, kb = jax.random.split(key, 5)
    q = jax.random.normal(kq, (batch, num_q_heads, head_dim), dtype)
    kv_dtype = kv_dtype or dtype
    k_cache = jax.random.normal(
        kk, (num_kv_heads, num_blocks, block_size, head_dim),
        jnp.float32).astype(kv_dtype)
    v_cache = jax.random.normal(
        kv, (num_kv_heads, num_blocks, block_size, head_dim),
        jnp.float32).astype(kv_dtype)
    context_lens = jax.random.randint(kl, (batch,), 1, max_ctx + 1, jnp.int32)
    max_bpp = -(-max_ctx // block_size)
    # Random (possibly shared-free) page assignment.
    block_tables = jax.random.randint(kb, (batch, max_bpp), 0, num_blocks,
                                      jnp.int32)
    return q, k_cache, v_cache, block_tables, context_lens


@pytest.mark.parametrize("batch", [1, 7])
@pytest.mark.parametrize("heads", [(8, 8), (8, 2), (4, 1)])
@pytest.mark.parametrize("head_dim", [128])
@pytest.mark.parametrize("block_size", [16])
def test_paged_attention_matches_reference(rng, batch, heads, head_dim,
                                           block_size):
    num_q, num_kv = heads
    q, k_cache, v_cache, bt, cl = _make_inputs(
        rng, batch, num_q, num_kv, head_dim, block_size,
        num_blocks=32, max_ctx=70, dtype=jnp.float32)
    scale = head_dim**-0.5
    ref = paged_attention_reference(q, k_cache, v_cache, bt, cl, scale=scale)
    out = paged_attention(q, k_cache, v_cache, bt, cl, scale=scale,
                          pages_per_compute_block=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_paged_attention_single_page(rng):
    q, k_cache, v_cache, bt, cl = _make_inputs(
        rng, 2, 4, 2, 128, 16, num_blocks=8, max_ctx=16, dtype=jnp.float32)
    scale = 0.1
    ref = paged_attention_reference(q, k_cache, v_cache, bt, cl, scale=scale)
    out = paged_attention(q, k_cache, v_cache, bt, cl, scale=scale,
                          pages_per_compute_block=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_paged_attention_fp8_kv(rng):
    q, k_cache, v_cache, bt, cl = _make_inputs(
        rng, 3, 4, 2, 128, 16, num_blocks=16, max_ctx=40,
        dtype=jnp.float32, kv_dtype=jnp.float8_e4m3fn)
    scale = 128**-0.5
    ref = paged_attention_reference(q, k_cache, v_cache, bt, cl, scale=scale,
                                    k_scale=0.5, v_scale=2.0)
    out = paged_attention(q, k_cache, v_cache, bt, cl, scale=scale,
                          k_scale=0.5, v_scale=2.0,
                          pages_per_compute_block=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=6e-2, rtol=6e-2)
