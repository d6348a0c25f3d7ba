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
    kq, kk, kl, kb = jax.random.split(key, 4)
    q = jax.random.normal(kq, (batch, num_q_heads, head_dim), dtype)
    kv_dtype = kv_dtype or dtype
    kv_cache = jax.random.normal(
        kk, (num_blocks, 2, num_kv_heads, block_size, head_dim),
        jnp.float32).astype(kv_dtype)
    context_lens = jax.random.randint(kl, (batch,), 1, max_ctx + 1, jnp.int32)
    max_bpp = -(-max_ctx // block_size)
    # Random (possibly shared-free) page assignment.
    block_tables = jax.random.randint(kb, (batch, max_bpp), 0, num_blocks,
                                      jnp.int32)
    return q, kv_cache, block_tables, context_lens


def _dense_check(q, kv_cache, bt, cl, scale, out, **kw):
    """Independent dense check: gather pages with numpy, run f64 softmax."""
    q = np.asarray(q, np.float64)
    kvc = np.asarray(kv_cache.astype(jnp.float32), np.float64)
    bt = np.asarray(bt)
    cl = np.asarray(cl)
    b, hq, d = q.shape
    hkv = kvc.shape[2]
    bs = kvc.shape[3]
    g = hq // hkv
    for i in range(b):
        ctx = int(cl[i])
        pages = bt[i]
        k = kvc[pages, 0].transpose(1, 0, 2, 3).reshape(hkv, -1, d)[:, :ctx]
        v = kvc[pages, 1].transpose(1, 0, 2, 3).reshape(hkv, -1, d)[:, :ctx]
        k = k * kw.get("k_scale", 1.0)
        v = v * kw.get("v_scale", 1.0)
        for h in range(hq):
            s = (q[i, h] @ k[h // g].T) * scale
            cap = kw.get("logit_soft_cap", 0.0)
            if cap:
                s = cap * np.tanh(s / cap)
            slopes = kw.get("alibi_slopes")
            if slopes is not None:
                s = s + slopes[h] * (np.arange(ctx) - (ctx - 1))
            w = kw.get("sliding_window", 0)
            if w:
                s[:max(0, ctx - w)] = -np.inf
            p = np.exp(s - s.max())
            p /= p.sum()
            o = p @ v[h // g]
            np.testing.assert_allclose(np.asarray(out)[i, h], o,
                                       atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("batch", [1, 7])
@pytest.mark.parametrize("heads", [(8, 8), (8, 2), (4, 1)])
@pytest.mark.parametrize("head_dim", [128])
@pytest.mark.parametrize("block_size", [16])
def test_paged_attention_matches_reference(rng, batch, heads, head_dim,
                                           block_size):
    num_q, num_kv = heads
    q, kv_cache, bt, cl = _make_inputs(
        rng, batch, num_q, num_kv, head_dim, block_size,
        num_blocks=32, max_ctx=70, dtype=jnp.float32)
    scale = head_dim**-0.5
    ref = paged_attention_reference(q, kv_cache, bt, cl, scale=scale)
    out = paged_attention(q, kv_cache, bt, cl, scale=scale,
                          pages_per_compute_block=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)
    _dense_check(q, kv_cache, bt, cl, scale, out)


def test_paged_attention_single_page(rng):
    q, kv_cache, bt, cl = _make_inputs(
        rng, 2, 4, 2, 128, 16, num_blocks=8, max_ctx=16, dtype=jnp.float32)
    scale = 0.1
    ref = paged_attention_reference(q, kv_cache, bt, cl, scale=scale)
    out = paged_attention(q, kv_cache, bt, cl, scale=scale,
                          pages_per_compute_block=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_paged_attention_fp8_kv(rng):
    q, kv_cache, bt, cl = _make_inputs(
        rng, 3, 4, 2, 128, 32, num_blocks=16, max_ctx=80,
        dtype=jnp.float32, kv_dtype=jnp.float8_e4m3fn)
    scale = 128**-0.5
    ref = paged_attention_reference(q, kv_cache, bt, cl, scale=scale,
                                    k_scale=0.5, v_scale=2.0)
    out = paged_attention(q, kv_cache, bt, cl, scale=scale,
                          k_scale=0.5, v_scale=2.0,
                          pages_per_compute_block=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=6e-2, rtol=6e-2)


def test_paged_attention_soft_cap_in_kernel(rng):
    q, kv_cache, bt, cl = _make_inputs(
        rng, 3, 8, 4, 128, 16, num_blocks=16, max_ctx=50, dtype=jnp.float32)
    scale = 128**-0.5
    ref = paged_attention_reference(q, kv_cache, bt, cl, scale=scale,
                                    logit_soft_cap=30.0)
    out = paged_attention(q, kv_cache, bt, cl, scale=scale,
                          logit_soft_cap=30.0, pages_per_compute_block=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_paged_attention_sliding_window_in_kernel(rng):
    q, kv_cache, bt, cl = _make_inputs(
        rng, 4, 8, 2, 128, 16, num_blocks=32, max_ctx=70, dtype=jnp.float32)
    scale = 128**-0.5
    ref = paged_attention_reference(q, kv_cache, bt, cl, scale=scale,
                                    sliding_window=24)
    out = paged_attention(q, kv_cache, bt, cl, scale=scale,
                          sliding_window=24, pages_per_compute_block=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)
    _dense_check(q, kv_cache, bt, cl, scale, out, sliding_window=24)


def test_paged_attention_alibi_in_kernel(rng):
    num_q, num_kv = 8, 4
    q, kv_cache, bt, cl = _make_inputs(
        rng, 3, num_q, num_kv, 128, 16, num_blocks=16, max_ctx=60,
        dtype=jnp.float32)
    scale = 128**-0.5
    slopes = np.geomspace(0.5, 1 / 256, num_q).astype(np.float32)
    ref = paged_attention_reference(q, kv_cache, bt, cl, scale=scale,
                                    alibi_slopes=slopes)
    out = paged_attention(q, kv_cache, bt, cl, scale=scale,
                          alibi_slopes=slopes, pages_per_compute_block=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)
    _dense_check(q, kv_cache, bt, cl, scale, out, alibi_slopes=slopes)


@pytest.mark.parametrize("hpd", [1, 2, 4])
def test_paged_attention_heads_per_dot(rng, hpd, monkeypatch):
    """Head-chunked block-diagonal scores (NMVLLM_ATTN_HPD): every chunk
    width must match the all-heads-in-one-dot default bit-for-bit-close.
    H=4, G=8 (g_pad 8) so chunk row counts stay tile-aligned at hpd=1."""
    monkeypatch.setenv("NMVLLM_ATTN_HPD", str(hpd))
    q, kv_cache, bt, cl = _make_inputs(
        rng, 5, 32, 4, 128, 16, num_blocks=32, max_ctx=70,
        dtype=jnp.float32)
    # Distinct static scale per case: the env var is read at trace time,
    # so an identical call signature would reuse the previous compile.
    scale = 128**-0.5 * (1.0 + hpd * 1e-6)
    ref = paged_attention_reference(q, kv_cache, bt, cl, scale=scale)
    out = paged_attention(q, kv_cache, bt, cl, scale=scale,
                          pages_per_compute_block=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)
    _dense_check(q, kv_cache, bt, cl, scale, out)


@pytest.mark.parametrize("kv_dtype", [jnp.float8_e4m3fn, jnp.float8_e5m2])
def test_paged_attention_fp8_kv_fast(rng, kv_dtype, monkeypatch):
    """Relayout-free int-domain fp8 dequant (NMVLLM_FP8_KV_FAST, default
    on): bf16 q selects the fast path; must match the astype-dequant
    reference. Tolerances cover the documented subnormal mapping
    (fp8 subnormals land at ~2^-7*(1+m/8) instead of their exact value
    — below one fp8 quantization step)."""
    monkeypatch.setenv("NMVLLM_FP8_KV_FAST", "1")
    q, kv_cache, bt, cl = _make_inputs(
        rng, 3, 8, 4, 128, 32, num_blocks=16, max_ctx=90,
        dtype=jnp.bfloat16, kv_dtype=kv_dtype)
    # Distinct static scale per dtype: the env flag is read at trace
    # time, so identical signatures would reuse a previous compile.
    scale = 128**-0.5 * (1.0 + (kv_dtype == jnp.float8_e5m2) * 1e-6)
    ref = paged_attention_reference(q, kv_cache, bt, cl, scale=scale,
                                    k_scale=0.5, v_scale=2.0)
    out = paged_attention(q, kv_cache, bt, cl, scale=scale,
                          k_scale=0.5, v_scale=2.0,
                          pages_per_compute_block=2)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=8e-2, rtol=8e-2)
    _dense_check(q, kv_cache, bt, cl, scale, out, k_scale=0.5,
                 v_scale=2.0)


def test_paged_attention_fp8_kv_fast_masks(rng, monkeypatch):
    """The fast path permutes score COLUMNS — sliding-window and
    soft-cap masks must be evaluated in permuted order."""
    monkeypatch.setenv("NMVLLM_FP8_KV_FAST", "1")
    q, kv_cache, bt, cl = _make_inputs(
        rng, 4, 8, 2, 128, 32, num_blocks=32, max_ctx=100,
        dtype=jnp.bfloat16, kv_dtype=jnp.float8_e4m3fn)
    scale = 128**-0.5 * (1.0 + 3e-6)
    ref = paged_attention_reference(q, kv_cache, bt, cl, scale=scale,
                                    sliding_window=40,
                                    logit_soft_cap=30.0)
    out = paged_attention(q, kv_cache, bt, cl, scale=scale,
                          sliding_window=40, logit_soft_cap=30.0,
                          pages_per_compute_block=2)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        atol=8e-2, rtol=8e-2)
