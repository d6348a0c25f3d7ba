"""2:4 sparse GEMM kernel vs dense reference
(mirrors reference tests/kernels/test_marlin_gemm.py marlin_24 cases)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nmvllm_tpu.ops.sparse_gemm import (compress_24, decompress_24,
                                        sparse24_matmul)


def _prune_24(w):
    """Apply 2:4 magnitude pruning along K to a (K, N) weight."""
    k, n = w.shape
    g = np.asarray(w, np.float32).reshape(k // 4, 4, n)
    order = np.argsort(-np.abs(g), axis=1)
    mask = np.zeros_like(g, dtype=bool)
    for q in range(g.shape[0]):
        for c in range(n):
            mask[q, order[q, 0, c], c] = True
            mask[q, order[q, 1, c], c] = True
    return jnp.asarray((g * mask).reshape(k, n))


def test_compress_roundtrip(rng):
    k, n = 256, 128
    w = _prune_24(jax.random.normal(rng, (k, n), jnp.float32))
    v0, v1, meta = compress_24(w)
    assert v0.shape == (k // 4, n) and meta.shape == (k // 32, n)
    rec = decompress_24(v0, v1, meta, k)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(w), atol=1e-6)


def test_sparse24_matmul_matches_dense(rng):
    k, n, m = 512, 256, 13
    kw, kx = jax.random.split(rng)
    w = _prune_24(jax.random.normal(kw, (k, n), jnp.float32))
    v0, v1, meta = compress_24(w)
    x = jax.random.normal(kx, (m, k), jnp.float32)
    ref = jnp.dot(x, w, precision=jax.lax.Precision.HIGHEST)
    out = sparse24_matmul(x, v0, v1, meta, block_n=128, block_k4=128)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3,
                               rtol=1e-3)
