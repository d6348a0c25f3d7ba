"""Blocksparse attention masks (Phi-3-Small; reference
attention/ops/blocksparse_attention/utils.py get_sparse_attn_mask):
Pallas decode kernel and prefill einsum paths vs a naive dense-mask
implementation, homo and per-head-offset patterns."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nmvllm_tpu.ops.paged_attention import (paged_attention,
                                            paged_attention_reference)
from nmvllm_tpu.ops.prefill_attention import prefill_attention


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


def _allow(qpos, kpos, blk, local, vert, off):
    qb, kb = qpos // blk, kpos // blk
    return (kb <= qb) and ((qb - kb < local) or ((kb + off + 1) % vert == 0))


def _naive_decode(q, kv_cache, bt, cl, scale, blk, local, vert, offs):
    q = np.asarray(q, np.float64)
    kvc = np.asarray(kv_cache, np.float64)
    bt, cl = np.asarray(bt), np.asarray(cl)
    b, hq, d = q.shape
    hkv, bs = kvc.shape[2], kvc.shape[3]
    g = hq // hkv
    out = np.zeros_like(q)
    for i in range(b):
        ctx = int(cl[i])
        k = kvc[bt[i], 0].transpose(1, 0, 2, 3).reshape(hkv, -1, d)[:, :ctx]
        v = kvc[bt[i], 1].transpose(1, 0, 2, 3).reshape(hkv, -1, d)[:, :ctx]
        for h in range(hq):
            s = (q[i, h] @ k[h // g].T) * scale
            off = 0 if offs is None else int(offs[h])
            for t in range(ctx):
                if not _allow(ctx - 1, t, blk, local, vert, off):
                    s[t] = -np.inf
            p = np.exp(s - s.max())
            p /= p.sum()
            out[i, h] = p @ v[h // g]
    return out


@pytest.mark.parametrize("offsets", [None, "per_head"])
def test_decode_kernel_blocksparse(rng, offsets):
    b, hq, hkv, d, bs = 3, 8, 4, 128, 16
    kq, kk, kl, kb = jax.random.split(rng, 4)
    q = jax.random.normal(kq, (b, hq, d), jnp.float32)
    kv_cache = jax.random.normal(kk, (16, 2, hkv, bs, d), jnp.float32)
    cl = jax.random.randint(kl, (b,), 60, 160, jnp.int32)
    bt = jax.random.randint(kb, (b, 10), 0, 16, jnp.int32)
    blk, local, vert = 16, 1, 4
    offs = (jnp.arange(hq, dtype=jnp.int32)
            if offsets else None)
    scale = d**-0.5
    out = paged_attention(q, kv_cache, bt, cl, scale=scale,
                          pages_per_compute_block=2,
                          blocksparse=(blk, local, vert),
                          bs_head_offsets=offs)
    ref = paged_attention_reference(q, kv_cache, bt, cl, scale=scale,
                                    blocksparse=(blk, local, vert),
                                    bs_head_offsets=offs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)
    naive = _naive_decode(q, kv_cache, bt, cl, scale, blk, local, vert,
                          None if offs is None else np.asarray(offs))
    np.testing.assert_allclose(np.asarray(out), naive, atol=3e-2,
                               rtol=3e-2)


@pytest.mark.parametrize("offsets", [None, "per_head"])
def test_prefill_blocksparse(rng, offsets):
    b, t, hq, hkv, d = 2, 48, 4, 2, 64
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (b, t, hq, d), jnp.float32)
    k = jax.random.normal(kk, (b, t, hkv, d), jnp.float32)
    v = jax.random.normal(kv, (b, t, hkv, d), jnp.float32)
    positions = jnp.broadcast_to(jnp.arange(t), (b, t))
    seq_lens = jnp.asarray([t, t - 7], jnp.int32)
    blk, local, vert = 8, 1, 3
    offs = (jnp.arange(hq, dtype=jnp.int32) * 2
            if offsets else None)
    scale = d**-0.5
    out = prefill_attention(q, k, v, positions, seq_lens, scale=scale,
                            blocksparse=(blk, local, vert),
                            bs_head_offsets=offs)
    out = np.asarray(out)
    qf = np.asarray(q, np.float64)
    kf = np.asarray(k, np.float64)
    vf = np.asarray(v, np.float64)
    offs_np = None if offs is None else np.asarray(offs)
    for i in range(b):
        sl = int(seq_lens[i])
        for h in range(hq):
            off = 0 if offs_np is None else int(offs_np[h])
            for tq in range(sl):
                s = (kf[i, :sl, h // (hq // hkv)] @ qf[i, tq, h]) * scale
                for tk in range(sl):
                    if tk > tq or not _allow(tq, tk, blk, local, vert,
                                             off):
                        s[tk] = -np.inf
                p = np.exp(s - s.max())
                p /= p.sum()
                o = p @ vf[i, :sl, h // (hq // hkv)]
                np.testing.assert_allclose(out[i, tq, h], o, atol=3e-2,
                                           rtol=3e-2)
