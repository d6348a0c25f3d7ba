"""Pallas flash prefill kernel vs the jnp einsum reference
(ops/prefill_attention.py _flash_prefill)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import nmvllm_tpu.ops.prefill_attention as pa


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.mark.parametrize(
    "b,t,hq,hkv,window,cap",
    [(2, 256, 8, 2, 0, 0.0),      # GQA
     (1, 128, 4, 4, 50, 0.0),     # sliding window
     (2, 256, 8, 8, 0, 30.0),     # soft cap
     (3, 512, 4, 2, 0, 0.0)])     # multi-k-chunk loop
def test_flash_matches_reference(rng, monkeypatch, b, t, hq, hkv, window,
                                 cap):
    d = 128
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (b, t, hq, d), jnp.float32)
    k = jax.random.normal(kk, (b, t, hkv, d), jnp.float32)
    v = jax.random.normal(kv, (b, t, hkv, d), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(t), (b, t))
    sl = jnp.asarray([t] + [t - 13] * (b - 1), jnp.int32)
    flash = pa._flash_prefill(q, k, v, sl, scale=d**-0.5,
                              sliding_window=window, logit_soft_cap=cap)
    monkeypatch.setenv("NMVLLM_DISABLE_PALLAS", "1")
    ref = pa.prefill_attention(q, k, v, pos, sl, scale=d**-0.5,
                               sliding_window=window, logit_soft_cap=cap)
    fl, rf = np.asarray(flash), np.asarray(ref)
    for i in range(b):
        s = int(sl[i])
        np.testing.assert_allclose(fl[i, :s], rf[i, :s], atol=2e-2,
                                   rtol=2e-2)


def test_dispatch_uses_flash_only_when_eligible(rng):
    """alibi / blocksparse / odd head_dim fall back to the einsum path —
    same results either way on eligible shapes (smoke via public API)."""
    d = 128
    b, t, hq, hkv = 1, 128, 4, 2
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (b, t, hq, d), jnp.float32)
    k = jax.random.normal(kk, (b, t, hkv, d), jnp.float32)
    v = jax.random.normal(kv, (b, t, hkv, d), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(t), (b, t))
    sl = jnp.full((b,), t, jnp.int32)
    out = pa.prefill_attention(q, k, v, pos, sl, scale=d**-0.5)
    out_bs = pa.prefill_attention(q, k, v, pos, sl, scale=d**-0.5,
                                  blocksparse=(16, 100, 4))
    # local_blocks=100 covers everything: same math through the jnp path.
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_bs),
                               atol=2e-2, rtol=2e-2)
