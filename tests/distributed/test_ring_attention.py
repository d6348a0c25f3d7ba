"""Ring attention (parallel/ring_attention.py): sequence-sharded online
softmax over ppermute K/V hops must equal single-device attention."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from nmvllm_tpu.parallel.ring_attention import SP_AXIS, ring_attention


def _reference(q, k, v, scale, causal):
    b, hq, t, d = q.shape
    hkv = k.shape[1]
    g = hq // hkv
    qg = q.reshape(b, hkv, g, t, d).astype(np.float32)
    s = np.einsum("bhgqd,bhkd->bhgqk", qg * scale,
                  k.astype(np.float32))
    if causal:
        mask = np.tril(np.ones((t, t), bool))
        s = np.where(mask[None, None, None], s, -1e30)
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    o = np.einsum("bhgqk,bhkd->bhgqd", p, v.astype(np.float32))
    return o.reshape(b, hq, t, d)


@pytest.mark.parametrize("sp,hq,hkv,causal", [(4, 4, 4, True),
                                              (4, 8, 2, True),
                                              (2, 4, 4, False),
                                              (8, 4, 2, True)])
def test_ring_matches_reference(sp, hq, hkv, causal):
    if len(jax.devices()) < sp:
        pytest.skip("needs more virtual devices")
    mesh = Mesh(np.asarray(jax.devices()[:sp]), (SP_AXIS,))
    b, t, d = 2, 64 * sp, 32
    rng = np.random.default_rng(0)
    q = rng.standard_normal((b, hq, t, d)).astype(np.float32)
    k = rng.standard_normal((b, hkv, t, d)).astype(np.float32)
    v = rng.standard_normal((b, hkv, t, d)).astype(np.float32)
    scale = 1.0 / np.sqrt(d)
    out = ring_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                         mesh, causal=causal)
    ref = _reference(q, k, v, scale, causal)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-5, rtol=2e-5)
