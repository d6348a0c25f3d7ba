"""RoPE family tests (reference tests/kernels/test_pos_encoding.py):
application correctness + scaling-variant cache construction."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nmvllm_tpu.layers.rotary import RotaryEmbedding


def ref_rope_neox(x, positions, base, rot_dim):
    # x: (T, H, D)
    t, h, d = x.shape
    inv = 1.0 / (base ** (np.arange(0, rot_dim, 2) / rot_dim))
    freqs = np.outer(np.asarray(positions), inv)  # (T, rot/2)
    cos, sin = np.cos(freqs), np.sin(freqs)
    out = np.array(x, np.float32)
    half = rot_dim // 2
    x1 = out[..., :half].copy()
    x2 = out[..., half:rot_dim].copy()
    out[..., :half] = x1 * cos[:, None, :] - x2 * sin[:, None, :]
    out[..., half:rot_dim] = x2 * cos[:, None, :] + x1 * sin[:, None, :]
    return out


def test_neox_rope_matches_reference(rng):
    t, h, d = 5, 4, 64
    rope = RotaryEmbedding(d, d, max_position=128, base=10000.0,
                           dtype=jnp.float32)
    params = rope.init()
    q = jax.random.normal(rng, (t, h, d), jnp.float32)
    positions = jnp.asarray([0, 3, 7, 100, 42])
    q_rot, _ = rope(params, positions, q, q)
    want = ref_rope_neox(np.asarray(q), np.asarray(positions), 10000.0, d)
    # TPU transcendental (sin/cos) implementations differ slightly from
    # numpy's — tolerance accounts for it.
    np.testing.assert_allclose(np.asarray(q_rot), want, atol=2e-3,
                               rtol=2e-3)


def test_position_zero_is_identity(rng):
    d = 32
    rope = RotaryEmbedding(d, d, max_position=16, dtype=jnp.float32)
    params = rope.init()
    q = jax.random.normal(rng, (1, 2, d), jnp.float32)
    q_rot, _ = rope(params, jnp.asarray([0]), q, q)
    np.testing.assert_allclose(np.asarray(q_rot), np.asarray(q), atol=1e-6)


@pytest.mark.parametrize("scaling", [
    {"rope_type": "linear", "factor": 2.0},
    {"rope_type": "dynamic", "factor": 2.0},
    {"rope_type": "yarn", "factor": 4.0,
     "original_max_position_embeddings": 64},
    {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
     "high_freq_factor": 4.0, "original_max_position_embeddings": 128},
])
def test_scaling_variants_build(scaling):
    rope = RotaryEmbedding(64, 64, max_position=128, rope_scaling=scaling,
                           dtype=jnp.float32)
    params = rope.init()
    assert params["cos"].shape[1] == 32
    assert not np.any(np.isnan(np.asarray(params["cos"])))
    # Extended windows actually extend the cache.
    if scaling["rope_type"] in ("linear", "dynamic"):
        assert params["cos"].shape[0] >= 256
