"""W4A8-packed fused MLP block kernel vs jnp reference (interpret mode).

The kernel must reproduce the reference's quantization semantics
EXACTLY-in-structure (int8 activations, per-token-per-chunk down
scales, requantized group multipliers) — only float summation order may
differ.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from nmvllm_tpu.ops.fused_mlp import fused_mlp_a8p, fused_mlp_a8p_reference
from nmvllm_tpu.ops.quant_matmul import (quantize_weights_to_packed,
                                         requantize_grouped_to_a8p)


def _mk_a8p(rng, k, n, g):
    w = jnp.asarray(rng.standard_normal((n, k)) * 0.02, jnp.float32)
    qw, s, z = quantize_weights_to_packed(w, 4, g)
    return requantize_grouped_to_a8p(qw, s, z, group_size=g, k=k)


@pytest.mark.parametrize("m,k,i,g,bn", [(8, 256, 1024, 64, 512),
                                        (72, 512, 2048, 128, 1024)])
@pytest.mark.parametrize("act", ["silu", "gelu"])
def test_fused_mlp_a8p_matches_reference(m, k, i, g, bn, act):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    norm_w = jnp.asarray(rng.uniform(0.5, 1.5, (k,)), jnp.float32)
    gqw, gmult, gsc, gzms = _mk_a8p(rng, k, 2 * i, g)
    dqw, dmult, dsc, dzms = _mk_a8p(rng, i, k, g)

    got = fused_mlp_a8p(x, norm_w, gqw, gmult, gsc, gzms,
                        dqw, dmult, dsc, dzms, group_size=g, block_n=bn,
                        act=act)
    assert got is not None
    want = fused_mlp_a8p_reference(x, norm_w, gqw, gmult, gsc, gzms,
                                   dqw, dmult, dsc, dzms, group_size=g,
                                   block_n=bn, act=act)
    assert got.shape == want.shape == (m, k)
    # Float-order differences can flip individual int8 rounds at the
    # quantize boundaries, and the reference rounds the normed
    # activation through bf16 where the kernel stays f32 (same as the
    # production inq kernel); compare in aggregate.
    num = float(jnp.linalg.norm(got.astype(jnp.float32) - want))
    den = float(jnp.linalg.norm(want)) + 1e-6
    assert num / den < 0.03, num / den


def test_fused_mlp_a8p_single_block():
    # i == block_n: one grid step (first == last).
    rng = np.random.default_rng(1)
    m, k, i, g = 4, 128, 512, 64
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    norm_w = jnp.ones((k,), jnp.float32)
    gqw, gmult, gsc, gzms = _mk_a8p(rng, k, 2 * i, g)
    dqw, dmult, dsc, dzms = _mk_a8p(rng, i, k, g)
    got = fused_mlp_a8p(x, norm_w, gqw, gmult, gsc, gzms,
                        dqw, dmult, dsc, dzms, group_size=g, block_n=512)
    want = fused_mlp_a8p_reference(x, norm_w, gqw, gmult, gsc, gzms,
                                   dqw, dmult, dsc, dzms, group_size=g,
                                   block_n=512)
    num = float(jnp.linalg.norm(got.astype(jnp.float32) - want))
    den = float(jnp.linalg.norm(want)) + 1e-6
    assert num / den < 0.03, num / den


def test_fused_mlp_a8p_refuses_bad_geometry():
    # bn // g < 8 (blocked down specs would break): returns None.
    rng = np.random.default_rng(2)
    m, k, i, g = 4, 256, 512, 128
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    norm_w = jnp.ones((k,), jnp.float32)
    gqw, gmult, gsc, gzms = _mk_a8p(rng, k, 2 * i, g)
    dqw, dmult, dsc, dzms = _mk_a8p(rng, i, k, g)
    got = fused_mlp_a8p(x, norm_w, gqw, gmult, gsc, gzms,
                        dqw, dmult, dsc, dzms, group_size=g, block_n=512)
    assert got is None
