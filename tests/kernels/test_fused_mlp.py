"""Fused MLP block kernel vs jnp reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nmvllm_tpu.ops.fused_mlp import fused_mlp_reference, fused_mlp_w4
from nmvllm_tpu.ops.quant_matmul import pack_weights


def _mk_quant(rng, k, n, g):
    w = rng.integers(0, 16, (k, n))
    qw = pack_weights(jnp.asarray(w, jnp.int32), 4, g)
    scales = jnp.asarray(rng.uniform(0.005, 0.02, (k // g, n)), jnp.float32)
    zeros = jnp.asarray(rng.integers(4, 12, (k // g, n)), jnp.int32)
    return qw, scales, zeros


@pytest.mark.parametrize("m,k,i,g", [(8, 256, 512, 128), (56, 256, 768, 64)])
@pytest.mark.parametrize("act", ["silu", "gelu"])
def test_fused_mlp_matches_reference(m, k, i, g, act):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    norm_w = jnp.asarray(rng.uniform(0.5, 1.5, (k,)), jnp.float32)
    gu_qw, gu_s, gu_z = _mk_quant(rng, k, 2 * i, g)
    d_qw, d_s, d_z = _mk_quant(rng, i, k, g)

    got = fused_mlp_w4(x, norm_w, gu_qw, gu_s, gu_z, d_qw, d_s, d_z,
                       group_size=g, block_n=256, act=act)
    want = fused_mlp_reference(x, norm_w, gu_qw, gu_s, gu_z, d_qw, d_s,
                               d_z, group_size=g, act=act)
    assert got.shape == want.shape == (m, k)
    # bf16 compute in the kernel vs f32 reference: allow bf16-level noise
    # relative to the output scale.
    scale = float(jnp.mean(jnp.abs(want))) + 1e-6
    err = float(jnp.max(jnp.abs(got - want))) / scale
    assert err < 0.15, err


def test_fused_mlp_single_block():
    # i == block_n: one grid step (first == last).
    rng = np.random.default_rng(1)
    m, k, i, g = 4, 128, 256, 64
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    norm_w = jnp.ones((k,), jnp.float32)
    gu_qw, gu_s, gu_z = _mk_quant(rng, k, 2 * i, g)
    d_qw, d_s, d_z = _mk_quant(rng, i, k, g)
    got = fused_mlp_w4(x, norm_w, gu_qw, gu_s, gu_z, d_qw, d_s, d_z,
                       group_size=g, block_n=256)
    want = fused_mlp_reference(x, norm_w, gu_qw, gu_s, gu_z, d_qw, d_s,
                               d_z, group_size=g)
    scale = float(jnp.mean(jnp.abs(want))) + 1e-6
    assert float(jnp.max(jnp.abs(got - want))) / scale < 0.15
