"""Fused dequant-GEMM kernel vs jnp reference
(mirrors reference tests/kernels/test_marlin_gemm.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nmvllm_tpu.ops.quant_matmul import (pack_weights, quant_matmul,
                                         quant_matmul_reference,
                                         quantize_weights_to_packed,
                                         unpack_weights)


def test_pack_unpack_roundtrip(rng):
    k, n, bits, g = 512, 256, 4, 128
    w = jax.random.randint(rng, (k, n), 0, 2**bits, jnp.int32)
    packed = pack_weights(w, bits, g)
    assert packed.shape == (k // 8, n)
    out = unpack_weights(packed, bits, g, k)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(w))


def test_pack_unpack_roundtrip_8bit(rng):
    k, n, bits, g = 256, 128, 8, 64
    w = jax.random.randint(rng, (k, n), 0, 2**bits, jnp.int32)
    packed = pack_weights(w, bits, g)
    assert packed.shape == (k // 4, n)
    out = unpack_weights(packed, bits, g, k)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(w))


@pytest.mark.parametrize("bits,m,symmetric", [
    (4, 13, True),
    (4, 1, False),
    (8, 13, True),
])
def test_quant_matmul_matches_reference(rng, bits, m, symmetric):
    k, n, g = 512, 256, 128
    kw, kx = jax.random.split(rng)
    w = jax.random.normal(kw, (n, k), jnp.float32) * 0.1
    qweight, scales, zeros = quantize_weights_to_packed(
        w, bits, g, symmetric=symmetric)
    x = jax.random.normal(kx, (m, k), jnp.float32)
    ref = quant_matmul_reference(x, qweight, scales, zeros, bits=bits,
                                 group_size=g)
    out = quant_matmul(x, qweight, scales, zeros, bits=bits, group_size=g,
                       block_n=128, block_k=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3,
                               rtol=1e-3)


def test_quantize_dequant_accuracy(rng):
    # INT4 groupwise quantization of gaussian weights should reconstruct
    # with small relative error (sanity for the ingestion path).
    n, k, g = 128, 512, 128
    w = jax.random.normal(rng, (n, k), jnp.float32)
    qweight, scales, zeros = quantize_weights_to_packed(w, 4, g)
    w_int = unpack_weights(qweight, 4, g, k)
    z = jnp.repeat(zeros.astype(jnp.int32), g, axis=0)
    s = jnp.repeat(scales, g, axis=0)
    w_rec = ((w_int - z).astype(jnp.float32) * s).T
    err = np.abs(np.asarray(w_rec - w)).mean() / np.abs(np.asarray(w)).mean()
    assert err < 0.15, err  # 4-bit gaussian quantization: ~0.125 expected
