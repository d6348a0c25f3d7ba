"""Mamba selective-scan / causal-conv ops vs naive references
(reference kernels: mamba_ssm selective_scan_fn, causal_conv1d_fn)."""
import numpy as np

import jax
import jax.numpy as jnp

from nmvllm_tpu.ops.mamba import (causal_conv1d, selective_scan,
                                  selective_scan_reference)


def test_selective_scan_matches_reference(rng):
    b, t, d, s = 2, 9, 8, 4
    ks = jax.random.split(rng, 7)
    x = jax.random.normal(ks[0], (b, t, d), jnp.float32)
    dt = jax.random.normal(ks[1], (b, t, d), jnp.float32) * 0.5
    a = -jnp.exp(jax.random.normal(ks[2], (d, s), jnp.float32))
    b_in = jax.random.normal(ks[3], (b, t, s), jnp.float32)
    c_in = jax.random.normal(ks[4], (b, t, s), jnp.float32)
    d_skip = jax.random.normal(ks[5], (d,), jnp.float32)
    z = jax.random.normal(ks[6], (b, t, d), jnp.float32)
    dt_bias = jnp.full((d,), 0.1, jnp.float32)
    h0 = jnp.zeros((b, d, s), jnp.float32)
    seq_lens = jnp.asarray([t, 5], jnp.int32)

    out, h = selective_scan(x, dt, a, b_in, c_in, d_skip, z, h0,
                            dt_bias=dt_bias, seq_lens=seq_lens)
    ref_out, ref_h = selective_scan_reference(
        x, dt, a, b_in, c_in, d_skip, z, h0, dt_bias=dt_bias,
        seq_lens=seq_lens)
    np.testing.assert_allclose(np.asarray(out)[:, :5], ref_out[:, :5],
                               atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(h), ref_h, atol=1e-4, rtol=1e-4)


def test_selective_scan_chunked_equals_full(rng):
    """Carrying state across chunks == one full scan (chunked prefill)."""
    b, t, d, s = 1, 12, 6, 3
    ks = jax.random.split(rng, 7)
    x = jax.random.normal(ks[0], (b, t, d), jnp.float32)
    dt = jax.random.normal(ks[1], (b, t, d), jnp.float32) * 0.4
    a = -jnp.exp(jax.random.normal(ks[2], (d, s), jnp.float32))
    b_in = jax.random.normal(ks[3], (b, t, s), jnp.float32)
    c_in = jax.random.normal(ks[4], (b, t, s), jnp.float32)
    d_skip = jax.random.normal(ks[5], (d,), jnp.float32)
    z = jax.random.normal(ks[6], (b, t, d), jnp.float32)
    h0 = jnp.zeros((b, d, s), jnp.float32)

    full, h_full = selective_scan(x, dt, a, b_in, c_in, d_skip, z, h0)
    cut = 7
    p1, h1 = selective_scan(x[:, :cut], dt[:, :cut], a, b_in[:, :cut],
                            c_in[:, :cut], d_skip, z[:, :cut], h0)
    p2, h2 = selective_scan(x[:, cut:], dt[:, cut:], a, b_in[:, cut:],
                            c_in[:, cut:], d_skip, z[:, cut:], h1)
    np.testing.assert_allclose(np.asarray(jnp.concatenate([p1, p2], 1)),
                               np.asarray(full), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h_full),
                               atol=1e-5, rtol=1e-5)


def test_causal_conv1d_state_carry(rng):
    b, t, d, w = 2, 10, 4, 4
    ks = jax.random.split(rng, 3)
    x = jax.random.normal(ks[0], (b, t, d), jnp.float32)
    weight = jax.random.normal(ks[1], (w, d), jnp.float32)
    bias = jax.random.normal(ks[2], (d,), jnp.float32)
    state0 = jnp.zeros((b, w - 1, d), jnp.float32)
    lens = jnp.asarray([t, t], jnp.int32)

    full, st_full = causal_conv1d(x, weight, bias, state0, lens)
    cut = 6
    p1, st1 = causal_conv1d(x[:, :cut], weight, bias, state0,
                            jnp.asarray([cut, cut], jnp.int32))
    p2, st2 = causal_conv1d(x[:, cut:], weight, bias, st1,
                            jnp.asarray([t - cut, t - cut], jnp.int32))
    np.testing.assert_allclose(np.asarray(jnp.concatenate([p1, p2], 1)),
                               np.asarray(full), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(st2), np.asarray(st_full),
                               atol=1e-5, rtol=1e-5)

    # Naive check of one output position: y_t = silu(b + sum_i w_i x_.).
    xt = np.asarray(x)
    wt = np.asarray(weight)
    t0 = 5
    v = np.zeros((d,))
    for i in range(w):
        v += wt[i] * xt[0, t0 - (w - 1) + i]
    v = v + np.asarray(bias)
    expect = v * (1 / (1 + np.exp(-v)))
    np.testing.assert_allclose(np.asarray(full)[0, t0], expect,
                               atol=1e-5, rtol=1e-5)


def test_causal_conv1d_padded_state(rng):
    """Padded tail must not pollute the carried state."""
    b, t, d, w = 1, 8, 4, 4
    ks = jax.random.split(rng, 2)
    x = jax.random.normal(ks[0], (b, t, d), jnp.float32)
    weight = jax.random.normal(ks[1], (w, d), jnp.float32)
    state0 = jnp.zeros((b, w - 1, d), jnp.float32)
    n = 5
    _, st_padded = causal_conv1d(x, weight, None, state0,
                                 jnp.asarray([n], jnp.int32))
    _, st_exact = causal_conv1d(x[:, :n], weight, None, state0,
                                jnp.asarray([n], jnp.int32))
    np.testing.assert_allclose(np.asarray(st_padded), np.asarray(st_exact),
                               atol=1e-6, rtol=1e-6)
