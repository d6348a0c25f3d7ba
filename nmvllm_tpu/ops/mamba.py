"""Mamba (selective SSM) ops for Jamba-style hybrid models.

TPU-native replacement for the reference's mamba_ssm CUDA kernels
(vllm/model_executor/models/jamba.py:8-9: selective_scan_fn,
selective_state_update, causal_conv1d_fn/update). The recurrence runs as a
`lax.scan` over time with per-row length masking (state freezes past the
row's valid length), so ONE code path serves prefill (T tokens), chunked
prefill (carry state between chunks), and decode (T=1). XLA fuses the
per-step elementwise work; the scan keeps everything on-device.
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def causal_conv1d(
    x: jax.Array,            # (B, T, D) inputs (padded rows allowed)
    weight: jax.Array,       # (W, D) depthwise kernel, oldest tap first
    bias: Optional[jax.Array],  # (D,) or None
    conv_state: jax.Array,   # (B, W-1, D) previous inputs (zeros at start)
    seq_lens: jax.Array,     # (B,) valid token count per row
) -> Tuple[jax.Array, jax.Array]:
    """Depthwise causal conv over time with carried state.

    Returns (y (B, T, D) activated with silu, new_state (B, W-1, D) =
    the last W-1 VALID inputs per row — padded tail tokens do not
    pollute the carried state).
    """
    b, t, d = x.shape
    w = weight.shape[0]
    full = jnp.concatenate([conv_state.astype(x.dtype), x], axis=1)
    y = jnp.zeros((b, t, d), jnp.float32)
    for i in range(w):
        y = y + full[:, i:i + t, :].astype(jnp.float32) * \
            weight[i].astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    y = jax.nn.silu(y)

    # New state: inputs at positions [seq_len - (W-1), seq_len) of `full`
    # (which holds W-1 old + T new), i.e. full rows seq_len .. seq_len+W-2.
    idx = seq_lens[:, None] + jnp.arange(w - 1)[None, :]      # (B, W-1)
    new_state = jnp.take_along_axis(full, idx[:, :, None], axis=1)
    return y.astype(x.dtype), new_state.astype(conv_state.dtype)


def selective_scan(
    x: jax.Array,            # (B, T, D) conv output
    dt: jax.Array,           # (B, T, D) raw time-step (pre-bias/softplus)
    a: jax.Array,            # (D, S) negative state matrix
    b_in: jax.Array,         # (B, T, S) input-dependent B
    c_in: jax.Array,         # (B, T, S) input-dependent C
    d_skip: jax.Array,       # (D,) skip connection
    z: jax.Array,            # (B, T, D) gate (silu applied here)
    ssm_state: jax.Array,    # (B, D, S) carried state
    *,
    dt_bias: Optional[jax.Array] = None,   # (D,)
    seq_lens: Optional[jax.Array] = None,  # (B,) for padded rows
) -> Tuple[jax.Array, jax.Array]:
    """Selective SSM recurrence (reference selective_scan_fn semantics,
    dt_softplus=True):

      dt'  = softplus(dt + dt_bias)
      h_t  = exp(dt' A) * h_{t-1} + (dt' x_t) B_t
      y_t  = (h_t · C_t) + D x_t;  out_t = y_t * silu(z_t)

    Steps with t >= seq_len leave the state untouched. Returns
    (out (B, T, D), final ssm_state (B, D, S)).
    """
    bsz, t, d = x.shape
    s = a.shape[1]
    dtp = dt.astype(jnp.float32)
    if dt_bias is not None:
        dtp = dtp + dt_bias.astype(jnp.float32)
    dtp = jax.nn.softplus(dtp)                                # (B, T, D)
    xf = x.astype(jnp.float32)
    af = a.astype(jnp.float32)                                # (D, S)
    bf = b_in.astype(jnp.float32)
    cf = c_in.astype(jnp.float32)

    # Precompute per-step decay and input: dA (B,T,D,S), dBx (B,T,D,S)
    # are too large to materialize for long T; compute inside the scan.
    def step(h, inputs):
        dt_t, x_t, b_t, c_t, valid_t = inputs
        # (B, D, S)
        da = jnp.exp(dt_t[:, :, None] * af[None, :, :])
        dbx = (dt_t * x_t)[:, :, None] * b_t[:, None, :]
        h_new = da * h + dbx
        h_new = jnp.where(valid_t[:, None, None], h_new, h)
        y = jnp.einsum("bds,bs->bd", h_new, c_t)
        return h_new, y

    if seq_lens is None:
        valid = jnp.ones((bsz, t), bool)
    else:
        valid = jnp.arange(t)[None, :] < seq_lens[:, None]
    xs = (dtp.swapaxes(0, 1), xf.swapaxes(0, 1), bf.swapaxes(0, 1),
          cf.swapaxes(0, 1), valid.swapaxes(0, 1))
    h0 = ssm_state.astype(jnp.float32)
    h_final, ys = jax.lax.scan(step, h0, xs)
    y = ys.swapaxes(0, 1)                                     # (B, T, D)
    y = y + xf * d_skip.astype(jnp.float32)[None, None, :]
    out = y * jax.nn.silu(z.astype(jnp.float32))
    return out.astype(x.dtype), h_final.astype(ssm_state.dtype)


def selective_scan_reference(x, dt, a, b_in, c_in, d_skip, z, ssm_state,
                             *, dt_bias=None, seq_lens=None):
    """Naive per-step loop in numpy for tests."""
    import numpy as np
    x = np.asarray(x, np.float64)
    dtp = np.asarray(dt, np.float64)
    if dt_bias is not None:
        dtp = dtp + np.asarray(dt_bias, np.float64)
    dtp = np.logaddexp(dtp, 0.0)  # softplus
    a = np.asarray(a, np.float64)
    b_in = np.asarray(b_in, np.float64)
    c_in = np.asarray(c_in, np.float64)
    d_skip = np.asarray(d_skip, np.float64)
    z = np.asarray(z, np.float64)
    h = np.asarray(ssm_state, np.float64).copy()
    bsz, t, d = x.shape
    ys = np.zeros_like(x)
    for i in range(bsz):
        n = t if seq_lens is None else int(np.asarray(seq_lens)[i])
        for step in range(t):
            if step < n:
                da = np.exp(dtp[i, step][:, None] * a)
                h[i] = da * h[i] + (dtp[i, step] * x[i, step])[:, None] * \
                    b_in[i, step][None, :]
            ys[i, step] = h[i] @ c_in[i, step]
    y = ys + x * d_skip[None, None, :]
    out = y * (z / (1.0 + np.exp(-z)))
    return out, h
