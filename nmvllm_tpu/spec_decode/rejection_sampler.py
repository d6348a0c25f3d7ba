"""Rejection sampling for speculative decoding.

Reference: vllm/model_executor/layers/rejection_sampler.py (modified
rejection sampling, accept with prob min(1, p/q)) and
typical_acceptance_sampler.py. jnp implementations usable in-graph on the
padded speculation batch.
"""
from typing import Tuple

import jax
import jax.numpy as jnp


def rejection_sample_greedy(
    proposed: jax.Array,        # (B, k) int32 draft tokens
    target_argmax: jax.Array,   # (B, k+1) int32 target-model argmax at each
                                # position (last = bonus token)
) -> Tuple[jax.Array, jax.Array]:
    """Greedy acceptance: accept while draft == target argmax.

    Returns (tokens (B, k+1) int32 with -1 padding, num_accepted (B,)).
    The accepted prefix is followed by one corrected/bonus target token.
    """
    b, k = proposed.shape
    match = proposed == target_argmax[:, :k]
    # Number of leading accepted drafts per row.
    accepted = jnp.cumprod(match.astype(jnp.int32), axis=1)
    num_accepted = jnp.sum(accepted, axis=1)              # (B,)
    # Output: accepted drafts + the target token at the first mismatch
    # (or the bonus token when all match).
    positions = jnp.arange(k + 1)[None, :]
    keep = positions <= num_accepted[:, None]
    out = jnp.where(keep, target_argmax, -1)
    # Replace the accepted draft positions with the (identical) drafts to
    # keep semantics obvious; target_argmax already equals them there.
    return out.astype(jnp.int32), num_accepted.astype(jnp.int32)


def rejection_sample(
    proposed: jax.Array,        # (B, k) int32
    draft_probs: jax.Array,     # (B, k, V) f32 q(x)
    target_probs: jax.Array,    # (B, k+1, V) f32 p(x)
    key_data: jax.Array,        # (B, 2) uint32
) -> Tuple[jax.Array, jax.Array]:
    """Stochastic modified rejection sampling (rejection_sampler.py):
    accept draft x_i with prob min(1, p(x_i)/q(x_i)); on rejection sample
    from norm(max(p - q, 0)); append bonus token if all accepted.

    Returns (tokens (B, k+1) with -1 padding, num_accepted (B,)).
    """
    b, k, v = draft_probs.shape
    keys = jax.vmap(jax.random.wrap_key_data)(key_data)

    def per_row(key, prop, q, p):
        ks = jax.random.split(key, k + 1)
        q_sel = jnp.take_along_axis(q, prop[:, None], axis=1)[:, 0]
        p_sel = jnp.take_along_axis(p[:k], prop[:, None], axis=1)[:, 0]
        u = jax.vmap(lambda kk: jax.random.uniform(kk))(ks[:k])
        accept = u < jnp.minimum(1.0, p_sel / jnp.maximum(q_sel, 1e-10))
        acc_prefix = jnp.cumprod(accept.astype(jnp.int32))
        n_acc = jnp.sum(acc_prefix)
        # Recovery distribution at the first rejected position.
        idx = jnp.minimum(n_acc, k - 1)
        residual = jnp.maximum(p[idx] - q[idx], 0.0)
        residual = residual / jnp.maximum(residual.sum(), 1e-10)
        recovery = jax.random.categorical(ks[k], jnp.log(residual + 1e-20))
        bonus = jax.random.categorical(ks[k], jnp.log(p[k] + 1e-20))
        correction = jnp.where(n_acc == k, bonus, recovery)
        positions = jnp.arange(k + 1)
        out = jnp.where(positions < n_acc, jnp.pad(prop, (0, 1)),
                        jnp.where(positions == n_acc, correction, -1))
        return out.astype(jnp.int32), n_acc.astype(jnp.int32)

    return jax.vmap(per_row)(keys, proposed, draft_probs, target_probs)


def typical_acceptance_mask(
    target_probs: jax.Array,    # (B, k, V) f32 p(x) at draft positions
    proposed: jax.Array,        # (B, k) int32 draft tokens
    posterior_threshold: float = 0.09,
    posterior_alpha: float = 0.3,
) -> jax.Array:
    """Typical acceptance (reference typical_acceptance_sampler.py:100,
    MEDUSA §3.3.1): accept draft x_i when p(x_i) clears the
    entropy-adaptive threshold min(threshold, alpha * exp(-H(p))).
    Deterministic — no RNG — which trades exactness of the output
    distribution for higher acceptance. Rejection replacement is the
    target argmax (reference _replacement_token_ids:155).

    Returns a (B, k) bool acceptance mask (positionwise, before the
    prefix-product)."""
    p_sel = jnp.take_along_axis(target_probs, proposed[..., None],
                                axis=-1)[..., 0]
    entropy = -jnp.sum(
        target_probs * jnp.log(jnp.maximum(target_probs, 1e-20)), axis=-1)
    threshold = jnp.minimum(posterior_threshold,
                            posterior_alpha * jnp.exp(-entropy))
    return p_sel > threshold
