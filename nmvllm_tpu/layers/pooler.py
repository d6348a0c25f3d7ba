"""Pooling for embedding models (reference:
vllm/model_executor/layers/pooler.py — Pooler with LAST/MEAN/CLS
pooling + normalization)."""
import enum

import jax
import jax.numpy as jnp


class PoolingType(enum.Enum):
    LAST = enum.auto()
    MEAN = enum.auto()
    CLS = enum.auto()


def pool_hidden_states(hidden: jax.Array, seq_lens: jax.Array,
                       pooling_type: PoolingType = PoolingType.LAST,
                       normalize: bool = True) -> jax.Array:
    """hidden: (B, T, H); seq_lens: (B,) valid lengths -> (B, H)."""
    b, t, h = hidden.shape
    if pooling_type == PoolingType.LAST:
        idx = jnp.maximum(seq_lens - 1, 0)
        pooled = hidden[jnp.arange(b), idx]
    elif pooling_type == PoolingType.CLS:
        pooled = hidden[:, 0]
    else:
        mask = (jnp.arange(t)[None, :] < seq_lens[:, None])[..., None]
        pooled = jnp.sum(hidden * mask, axis=1) / jnp.maximum(
            seq_lens[:, None], 1)
    pooled = pooled.astype(jnp.float32)
    if normalize:
        pooled = pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)
    return pooled
