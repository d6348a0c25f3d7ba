"""Paged-KV-cache maintenance ops.

TPU-native equivalent of ``csrc/cache_kernels.cu`` (reshape_and_cache:253,
copy_blocks:101, swap_blocks:24). On TPU these are XLA scatters/gathers over
the paged cache arrays — XLA fuses them into the surrounding step, and the
cache buffers are donated so updates are in-place in HBM.

Cache layout (per layer): ``(num_kv_heads, num_blocks, block_size, head_dim)``
— the layout the reference's own TPU path uses (attention/backends/pallas.py:23-29)
and the one our Pallas paged-attention kernel DMAs pages from.
"""
from typing import List, Tuple

import jax
import jax.numpy as jnp


def write_to_kv_cache(k_cache: jax.Array, v_cache: jax.Array, key: jax.Array,
                      value: jax.Array,
                      slot_mapping: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Scatter new K/V vectors into their paged slots.

    Args:
      k_cache, v_cache: (H_kv, num_blocks, block_size, head_dim)
      key, value: (T, H_kv, head_dim) new vectors, padded rows allowed
      slot_mapping: (T,) int32 linear slot = block_id * block_size + offset;
        -1 marks padding rows (dropped by the scatter).
    Returns updated caches (donate the inputs under jit for in-place update).
    """
    num_kv_heads, num_blocks, block_size, head_dim = k_cache.shape
    kc = k_cache.reshape(num_kv_heads, num_blocks * block_size, head_dim)
    vc = v_cache.reshape(num_kv_heads, num_blocks * block_size, head_dim)
    # Negative sentinel slots (padding rows) must be remapped to a value
    # PAST the end: JAX scatter `mode="drop"` only drops out-of-bounds
    # indices, while negative indices WRAP to the end of the cache.
    slot_mapping = jnp.where(slot_mapping < 0, jnp.iinfo(jnp.int32).max,
                             slot_mapping)
    # (T, H, d) -> (H, T, d)
    k_new = key.swapaxes(0, 1).astype(k_cache.dtype)
    v_new = value.swapaxes(0, 1).astype(v_cache.dtype)
    kc = kc.at[:, slot_mapping].set(k_new, mode="drop",
                                    unique_indices=True)
    vc = vc.at[:, slot_mapping].set(v_new, mode="drop",
                                    unique_indices=True)
    return (kc.reshape(k_cache.shape), vc.reshape(v_cache.shape))


def copy_blocks(caches: List[jax.Array], src_ids: jax.Array,
                dst_ids: jax.Array) -> List[jax.Array]:
    """Batched copy-on-write page copies (reference cache_kernels.cu:101).

    caches: list of (H_kv, num_blocks, block_size, head_dim) arrays.
    src_ids/dst_ids: (P,) int32 page indices; -1 pairs are dropped.
    """
    out = []
    for cache in caches:
        pages = cache[:, src_ids]
        out.append(cache.at[:, dst_ids].set(pages, mode="drop"))
    return out


def gather_blocks(cache: jax.Array, ids: jax.Array) -> jax.Array:
    """Pull pages out of the device cache (host swap-out path)."""
    return cache[:, ids]


def scatter_blocks(cache: jax.Array, ids: jax.Array,
                   pages: jax.Array) -> jax.Array:
    """Insert pages into the device cache (host swap-in path)."""
    return cache.at[:, ids].set(pages.astype(cache.dtype), mode="drop")
