"""Paged-KV-cache maintenance ops.

TPU-native equivalent of ``csrc/cache_kernels.cu`` (reshape_and_cache:253,
copy_blocks:101, swap_blocks:24). On TPU these are XLA scatters/gathers over
the paged cache arrays — XLA fuses them into the surrounding step, and the
cache buffers are donated so updates are in-place in HBM.

Cache layout (per layer): ONE fused array
``(num_blocks, 2, num_kv_heads, block_size, head_dim)`` (index 0 = K,
1 = V). K and V of all heads of a page are contiguous, so the decode
kernel fetches a whole page in a single DMA (docs/PERF_NOTES.md: DMA
issue rate, not HBM bandwidth, limited the per-head layout).
"""
import functools
from typing import List

import jax
import jax.numpy as jnp

from nmvllm_tpu.ops.utils import pallas_interpret, use_pallas


def _write_kernel(slots_ref, k_ref, v_ref, kv_hbm, kv_out, page_buf, sem,
                  *, block_size: int):
    """Per-token page read-modify-write into the aliased cache.

    TPU scatters serialize per index row (0.7-1.2 ms/layer measured for
    the flat/5-D scatter forms) and DMA cannot target a dynamic sublane
    offset inside a tiled page, so: DMA the whole page into VMEM, insert
    the token's K and V rows at the in-page offset, DMA it back. Pages
    are ~128 KB — two page copies per token are ~3 us. Sequential grid
    order keeps same-page tokens (chunked prefill) correct."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    t = pl.program_id(0)
    slot = slots_ref[t]

    @pl.when(slot >= 0)
    def _():
        block = slot // block_size
        off = slot % block_size
        cp_in = pltpu.make_async_copy(kv_hbm.at[block], page_buf, sem)
        cp_in.start()
        cp_in.wait()
        # page_buf: (2, H, bs, d); merge the new rows at sublane `off`
        # via a select (dynamic sublane stores crash the Mosaic compiler).
        page = page_buf[:]
        h, bs, d = page.shape[1], page.shape[2], page.shape[3]
        pos = jax.lax.broadcasted_iota(jnp.int32, (bs, d), 0)
        sel = (pos == off)[None, None, :, :]
        # k/v ride (1, H, d) BLOCKS indexed by the grid step — whole
        # (T, H, d) VMEM operands blew scoped VMEM at T=8192 (32M > 16M,
        # round-5 serving diagnostics).
        new = jnp.stack([k_ref[0], v_ref[0]])[:, :, None, :]  # (2,H,1,d)
        page_buf[:] = jnp.where(sel, jnp.broadcast_to(new, page.shape),
                                page)
        cp_out = pltpu.make_async_copy(page_buf, kv_out.at[block], sem)
        cp_out.start()
        cp_out.wait()


@functools.lru_cache(maxsize=None)
def _write_fn(shape, dtype_name, kv_dtype_name, t, block_size):
    import numpy as np  # noqa: F401
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    num_blocks, _, h, bs, d = shape
    kernel = functools.partial(_write_kernel, block_size=block_size)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(t,),
            in_specs=[
                pl.BlockSpec((1, h, d), lambda ti, slots: (ti, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, h, d), lambda ti, slots: (ti, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, h, bs, d), jnp.dtype(kv_dtype_name)),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.dtype(kv_dtype_name)),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=pallas_interpret(),
    )


def write_to_kv_cache(kv_cache: jax.Array, key: jax.Array, value: jax.Array,
                      slot_mapping: jax.Array) -> jax.Array:
    """Write new K/V vectors into their paged slots.

    Args:
      kv_cache: (num_blocks, 2, H_kv, block_size, head_dim)
      key, value: (T, H_kv, head_dim) new vectors, padded rows allowed
      slot_mapping: (T,) int32 linear slot = block_id * block_size + offset;
        -1 marks padding rows (dropped).
    Returns the updated cache (donate the input under jit for in-place
    update).
    """
    num_blocks, _, num_kv_heads, block_size, head_dim = kv_cache.shape
    if use_pallas() and head_dim % 128 == 0 and not pallas_interpret():
        f = _write_fn(kv_cache.shape, str(key.dtype),
                      str(kv_cache.dtype), key.shape[0], block_size)
        return f(slot_mapping.astype(jnp.int32),
                 key.astype(kv_cache.dtype), value.astype(kv_cache.dtype),
                 kv_cache)
    return _write_to_kv_cache_scatter(kv_cache, key, value, slot_mapping)


def _write_to_kv_cache_scatter(kv_cache, key, value, slot_mapping):
    """XLA scatter fallback (CPU/interpret and unaligned head dims)."""
    num_blocks, _, num_kv_heads, block_size, head_dim = kv_cache.shape
    t = key.shape[0]
    # Negative sentinel slots (padding rows) must be remapped to a value
    # PAST the end: JAX scatter `mode="drop"` only drops out-of-bounds
    # indices, while negative indices WRAP to the end of the cache.
    slot_mapping = jnp.where(slot_mapping < 0, jnp.iinfo(jnp.int32).max,
                             slot_mapping)
    blocks = slot_mapping // block_size
    offs = slot_mapping % block_size
    # Flatten to a SINGLE-dim row scatter: multi-dim scatters with two
    # index vectors lower catastrophically on TPU (~1 ms/layer measured);
    # a flat row scatter is the same op the pre-fused layout used.
    flat = kv_cache.reshape(num_blocks * 2 * num_kv_heads * block_size,
                            head_dim)
    # Row of (token, kv_half, head): ((block*2 + kvi)*H + h)*bs + off.
    kvi = jnp.arange(2, dtype=jnp.int32)[None, :, None]
    h = jnp.arange(num_kv_heads, dtype=jnp.int32)[None, None, :]
    rows = ((blocks[:, None, None] * 2 + kvi) * num_kv_heads + h) * \
        block_size + offs[:, None, None]              # (T, 2, H)
    # Padding rows: block = huge -> row index overflows past the end and
    # the scatter drops it (guard the multiply against int32 overflow by
    # recomputing the sentinel post-transform).
    rows = jnp.where(blocks[:, None, None] >= num_blocks,
                     jnp.iinfo(jnp.int32).max, rows)
    kv_new = jnp.stack([key, value], axis=1).astype(kv_cache.dtype)
    flat = flat.at[rows.reshape(-1)].set(
        kv_new.reshape(t * 2 * num_kv_heads, head_dim), mode="drop",
        unique_indices=True)
    return flat.reshape(kv_cache.shape)


def copy_blocks(caches: List[jax.Array], src_ids: jax.Array,
                dst_ids: jax.Array) -> List[jax.Array]:
    """Batched copy-on-write page copies (reference cache_kernels.cu:101).

    caches: list of (num_blocks, 2, H_kv, block_size, head_dim) arrays.
    src_ids/dst_ids: (P,) int32 page indices; -1 pairs are dropped.
    """
    out = []
    for cache in caches:
        pages = cache[src_ids]
        out.append(cache.at[dst_ids].set(pages, mode="drop"))
    return out


def gather_blocks(cache: jax.Array, ids: jax.Array) -> jax.Array:
    """Pull pages out of the device cache (host swap-out path)."""
    return cache[ids]


def scatter_blocks(cache: jax.Array, ids: jax.Array,
                   pages: jax.Array) -> jax.Array:
    """Insert pages into the device cache (host swap-in path)."""
    return cache.at[ids].set(pages.astype(cache.dtype), mode="drop")


def gather_prefix(kv_cache: jax.Array, block_tables: jax.Array):
    """Gather paged prefix K and V as dense (B, H, T, d) arrays.

    Used by the prefill paged-prefix path and tests.
    """
    batch = block_tables.shape[0]
    _, _, num_kv_heads, block_size, head_dim = kv_cache.shape
    t = block_tables.shape[1] * block_size
    pages = kv_cache[block_tables]  # (B, maxb, 2, H, bs, d)
    k = pages[:, :, 0].transpose(0, 2, 1, 3, 4).reshape(
        batch, num_kv_heads, t, head_dim)
    v = pages[:, :, 1].transpose(0, 2, 1, 3, 4).reshape(
        batch, num_kv_heads, t, head_dim)
    return k, v
