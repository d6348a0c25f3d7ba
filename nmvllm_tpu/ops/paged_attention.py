"""Paged-attention decode kernel (Pallas TPU).

TPU-native replacement for the reference's CUDA paged attention
(csrc/attention/attention_kernels.cu:1-995, v1/v2) and the shim
vllm/attention/ops/paged_attn.py:82 (forward_decode).

Design (see SURVEY.md §A.2):
  * KV layout ``(num_kv_heads, num_blocks, block_size, head_dim)`` — the
    TPU-friendly layout of the reference's own Pallas path
    (vllm/attention/backends/pallas.py:23-29).
  * Grid ``(batch, kv_heads)``; each program attends one sequence with one
    KV head group (GQA: all query heads sharing that KV head).
  * Block tables + context lengths arrive via scalar prefetch (SMEM), so the
    kernel issues its own HBM→VMEM page DMAs: ``pages_per_compute_block``
    pages per inner step, double-buffered, overlapping DMA with compute.
  * Online softmax (flash-decoding style) across page superblocks; the inner
    ``fori_loop`` trip count is ``ceil(context_len / superblock)`` so work is
    proportional to the true context length, not the padded table width.
  * FP8 KV: cache arrays may be float8_e4m3fn with per-tensor k/v scales —
    dequant happens in-VMEM right after the DMA (replaces the reference's
    inline ``convert_fp8`` in the CUDA kernel).
"""
import functools


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nmvllm_tpu.ops.utils import pallas_interpret, use_pallas

_NEG_INF = float("-inf")


def _decode_kernel(
    # scalar prefetch
    block_tables_ref,  # (B, max_bpp) int32, SMEM
    context_lens_ref,  # (B,) int32, SMEM
    # inputs
    q_ref,     # (1, 1, G_pad, d) VMEM
    k_hbm,     # (H_kv, num_blocks, bs, d) ANY/HBM
    v_hbm,     # same
    # outputs
    o_ref,     # (1, 1, G_pad, d) VMEM
    # scratch
    k_buf,     # (2, SB, d) VMEM, cache dtype
    v_buf,     # (2, SB, d) VMEM
    sems,      # DMA sems (2, 2, PPCB)
    *,
    scale: float,
    k_scale: float,
    v_scale: float,
    pages_per_compute_block: int,
    block_size: int,
    g_pad: int,
    head_dim: int,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    ctx = context_lens_ref[b]
    sb_tokens = pages_per_compute_block * block_size
    num_sb = pl.cdiv(ctx, sb_tokens)

    def copies(sb, slot):
        out = []
        for i in range(pages_per_compute_block):
            page = block_tables_ref[b, sb * pages_per_compute_block + i]
            out.append(pltpu.make_async_copy(
                k_hbm.at[h, page],
                k_buf.at[slot, pl.ds(i * block_size, block_size), :],
                sems.at[slot, 0, i]))
            out.append(pltpu.make_async_copy(
                v_hbm.at[h, page],
                v_buf.at[slot, pl.ds(i * block_size, block_size), :],
                sems.at[slot, 1, i]))
        return out

    def start(sb, slot):
        for c in copies(sb, slot):
            c.start()

    def wait(sb, slot):
        for c in copies(sb, slot):
            c.wait()

    # Padding rows have ctx == 0 (num_sb == 0): no DMA may start, or its
    # semaphore would never be awaited and the program would fault.
    @pl.when(num_sb > 0)
    def _():
        start(0, 0)

    q = q_ref[0, 0].astype(jnp.float32) * scale  # (G_pad, d)

    def body(sb, carry):
        m, l, acc = carry
        slot = jax.lax.rem(sb, 2)

        @pl.when(sb + 1 < num_sb)
        def _():
            start(sb + 1, jax.lax.rem(sb + 1, 2))

        wait(sb, slot)
        k = k_buf[slot].astype(jnp.float32)
        v = v_buf[slot].astype(jnp.float32)
        if k_scale != 1.0:
            k = k * k_scale
        if v_scale != 1.0:
            v = v * v_scale
        # scores: (G_pad, SB)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.DEFAULT)
        col = jax.lax.broadcasted_iota(
            jnp.int32, (g_pad, sb_tokens), 1) + sb * sb_tokens
        s = jnp.where(col < ctx, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(p.astype(v.dtype), v,
                                        preferred_element_type=jnp.float32,
                                        precision=jax.lax.Precision.DEFAULT)
        return m_new, l_new, acc_new

    m0 = jnp.full((g_pad, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((g_pad, 1), jnp.float32)
    acc0 = jnp.zeros((g_pad, head_dim), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_sb, body, (m0, l0, acc0))
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "k_scale", "v_scale",
                     "pages_per_compute_block", "logit_soft_cap",
                     "sliding_window"))
def paged_attention(
    q: jax.Array,            # (B, num_q_heads, head_dim)
    k_cache: jax.Array,      # (H_kv, num_blocks, block_size, head_dim)
    v_cache: jax.Array,
    block_tables: jax.Array,  # (B, max_blocks_per_seq) int32
    context_lens: jax.Array,  # (B,) int32, includes the current token
    *,
    scale: float,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
    pages_per_compute_block: int = 8,
    logit_soft_cap: float = 0.0,
    sliding_window: int = 0,
    alibi_slopes=None,
) -> jax.Array:
    """Flash-decoding paged attention. Returns (B, num_q_heads, head_dim)."""
    # Mosaic requires lane-aligned (128) head_dim for the page DMA slices;
    # fall back to the jnp path otherwise (reference pallas.py:103 has the
    # same head_size % 128 constraint). Models needing logit soft-cap /
    # decode-side sliding window / alibi also take the jnp path (kernel
    # support is a perf follow-up, not a correctness gap).
    if (not use_pallas() or q.shape[-1] % 128 != 0
            or logit_soft_cap > 0.0 or sliding_window > 0
            or alibi_slopes is not None):
        return paged_attention_reference(
            q, k_cache, v_cache, block_tables, context_lens, scale=scale,
            k_scale=k_scale, v_scale=v_scale,
            logit_soft_cap=logit_soft_cap, sliding_window=sliding_window,
            alibi_slopes=alibi_slopes)
    batch, num_q_heads, head_dim = q.shape
    num_kv_heads, num_blocks, block_size, _ = k_cache.shape
    assert num_q_heads % num_kv_heads == 0
    group = num_q_heads // num_kv_heads
    # Pad the query-head group to a full sublane tile.
    g_pad = max(8, group)
    max_bpp = block_tables.shape[1]
    ppcb = min(pages_per_compute_block, max_bpp)
    pad_pages = (-max_bpp) % ppcb
    if pad_pages:
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pad_pages)))
        max_bpp += pad_pages

    q_r = q.reshape(batch, num_kv_heads, group, head_dim)
    if g_pad != group:
        q_r = jnp.pad(q_r, ((0, 0), (0, 0), (0, g_pad - group), (0, 0)))

    sb = ppcb * block_size
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, num_kv_heads),
        in_specs=[
            pl.BlockSpec((1, 1, g_pad, head_dim),
                         lambda b, h, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, g_pad, head_dim),
                               lambda b, h, *_: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, sb, head_dim), k_cache.dtype),
            pltpu.VMEM((2, sb, head_dim), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2, ppcb)),
        ],
    )
    kernel = functools.partial(
        _decode_kernel,
        scale=float(scale), k_scale=float(k_scale), v_scale=float(v_scale),
        pages_per_compute_block=ppcb, block_size=block_size,
        g_pad=g_pad, head_dim=head_dim)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_kv_heads, g_pad, head_dim), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=pallas_interpret(),
    )(block_tables.astype(jnp.int32), context_lens.astype(jnp.int32),
      q_r, k_cache, v_cache)
    out = out[:, :, :group, :]
    return out.reshape(batch, num_q_heads, head_dim)


def paged_attention_reference(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    block_tables: jax.Array,
    context_lens: jax.Array,
    *,
    scale: float,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
    logit_soft_cap: float = 0.0,
    sliding_window: int = 0,
    alibi_slopes=None,
) -> jax.Array:
    """jnp reference (gather pages -> dense attention). Used by tests and as
    the automatic non-TPU fallback.

    ``sliding_window`` masks keys older than the window in LOGICAL position
    space — with the block manager's wrapped block tables (ring layout)
    those logical indices still gather the correct physical pages, and the
    stale aliased slots fall outside the window mask.
    ``alibi_slopes``: (num_q_heads,) — adds slope*(key_pos - query_pos)
    (reference attention_kernels.cu alibi path); the query position is
    context_len-1.
    """
    batch, num_q_heads, head_dim = q.shape
    num_kv_heads, _, block_size, _ = k_cache.shape
    group = num_q_heads // num_kv_heads
    max_bpp = block_tables.shape[1]
    t = max_bpp * block_size

    # (H, B, maxb, bs, d) -> (B, H, t, d)
    k = jnp.moveaxis(k_cache[:, block_tables], 1, 0)
    k = k.reshape(batch, num_kv_heads, t, head_dim).astype(jnp.float32)
    v = jnp.moveaxis(v_cache[:, block_tables], 1, 0)
    v = v.reshape(batch, num_kv_heads, t, head_dim).astype(jnp.float32)
    k = k * k_scale
    v = v * v_scale

    q_r = q.reshape(batch, num_kv_heads, group, head_dim).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhtd->bhgt", q_r, k,
                   precision=jax.lax.Precision.HIGHEST) * scale
    if logit_soft_cap > 0.0:
        s = logit_soft_cap * jnp.tanh(s / logit_soft_cap)
    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, jnp.float32).reshape(
            num_kv_heads, group)
        kpos = jnp.arange(t, dtype=jnp.float32)[None, :]
        qpos = (context_lens[:, None].astype(jnp.float32) - 1.0)
        bias = (kpos - qpos)                                # (B, t), <= 0
        s = s + slopes[None, :, :, None] * bias[:, None, None, :]
    mask = (jnp.arange(t)[None, :] < context_lens[:, None])
    if sliding_window > 0:
        mask &= (jnp.arange(t)[None, :] >
                 context_lens[:, None] - 1 - sliding_window)
    s = jnp.where(mask[:, None, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    # Padding rows (context_len == 0) are fully masked -> softmax NaN;
    # zero them (the Pallas kernel's zero-trip loop does the same).
    p = jnp.where(mask[:, None, None, :], p, 0.0)
    o = jnp.einsum("bhgt,bhtd->bhgd", p, v,
                   precision=jax.lax.Precision.HIGHEST)
    return o.reshape(batch, num_q_heads, head_dim).astype(q.dtype)
