"""Prefill (prompt) attention with optional paged prefix.

Covers what the reference does with flash-attn prefill + the Triton
prefix-aware kernel (vllm/attention/ops/prefix_prefill.py:1-807,
context_attention_fwd): causal attention of the current chunk's queries over
  (a) previously computed context held in the paged KV cache
      (prefix caching / chunked prefill), plus
  (b) the chunk's own keys/values.

TPU strategy: queries/keys of the current chunk are dense (B, T, H, d)
arrays; the paged prefix is gathered per-sequence from the cache by block
table. Everything is expressed as jnp einsums with masks — XLA fuses this
into two large MXU matmuls per head group; a Pallas flash kernel with
page-DMA (like the decode kernel) is the planned upgrade for very long
prefixes.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nmvllm_tpu.ops.utils import pallas_interpret, use_pallas

_NEG_INF = float("-inf")


def _flash_prefill_kernel(
    seq_lens_ref,   # (B,) int32 SMEM (scalar prefetch)
    q_ref,          # (1, 1, g, bq, d) VMEM
    k_ref,          # (1, 1, T, d) VMEM  (whole sequence, one kv head)
    v_ref,          # (1, 1, T, d) VMEM
    o_ref,          # (1, 1, g, bq, d) VMEM
    *,
    bq: int,
    bk: int,
    group: int,
    seq_t: int,
    scale: float,
    logit_soft_cap: float,
    sliding_window: int,
):
    """Flash-attention prefill tile: one (batch, kv_head, q_block) step
    runs online softmax over causal key chunks (the TPU stand-in for the
    reference's flash-attn prefill, vllm flash_attn varlen path). K/V
    stay VMEM-resident across the q-block grid dimension (their block
    index is q-invariant, so Pallas fetches them once per (b, head))."""
    b = pl.program_id(0)
    qi = pl.program_id(2)
    sl = seq_lens_ref[b]
    rows = group * bq
    d = q_ref.shape[-1]

    q = q_ref[0, 0].reshape(rows, d)
    q = (q.astype(jnp.float32) * scale).astype(q_ref.dtype)

    # Row r -> query position qi*bq + r % bq (g-major row layout).
    q_pos = qi * bq + jax.lax.broadcasted_iota(
        jnp.int32, (rows, bk), 0) % bq
    col0 = jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 1)

    # Causal upper bound; sliding-window lower bound.
    n_kc = jnp.minimum(pl.cdiv(seq_t, bk),
                       pl.cdiv((qi + 1) * bq, bk)).astype(jnp.int32)
    n_kc = jnp.minimum(n_kc, pl.cdiv(sl, bk))
    if sliding_window > 0:
        kc0 = jnp.maximum(qi * bq - sliding_window, 0) // bk
    else:
        kc0 = jnp.int32(0)

    def body(kc, carry):
        m, l, acc = carry
        k = k_ref[0, 0, pl.ds(kc * bk, bk), :]
        v = v_ref[0, 0, pl.ds(kc * bk, bk), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if logit_soft_cap > 0.0:
            s = logit_soft_cap * jnp.tanh(s / logit_soft_cap)
        k_pos = kc * bk + col0
        valid = (k_pos <= q_pos) & (k_pos < sl)
        if sliding_window > 0:
            valid &= k_pos > q_pos - sliding_window
        s = jnp.where(valid, s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        # Rows past seq_len (padding) are fully masked: keep m finite.
        m_new = jnp.maximum(m_new, -1e30)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jnp.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((rows, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((rows, 1), jnp.float32)
    acc0 = jnp.zeros((rows, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(kc0, n_kc, body, (m0, l0, acc0))
    out = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    o_ref[0, 0] = out.reshape(group, bq, d)


def _flash_prefill(q, k, v, seq_lens, *, scale, sliding_window,
                   logit_soft_cap):
    """(B, T, Hq, d) causal self-attention via the Pallas flash kernel.
    Assumes contiguous in-chunk positions (prefill chunks are)."""
    batch, t, num_q_heads, head_dim = q.shape
    num_kv_heads = k.shape[2]
    group = num_q_heads // num_kv_heads
    bq = min(512, t)
    # Cap the score tile at (2048, bk) f32 (~4MB VMEM) for large groups.
    if group * bq > 2048:
        bq = max(128, 2048 // group)
    if t > 4096:
        # Long rows keep the full (T, d) K/V VMEM-resident (8MB at 8192
        # double-buffered); shrink the q tile so scores + softmax state
        # stay inside the 16MB scoped budget.
        bq = min(bq, 256)
    bk = min(512, t)
    # (B, T, H, d) -> (B, H, g, T, d) blocks: head-major rows per kv head.
    q_r = q.reshape(batch, t, num_kv_heads, group,
                    head_dim).transpose(0, 2, 3, 1, 4)
    # K/V head-major so their blocks keep full (T, d) minor dims (Mosaic
    # requires last-two block dims divisible by the tile or full).
    k_r = k.transpose(0, 2, 1, 3)
    v_r = v.transpose(0, 2, 1, 3)
    grid = (batch, num_kv_heads, pl.cdiv(t, bq))
    out = pl.pallas_call(
        functools.partial(
            _flash_prefill_kernel, bq=bq, bk=bk, group=group, seq_t=t,
            scale=float(scale), logit_soft_cap=float(logit_soft_cap),
            sliding_window=int(sliding_window)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, group, bq, head_dim),
                             lambda b, h, i, *_: (b, h, 0, i, 0)),
                pl.BlockSpec((1, 1, t, head_dim),
                             lambda b, h, i, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, t, head_dim),
                             lambda b, h, i, *_: (b, h, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, group, bq, head_dim),
                                   lambda b, h, i, *_: (b, h, 0, i, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_kv_heads, group, t, head_dim), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * batch * num_q_heads * t * t * head_dim // 2,
            bytes_accessed=(q.size + 2 * k.size) * q.dtype.itemsize,
            transcendentals=batch * num_q_heads * t * t // 2),
        interpret=pallas_interpret(),
    )(seq_lens.astype(jnp.int32), q_r, k_r, v_r)
    # (B, H, g, T, d) -> (B, T, Hq, d)
    out = out.transpose(0, 3, 1, 2, 4)
    return out.reshape(batch, t, num_q_heads, head_dim)


def blocksparse_allow(qpos, kpos, blocksparse, bs_head_offsets,
                      num_kv_heads: int, group: int):
    """Blocksparse allow-mask (reference
    attention/ops/blocksparse_attention/utils.py:141 get_sparse_attn_mask):
    a query block attends its ``local`` preceding key blocks plus every
    key block whose (offset-shifted) index + 1 is a multiple of ``vert``.

    ``qpos``/``kpos``: int32 position arrays broadcastable to
    (B, Tq, Tk); returns a mask broadcastable to (B, h, g, Tq, Tk).
    ``bs_head_offsets``: per-local-q-head GLOBAL vertical-stride offsets
    (head_index * head_sliding_step), or None for a homogeneous pattern.
    """
    blk, local, vert = blocksparse
    qb = qpos // blk
    kb = kpos // blk
    local_ok = (qb - kb) < local
    if bs_head_offsets is None:
        return (local_ok | ((kb + 1) % vert == 0))[:, None, None]
    offs = bs_head_offsets.astype(jnp.int32).reshape(num_kv_heads, group)
    vert_ok = (kb[:, None, None] + offs[None, :, :, None, None] + 1) \
        % vert == 0
    return local_ok[:, None, None] | vert_ok


@functools.partial(jax.jit, static_argnames=("scale", "sliding_window",
                                             "logit_soft_cap",
                                             "blocksparse"))
def prefill_attention(
    q: jax.Array,            # (B, T, num_q_heads, head_dim)
    k: jax.Array,            # (B, T, num_kv_heads, head_dim) current chunk
    v: jax.Array,            # (B, T, num_kv_heads, head_dim)
    positions: jax.Array,    # (B, T) int32 absolute positions (for causal)
    seq_lens: jax.Array,     # (B,) int32 valid token count in this chunk
    *,
    scale: float,
    sliding_window: int = 0,
    logit_soft_cap: float = 0.0,
    alibi_slopes=None,
    blocksparse=None,        # static (block, local_blocks, vert_stride)
    bs_head_offsets=None,    # (num_q_heads,) int32, or None (homo heads)
) -> jax.Array:
    """Causal self-attention within the current chunk only (no prefix)."""
    batch, t, num_q_heads, head_dim = q.shape
    num_kv_heads = k.shape[2]
    group = num_q_heads // num_kv_heads

    # Pallas flash fast path: no (B, h, g, T, T) score materialization in
    # HBM (the jnp path writes it; at T=1024 that is ~134MB per row on an
    # 8B model). Exotic modifiers fall back to the einsum reference.
    bk = min(512, t)
    if (use_pallas() and head_dim % 128 == 0 and alibi_slopes is None
            and blocksparse is None and t % bk == 0 and 128 <= t <= 8192
            and num_q_heads % num_kv_heads == 0):
        return _flash_prefill(q, k, v, seq_lens, scale=scale,
                              sliding_window=sliding_window,
                              logit_soft_cap=logit_soft_cap)

    qf = q.astype(jnp.float32).reshape(batch, t, num_kv_heads, group,
                                       head_dim)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)

    s = jnp.einsum("bqhgd,bkhd->bhgqk", qf, kf) * scale
    if logit_soft_cap > 0.0:
        s = logit_soft_cap * jnp.tanh(s / logit_soft_cap)
    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, jnp.float32).reshape(
            num_kv_heads, group)
        dist = (positions[:, None, :] - positions[:, :, None]
                ).astype(jnp.float32)                 # (B, Tq, Tk)
        s = s + (slopes[None, :, :, None, None] *
                 dist[:, None, None, :, :])
    qpos = positions[:, :, None]                      # (B, T, 1)
    kpos = positions[:, None, :]                      # (B, 1, T)
    valid_k = jnp.arange(t)[None, None, :] < seq_lens[:, None, None]
    mask = (kpos <= qpos) & valid_k
    if sliding_window > 0:
        mask &= kpos > (qpos - sliding_window)
    s = jnp.where(mask[:, None, None, :, :], s, _NEG_INF)
    if blocksparse is not None:
        allow = blocksparse_allow(qpos, kpos, blocksparse,
                                  bs_head_offsets, num_kv_heads, group)
        s = jnp.where(allow, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgqk,bkhd->bqhgd", p, vf)
    return o.reshape(batch, t, num_q_heads, head_dim).astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "sliding_window",
                                             "logit_soft_cap",
                                             "blocksparse"))
def prefill_attention_with_paged_prefix(
    q: jax.Array,            # (B, T, num_q_heads, head_dim)
    k: jax.Array,            # (B, T, num_kv_heads, head_dim) current chunk
    v: jax.Array,
    positions: jax.Array,    # (B, T) absolute positions of chunk tokens
    seq_lens: jax.Array,     # (B,) valid tokens in this chunk
    kv_cache: jax.Array,     # (num_blocks, 2, H_kv, block_size, head_dim)
    block_tables: jax.Array,  # (B, max_bpp)
    context_lens: jax.Array,  # (B,) prefix length already in cache
    *,
    scale: float,
    sliding_window: int = 0,
    logit_soft_cap: float = 0.0,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
    alibi_slopes=None,
    blocksparse=None,        # static (block, local_blocks, vert_stride)
    bs_head_offsets=None,    # (num_q_heads,) int32, or None (homo heads)
) -> jax.Array:
    """Chunked-prefill attention: queries attend to cached prefix + chunk."""
    from nmvllm_tpu.ops.cache_ops import gather_prefix

    batch, t, num_q_heads, head_dim = q.shape
    _, _, num_kv_heads, block_size, _ = kv_cache.shape
    group = num_q_heads // num_kv_heads
    max_bpp = block_tables.shape[1]
    ctx_t = max_bpp * block_size

    qf = q.astype(jnp.float32).reshape(batch, t, num_kv_heads, group,
                                       head_dim)

    # --- prefix scores over gathered pages ---
    kp, vp = gather_prefix(kv_cache, block_tables)
    kp = kp.astype(jnp.float32) * k_scale
    vp = vp.astype(jnp.float32) * v_scale
    s_pre = jnp.einsum("bqhgd,bhkd->bhgqk", qf, kp) * scale

    # --- chunk-internal scores ---
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    s_cur = jnp.einsum("bqhgd,bkhd->bhgqk", qf, kf) * scale

    if logit_soft_cap > 0.0:
        s_pre = logit_soft_cap * jnp.tanh(s_pre / logit_soft_cap)
        s_cur = logit_soft_cap * jnp.tanh(s_cur / logit_soft_cap)
    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, jnp.float32).reshape(
            num_kv_heads, group)
        ctx_kpos = jnp.arange(ctx_t, dtype=jnp.float32)[None, :]
        qpos_f = positions.astype(jnp.float32)
        pre_dist = ctx_kpos[:, None, :] - qpos_f[:, :, None]  # (B, Tq, ctx)
        s_pre = s_pre + (slopes[None, :, :, None, None] *
                         pre_dist[:, None, None, :, :])
        cur_dist = (positions[:, None, :] - positions[:, :, None]
                    ).astype(jnp.float32)
        s_cur = s_cur + (slopes[None, :, :, None, None] *
                         cur_dist[:, None, None, :, :])

    qpos = positions[:, :, None]
    # Prefix mask: cached token index < context_len, window check.
    ctx_pos = jnp.arange(ctx_t)[None, None, :]
    pre_mask = ctx_pos < context_lens[:, None, None]
    if sliding_window > 0:
        pre_mask &= ctx_pos > (qpos - sliding_window)
    s_pre = jnp.where(pre_mask[:, None, None, :, :], s_pre, _NEG_INF)
    if blocksparse is not None:
        allow_pre = blocksparse_allow(qpos, ctx_pos, blocksparse,
                                      bs_head_offsets, num_kv_heads,
                                      group)
        s_pre = jnp.where(allow_pre, s_pre, _NEG_INF)

    kpos = positions[:, None, :]
    valid_k = jnp.arange(t)[None, None, :] < seq_lens[:, None, None]
    cur_mask = (kpos <= qpos) & valid_k
    if sliding_window > 0:
        cur_mask &= kpos > (qpos - sliding_window)
    s_cur = jnp.where(cur_mask[:, None, None, :, :], s_cur, _NEG_INF)
    if blocksparse is not None:
        allow_cur = blocksparse_allow(qpos, kpos, blocksparse,
                                      bs_head_offsets, num_kv_heads,
                                      group)
        s_cur = jnp.where(allow_cur, s_cur, _NEG_INF)

    s = jnp.concatenate([s_pre, s_cur], axis=-1)
    p = jax.nn.softmax(s, axis=-1)
    p_pre, p_cur = p[..., :ctx_t], p[..., ctx_t:]
    o = (jnp.einsum("bhgqk,bhkd->bqhgd", p_pre, vp) +
         jnp.einsum("bhgqk,bkhd->bqhgd", p_cur, vf))
    return o.reshape(batch, t, num_q_heads, head_dim).astype(q.dtype)
