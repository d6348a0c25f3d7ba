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

_NEG_INF = float("-inf")


@functools.partial(jax.jit, static_argnames=("scale", "sliding_window",
                                             "logit_soft_cap"))
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
) -> jax.Array:
    """Causal self-attention within the current chunk only (no prefix)."""
    batch, t, num_q_heads, head_dim = q.shape
    num_kv_heads = k.shape[2]
    group = num_q_heads // num_kv_heads

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
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgqk,bkhd->bqhgd", p, vf)
    return o.reshape(batch, t, num_q_heads, head_dim).astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "sliding_window",
                                             "logit_soft_cap"))
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

    kpos = positions[:, None, :]
    valid_k = jnp.arange(t)[None, None, :] < seq_lens[:, None, None]
    cur_mask = (kpos <= qpos) & valid_k
    if sliding_window > 0:
        cur_mask &= kpos > (qpos - sliding_window)
    s_cur = jnp.where(cur_mask[:, None, None, :, :], s_cur, _NEG_INF)

    s = jnp.concatenate([s_pre, s_cur], axis=-1)
    p = jax.nn.softmax(s, axis=-1)
    p_pre, p_cur = p[..., :ctx_t], p[..., ctx_t:]
    o = (jnp.einsum("bhgqk,bhkd->bqhgd", p_pre, vp) +
         jnp.einsum("bhgqk,bkhd->bqhgd", p_cur, vf))
    return o.reshape(batch, t, num_q_heads, head_dim).astype(q.dtype)
