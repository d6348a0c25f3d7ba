"""Sequence-parallel (context-parallel) ring attention for long prefill.

The reference has NO sequence parallelism — long context is handled by
RoPE scaling, chunked prefill, sliding-window and blocksparse attention
(SURVEY.md §2.3 / §5). This module adds the TPU-native extra the rebuild
plans for >128k prefill: Q stays sharded along the sequence over the
``sp`` mesh axis while K/V shards rotate around the ring via
``lax.ppermute`` (ICI neighbour hops), each hop folding one chunk into a
running online-softmax accumulator — attention over the full sequence
with per-device memory O(T/sp) and perfect compute/communication overlap
(the next K/V hop rides ICI while the current chunk's dot runs on the
MXU; XLA schedules the ppermute asynchronously).

Causality: chunk ordering is known statically per hop, so a hop whose
K/V chunk lies entirely in the local queries' future contributes only a
fully-masked block; it is folded with a where() rather than skipped to
keep the program SPMD-uniform. (The classic zigzag load-balancing
variant can be layered on by permuting chunk ownership; not needed for
correctness.)
"""
import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

SP_AXIS = "sp"

_NEG_INF = float(-1e30)


def ring_attention_body(q, k, v, *, axis_name=SP_AXIS, scale=None,
                        causal=True):
    """Per-device shard_map body.

    q: (B, Hq, Tq, d) local query shard (sequence-sharded over axis_name)
    k, v: (B, Hkv, Tk, d) local key/value shards (same sharding)
    Returns the local output shard (B, Hq, Tq, d).

    GQA: Hq must be a multiple of Hkv; K/V heads broadcast over the
    query-head groups.
    """
    sp = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, hq, tq, d = q.shape
    hkv, tk = k.shape[1], k.shape[2]
    assert hq % hkv == 0, (hq, hkv)
    g = hq // hkv
    if scale is None:
        scale = 1.0 / (d ** 0.5)
    qf = (q.astype(jnp.float32) * scale).astype(q.dtype)
    q_pos = idx * tq + jax.lax.iota(jnp.int32, tq)

    def fold(carry, kv_chunk, chunk_idx):
        m, l, acc = carry
        kc, vc = kv_chunk
        # (B, Hkv, g, Tq, Tk) scores via per-kv-head batched dot.
        qg = qf.reshape(b, hkv, g, tq, d)
        s = jnp.einsum("bhgqd,bhkd->bhgqk", qg, kc,
                       preferred_element_type=jnp.float32)
        if causal:
            k_pos = chunk_idx * tk + jax.lax.iota(jnp.int32, tk)
            mask = q_pos[:, None] >= k_pos[None, :]
            s = jnp.where(mask[None, None, None], s, _NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha[..., 0][..., None] + jnp.einsum(
            "bhgqk,bhkd->bhgqd", p.astype(vc.dtype), vc,
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((b, hkv, g, tq, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, hkv, g, tq, 1), jnp.float32)
    acc0 = jnp.zeros((b, hkv, g, tq, d), jnp.float32)
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    def hop(h, state):
        kc, vc, carry = state
        # K/V chunk currently held arrived from device idx - h.
        chunk_idx = jax.lax.rem(idx - h + sp, sp)
        carry = fold(carry, (kc, vc), chunk_idx)
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return kc, vc, carry

    _, _, (m, l, acc) = jax.lax.fori_loop(0, sp, hop, (k, v, (m0, l0, acc0)))
    out = acc / jnp.maximum(l, 1e-30)
    return out.reshape(b, hq, tq, d).astype(q.dtype)


def ring_attention(q, k, v, mesh, *, scale=None, causal=True,
                   axis_name=SP_AXIS):
    """Standalone jitted entry: q (B, Hq, T, d), k/v (B, Hkv, T, d)
    GLOBAL arrays; T must divide by the mesh's ``axis_name`` size."""
    from jax.experimental.shard_map import shard_map
    spec = P(None, None, axis_name, None)
    fn = shard_map(
        functools.partial(ring_attention_body, axis_name=axis_name,
                          scale=scale, causal=causal),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_rep=False)
    return jax.jit(fn)(q, k, v)
