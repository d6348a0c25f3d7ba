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


_ACTIVE_SP_AXIS = None


class sp_prefill_scope:
    """Trace-time marker: while active, model attention layers route
    single-chunk prefill through :func:`ring_prefill_attention` over
    ``axis_name`` instead of the local flash kernel.  Tracing is
    single-threaded, so a module global is sufficient (the pattern the
    LoRA scope uses)."""

    def __init__(self, axis_name: str = SP_AXIS):
        self.axis_name = axis_name

    def __enter__(self):
        global _ACTIVE_SP_AXIS
        self._prev = _ACTIVE_SP_AXIS
        _ACTIVE_SP_AXIS = self.axis_name
        return self

    def __exit__(self, *exc):
        global _ACTIVE_SP_AXIS
        _ACTIVE_SP_AXIS = self._prev
        return False


def active_sp_axis():
    return _ACTIVE_SP_AXIS


def ring_prefill_attention(q, k, v, seq_lens, *, axis_name=SP_AXIS,
                           scale=None):
    """Engine-layout ring attention for a sequence-sharded prefill chunk.

    Runs INSIDE the runner's shard_map: every array is the local shard.
      q:        (B, Tl, Hq, d) — queries for this device's token slice
      k, v:     (B, Tl, Hkv, d)
      seq_lens: (B,) int32 GLOBAL valid token count of the chunk (the
                padded global length is Tl * sp).
    Causality and padding are enforced with global token indices: device
    ``i`` owns tokens [i*Tl, (i+1)*Tl); a key is attendable iff its
    global index <= the query's AND < seq_lens[b].  K/V chunks rotate
    around the ring via ppermute (ICI neighbour hops) exactly as
    :func:`ring_attention_body`; fully-masked folds are kept SPMD-uniform
    and neutralized with a -1e30 floor on the running max.
    """
    sp = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, tl, hq, d = q.shape
    hkv = k.shape[2]
    assert hq % hkv == 0, (hq, hkv)
    g = hq // hkv
    if scale is None:
        scale = 1.0 / (d ** 0.5)

    # (B, Hkv, g, Tl, d) query / (B, Hkv, Tl, d) key layouts.
    qf = (q.astype(jnp.float32) * scale).reshape(b, tl, hkv, g, d)
    qf = qf.transpose(0, 2, 3, 1, 4).astype(q.dtype)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    q_pos = idx * tl + jax.lax.iota(jnp.int32, tl)          # (Tl,) global

    def fold(carry, kc, vc, chunk_idx):
        m, l, acc = carry
        s = jnp.einsum("bhgqd,bhkd->bhgqk", qf, kc,
                       preferred_element_type=jnp.float32)
        k_pos = chunk_idx * tl + jax.lax.iota(jnp.int32, tl)
        mask = (q_pos[:, None] >= k_pos[None, :])[None] & \
            (k_pos[None, None, :] < seq_lens[:, None, None])
        s = jnp.where(mask[:, None, None], s, _NEG_INF)
        # Floor keeps exp(s - m_new) finite when a fold is fully masked.
        m_new = jnp.maximum(m, jnp.maximum(
            jnp.max(s, axis=-1, keepdims=True), _NEG_INF))
        p = jnp.exp(s - m_new)
        p = jnp.where(mask[:, None, None], p, 0.0)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha[..., 0][..., None] + jnp.einsum(
            "bhgqk,bhkd->bhgqd", p.astype(vc.dtype), vc,
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((b, hkv, g, tl, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, hkv, g, tl, 1), jnp.float32)
    acc0 = jnp.zeros((b, hkv, g, tl, d), jnp.float32)
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    def hop(h, state):
        kc, vc, carry = state
        chunk_idx = jax.lax.rem(idx - h + sp, sp)
        carry = fold(carry, kc, vc, chunk_idx)
        kc = jax.lax.ppermute(kc, axis_name, perm)
        vc = jax.lax.ppermute(vc, axis_name, perm)
        return kc, vc, carry

    _, _, (m, l, acc) = jax.lax.fori_loop(0, sp, hop, (kt, vt,
                                                       (m0, l0, acc0)))
    out = acc / jnp.maximum(l, 1e-30)                 # (B, Hkv, g, Tl, d)
    return out.transpose(0, 3, 1, 2, 4).reshape(b, tl, hq, d).astype(
        q.dtype)


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
