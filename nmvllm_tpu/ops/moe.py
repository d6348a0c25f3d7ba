"""Fused MoE: routing + grouped expert GEMM.

TPU-native replacement for the reference's Triton fused MoE
(vllm/model_executor/layers/fused_moe/fused_moe.py:19 fused_moe_kernel,
moe_align_block_size:166, csrc/moe_align_block_size_kernels.cu,
csrc/moe/topk_softmax_kernels.cu).

Design (SURVEY.md §A.2): tokens are sorted by expert (the alignment the
CUDA kernel does with moe_align_block_size) and the expert GEMMs run as a
single `jax.lax.ragged_dot` over stacked expert weights — XLA's grouped
matmul hits the MXU with one kernel per projection, replacing the tuned
Triton block configs.
"""
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def topk_softmax(gate_logits: jax.Array, top_k: int,
                 renormalize: bool = True) -> Tuple[jax.Array, jax.Array]:
    """Routing: per-token top-k experts + weights (topk_softmax_kernels.cu).

    gate_logits: (T, E) -> (weights (T, k) f32, ids (T, k) int32)
    """
    probs = jax.nn.softmax(gate_logits.astype(jnp.float32), axis=-1)
    weights, ids = jax.lax.top_k(probs, top_k)
    if renormalize:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return weights, ids.astype(jnp.int32)


def grouped_topk(gate_logits: jax.Array, top_k: int, num_expert_group: int,
                 topk_group: int,
                 renormalize: bool = True) -> Tuple[jax.Array, jax.Array]:
    """DeepSeek-V2 group-limited routing (reference fused_moe.py
    grouped_topk): experts are partitioned into ``num_expert_group``
    groups; only the ``topk_group`` groups with the highest per-group max
    score stay eligible, then ordinary top-k runs over the survivors."""
    t, e = gate_logits.shape
    probs = jax.nn.softmax(gate_logits.astype(jnp.float32), axis=-1)
    group_scores = jnp.max(
        probs.reshape(t, num_expert_group, e // num_expert_group), axis=-1)
    _, group_ids = jax.lax.top_k(group_scores, topk_group)  # (T, kg)
    group_mask = jnp.zeros((t, num_expert_group), jnp.float32).at[
        jnp.arange(t)[:, None], group_ids].set(1.0)
    score_mask = jnp.repeat(group_mask, e // num_expert_group, axis=-1)
    masked = jnp.where(score_mask > 0, probs, 0.0)
    weights, ids = jax.lax.top_k(masked, top_k)
    if renormalize:
        weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    return weights, ids.astype(jnp.int32)


def _num_experts(w) -> int:
    """Leading expert-dim size; works for bf16 stacks and A8P dicts."""
    return (w["qweight"] if isinstance(w, dict) else w).shape[0]


def _apply_moe_act(h1, activation):
    a, b = jnp.split(h1, 2, axis=-1)
    if activation == "silu":
        return jax.nn.silu(a) * b
    if activation.startswith("gelu"):
        return jax.nn.gelu(a, approximate=True) * b
    raise ValueError(f"Unsupported MoE activation {activation}")


def _expert_gemms(x_sorted, w1, w2, group_sizes, dtype, activation):
    """Both expert GEMMs over expert-sorted rows: bf16 stacks run XLA's
    ragged_dot; quantized stacks (dicts of A8P arrays — round 5) run the
    Pallas grouped W4A8 kernel so experts stream packed INT4 from HBM
    (the bf16 stacks OOMed 12-layer Mixtral INT4 at 34.6 GB,
    docs/PERF_NOTES.md round 4)."""
    from nmvllm_tpu.ops.moe_quant import is_quant_stack, ragged_quant_dot_a8p
    if is_quant_stack(w1):
        # group_size is implied by the array shapes (K // num_groups) —
        # a static int in the params pytree would not survive jit.
        g1 = (w1["qweight"].shape[1] * 8) // w1["mult"].shape[1]
        g2 = (w2["qweight"].shape[1] * 8) // w2["mult"].shape[1]
        h1 = ragged_quant_dot_a8p(x_sorted, w1, group_sizes,
                                  group_size=g1).astype(jnp.float32)
        inter = _apply_moe_act(h1, activation)
        out = ragged_quant_dot_a8p(inter.astype(dtype), w2, group_sizes,
                                   group_size=g2)
        return h1, out
    # HIGHEST precision for f32 (true-f32 grouped matmul); DEFAULT for
    # bf16 (Mosaic's ragged_dot lowering rejects bf16+HIGHEST).
    prec = (jax.lax.Precision.HIGHEST if x_sorted.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    h1 = jax.lax.ragged_dot(x_sorted, w1, group_sizes, precision=prec)
    inter = _apply_moe_act(h1, activation)
    out = jax.lax.ragged_dot(inter.astype(dtype), w2, group_sizes,
                             precision=prec)
    return h1, out


def fused_moe(
    x: jax.Array,            # (T, H) tokens
    w1: jax.Array,           # (E, H, 2I) gate+up stacked per expert —
                             #   or a dict of stacked A8P arrays
    w2: jax.Array,           # (E, I, H) down per expert (or A8P dict)
    gate_logits: jax.Array,  # (T, E)
    top_k: int,
    *,
    renormalize: bool = True,
    activation: str = "silu",
    topk_weights: Optional[jax.Array] = None,
    topk_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """Sorted ragged grouped-GEMM MoE (reference fused_experts:402).

    Pass ``topk_weights``/``topk_ids`` to override the default softmax
    top-k routing (e.g. DeepSeek-V2 grouped_topk)."""
    t, h = x.shape
    e = _num_experts(w1)
    if topk_weights is None or topk_ids is None:
        weights, ids = topk_softmax(gate_logits, top_k, renormalize)
    else:
        weights, ids = topk_weights, topk_ids

    flat_ids = ids.reshape(-1)                       # (T*k,)
    order = jnp.argsort(flat_ids)                    # stable sort by expert
    token_idx = order // top_k                       # source token per row
    x_sorted = x[token_idx]                          # (T*k, H)
    group_sizes = jnp.bincount(flat_ids, length=e)   # (E,)

    h1, out_sorted = _expert_gemms(x_sorted, w1, w2, group_sizes, x.dtype,
                                   activation)
    del h1

    # Unsort and apply routing weights; scatter-add rows back per token.
    w_sorted = weights.reshape(-1)[order]
    contrib = out_sorted.astype(jnp.float32) * w_sorted[:, None]
    out = jnp.zeros((t, h), jnp.float32).at[token_idx].add(contrib)
    return out.astype(x.dtype)


def fused_moe_ep(
    x: jax.Array,            # (T, H) tokens (replicated across the axis)
    w1_local: jax.Array,     # (E_local, H, 2I) this rank's experts
    w2_local: jax.Array,     # (E_local, I, H)
    gate_logits: jax.Array,  # (T, E_total) — gate is replicated
    top_k: int,
    *,
    axis_name: str,
    renormalize: bool = True,
    activation: str = "silu",
    topk_weights: Optional[jax.Array] = None,
    topk_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """Expert-parallel MoE (first-class EP — the reference shards experts
    by intermediate dim over TP only, fused_moe/layer.py:108-119;
    SURVEY.md §2.3 calls for EP as a mesh axis).

    TPU-native design: activations are already replicated across the tp
    axis (every rank holds the full token batch after the attention
    all-reduce), so EP needs NO all-to-all token dispatch — each rank
    computes the contributions of its LOCAL expert slice for all tokens
    (routing weights of foreign experts masked to zero) and the combine
    is the same psum the row-parallel path already performs. Each rank
    streams only E/ep of the expert weights (the EP memory/bandwidth
    win), and experts keep their full intermediate width (lane-friendly
    for many-expert models where I/tp would be tiny).

    Call INSIDE shard_map. Returns the PARTIAL local contribution — the
    caller must psum over ``axis_name`` (matching the TP path's contract).
    """
    e_local = _num_experts(w1_local)
    rank = jax.lax.axis_index(axis_name)
    lo = rank * e_local
    if topk_weights is None or topk_ids is None:
        topk_weights, topk_ids = topk_softmax(gate_logits, top_k,
                                              renormalize)
    local = (topk_ids >= lo) & (topk_ids < lo + e_local)
    w_masked = jnp.where(local, topk_weights, 0.0)
    ids_local = jnp.clip(topk_ids - lo, 0, e_local - 1).astype(jnp.int32)
    return fused_moe(x, w1_local, w2_local, gate_logits, top_k,
                     renormalize=renormalize, activation=activation,
                     topk_weights=w_masked, topk_ids=ids_local)


def fused_moe_ep_a2a(
    x: jax.Array,            # (T, H) tokens (replicated across the axis)
    w1_local: jax.Array,     # (E_local, H, 2I) this rank's experts
    w2_local: jax.Array,     # (E_local, I, H)
    gate_logits: jax.Array,  # (T, E_total) — gate is replicated
    top_k: int,
    *,
    axis_name: str,
    ep_size: int,
    renormalize: bool = True,
    activation: str = "silu",
    topk_weights: Optional[jax.Array] = None,
    topk_ids: Optional[jax.Array] = None,
) -> jax.Array:
    """Expert-parallel MoE with all-to-all token dispatch (SURVEY.md §2.3:
    "mesh axis expert, ragged all-to-all token dispatch over ICI").

    Each rank routes only its T/ep token slice, ships every row to the
    rank owning its expert (per-destination ragged counts over a dense
    ``lax.all_to_all`` transport — XLA:CPU has no ragged-all-to-all, and
    a static worst-case capacity is required anyway since inference may
    not drop tokens), computes its local experts, and ships results back.
    Returns a zero-padded (T, H) partial in which only this rank's token
    slice is populated, so the caller's existing psum over ``axis_name``
    is the combine step.

    When to use (docs/SCALING.md "EP dispatch"): with activations
    REPLICATED across the axis (this engine's TP design), the masked-
    local ``fused_moe_ep`` does the same grouped-GEMM row count with zero
    collective hops, so it wins single-slice; the a2a dispatch is the
    right pattern when the axis crosses DCN (multi-slice EP) or when
    activations are sequence-sharded. Selectable via NMVLLM_MOE_A2A=1.

    Call INSIDE shard_map. Requires T % ep_size == 0 (engine batches are
    padded to multiples of 8) and balanced expert ownership.
    """
    e_local = _num_experts(w1_local)
    t, h = x.shape
    ep = ep_size
    if t % ep != 0:
        return fused_moe_ep(x, w1_local, w2_local, gate_logits, top_k,
                            axis_name=axis_name, renormalize=renormalize,
                            activation=activation,
                            topk_weights=topk_weights, topk_ids=topk_ids)
    t_loc = t // ep
    rank = jax.lax.axis_index(axis_name)
    xs = jax.lax.dynamic_slice_in_dim(x, rank * t_loc, t_loc, 0)
    if topk_weights is None or topk_ids is None:
        gl = jax.lax.dynamic_slice_in_dim(gate_logits, rank * t_loc,
                                          t_loc, 0)
        weights, ids = topk_softmax(gl, top_k, renormalize)
    else:
        weights = jax.lax.dynamic_slice_in_dim(topk_weights, rank * t_loc,
                                               t_loc, 0)
        ids = jax.lax.dynamic_slice_in_dim(topk_ids, rank * t_loc,
                                           t_loc, 0)
    n = t_loc * top_k
    flat_ids = ids.reshape(-1)
    order = jnp.argsort(flat_ids)            # stable: groups by expert,
    ids_sorted = flat_ids[order]             # hence by destination rank
    rows = xs[order // top_k]                # (n, H)

    # Front-pack each destination's chunk into its (n, H) page of the
    # dense transport buffer; empty slots carry the e_local id sentinel
    # so they fall out of the receiver's bincount/grouping.
    dest = ids_sorted // e_local             # (n,) non-decreasing
    send_sizes = jnp.bincount(dest, length=ep)           # ragged counts
    offsets = jnp.concatenate([jnp.zeros((1,), send_sizes.dtype),
                               jnp.cumsum(send_sizes)[:-1]])
    within = jnp.arange(n) - offsets[dest]
    send_buf = jnp.zeros((ep, n, h), x.dtype).at[dest, within].set(rows)
    send_ids = jnp.full((ep, n), e_local, jnp.int32).at[dest, within].set(
        ids_sorted % e_local)
    recv = jax.lax.all_to_all(send_buf, axis_name, split_axis=0,
                              concat_axis=0, tiled=True)
    recv_ids = jax.lax.all_to_all(send_ids, axis_name, split_axis=0,
                                  concat_axis=0, tiled=True)

    # Group received rows by local expert (padding sorts last) and run
    # the same grouped GEMMs as the single-rank path.
    recv_rows = recv.reshape(ep * n, h)
    ids2_flat = recv_ids.reshape(ep * n)
    order2 = jnp.argsort(ids2_flat)
    rows2 = recv_rows[order2]
    ids2 = ids2_flat[order2]
    group_sizes = jnp.bincount(ids2, length=e_local)
    _, out2 = _expert_gemms(rows2, w1_local, w2_local, group_sizes,
                            x.dtype, activation)

    # Undo the expert sort (padding rows may hold ragged_dot garbage —
    # their slots are never read back by any sender) and return chunks
    # to their senders in the original packing.
    back = jnp.zeros((ep * n, h), out2.dtype).at[order2].set(out2)
    ret = jax.lax.all_to_all(back.reshape(ep, n, h), axis_name,
                             split_axis=0, concat_axis=0, tiled=True)
    out_rows = ret[dest, within]             # (n, H), expert-sorted order

    w_sorted = weights.reshape(-1)[order]
    contrib = out_rows.astype(jnp.float32) * w_sorted[:, None]
    out_loc = jnp.zeros((t_loc, h), jnp.float32).at[order // top_k].add(
        contrib)
    out = jax.lax.dynamic_update_slice_in_dim(
        jnp.zeros((t, h), jnp.float32), out_loc, rank * t_loc, 0)
    return out.astype(x.dtype)


def interleave_w1_for_tp(w1, tp: int):
    """Rearrange a stacked gate|up expert tensor for TP sharding.

    ``w1`` is (E, H, 2I) with gate in [..., :I] and up in [..., I:]. Under
    a plain last-dim shard each rank would get a contiguous 2I/tp slice —
    pure-gate or pure-up columns — breaking the local ``split(h1, 2)`` in
    ``fused_moe``. This stores the SHARD-INTERLEAVED layout
    [g_0|u_0|g_1|u_1|...] so rank r's slice is exactly [gate_r|up_r].
    Identity for tp==1. Works on numpy or jax arrays.
    """
    if tp <= 1:
        return w1
    if isinstance(w1, dict):
        # A8P stacks: every array has the gate|up dim LAST — interleave
        # each identically (columns are independent in the packed
        # layout, so this is exact).
        return {k: interleave_w1_for_tp(v, tp) for k, v in w1.items()}
    i2 = w1.shape[-1]
    i = i2 // 2
    assert i % tp == 0, (i, tp)
    per = i // tp
    import numpy as _np
    xp = jnp if isinstance(w1, jax.Array) else _np
    gate, up = w1[..., :i], w1[..., i:]
    parts = []
    for r in range(tp):
        parts.append(gate[..., r * per:(r + 1) * per])
        parts.append(up[..., r * per:(r + 1) * per])
    return xp.concatenate(parts, axis=-1)


def moe_ep_enabled(num_experts: int, tp_size: int) -> bool:
    """Whether this MoE block runs expert-parallel (config + divisibility)."""
    from nmvllm_tpu.parallel.mesh import expert_parallel_size
    if expert_parallel_size() <= 1 or tp_size <= 1:
        return False
    assert num_experts % tp_size == 0, (
        f"expert_parallel requires num_experts ({num_experts}) % tp "
        f"({tp_size}) == 0")
    return True


def moe_expert_specs(ep: bool, quant: bool = False):
    """(w1_spec, w2_spec) for the stacked expert tensors. With
    ``quant`` (A8P dict stacks), returns dicts of per-array specs: EP
    shards the expert dim of every array; TP shards the OUTPUT dim
    (last) of w1 arrays and the K dim of w2's qweight/mult/zeros
    (scales stay replicated for row-parallel — partial sums carry full
    per-channel scales)."""
    from jax.sharding import PartitionSpec as P

    from nmvllm_tpu.parallel.mesh import TP_AXIS
    if not quant:
        if ep:
            return P(TP_AXIS, None, None), P(TP_AXIS, None, None)
        return P(None, None, TP_AXIS), P(None, TP_AXIS, None)
    keys = ("qweight", "mult", "scales", "zeros")
    if ep:
        espec = P(TP_AXIS, None, None)
        return ({k: espec for k in keys}, {k: espec for k in keys})
    w1s = {k: P(None, None, TP_AXIS) for k in keys}
    w2s = {k: P(None, TP_AXIS, None) for k in keys}
    w2s["scales"] = P()
    return w1s, w2s


def moe_apply(x, w1, w2, gate_logits, top_k, *, ep: bool, axis_name: str,
              ep_size: int = 0, **kwargs) -> jax.Array:
    """Dispatch TP-sharded vs expert-parallel MoE; caller psums the
    returned partial over ``axis_name`` either way."""
    if ep:
        from nmvllm_tpu import envs
        if ep_size <= 0:
            from nmvllm_tpu.parallel.mesh import expert_parallel_size
            ep_size = expert_parallel_size()
        if envs.NMVLLM_MOE_A2A and ep_size > 1:
            return fused_moe_ep_a2a(x, w1, w2, gate_logits, top_k,
                                    axis_name=axis_name, ep_size=ep_size,
                                    **kwargs)
        return fused_moe_ep(x, w1, w2, gate_logits, top_k,
                            axis_name=axis_name, **kwargs)
    return fused_moe(x, w1, w2, gate_logits, top_k, **kwargs)


def fused_moe_reference(x, w1, w2, gate_logits, top_k, *,
                        renormalize: bool = True,
                        activation: str = "silu") -> jax.Array:
    """Dense one-hot reference: every expert computes every token."""
    weights, ids = topk_softmax(gate_logits, top_k, renormalize)
    t, h = x.shape
    e = w1.shape[0]
    # (T, E) combined routing weight.
    combine = jnp.zeros((t, e), jnp.float32).at[
        jnp.arange(t)[:, None], ids].add(weights)
    h1 = jnp.einsum("th,ehi->tei", x.astype(jnp.float32),
                    w1.astype(jnp.float32),
                    precision=jax.lax.Precision.HIGHEST)
    a, b = jnp.split(h1, 2, axis=-1)
    if activation == "silu":
        inter = jax.nn.silu(a) * b
    else:
        inter = jax.nn.gelu(a, approximate=True) * b
    per_expert = jnp.einsum("tei,eih->teh", inter, w2.astype(jnp.float32),
                            precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("teh,te->th", per_expert, combine)
    return out.astype(x.dtype)
