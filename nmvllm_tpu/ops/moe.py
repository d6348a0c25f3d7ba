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


def fused_moe(
    x: jax.Array,            # (T, H) tokens
    w1: jax.Array,           # (E, H, 2I) gate+up stacked per expert
    w2: jax.Array,           # (E, I, H) down per expert
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
    e = w1.shape[0]
    if topk_weights is None or topk_ids is None:
        weights, ids = topk_softmax(gate_logits, top_k, renormalize)
    else:
        weights, ids = topk_weights, topk_ids

    flat_ids = ids.reshape(-1)                       # (T*k,)
    order = jnp.argsort(flat_ids)                    # stable sort by expert
    token_idx = order // top_k                       # source token per row
    x_sorted = x[token_idx]                          # (T*k, H)
    group_sizes = jnp.bincount(flat_ids, length=e)   # (E,)

    # HIGHEST precision for f32 (true-f32 grouped matmul); DEFAULT for
    # bf16 (Mosaic's ragged_dot lowering rejects bf16+HIGHEST).
    prec = (jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    h1 = jax.lax.ragged_dot(x_sorted, w1, group_sizes,
                            precision=prec)  # (T*k, 2I)
    a, b = jnp.split(h1, 2, axis=-1)
    if activation == "silu":
        inter = jax.nn.silu(a) * b
    elif activation.startswith("gelu"):
        inter = jax.nn.gelu(a, approximate=True) * b
    else:
        raise ValueError(f"Unsupported MoE activation {activation}")
    out_sorted = jax.lax.ragged_dot(inter.astype(x.dtype), w2, group_sizes,
                                    precision=prec)

    # Unsort and apply routing weights; scatter-add rows back per token.
    w_sorted = weights.reshape(-1)[order]
    contrib = out_sorted.astype(jnp.float32) * w_sorted[:, None]
    out = jnp.zeros((t, h), jnp.float32).at[token_idx].add(contrib)
    return out.astype(x.dtype)


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
