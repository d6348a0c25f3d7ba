"""Batched LoRA application (replaces vllm/lora/layers.py wrappers +
csrc/punica bgmv kernels).

``lora_apply(x, a_stack, b_stack, indices, scaling)`` computes per-row
adapter deltas: row i uses adapter slot indices[i] (slot 0 is reserved as
the zero/no-LoRA adapter). On TPU this is a row-gather of the thin A/B
factors plus two small einsums — fully XLA-fused, no custom kernel needed
at decode batch sizes.
"""
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclass
class LoRAConfig:
    max_loras: int = 4
    max_lora_rank: int = 16
    lora_dtype: str = "bfloat16"


class LoRALayerWeights:
    """One adapter's weights for one target layer
    (reference lora/lora.py LoRALayerWeights)."""

    def __init__(self, module_name: str, rank: int, alpha: float,
                 a: jax.Array, b: jax.Array):
        self.module_name = module_name
        self.rank = rank
        self.alpha = alpha
        self.a = a  # (K, r)
        self.b = b  # (r, N)

    @property
    def scaling(self) -> float:
        return self.alpha / self.rank


def make_lora_stacks(max_loras: int, in_features: int, out_features: int,
                     rank: int, dtype=jnp.bfloat16
                     ) -> Tuple[jax.Array, jax.Array]:
    """Zero-initialized adapter slot stacks (slot 0 = no-LoRA)."""
    a = jnp.zeros((max_loras + 1, in_features, rank), dtype)
    b = jnp.zeros((max_loras + 1, rank, out_features), dtype)
    return a, b


def set_lora_slot(a_stack: jax.Array, b_stack: jax.Array, slot: int,
                  lora: LoRALayerWeights) -> Tuple[jax.Array, jax.Array]:
    """Install an adapter into slot `slot` (1-based; 0 stays zero)."""
    assert slot >= 1
    r = lora.rank
    a = a_stack.at[slot, :, :r].set(
        lora.a.astype(a_stack.dtype) * lora.scaling)
    b = b_stack.at[slot, :r, :].set(lora.b.astype(b_stack.dtype))
    return a, b


def clear_lora_slot(a_stack: jax.Array, b_stack: jax.Array,
                    slot: int) -> Tuple[jax.Array, jax.Array]:
    return (a_stack.at[slot].set(0), b_stack.at[slot].set(0))


def lora_apply(x: jax.Array, a_stack: jax.Array, b_stack: jax.Array,
               indices: jax.Array) -> jax.Array:
    """Per-row LoRA delta: out[i] = (x[i] @ A[idx[i]]) @ B[idx[i]].

    x: (T, K); a_stack: (L+1, K, r); b_stack: (L+1, r, N); indices: (T,)
    int32 slot per row (0 = none). Returns (T, N) delta in x.dtype.
    (The bgmv dispatch analogue, vllm/_custom_ops.py:471.)
    """
    a = a_stack[indices]                        # (T, K, r)
    b = b_stack[indices]                        # (T, r, N)
    xa = jnp.einsum("tk,tkr->tr", x.astype(jnp.float32),
                    a.astype(jnp.float32),
                    precision=jax.lax.Precision.HIGHEST)
    delta = jnp.einsum("tr,trn->tn", xa, b.astype(jnp.float32),
                      precision=jax.lax.Precision.HIGHEST)
    return delta.astype(x.dtype)
