"""Trace-time LoRA plumbing.

The model's Linear layers are pure functions of (params, x); multi-LoRA
needs two extra traced inputs (per-token slot indices + per-layer adapter
stacks) without changing every layer signature. The runner wraps each step
trace in ``lora_scope(indices, stacks)``; ``Linear.__call__`` consults the
active scope by layer name at TRACE time — the resulting jaxpr closes over
the traced arrays, so steps stay pure and jit-cacheable.

(Replaces the reference's wrapper-module approach, vllm/lora/layers.py,
where every parallel layer has a LoRA twin class.)
"""
import contextlib
from typing import Dict, Optional, Tuple

import jax

_ACTIVE: Optional[Tuple[jax.Array, Dict[str, Tuple[jax.Array,
                                                   jax.Array]]]] = None


@contextlib.contextmanager
def lora_scope(indices, stacks: Dict[str, Tuple]):
    """Activate LoRA for the duration of a step-function trace."""
    global _ACTIVE
    prev = _ACTIVE
    _ACTIVE = (indices, stacks)
    try:
        yield
    finally:
        _ACTIVE = prev


def lora_active() -> bool:
    """Whether a LoRA scope is active for the current step trace."""
    return _ACTIVE is not None


def maybe_apply_lora(layer_name: str, x, y):
    """Add the batched adapter delta for `layer_name` if a scope is active.

    x: (..., K) layer input; y: (..., N) base output. Indices are per-row
    over the leading batch dim.
    """
    if _ACTIVE is None or not layer_name:
        return y
    indices, stacks = _ACTIVE
    entry = stacks.get(layer_name)
    if entry is None:
        return y
    from nmvllm_tpu.lora.layers import lora_apply
    a_stack, b_stack = entry
    orig_shape = y.shape
    k = x.shape[-1]
    x2 = x.reshape(-1, k)
    # Broadcast row indices over a flattened (batch*seq) token dim.
    tokens_per_row = x2.shape[0] // indices.shape[0]
    import jax.numpy as jnp
    idx = jnp.repeat(indices, tokens_per_row)
    delta = lora_apply(x2, a_stack, b_stack, idx)
    return (y.reshape(-1, orig_shape[-1]) + delta).reshape(orig_shape)
