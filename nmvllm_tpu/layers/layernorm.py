"""RMSNorm (+ fused residual add).

Reference: vllm/model_executor/layers/layernorm.py:10 (RMSNorm,
fused_add_rms_norm CUDA kernel csrc/layernorm_kernels.cu). On TPU this is a
plain jnp expression — XLA fuses the normalize + scale (+ residual add) into
neighbouring ops, so no Pallas kernel is needed (SURVEY.md §2.2).
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from nmvllm_tpu.layers.module import Module
from jax.sharding import PartitionSpec as P


def rms_norm(x: jax.Array, weight: jax.Array, eps: float,
             residual: Optional[jax.Array] = None):
    orig_dtype = x.dtype
    if residual is not None:
        x = x.astype(jnp.float32) + residual.astype(jnp.float32)
        residual = x.astype(orig_dtype)
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    out = (out * weight.astype(jnp.float32)).astype(orig_dtype)
    if residual is not None:
        return out, residual
    return out


class RMSNorm(Module):
    def __init__(self, hidden_size: int, eps: float = 1e-6,
                 params_dtype=jnp.bfloat16, zero_centered: bool = False):
        self.hidden_size = hidden_size
        self.eps = eps
        self.params_dtype = params_dtype
        # Gemma stores (weight - 1) and adds 1 at runtime.
        self.zero_centered = zero_centered

    def init(self, rng):
        return {"weight": jnp.ones((self.hidden_size,), self.params_dtype)}

    def specs(self):
        return {"weight": P()}

    def __call__(self, params, x, residual=None):
        w = params["weight"]
        if self.zero_centered:
            w = w.astype(jnp.float32) + 1.0
        return rms_norm(x, w, self.eps, residual)
