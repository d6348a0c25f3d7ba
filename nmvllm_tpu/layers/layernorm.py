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


def layer_norm(x: jax.Array, weight: Optional[jax.Array],
               bias: Optional[jax.Array], eps: float,
               residual: Optional[jax.Array] = None):
    orig_dtype = x.dtype
    if residual is not None:
        x = x.astype(jnp.float32) + residual.astype(jnp.float32)
        residual = x.astype(orig_dtype)
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean)**2, axis=-1, keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    if weight is not None:
        out = out * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    out = out.astype(orig_dtype)
    if residual is not None:
        return out, residual
    return out


class LayerNorm(Module):
    """Mean-centering LayerNorm (GPT/OPT/StableLM/Phi families). Same
    call interface as RMSNorm (optional fused residual add);
    ``elementwise_affine=False`` gives OLMo's non-parametric variant."""

    def __init__(self, hidden_size: int, eps: float = 1e-5,
                 params_dtype=jnp.bfloat16, bias: bool = True,
                 elementwise_affine: bool = True):
        self.hidden_size = hidden_size
        self.eps = eps
        self.params_dtype = params_dtype
        self.bias = bias and elementwise_affine
        self.elementwise_affine = elementwise_affine

    def init(self, rng):
        p = {}
        if self.elementwise_affine:
            p["weight"] = jnp.ones((self.hidden_size,), self.params_dtype)
            if self.bias:
                p["bias"] = jnp.zeros((self.hidden_size,),
                                      self.params_dtype)
        return p

    def specs(self):
        p = {}
        if self.elementwise_affine:
            p["weight"] = P()
            if self.bias:
                p["bias"] = P()
        return p

    def __call__(self, params, x, residual=None):
        w = params.get("weight") if self.elementwise_affine else None
        b = params.get("bias") if self.bias else None
        return layer_norm(x, w, b, self.eps, residual)


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


def finalize_norm(norm, params, x, residual):
    """Final-model-norm helper: layers that fused the residual add into
    their kernels (llama.py epilogue_add path) hand back ``residual=None``
    — the stream is already complete and the norm runs without the fused
    add."""
    if residual is None:
        return norm(params, x)
    out, _ = norm(params, x, residual)
    return out
