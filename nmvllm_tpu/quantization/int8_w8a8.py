"""INT8 W8A8 linear method — native int8 MXU path.

Reference: the compressed-tensors W8A8 schemes (static-tensor and
dynamic-per-token activation quant, compressed_tensors.py:94-130) backed by
CUTLASS scaled_mm (csrc/quantization/cutlass_w8a8) and the NM int8 quant
kernels (csrc/quantization/compressed_tensors/int8_quant_kernels.cu).

TPU mapping: v5e's MXU multiplies int8×int8 → int32 natively, so this is the
*fastest* quantized path on TPU: dynamic per-token absmax quantization of
activations (an XLA-fused reduction+scale) feeding an int8 dot_general, with
the (x_scale ⊗ w_scale) epilogue folded into the output scaling.
"""
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nmvllm_tpu.parallel.mesh import TP_AXIS
from nmvllm_tpu.quantization.base import LinearMethodBase


def quantize_int8_per_token(x: jax.Array):
    """(M, K) -> int8 values + per-row scales (dynamic_scaled_int8_quant)."""
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-10)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -128, 127)
    return q.astype(jnp.int8), scale


def quantize_int8_per_channel(w: jax.Array):
    """(K, N) weight -> int8 + per-column scale (N,)."""
    absmax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0, keepdims=True)
    scale = jnp.maximum(absmax / 127.0, 1e-10)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -128, 127)
    return q.astype(jnp.int8), scale[0]


class Int8W8A8LinearMethod(LinearMethodBase):
    """Dynamic-per-token activations × per-channel int8 weights."""

    def __init__(self, static_input_scale: bool = False):
        self.static_input_scale = static_input_scale

    def create_weights(self, rng, in_features: int, out_features: int,
                       params_dtype) -> Dict[str, Any]:
        w = jax.random.normal(rng, (in_features, out_features),
                              jnp.float32) * (in_features**-0.5)
        q, scale = quantize_int8_per_channel(w)
        params = {"weight": q, "weight_scale": scale.astype(jnp.float32)}
        if self.static_input_scale:
            params["input_scale"] = jnp.asarray(1.0, jnp.float32)
        return params

    def apply(self, params: Dict[str, Any], x, bias=None):
        orig_shape = x.shape
        x2 = x.reshape(-1, orig_shape[-1])
        if self.static_input_scale and "input_scale" in params:
            scale = params["input_scale"]
            xq = jnp.clip(jnp.round(x2.astype(jnp.float32) / scale), -128,
                          127).astype(jnp.int8)
            x_scale = jnp.full((x2.shape[0], 1), scale, jnp.float32)
            acc = jax.lax.dot_general(
                xq, params["weight"], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * x_scale * \
                params["weight_scale"][None, :]
            y = y.astype(x.dtype)
        else:
            # Dynamic per-token path: Pallas single-dot int8 kernel
            # (~4.7x the XLA int8 dot_general, docs/PERF_NOTES.md).
            from nmvllm_tpu.ops.quant_matmul import int8_channel_matmul
            y = int8_channel_matmul(x2, params["weight"],
                                    params["weight_scale"])
        y = y.reshape(*orig_shape[:-1], -1)
        if bias is not None:
            y = y + bias
        return y

    def param_specs(self, shard: str) -> Dict[str, P]:
        if shard == "column":
            out = {"weight": P(None, TP_AXIS), "weight_scale": P(TP_AXIS)}
        elif shard == "row":
            out = {"weight": P(TP_AXIS, None), "weight_scale": P()}
        else:
            out = {"weight": P(), "weight_scale": P()}
        if self.static_input_scale:
            out["input_scale"] = P()
        return out

    def load_weight_shapes(self, in_features, out_features):
        return {"weight": (in_features, out_features),
                "weight_scale": (out_features,)}
