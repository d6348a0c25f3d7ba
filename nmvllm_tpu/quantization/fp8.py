"""FP8 W8A8 quantization.

Reference: vllm quantization/fp8.py:35 (Fp8Config, Fp8LinearMethod:92,
Fp8KVCacheMethod:84) + csrc/quantization/fp8. TPU mapping: weights are
stored float8_e4m3fn with a per-tensor (or per-channel) scale; v5e has no
FP8 MXU, so compute upcasts to bf16 — the win is the halved weight
bandwidth, exactly like the reference's fp8-Marlin fallback for pre-FP8
GPUs (fp8.py:114-118). FP8 KV-cache storage is handled by the cache dtype +
per-layer k/v scales (worker/cache.py, ops/paged_attention.py).
"""
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nmvllm_tpu.parallel.mesh import TP_AXIS
from nmvllm_tpu.quantization import register_quantization
from nmvllm_tpu.quantization.base import (LinearMethodBase,
                                          QuantizationConfig)

_FP8_MAX = 448.0  # e4m3fn


def quantize_fp8(w: jax.Array, scale: Optional[jax.Array] = None):
    """Per-tensor FP8 quantization (reference static/dynamic_scaled_fp8_quant,
    csrc/quantization/fp8/common.cu)."""
    if scale is None:
        scale = jnp.max(jnp.abs(w.astype(jnp.float32))) / _FP8_MAX
        scale = jnp.maximum(scale, 1e-12)
    q = (w.astype(jnp.float32) / scale).astype(jnp.float8_e4m3fn)
    return q, scale


class Fp8LinearMethod(LinearMethodBase):

    def __init__(self, activation_scheme: str = "dynamic"):
        self.activation_scheme = activation_scheme

    def create_weights(self, rng, in_features: int, out_features: int,
                       params_dtype) -> Dict[str, Any]:
        w = jax.random.normal(rng, (in_features, out_features),
                              jnp.float32) * (in_features**-0.5)
        q, scale = quantize_fp8(w)
        return {"weight": q,
                "weight_scale": jnp.asarray(scale, jnp.float32)}

    def apply(self, params: Dict[str, Any], x, bias=None):
        w = params["weight"].astype(x.dtype)
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        y = (y * params["weight_scale"]).astype(x.dtype)
        if bias is not None:
            y = y + bias
        return y

    def param_specs(self, shard: str) -> Dict[str, P]:
        if shard == "column":
            wspec = P(None, TP_AXIS)
        elif shard == "row":
            wspec = P(TP_AXIS, None)
        else:
            wspec = P()
        return {"weight": wspec, "weight_scale": P()}

    def load_weight_shapes(self, in_features, out_features):
        return {"weight": (in_features, out_features), "weight_scale": ()}


@register_quantization("fp8")
class Fp8Config(QuantizationConfig):

    def __init__(self, is_checkpoint_fp8_serialized: bool = False,
                 activation_scheme: str = "dynamic"):
        self.is_checkpoint_fp8_serialized = is_checkpoint_fp8_serialized
        self.activation_scheme = activation_scheme

    @classmethod
    def get_name(cls) -> str:
        return "fp8"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "Fp8Config":
        quant_method = config.get("quant_method", "")
        return cls(is_checkpoint_fp8_serialized=("fp8" in quant_method),
                   activation_scheme=config.get("activation_scheme",
                                                "dynamic"))

    def get_linear_method(self, layer_name: str = ""):
        return Fp8LinearMethod(self.activation_scheme)
