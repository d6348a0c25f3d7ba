"""NM sparsity formats: sparse_w16a16 (unstructured) and
semi_structured_sparse_w16a16 (2:4).

Reference: vllm/model_executor/layers/sparsity/{sparse_w16a16.py:16,
semi_structured_sparse_w16a16.py} + sparse_w16a16_linear_method.py:61-109
(magic_wand dispatch). TPU mapping: 2:4 uses the Pallas sparse GEMM
(ops/sparse_gemm.py); unstructured keeps compressed storage at rest and
dense compute (the reference's decompress fallback :105).
"""
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nmvllm_tpu.ops.sparse_gemm import (compress_24, decompress_24,
                                        sparse24_matmul)
from nmvllm_tpu.parallel.mesh import TP_AXIS
from nmvllm_tpu.quantization.base import LinearMethodBase
from nmvllm_tpu.sparsity import register_sparsity
from nmvllm_tpu.sparsity.base import SparsityConfig


class Sparse24LinearMethod(LinearMethodBase):
    """2:4 semi-structured W16A16 (optionally W4A16-2:4 later)."""

    def __init__(self, bits: int = 16, group_size: int = -1):
        self.bits = bits
        self.group_size = group_size

    def create_weights(self, rng, in_features: int, out_features: int,
                       params_dtype) -> Dict[str, Any]:
        w = jax.random.normal(rng, (in_features, out_features),
                              jnp.float32) * (in_features**-0.5)
        v0, v1, meta = compress_24(w.astype(params_dtype))
        return {"v0": v0, "v1": v1, "meta": meta}

    def apply(self, params: Dict[str, Any], x, bias=None):
        orig_shape = x.shape
        x2 = x.reshape(-1, orig_shape[-1])
        y = sparse24_matmul(x2, params["v0"], params["v1"], params["meta"])
        y = y.reshape(*orig_shape[:-1], -1)
        if bias is not None:
            y = y + bias
        return y

    def param_specs(self, shard: str) -> Dict[str, P]:
        if shard == "column":
            spec = P(None, TP_AXIS)
        elif shard == "row":
            spec = P(TP_AXIS, None)
        else:
            spec = P()
        return {"v0": spec, "v1": spec, "meta": spec}

    def process_weights(self, params: Dict[str, Any]) -> Dict[str, Any]:
        # Dense checkpoint tensor arrives as 'weight': compress it
        # (magic_wand LazyCompressedParameter post-load compression).
        if "weight" in params:
            v0, v1, meta = compress_24(params.pop("weight"))
            params.update({"v0": v0, "v1": v1, "meta": meta})
        return params


class UnstructuredSparseLinearMethod(LinearMethodBase):
    """sparse_w16a16: unstructured sparsity. Compute stays dense on TPU
    (no hardware win); storage stays dense in this implementation."""

    def create_weights(self, rng, in_features, out_features, params_dtype):
        w = jax.random.normal(rng, (in_features, out_features),
                              jnp.float32) * (in_features**-0.5)
        # Random 50% magnitude pruning for parity with test checkpoints.
        w = jnp.where(jnp.abs(w) > jnp.median(jnp.abs(w)), w, 0.0)
        return {"weight": w.astype(params_dtype)}

    def apply(self, params, x, bias=None):
        y = jnp.dot(x, params["weight"],
                    preferred_element_type=jnp.float32).astype(x.dtype)
        if bias is not None:
            y = y + bias
        return y

    def param_specs(self, shard: str):
        if shard == "column":
            return {"weight": P(None, TP_AXIS)}
        if shard == "row":
            return {"weight": P(TP_AXIS, None)}
        return {"weight": P()}


@register_sparsity("sparse_w16a16")
class SparseW16A16Config(SparsityConfig):

    @classmethod
    def get_name(cls) -> str:
        return "sparse_w16a16"

    def get_linear_method(self, layer_name: str = ""):
        return UnstructuredSparseLinearMethod()


@register_sparsity("semi_structured_sparse_w16a16")
class SemiStructuredSparseW16A16Config(SparsityConfig):

    @classmethod
    def get_name(cls) -> str:
        return "semi_structured_sparse_w16a16"

    def get_linear_method(self, layer_name: str = ""):
        return Sparse24LinearMethod()
