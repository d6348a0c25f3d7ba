"""TP-aware linear layers with the quantization plug-in seam.

Reference parity: vllm/model_executor/layers/linear.py (ReplicatedLinear:178,
ColumnParallelLinear:227, RowParallelLinear:690) and LinearMethodBase:69.
TPU-native re-design:
  * weights are stored K-major ``(in_features, out_features)`` so forward is
    ``x @ w`` (one transpose at load time instead of every step),
  * TP sharding is declared as a PartitionSpec per parameter (consumed by the
    engine to place weights on the mesh); forward code runs inside shard_map
    where arrays are local shards and the row-parallel all-reduce is an
    explicit ``psum`` over the ``tp`` axis riding ICI — replacing the
    reference's NCCL/custom-AR dispatch (parallel_state.py:273).
  * Q/K/V and gate/up projections are separate Linear modules: checkpoint
    ingestion and per-part TP sharding stay trivial, and on TPU the fusion
    the reference gets from merged weights is recovered by XLA scheduling
    back-to-back MXU dots on the same activation.
"""
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nmvllm_tpu.layers.module import Module
from nmvllm_tpu.parallel.mesh import TP_AXIS
from nmvllm_tpu.quantization.base import LinearMethodBase


class UnquantizedLinearMethod(LinearMethodBase):
    """Dense bf16/f32 weights; forward is a single MXU dot."""

    def create_weights(self, rng, in_features: int, out_features: int,
                       params_dtype) -> Dict[str, Any]:
        w = jax.random.normal(rng, (in_features, out_features),
                              jnp.float32) * (in_features**-0.5)
        return {"weight": w.astype(params_dtype)}

    def apply(self, params: Dict[str, Any], x, bias=None):
        y = jnp.dot(x, params["weight"],
                    preferred_element_type=jnp.float32).astype(x.dtype)
        if bias is not None:
            y = y + bias
        return y

    def param_specs(self, shard: str) -> Dict[str, P]:
        if shard == "column":
            return {"weight": P(None, TP_AXIS)}
        if shard == "row":
            return {"weight": P(TP_AXIS, None)}
        return {"weight": P()}

    def load_weight_shapes(self, in_features, out_features):
        return {"weight": (in_features, out_features)}


class Linear(Module):
    """One linear layer; ``shard`` ∈ {"none", "column", "row"}.

    column: output dim sharded over tp (no collective).
    row: input dim sharded over tp; psum on output (all-reduce over ICI).
    """

    def __init__(self, in_features: int, out_features: int,
                 bias: bool = False, *, shard: str = "none",
                 method: Optional[LinearMethodBase] = None,
                 params_dtype=jnp.bfloat16, name: str = ""):
        assert shard in ("none", "column", "row")
        self.in_features = in_features
        self.out_features = out_features
        self.use_bias = bias
        self.shard = shard
        self.method = method or UnquantizedLinearMethod()
        self.params_dtype = params_dtype
        # Fully-qualified layer name; keys LoRA adapter stacks.
        self.name = name

    def init(self, rng) -> Dict[str, Any]:
        params = self.method.create_weights(rng, self.in_features,
                                            self.out_features,
                                            self.params_dtype)
        if self.use_bias:
            params["bias"] = jnp.zeros((self.out_features,),
                                       self.params_dtype)
        return params

    def specs(self):
        specs = self.method.param_specs(self.shard)
        if self.use_bias:
            specs = dict(specs)
            specs["bias"] = P(TP_AXIS) if self.shard == "column" else P()
        return specs

    def __call__(self, params: Dict[str, Any], x, *,
                 inside_shard_map: bool = True, prologue=None, aux=None,
                 eps: float = 1e-6, epilogue_add=None):
        from nmvllm_tpu.lora.context import maybe_apply_lora
        bias = params.get("bias")
        if prologue is not None and not getattr(self.method,
                                                "supports_prologue", False):
            from nmvllm_tpu.ops.quant_matmul import apply_prologue_jnp
            x = apply_prologue_jnp(prologue, x, aux, eps)
            prologue, aux = None, None
        kw = ({"prologue": prologue, "aux": aux, "eps": eps}
              if prologue is not None else {})
        # Fused residual-add epilogue: only valid pre-psum when the
        # caller guarantees a single shard (callers gate on tp == 1 for
        # row-parallel layers — in-kernel adds would be multiplied by
        # the later cross-shard reduction otherwise).
        post_add = None
        if epilogue_add is not None:
            if getattr(self.method, "supports_prologue", False):
                kw["epilogue_add"] = epilogue_add
            else:
                post_add = epilogue_add
        if self.shard == "row":
            # Bias must be added once, after the cross-shard reduction.
            y = self.method.apply(params, x, None, **kw)
            y = maybe_apply_lora(self.name, x, y)
            if inside_shard_map:
                y = jax.lax.psum(y, TP_AXIS)
            if bias is not None:
                y = y + bias
            if post_add is not None:
                y = (y.astype(jnp.float32) +
                     post_add.astype(jnp.float32)).astype(y.dtype)
            return y
        y = self.method.apply(params, x, bias, **kw)
        y = maybe_apply_lora(self.name, x, y)
        if post_add is not None:
            y = (y.astype(jnp.float32) +
                 post_add.astype(jnp.float32)).astype(y.dtype)
        return y
