"""compressed-tensors (Neural Magic checkpoint schema) support.

Reference: vllm/model_executor/layers/quantization/compressed_tensors/
(CompressedTensorsConfig compressed_tensors.py:19, scheme dispatch :94-130,
schemes/compressed_tensors_{w8a8,wNa16,w4a16_24}.py). Parses the HF
``quantization_config.config_groups`` schema and dispatches per-layer:
  * W8A8 int8 (static or dynamic activations)  -> Int8W8A8LinearMethod
  * WNA16 group/channel weight-only            -> WNA16LinearMethod
  * W4A16Sparse24 (2:4 + INT4)                 -> Sparse24WNA16 method
"""
import re
from typing import Any, Dict, List, Optional

from nmvllm_tpu.quantization import register_quantization
from nmvllm_tpu.quantization.base import QuantizationConfig
from nmvllm_tpu.quantization.int8_w8a8 import Int8W8A8LinearMethod
from nmvllm_tpu.quantization.wNa16 import WNA16LinearMethod


class QuantizationArgs:
    """One target group's args (compressed_tensors/utils.py)."""

    def __init__(self, cfg: Dict[str, Any]):
        self.num_bits = int(cfg.get("num_bits", 8))
        self.strategy = cfg.get("strategy", "tensor")
        self.symmetric = bool(cfg.get("symmetric", True))
        self.dynamic = bool(cfg.get("dynamic", False))
        self.group_size = cfg.get("group_size") or -1
        self.type = cfg.get("type", "int")


class _Group:
    def __init__(self, targets: List[str],
                 weights: Optional[QuantizationArgs],
                 input_activations: Optional[QuantizationArgs],
                 sparsity_structure: Optional[str] = None):
        self.targets = targets
        self.weights = weights
        self.input_activations = input_activations
        self.sparsity_structure = sparsity_structure

    def matches(self, layer_name: str) -> bool:
        leaf = layer_name.rsplit(".", 1)[-1]
        for t in self.targets:
            t = t.strip()
            if t == "Linear":
                return True
            if t.startswith("re:"):
                if re.search(t[3:], layer_name):
                    return True
            elif t == leaf or t in layer_name:
                return True
        return False


@register_quantization("compressed-tensors")
@register_quantization("compressed_tensors")
@register_quantization("sparseml")
class CompressedTensorsConfig(QuantizationConfig):

    def __init__(self, groups: List[_Group],
                 ignore: Optional[List[str]] = None):
        self.groups = groups
        self.ignore = ignore or []

    @classmethod
    def get_name(cls) -> str:
        return "compressed-tensors"

    @classmethod
    def from_config(cls, config: Dict[str, Any]
                    ) -> "CompressedTensorsConfig":
        groups = []
        for _, group_cfg in (config.get("config_groups") or {}).items():
            weights = group_cfg.get("weights")
            inputs = group_cfg.get("input_activations")
            groups.append(
                _Group(targets=group_cfg.get("targets", ["Linear"]),
                       weights=QuantizationArgs(weights) if weights else None,
                       input_activations=(QuantizationArgs(inputs)
                                          if inputs else None),
                       sparsity_structure=group_cfg.get(
                           "sparsity_structure")))
        if not groups:
            # Default: INT8 W8A8 dynamic everywhere.
            groups = [_Group(["Linear"],
                             QuantizationArgs({"num_bits": 8}),
                             QuantizationArgs({"num_bits": 8,
                                               "dynamic": True}))]
        return cls(groups, ignore=config.get("ignore"))

    def _scheme_for(self, layer_name: str):
        for pat in self.ignore:
            pat = pat.strip()
            if pat.startswith("re:"):
                if re.search(pat[3:], layer_name):
                    return None
            elif pat and pat in layer_name:
                return None
        for group in self.groups:
            if group.matches(layer_name):
                return group
        return None

    def get_linear_method(self, layer_name: str = ""):
        from nmvllm_tpu.layers.linear import UnquantizedLinearMethod
        group = self._scheme_for(layer_name)
        if group is None or group.weights is None:
            return UnquantizedLinearMethod()
        w = group.weights
        acts = group.input_activations
        if group.sparsity_structure == "2:4" and acts is None:
            from nmvllm_tpu.sparsity.sparse_w16a16 import (
                Sparse24LinearMethod)
            return Sparse24LinearMethod(bits=w.num_bits,
                                        group_size=w.group_size)
        if acts is not None and acts.num_bits == 8 and w.num_bits == 8:
            # W8A8: dynamic-per-token unless static scheme requested
            # (compressed_tensors.py:94 static / :107 dynamic).
            return Int8W8A8LinearMethod(
                static_input_scale=not acts.dynamic)
        if acts is None and w.num_bits in (4, 8):
            return WNA16LinearMethod(w.num_bits, w.group_size,
                                     symmetric=w.symmetric)
        from nmvllm_tpu.layers.linear import UnquantizedLinearMethod
        return UnquantizedLinearMethod()


def wNa16_wire_to_canonical(weight_packed, weight_scale,
                            weight_zero_point, bits: int, group_size: int,
                            symmetric: bool = True):
    """Repack a compressed-tensors wNa16 layer to the canonical kernel
    layout.

    Wire format (reference compressed_tensors_wNa16.py:56-74 +
    quant_utils.py quantize_weights): ``weight_packed`` (N, K/pack)
    int32, values UNSIGNED biased by 2^(bits-1), packed LSB-first along
    K; ``weight_scale`` (N, K/g) float; symmetric checkpoints carry no
    zero point (implicit half-range zero)."""
    import numpy as np

    import jax.numpy as jnp
    from nmvllm_tpu.ops.quant_matmul import pack_weights

    pack = 32 // bits
    mask = (1 << bits) - 1
    half = 1 << (bits - 1)
    wp = np.asarray(weight_packed).view(np.uint32)          # (N, K/pack)
    n, kp = wp.shape
    k = kp * pack
    q = np.empty((n, k), np.int32)
    for i in range(pack):
        q[:, i::pack] = ((wp >> (bits * i)) & mask).astype(np.int32)
    w_int = np.ascontiguousarray(q.T)                       # (K, N)
    g = group_size if group_size and group_size > 0 else k
    scales = np.ascontiguousarray(
        np.asarray(weight_scale, np.float32).T)             # (K/g, N)
    if not symmetric and weight_zero_point is not None and \
            np.asarray(weight_zero_point).size:
        zp = np.asarray(weight_zero_point)
        if zp.dtype in (np.int32, np.uint32) and \
                zp.shape[-1] * pack == n:
            # Packed along N like the weights.
            z = np.empty((zp.shape[0], n), np.int32)
            zv = zp.view(np.uint32)
            for i in range(pack):
                z[:, i::pack] = ((zv >> (bits * i)) & mask).astype(
                    np.int32)
            zeros = np.ascontiguousarray(z)                 # (K/g, N)?
            if zeros.shape != (k // g, n):
                zeros = np.ascontiguousarray(zeros.T)
        else:
            zeros = np.ascontiguousarray(
                np.asarray(zp, np.int32).T.reshape(k // g, n))
    else:
        zeros = np.full((k // g, n), half, np.int32)
    if bits == 8:
        w8 = (w_int - half).astype(np.int8)
        return (jnp.asarray(w8), jnp.asarray(scales),
                jnp.asarray(zeros))
    packed = pack_weights(jnp.asarray(w_int), bits, g)
    return packed, jnp.asarray(scales), jnp.asarray(zeros)
