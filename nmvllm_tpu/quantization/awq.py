"""AWQ checkpoint support (reference: vllm quantization/awq.py,
csrc/quantization/awq/gemm_kernels.cu).

AWQ stores qweight (K, N/pack) int32 packed along N with the interleaved
nibble order [0,2,4,6,1,3,5,7], qzeros (K/g, N/pack) likewise, scales
(K/g, N). Ingestion de-interleaves into the common canonical layout
(SURVEY.md §2.2: "load-time: de-interleave AWQ packing → common INT4
layout → same Pallas kernel").
"""
from typing import Any, Dict

import numpy as np

from nmvllm_tpu.quantization import register_quantization
from nmvllm_tpu.quantization.base import QuantizationConfig
from nmvllm_tpu.quantization.wNa16 import WNA16LinearMethod

_AWQ_ORDER = [0, 2, 4, 6, 1, 3, 5, 7]


def unpack_awq_tensor(packed: np.ndarray, bits: int) -> np.ndarray:
    """(R, C/pack) int32 AWQ-packed -> (R, C) ints (de-interleaved)."""
    pack = 32 // bits
    mask = (1 << bits) - 1
    r, c_packed = packed.shape
    out = np.empty((r, c_packed * pack), np.int32)
    w = packed.view(np.uint32)
    order = _AWQ_ORDER if bits == 4 else list(range(pack))
    for i in range(pack):
        # Physical nibble i holds logical column order[i].
        out[:, order[i]::pack] = ((w >> (bits * i)) & mask).astype(np.int32)
    return out


def awq_to_canonical(qweight: np.ndarray, qzeros: np.ndarray,
                     scales: np.ndarray, bits: int, group_size: int):
    """Repack an AWQ layer to the canonical kernel layout."""
    import jax.numpy as jnp
    from nmvllm_tpu.ops.quant_matmul import pack_weights
    w_int = unpack_awq_tensor(qweight, bits)       # (K, N)
    zeros = unpack_awq_tensor(qzeros, bits)        # (K/g, N)
    k = w_int.shape[0]
    g = group_size if group_size > 0 else k
    packed = pack_weights(jnp.asarray(w_int), bits, g)
    return (packed, jnp.asarray(scales.astype(np.float32)),
            jnp.asarray(zeros.astype(np.int32)))


@register_quantization("awq")
class AWQConfig(QuantizationConfig):

    def __init__(self, weight_bits: int = 4, group_size: int = 128,
                 zero_point: bool = True):
        self.weight_bits = weight_bits
        self.group_size = group_size
        self.zero_point = zero_point

    @classmethod
    def get_name(cls) -> str:
        return "awq"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "AWQConfig":
        return cls(weight_bits=int(config.get("w_bit",
                                              config.get("bits", 4))),
                   group_size=int(config.get("q_group_size",
                                             config.get("group_size", 128))),
                   zero_point=bool(config.get("zero_point", True)))

    def get_linear_method(self, layer_name: str = ""):
        return WNA16LinearMethod(self.weight_bits, self.group_size,
                                 symmetric=not self.zero_point)

    def get_scaled_act_names(self):
        return ["gelu", "gelu_fast", "gelu_new", "gelu_pytorch_tanh"]
