"""GPTQ checkpoint support (covers the reference's gptq, gptq_marlin and
marlin methods — vllm quantization/gptq.py, gptq_marlin.py:192,
marlin.py).

Checkpoint tensors: qweight (K/pack, N) int32 with sequential nibbles along
K, qzeros (K/g, N/pack) int32, scales (K/g, N) fp16, optional g_idx
(act-order permutation). Ingestion eagerly converts to the canonical packed
layout of ops/quant_matmul.py (the reference repacks lazily on first forward,
gptq_marlin.py:374-440; we do it once at load — SURVEY.md §A.3).
"""
from typing import Any, Dict

import numpy as np

from nmvllm_tpu.quantization import register_quantization
from nmvllm_tpu.quantization.base import QuantizationConfig
from nmvllm_tpu.quantization.wNa16 import WNA16LinearMethod


def unpack_gptq_qweight(qweight: np.ndarray, bits: int) -> np.ndarray:
    """(K/pack, N) int32 sequential-pack along K -> (K, N) ints."""
    pack = 32 // bits
    mask = (1 << bits) - 1
    k_packed, n = qweight.shape
    out = np.empty((k_packed * pack, n), np.int32)
    w = qweight.view(np.uint32)
    for i in range(pack):
        out[i::pack] = ((w >> (bits * i)) & mask).astype(np.int32)
    # GPTQ packs k consecutive values into one word: word j holds
    # k = j*pack + i at nibble i -> row order j*pack+i == out[i::pack][j].
    return out


def unpack_gptq_qzeros(qzeros: np.ndarray, bits: int) -> np.ndarray:
    """(K/g, N/pack) int32 -> (K/g, N) ints. GPTQ stores zero-1 packed
    along N."""
    pack = 32 // bits
    mask = (1 << bits) - 1
    kg, n_packed = qzeros.shape
    out = np.empty((kg, n_packed * pack), np.int32)
    z = qzeros.view(np.uint32)
    for i in range(pack):
        out[:, i::pack] = ((z >> (bits * i)) & mask).astype(np.int32)
    # Historical GPTQ off-by-one: stored zero = zero - 1.
    return out + 1


def gptq_to_canonical(qweight: np.ndarray, qzeros: np.ndarray,
                      scales: np.ndarray, g_idx, bits: int,
                      group_size: int):
    """Repack a GPTQ checkpoint layer to the canonical kernel layout.

    4-bit weights go to the PAIRED unsigned layout (pair partners 16
    bits apart — see ops/quant_matmul.py pack_weights) serving the
    relayout-free Pallas kernel. Act-order (g_idx) checkpoints are
    dequantized and re-quantized group-contiguous (a pure load-time
    transform, replacing the runtime activation permutation the
    reference's exllama kernel does).
    """
    import jax.numpy as jnp
    zeros = unpack_gptq_qzeros(qzeros, bits)    # (K/g, N) unsigned
    k = qweight.shape[0] * (32 // bits)
    g = group_size if group_size > 0 else k
    if g_idx is not None and len(g_idx) and not np.array_equal(
            np.asarray(g_idx), np.arange(k) // g):
        w_int = unpack_gptq_qweight(qweight, bits)  # (K, N)
        gi = np.asarray(g_idx)
        w_dense = (w_int - zeros[gi, :]).astype(np.float32) \
            * scales[gi, :].astype(np.float32)
        from nmvllm_tpu.ops.quant_matmul import quantize_weights_to_packed
        qw, s, z = quantize_weights_to_packed(
            jnp.asarray(w_dense.T), bits, g, symmetric=False)
        return qw, s, z
    if bits == 8:
        # 8-bit layers are served unpacked (bias-signed int8) by the XLA
        # fused-dequant path (quantization/wNa16.py).
        w_int = unpack_gptq_qweight(qweight, bits)
        w8 = (w_int - 128).astype(np.int8)
        return (jnp.asarray(w8), jnp.asarray(scales.astype(np.float32)),
                jnp.asarray(zeros.astype(np.int32)))
    # 4-bit: GPTQ sequential nibbles -> the PAIRED unsigned layout
    # (ops/quant_matmul.py pack_weights; relayout-free kernel).
    w_int = unpack_gptq_qweight(qweight, bits)
    from nmvllm_tpu.ops.quant_matmul import pack_weights
    packed = pack_weights(jnp.asarray(w_int), bits, g)
    return (packed, jnp.asarray(scales.astype(np.float32)),
            jnp.asarray(zeros.astype(np.int32)))


@register_quantization("gptq")
@register_quantization("gptq_marlin")
@register_quantization("marlin")
class GPTQConfig(QuantizationConfig):

    def __init__(self, weight_bits: int = 4, group_size: int = 128,
                 desc_act: bool = False, is_sym: bool = True):
        self.weight_bits = weight_bits
        self.group_size = group_size
        self.desc_act = desc_act
        self.is_sym = is_sym

    @classmethod
    def get_name(cls) -> str:
        return "gptq"

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "GPTQConfig":
        return cls(weight_bits=int(config.get("bits", 4)),
                   group_size=int(config.get("group_size", 128)),
                   desc_act=bool(config.get("desc_act", False)),
                   is_sym=bool(config.get("sym", True)))

    def get_linear_method(self, layer_name: str = ""):
        return WNA16LinearMethod(self.weight_bits, self.group_size,
                                 symmetric=self.is_sym)
