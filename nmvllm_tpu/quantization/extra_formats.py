"""Niche quantized-checkpoint formats: SqueezeLLM, AQLM, DeepSpeedFP,
bitsandbytes.

Reference: vllm quantization/{squeezellm,aqlm,deepspeedfp,bitsandbytes}.py
(LUT GEMV, additive-codebook GEMM, fp6/fp8 block quant, bnb NF4 — all
backed by CUDA kernels). TPU policy: these formats are DEQUANTIZED AT
LOAD and served through the standard paths — their nonuniform grids
(LUTs, codebooks, NF4) have no MXU representation, and dense bf16 (or a
documented requantization) reproduces the reference numerics exactly at
load time. The decode math below mirrors the reference's dequant
routines 1:1 on host numpy.
"""
from typing import Any, Dict

import numpy as np

from nmvllm_tpu.logger import init_logger
from nmvllm_tpu.quantization import register_quantization
from nmvllm_tpu.quantization.base import QuantizationConfig

logger = init_logger(__name__)


def squeezellm_decode(qweight: np.ndarray,
                      lookup_table: np.ndarray) -> np.ndarray:
    """reference squeezellm.py: qweight (K/8, N) int32, vertical 4-bit
    pack along K (packed_dim=0); lookup_table (N, 16) per-channel
    centroids. Returns dense (K, N) f32."""
    kp, n = qweight.shape
    w = qweight.view(np.uint32)
    idx = np.empty((kp * 8, n), np.int64)
    for i in range(8):
        idx[i::8] = ((w >> (4 * i)) & 0xF).astype(np.int64)
    # w[k, n] = LUT[n, idx[k, n]]
    return np.take_along_axis(lookup_table.T.astype(np.float32), idx,
                              axis=0)


def aqlm_decode(codes: np.ndarray, codebooks: np.ndarray,
                scales: np.ndarray) -> np.ndarray:
    """reference aqlm.py dequantize_weight:35 — codes
    (num_out_groups, num_in_groups, num_codebooks); codebooks
    (num_codebooks, codebook_size, out_group, in_group); scales
    (num_out_groups, 1, 1, 1). Returns dense (K, N) f32 (K-major)."""
    nog, nig, ncb = codes.shape
    ncb2, csize, ogs, igs = codebooks.shape
    assert ncb == ncb2, (ncb, ncb2)
    idx = codes.astype(np.int64) % csize
    # Sum codebook vectors over the codebook axis.
    w = np.zeros((nog, nig, ogs, igs), np.float32)
    for cb in range(ncb):
        w += codebooks[cb, idx[:, :, cb]].astype(np.float32)
    w *= scales.reshape(nog, 1, 1, 1).astype(np.float32)
    # (nog, nig, ogs, igs) -> (out = nog*ogs, in = nig*igs)
    w = w.transpose(0, 2, 1, 3).reshape(nog * ogs, nig * igs)
    return np.ascontiguousarray(w.T)  # K-major


class _DequantizeAtLoadConfig(QuantizationConfig):
    """Common base: serve through UnquantizedLinearMethod; the loader
    decodes checkpoint tensors into the dense weight."""

    dequantize_at_load = True

    @classmethod
    def from_config(cls, config: Dict[str, Any]):
        return cls()

    def get_linear_method(self, layer_name: str = ""):
        from nmvllm_tpu.layers.linear import UnquantizedLinearMethod
        return UnquantizedLinearMethod()


@register_quantization("squeezellm")
class SqueezeLLMConfig(_DequantizeAtLoadConfig):

    @classmethod
    def get_name(cls) -> str:
        return "squeezellm"


@register_quantization("aqlm")
class AQLMConfig(_DequantizeAtLoadConfig):

    @classmethod
    def get_name(cls) -> str:
        return "aqlm"


@register_quantization("deepspeedfp")
class DeepSpeedFPConfig(_DequantizeAtLoadConfig):
    """DeepSpeedFP quantizes fp16 checkpoints at load (reference
    deepspeedfp.py DeepSpeedFPParameter.ds_quantize_). On TPU the fp8
    flavor maps to the native fp8 weight path (``quantization='fp8'``);
    selecting ``deepspeedfp`` serves bf16 (dequantized) weights."""

    @classmethod
    def get_name(cls) -> str:
        return "deepspeedfp"


@register_quantization("bitsandbytes")
class BitsAndBytesConfig(_DequantizeAtLoadConfig):
    """bnb NF4 checkpoints carry runtime quant state (reference
    BitsAndBytesModelLoader streams + quantizes on the fly); the TPU
    engine loads the fp16 source weights and serves bf16. For a
    quantized serving path use ``quantization='gptq'``-style INT4."""

    @classmethod
    def get_name(cls) -> str:
        return "bitsandbytes"
