"""Quantization method registry (reference:
vllm/model_executor/layers/quantization/__init__.py:22-36).

Each method is a QuantizationConfig subclass providing per-layer
LinearMethod strategy objects. TPU mapping of the reference set:
  gptq / awq / marlin / gptq_marlin  -> one common packed W4A16/W8A16 layout
                                        + Pallas fused dequant-GEMM
  fp8                                -> FP8 weight storage, bf16 MXU compute,
                                        optional FP8 KV cache
  compressed-tensors                 -> W8A8 int8 (native int8 MXU), WNA16
  squeezellm/aqlm/bitsandbytes/...   -> ingestion converts to the common
                                        packed layout where possible
"""
from typing import Dict, Type

from nmvllm_tpu.quantization.base import QuantizationConfig

_REGISTRY: Dict[str, Type[QuantizationConfig]] = {}


def register_quantization(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        cls.method_name = name
        return cls
    return deco


def _populate() -> None:
    # Imports deferred so the registry module is import-cheap.
    from nmvllm_tpu.quantization import (awq, compressed_tensors,
                                         extra_formats, fp8, gptq,
                                         int8_w8a8)  # noqa: F401


def get_quantization_config(name: str) -> Type[QuantizationConfig]:
    _populate()
    if name not in _REGISTRY:
        raise ValueError(f"Invalid quantization method: {name}")
    return _REGISTRY[name]


class _LazyMethods:
    """Mapping-like view that populates the registry on first access."""

    def _keys(self):
        _populate()
        return _REGISTRY.keys()

    def __iter__(self):
        return iter(self._keys())

    def __contains__(self, name):
        return name in self._keys()

    def __getitem__(self, name):
        return get_quantization_config(name)

    def keys(self):
        return self._keys()


QUANTIZATION_METHODS = _LazyMethods()

__all__ = [
    "QuantizationConfig", "QUANTIZATION_METHODS", "get_quantization_config",
    "register_quantization",
]
