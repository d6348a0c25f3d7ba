"""Sparsity format registry — the NM-fork-specific parallel to quantization
(reference: vllm/model_executor/layers/sparsity/__init__.py, selected via
``LLM(sparsity=...)``).

TPU mapping: `semi_structured_sparse_w16a16` (2:4) compresses at load into
(values, 2-bit metadata) arrays consumed by the Pallas 2:4 GEMM;
`sparse_w16a16` (unstructured) keeps dense compute with compressed storage.
"""
from typing import Dict, Type

from nmvllm_tpu.sparsity.base import SparsityConfig

_REGISTRY: Dict[str, Type[SparsityConfig]] = {}


def register_sparsity(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        cls.method_name = name
        return cls
    return deco


def _populate() -> None:
    from nmvllm_tpu.sparsity import sparse_w16a16  # noqa: F401


def get_sparsity_config(name: str) -> Type[SparsityConfig]:
    _populate()
    if name not in _REGISTRY:
        raise ValueError(f"Invalid sparsity method: {name}")
    return _REGISTRY[name]


class _LazyMethods:
    def _keys(self):
        _populate()
        return _REGISTRY.keys()

    def __iter__(self):
        return iter(self._keys())

    def __contains__(self, name):
        return name in self._keys()

    def __getitem__(self, name):
        return get_sparsity_config(name)

    def keys(self):
        return self._keys()


SPARSITY_METHODS = _LazyMethods()

__all__ = ["SparsityConfig", "SPARSITY_METHODS", "get_sparsity_config",
           "register_sparsity"]
