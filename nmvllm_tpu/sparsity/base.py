"""Sparsity config ABC (reference:
vllm/model_executor/layers/sparsity/base_config.py)."""
from abc import ABC, abstractmethod
from typing import Any, Dict

from nmvllm_tpu.quantization.base import LinearMethodBase


class SparsityConfig(ABC):
    method_name: str = ""

    @classmethod
    @abstractmethod
    def get_name(cls) -> str:
        ...

    @classmethod
    def from_config(cls, config: Dict[str, Any]) -> "SparsityConfig":
        return cls()

    @abstractmethod
    def get_linear_method(self, layer_name: str = "") -> LinearMethodBase:
        ...
