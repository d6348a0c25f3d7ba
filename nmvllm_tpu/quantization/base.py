"""Quantization plug-in seam.

Mirrors the reference's two-level design
(vllm/model_executor/layers/quantization/base_config.py:8,34):
a checkpoint-level QuantizationConfig that parses the HF quantization_config,
and per-layer LinearMethod strategy objects with create_weights/apply. On TPU
`apply` lowers to either a Pallas fused dequant-GEMM or an XLA dot with scale
epilogue; `process_weights` runs once at load to repack checkpoint tensors
into the kernel's packed layout (the analogue of gptq_marlin_repack).
"""
from abc import ABC, abstractmethod
from typing import Any, Dict, List, Optional


class LinearMethodBase(ABC):
    """Per-layer strategy (reference base_config.py:8 QuantizeMethodBase +
    linear.py:69 LinearMethodBase)."""

    @abstractmethod
    def create_weights(self, rng, in_features: int, out_features: int,
                       params_dtype) -> Dict[str, Any]:
        """Initialize (random) weights for this layer in packed layout."""

    @abstractmethod
    def apply(self, params: Dict[str, Any], x, bias=None):
        """y = x @ W^T (+ bias), consuming packed weights."""

    def process_weights(self, params: Dict[str, Any]) -> Dict[str, Any]:
        """Load-time repack: checkpoint layout -> kernel layout."""
        return params

    def load_weight_shapes(self, in_features: int,
                           out_features: int) -> Dict[str, tuple]:
        """Shapes of the checkpoint tensors this method expects, keyed by
        suffix (e.g. 'qweight', 'scales'). Used by loaders and tests."""
        return {}


class QuantizationConfig(ABC):
    """Checkpoint-level config (reference base_config.py:34)."""

    method_name: str = ""

    @classmethod
    @abstractmethod
    def get_name(cls) -> str:
        ...

    @classmethod
    @abstractmethod
    def from_config(cls, config: Dict[str, Any]) -> "QuantizationConfig":
        """Build from an HF `quantization_config` dict."""

    @abstractmethod
    def get_linear_method(self, layer_name: str = "") -> LinearMethodBase:
        """The strategy for a given (fully-qualified) linear layer name."""

    @classmethod
    def get_config_filenames(cls) -> List[str]:
        return ["config.json"]

    def get_scaled_act_names(self) -> List[str]:
        return []

    @staticmethod
    def get_from_keys(config: Dict[str, Any], keys: List[str]) -> Any:
        for key in keys:
            if key in config:
                return config[key]
        raise ValueError(f"Cannot find any of {keys} in quantization config.")
