"""Pooling parameters for embedding requests
(reference: vllm/pooling_params.py)."""
from typing import Any, Optional


class PoolingParams:

    def __init__(self, additional_data: Optional[Any] = None):
        self.additional_data = additional_data

    def clone(self) -> "PoolingParams":
        return PoolingParams(self.additional_data)

    def __repr__(self) -> str:
        return f"PoolingParams(additional_data={self.additional_data})"
