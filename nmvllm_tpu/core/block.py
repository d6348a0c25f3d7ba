"""Physical block bookkeeping objects (reference: vllm/block.py)."""
from typing import Optional


class PhysicalTokenBlock:
    """One physical KV page on device or host."""

    __slots__ = ("device", "block_number", "block_size", "ref_count",
                 "block_hash", "num_hashed_tokens", "last_accessed",
                 "computed")

    def __init__(self, device: str, block_number: int, block_size: int,
                 block_hash: Optional[int] = None,
                 num_hashed_tokens: int = 0):
        self.device = device
        self.block_number = block_number
        self.block_size = block_size
        self.ref_count = 0
        self.block_hash = block_hash
        self.num_hashed_tokens = num_hashed_tokens
        self.last_accessed = -1.0
        self.computed = False

    def __repr__(self) -> str:
        return (f"PhysicalTokenBlock(device={self.device}, "
                f"block_number={self.block_number}, "
                f"ref_count={self.ref_count})")
