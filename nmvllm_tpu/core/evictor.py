"""LRU evictor for cached (prefix-sharing) blocks.

Reference: vllm/core/evictor_v1.py:53 — evict least-recently-used; ties
broken by most hashed tokens (longer prefixes evicted first among ties).
"""
import enum
from typing import Dict

from nmvllm_tpu.core.block import PhysicalTokenBlock


class EvictionPolicy(enum.Enum):
    LRU = enum.auto()


class LRUEvictor:

    def __init__(self):
        self.free_table: Dict[int, PhysicalTokenBlock] = {}

    def __contains__(self, block_hash: int) -> bool:
        return block_hash in self.free_table

    @property
    def num_blocks(self) -> int:
        return len(self.free_table)

    def evict(self) -> PhysicalTokenBlock:
        if not self.free_table:
            raise ValueError("No usable cache memory left")
        evicted = next(iter(self.free_table.values()))
        for block in self.free_table.values():
            if evicted.last_accessed < block.last_accessed:
                continue
            if (evicted.last_accessed > block.last_accessed or
                    evicted.num_hashed_tokens < block.num_hashed_tokens):
                evicted = block
        del self.free_table[evicted.block_hash]
        evicted.computed = False
        return evicted

    def add(self, block: PhysicalTokenBlock) -> None:
        self.free_table[block.block_hash] = block

    def remove(self, block_hash: int) -> PhysicalTokenBlock:
        if block_hash not in self.free_table:
            raise ValueError("Attempting to remove block that's not freed")
        block = self.free_table.pop(block_hash)
        return block


def make_evictor(policy: EvictionPolicy = EvictionPolicy.LRU) -> LRUEvictor:
    if policy == EvictionPolicy.LRU:
        return LRUEvictor()
    raise ValueError(f"Unknown eviction policy {policy}")
