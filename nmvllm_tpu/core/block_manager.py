"""Paged-KV block manager: logical→physical block tables, ref-counting,
copy-on-write forks, swap in/out, hash-based prefix caching.

Reference: vllm/core/block_manager_v1.py (BlockSpaceManagerV1:213,
CachedBlockAllocator:64, UncachedBlockAllocator:154, append_slots:425,
CoW _allocate_last_physical_block:397, swap_in:546/swap_out:574) and
vllm/core/interfaces.py (BlockSpaceManager ABC). The logic is pure host-side
Python — on TPU the resulting block tables feed the Pallas paged-attention
kernel as scalar-prefetch arrays.
"""
import enum
from abc import ABC, abstractmethod
from typing import Dict, List, Optional, Sequence, Set, Tuple

from nmvllm_tpu.core.block import PhysicalTokenBlock
from nmvllm_tpu.core.evictor import LRUEvictor
from nmvllm_tpu.logger import init_logger
from nmvllm_tpu.sequence import Sequence, SequenceGroup, SequenceStatus
from nmvllm_tpu.utils import Counter, cdiv, now

logger = init_logger(__name__)

BlockTable = List[PhysicalTokenBlock]


class AllocStatus(enum.Enum):
    """Can a seq group be allocated now / later / never?
    (reference core/interfaces.py AllocStatus)"""
    OK = enum.auto()
    LATER = enum.auto()
    NEVER = enum.auto()


class BlockAllocatorBase(ABC):

    @abstractmethod
    def allocate(self, block_hash: Optional[int] = None,
                 num_hashed_tokens: int = 0) -> PhysicalTokenBlock:
        ...

    @abstractmethod
    def free(self, block: PhysicalTokenBlock) -> None:
        ...

    @abstractmethod
    def get_num_free_blocks(self) -> int:
        ...

    @abstractmethod
    def contains_block(self, block_hash: int) -> bool:
        ...

    @abstractmethod
    def update_hash(self, block_hash: int,
                    block: PhysicalTokenBlock) -> None:
        ...


class UncachedBlockAllocator(BlockAllocatorBase):
    """Free-list allocator (reference block_manager_v1.py:154).

    ``first_block``: id of the first block (used by the data-parallel
    partitioned pool, where replica r owns ids
    [r*blocks_per_replica, (r+1)*blocks_per_replica))."""

    def __init__(self, device: str, block_size: int, num_blocks: int,
                 first_block: int = 0):
        self.device = device
        self.block_size = block_size
        self.num_blocks = num_blocks
        self.free_blocks: List[PhysicalTokenBlock] = [
            PhysicalTokenBlock(device, first_block + i, block_size)
            for i in range(num_blocks)
        ]

    def allocate(self, block_hash=None, num_hashed_tokens=0):
        if not self.free_blocks:
            raise ValueError("Out of memory! No free blocks are available.")
        block = self.free_blocks.pop()
        block.ref_count = 1
        return block

    def free(self, block: PhysicalTokenBlock) -> None:
        if block.ref_count == 0:
            raise ValueError(f"Double free! {block} is already freed.")
        block.ref_count -= 1
        if block.ref_count == 0:
            self.free_blocks.append(block)

    def get_num_free_blocks(self) -> int:
        return len(self.free_blocks)

    def contains_block(self, block_hash: int) -> bool:
        return False

    def update_hash(self, block_hash, block) -> None:
        raise NotImplementedError(
            "Invalid codepath for uncached block allocator.")


class CachedBlockAllocator(BlockAllocatorBase):
    """Hash-keyed allocator enabling prefix caching
    (reference block_manager_v1.py:64)."""

    def __init__(self, device: str, block_size: int, num_blocks: int):
        self.device = device
        self.block_size = block_size
        self.num_blocks = num_blocks
        self.current_num_blocks = 0
        self.cached_blocks: Dict[int, PhysicalTokenBlock] = {}
        self.evictor = LRUEvictor()
        self.default_hash_ctr = Counter(start=-1)

    def _next_default_hash(self) -> int:
        # Unique placeholder hashes for not-yet-full blocks: negative ints.
        v = self.default_hash_ctr.counter
        self.default_hash_ctr.counter -= 1
        return v

    def allocate_block(self, block_hash: int,
                       num_hashed_tokens: int) -> PhysicalTokenBlock:
        if self.current_num_blocks == self.num_blocks:
            block = self.evictor.evict()
            block.block_hash = block_hash
            block.num_hashed_tokens = num_hashed_tokens
            return block
        block = PhysicalTokenBlock(self.device, self.current_num_blocks,
                                   self.block_size, block_hash,
                                   num_hashed_tokens)
        self.current_num_blocks += 1
        return block

    def allocate(self, block_hash: Optional[int] = None,
                 num_hashed_tokens: int = 0) -> PhysicalTokenBlock:
        if block_hash is None:
            block_hash = self._next_default_hash()
        if block_hash in self.evictor:
            assert block_hash not in self.cached_blocks
            block = self.evictor.remove(block_hash)
            assert block.ref_count == 0
            self.cached_blocks[block_hash] = block
            block.ref_count += 1
            assert block.block_hash == block_hash
            return block
        if block_hash not in self.cached_blocks:
            self.cached_blocks[block_hash] = self.allocate_block(
                block_hash, num_hashed_tokens)
        block = self.cached_blocks[block_hash]
        assert block.block_hash == block_hash
        block.ref_count += 1
        return block

    def free(self, block: PhysicalTokenBlock) -> None:
        if block.ref_count == 0:
            raise ValueError(f"Double free! {block} is already freed.")
        block.ref_count -= 1
        if block.ref_count == 0:
            assert block.block_hash not in self.evictor
            self.evictor.add(block)
            del self.cached_blocks[block.block_hash]

    def get_num_free_blocks(self) -> int:
        return (self.num_blocks - self.current_num_blocks +
                self.evictor.num_blocks)

    def contains_block(self, block_hash: int) -> bool:
        return block_hash in self.cached_blocks or block_hash in self.evictor

    def update_hash(self, block_hash: int, block: PhysicalTokenBlock) -> None:
        assert not self.contains_block(block_hash)
        old_hash = block.block_hash
        block.block_hash = block_hash
        del self.cached_blocks[old_hash]
        self.cached_blocks[block_hash] = block


def _seq_block_hash(seq: Sequence, logical_idx: int) -> int:
    """Content hash of a full logical block (prefix-aware): chained
    incremental hash memoized on the Sequence (native host library when
    available) — O(prefix) total per sequence instead of the reference's
    O(prefix^2) hash-the-whole-prefix-per-block."""
    return seq.hash_of_block(logical_idx)


class BlockSpaceManager:
    """Maps sequences to physical KV pages (reference
    block_manager_v1.py:213)."""

    def __init__(self, block_size: int, num_gpu_blocks: int,
                 num_cpu_blocks: int, watermark: float = 0.01,
                 sliding_window: Optional[int] = None,
                 enable_caching: bool = False,
                 data_parallel_size: int = 1,
                 lookahead_slots: int = 0):
        self.block_size = block_size
        self.num_total_gpu_blocks = num_gpu_blocks
        self.num_total_cpu_blocks = num_cpu_blocks
        if enable_caching and sliding_window is not None:
            raise NotImplementedError(
                "Sliding window is not allowed with prefix caching enabled!")
        self.block_sliding_window = None
        if sliding_window is not None:
            # Round up to include padding-token block (reference :216+).
            # Speculative-decoding headroom: with a ring of exactly
            # ceil(window/bs) blocks, a REJECTED speculative write at
            # position p would destroy the slot of position
            # p - ring_span, which is still inside later queries'
            # windows.  Growing the ring span to >= window + k makes the
            # aliased position provably outside every post-rejection
            # window (p <= seq_len-1+k aliases p - ring_span <=
            # seq_len-1-window < first_requery - window + 1), so
            # speculation stays safe at ANY sequence length for the cost
            # of <= ceil(k/bs) extra pages per sequence.
            self.block_sliding_window = -(
                -(sliding_window + lookahead_slots) // block_size)
        self.watermark = watermark
        assert watermark >= 0.0
        self.enable_caching = enable_caching
        alloc_cls = (CachedBlockAllocator
                     if enable_caching else UncachedBlockAllocator)
        # Data-parallel decode: the device pool is partitioned over the
        # `data` mesh axis — replica r owns block ids
        # [r*bpr, (r+1)*bpr) and every block of a sequence lives in one
        # replica (the runner shards batch rows to the replica owning
        # their pages and localizes ids; worker/runner.py).
        self.dp = max(1, data_parallel_size)
        if self.dp > 1:
            if enable_caching:
                raise NotImplementedError(
                    "Prefix caching is not supported with "
                    "data_parallel_size > 1 (the hash-keyed pool cannot "
                    "be replica-partitioned without cross-replica block "
                    "sharing).")
            assert num_gpu_blocks % self.dp == 0, \
                (num_gpu_blocks, self.dp)
            bpr = num_gpu_blocks // self.dp
            self.blocks_per_replica = bpr
            self.gpu_allocators = [
                UncachedBlockAllocator("device", block_size, bpr,
                                       first_block=r * bpr)
                for r in range(self.dp)
            ]
            self.gpu_allocator = self.gpu_allocators[0]
            self.watermark_blocks = int(watermark * bpr)
        else:
            self.blocks_per_replica = num_gpu_blocks
            self.gpu_allocator = alloc_cls("device", block_size,
                                           num_gpu_blocks)
            self.gpu_allocators = [self.gpu_allocator]
            self.watermark_blocks = int(watermark * num_gpu_blocks)
        self.cpu_allocator = alloc_cls("host", block_size, num_cpu_blocks)
        # seq_id -> owning replica (dp > 1 only; forks/swaps keep it).
        self.seq_replica: Dict[int, int] = {}
        self.block_tables: Dict[int, BlockTable] = {}
        # Monotone per-seq version, bumped on EVERY table-content change
        # (allocate/append/CoW/promotion-swap/fork/swap in/out). The
        # model runner's native batch-assembly mirror (worker/runner.py,
        # csrc/host/nm_host.cpp) resyncs a sequence iff its version moved.
        self._table_versions: Dict[int, int] = {}

    def _bump(self, seq_id: int) -> None:
        self._table_versions[seq_id] = \
            self._table_versions.get(seq_id, 0) + 1

    def get_table_version(self, seq_id: int) -> int:
        return self._table_versions.get(seq_id, 0)

    # ---- data-parallel replica routing -------------------------------------
    def _gpu_alloc_for(self, seq_id: int) -> BlockAllocatorBase:
        if self.dp == 1:
            return self.gpu_allocator
        return self.gpu_allocators[self.seq_replica[seq_id]]

    def _gpu_free_block(self, block: PhysicalTokenBlock) -> None:
        """Free a device block to its owning replica's pool."""
        if self.dp == 1:
            self.gpu_allocator.free(block)
        else:
            self.gpu_allocators[block.block_number //
                                self.blocks_per_replica].free(block)

    def _best_replica(self) -> int:
        return max(range(self.dp),
                   key=lambda r: self.gpu_allocators[r].
                   get_num_free_blocks())

    def get_replica(self, seq_id: int) -> int:
        return self.seq_replica.get(seq_id, 0) if self.dp > 1 else 0

    # ---- allocate (prefill admission) ------------------------------------
    def can_allocate(self, seq_group: SequenceGroup) -> AllocStatus:
        seq = seq_group.get_seqs(status=SequenceStatus.WAITING)[0]
        num_required = seq.n_blocks()
        if self.block_sliding_window is not None:
            num_required = min(num_required, self.block_sliding_window)
        # dp > 1: a new sequence goes to the replica with the most room.
        num_free = self.gpu_allocators[self._best_replica()]. \
            get_num_free_blocks() if self.dp > 1 else \
            self.gpu_allocator.get_num_free_blocks()
        if self.blocks_per_replica - num_required < self.watermark_blocks:
            return AllocStatus.NEVER
        if num_free - num_required >= self.watermark_blocks:
            return AllocStatus.OK
        return AllocStatus.LATER

    def allocate(self, seq_group: SequenceGroup) -> None:
        seq = seq_group.get_seqs(status=SequenceStatus.WAITING)[0]
        num_blocks = seq.n_blocks()
        replica = self._best_replica() if self.dp > 1 else 0
        allocator = self.gpu_allocators[replica]
        block_table: BlockTable = []
        for logical_idx in range(num_blocks):
            if (self.block_sliding_window is not None
                    and logical_idx >= self.block_sliding_window):
                block = block_table[logical_idx % self.block_sliding_window]
                block.ref_count += 1
            elif (self.enable_caching
                  and (logical_idx + 1) * self.block_size <= seq.get_len()):
                # Full blocks get content hashes (prefix sharing).
                block = allocator.allocate(
                    _seq_block_hash(seq, logical_idx),
                    (logical_idx + 1) * self.block_size)
            else:
                block = allocator.allocate()
            block_table.append(block)
        # All seqs in a new group share the prompt blocks.
        ref_per_block = seq_group.num_seqs()
        if ref_per_block > 1:
            for block in block_table:
                block.ref_count = ref_per_block
        for s in seq_group.get_seqs(status=SequenceStatus.WAITING):
            self.block_tables[s.seq_id] = list(block_table)
            if self.dp > 1:
                self.seq_replica[s.seq_id] = replica
            self._bump(s.seq_id)

    # ---- decode-time growth ----------------------------------------------
    def can_append_slots(self, seq_group: SequenceGroup,
                         num_lookahead_slots: int = 0) -> bool:
        if self.dp > 1:
            seqs = seq_group.get_seqs(status=SequenceStatus.RUNNING)
            num_free = self._gpu_alloc_for(seqs[0].seq_id). \
                get_num_free_blocks() if seqs else 0
        else:
            num_free = self.gpu_allocator.get_num_free_blocks()
        num_seqs = seq_group.num_seqs(status=SequenceStatus.RUNNING)
        return num_seqs + num_lookahead_slots <= num_free

    def _promote_last_block(self, seq: Sequence,
                            last_block: PhysicalTokenBlock
                            ) -> PhysicalTokenBlock:
        assert self.enable_caching  # implies dp == 1
        new_hash = _seq_block_hash(seq, seq.n_blocks() - 1)
        if self.gpu_allocator.contains_block(new_hash):
            self.gpu_allocator.free(last_block)
            return self.gpu_allocator.allocate(new_hash)
        self.gpu_allocator.update_hash(new_hash, last_block)
        return last_block

    def _is_last_block_full(self, seq: Sequence) -> bool:
        return seq.get_len() % seq.block_size == 0

    def _maybe_promote_last_block(self, seq, last_block):
        if self.enable_caching and self._is_last_block_full(seq):
            return self._promote_last_block(seq, last_block)
        return last_block

    def _allocate_last_physical_block(self, seq: Sequence):
        if not self.enable_caching:
            return self._gpu_alloc_for(seq.seq_id).allocate()
        block_hash = None
        if self._is_last_block_full(seq):
            block_hash = _seq_block_hash(seq, seq.n_blocks() - 1)
        return self.gpu_allocator.allocate(
            block_hash, seq.n_blocks() * self.block_size)

    def append_slots(self, seq: Sequence, num_lookahead_slots: int = 0
                     ) -> List[Tuple[int, int]]:
        """Grow the block table for one new token plus ``num_lookahead_slots``
        speculative slots; returns CoW copies (src, dst) (reference
        append_slots:425 + lookahead-slot reservation for spec decode)."""
        # Lookahead slots: spec-decode verification writes KV for draft
        # tokens at positions [len, len+lookahead); the table must span them.
        n_blocks = cdiv(seq.get_len() + num_lookahead_slots, self.block_size)
        block_table = self.block_tables[seq.seq_id]
        if len(block_table) < n_blocks:
            grew = False
            while len(block_table) < n_blocks:
                if (self.block_sliding_window
                        and len(block_table) >= self.block_sliding_window):
                    block_table.append(
                        block_table[len(block_table) %
                                    self.block_sliding_window])
                else:
                    block_table.append(
                        self._allocate_last_physical_block(seq))
                grew = True
            if grew:
                self._bump(seq.seq_id)
                return []
        last_block = block_table[-1]
        assert last_block.device == "device"
        if last_block.ref_count == 1:
            maybe_new = self._maybe_promote_last_block(seq, last_block)
            if maybe_new.block_number != last_block.block_number:
                self._bump(seq.seq_id)
            block_table[-1] = maybe_new
            return []
        # Shared block: copy on write.
        new_block = self._allocate_last_physical_block(seq)
        block_table[-1] = new_block
        self._gpu_free_block(last_block)
        self._bump(seq.seq_id)
        return [(last_block.block_number, new_block.block_number)]

    def fork(self, parent_seq: Sequence, child_seq: Sequence) -> None:
        if parent_seq.seq_id not in self.block_tables:
            return
        src = self.block_tables[parent_seq.seq_id]
        self.block_tables[child_seq.seq_id] = list(src)
        if self.dp > 1:
            self.seq_replica[child_seq.seq_id] = \
                self.seq_replica[parent_seq.seq_id]
        self._bump(child_seq.seq_id)
        for block in set(src):
            block.ref_count += 1

    # ---- swap -------------------------------------------------------------
    def can_swap_in(self, seq_group: SequenceGroup,
                    num_lookahead_slots: int = 0) -> AllocStatus:
        blocks = set()
        for seq in seq_group.get_seqs(status=SequenceStatus.SWAPPED):
            blocks.update(self.block_tables[seq.seq_id])
        num_swapped = len(blocks)
        if self.dp > 1:
            seqs = seq_group.get_seqs(status=SequenceStatus.SWAPPED)
            num_free = self._gpu_alloc_for(seqs[0].seq_id). \
                get_num_free_blocks() if seqs else 0
        else:
            num_free = self.gpu_allocator.get_num_free_blocks()
        num_required = (num_swapped +
                        seq_group.num_seqs(status=SequenceStatus.SWAPPED) *
                        num_lookahead_slots)
        if num_required > self.blocks_per_replica:
            return AllocStatus.NEVER
        if num_free - num_required >= self.watermark_blocks:
            return AllocStatus.OK
        return AllocStatus.LATER

    def swap_in(self, seq_group: SequenceGroup) -> List[Tuple[int, int]]:
        mapping: Dict[PhysicalTokenBlock, PhysicalTokenBlock] = {}
        for seq in seq_group.get_seqs(status=SequenceStatus.SWAPPED):
            allocator = self._gpu_alloc_for(seq.seq_id)
            new_table: BlockTable = []
            for cpu_block in self.block_tables[seq.seq_id]:
                if cpu_block in mapping:
                    gpu_block = mapping[cpu_block]
                    gpu_block.ref_count += 1
                else:
                    gpu_block = allocator.allocate(
                        cpu_block.block_hash, cpu_block.num_hashed_tokens)
                    mapping[cpu_block] = gpu_block
                new_table.append(gpu_block)
                self.cpu_allocator.free(cpu_block)
            self.block_tables[seq.seq_id] = new_table
            self._bump(seq.seq_id)
        return [(cpu.block_number, gpu.block_number)
                for cpu, gpu in mapping.items()]

    def can_swap_out(self, seq_group: SequenceGroup) -> bool:
        blocks = set()
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            blocks.update(self.block_tables[seq.seq_id])
        return len(blocks) <= self.cpu_allocator.get_num_free_blocks()

    def swap_out(self, seq_group: SequenceGroup) -> List[Tuple[int, int]]:
        mapping: Dict[PhysicalTokenBlock, PhysicalTokenBlock] = {}
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            new_table: BlockTable = []
            for gpu_block in self.block_tables[seq.seq_id]:
                if gpu_block in mapping:
                    cpu_block = mapping[gpu_block]
                    cpu_block.ref_count += 1
                else:
                    cpu_block = self.cpu_allocator.allocate(
                        gpu_block.block_hash, gpu_block.num_hashed_tokens)
                    mapping[gpu_block] = cpu_block
                new_table.append(cpu_block)
                self._gpu_free_block(gpu_block)
            self.block_tables[seq.seq_id] = new_table
            self._bump(seq.seq_id)
        return [(gpu.block_number, cpu.block_number)
                for gpu, cpu in mapping.items()]

    # ---- free / query ------------------------------------------------------
    def _free_block_table(self, block_table: BlockTable) -> None:
        for block in set(block_table):
            if block.device == "device":
                # Shared (sliding-window) duplicates freed per unique block
                # with their accumulated refcounts.
                for _ in range(block_table.count(block)):
                    self._gpu_free_block(block)
                    if block.ref_count == 0:
                        break
            else:
                for _ in range(block_table.count(block)):
                    self.cpu_allocator.free(block)
                    if block.ref_count == 0:
                        break

    def free(self, seq: Sequence) -> None:
        if seq.seq_id not in self.block_tables:
            return
        self._free_block_table(self.block_tables[seq.seq_id])
        del self.block_tables[seq.seq_id]
        self.seq_replica.pop(seq.seq_id, None)
        self._bump(seq.seq_id)

    def reset(self) -> None:
        for seq_id, table in list(self.block_tables.items()):
            self._free_block_table(table)
            self._bump(seq_id)
        self.block_tables.clear()

    def get_block_table(self, seq: Sequence) -> List[int]:
        return [b.block_number for b in self.block_tables[seq.seq_id]]

    def get_num_free_gpu_blocks(self) -> int:
        if self.dp > 1:
            return sum(a.get_num_free_blocks()
                       for a in self.gpu_allocators)
        return self.gpu_allocator.get_num_free_blocks()

    def get_num_free_cpu_blocks(self) -> int:
        return self.cpu_allocator.get_num_free_blocks()

    # ---- prefix-cache hooks ------------------------------------------------
    def access_all_blocks_in_seq(self, seq: Sequence,
                                 access_time: float) -> None:
        if self.enable_caching:
            for block in self.block_tables[seq.seq_id]:
                block.last_accessed = access_time

    def compute_full_blocks_in_seq(self, seq: Sequence) -> None:
        if seq.seq_id not in self.block_tables:
            return
        # Mark every full block computed (called post-step).
        max_full = seq.get_len() // self.block_size
        table = self.block_tables[seq.seq_id]
        for i in range(max_full):
            table[i].computed = True

    def get_all_computed_blocks(self, seq: Sequence) -> List[int]:
        if seq.seq_id not in self.block_tables:
            return []
        table = self.block_tables[seq.seq_id]
        # Exclude the last block: it may still be written this step.
        out = []
        for b in table[:-1]:
            if b.computed:
                out.append(b.block_number)
            else:
                break
        return out

    def get_common_computed_block_ids(
            self, seqs: List[Sequence]) -> List[int]:
        if not self.enable_caching or not seqs:
            return []
        ids_list = [self.get_all_computed_blocks(s) for s in seqs]
        if not ids_list or not ids_list[0]:
            return []
        common = ids_list[0]
        for ids in ids_list[1:]:
            n = 0
            for a, b in zip(common, ids):
                if a != b:
                    break
                n += 1
            common = common[:n]
        return common

    def mark_blocks_as_computed(self, seq_group: SequenceGroup) -> None:
        if self.enable_caching:
            for seq in seq_group.get_seqs():
                self.compute_full_blocks_in_seq(seq)
