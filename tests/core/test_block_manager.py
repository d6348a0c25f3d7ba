"""Block manager unit tests (reference tests/core/test_block_manager.py)."""
import pytest

from nmvllm_tpu.core.block_manager import (AllocStatus, BlockSpaceManager,
                                           CachedBlockAllocator,
                                           UncachedBlockAllocator)
from nmvllm_tpu.sequence import SequenceStatus
from tests.core.utils import append_token, create_dummy_prompt


def test_uncached_allocate_free():
    alloc = UncachedBlockAllocator("device", 16, 4)
    blocks = [alloc.allocate() for _ in range(4)]
    assert alloc.get_num_free_blocks() == 0
    with pytest.raises(ValueError):
        alloc.allocate()
    for b in blocks:
        alloc.free(b)
    assert alloc.get_num_free_blocks() == 4
    with pytest.raises(ValueError):
        alloc.free(blocks[0])


def test_cached_allocator_reuses_by_hash():
    alloc = CachedBlockAllocator("device", 16, 4)
    b1 = alloc.allocate(block_hash=123, num_hashed_tokens=16)
    assert b1.ref_count == 1
    b2 = alloc.allocate(block_hash=123, num_hashed_tokens=16)
    assert b2 is b1 and b1.ref_count == 2
    alloc.free(b1)
    alloc.free(b2)
    assert b1.ref_count == 0
    # Freed cached block is resurrectable from the evictor.
    b3 = alloc.allocate(block_hash=123, num_hashed_tokens=16)
    assert b3 is b1


def test_allocate_and_watermark():
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=8, num_cpu_blocks=8,
                           watermark=0.0)
    _, g1 = create_dummy_prompt("1", prompt_length=16, block_size=4)
    assert bm.can_allocate(g1) == AllocStatus.OK
    bm.allocate(g1)
    for s in g1.get_seqs():
        s.status = SequenceStatus.RUNNING
    assert bm.get_num_free_gpu_blocks() == 4
    # Too big to ever fit:
    _, g2 = create_dummy_prompt("2", prompt_length=100, block_size=4)
    assert bm.can_allocate(g2) == AllocStatus.NEVER
    # Fits eventually but not now:
    _, g3 = create_dummy_prompt("3", prompt_length=28, block_size=4)
    assert bm.can_allocate(g3) == AllocStatus.LATER


def test_append_slot_grows_table():
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=8, num_cpu_blocks=0,
                           watermark=0.0)
    seq, group = create_dummy_prompt("1", prompt_length=4, block_size=4)
    bm.allocate(group)
    seq.status = SequenceStatus.RUNNING
    assert len(bm.get_block_table(seq)) == 1
    append_token(seq, 7)
    cows = bm.append_slots(seq)
    assert cows == []
    assert len(bm.get_block_table(seq)) == 2


def test_fork_and_cow():
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=8, num_cpu_blocks=0,
                           watermark=0.0)
    seq, group = create_dummy_prompt("1", prompt_length=3, block_size=4)
    bm.allocate(group)
    seq.status = SequenceStatus.RUNNING
    child = seq.fork(100)
    bm.fork(seq, child)
    assert bm.get_block_table(seq) == bm.get_block_table(child)
    # Appending to the shared last block triggers CoW for the child.
    append_token(child, 5)
    cows = bm.append_slots(child)
    assert len(cows) == 1
    src, dst = cows[0]
    assert bm.get_block_table(child)[-1] == dst
    assert bm.get_block_table(seq)[-1] == src


def test_swap_out_in_roundtrip():
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=8, num_cpu_blocks=8,
                           watermark=0.0)
    seq, group = create_dummy_prompt("1", prompt_length=8, block_size=4)
    bm.allocate(group)
    seq.status = SequenceStatus.RUNNING
    gpu_blocks = bm.get_block_table(seq)
    assert bm.can_swap_out(group)
    mapping = bm.swap_out(group)
    assert sorted(m[0] for m in mapping) == sorted(gpu_blocks)
    seq.status = SequenceStatus.SWAPPED
    assert bm.get_num_free_gpu_blocks() == 8
    assert bm.can_swap_in(group) == AllocStatus.OK
    mapping_in = bm.swap_in(group)
    assert len(mapping_in) == 2
    seq.status = SequenceStatus.RUNNING
    assert bm.get_num_free_gpu_blocks() == 6


def test_free_releases_blocks():
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=8, num_cpu_blocks=0,
                           watermark=0.0)
    seq, group = create_dummy_prompt("1", prompt_length=8, block_size=4)
    bm.allocate(group)
    assert bm.get_num_free_gpu_blocks() == 6
    bm.free(seq)
    assert bm.get_num_free_gpu_blocks() == 8


def test_prefix_caching_shares_full_blocks():
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=16,
                           num_cpu_blocks=0, watermark=0.0,
                           enable_caching=True)
    seq1, g1 = create_dummy_prompt("1", prompt_length=8, block_size=4)
    bm.allocate(g1)
    seq2 = create_dummy_prompt("2", prompt_length=8, block_size=4)[0]
    _, g2 = create_dummy_prompt("2", prompt_length=8, block_size=4)
    bm.allocate(g2)
    t1 = bm.get_block_table(seq1)
    t2 = bm.get_block_table(g2.get_seqs()[0])
    # Same content -> same physical full blocks.
    assert t1 == t2
