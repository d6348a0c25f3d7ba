"""Block-manager depth tests (VERDICT r3 item 10): eviction
tie-breaks, hash promotion/demotion, sliding-window ring freeing,
watermark boundaries, CoW-at-block-edge under fork — mirroring the
reference suite's coverage (tests/core/test_block_manager.py)."""
import pytest

from nmvllm_tpu.core.block import PhysicalTokenBlock
from nmvllm_tpu.core.block_manager import (AllocStatus, BlockSpaceManager,
                                           CachedBlockAllocator)
from nmvllm_tpu.core.evictor import LRUEvictor
from nmvllm_tpu.sequence import SequenceStatus
from tests.core.utils import append_token, create_dummy_prompt


# ---------------------------------------------------------------- evictor
def _blk(h, num_hashed, accessed):
    b = PhysicalTokenBlock("device", h, 16, h, num_hashed)
    b.last_accessed = accessed
    return b


def test_evictor_lru_order():
    ev = LRUEvictor()
    ev.add(_blk(1, 16, accessed=100.0))
    ev.add(_blk(2, 16, accessed=50.0))
    ev.add(_blk(3, 16, accessed=75.0))
    assert ev.evict().block_hash == 2
    assert ev.evict().block_hash == 3
    assert ev.evict().block_hash == 1
    with pytest.raises(ValueError):
        ev.evict()


def test_evictor_tie_breaks_most_hashed_tokens():
    # Equal last_accessed: the block covering the LONGEST prefix is
    # evicted first (reference evictor_v1.py:53 tie-break).
    ev = LRUEvictor()
    ev.add(_blk(1, 16, accessed=10.0))
    ev.add(_blk(2, 48, accessed=10.0))
    ev.add(_blk(3, 32, accessed=10.0))
    assert ev.evict().block_hash == 2
    assert ev.evict().block_hash == 3
    assert ev.evict().block_hash == 1


def test_evictor_clears_computed_on_evict():
    ev = LRUEvictor()
    b = _blk(7, 16, accessed=1.0)
    b.computed = True
    ev.add(b)
    out = ev.evict()
    assert out is b and out.computed is False


def test_evictor_remove_missing_raises():
    ev = LRUEvictor()
    with pytest.raises(ValueError):
        ev.remove(99)


# ------------------------------------------------- cached allocator hashes
def test_cached_allocator_eviction_when_full():
    alloc = CachedBlockAllocator("device", 16, 2)
    b1 = alloc.allocate(block_hash=1, num_hashed_tokens=16)
    b2 = alloc.allocate(block_hash=2, num_hashed_tokens=32)
    assert alloc.get_num_free_blocks() == 0
    alloc.free(b1)
    alloc.free(b2)
    # Pool is full but both are evictable; a new hash reuses the LRU
    # victim's storage and takes the new identity.
    b1.last_accessed, b2.last_accessed = 5.0, 1.0
    b3 = alloc.allocate(block_hash=3, num_hashed_tokens=16)
    assert b3 is b2 and b3.block_hash == 3
    # Hash 1 is still resurrectable; hash 2's identity is gone.
    assert alloc.contains_block(1)
    assert not alloc.contains_block(2)


def test_cached_allocator_update_hash_moves_identity():
    alloc = CachedBlockAllocator("device", 16, 4)
    b = alloc.allocate()          # placeholder (negative default hash)
    ph = b.block_hash
    assert ph < 0
    alloc.update_hash(1234, b)
    assert b.block_hash == 1234
    assert alloc.contains_block(1234)
    assert not alloc.contains_block(ph)


def test_cached_allocator_default_hashes_unique():
    alloc = CachedBlockAllocator("device", 16, 4)
    b1, b2 = alloc.allocate(), alloc.allocate()
    assert b1.block_hash != b2.block_hash
    assert b1 is not b2


# ---------------------------------------------- last-block hash promotion
def test_promotion_on_block_boundary():
    """Filling the last block promotes its placeholder hash to the
    content hash (update_hash path: no prior block with that content)."""
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=16,
                           num_cpu_blocks=0, watermark=0.0,
                           enable_caching=True)
    seq, group = create_dummy_prompt("1", prompt_length=3, block_size=4)
    bm.allocate(group)
    seq.status = SequenceStatus.RUNNING
    last = bm.block_tables[seq.seq_id][-1]
    assert last.block_hash < 0            # placeholder
    append_token(seq, 7)                  # len 4: block now full
    assert bm.append_slots(seq) == []
    last = bm.block_tables[seq.seq_id][-1]
    assert last.block_hash == seq.hash_of_block(0)


def test_promotion_dedups_to_existing_block():
    """If another sequence already owns the promoted content hash, the
    fresh block is freed and the table points at the shared block
    (_promote_last_block contains_block branch)."""
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=16,
                           num_cpu_blocks=0, watermark=0.0,
                           enable_caching=True)
    # Sequence A: 4 tokens [0,1,2,3] -> full hashed block.
    seq_a, ga = create_dummy_prompt("1", prompt_length=4, block_size=4)
    bm.allocate(ga)
    seq_a.status = SequenceStatus.RUNNING
    shared = bm.block_tables[seq_a.seq_id][0]
    # Sequence B: 3 tokens [0,1,2], then appends token 3 -> same content.
    seq_b, gb = create_dummy_prompt("2", prompt_length=3, block_size=4)
    bm.allocate(gb)
    seq_b.status = SequenceStatus.RUNNING
    fresh = bm.block_tables[seq_b.seq_id][0]
    assert fresh is not shared
    free_before = bm.get_num_free_gpu_blocks()
    append_token(seq_b, 3)
    assert bm.append_slots(seq_b) == []
    assert bm.block_tables[seq_b.seq_id][0] is shared
    assert shared.ref_count == 2
    assert bm.get_num_free_gpu_blocks() == free_before + 1  # fresh freed


def test_fork_then_append_at_block_edge_cows_promoted_block():
    """Fork at a full block boundary: the parent's append lands in a NEW
    block (no CoW); the child appending into the same logical block also
    allocates fresh (the shared last block stays intact)."""
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=16,
                           num_cpu_blocks=0, watermark=0.0)
    seq, group = create_dummy_prompt("1", prompt_length=4, block_size=4)
    bm.allocate(group)
    seq.status = SequenceStatus.RUNNING
    child = seq.fork(100)
    bm.fork(seq, child)
    assert bm.block_tables[seq.seq_id][0].ref_count == 2
    #

    append_token(seq, 9)           # len 5 -> needs block 1 (fresh)
    assert bm.append_slots(seq) == []
    append_token(child, 8)
    assert bm.append_slots(child) == []
    t_p = bm.get_block_table(seq)
    t_c = bm.get_block_table(child)
    assert t_p[0] == t_c[0]        # shared full block untouched
    assert t_p[1] != t_c[1]        # divergent tails, no copies needed


def test_cow_mid_block_after_fork():
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=16,
                           num_cpu_blocks=0, watermark=0.0)
    seq, group = create_dummy_prompt("1", prompt_length=6, block_size=4)
    bm.allocate(group)
    seq.status = SequenceStatus.RUNNING
    child = seq.fork(100)
    bm.fork(seq, child)
    append_token(seq, 9)           # len 7: still inside block 1 (shared)
    cows = bm.append_slots(seq)
    assert len(cows) == 1
    src, dst = cows[0]
    assert bm.get_block_table(seq)[1] == dst
    assert bm.get_block_table(child)[1] == src
    # The child now holds block 1 exclusively: its append needs no copy.
    append_token(child, 8)
    assert bm.append_slots(child) == []


# ------------------------------------------------------- sliding window
def test_sliding_window_ring_reuses_blocks():
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=16,
                           num_cpu_blocks=0, watermark=0.0,
                           sliding_window=8)   # ring of 2 blocks
    seq, group = create_dummy_prompt("1", prompt_length=16, block_size=4)
    bm.allocate(group)
    seq.status = SequenceStatus.RUNNING
    table = bm.get_block_table(seq)
    assert len(table) == 4
    # Logical blocks beyond the ring alias ring slots.
    assert table[2] == table[0] and table[3] == table[1]
    assert bm.get_num_free_gpu_blocks() == 14   # only 2 physical


def test_sliding_window_append_allocates_nothing_beyond_ring():
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=16,
                           num_cpu_blocks=0, watermark=0.0,
                           sliding_window=8)
    seq, group = create_dummy_prompt("1", prompt_length=8, block_size=4)
    bm.allocate(group)
    seq.status = SequenceStatus.RUNNING
    free0 = bm.get_num_free_gpu_blocks()
    for i in range(8):             # grow by 2 more logical blocks
        append_token(seq, i)
        assert bm.append_slots(seq) == []
    assert bm.get_num_free_gpu_blocks() == free0  # ring reused, 0 allocs


def test_sliding_window_free_releases_ring_once():
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=16,
                           num_cpu_blocks=0, watermark=0.0,
                           sliding_window=8)
    seq, group = create_dummy_prompt("1", prompt_length=24, block_size=4)
    bm.allocate(group)
    seq.status = SequenceStatus.RUNNING
    bm.free(seq)
    assert bm.get_num_free_gpu_blocks() == 16
    # Refcounts fully drained: a second free is a no-op (table gone).
    bm.free(seq)
    assert bm.get_num_free_gpu_blocks() == 16


def test_sliding_window_lookahead_grows_ring():
    # Speculative lookahead slots extend the ring span
    # (block_manager.py sliding-window + lookahead comment).
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=16,
                           num_cpu_blocks=0, watermark=0.0,
                           sliding_window=8, lookahead_slots=4)
    assert bm.block_sliding_window == 3        # ceil((8+4)/4)


# ------------------------------------------------------------ watermark
def test_watermark_boundary_exact():
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=10,
                           num_cpu_blocks=0, watermark=0.2)
    assert bm.watermark_blocks == 2
    # 8 free after allocation needed: 10 - 8 = 2 == watermark -> OK.
    _, g = create_dummy_prompt("1", prompt_length=32, block_size=4)
    assert bm.can_allocate(g) == AllocStatus.OK
    # 9 blocks needed: 10 - 9 = 1 < watermark -> NEVER (can never hold
    # the watermark headroom).
    _, g2 = create_dummy_prompt("2", prompt_length=36, block_size=4)
    assert bm.can_allocate(g2) == AllocStatus.NEVER


def test_watermark_later_when_temporarily_full():
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=10,
                           num_cpu_blocks=0, watermark=0.2)
    seq, g = create_dummy_prompt("1", prompt_length=24, block_size=4)
    bm.allocate(g)                  # 6 used, 4 free
    _, g2 = create_dummy_prompt("2", prompt_length=12, block_size=4)
    # needs 3, free 4: 4 - 3 = 1 < 2 -> LATER; freeing makes it OK.
    assert bm.can_allocate(g2) == AllocStatus.LATER
    bm.free(seq)
    assert bm.can_allocate(g2) == AllocStatus.OK


def test_can_append_slots_with_lookahead():
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=4,
                           num_cpu_blocks=0, watermark=0.0)
    seq, g = create_dummy_prompt("1", prompt_length=8, block_size=4)
    bm.allocate(g)                  # 2 used, 2 free
    seq.status = SequenceStatus.RUNNING
    assert bm.can_append_slots(g, num_lookahead_slots=1)
    assert not bm.can_append_slots(g, num_lookahead_slots=2)


# --------------------------------------------------- swap with shared fork
def test_swap_roundtrip_preserves_fork_sharing():
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=8,
                           num_cpu_blocks=8, watermark=0.0)
    seq, group = create_dummy_prompt("1", prompt_length=8, block_size=4)
    bm.allocate(group)
    seq.status = SequenceStatus.RUNNING
    child = seq.fork(100)
    bm.fork(seq, child)
    group.add(child)
    assert bm.can_swap_out(group)
    mapping = bm.swap_out(group)
    assert len(mapping) == 2        # unique blocks copied once
    for s in (seq, child):
        s.status = SequenceStatus.SWAPPED
    # Shared CPU blocks carry the combined refcount.
    cpu_table = bm.block_tables[seq.seq_id]
    assert all(b.ref_count == 2 for b in cpu_table)
    assert bm.block_tables[child.seq_id] == cpu_table
    assert bm.get_num_free_gpu_blocks() == 8
    mapping_in = bm.swap_in(group)
    assert len(mapping_in) == 2
    assert bm.block_tables[seq.seq_id] == bm.block_tables[child.seq_id]
    assert all(b.ref_count == 2
               for b in bm.block_tables[seq.seq_id])
    assert bm.get_num_free_cpu_blocks() == 8


# ------------------------------------------------ computed-prefix queries
def test_get_common_computed_block_ids_divergence():
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=16,
                           num_cpu_blocks=0, watermark=0.0,
                           enable_caching=True)
    seq1, g1 = create_dummy_prompt("1", prompt_length=12, block_size=4)
    bm.allocate(g1)
    bm.compute_full_blocks_in_seq(seq1)
    # Same first 8 tokens, divergent third block.
    seq2 = create_dummy_prompt("2", prompt_length=8, block_size=4)[0]
    seq2.data.prompt_token_ids = list(range(8))
    _, g2 = create_dummy_prompt("2", prompt_length=8, block_size=4)
    bm.allocate(g2)
    seq2 = g2.get_seqs()[0]
    bm.compute_full_blocks_in_seq(seq2)
    common = bm.get_common_computed_block_ids([seq1, seq2])
    # Last block excluded (still writable); shared prefix = block 0.
    t1, t2 = bm.get_block_table(seq1), bm.get_block_table(seq2)
    assert common == [b for b in t1[:len(common)]]
    assert all(a == b for a, b in zip(common, t2))


def test_table_version_bumps_on_mutation():
    bm = BlockSpaceManager(block_size=4, num_gpu_blocks=8,
                           num_cpu_blocks=8, watermark=0.0)
    seq, group = create_dummy_prompt("1", prompt_length=4, block_size=4)
    v0 = bm.get_table_version(seq.seq_id)
    bm.allocate(group)
    seq.status = SequenceStatus.RUNNING
    v1 = bm.get_table_version(seq.seq_id)
    assert v1 > v0
    append_token(seq, 7)
    bm.append_slots(seq)            # grows table
    v2 = bm.get_table_version(seq.seq_id)
    assert v2 > v1
    bm.swap_out(group)
    v3 = bm.get_table_version(seq.seq_id)
    assert v3 > v2
