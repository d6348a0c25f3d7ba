"""Scheduler unit tests (reference tests/core/test_scheduler.py)."""
import pytest

from nmvllm_tpu.config import CacheConfig, SchedulerConfig
from nmvllm_tpu.core.scheduler import Scheduler
from nmvllm_tpu.sequence import SequenceStatus
from tests.core.utils import append_token, create_dummy_prompt


def make_scheduler(max_num_seqs=8, max_num_batched_tokens=256,
                   num_gpu_blocks=64, num_cpu_blocks=8, block_size=4,
                   chunked=False, max_model_len=256):
    cache_config = CacheConfig(block_size=block_size)
    cache_config.num_gpu_blocks = num_gpu_blocks
    cache_config.num_cpu_blocks = num_cpu_blocks
    sched_config = SchedulerConfig(
        max_num_batched_tokens=max_num_batched_tokens,
        max_num_seqs=max_num_seqs, max_model_len=max_model_len,
        enable_chunked_prefill=chunked)
    return Scheduler(sched_config, cache_config)


def test_add_and_abort():
    sched = make_scheduler()
    _, g = create_dummy_prompt("1", 8)
    sched.add_seq_group(g)
    assert sched.has_unfinished_seqs()
    sched.abort_seq_group("1")
    assert not sched.has_unfinished_seqs()


def test_prefill_scheduled_first():
    sched = make_scheduler()
    for i in range(3):
        _, g = create_dummy_prompt(str(i), 8)
        sched.add_seq_group(g)
    metas, out = sched.schedule()
    assert out.num_prefill_groups == 3
    assert all(m.is_prompt for m in metas)
    assert out.num_batched_tokens == 24
    # All running now; next schedule is a decode batch.
    for m in metas:
        pass
    for g in list(sched.running):
        g.update_num_computed_tokens(8)
        for s in g.get_seqs(SequenceStatus.RUNNING):
            append_token(s, 1)
    metas2, out2 = sched.schedule()
    assert out2.num_prefill_groups == 0
    assert len(metas2) == 3
    assert all(not m.is_prompt for m in metas2)


def test_token_budget_limits_prefills():
    sched = make_scheduler(max_num_batched_tokens=16, max_model_len=16)
    for i in range(3):
        _, g = create_dummy_prompt(str(i), 10)
        sched.add_seq_group(g)
    metas, out = sched.schedule()
    # Only one 10-token prompt fits a 16-token budget.
    assert len(metas) == 1
    assert len(sched.waiting) == 2


def test_max_num_seqs_limit():
    sched = make_scheduler(max_num_seqs=2)
    for i in range(4):
        _, g = create_dummy_prompt(str(i), 4)
        sched.add_seq_group(g)
    metas, _ = sched.schedule()
    assert len(metas) == 2


def test_too_long_prompt_ignored():
    sched = make_scheduler(max_num_batched_tokens=256, max_model_len=16)
    _, g = create_dummy_prompt("1", 32)
    sched.add_seq_group(g)
    metas, out = sched.schedule()
    assert metas == []
    assert len(out.ignored_seq_groups) == 1
    assert g.get_seqs()[0].status == SequenceStatus.FINISHED_IGNORED


def test_preemption_by_recompute():
    # 8 blocks of 4 tokens; two 14-token seqs fill 8 blocks; decode growth
    # forces preemption of the later request.
    sched = make_scheduler(num_gpu_blocks=8, max_num_batched_tokens=64,
                           max_model_len=64)
    for i in range(2):
        _, g = create_dummy_prompt(str(i), 14)
        sched.add_seq_group(g)
    metas, out = sched.schedule()
    assert len(metas) == 2
    # Simulate decode steps until one must be preempted.
    preempted = False
    for step in range(10):
        for g in list(sched.running):
            g.update_num_computed_tokens(
                g.get_seqs()[0].data.get_num_uncomputed_tokens())
            for s in g.get_seqs(SequenceStatus.RUNNING):
                append_token(s, 1)
        metas, out = sched.schedule()
        if out.preempted:
            preempted = True
            break
    assert preempted
    assert len(sched.waiting) == 1  # recompute path requeues


def test_chunked_prefill_chunks_to_budget():
    sched = make_scheduler(chunked=True, max_num_batched_tokens=16,
                           max_model_len=128)
    _, g = create_dummy_prompt("1", 40)
    sched.add_seq_group(g)
    metas, out = sched.schedule()
    assert len(metas) == 1
    assert metas[0].token_chunk_size == 16
    assert metas[0].do_sample is False
    g.update_num_computed_tokens(16)
    metas, out = sched.schedule()
    assert metas[0].token_chunk_size == 16
    g.update_num_computed_tokens(16)
    metas, out = sched.schedule()
    assert metas[0].token_chunk_size == 8
    assert metas[0].do_sample is True


def test_chunked_prefill_mixes_decode_and_prefill():
    sched = make_scheduler(chunked=True, max_num_batched_tokens=16,
                           max_model_len=128)
    _, g1 = create_dummy_prompt("1", 8)
    sched.add_seq_group(g1)
    metas, _ = sched.schedule()
    g1.update_num_computed_tokens(8)
    for s in g1.get_seqs(SequenceStatus.RUNNING):
        append_token(s, 1)
    # Add a long prompt; next step should have g1 decode + g2 chunk.
    _, g2 = create_dummy_prompt("2", 30)
    sched.add_seq_group(g2)
    metas, out = sched.schedule()
    assert len(metas) == 2
    assert not metas[0].is_prompt  # decodes first
    assert metas[1].is_prompt
    assert metas[1].token_chunk_size == 15  # 16 - 1 decode token


# ---------------------------------------------------------------------------
# Round-3 depth: swap scheduling, preemption modes, fork/CoW, lookahead
# slots, prefix-cache credit (mirrors reference tests/core/test_scheduler.py
# swap/preempt/fork scope).
# ---------------------------------------------------------------------------

def make_scheduler2(**kw):
    """make_scheduler with the full SchedulerConfig surface exposed."""
    cache_kw = {}
    for k in ("num_gpu_blocks", "num_cpu_blocks", "block_size",
              "enable_prefix_caching"):
        if k in kw:
            cache_kw[k] = kw.pop(k)
    cache_config = CacheConfig(
        block_size=cache_kw.get("block_size", 4),
        enable_prefix_caching=cache_kw.get("enable_prefix_caching", False))
    cache_config.num_gpu_blocks = cache_kw.get("num_gpu_blocks", 64)
    cache_config.num_cpu_blocks = cache_kw.get("num_cpu_blocks", 8)
    sched_config = SchedulerConfig(
        max_num_batched_tokens=kw.pop("max_num_batched_tokens", 256),
        max_num_seqs=kw.pop("max_num_seqs", 8),
        max_model_len=kw.pop("max_model_len", 256), **kw)
    return Scheduler(sched_config, cache_config)


def run_decode_step(sched):
    """Advance every running group by one decode token."""
    for g in list(sched.running):
        g.update_num_computed_tokens(
            g.get_seqs()[0].data.get_num_uncomputed_tokens())
        for s in g.get_seqs(SequenceStatus.RUNNING):
            append_token(s, 1)


def fill_to_swap_preemption(sched, best_of=2):
    """Two 14-token groups on 8 blocks; decode until one is preempted."""
    for i in range(2):
        _, g = create_dummy_prompt(str(i), 14, best_of=best_of)
        sched.add_seq_group(g)
    metas, out = sched.schedule()
    assert len(metas) == 2
    for _ in range(10):
        run_decode_step(sched)
        metas, out = sched.schedule()
        if out.preempted:
            return out
    raise AssertionError("no preemption within 10 steps")


def test_preempt_by_swap_multi_seq():
    # best_of > 1 groups preempt by SWAP (recompute cannot reproduce
    # sibling divergence); swapped-out pages land in blocks_to_swap_out.
    sched = make_scheduler2(num_gpu_blocks=8, num_cpu_blocks=8,
                            max_num_batched_tokens=64, max_model_len=64)
    out = fill_to_swap_preemption(sched, best_of=2)
    assert out.blocks_to_swap_out          # (gpu, cpu) page pairs
    assert len(sched.swapped) == 1
    victim = sched.swapped[0]
    assert all(s.status == SequenceStatus.SWAPPED
               for s in victim.get_seqs())
    assert not sched.waiting


def test_swap_in_after_space_frees():
    sched = make_scheduler2(num_gpu_blocks=8, num_cpu_blocks=8,
                            max_num_batched_tokens=64, max_model_len=64)
    fill_to_swap_preemption(sched, best_of=2)
    survivor = sched.running[0]
    sched.abort_seq_group(survivor.request_id)   # frees its GPU blocks
    run_decode_step(sched)
    metas, out = sched.schedule()
    assert out.blocks_to_swap_in
    assert len(sched.swapped) == 0
    assert len(metas) == 1
    back = sched.running[0]
    assert all(s.status == SequenceStatus.RUNNING
               for s in back.get_seqs())


def test_no_new_prefills_while_swapped():
    # Default mode starves new prefills until swapped groups return
    # (reference scheduler.py:782 — avoids swap thrash).
    sched = make_scheduler2(num_gpu_blocks=8, num_cpu_blocks=8,
                            max_num_batched_tokens=64, max_model_len=64)
    fill_to_swap_preemption(sched, best_of=2)
    _, g3 = create_dummy_prompt("9", 4)
    sched.add_seq_group(g3)
    run_decode_step(sched)
    metas, out = sched.schedule()
    assert out.num_prefill_groups == 0
    assert g3 in sched.waiting


def test_preemption_mode_swap_override():
    # preemption_mode="swap" forces SWAP even for single-seq groups.
    sched = make_scheduler2(num_gpu_blocks=8, num_cpu_blocks=8,
                            max_num_batched_tokens=64, max_model_len=64,
                            preemption_mode="swap")
    out = fill_to_swap_preemption(sched, best_of=1)
    assert out.blocks_to_swap_out
    assert len(sched.swapped) == 1
    assert not sched.waiting


def test_preempt_swap_without_cpu_space_raises():
    sched = make_scheduler2(num_gpu_blocks=8, num_cpu_blocks=0,
                            max_num_batched_tokens=64, max_model_len=64,
                            preemption_mode="swap")
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="swap space"):
        fill_to_swap_preemption(sched, best_of=1)


def test_swap_roundtrip_restores_block_count():
    sched = make_scheduler2(num_gpu_blocks=8, num_cpu_blocks=8,
                            max_num_batched_tokens=64, max_model_len=64)
    fill_to_swap_preemption(sched, best_of=2)
    victim = sched.swapped[0]
    seq = victim.get_seqs()[0]
    n_cpu_used = 8 - sched.block_manager.get_num_free_cpu_blocks()
    assert n_cpu_used > 0
    sched.abort_seq_group(sched.running[0].request_id)
    run_decode_step(sched)
    sched.schedule()
    # All CPU copies freed again; GPU table covers the sequence.
    assert sched.block_manager.get_num_free_cpu_blocks() == 8
    table = sched.block_manager.get_block_table(seq)
    assert len(table) * 4 >= seq.get_len()


def test_abort_swapped_frees_cpu_blocks():
    sched = make_scheduler2(num_gpu_blocks=8, num_cpu_blocks=8,
                            max_num_batched_tokens=64, max_model_len=64)
    fill_to_swap_preemption(sched, best_of=2)
    victim = sched.swapped[0]
    sched.abort_seq_group(victim.request_id)
    assert sched.block_manager.get_num_free_cpu_blocks() == 8
    assert not sched.swapped


def test_fork_shares_blocks_then_cow_on_append():
    # Beam/parallel-sampling fork: child shares the parent's pages;
    # appending into a SHARED last block triggers a copy-on-write pair in
    # blocks_to_copy (reference test_scheduler fork/CoW cases).
    sched = make_scheduler2(num_gpu_blocks=16)
    seq, g = create_dummy_prompt("1", 6, best_of=2)
    sched.add_seq_group(g)
    sched.schedule()
    g.update_num_computed_tokens(6)
    append_token(seq, 1)
    child = seq.fork(1001)
    g.add(child)
    child.status = SequenceStatus.RUNNING
    sched.fork_seq(seq, child)
    pt = sched.block_manager.get_block_table(seq)
    ct = sched.block_manager.get_block_table(child)
    assert pt == ct                      # fully shared after fork
    free_before = sched.block_manager.get_num_free_gpu_blocks()
    run_decode_step(sched)
    metas, out = sched.schedule()
    assert out.blocks_to_copy            # CoW of the shared last block
    src, dst = out.blocks_to_copy[0]
    assert src in pt
    ct2 = sched.block_manager.get_block_table(child)
    assert ct2 != sched.block_manager.get_block_table(seq)
    assert sched.block_manager.get_num_free_gpu_blocks() < free_before


def test_fork_refcount_free_keeps_shared_blocks():
    sched = make_scheduler2(num_gpu_blocks=16)
    seq, g = create_dummy_prompt("1", 8, best_of=2)
    sched.add_seq_group(g)
    sched.schedule()
    g.update_num_computed_tokens(8)
    append_token(seq, 1)
    child = seq.fork(1002)
    g.add(child)
    child.status = SequenceStatus.RUNNING
    sched.fork_seq(seq, child)
    free0 = sched.block_manager.get_num_free_gpu_blocks()
    sched.free_seq(child)                # drops refcounts, not the pages
    assert sched.block_manager.get_num_free_gpu_blocks() == free0
    sched.free_seq(seq)                  # last owner: pages come back
    assert sched.block_manager.get_num_free_gpu_blocks() > free0


def test_lookahead_slots_grow_block_table():
    # Spec-decode lookahead: append_slots must reserve room for k extra
    # tokens beyond the sampled one (reference lookahead-slot accounting).
    sched = make_scheduler2(num_lookahead_slots=6)
    seq, g = create_dummy_prompt("1", 7)
    sched.add_seq_group(g)
    sched.schedule()
    g.update_num_computed_tokens(7)
    append_token(seq, 1)
    metas, out = sched.schedule()
    assert out.num_lookahead_slots == 6
    table = sched.block_manager.get_block_table(seq)
    # len 8 (+6 lookahead) = 14 -> ceil(14/4) = 4 blocks, not 2.
    assert len(table) == 4


def test_lookahead_slots_trigger_preemption_earlier():
    # With lookahead, can_append_slots needs (seqs + lookahead) free
    # blocks; a same-size workload that fits without lookahead preempts
    # with it.
    def steps_to_preempt(lookahead):
        sched = make_scheduler2(num_gpu_blocks=8, max_num_batched_tokens=64,
                                max_model_len=64,
                                num_lookahead_slots=lookahead)
        for i in range(2):
            _, g = create_dummy_prompt(str(i), 12)
            sched.add_seq_group(g)
        sched.schedule()
        for step in range(1, 10):
            run_decode_step(sched)
            _, out = sched.schedule()
            if out.preempted:
                return step
        return 10
    assert steps_to_preempt(6) < steps_to_preempt(0)


def test_prefix_cache_credit_reduces_prefill_tokens():
    # Second identical prompt only recomputes the tokens NOT covered by
    # computed prefix blocks (reference computed_block_nums credit).
    sched = make_scheduler2(enable_prefix_caching=True,
                            max_num_batched_tokens=64, max_model_len=64)
    seq1, g1 = create_dummy_prompt("1", 17)
    sched.add_seq_group(g1)
    metas, out = sched.schedule()
    assert out.num_batched_tokens == 17
    sched.block_manager.mark_blocks_as_computed(g1)
    seq2, g2 = create_dummy_prompt("2", 17)
    sched.add_seq_group(g2)
    metas, out = sched.schedule()
    # 4 full blocks (16 tokens) cached -> only 1 token recomputed.
    assert metas[-1].token_chunk_size == 1
    assert g2.get_seqs()[0].data.get_num_computed_tokens() == 16


def test_swapped_scheduled_before_new_prefills_chunked():
    # Chunked mode also gates prefills on an empty swapped queue.
    sched = make_scheduler2(num_gpu_blocks=8, num_cpu_blocks=8,
                            max_num_batched_tokens=64, max_model_len=64,
                            enable_chunked_prefill=True,
                            preemption_mode="swap")
    for i in range(2):
        _, g = create_dummy_prompt(str(i), 14)
        sched.add_seq_group(g)
    sched.schedule()
    preempted = False
    for _ in range(10):
        run_decode_step(sched)
        metas, out = sched.schedule()
        if out.preempted:
            preempted = True
            break
    assert preempted and sched.swapped
    _, g3 = create_dummy_prompt("9", 4)
    sched.add_seq_group(g3)
    run_decode_step(sched)
    metas, out = sched.schedule()
    assert out.num_prefill_groups == 0 and g3 in sched.waiting


def test_budget_counts_group_tokens_once_for_shared_prompt():
    # best_of siblings share the prompt: prefill charges the budget once.
    sched = make_scheduler2(max_num_batched_tokens=32, max_model_len=32)
    _, g = create_dummy_prompt("1", 20, best_of=2)
    sched.add_seq_group(g)
    metas, out = sched.schedule()
    assert len(metas) == 1
    assert out.num_batched_tokens == 20


def test_schedule_returns_empty_when_idle():
    sched = make_scheduler2()
    metas, out = sched.schedule()
    assert metas == [] and out.is_empty()
