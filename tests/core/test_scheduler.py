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
