"""Continuous-batching scheduler.

Reference: vllm/core/scheduler.py (Scheduler:252, SchedulingBudget:41,
_schedule_default:752, _schedule_chunked_prefill:846, _preempt:1083,
schedule():962). Behavior parity:
  * waiting/running/swapped deques, FCFS policy, token+seq budget;
  * default mode: prefills prioritized, a batch is all-prefill or all-decode
    (scheduler.py:787-789); swapped queue blocks new prefills (:782);
  * chunked-prefill mode: decodes first, then running prefill chunks, then
    new prefills chunked to the remaining token budget (:846+,
    _get_num_new_tokens:1202);
  * preemption: last-arrived running group first; RECOMPUTE for single-seq
    groups, SWAP for multi-seq (:1083-1128).

TPU addition: the engine's bucketing is a scheduling input —
``max_num_batched_tokens``/``max_num_seqs`` bound the padded step shape, so
every schedule fits a precompiled bucket.
"""
import time
from collections import deque
from dataclasses import dataclass, field
from typing import Deque, Dict, Iterable, List, Optional, Set, Tuple, Union

from nmvllm_tpu.config import CacheConfig, LoRAConfig, SchedulerConfig
from nmvllm_tpu.core.block_manager import AllocStatus, BlockSpaceManager
from nmvllm_tpu.core.policy import Policy, PolicyFactory
from nmvllm_tpu.logger import init_logger
from nmvllm_tpu.sequence import (Sequence, SequenceGroup,
                                 SequenceGroupMetadata, SequenceStatus)

logger = init_logger(__name__)

ARTIFICIAL_PREEMPTION_PROB = 0.0


class PreemptionMode:
    SWAP = "swap"
    RECOMPUTE = "recompute"


@dataclass
class SchedulingBudget:
    """Token+seq budget for one step (reference scheduler.py:41)."""
    token_budget: int
    max_num_seqs: int
    _num_batched_tokens: int = 0
    _num_curr_seqs: int = 0
    _request_ids_num_batched_tokens: Set[str] = field(default_factory=set)
    _request_ids_num_curr_seqs: Set[str] = field(default_factory=set)

    def can_schedule(self, *, num_new_tokens: int, num_new_seqs: int) -> bool:
        assert num_new_tokens != 0
        assert num_new_seqs != 0
        return (self.num_batched_tokens + num_new_tokens <= self.token_budget
                and self.num_curr_seqs + num_new_seqs <= self.max_num_seqs)

    def remaining_token_budget(self) -> int:
        return self.token_budget - self.num_batched_tokens

    def add_num_batched_tokens(self, req_id: str, num: int) -> None:
        if req_id in self._request_ids_num_batched_tokens:
            return
        self._request_ids_num_batched_tokens.add(req_id)
        self._num_batched_tokens += num

    def subtract_num_batched_tokens(self, req_id: str, num: int) -> None:
        if req_id in self._request_ids_num_batched_tokens:
            self._request_ids_num_batched_tokens.remove(req_id)
            self._num_batched_tokens -= num

    def add_num_seqs(self, req_id: str, num: int) -> None:
        if req_id in self._request_ids_num_curr_seqs:
            return
        self._request_ids_num_curr_seqs.add(req_id)
        self._num_curr_seqs += num

    def subtract_num_seqs(self, req_id: str, num: int) -> None:
        if req_id in self._request_ids_num_curr_seqs:
            self._request_ids_num_curr_seqs.remove(req_id)
            self._num_curr_seqs -= num

    @property
    def num_batched_tokens(self) -> int:
        return self._num_batched_tokens

    @property
    def num_curr_seqs(self) -> int:
        return self._num_curr_seqs


@dataclass
class ScheduledSequenceGroup:
    seq_group: SequenceGroup
    token_chunk_size: int


@dataclass
class SchedulerOutputs:
    """What one schedule() call decided (reference scheduler.py:90)."""
    scheduled_seq_groups: List[ScheduledSequenceGroup]
    num_prefill_groups: int
    num_batched_tokens: int
    blocks_to_swap_in: List[Tuple[int, int]]
    blocks_to_swap_out: List[Tuple[int, int]]
    blocks_to_copy: List[Tuple[int, int]]
    ignored_seq_groups: List[SequenceGroup]
    num_lookahead_slots: int
    running_queue_size: int
    preempted: int

    def is_empty(self) -> bool:
        return (not self.scheduled_seq_groups
                and not self.blocks_to_swap_in
                and not self.blocks_to_swap_out and not self.blocks_to_copy)


class Scheduler:

    def __init__(self, scheduler_config: SchedulerConfig,
                 cache_config: CacheConfig,
                 lora_config: Optional[LoRAConfig] = None,
                 data_parallel_size: int = 1) -> None:
        self.scheduler_config = scheduler_config
        self.cache_config = cache_config
        self.lora_config = lora_config

        self.block_manager = BlockSpaceManager(
            block_size=cache_config.block_size,
            num_gpu_blocks=cache_config.num_gpu_blocks or 0,
            num_cpu_blocks=cache_config.num_cpu_blocks or 0,
            sliding_window=cache_config.sliding_window,
            enable_caching=cache_config.enable_prefix_caching,
            data_parallel_size=data_parallel_size,
            lookahead_slots=scheduler_config.num_lookahead_slots)

        self.policy: Policy = PolicyFactory.get_policy("fcfs")
        self.waiting: Deque[SequenceGroup] = deque()
        self.running: Deque[SequenceGroup] = deque()
        self.swapped: Deque[SequenceGroup] = deque()
        self.num_cumulative_preemption = 0
        # Called with seq_id whenever a sequence's resources are released
        # (finish/abort/preempt-recompute); used by stateful (Mamba) models
        # to free recurrent-state slots (reference: finished_requests_ids
        # plumbing for the Jamba cache).
        self.free_seq_hooks = []
        self.prev_time = 0.0
        self.prev_prompt = False
        self.last_prompt_latency = 0.0
        self.user_specified_preemption_mode = \
            scheduler_config.preemption_mode

    # ---- queue management --------------------------------------------------
    def add_seq_group(self, seq_group: SequenceGroup) -> None:
        self.waiting.append(seq_group)

    def abort_seq_group(self, request_id: Union[str, Iterable[str]]) -> None:
        if isinstance(request_id, str):
            request_id = (request_id,)
        request_ids = set(request_id)
        for state_queue in (self.waiting, self.running, self.swapped):
            aborted: List[SequenceGroup] = []
            for seq_group in state_queue:
                if not request_ids:
                    break
                if seq_group.request_id in request_ids:
                    aborted.append(seq_group)
                    request_ids.remove(seq_group.request_id)
            for seq_group in aborted:
                state_queue.remove(seq_group)
                for seq in seq_group.get_seqs():
                    if seq.is_finished():
                        continue
                    seq.status = SequenceStatus.FINISHED_ABORTED
                    self.free_seq(seq)

    def has_unfinished_seqs(self) -> bool:
        return bool(self.waiting or self.running or self.swapped)

    def get_num_unfinished_seq_groups(self) -> int:
        return len(self.waiting) + len(self.running) + len(self.swapped)

    def free_seq(self, seq: Sequence) -> None:
        self.block_manager.free(seq)
        for hook in self.free_seq_hooks:
            hook(seq.seq_id)

    def free_finished_seq_groups(self) -> None:
        self.running = deque(g for g in self.running if not g.is_finished())

    def fork_seq(self, parent_seq: Sequence, child_seq: Sequence) -> None:
        self.block_manager.fork(parent_seq, child_seq)

    # ---- main entry --------------------------------------------------------
    def schedule(
            self) -> Tuple[List[SequenceGroupMetadata], SchedulerOutputs]:
        scheduler_outputs = self._schedule()
        now = time.time()
        seq_group_metadata_list: List[SequenceGroupMetadata] = []
        for i, scheduled in enumerate(scheduler_outputs.scheduled_seq_groups):
            seq_group = scheduled.seq_group
            token_chunk_size = scheduled.token_chunk_size
            seq_group.maybe_set_first_scheduled_time(now)
            seq_data = {}
            block_tables = {}
            table_versions = {}
            for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
                seq_data[seq.seq_id] = seq.data
                block_tables[seq.seq_id] = \
                    self.block_manager.get_block_table(seq)
                table_versions[seq.seq_id] = \
                    self.block_manager.get_table_version(seq.seq_id)
                self.block_manager.access_all_blocks_in_seq(seq, now)
            common_computed = (
                self.block_manager.get_common_computed_block_ids(
                    seq_group.get_seqs(status=SequenceStatus.RUNNING)))
            is_prompt = seq_group.is_prefill()
            do_sample = True
            if is_prompt:
                seqs = seq_group.get_seqs()
                # Chunked prefill: only sample after the final chunk.
                if (token_chunk_size + seqs[0].data.get_num_computed_tokens()
                        < seqs[0].data.get_len()):
                    do_sample = False
            seq_group_metadata_list.append(
                SequenceGroupMetadata(
                    request_id=seq_group.request_id,
                    is_prompt=is_prompt,
                    seq_data=seq_data,
                    sampling_params=seq_group.sampling_params,
                    block_tables=block_tables,
                    do_sample=do_sample,
                    token_chunk_size=token_chunk_size,
                    computed_block_nums=common_computed,
                    lora_request=seq_group.lora_request,
                    multi_modal_data=seq_group.multi_modal_data,
                    state_seed=getattr(seq_group, "state_seed", None),
                    table_versions=table_versions,
                ))
        for scheduled in scheduler_outputs.scheduled_seq_groups:
            self.block_manager.mark_blocks_as_computed(scheduled.seq_group)
        return seq_group_metadata_list, scheduler_outputs

    def _schedule(self) -> SchedulerOutputs:
        if self.scheduler_config.chunked_prefill_enabled:
            return self._schedule_chunked_prefill()
        return self._schedule_default()

    # ---- default mode ------------------------------------------------------
    def _schedule_default(self) -> SchedulerOutputs:
        budget = SchedulingBudget(
            token_budget=self.scheduler_config.max_num_batched_tokens,
            max_num_seqs=self.scheduler_config.max_num_seqs)
        for seq_group in self.running:
            budget.add_num_seqs(seq_group.request_id,
                                seq_group.get_max_num_running_seqs())

        prefills: List[ScheduledSequenceGroup] = []
        ignored: List[SequenceGroup] = []
        # New prefills only when nothing is swapped out (scheduler.py:782).
        if not self.swapped:
            prefills, ignored = self._schedule_prefills(budget)

        blocks_to_swap_in: List[Tuple[int, int]] = []
        blocks_to_swap_out: List[Tuple[int, int]] = []
        blocks_to_copy: List[Tuple[int, int]] = []
        decodes: List[ScheduledSequenceGroup] = []
        preempted = 0
        if not prefills:
            decodes, preempted_groups = self._schedule_running(
                budget, blocks_to_swap_out, blocks_to_copy)
            preempted = len(preempted_groups)
            # Swap in only if nothing was just preempted.
            if preempted == 0:
                swapped_in = self._schedule_swapped(budget, blocks_to_swap_in,
                                                   blocks_to_copy)
                decodes.extend(swapped_in)

        scheduled = prefills if prefills else decodes
        return SchedulerOutputs(
            scheduled_seq_groups=scheduled,
            num_prefill_groups=len(prefills),
            num_batched_tokens=budget.num_batched_tokens if scheduled else 0,
            blocks_to_swap_in=blocks_to_swap_in,
            blocks_to_swap_out=blocks_to_swap_out,
            blocks_to_copy=blocks_to_copy,
            ignored_seq_groups=ignored,
            num_lookahead_slots=self.scheduler_config.num_lookahead_slots,
            running_queue_size=len(self.running),
            preempted=preempted)

    def _schedule_prefills(
            self, budget: SchedulingBudget, enable_chunking: bool = False
    ) -> Tuple[List[ScheduledSequenceGroup], List[SequenceGroup]]:
        prefills: List[ScheduledSequenceGroup] = []
        ignored: List[SequenceGroup] = []
        waiting = self.waiting
        leftover: Deque[SequenceGroup] = deque()
        while waiting:
            seq_group = waiting[0]
            seqs = seq_group.get_seqs(status=SequenceStatus.WAITING)
            # best_of siblings share the prompt: prefill compute is counted
            # once (the runner writes shared KV pages a single time).
            num_new_tokens = seqs[0].data.get_num_uncomputed_tokens()
            if enable_chunking:
                num_new_tokens = min(num_new_tokens,
                                     budget.remaining_token_budget())
            prompt_len = seqs[0].get_len()
            max_prompt = self.scheduler_config.max_model_len
            if not self.scheduler_config.chunked_prefill_enabled:
                max_prompt = min(
                    max_prompt,
                    self.scheduler_config.max_num_batched_tokens)
            if prompt_len > max_prompt:
                logger.warning(
                    "Input prompt (%d tokens) is too long and exceeds limit "
                    "of %d", prompt_len, max_prompt)
                for seq in seqs:
                    seq.status = SequenceStatus.FINISHED_IGNORED
                ignored.append(seq_group)
                waiting.popleft()
                continue
            can_allocate = self.block_manager.can_allocate(seq_group)
            if can_allocate == AllocStatus.LATER:
                break
            if can_allocate == AllocStatus.NEVER:
                logger.warning(
                    "Input prompt (%d tokens) is too long and exceeds the "
                    "capacity of the block manager", prompt_len)
                for seq in seqs:
                    seq.status = SequenceStatus.FINISHED_IGNORED
                ignored.append(seq_group)
                waiting.popleft()
                continue
            num_new_seqs = seq_group.get_max_num_running_seqs()
            if num_new_tokens == 0 or not budget.can_schedule(
                    num_new_tokens=num_new_tokens,
                    num_new_seqs=num_new_seqs):
                break
            waiting.popleft()
            self._allocate_and_set_running(seq_group)
            # Prefix-cache credit: tokens whose blocks are already computed
            # are skipped; the runner attends to them as a paged prefix
            # (reference: computed_block_nums flowing into the Triton
            # prefix-prefill path).
            if self.block_manager.enable_caching:
                seq = seqs[0]
                computed = self.block_manager.get_all_computed_blocks(seq)
                cached_tokens = min(
                    len(computed) * self.cache_config.block_size,
                    seq.get_len() - 1)
                if cached_tokens > 0:
                    seq.data.update_num_computed_tokens(cached_tokens)
                    num_new_tokens -= cached_tokens
            prefills.append(
                ScheduledSequenceGroup(seq_group, num_new_tokens))
            budget.add_num_batched_tokens(seq_group.request_id,
                                          num_new_tokens)
            budget.add_num_seqs(seq_group.request_id, num_new_seqs)
        waiting.extendleft(reversed(leftover))
        self.running.extend(s.seq_group for s in prefills)
        if prefills:
            self.prev_prompt = True
        return prefills, ignored

    def _schedule_running(
        self, budget: SchedulingBudget,
        blocks_to_swap_out: List[Tuple[int, int]],
        blocks_to_copy: List[Tuple[int, int]],
        enable_chunking: bool = False,
    ) -> Tuple[List[ScheduledSequenceGroup], List[SequenceGroup]]:
        scheduled: List[ScheduledSequenceGroup] = []
        preempted_groups: List[SequenceGroup] = []
        now = time.time()
        running = self.policy.sort_by_priority(now, self.running)
        self.running = deque()
        while running:
            seq_group = running.popleft()
            num_running_tokens = self._get_num_new_tokens(
                seq_group, SequenceStatus.RUNNING, enable_chunking, budget)
            if num_running_tokens == 0:
                break
            preempted_now = False
            while not self.block_manager.can_append_slots(
                    seq_group, self.scheduler_config.num_lookahead_slots):
                budget.subtract_num_batched_tokens(seq_group.request_id,
                                                   num_running_tokens)
                num_seqs = seq_group.get_max_num_running_seqs()
                budget.subtract_num_seqs(seq_group.request_id, num_seqs)
                if running:
                    # Preempt the lowest-priority (last) group.
                    victim = running.pop()
                else:
                    victim = seq_group
                    preempted_now = True
                self._preempt(victim, blocks_to_swap_out)
                preempted_groups.append(victim)
                if preempted_now:
                    break
            if not preempted_now:
                self._append_slots(seq_group, blocks_to_copy)
                # token_chunk_size is PER SEQUENCE (decode advances each
                # sibling by one token); the budget charges the group total.
                chunk = (num_running_tokens if seq_group.is_prefill()
                         else 1)
                scheduled.append(
                    ScheduledSequenceGroup(seq_group, chunk))
                self.running.append(seq_group)
                budget.add_num_batched_tokens(seq_group.request_id,
                                              num_running_tokens)
        return scheduled, preempted_groups

    def _schedule_swapped(
        self, budget: SchedulingBudget,
        blocks_to_swap_in: List[Tuple[int, int]],
        blocks_to_copy: List[Tuple[int, int]],
        enable_chunking: bool = False,
    ) -> List[ScheduledSequenceGroup]:
        scheduled: List[ScheduledSequenceGroup] = []
        now = time.time()
        swapped = self.policy.sort_by_priority(now, self.swapped)
        self.swapped = deque()
        leftover: Deque[SequenceGroup] = deque()
        while swapped:
            seq_group = swapped[0]
            alloc_status = self.block_manager.can_swap_in(
                seq_group, self.scheduler_config.num_lookahead_slots)
            if alloc_status == AllocStatus.LATER:
                break
            if alloc_status == AllocStatus.NEVER:
                logger.warning(
                    "Failing request %s: cannot swap in, aborting.",
                    seq_group.request_id)
                for seq in seq_group.get_seqs():
                    seq.status = SequenceStatus.FINISHED_IGNORED
                swapped.popleft()
                continue
            num_new_seqs = seq_group.get_max_num_running_seqs()
            num_new_tokens = self._get_num_new_tokens(
                seq_group, SequenceStatus.SWAPPED, enable_chunking, budget)
            if num_new_tokens == 0 or not budget.can_schedule(
                    num_new_tokens=num_new_tokens,
                    num_new_seqs=num_new_seqs):
                break
            swapped.popleft()
            self._swap_in(seq_group, blocks_to_swap_in)
            self._append_slots(seq_group, blocks_to_copy)
            self.running.append(seq_group)
            scheduled.append(
                ScheduledSequenceGroup(seq_group, num_new_tokens))
            budget.add_num_batched_tokens(seq_group.request_id,
                                          num_new_tokens)
            budget.add_num_seqs(seq_group.request_id, num_new_seqs)
        self.swapped = swapped
        self.swapped.extendleft(leftover)
        return scheduled

    # ---- chunked prefill mode ---------------------------------------------
    def _schedule_chunked_prefill(self) -> SchedulerOutputs:
        budget = SchedulingBudget(
            token_budget=self.scheduler_config.max_num_batched_tokens,
            max_num_seqs=self.scheduler_config.max_num_seqs)
        blocks_to_swap_in: List[Tuple[int, int]] = []
        blocks_to_swap_out: List[Tuple[int, int]] = []
        blocks_to_copy: List[Tuple[int, int]] = []

        # Decodes + running prefill chunks first (scheduler.py:846+).
        running_scheduled, preempted_groups = self._schedule_running(
            budget, blocks_to_swap_out, blocks_to_copy, enable_chunking=True)
        swapped_in: List[ScheduledSequenceGroup] = []
        if not preempted_groups:
            swapped_in = self._schedule_swapped(budget, blocks_to_swap_in,
                                                blocks_to_copy,
                                                enable_chunking=True)
        prefills, ignored = self._schedule_prefills(
            budget, enable_chunking=True) if not self.swapped else ([], [])

        # Order: decodes first, then prefills — the runner relies on it.
        decode_groups = [
            g for g in running_scheduled + swapped_in
            if not g.seq_group.is_prefill()
        ]
        prefill_groups = [
            g for g in running_scheduled + swapped_in
            if g.seq_group.is_prefill()
        ] + prefills
        return SchedulerOutputs(
            scheduled_seq_groups=decode_groups + prefill_groups,
            num_prefill_groups=len(prefill_groups),
            num_batched_tokens=budget.num_batched_tokens,
            blocks_to_swap_in=blocks_to_swap_in,
            blocks_to_swap_out=blocks_to_swap_out,
            blocks_to_copy=blocks_to_copy,
            ignored_seq_groups=ignored,
            num_lookahead_slots=self.scheduler_config.num_lookahead_slots,
            running_queue_size=len(self.running),
            preempted=len(preempted_groups))

    def _schedule_prefills_chunked(self, budget):
        return self._schedule_prefills(budget)

    # ---- helpers -----------------------------------------------------------
    def _get_num_new_tokens(self, seq_group: SequenceGroup,
                            status: SequenceStatus, enable_chunking: bool,
                            budget: SchedulingBudget) -> int:
        """Tokens to run this step (reference _get_num_new_tokens:1202)."""
        num_new_tokens = 0
        seqs = seq_group.get_seqs(status=status)
        for seq in seqs:
            num_new_tokens += seq.data.get_num_uncomputed_tokens()
        if enable_chunking and len(seqs) == 1:
            num_new_tokens = min(num_new_tokens,
                                 budget.remaining_token_budget())
        return num_new_tokens

    def _allocate_and_set_running(self, seq_group: SequenceGroup) -> None:
        self.block_manager.allocate(seq_group)
        for seq in seq_group.get_seqs(status=SequenceStatus.WAITING):
            seq.status = SequenceStatus.RUNNING

    def _append_slots(self, seq_group: SequenceGroup,
                      blocks_to_copy: List[Tuple[int, int]]) -> None:
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            # During a running prefill chunk, no new block growth happens
            # beyond what allocate() reserved.
            if seq.is_prefill():
                continue
            cows = self.block_manager.append_slots(
                seq, self.scheduler_config.num_lookahead_slots)
            blocks_to_copy.extend(cows)

    def _preempt(self, seq_group: SequenceGroup,
                 blocks_to_swap_out: List[Tuple[int, int]],
                 preemption_mode: Optional[str] = None) -> str:
        if self.user_specified_preemption_mode is None:
            if seq_group.get_max_num_running_seqs() == 1:
                mode = PreemptionMode.RECOMPUTE
            else:
                mode = PreemptionMode.SWAP
        elif self.user_specified_preemption_mode == "swap":
            mode = PreemptionMode.SWAP
        else:
            mode = PreemptionMode.RECOMPUTE
        if self.num_cumulative_preemption % 50 == 0:
            logger.warning(
                "Sequence group %s is preempted by %s mode because there is "
                "not enough KV cache space. total_num_cumulative_preemption"
                "=%d", seq_group.request_id, mode,
                self.num_cumulative_preemption + 1)
        self.num_cumulative_preemption += 1
        if mode == PreemptionMode.RECOMPUTE:
            self._preempt_by_recompute(seq_group)
        else:
            if not self.block_manager.can_swap_out(seq_group):
                raise RuntimeError(
                    "Aborted due to the lack of CPU swap space. Please "
                    "increase the swap space to avoid this error.")
            self._preempt_by_swap(seq_group, blocks_to_swap_out)
        return mode

    def _preempt_by_recompute(self, seq_group: SequenceGroup) -> None:
        seqs = seq_group.get_seqs(status=SequenceStatus.RUNNING)
        assert len(seqs) == 1
        for seq in seqs:
            seq.status = SequenceStatus.WAITING
            self.free_seq(seq)
            seq.reset_state_for_recompute()
        self.waiting.appendleft(seq_group)

    def _preempt_by_swap(self, seq_group: SequenceGroup,
                         blocks_to_swap_out: List[Tuple[int, int]]) -> None:
        mapping = self.block_manager.swap_out(seq_group)
        blocks_to_swap_out.extend(mapping)
        for seq in seq_group.get_seqs(status=SequenceStatus.RUNNING):
            seq.status = SequenceStatus.SWAPPED
        self.swapped.append(seq_group)

    def _swap_in(self, seq_group: SequenceGroup,
                 blocks_to_swap_in: List[Tuple[int, int]]) -> None:
        mapping = self.block_manager.swap_in(seq_group)
        blocks_to_swap_in.extend(mapping)
        for seq in seq_group.get_seqs(status=SequenceStatus.SWAPPED):
            seq.status = SequenceStatus.RUNNING
