"""Synchronous engine: request admission, step loop, output processing.

Reference: vllm/engine/llm_engine.py:66 (LLMEngine; add_request:560,
step:794, abort_request:686, _initialize_kv_caches:348). TPU-native: the
executor is in-process (SPMD over the mesh replaces the driver/worker
process topology), KV sizing comes from live HBM stats instead of an
empirical profiling pass, and each step dispatches to a bucketed compiled
function.
"""
import time
from typing import Any, Dict, Iterable, List, Optional, Union

from nmvllm_tpu.config import EngineConfig
from nmvllm_tpu.core.scheduler import Scheduler, SchedulerOutputs
from nmvllm_tpu.engine.arg_utils import EngineArgs
from nmvllm_tpu.engine.metrics import StatLogger, Stats
from nmvllm_tpu.engine.output_processor import (Detokenizer,
                                                SingleStepOutputProcessor,
                                                StopChecker)
from nmvllm_tpu.executor.executor import TPUExecutor
from nmvllm_tpu.logger import init_logger
from nmvllm_tpu.outputs import RequestOutput
from nmvllm_tpu.sampling_params import SamplingParams
from nmvllm_tpu.sequence import (ExecuteModelRequest, SamplerOutput,
                                 Sequence, SequenceGroup, SequenceStatus)
from nmvllm_tpu.utils import Counter
from nmvllm_tpu.version import __version__

logger = init_logger(__name__)


class LLMEngine:

    def __init__(self, engine_config: EngineConfig,
                 log_stats: bool = True) -> None:
        logger.info("Initializing nmvllm_tpu engine v%s with model %s",
                    __version__, engine_config.model_config.model)
        from nmvllm_tpu.logger import maybe_enable_trace_function_call
        maybe_enable_trace_function_call()
        self.config = engine_config
        self.model_config = engine_config.model_config
        self.cache_config = engine_config.cache_config
        self.scheduler_config = engine_config.scheduler_config
        self.parallel_config = engine_config.parallel_config
        self.log_stats = log_stats

        self.seq_counter = Counter()
        self.request_counter = Counter()

        if not self.model_config.skip_tokenizer_init:
            # TokenizerGroup: per-LoRA tokenizers + optional thread pool
            # (reference tokenizer_group/ + Ray pool -> thread pool).
            from nmvllm_tpu.transformers_utils.tokenizer_group import (
                TokenizerGroup)
            self.tokenizer_group = TokenizerGroup(
                self.model_config.tokenizer,
                tokenizer_mode=self.model_config.tokenizer_mode,
                trust_remote_code=self.model_config.trust_remote_code,
                pool_config=self.parallel_config.tokenizer_pool_config)
            self.tokenizer = self.tokenizer_group.tokenizer
            self.detokenizer = Detokenizer(self.tokenizer)
        else:
            self.tokenizer_group = None
            self.tokenizer = None
            self.detokenizer = None

        import os

        import jax as _jax
        # Per-step cross-host schedule fingerprint check (multi-host
        # pods; opt-in — it costs one tiny collective per step).
        self._multihost_check = (
            os.getenv("NMVLLM_MULTIHOST_CHECK", "0") not in ("0", "false")
            and _jax.process_count() > 1)
        self.executor = TPUExecutor(engine_config)
        self._initialize_kv_caches()

        self.scheduler = Scheduler(
            self.scheduler_config, self.cache_config,
            engine_config.lora_config,
            data_parallel_size=self.parallel_config.data_parallel_size)
        if getattr(self.executor.runner.model, "has_state_layers", False):
            # Stateful (Mamba/Jamba) models: free recurrent-state slots
            # with the sequence, and preempt by recompute only (swapped-in
            # sequences would resume with stale SSM state).
            self.scheduler.free_seq_hooks.append(
                self.executor.runner.free_state_slot)
            self.scheduler.user_specified_preemption_mode = "recompute"
        self.stop_checker = StopChecker(self.scheduler_config.max_model_len)
        self.output_processor = SingleStepOutputProcessor(
            self.detokenizer, self.stop_checker, self.scheduler,
            seq_counter=self.seq_counter)
        self.stat_logger = StatLogger(
            local_interval=5.0,
            labels=dict(model_name=self.model_config.served_model_name)
        ) if log_stats else None
        # Speculative decoding (reference SpecDecodeWorker,
        # spec_decode/spec_decode_worker.py:73): ngram prompt-lookup drafts
        # verified by one multi-query decode step with greedy acceptance.
        self.spec_config = engine_config.speculative_config
        self.spec_proposer = None
        self.spec_stats = {"num_drafted": 0, "num_accepted": 0,
                           "num_emitted": 0, "num_spec_steps": 0}
        if self.spec_config is not None and self.spec_config.method == \
                "ngram":
            from nmvllm_tpu.spec_decode.ngram_proposer import NGramProposer
            self.spec_proposer = NGramProposer(
                ngram_min=max(1, self.spec_config.ngram_prompt_lookup_min),
                ngram_max=self.spec_config.ngram_prompt_lookup_max,
                num_speculative_tokens=(
                    self.spec_config.num_speculative_tokens))
        elif self.spec_config is not None and self.spec_config.method == \
                "draft_model":
            # Marker: proposals come from the executor's draft runner, or
            # from the KV-less MLP speculator head (reference
            # MLPSpeculatorWorker) when the draft checkpoint is one.
            if getattr(self.executor, "mlp_speculator", None) is not None:
                self.spec_proposer = "mlp_speculator"
                self.scheduler.free_seq_hooks.append(
                    self.executor.runner.free_seq_hidden)
            else:
                self.spec_proposer = "draft_model"
        self.tracer = None
        if (engine_config.observability_config and
                engine_config.observability_config.otlp_traces_endpoint):
            from nmvllm_tpu.tracing import init_tracer
            self.tracer = init_tracer(
                "nmvllm_tpu.llm_engine",
                engine_config.observability_config.otlp_traces_endpoint)

    # ------------------------------------------------------------- factory
    @classmethod
    def from_engine_args(cls, engine_args: EngineArgs,
                         log_stats: Optional[bool] = None) -> "LLMEngine":
        engine_config = engine_args.create_engine_config()
        return cls(engine_config,
                   log_stats=not engine_args.disable_log_stats
                   if log_stats is None else log_stats)

    def _initialize_kv_caches(self) -> None:
        num_gpu_blocks, num_cpu_blocks = \
            self.executor.determine_num_available_blocks()
        if self.cache_config.num_gpu_blocks_override is not None:
            num_gpu_blocks = self.cache_config.num_gpu_blocks_override
        dp = self.parallel_config.data_parallel_size
        if dp > 1:
            # The device pool is partitioned over the data axis: replica r
            # owns ids [r*bpr, (r+1)*bpr) (core/block_manager.py).
            num_gpu_blocks -= num_gpu_blocks % dp
        self.cache_config.num_gpu_blocks = num_gpu_blocks
        self.cache_config.num_cpu_blocks = num_cpu_blocks
        logger.info("# device KV blocks: %d, # host swap blocks: %d",
                    num_gpu_blocks, num_cpu_blocks)
        self.executor.initialize_cache(num_gpu_blocks, num_cpu_blocks)

    # ----------------------------------------------------------- admission
    def add_request(
        self,
        request_id: str,
        prompt: Optional[str] = None,
        sampling_params: Optional[SamplingParams] = None,
        prompt_token_ids: Optional[List[int]] = None,
        arrival_time: Optional[float] = None,
        lora_request: Optional[Any] = None,
        trace_headers: Optional[Dict[str, str]] = None,
        multi_modal_data: Optional[Dict[str, Any]] = None,
    ) -> None:
        if sampling_params is None:
            sampling_params = SamplingParams()
        if arrival_time is None:
            arrival_time = time.time()
        if prompt_token_ids is None:
            if prompt is None:
                raise ValueError("Either prompt or prompt_token_ids "
                                 "must be provided.")
            prompt_token_ids = self.tokenizer_group.encode(prompt,
                                                           lora_request)
        if sampling_params.truncate_prompt_tokens is not None:
            prompt_token_ids = prompt_token_ids[
                -sampling_params.truncate_prompt_tokens:]

        sampling_params = sampling_params.clone()
        eos = None
        if self.tokenizer is not None:
            eos = getattr(self.tokenizer, "eos_token_id", None)
        sampling_params.update_from_generation_config(eos)
        if sampling_params.logprobs is not None:
            sampling_params.logprobs = min(sampling_params.logprobs,
                                           self.model_config.max_logprobs)

        block_size = self.cache_config.block_size
        if lora_request is not None:
            self.executor.runner.add_lora(lora_request)
        mapped_mm = None
        if multi_modal_data is not None:
            model = self.executor.runner.model
            if not getattr(model, "is_vision_model", False):
                raise ValueError(
                    "multi_modal_data passed to a text-only model.")
            from nmvllm_tpu.multimodal import MULTIMODAL_REGISTRY
            mapped_mm = MULTIMODAL_REGISTRY.map_input(self.model_config,
                                                      multi_modal_data)
            # Expand each image placeholder to num_image_tokens repeats
            # (reference: llava input processor / image_feature_size).
            tok = model.image_token_index
            n = mapped_mm.get("num_image_tokens") or model.num_image_tokens
            expanded = []
            for t in prompt_token_ids:
                expanded.extend([tok] * n if t == tok else [t])
            prompt_token_ids = expanded
        if sampling_params.use_beam_search:
            # Beam search starts from ONE sequence; beams fork in output
            # processing (reference single_step.py beam branch). Width is
            # bounded by the in-graph top-k logprob capture.
            from nmvllm_tpu.worker.runner import _MAX_NUM_LOGPROBS
            if 2 * sampling_params.best_of > _MAX_NUM_LOGPROBS:
                raise ValueError(
                    f"beam width (best_of) must be <= "
                    f"{_MAX_NUM_LOGPROBS // 2}.")
            seqs = [Sequence(next(self.seq_counter), prompt,
                             prompt_token_ids, block_size, eos,
                             lora_request)]
        else:
            # Parallel sampling: best_of sibling sequences share the
            # prompt's KV pages (block manager ref-counts them; decode
            # growth CoWs).
            seqs = []
            for _ in range(sampling_params.best_of):
                seq_id = next(self.seq_counter)
                seqs.append(Sequence(seq_id, prompt, prompt_token_ids,
                                     block_size, eos, lora_request))
        group = SequenceGroup(request_id=request_id, seqs=seqs,
                              arrival_time=arrival_time,
                              sampling_params=sampling_params,
                              lora_request=lora_request,
                              trace_headers=trace_headers,
                              multi_modal_data=mapped_mm)
        group.state_seed = next(self.request_counter)
        self.scheduler.add_seq_group(group)

    def abort_request(self, request_id: Union[str, Iterable[str]]) -> None:
        self.scheduler.abort_seq_group(request_id)

    # ------------------------------------------------------------ stepping
    def step(self) -> List[RequestOutput]:
        seq_group_metadata_list, scheduler_outputs = \
            self.scheduler.schedule()
        if self._multihost_check:
            # Host-replicated scheduling contract (parallel/multihost.py):
            # every host must have produced the identical schedule this
            # step — fingerprint it and compare across processes.
            from nmvllm_tpu.parallel.multihost import \
                assert_same_across_hosts
            fp = [(m.request_id, m.is_prompt, m.token_chunk_size,
                   sorted((sid, tuple(t), d.get_len()) for sid, t in
                          m.block_tables.items()
                          for d in (m.seq_data[sid],)))
                  for m in seq_group_metadata_list]
            assert_same_across_hosts(fp, "schedule fingerprint")
        if not scheduler_outputs.is_empty():
            execute_model_req = ExecuteModelRequest(
                seq_group_metadata_list=seq_group_metadata_list,
                blocks_to_swap_in=scheduler_outputs.blocks_to_swap_in,
                blocks_to_swap_out=scheduler_outputs.blocks_to_swap_out,
                blocks_to_copy=scheduler_outputs.blocks_to_copy,
                num_lookahead_slots=scheduler_outputs.num_lookahead_slots,
                running_queue_size=scheduler_outputs.running_queue_size)
            proposals = self._maybe_propose_drafts(seq_group_metadata_list,
                                                   scheduler_outputs)
            if proposals is not None:
                outputs = self.executor.execute_spec_decode(
                    execute_model_req, proposals,
                    self.spec_config.num_speculative_tokens)
            else:
                outputs = self.executor.execute_model(execute_model_req)
        else:
            outputs = []
        return self._process_model_outputs(outputs, scheduler_outputs)

    def _maybe_propose_drafts(self, metas, scheduler_outputs):
        """Build per-row ngram drafts, or None to run a normal step.

        Spec steps run only on all-decode batches of single-sequence
        groups; the in-graph verifier honors temperature, top-k/p, min_p
        and presence/frequency/repetition penalties (per-position history
        extension). Rows with features it cannot honor (logit_bias,
        guided masks, custom logits processors, active min_tokens) get an
        empty draft and decode normally inside the same compiled step
        (reference: dynamic spec-decode disable,
        speculative_disable_by_batch_size).
        """
        if self.spec_proposer is None:
            return None
        if scheduler_outputs.num_prefill_groups > 0 or not metas:
            return None
        disable_bs = self.spec_config.speculative_disable_by_batch_size
        if disable_bs is not None and len(metas) > disable_bs:
            return None
        # Sliding-window models: the verify step's multi-query attention
        # masks the window in-kernel (prefill_attention_with_paged_prefix
        # sliding_window arg), and the block manager sizes the circular
        # block table with `num_lookahead_slots` slots of headroom
        # (block_manager.py __init__) so a REJECTED speculative write can
        # only land on a ring slot whose aliased position is already
        # outside every later query's window — speculation is safe at any
        # sequence length.
        k_spec = self.spec_config.num_speculative_tokens
        eligible_rows = []
        for meta in metas:
            if len(meta.seq_data) != 1:
                return None  # parallel-sampling groups: no spec
            (seq_id, data), = meta.seq_data.items()
            sp = meta.sampling_params
            if sp is not None and sp.use_beam_search:
                return None  # beam batches need beam candidate assembly
            if sp is not None and any(
                    not getattr(p, "is_guided", False)
                    for p in sp.logits_processors):
                # Plain (callable) processors resample on the HOST from
                # the step's raw logits — a path only the normal decode
                # step has. Force the whole batch down it; in-graph
                # guided masks ride sampling tensors and stay spec-safe.
                return None
            # Greedy AND stochastic rows speculate (the verification step
            # runs modified rejection sampling with one-hot proposals);
            # features the in-graph verifier doesn't model stay excluded.
            eligible = (sp is not None
                        and not sp.logits_processors
                        and not sp.logit_bias
                        and data.get_output_len() >= sp.min_tokens)
            eligible_rows.append((eligible, data))

        if self.spec_proposer in ("draft_model", "mlp_speculator"):
            if not any(e for e, _ in eligible_rows):
                return None
            k = self.spec_config.num_speculative_tokens
            if self.spec_proposer == "mlp_speculator":
                proposals = self.executor.propose_mlp(metas, k)
                return [p if eligible_rows[i][0] else []
                        for i, p in enumerate(proposals)]
            drafts = self.executor.propose_drafts(metas, k)
            proposals = [
                (list(map(int, drafts[i])) if eligible_rows[i][0] else [])
                for i in range(len(metas))
            ]
            return proposals

        proposals = []
        any_draft = False
        for (eligible, data) in eligible_rows:
            prop = None
            if eligible:
                prop = self.spec_proposer.propose(data.get_token_ids())
            proposals.append(prop or [])
            any_draft = any_draft or bool(prop)
        if not any_draft:
            return None
        return proposals

    def _process_model_outputs(
            self, outputs: List[SamplerOutput],
            scheduler_outputs: SchedulerOutputs) -> List[RequestOutput]:
        now = time.time()
        request_outputs: List[RequestOutput] = []
        scheduled = scheduler_outputs.scheduled_seq_groups
        if outputs:
            output = outputs[0]
            is_spec = output.spec_decode_worker_metrics is not None
            if is_spec:
                m = output.spec_decode_worker_metrics
                self.spec_stats["num_drafted"] += m["num_drafted"]
                self.spec_stats["num_accepted"] += m["num_accepted"]
                self.spec_stats["num_emitted"] += m["num_emitted"]
                self.spec_stats["num_spec_steps"] += 1
            idx = 0
            for sched_group in scheduled:
                seq_group = sched_group.seq_group
                if not is_spec:
                    seq_group.update_num_computed_tokens(
                        sched_group.token_chunk_size)
                if idx < len(output.outputs):
                    group_output = output.outputs[idx]
                    idx += 1
                    if (group_output is not None
                            and group_output.prompt_logprobs is not None):
                        # First prompt token has no prefix -> None entry
                        # (reference process_prompt_logprob).
                        if not seq_group.prompt_logprobs:
                            seq_group.prompt_logprobs = [None]
                        seq_group.prompt_logprobs.extend(
                            group_output.prompt_logprobs)
                    if group_output is not None and group_output.samples:
                        num_appended = self.output_processor.process_outputs(
                            seq_group, group_output)
                        if is_spec:
                            # KV for the accepted prefix was written by the
                            # verification step; advance computed tokens by
                            # what was actually appended so exactly one
                            # uncomputed token remains.
                            seq_group.update_num_computed_tokens(
                                num_appended)
                seq_group.maybe_set_first_token_time(now)
        self.scheduler.free_finished_seq_groups()

        for sched_group in scheduled:
            seq_group = sched_group.seq_group
            # Only emit an output when the group progressed past prefill
            # chunks (parity: chunked prefill emits nothing mid-prompt).
            if seq_group.is_prefill() and not seq_group.is_finished():
                continue
            if seq_group.is_finished():
                seq_group.set_finished_time(now)
                self._create_trace_span(seq_group)
            request_outputs.append(RequestOutput.from_seq_group(seq_group))
        for seq_group in scheduler_outputs.ignored_seq_groups:
            request_outputs.append(RequestOutput.from_seq_group(seq_group))

        if self.stat_logger is not None:
            self.stat_logger.log(
                self._get_stats(scheduler_outputs, request_outputs))
        return request_outputs

    # -------------------------------------------------------------- queries
    def has_unfinished_requests(self) -> bool:
        return self.scheduler.has_unfinished_seqs()

    def get_num_unfinished_requests(self) -> int:
        return self.scheduler.get_num_unfinished_seq_groups()

    def get_model_config(self):
        return self.model_config

    def get_decoding_config(self):
        return self.config.decoding_config

    def check_health(self) -> None:
        self.executor.check_health()

    def _get_stats(self, scheduler_outputs: Optional[SchedulerOutputs],
                   request_outputs: Optional[List[RequestOutput]] = None
                   ) -> Stats:
        now = time.time()
        num_total_blocks = self.cache_config.num_gpu_blocks or 1
        num_free = self.scheduler.block_manager.get_num_free_gpu_blocks()
        gpu_cache_usage = 1.0 - num_free / num_total_blocks
        cpu_total = self.cache_config.num_cpu_blocks or 0
        cpu_usage = 0.0
        if cpu_total:
            cpu_free = self.scheduler.block_manager.get_num_free_cpu_blocks()
            cpu_usage = 1.0 - cpu_free / cpu_total

        num_prompt_tokens = 0
        num_generation_tokens = 0
        time_to_first_tokens = []
        time_per_output_tokens = []
        time_e2e_requests = []
        finished_reasons = []
        if scheduler_outputs is not None:
            for sg in scheduler_outputs.scheduled_seq_groups:
                group = sg.seq_group
                if group.is_prefill():
                    num_prompt_tokens += sg.token_chunk_size
                else:
                    num_generation_tokens += group.num_seqs(
                        SequenceStatus.RUNNING)
                metrics = group.metrics
                if metrics.first_token_time is not None and \
                        group.get_seqs()[0].get_output_len() == 1:
                    time_to_first_tokens.append(
                        metrics.first_token_time - metrics.arrival_time)
                else:
                    last = metrics.last_token_time
                    time_per_output_tokens.append(now - last)
                metrics.last_token_time = now
                if group.is_finished():
                    time_e2e_requests.append(now - metrics.arrival_time)
                    for seq in group.get_finished_seqs():
                        reason = SequenceStatus.get_finished_reason(
                            seq.status)
                        if reason:
                            finished_reasons.append(reason)
        return Stats(
            now=now,
            num_running_sys=len(self.scheduler.running),
            num_swapped_sys=len(self.scheduler.swapped),
            num_waiting_sys=len(self.scheduler.waiting),
            gpu_cache_usage_sys=gpu_cache_usage,
            cpu_cache_usage_sys=cpu_usage,
            num_prompt_tokens_iter=num_prompt_tokens,
            num_generation_tokens_iter=num_generation_tokens,
            time_to_first_tokens_iter=time_to_first_tokens,
            time_per_output_tokens_iter=time_per_output_tokens,
            time_e2e_requests=time_e2e_requests,
            finished_reason_requests=finished_reasons,
            num_preemption_iter=(scheduler_outputs.preempted
                                 if scheduler_outputs else 0))

    def _create_trace_span(self, seq_group: SequenceGroup) -> None:
        if self.tracer is None:
            return
        from nmvllm_tpu.tracing import emit_request_span
        emit_request_span(self.tracer, seq_group)
