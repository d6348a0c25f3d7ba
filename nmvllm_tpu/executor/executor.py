"""In-process TPU executor.

Reference: vllm/executor/executor_base.py:12 (ExecutorBase:
determine_num_available_blocks:49, initialize_cache:65, execute_model:72)
and executor/tpu_executor.py. TPU-native: there is no driver/worker process
split — SPMD over the jax mesh replaces Ray/multiprocessing topology
(SURVEY.md §7 decision 1); this executor owns the mesh, the runner, and the
cache engine in-process. Multi-host pods run one identical engine per host
with deterministic replicated scheduling.
"""
from typing import List, Optional, Tuple

from nmvllm_tpu.config import EngineConfig
from nmvllm_tpu.logger import init_logger
from nmvllm_tpu.parallel.mesh import build_mesh, set_global_mesh
from nmvllm_tpu.sequence import ExecuteModelRequest, SamplerOutput
from nmvllm_tpu.utils import device_memory_total, device_memory_used
from nmvllm_tpu.worker.cache import CacheEngine
from nmvllm_tpu.worker.runner import ModelRunner

logger = init_logger(__name__)


class TPUExecutor:

    def __init__(self, engine_config: EngineConfig) -> None:
        self.config = engine_config
        parallel = engine_config.parallel_config
        if parallel.pipeline_parallel_size > 1:
            # PP: (pp, tp) mesh + the GPipe stage-ring runner
            # (worker/pp_runner.py). The engine loop is unchanged — the
            # whole ring advances inside one compiled SPMD step.
            from nmvllm_tpu.parallel.mesh import build_pp_mesh
            from nmvllm_tpu.worker.pp_runner import PipelineModelRunner
            if parallel.data_parallel_size > 1:
                # PP×DP: stage ring over `pp`, batch rows + KV pool over
                # `data` (same replica-partitioned pool as single-stage
                # DP). Features carrying extra per-row device state keep
                # the single-stage DP restrictions.
                if engine_config.speculative_config is not None:
                    raise ValueError("Speculative decoding is not "
                                     "supported with data_parallel_size "
                                     "> 1.")
                if engine_config.lora_config is not None:
                    raise ValueError("LoRA is not supported with "
                                     "data_parallel_size > 1.")
            spec = engine_config.speculative_config
            if spec is not None and spec.method not in ("ngram",
                                                        "draft_model"):
                # ngram drafts are host-side and draft models run as a
                # plain replicated runner on the pp mesh (below); both
                # verify through the stage ring
                # (pp_runner._get_spec_decode_fn). MLP-speculators need
                # the TARGET's hidden states (capture_hidden), which the
                # stage scan does not expose.
                raise ValueError(
                    "MLP-speculator speculative decoding is not "
                    "supported with pipeline_parallel_size > 1 (use "
                    "ngram_prompt_lookup_max or a draft model).")
            import jax
            pp_devices = None
            if jax.process_count() > 1:
                # Multi-host PP (round 5): stages are OUTERMOST in the
                # (pp, data, tp) mesh, so host-major device ordering
                # puts each stage's data x tp block on one host (ICI)
                # and the stage ring crosses DCN once per hop — the
                # reference's cross-node PP send/recv analogue
                # (vllm/distributed/parallel_state.py:562-649), here a
                # ppermute XLA lays onto the slow links. Scheduling
                # stays host-replicated (parallel/multihost.py).
                pp_devices = sorted(jax.devices(),
                                    key=lambda d: (d.process_index, d.id))
            self.mesh = build_pp_mesh(
                parallel.pipeline_parallel_size,
                parallel.tensor_parallel_size,
                devices=pp_devices,
                data_parallel_size=parallel.data_parallel_size)
            set_global_mesh(self.mesh)
            if pp_devices is not None:
                self._pod_startup_health_check()
            self._maybe_init_compile_cache()
            self.runner = PipelineModelRunner(engine_config, self.mesh)
        else:
            if parallel.data_parallel_size > 1:
                # In-engine data parallelism (beyond the reference):
                # batch rows + the KV pool shard over the data axis.
                # Features that carry extra per-row device state are not
                # yet DP-aware.
                if engine_config.speculative_config is not None:
                    raise ValueError("Speculative decoding is not "
                                     "supported with data_parallel_size "
                                     "> 1.")
                if engine_config.lora_config is not None:
                    raise ValueError("LoRA is not supported with "
                                     "data_parallel_size > 1.")
            if parallel.sequence_parallel_size > 1:
                # Sequence-parallel (ring-attention) prefill supports
                # plain causal attention on full, unchunked prompts.
                if engine_config.scheduler_config.chunked_prefill_enabled:
                    raise ValueError("sequence_parallel_size > 1 does "
                                     "not support chunked prefill.")
                if engine_config.cache_config.enable_prefix_caching:
                    raise ValueError("sequence_parallel_size > 1 does "
                                     "not support prefix caching.")
                if engine_config.speculative_config is not None:
                    raise ValueError("sequence_parallel_size > 1 does "
                                     "not support speculative decoding.")
            import jax
            if jax.process_count() > 1:
                # Multi-host pod: one identical engine per host over the
                # GLOBAL device set (host-replicated scheduling,
                # parallel/multihost.py). tp groups are host-major so
                # they ride ICI; only dp crosses DCN. The caller (or the
                # pod runtime) initializes jax.distributed first.
                if parallel.sequence_parallel_size > 1:
                    raise ValueError(
                        "multi-host meshes support pp x dp x tp; "
                        "sequence parallelism is single-host (the sp "
                        "ring assumes ICI-contiguous devices)")
                from nmvllm_tpu.parallel.multihost import build_pod_mesh
                self.mesh = build_pod_mesh(
                    parallel.data_parallel_size,
                    parallel.tensor_parallel_size)
                self._pod_startup_health_check()
            else:
                self.mesh = build_mesh(
                    parallel.data_parallel_size,
                    parallel.tensor_parallel_size,
                    sequence_parallel_size=parallel.sequence_parallel_size)
            set_global_mesh(self.mesh)
            self._maybe_init_compile_cache()
            self.runner = ModelRunner(engine_config, self.mesh)
        self.runner.load_model()
        if (parallel.data_parallel_size > 1 and
                getattr(self.runner.model, "has_state_layers", False)):
            raise ValueError("Stateful (Mamba/Jamba) models are not "
                             "supported with data_parallel_size > 1.")
        if (parallel.sequence_parallel_size > 1 and
                getattr(self.runner.model, "has_state_layers", False)):
            raise ValueError("Stateful (Mamba/Jamba) models are not "
                             "supported with sequence_parallel_size > 1 "
                             "(the state scan cannot shard along tokens).")
        if (parallel.sequence_parallel_size > 1 and not getattr(
                self.runner.model, "supports_sequence_parallel", False)):
            raise ValueError(
                "This model family's attention does not implement the "
                "sequence-parallel ring-prefill hook; running it with "
                "sequence_parallel_size > 1 would silently shard prefill "
                "attention incorrectly.")
        self.cache_engine: Optional[CacheEngine] = None
        # Draft-model speculative decoding (reference SpecDecodeWorker /
        # MultiStepWorker): a second runner + KV pool; the draft's KV is
        # kept in sync by piggybacking on prefill and decode steps.
        self.draft_runner: Optional[ModelRunner] = None
        self.draft_cache_engine: Optional[CacheEngine] = None
        self.mlp_speculator = None
        self.mlp_speculator_params = None
        spec = engine_config.speculative_config
        if spec is not None and spec.draft_model:
            import dataclasses

            from nmvllm_tpu.config import ModelConfig
            mc = engine_config.model_config
            draft_mc = ModelConfig(
                model=spec.draft_model, tokenizer=mc.tokenizer,
                dtype=mc.dtype, seed=mc.seed,
                max_model_len=mc.max_model_len)
            archs = getattr(draft_mc.hf_config, "architectures", None) or []
            if any("MLPSpeculator" in a for a in archs):
                # KV-less draft head conditioned on the target's hidden
                # states (reference MLPSpeculatorWorker,
                # spec_decode/mlp_speculator_worker.py:12).
                if engine_config.parallel_config.pipeline_parallel_size > 1:
                    raise ValueError(
                        "MLP-speculator speculative decoding is not "
                        "supported with pipeline_parallel_size > 1: the "
                        "stage scan does not expose the target's hidden "
                        "states (capture_hidden). Use ngram or a draft "
                        "model.")
                import jax as _jax

                from nmvllm_tpu.models.mlp_speculator import MLPSpeculator
                self.mlp_speculator = MLPSpeculator(draft_mc.hf_config)
                params = self.mlp_speculator.init(
                    _jax.random.PRNGKey(mc.seed))
                import os
                if os.path.isdir(draft_mc.model):
                    params = self.mlp_speculator.load_from_dir(
                        params, draft_mc.model)
                self.mlp_speculator_params = params
                self._mlp_propose_jit = _jax.jit(
                    self.mlp_speculator.propose, static_argnums=(3,))
                self.runner.capture_hidden = True
            else:
                draft_parallel = engine_config.parallel_config
                # The pp=1 rebuild below carries only tp; it would
                # mis-size the draft cache if spec+DP were ever allowed.
                assert draft_parallel.data_parallel_size == 1, (
                    "draft-model spec decoding assumes dp == 1 (guarded "
                    "above); update the draft ParallelConfig rebuild if "
                    "that guard is relaxed")
                if draft_parallel.pipeline_parallel_size > 1:
                    # Under PP the draft runs as a plain single-stage
                    # runner REPLICATED over the pp (and data) mesh axes:
                    # its params/KV specs mention only `tp`, so every
                    # stage holds the full draft and proposals need no
                    # stage ring. Give it a pp=1 config so its
                    # CacheEngine allocates the flat per-layer layout.
                    from nmvllm_tpu.config import ParallelConfig
                    draft_parallel = ParallelConfig(
                        pipeline_parallel_size=1,
                        tensor_parallel_size=(
                            draft_parallel.tensor_parallel_size))
                self._draft_config = dataclasses.replace(
                    engine_config, model_config=draft_mc,
                    parallel_config=draft_parallel,
                    speculative_config=None)
                self.draft_runner = ModelRunner(self._draft_config,
                                                self.mesh)
                self.draft_runner.load_model()
        # Draft-KV freshness: seq_id -> highest position p such that the
        # draft's KV is correct-and-final for ALL positions <= p. Kept by
        # every path that advances the draft's cache; propose_drafts
        # backfills any gap before proposing (staleness only lowers
        # acceptance, never correctness — the target verifies). A propose
        # run's speculative writes resolve lazily (_resolve_draft_upto):
        # accepted tokens ARE the proposals, so proposal-chain writes
        # count once the next step reveals how far acceptance got.
        self._draft_upto = {}
        self._draft_pending_k = {}

    def _maybe_init_compile_cache(self) -> None:
        from nmvllm_tpu import envs
        path = envs.NMVLLM_XLA_CACHE_PATH
        if path:
            try:
                import jax
                jax.config.update("jax_compilation_cache_dir", path)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 1.0)
            except Exception as e:
                logger.warning("Could not enable XLA compile cache: %s", e)

    # ------------------------------------------------------------- KV sizing
    def determine_num_available_blocks(self) -> Tuple[int, int]:
        """Size the paged KV pool from live HBM stats (the reference's TPU
        path uses xm.get_memory_info the same way, tpu_worker.py:107-140)."""
        cache_config = self.config.cache_config
        model_config = self.config.model_config
        parallel_config = self.config.parallel_config
        block_bytes = CacheEngine.get_cache_block_size(
            cache_config, model_config, parallel_config)
        # Per-device share of one (global) page: kv heads shard over tp;
        # layers shard over pp (already divided out inside
        # get_cache_block_size via get_num_layers).
        tp = parallel_config.tensor_parallel_size
        block_bytes_per_dev = max(block_bytes // tp, 1)
        total = device_memory_total()
        used = device_memory_used()
        # Step-transient allowance: prefill executables reserve ~0.9 MB
        # of temp per batched token (measured 1.84 GB at 2048 tokens via
        # AOT memory_analysis, round 5), and several compiled buckets
        # can be resident at once. Without this reserve the pool sizing
        # left no room and serving died compiling larger prefill
        # buckets (HBM OOM at hbm_utilization 0.9 AND 0.62).
        sched = self.config.scheduler_config
        batched = getattr(sched, "max_num_batched_tokens", None) or 2048
        reserve = max(2 << 30, int(1.2e6) * int(batched))
        avail = int(total * cache_config.hbm_utilization) - used - reserve
        num_dev_blocks = max(avail // block_bytes_per_dev, 0)
        # Data parallelism shards the pool over the data axis: each
        # replica's devices hold only pool/dp pages, so the same
        # per-device budget supports a dp-times-larger global pool.
        num_dev_blocks *= parallel_config.data_parallel_size
        num_host_blocks = int(cache_config.swap_space_bytes // block_bytes)
        # Cap the block counts so block tables and the host pool stay sane.
        num_dev_blocks = min(num_dev_blocks, 512 * 1024)
        num_host_blocks = min(num_host_blocks, 4 * max(num_dev_blocks, 1),
                              32768)
        return num_dev_blocks, num_host_blocks

    def initialize_cache(self, num_gpu_blocks: int,
                         num_cpu_blocks: int) -> None:
        self.config.cache_config.num_gpu_blocks = num_gpu_blocks
        self.config.cache_config.num_cpu_blocks = num_cpu_blocks
        self.cache_engine = CacheEngine(
            self.config.cache_config, self.config.model_config,
            self.config.parallel_config, self.mesh,
            model=self.runner.model,
            num_state_slots=self.runner.num_state_slots)
        self.cache_engine.allocate()
        if self.draft_runner is not None:
            self.draft_cache_engine = CacheEngine(
                self.config.cache_config, self._draft_config.model_config,
                self._draft_config.parallel_config, self.mesh)
            self.draft_cache_engine.allocate()

    def _prefill_draft(self, metas) -> None:
        """Piggyback prompt prefill onto the draft runner's KV (draft-model
        speculative decoding) and mark the draft cache fresh."""
        if self.draft_cache_engine is None:
            return
        dkv = self.draft_cache_engine.kv_caches
        batchable = [m for m in metas
                     if self.draft_runner.can_batch_prefill(m)]
        rest = [m for m in metas if m not in batchable]
        if len(batchable) >= 2:
            dkv, _ = self.draft_runner.execute_prefill_batch(batchable, dkv)
        else:
            rest = list(metas)
        for meta in rest:
            dkv, _ = self.draft_runner.execute_prefill(meta, dkv)
        self.draft_cache_engine.kv_caches = dkv
        for meta in metas:
            for sid, d in meta.seq_data.items():
                self._draft_upto[sid] = (d.get_num_computed_tokens() +
                                         meta.token_chunk_size - 1)
                self._draft_pending_k.pop(sid, None)

    # ------------------------------------------------------------- stepping
    def execute_model(
            self,
            execute_model_req: ExecuteModelRequest) -> List[SamplerOutput]:
        assert self.cache_engine is not None
        # Cache maintenance first: swap in/out, CoW copies
        # (reference worker.py:272 execute_worker ordering).
        self.cache_engine.swap_out(execute_model_req.blocks_to_swap_out)
        self.cache_engine.swap_in(execute_model_req.blocks_to_swap_in)
        self.cache_engine.copy(execute_model_req.blocks_to_copy)

        metas = execute_model_req.seq_group_metadata_list
        if not metas:
            return []
        prefills = [m for m in metas if m.is_prompt]
        decodes = [m for m in metas if not m.is_prompt]
        kv = self.cache_engine.kv_caches

        outputs_by_request = {}
        # Batched multi-prompt prefill (reference tpu_model_runner.py:
        # 199-247 pads and batches prompts into ONE forward): eligible
        # groups sharing do_sample go in one compiled dispatch; feature-
        # carrying groups (best_of, prompt_logprobs, LoRA, images, ...)
        # take the single-group path.
        import os
        batching_on = os.getenv("NMVLLM_BATCHED_PREFILL", "1") not in (
            "0", "false")
        batches: list = []
        singles: list = []
        by_sample = {True: [], False: []}
        for meta in prefills:
            if batching_on and self.runner.can_batch_prefill(meta):
                by_sample[meta.do_sample].append(meta)
            else:
                singles.append(meta)
        # Bound each dispatch's PADDED token count: prefill executables
        # reserve ~0.9 MB of temp per padded token (AOT memory_analysis,
        # round 5), and b_pad (power of 2) x the length bucket can
        # overshoot the scheduler's raw-token budget 4x — a 16 x 512
        # dispatch wanted 7.3 GB of temp and killed serving at any
        # hbm_utilization.
        sched = self.config.scheduler_config
        cap = 2 * max(
            getattr(sched, "max_num_batched_tokens", None) or 2048, 2048)

        def np2(x):
            p = 1
            while p < x:
                p *= 2
            return p

        def flush(chunk):
            if len(chunk) >= 2:
                batches.append(chunk)
            else:
                singles.extend(chunk)

        for group in by_sample.values():
            if len(group) < 2:
                singles.extend(group)
                continue
            chunk: list = []
            t_max = 0
            for meta in group:
                t_meta = self.runner.pad_prefill_len(meta.token_chunk_size)
                if chunk and np2(len(chunk) + 1) * max(t_max, t_meta) > cap:
                    flush(chunk)
                    chunk, t_max = [], 0
                chunk.append(meta)
                t_max = max(t_max, t_meta)
            flush(chunk)
        for group in batches:
            kv, out = self.runner.execute_prefill_batch(group, kv)
            for i, meta in enumerate(group):
                outputs_by_request[meta.request_id] = (
                    out.outputs[i] if out is not None else None)
            self._prefill_draft(group)
        for meta in singles:
            kv, out = self.runner.execute_prefill(meta, kv)
            if out is not None:
                outputs_by_request[meta.request_id] = out.outputs[0]
            else:
                outputs_by_request[meta.request_id] = None
            self._prefill_draft([meta])
        if decodes:
            kv, out = self.runner.execute_decode(decodes, kv)
            for meta, group_out in zip(decodes, out.outputs):
                outputs_by_request[meta.request_id] = group_out
            if self.draft_cache_engine is not None:
                # Keep the draft's KV current on non-speculative decode
                # steps (stale draft KV only hurts acceptance, but cheap
                # to avoid).
                dkv, _ = self.draft_runner.execute_decode(
                    decodes, self.draft_cache_engine.kv_caches)
                self.draft_cache_engine.kv_caches = dkv
                for m in decodes:
                    for sid, d in m.seq_data.items():
                        n = d.get_len()
                        if self._resolve_draft_upto(sid, n) >= n - 2:
                            self._draft_upto[sid] = n - 1
        self.cache_engine.kv_caches = kv

        merged = SamplerOutput(outputs=[
            outputs_by_request.get(m.request_id) for m in metas
        ])
        return [merged]

    def propose_mlp(self, metas, k: int):
        """MLP-speculator proposals from (last token, last hidden) — one
        jitted chain, no draft KV (reference generate_proposals,
        mlp_speculator.py:134). Rows with no captured hidden state (e.g.
        resumed after preemption) get no draft this step."""
        import numpy as np

        import jax.numpy as jnp
        rows = []
        for meta in metas:
            (seq_id, data), = meta.seq_data.items()
            rows.append((seq_id, data))
        have = [sid in self.runner.seq_hidden for sid, _ in rows]
        if not any(have):
            return [[] for _ in rows]
        emb_dim = self.mlp_speculator.emb_dim
        hid = np.zeros((len(rows), emb_dim), np.float32)
        toks = np.zeros((len(rows),), np.int32)
        for i, (sid, data) in enumerate(rows):
            toks[i] = data.get_last_token_id()
            if have[i]:
                hid[i] = self.runner.seq_hidden[sid]
        k = min(k, self.mlp_speculator.max_speculative_tokens)
        drafts = np.asarray(self._mlp_propose_jit(
            self.mlp_speculator_params, jnp.asarray(toks),
            jnp.asarray(hid), k))
        return [list(map(int, drafts[i])) if have[i] else []
                for i in range(len(rows))]

    def propose_drafts(self, metas, k: int):
        """Greedy draft-model proposals (k tokens per decode row); writes
        the draft's own KV along the proposal chain.

        Draft-KV catch-up: a fully-accepted previous run leaves one
        position (the last accepted proposal) that the draft never
        processed as an input — its KV row is stale. Rows one position
        behind ride a masked backfill forward fused into the proposal
        step; rows further behind (spec toggled off mid-stream) catch up
        through the draft's chunked-prefill path first."""
        assert self.draft_runner is not None
        catchup_tokens = {}
        if len(self._draft_upto) > 8 * len(metas) + 256:
            live = {sid for m in metas for sid in m.seq_data}
            self._draft_upto = {s: v for s, v in self._draft_upto.items()
                                if s in live}
            self._draft_pending_k = {
                s: v for s, v in self._draft_pending_k.items() if s in live}
        for i, meta in enumerate(metas):
            (sid, data), = meta.seq_data.items()
            n = data.get_len()
            upto = self._resolve_draft_upto(sid, n)
            if upto < n - 3:
                # Multi-position gap: draft prefill over the missing
                # range [upto+1, n-2] (do_sample=False chunk).
                import copy as _copy
                d2 = _copy.copy(data)
                d2._num_computed_tokens = upto + 1
                cu_meta = type(meta)(
                    request_id=meta.request_id, is_prompt=True,
                    seq_data={sid: d2}, sampling_params=None,
                    block_tables={sid: meta.block_tables[sid]},
                    do_sample=False, token_chunk_size=(n - 2) - upto)
                dkv, _ = self.draft_runner.execute_prefill(
                    cu_meta, self.draft_cache_engine.kv_caches)
                self.draft_cache_engine.kv_caches = dkv
                upto = n - 2
                self._draft_upto[sid] = upto
            if upto == n - 3:
                catchup_tokens[i] = int(data.get_token_ids()[n - 2])
            # Propose feeds position n-1 and writes proposals at
            # n..n+k-2; those resolve at the next step (accepted tokens
            # are the proposals) via _draft_pending_k.
            self._draft_upto[sid] = n - 1
            self._draft_pending_k[sid] = k
        dkv, toks = self.draft_runner.propose_greedy(
            metas, self.draft_cache_engine.kv_caches, k,
            catchup_tokens=catchup_tokens)
        self.draft_cache_engine.kv_caches = dkv
        return toks

    def _resolve_draft_upto(self, sid: int, n_now: int) -> int:
        """Resolve a pending proposal run's speculative KV writes.

        After a propose at length n, the draft processed inputs at
        n-1..n+k-2. Every token the sequence kept except its newest one
        is an accepted proposal (acceptance can only keep the proposed
        token), so positions up to min(n+k-2, n_now-2) are final."""
        upto = self._draft_upto.get(sid, n_now - 2)
        k = self._draft_pending_k.pop(sid, None)
        if k is not None:
            upto = min(upto + k - 1, n_now - 2)
            self._draft_upto[sid] = upto
        return upto

    def execute_spec_decode(self, execute_model_req: ExecuteModelRequest,
                            proposals, num_spec: int) -> List[SamplerOutput]:
        """Spec-decode verification step (all-decode batch only)."""
        assert self.cache_engine is not None
        self.cache_engine.swap_out(execute_model_req.blocks_to_swap_out)
        self.cache_engine.swap_in(execute_model_req.blocks_to_swap_in)
        self.cache_engine.copy(execute_model_req.blocks_to_copy)
        metas = execute_model_req.seq_group_metadata_list
        kv, out = self.runner.execute_spec_decode(
            metas, self.cache_engine.kv_caches, proposals, num_spec)
        self.cache_engine.kv_caches = kv
        return [out]

    def _pod_startup_health_check(self) -> None:
        """Lockstep cross-host liveness barrier at pod-engine
        construction (every host constructs the engine identically, so
        all hosts reach this collective together): catches a host that
        failed to start within NMVLLM_POD_HEALTH_TIMEOUT_S instead of
        hanging the pod in the first model collective."""
        from nmvllm_tpu import envs
        from nmvllm_tpu.parallel.multihost import check_pod_health
        check_pod_health(float(envs.NMVLLM_POD_HEALTH_TIMEOUT_S))

    def check_health(self) -> None:
        """The in-process SPMD executor is healthy iff the process is
        alive — deliberately NO cross-host collective here: /health is
        served by host 0 while the other hosts of a pod sit inside the
        admissions broadcast (host-replicated scheduling), so a
        one-sided probe collective would MISMATCH their pending one and
        wedge a healthy pod. Runtime dead-host detection rides the step
        collectives themselves: a dead host hangs the step, and the
        async engine's iteration watchdog (NMVLLM_ENGINE_ITERATION_
        TIMEOUT_S) turns that into engine-dead -> /health 500. Startup
        liveness is checked once, in lockstep, at pod-engine
        construction (check_pod_health below)."""
        return
