"""Pipeline-parallel model runner.

Reference: vllm serves pipeline_parallel_size>1 with one worker process
per stage, NCCL send/recv of IntermediateTensors between stages, and one
scheduler ("virtual engine") per stage (worker_base.py:267,
llm_engine.py:303, distributed/parallel_state.py:832). The TPU-native
rebuild keeps the engine single-stage-shaped: the whole pipeline advances
inside ONE compiled SPMD step (parallel/pipeline.py), so the scheduler,
cache bookkeeping, and output processing are unchanged — stage topology
is purely a mesh/sharding concern.

This runner reuses ModelRunner's batch assembly, bucketing, sampling
tensors, and output conversion; only the compiled step builders differ:
  * params: per-layer trees stacked along a leading layer axis sharded
    over the ``pp`` mesh axis (weights live only on their stage).
  * KV cache: one stacked (L, blocks, 2, H, bs, d) array, layer axis
    sharded over ``pp`` (each stage holds its own layers' pages).
  * decode: B splits into pp microbatches (when divisible) that flow
    through the stage ring; prefill: one prompt chunk drains the ring in
    pp ticks.

Multi-LoRA runs under PP: adapter stacks are positionally stacked over
the layer axis and sharded over ``pp`` alongside params["layers"]
(PPLoRAState), re-bound per scan step to the proto layers' names.
ngram AND draft-model speculative decoding run under PP too (the
multi-query verify flows through the stage ring,
_get_spec_decode_fn; draft proposals come from a separate ModelRunner
replicated over the pp axis — this runner never proposes) — beyond
the reference, whose sync engine refuses PP entirely
(llm_engine.py:845-848). Still unsupported under PP (raise with a
clear message): MLP-speculator proposals (need the target's hidden
states, which the stage scan does not expose), multimodal prompts,
stateful (Mamba) models, per-request logits processors.
"""
import functools
from typing import Any, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from nmvllm_tpu.config import EngineConfig
from nmvllm_tpu.layers.sampler import sample
from nmvllm_tpu.logger import init_logger
from nmvllm_tpu.parallel.mesh import PP_AXIS, TP_AXIS
from nmvllm_tpu.parallel.pipeline import (make_pipeline_fwd, pp_kv_spec,
                                          pp_lora_layer_names,
                                          pp_param_specs,
                                          pipeline_shard_params)
from nmvllm_tpu.worker.runner import (LoRAState, ModelRunner,
                                      _layer_named_linears, shard_map_fn)

logger = init_logger(__name__)


class PPLoRAState(LoRAState):
    """Multi-LoRA state for the pipeline runner: adapter factors are
    POSITIONALLY stacked across layers (tuple over target position z of
    (A (L, S+1, K, r), B (L, S+1, r, N))) so the stage scan can slice
    each layer's stacks alongside its params; the leading layer axis is
    sharded over ``pp`` exactly like params["layers"]."""

    def __init__(self, model, lora_config):
        from nmvllm_tpu.lora.layers import LoRAConfig as LC
        from nmvllm_tpu.lora.models import LoRAModelManager
        self.config = LC(max_loras=lora_config.max_loras,
                         max_lora_rank=lora_config.max_lora_rank)
        self.manager = LoRAModelManager(self.config)
        self.manager.install_fn = self._install
        self.names = pp_lora_layer_names(model)          # [L][Z]
        num_layers = len(model.layers)
        slots = self.config.max_loras + 1
        r = self.config.max_lora_rank
        stacks, shards = [], []
        for _, lin in _layer_named_linears(model.layers[0]):
            a = jnp.zeros((num_layers, slots, lin.in_features, r),
                          jnp.bfloat16)
            b = jnp.zeros((num_layers, slots, r, lin.out_features),
                          jnp.bfloat16)
            stacks.append((a, b))
            shards.append(lin.shard)
        self.stacks = tuple(stacks)
        self.shards = shards

    def stack_specs(self):
        """Same TP split as the single-stage LoRAState (column: B on N,
        row: A on K), plus the pp-sharded leading layer axis."""
        specs = []
        for shard in self.shards:
            if shard == "column":
                specs.append((P(PP_AXIS, None, None, None),
                              P(PP_AXIS, None, None, TP_AXIS)))
            elif shard == "row":
                specs.append((P(PP_AXIS, None, TP_AXIS, None),
                              P(PP_AXIS, None, None, None)))
            else:
                specs.append((P(PP_AXIS, None, None, None),
                              P(PP_AXIS, None, None, None)))
        return tuple(specs)

    def _install(self, slot, lora_model):
        assert slot >= 1
        new_stacks = []
        for z, (a, b) in enumerate(self.stacks):
            a_up = np.zeros((a.shape[0],) + a.shape[2:], a.dtype)
            b_up = np.zeros((b.shape[0],) + b.shape[2:], b.dtype)
            if lora_model is not None:
                for li in range(a.shape[0]):
                    lw = lora_model.loras.get(self.names[li][z])
                    if lw is not None:
                        rk = lw.rank
                        a_up[li, :, :rk] = np.asarray(
                            lw.a, a_up.dtype) * lw.scaling
                        b_up[li, :rk, :] = np.asarray(lw.b, b_up.dtype)
            new_stacks.append((a.at[:, slot].set(a_up),
                               b.at[:, slot].set(b_up)))
        self.stacks = tuple(new_stacks)


class PipelineModelRunner(ModelRunner):
    """ModelRunner whose compiled steps run the GPipe stage ring."""

    def __init__(self, engine_config: EngineConfig, mesh) -> None:
        super().__init__(engine_config, mesh)
        self.pp = engine_config.parallel_config.pipeline_parallel_size
        self._kv_spec = pp_kv_spec(data_parallel=self.dp > 1)

    # ------------------------------------------------------------------ load
    def load_model(self) -> None:
        from nmvllm_tpu.model_loader import get_model
        model, params = get_model(self.config, self.mesh)
        for attr in ("layers", "embed_tokens", "norm", "rotary",
                     "compute_logits", "select_last_token"):
            if not hasattr(model, attr):
                raise ValueError(
                    f"Pipeline parallelism requires the standard decoder "
                    f"interface; {type(model).__name__} lacks `{attr}`.")
        if getattr(model, "has_state_layers", False) or \
                hasattr(model, "cache_pspecs"):
            raise ValueError(
                "Pipeline parallelism does not support stateful (Mamba) "
                "or heterogeneous-cache models.")
        nl = len(model.layers)
        from nmvllm_tpu.parallel.pipeline import scan_period
        period = scan_period(model)
        if nl % (self.pp * period) != 0:
            raise ValueError(
                f"num_hidden_layers ({nl}) must divide evenly over "
                f"pipeline_parallel_size ({self.pp}) x layer-config "
                f"period ({period}) so stage boundaries fall on period "
                f"boundaries.")
        ref_tree = jax.tree.structure(params["layers"][0])
        for li, lp in enumerate(params["layers"][1:], 1):
            if jax.tree.structure(lp) != ref_tree:
                raise ValueError(
                    f"Pipeline parallelism requires layers with one param "
                    f"structure; layer {li} differs from layer 0 "
                    f"({type(model).__name__}).")
        self.model = model
        self.params = pipeline_shard_params(model, params, self.mesh)
        self._param_specs = pp_param_specs(model)
        self.lora_state = None
        if self.config.lora_config is not None:
            self.lora_state = PPLoRAState(model, self.config.lora_config)
            self._lora_names = pp_lora_layer_names(model)

    def _specs_tuple(self):
        return self._param_specs, self._kv_spec

    def _unsupported(self, what: str):
        return ValueError(f"{what} is not supported with "
                          f"pipeline_parallel_size > 1.")

    # ------------------------------------------------------------ step fns
    def _num_micro(self, batch: int) -> int:
        return self.pp if batch % self.pp == 0 else 1

    def _get_decode_fn(self, flags_key, use_lora: bool = False,
                       return_logits: bool = False):
        if self.capture_hidden:
            raise self._unsupported("MLP-speculator drafting")
        if return_logits:
            raise self._unsupported("per-request logits processors")
        key = ("pp_decode", flags_key, use_lora)
        if key in self._step_fns:
            return self._step_fns[key]
        flags = dict(flags_key)
        model = self.model
        param_specs, kv_spec = self._specs_tuple()
        mesh = self.mesh
        pp = self.pp
        vocab_size = self.vocab_size
        num_micro_for = self._num_micro
        lora_names = self._lora_names if use_lora else None

        def fwd(params, kv, tokens, positions, slots, block_tables, ctx,
                lora_indices, lora_stacks):
            nm = num_micro_for(tokens.shape[0])
            inner = make_pipeline_fwd(model, pp, nm, is_prefill=False,
                                      lora_names=lora_names)
            return inner(params, kv, tokens, positions, slots,
                         block_tables, ctx, jnp.ones_like(ctx),
                         jnp.zeros_like(ctx), lora_indices, lora_stacks)

        lora_specs = (P(), self._lora_spec_tree())
        # PP×DP: batch rows shard over the data axis (each replica
        # decodes the rows whose pages live in its pool segment, as in
        # the single-stage DP path); logits come back row-sharded.
        bspec = self._batch_spec
        sharded_fwd = shard_map_fn(
            fwd, mesh,
            in_specs=(param_specs, kv_spec, bspec, bspec, bspec, bspec,
                      bspec, *lora_specs),
            out_specs=(bspec, kv_spec))

        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(params, kv_caches, tokens, positions, slots, block_tables,
                 ctx, state_slots, sampling_tensors, lora_indices,
                 lora_stacks):
            logits, kv_caches = sharded_fwd(
                params, kv_caches, tokens, positions, slots, block_tables,
                ctx, lora_indices, lora_stacks)
            out = sample(logits, sampling_tensors, vocab_size=vocab_size,
                         **flags)
            return kv_caches, out

        self._step_fns[key] = step
        return step

    def _get_prefill_fn(self, flags_key, has_prefix: bool, do_sample: bool,
                        n_samples: int = 1, use_lora: bool = False,
                        num_prompt_logprobs: int = 0,
                        has_image: bool = False, image_key=None,
                        return_logits: bool = False):
        if has_image:
            raise self._unsupported("multimodal input")
        if self.capture_hidden:
            raise self._unsupported("MLP-speculator drafting")
        if return_logits:
            raise self._unsupported("per-request logits processors")
        key = ("pp_prefill", flags_key, has_prefix, do_sample, n_samples,
               num_prompt_logprobs, use_lora)
        if key in self._step_fns:
            return self._step_fns[key]
        flags = dict(flags_key)
        model = self.model
        param_specs, kv_spec = self._specs_tuple()
        mesh = self.mesh
        pp = self.pp
        vocab_size = self.vocab_size
        want_plp = num_prompt_logprobs > 0
        lora_names = self._lora_names if use_lora else None

        dp = self.dp

        def fwd(params, kv, tokens, positions, slots, block_tables, ctx,
                seq_lens, prefix_lens, owner, lora_indices, lora_stacks):
            inner = make_pipeline_fwd(model, pp, 1, is_prefill=True,
                                      has_prefix=has_prefix,
                                      capture_hidden=want_plp,
                                      lora_names=lora_names)

            def owner_select(a):
                # PP×DP prefill: the prompt computes on every data
                # replica but only the owner (whose pool segment took
                # the KV writes; non-owners ran with slots=-1 and zeroed
                # tables) produced valid paged-prefix reads — select it
                # (same scheme as worker/runner.py _get_prefill_fn).
                if dp == 1:
                    return a
                from nmvllm_tpu.parallel.mesh import DATA_AXIS
                return jax.lax.psum(a * owner[0].astype(a.dtype),
                                    DATA_AXIS)

            if not want_plp:
                logits, kv = inner(params, kv, tokens, positions, slots,
                                   block_tables, ctx, seq_lens,
                                   prefix_lens, lora_indices, lora_stacks)
                return owner_select(logits), None, kv
            logits, x, kv = inner(params, kv, tokens, positions, slots,
                                  block_tables, ctx, seq_lens, prefix_lens,
                                  lora_indices, lora_stacks)
            logits = owner_select(logits)
            x = owner_select(x)
            # Per-position prompt logprobs off the captured final-norm
            # hidden states (same math as ModelRunner._get_prefill_fn).
            all_logits = model.compute_logits(
                params, x.reshape(-1, x.shape[-1])).astype(jnp.float32)
            v_pad = all_logits.shape[-1]
            if v_pad > vocab_size:
                all_logits = jnp.where(
                    jnp.arange(v_pad)[None, :] < vocab_size,
                    all_logits, float("-inf"))
            lp = jax.nn.log_softmax(all_logits, axis=-1)
            nxt = jnp.concatenate(
                [tokens[0, 1:], jnp.zeros((1,), jnp.int32)])
            chosen = jnp.take_along_axis(lp, nxt[:, None], axis=-1)[:, 0]
            topk_lp, topk_ids = jax.lax.top_k(lp, num_prompt_logprobs)
            return logits, (chosen, topk_ids, topk_lp), kv

        prompt_lp_spec = (P(), P(), P()) if want_plp else None
        lora_specs = (P(), self._lora_spec_tree())
        bspec = self._batch_spec
        sharded_fwd = shard_map_fn(
            fwd, mesh,
            in_specs=(param_specs, kv_spec, P(), P(), bspec, bspec, P(),
                      P(), P(), bspec, *lora_specs),
            out_specs=(P(), prompt_lp_spec, kv_spec))

        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(params, kv_caches, tokens, positions, slots, block_tables,
                 ctx, seq_lens, prefix_lens, state_slots, pixel_values,
                 owner, sampling_tensors, lora_indices, lora_stacks):
            logits, prompt_lp, kv_caches = sharded_fwd(
                params, kv_caches, tokens, positions, slots, block_tables,
                ctx, seq_lens, prefix_lens, owner, lora_indices,
                lora_stacks)
            if do_sample:
                if n_samples > 1:
                    # best_of siblings: same prompt logits, distinct keys.
                    logits = jnp.tile(logits, (n_samples, 1))
                out = sample(logits, sampling_tensors,
                             vocab_size=vocab_size, **flags)
            else:
                out = None
            return kv_caches, out, prompt_lp

        self._step_fns[key] = step
        return step

    def _get_spec_decode_fn(self, num_spec: int, flags_key,
                            use_lora: bool = False):
        """Multi-query verification under pipeline parallelism — BEYOND
        the reference (its synchronous engine refuses PP outright,
        llm_engine.py:845-848, and its spec worker is single-stage).
        Each row's [last_token, draft_0..k-1] chunk flows through the
        stage ring as a prefill-shaped microbatch; the pipeline fwd
        captures the final-normed hidden at ALL s positions, logits are
        computed per position, and the shared in-graph acceptance
        (worker/runner.py spec_accept_and_sample) emits 1..k+1 tokens."""
        from nmvllm_tpu.worker.runner import spec_accept_and_sample
        spec_cfg = self.config.speculative_config
        acc_method = (getattr(spec_cfg, "acceptance_method",
                              "rejection_sampler")
                      if spec_cfg else "rejection_sampler")
        typ_thr = float(getattr(
            spec_cfg, "typical_acceptance_sampler_posterior_threshold",
            0.09) if spec_cfg else 0.09)
        typ_alpha = float(getattr(
            spec_cfg, "typical_acceptance_sampler_posterior_alpha", 0.3)
            if spec_cfg else 0.3)
        key = ("pp_spec", num_spec, flags_key, use_lora, acc_method)
        if key in self._step_fns:
            return self._step_fns[key]
        flags = dict(flags_key)
        model = self.model
        param_specs, kv_spec = self._specs_tuple()
        mesh = self.mesh
        pp = self.pp
        vocab_size = self.vocab_size
        num_micro_for = self._num_micro
        lora_names = self._lora_names if use_lora else None
        s = num_spec + 1

        def fwd(params, kv, tokens, positions, slots, block_tables, ctx,
                seq_lens, prefix_lens, lora_indices, lora_stacks):
            nm = num_micro_for(tokens.shape[0])
            inner = make_pipeline_fwd(model, pp, nm, is_prefill=True,
                                      has_prefix=True,
                                      capture_hidden=True,
                                      lora_names=lora_names)
            _, hidden, kv = inner(params, kv, tokens, positions, slots,
                                  block_tables, ctx, seq_lens,
                                  prefix_lens, lora_indices, lora_stacks)
            b = hidden.shape[0]
            logits = model.compute_logits(
                params, hidden.reshape(b * s, hidden.shape[-1]))
            return logits.reshape(b, s, -1), kv

        lora_specs = (P(), self._lora_spec_tree())
        sharded_fwd = shard_map_fn(
            fwd, mesh,
            in_specs=(param_specs, kv_spec, P(), P(), P(), P(), P(), P(),
                      P(), *lora_specs),
            out_specs=(P(), kv_spec))

        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(params, kv_caches, tokens, positions, slots, block_tables,
                 ctx, seq_lens, prefix_lens, drafts, draft_lens,
                 sampling_tensors, lora_indices, lora_stacks):
            logits, kv_caches = sharded_fwd(
                params, kv_caches, tokens, positions, slots, block_tables,
                ctx, seq_lens, prefix_lens, lora_indices, lora_stacks)
            out_t = spec_accept_and_sample(
                logits, sampling_tensors, flags, drafts, draft_lens,
                vocab_size=vocab_size, num_spec=num_spec,
                acc_method=acc_method, typ_thr=typ_thr,
                typ_alpha=typ_alpha)
            return kv_caches, out_t

        self._step_fns[key] = step
        return step

    def _get_propose_fn(self, *a, **kw):
        # The TARGET's pipeline runner never proposes: ngram drafts are
        # host-side and draft-model proposals come from the separate
        # replicated draft ModelRunner (executor.py). Reaching this
        # means the executor mis-routed a proposal to the target.
        raise self._unsupported("speculative proposals on the target "
                                "pipeline runner")

    def execute_embedding(self, meta, kv_caches):
        raise self._unsupported("embedding models")
