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

Unsupported under PP (raise with a clear message): LoRA, speculative
decoding, prompt_logprobs, multimodal prompts, stateful (Mamba) models,
heterogeneous-layer models. Matches the reference's own PP restrictions
in spirit (its sync engine refuses PP entirely, llm_engine.py:845-848).
"""
import functools
from typing import Any, List

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nmvllm_tpu.config import EngineConfig
from nmvllm_tpu.layers.sampler import sample
from nmvllm_tpu.logger import init_logger
from nmvllm_tpu.parallel.mesh import PP_AXIS
from nmvllm_tpu.parallel.pipeline import (make_pipeline_fwd, pp_kv_spec,
                                          pp_param_specs,
                                          pipeline_shard_params)
from nmvllm_tpu.worker.runner import ModelRunner, shard_map_fn

logger = init_logger(__name__)


class PipelineModelRunner(ModelRunner):
    """ModelRunner whose compiled steps run the GPipe stage ring."""

    def __init__(self, engine_config: EngineConfig, mesh) -> None:
        super().__init__(engine_config, mesh)
        self.pp = engine_config.parallel_config.pipeline_parallel_size
        self._kv_spec = pp_kv_spec()

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

    def _specs_tuple(self):
        return self._param_specs, self._kv_spec

    def _unsupported(self, what: str):
        return ValueError(f"{what} is not supported with "
                          f"pipeline_parallel_size > 1.")

    def add_lora(self, lora_request) -> None:
        raise self._unsupported("LoRA")

    # ------------------------------------------------------------ step fns
    def _num_micro(self, batch: int) -> int:
        return self.pp if batch % self.pp == 0 else 1

    def _get_decode_fn(self, flags_key, use_lora: bool = False):
        if use_lora:
            raise self._unsupported("LoRA")
        if self.capture_hidden:
            raise self._unsupported("MLP-speculator drafting")
        key = ("pp_decode", flags_key)
        if key in self._step_fns:
            return self._step_fns[key]
        flags = dict(flags_key)
        model = self.model
        param_specs, kv_spec = self._specs_tuple()
        mesh = self.mesh
        pp = self.pp
        vocab_size = self.vocab_size
        num_micro_for = self._num_micro

        def fwd(params, kv, tokens, positions, slots, block_tables, ctx):
            nm = num_micro_for(tokens.shape[0])
            inner = make_pipeline_fwd(model, pp, nm, is_prefill=False)
            return inner(params, kv, tokens, positions, slots,
                         block_tables, ctx, jnp.ones_like(ctx),
                         jnp.zeros_like(ctx))

        sharded_fwd = shard_map_fn(
            fwd, mesh,
            in_specs=(param_specs, kv_spec, P(), P(), P(), P(), P()),
            out_specs=(P(), kv_spec))

        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(params, kv_caches, tokens, positions, slots, block_tables,
                 ctx, state_slots, sampling_tensors, lora_indices,
                 lora_stacks):
            logits, kv_caches = sharded_fwd(
                params, kv_caches, tokens, positions, slots, block_tables,
                ctx)
            out = sample(logits, sampling_tensors, vocab_size=vocab_size,
                         **flags)
            return kv_caches, out

        self._step_fns[key] = step
        return step

    def _get_prefill_fn(self, flags_key, has_prefix: bool, do_sample: bool,
                        n_samples: int = 1, use_lora: bool = False,
                        num_prompt_logprobs: int = 0,
                        has_image: bool = False, image_key=None):
        if use_lora:
            raise self._unsupported("LoRA")
        if has_image:
            raise self._unsupported("multimodal input")
        if self.capture_hidden:
            raise self._unsupported("MLP-speculator drafting")
        key = ("pp_prefill", flags_key, has_prefix, do_sample, n_samples,
               num_prompt_logprobs)
        if key in self._step_fns:
            return self._step_fns[key]
        flags = dict(flags_key)
        model = self.model
        param_specs, kv_spec = self._specs_tuple()
        mesh = self.mesh
        pp = self.pp
        vocab_size = self.vocab_size
        want_plp = num_prompt_logprobs > 0

        def fwd(params, kv, tokens, positions, slots, block_tables, ctx,
                seq_lens, prefix_lens):
            inner = make_pipeline_fwd(model, pp, 1, is_prefill=True,
                                      has_prefix=has_prefix,
                                      capture_hidden=want_plp)
            if not want_plp:
                logits, kv = inner(params, kv, tokens, positions, slots,
                                   block_tables, ctx, seq_lens,
                                   prefix_lens)
                return logits, None, kv
            logits, x, kv = inner(params, kv, tokens, positions, slots,
                                  block_tables, ctx, seq_lens, prefix_lens)
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
        sharded_fwd = shard_map_fn(
            fwd, mesh,
            in_specs=(param_specs, kv_spec, P(), P(), P(), P(), P(), P(),
                      P()),
            out_specs=(P(), prompt_lp_spec, kv_spec))

        @functools.partial(jax.jit, donate_argnums=(1,))
        def step(params, kv_caches, tokens, positions, slots, block_tables,
                 ctx, seq_lens, prefix_lens, state_slots, pixel_values,
                 sampling_tensors, lora_indices, lora_stacks):
            logits, prompt_lp, kv_caches = sharded_fwd(
                params, kv_caches, tokens, positions, slots, block_tables,
                ctx, seq_lens, prefix_lens)
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

    def _get_spec_decode_fn(self, *a, **kw):
        raise self._unsupported("speculative decoding")

    def _get_propose_fn(self, *a, **kw):
        raise self._unsupported("speculative decoding")

    def execute_embedding(self, meta, kv_caches):
        raise self._unsupported("embedding models")
