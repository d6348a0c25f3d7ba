"""CLI/constructor argument surface → EngineConfig.

Reference: vllm/engine/arg_utils.py (EngineArgs, ~90 flags,
create_engine_config). Same flag names where the concept carries over to
TPU; GPU-only knobs map to their TPU analogues (gpu-memory-utilization →
hbm-utilization alias kept for compatibility).
"""
import argparse
import dataclasses
from dataclasses import dataclass
from typing import Optional

from nmvllm_tpu.config import (CacheConfig, DecodingConfig, DeviceConfig,
                               EngineConfig, LoadConfig, LoRAConfig,
                               ModelConfig, ObservabilityConfig,
                               ParallelConfig, SchedulerConfig,
                               SpeculativeConfig)


@dataclass
class EngineArgs:
    model: str = "debug-llama"
    tokenizer: Optional[str] = None
    tokenizer_mode: str = "auto"
    skip_tokenizer_init: bool = False
    tokenizer_pool_size: int = 0
    tokenizer_pool_type: str = "thread"
    tokenizer_pool_extra_config: Optional[str] = None
    trust_remote_code: bool = False
    download_dir: Optional[str] = None
    load_format: str = "auto"
    dtype: str = "auto"
    kv_cache_dtype: str = "auto"
    quantization_param_path: Optional[str] = None
    seed: int = 0
    max_model_len: Optional[int] = None
    # parallelism
    pipeline_parallel_size: int = 1
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    expert_parallel_size: int = 1
    sequence_parallel_size: int = 1
    # KV cache
    block_size: int = 16
    enable_prefix_caching: bool = False
    swap_space: float = 4.0
    gpu_memory_utilization: float = 0.90
    num_gpu_blocks_override: Optional[int] = None
    # scheduler
    max_num_batched_tokens: Optional[int] = None
    max_num_seqs: int = 256
    max_logprobs: int = 20
    disable_sliding_window: bool = False
    enable_chunked_prefill: bool = False
    preemption_mode: Optional[str] = None
    use_v2_block_manager: bool = True
    num_lookahead_slots: int = 0
    scheduler_delay_factor: float = 0.0
    # compression
    quantization: Optional[str] = None
    sparsity: Optional[str] = None
    # misc
    revision: Optional[str] = None
    enforce_eager: bool = False
    disable_log_stats: bool = False
    disable_custom_all_reduce: bool = False
    device: str = "auto"
    served_model_name: Optional[str] = None
    # lora
    enable_lora: bool = False
    max_loras: int = 1
    max_lora_rank: int = 16
    lora_extra_vocab_size: int = 256
    max_cpu_loras: Optional[int] = None
    fully_sharded_loras: bool = False
    # spec decode
    speculative_model: Optional[str] = None
    num_speculative_tokens: int = 0
    ngram_prompt_lookup_max: int = 0
    ngram_prompt_lookup_min: int = 0
    speculative_disable_by_batch_size: Optional[int] = None
    spec_decoding_acceptance_method: str = "rejection_sampler"
    typical_acceptance_sampler_posterior_threshold: float = 0.09
    typical_acceptance_sampler_posterior_alpha: float = 0.3
    # observability
    otlp_traces_endpoint: Optional[str] = None
    # decoding
    guided_decoding_backend: str = "native"

    @staticmethod
    def add_cli_args(parser: argparse.ArgumentParser
                     ) -> argparse.ArgumentParser:
        import re as _re
        for f in dataclasses.fields(EngineArgs):
            name = "--" + f.name.replace("_", "-")
            default = f.default
            ann = str(f.type)
            # Optional[int]/Optional[float] fields default to None; parse
            # them by annotation, not by the default's type.
            if f.type in ("bool", bool) or isinstance(default, bool):
                parser.add_argument(name, action="store_true",
                                    default=default)
            elif (isinstance(default, int) and not isinstance(default, bool)
                  ) or _re.search(r"\bint\b", ann):
                parser.add_argument(name, type=int, default=default)
            elif isinstance(default, float) or _re.search(r"\bfloat\b", ann):
                parser.add_argument(name, type=float, default=default)
            else:
                parser.add_argument(name, type=str, default=default)
        return parser

    @classmethod
    def from_cli_args(cls, args: argparse.Namespace) -> "EngineArgs":
        attrs = [f.name for f in dataclasses.fields(cls)]
        return cls(**{a: getattr(args, a) for a in attrs if hasattr(args, a)})

    def create_engine_config(self) -> EngineConfig:
        model_config = ModelConfig(
            model=self.model, tokenizer=self.tokenizer,
            tokenizer_mode=self.tokenizer_mode,
            trust_remote_code=self.trust_remote_code, dtype=self.dtype,
            seed=self.seed, revision=self.revision,
            max_model_len=self.max_model_len,
            quantization=self.quantization, sparsity=self.sparsity,
            quantization_param_path=self.quantization_param_path,
            enforce_eager=self.enforce_eager,
            max_logprobs=self.max_logprobs,
            disable_sliding_window=self.disable_sliding_window,
            skip_tokenizer_init=self.skip_tokenizer_init,
            served_model_name=self.served_model_name)
        cache_config = CacheConfig(
            block_size=self.block_size,
            hbm_utilization=self.gpu_memory_utilization,
            swap_space=self.swap_space, cache_dtype=self.kv_cache_dtype,
            num_gpu_blocks_override=self.num_gpu_blocks_override,
            sliding_window=model_config.get_sliding_window(),
            enable_prefix_caching=self.enable_prefix_caching)
        from nmvllm_tpu.config import TokenizerPoolConfig
        parallel_config = ParallelConfig(
            pipeline_parallel_size=self.pipeline_parallel_size,
            tensor_parallel_size=self.tensor_parallel_size,
            data_parallel_size=self.data_parallel_size,
            expert_parallel_size=self.expert_parallel_size,
            sequence_parallel_size=self.sequence_parallel_size,
            disable_custom_all_reduce=self.disable_custom_all_reduce,
            tokenizer_pool_config=TokenizerPoolConfig.create_config(
                self.tokenizer_pool_size, self.tokenizer_pool_type,
                self.tokenizer_pool_extra_config))
        # Spec decode reserves lookahead KV slots for draft-token writes
        # (reference: SpeculativeConfig -> num_lookahead_slots plumbing).
        num_lookahead_slots = self.num_lookahead_slots
        if self.speculative_model or self.ngram_prompt_lookup_max:
            if self.enable_prefix_caching:
                raise ValueError(
                    "Speculative decoding is not compatible with prefix "
                    "caching (draft KV writes would dirty hashed blocks).")
            num_lookahead_slots = max(num_lookahead_slots,
                                      self.num_speculative_tokens)
        scheduler_config = SchedulerConfig(
            max_num_batched_tokens=self.max_num_batched_tokens,
            max_num_seqs=self.max_num_seqs,
            max_model_len=model_config.max_model_len,
            use_v2_block_manager=self.use_v2_block_manager,
            num_lookahead_slots=num_lookahead_slots,
            delay_factor=self.scheduler_delay_factor,
            enable_chunked_prefill=self.enable_chunked_prefill,
            preemption_mode=self.preemption_mode)
        device_config = DeviceConfig(device=self.device)
        lora_config = LoRAConfig(
            max_lora_rank=self.max_lora_rank, max_loras=self.max_loras,
            fully_sharded_loras=self.fully_sharded_loras,
            max_cpu_loras=self.max_cpu_loras,
            lora_extra_vocab_size=self.lora_extra_vocab_size
        ) if self.enable_lora else None
        speculative_config = None
        if self.speculative_model or self.ngram_prompt_lookup_max:
            speculative_config = SpeculativeConfig(
                draft_model=self.speculative_model,
                num_speculative_tokens=self.num_speculative_tokens,
                ngram_prompt_lookup_max=self.ngram_prompt_lookup_max,
                ngram_prompt_lookup_min=self.ngram_prompt_lookup_min,
                speculative_disable_by_batch_size=(
                    self.speculative_disable_by_batch_size),
                acceptance_method=self.spec_decoding_acceptance_method,
                typical_acceptance_sampler_posterior_threshold=(
                    self.typical_acceptance_sampler_posterior_threshold),
                typical_acceptance_sampler_posterior_alpha=(
                    self.typical_acceptance_sampler_posterior_alpha))
        load_config = LoadConfig(load_format=self.load_format,
                                 download_dir=self.download_dir)
        return EngineConfig(
            model_config=model_config, cache_config=cache_config,
            parallel_config=parallel_config,
            scheduler_config=scheduler_config, device_config=device_config,
            lora_config=lora_config, speculative_config=speculative_config,
            decoding_config=DecodingConfig(
                guided_decoding_backend=self.guided_decoding_backend),
            observability_config=ObservabilityConfig(
                otlp_traces_endpoint=self.otlp_traces_endpoint),
            load_config=load_config)


@dataclass
class AsyncEngineArgs(EngineArgs):
    engine_use_ray: bool = False
    disable_log_requests: bool = False
    max_log_len: Optional[int] = None
