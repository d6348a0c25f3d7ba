"""Configuration dataclasses — single source of truth handed down the stack.

TPU-native re-expression of the reference config system (vllm/config.py:41-1553):
ModelConfig / CacheConfig / ParallelConfig / SchedulerConfig / DeviceConfig /
LoRAConfig / SpeculativeConfig / ObservabilityConfig / EngineConfig, with
cross-validation. GPU-specific knobs are replaced by TPU/mesh knobs
(hbm_utilization, mesh axes, bucketing).
"""
import os
from dataclasses import dataclass, field, fields
from typing import Any, Dict, List, Optional, Tuple, Union

from nmvllm_tpu import envs
from nmvllm_tpu.logger import init_logger
from nmvllm_tpu.transformers_utils.config import get_hf_config
from nmvllm_tpu.utils import get_dtype_bytes

logger = init_logger(__name__)

_GB = 1 << 30


class ModelConfig:
    """Model + tokenizer + dtype + quantization/sparsity configuration.

    Reference: vllm/config.py:41 (ModelConfig), including the NM `sparsity`
    field (vllm/engine/llm_engine.py:202-203).
    """

    def __init__(
        self,
        model: str,
        tokenizer: Optional[str] = None,
        tokenizer_mode: str = "auto",
        trust_remote_code: bool = False,
        dtype: str = "auto",
        seed: int = 0,
        revision: Optional[str] = None,
        max_model_len: Optional[int] = None,
        quantization: Optional[str] = None,
        sparsity: Optional[str] = None,
        quantization_param_path: Optional[str] = None,
        enforce_eager: bool = False,
        max_logprobs: int = 20,
        disable_sliding_window: bool = False,
        skip_tokenizer_init: bool = False,
        served_model_name: Optional[str] = None,
        hf_config: Optional[Any] = None,
        hf_overrides: Optional[Dict[str, Any]] = None,
    ) -> None:
        self.model = model
        self.tokenizer = tokenizer or model
        self.tokenizer_mode = tokenizer_mode
        self.trust_remote_code = trust_remote_code
        self.seed = seed
        self.revision = revision
        self.quantization = quantization
        self.sparsity = sparsity
        self.quantization_param_path = quantization_param_path
        self.enforce_eager = enforce_eager
        self.max_logprobs = max_logprobs
        self.disable_sliding_window = disable_sliding_window
        self.skip_tokenizer_init = skip_tokenizer_init
        self.served_model_name = served_model_name or model

        self.hf_config = hf_config if hf_config is not None else get_hf_config(
            model, trust_remote_code=trust_remote_code, revision=revision)
        if hf_overrides:
            for k, v in hf_overrides.items():
                setattr(self.hf_config, k, v)

        # Multimodal configs (llava, ...) nest the decoder geometry under
        # text_config; shape getters read from there.
        self.shape_config = getattr(self.hf_config, "text_config", None) \
            or self.hf_config
        self.dtype = _resolve_dtype(dtype, self.hf_config)
        self.max_model_len = _get_and_verify_max_len(self.shape_config,
                                                    max_model_len)
        if disable_sliding_window:
            # Reference vllm/config.py:87,121: serve the model with FULL
            # attention, capping max_model_len to the window so no
            # position ever exceeds what windowed training saw. Enables
            # prefix caching on sliding-window checkpoints.
            window = self._hf_sliding_window()
            if window is not None:
                if max_model_len is not None and max_model_len > window:
                    # Mirror reference _get_and_verify_max_len
                    # (vllm/config.py:1426+): an EXPLICIT user length
                    # beyond the window is an error, not a silent cap.
                    raise ValueError(
                        f"User-specified max_model_len ({max_model_len}) "
                        f"exceeds the model's sliding window ({window}); "
                        "with disable_sliding_window the model runs full "
                        "attention capped to the window.")
                self.max_model_len = min(self.max_model_len, window)
                # Structurally disable windowed masks: model layers read
                # the window straight from the HF config
                # (models/llama.py Attention), so enforce the
                # full-attention invariant at the source rather than via
                # the length cap alone.
                self.shape_config.use_sliding_window = False
        self._verify_quantization()

    # --- architecture accessors -------------------------------------------
    @property
    def architectures(self) -> List[str]:
        return getattr(self.hf_config, "architectures", None) or []

    def get_hidden_size(self) -> int:
        return self.shape_config.hidden_size

    def get_head_size(self) -> int:
        if getattr(self.shape_config, "kv_lora_rank", None):
            # DeepSeek-V2 MLA: decompressed qk head (nope+rope, 192)
            # padded to the TPU lane multiple (reference vllm/config.py
            # special-cases deepseek_v2 to 256 the same way).
            return 256
        if getattr(self.shape_config, "head_dim", None):
            return self.shape_config.head_dim
        return (self.shape_config.hidden_size //
                self.shape_config.num_attention_heads)

    def get_total_num_attention_heads(self) -> int:
        return self.shape_config.num_attention_heads

    def get_total_num_kv_heads(self) -> int:
        return getattr(self.shape_config, "num_key_value_heads",
                       self.shape_config.num_attention_heads)

    def get_num_attention_heads(self, parallel_config: "ParallelConfig") -> int:
        return max(1,
                   self.get_total_num_attention_heads() //
                   parallel_config.tensor_parallel_size)

    def get_num_kv_heads(self, parallel_config: "ParallelConfig") -> int:
        # When TP > total kv heads, KV heads are replicated across ranks.
        return max(1,
                   self.get_total_num_kv_heads() //
                   parallel_config.tensor_parallel_size)

    def get_num_layers(self, parallel_config: "ParallelConfig") -> int:
        total = self.shape_config.num_hidden_layers
        return total // parallel_config.pipeline_parallel_size

    def get_vocab_size(self) -> int:
        return self.shape_config.vocab_size

    def _hf_sliding_window(self) -> Optional[int]:
        if not getattr(self.shape_config, "use_sliding_window", True):
            return None
        return getattr(self.shape_config, "sliding_window", None)

    def get_sliding_window(self) -> Optional[int]:
        if getattr(self, "disable_sliding_window", False):
            # Full attention, max_model_len capped to the window (init).
            return None
        return self._hf_sliding_window()

    def _verify_quantization(self) -> None:
        from nmvllm_tpu.quantization import QUANTIZATION_METHODS
        if self.quantization is not None:
            self.quantization = self.quantization.lower()
            if self.quantization not in QUANTIZATION_METHODS:
                raise ValueError(
                    f"Unknown quantization method: {self.quantization}. Must "
                    f"be one of {list(QUANTIZATION_METHODS)}.")
        hf_quant = getattr(self.hf_config, "quantization_config", None)
        if hf_quant is not None and self.quantization is None:
            method = str(hf_quant.get("quant_method", "")).lower()
            if method in QUANTIZATION_METHODS:
                self.quantization = method
        from nmvllm_tpu.sparsity import SPARSITY_METHODS
        if self.sparsity is not None:
            self.sparsity = self.sparsity.lower()
            if self.sparsity not in SPARSITY_METHODS:
                raise ValueError(
                    f"Unknown sparsity method: {self.sparsity}. Must be one "
                    f"of {list(SPARSITY_METHODS)}.")


def _resolve_dtype(dtype: str, hf_config: Any) -> str:
    """Map 'auto'/torch dtype strings to a jnp dtype name (TPU default bf16)."""
    if dtype == "auto":
        torch_dtype = str(getattr(hf_config, "torch_dtype", None) or "")
        if "float32" in torch_dtype:
            return "float32"
        # float16 has no advantage on TPU; bf16 is the native fast dtype.
        return "bfloat16"
    alias = {"half": "bfloat16", "float16": "bfloat16", "fp16": "bfloat16",
             "bf16": "bfloat16", "float": "float32", "fp32": "float32"}
    dtype = alias.get(dtype, dtype)
    if dtype not in ("float32", "bfloat16"):
        raise ValueError(f"Unsupported dtype {dtype!r} on TPU.")
    return dtype


def _get_and_verify_max_len(hf_config: Any,
                            max_model_len: Optional[int]) -> int:
    derived = None
    for key in ("max_position_embeddings", "n_positions", "max_seq_len",
                "seq_length", "model_max_length"):
        v = getattr(hf_config, key, None)
        if v is not None:
            derived = v if derived is None else min(derived, v)
    rope_scaling = getattr(hf_config, "rope_scaling", None)
    if rope_scaling and derived is not None:
        rtype = rope_scaling.get("rope_type", rope_scaling.get("type"))
        factor = rope_scaling.get("factor", 1.0)
        if rtype in ("linear", "dynamic", "yarn", "longrope", "llama3"):
            if rtype in ("yarn",):
                derived = int(
                    rope_scaling.get("original_max_position_embeddings",
                                     derived) * factor)
    if derived is None:
        derived = 2048
    if max_model_len is None:
        return int(derived)
    if max_model_len > derived:
        logger.warning(
            "max_model_len %d exceeds the model's derived maximum %d.",
            max_model_len, derived)
    return int(max_model_len)


class CacheConfig:
    """Paged KV cache configuration (reference: vllm/config.py:447).

    TPU notes: block_size should be a multiple of the Pallas paged-attention
    page tile; KV pages live in HBM; swap space is host RAM reached via
    device_put streams.
    """

    def __init__(
        self,
        block_size: int = 16,
        hbm_utilization: float = 0.90,
        swap_space: float = 4.0,
        cache_dtype: str = "auto",
        num_gpu_blocks_override: Optional[int] = None,
        sliding_window: Optional[int] = None,
        enable_prefix_caching: bool = False,
    ) -> None:
        self.block_size = block_size
        self.hbm_utilization = hbm_utilization
        # Keep the reference's public name as an alias.
        self.gpu_memory_utilization = hbm_utilization
        self.swap_space_bytes = int(swap_space * _GB)
        self.cache_dtype = cache_dtype
        self.num_gpu_blocks_override = num_gpu_blocks_override
        self.sliding_window = sliding_window
        self.enable_prefix_caching = enable_prefix_caching
        # Filled in by the engine after profiling.
        self.num_gpu_blocks: Optional[int] = None
        self.num_cpu_blocks: Optional[int] = None
        self._verify_args()

    def _verify_args(self) -> None:
        if self.hbm_utilization > 1.0 or self.hbm_utilization <= 0:
            raise ValueError(
                "hbm_utilization must be in (0, 1], got "
                f"{self.hbm_utilization}.")
        if self.block_size < 1:
            raise ValueError(f"block_size must be >= 1, got {self.block_size}")
        if self.cache_dtype not in ("auto", "bfloat16", "float32", "fp8",
                                    "fp8_e4m3", "fp8_e5m2"):
            raise ValueError(f"Unknown kv cache dtype: {self.cache_dtype}")
        if self.cache_dtype.startswith("fp8"):
            import os
            if os.getenv("NMVLLM_FP8_KV_FAST", "1") in ("0", "false"):
                from nmvllm_tpu.logger import init_logger
                init_logger(__name__).warning(
                    "fp8 KV cache with NMVLLM_FP8_KV_FAST=0 uses the "
                    "slow astype dequant path (~2.6x decode slowdown, "
                    "docs/PERF_NOTES.md round 4); unset the flag to use "
                    "the relayout-free dequant.")

    def kv_dtype_name(self, model_dtype: str) -> str:
        if self.cache_dtype == "auto":
            return model_dtype
        if self.cache_dtype in ("fp8", "fp8_e4m3"):
            return "float8_e4m3fn"
        if self.cache_dtype == "fp8_e5m2":
            return "float8_e5m2"
        return self.cache_dtype


@dataclass
class TokenizerPoolConfig:
    """Parallel-tokenization pool (reference: vllm/config.py:541).

    TPU-native: the reference's Ray tokenizer actor pool becomes a
    ThreadPoolExecutor (HF fast tokenizers are Rust and release the GIL);
    pool_type "ray" is accepted as an alias of "thread" so reference CLI
    invocations keep working. pool_size 0 disables the pool.
    """
    pool_size: int
    pool_type: str = "thread"
    extra_config: Optional[dict] = None

    def __post_init__(self):
        if self.pool_type not in ("thread", "ray"):
            raise ValueError(f"Unknown tokenizer pool type: "
                             f"{self.pool_type}")
        if self.extra_config is None:
            self.extra_config = {}
        if not isinstance(self.extra_config, dict):
            raise ValueError("extra_config must be a dictionary.")

    @classmethod
    def create_config(cls, tokenizer_pool_size: int,
                      tokenizer_pool_type: str = "thread",
                      tokenizer_pool_extra_config=None
                      ) -> Optional["TokenizerPoolConfig"]:
        if not tokenizer_pool_size:
            return None
        if isinstance(tokenizer_pool_extra_config, str):
            import json
            tokenizer_pool_extra_config = json.loads(
                tokenizer_pool_extra_config)
        return cls(tokenizer_pool_size, tokenizer_pool_type,
                   tokenizer_pool_extra_config or {})


class ParallelConfig:
    """Device-mesh topology (reference: vllm/config.py:653 ParallelConfig).

    TPU-native: instead of world_size/NCCL ranks this describes a
    jax.sharding.Mesh with named axes. `data` x `tensor` (x `expert` for MoE
    models). Pipeline parallelism maps to DCN-connected stage meshes and is
    kept in the config surface for parity.
    """

    def __init__(
        self,
        pipeline_parallel_size: int = 1,
        tensor_parallel_size: int = 1,
        data_parallel_size: int = 1,
        expert_parallel_size: int = 1,
        sequence_parallel_size: int = 1,
        max_parallel_loading_workers: Optional[int] = None,
        disable_custom_all_reduce: bool = False,
        ray_workers_use_nsight: bool = False,
        placement_group: Optional[Any] = None,
        distributed_executor_backend: Optional[str] = None,
        tokenizer_pool_config: Optional[TokenizerPoolConfig] = None,
    ) -> None:
        self.pipeline_parallel_size = pipeline_parallel_size
        self.tensor_parallel_size = tensor_parallel_size
        self.data_parallel_size = data_parallel_size
        self.expert_parallel_size = expert_parallel_size
        self.sequence_parallel_size = sequence_parallel_size
        self.max_parallel_loading_workers = max_parallel_loading_workers
        self.disable_custom_all_reduce = disable_custom_all_reduce
        self.ray_workers_use_nsight = ray_workers_use_nsight
        self.placement_group = placement_group
        self.distributed_executor_backend = distributed_executor_backend
        self.tokenizer_pool_config = tokenizer_pool_config
        # EP rides the tp mesh axis (experts sharded over tp, activations
        # replicated — ops/moe.py fused_moe_ep), so it does not multiply
        # the world size.
        self.world_size = (pipeline_parallel_size * tensor_parallel_size *
                           data_parallel_size * sequence_parallel_size)
        self._verify_args()

    def _verify_args(self) -> None:
        for name in ("pipeline_parallel_size", "tensor_parallel_size",
                     "data_parallel_size", "expert_parallel_size",
                     "sequence_parallel_size"):
            if getattr(self, name) < 1:
                raise ValueError(f"{name} must be >= 1.")
        if self.expert_parallel_size not in (1, self.tensor_parallel_size):
            raise ValueError(
                "expert_parallel_size must be 1 or equal to "
                "tensor_parallel_size (EP shards the expert stacks over "
                "the tp mesh axis).")
        if self.sequence_parallel_size > 1 and (
                self.data_parallel_size > 1 or
                self.pipeline_parallel_size > 1):
            raise ValueError(
                "sequence_parallel_size > 1 composes with tensor "
                "parallelism only (not data/pipeline parallelism).")
        sp = self.sequence_parallel_size
        if sp & (sp - 1):
            raise ValueError(
                f"sequence_parallel_size must be a power of two "
                f"(prefill buckets are powers of two and must divide "
                f"evenly across sp shards), got {sp}.")

    @property
    def mesh_shape(self) -> Tuple[int, ...]:
        return (self.data_parallel_size, self.sequence_parallel_size,
                self.tensor_parallel_size)


class SchedulerConfig:
    """Continuous-batching scheduler limits (reference: vllm/config.py:765).

    TPU addition: bucketing is a first-class constraint — the scheduler packs
    batches *to* a bucket shape so the compiled-graph set stays finite.
    """

    def __init__(
        self,
        max_num_batched_tokens: Optional[int] = None,
        max_num_seqs: int = 256,
        max_model_len: int = 2048,
        use_v2_block_manager: bool = True,
        num_lookahead_slots: int = 0,
        delay_factor: float = 0.0,
        enable_chunked_prefill: bool = False,
        preemption_mode: Optional[str] = None,
    ) -> None:
        if max_num_batched_tokens is not None:
            self.max_num_batched_tokens = max_num_batched_tokens
        elif enable_chunked_prefill:
            self.max_num_batched_tokens = 512
        else:
            self.max_num_batched_tokens = max(max_model_len, 2048)
        self.max_num_seqs = max_num_seqs
        self.max_model_len = max_model_len
        self.use_v2_block_manager = use_v2_block_manager
        self.num_lookahead_slots = num_lookahead_slots
        self.delay_factor = delay_factor
        self.chunked_prefill_enabled = enable_chunked_prefill
        self.preemption_mode = preemption_mode
        self._verify_args()

    def _verify_args(self) -> None:
        if (self.max_num_batched_tokens < self.max_model_len
                and not self.chunked_prefill_enabled):
            raise ValueError(
                f"max_num_batched_tokens ({self.max_num_batched_tokens}) is "
                f"smaller than max_model_len ({self.max_model_len}). This "
                "effectively limits prompt length; enable chunked prefill or "
                "increase max_num_batched_tokens.")
        if self.max_num_batched_tokens < self.max_num_seqs:
            raise ValueError(
                "max_num_batched_tokens must be >= max_num_seqs.")
        if self.num_lookahead_slots < 0:
            raise ValueError("num_lookahead_slots must be >= 0.")


class DeviceConfig:
    """Target platform (reference: vllm/config.py:855)."""

    def __init__(self, device: str = "auto") -> None:
        if device == "auto":
            import jax
            try:
                device = jax.devices()[0].platform
            except Exception:
                device = "cpu"
        if device == "axon":
            device = "tpu"
        self.device_type = device
        self.device = device


@dataclass
class LoRAConfig:
    """Multi-LoRA serving limits (reference: vllm/config.py:1266)."""
    max_lora_rank: int = 16
    max_loras: int = 1
    fully_sharded_loras: bool = False
    max_cpu_loras: Optional[int] = None
    lora_dtype: Optional[str] = None
    lora_extra_vocab_size: int = 256

    def __post_init__(self):
        possible_ranks = (8, 16, 32, 64, 128, 256)
        if self.max_lora_rank not in possible_ranks:
            raise ValueError(f"max_lora_rank ({self.max_lora_rank}) must be "
                             f"one of {possible_ranks}.")
        if self.max_loras < 1:
            raise ValueError("max_loras must be >= 1.")
        if self.max_cpu_loras is None:
            self.max_cpu_loras = self.max_loras
        elif self.max_cpu_loras < self.max_loras:
            raise ValueError("max_cpu_loras must be >= max_loras.")

    def verify_with_model_config(self, model_config: ModelConfig) -> None:
        if self.lora_dtype in (None, "auto"):
            self.lora_dtype = model_config.dtype


@dataclass
class SpeculativeConfig:
    """Speculative decoding configuration (reference: vllm/config.py:888)."""
    draft_model: Optional[str] = None
    num_speculative_tokens: int = 0
    ngram_prompt_lookup_max: int = 0
    ngram_prompt_lookup_min: int = 0
    speculative_disable_by_batch_size: Optional[int] = None
    acceptance_method: str = "rejection_sampler"
    # MEDUSA typical acceptance knobs (reference SpeculativeConfig
    # typical_acceptance_sampler_posterior_{threshold,alpha}).
    typical_acceptance_sampler_posterior_threshold: float = 0.09
    typical_acceptance_sampler_posterior_alpha: float = 0.3

    @property
    def method(self) -> Optional[str]:
        if self.ngram_prompt_lookup_max > 0:
            return "ngram"
        if self.draft_model is not None:
            return "draft_model"
        return None


@dataclass
class ObservabilityConfig:
    """Tracing/metrics endpoints (reference: vllm/config.py:1526)."""
    otlp_traces_endpoint: Optional[str] = None
    collect_model_forward_time: bool = False


@dataclass
class DecodingConfig:
    """Guided-decoding defaults (reference: vllm/config.py:1511)."""
    guided_decoding_backend: str = "native"

    def __post_init__(self):
        valid = ("native",)
        if self.guided_decoding_backend not in valid:
            raise ValueError(
                f"guided_decoding_backend must be one of {valid}.")


@dataclass
class EngineConfig:
    """Bundle of every config (reference: vllm/config.py:1537)."""
    model_config: ModelConfig
    cache_config: CacheConfig
    parallel_config: ParallelConfig
    scheduler_config: SchedulerConfig
    device_config: DeviceConfig
    lora_config: Optional[LoRAConfig] = None
    speculative_config: Optional[SpeculativeConfig] = None
    decoding_config: Optional[DecodingConfig] = None
    observability_config: Optional[ObservabilityConfig] = None
    load_config: Optional["LoadConfig"] = None

    def __post_init__(self):
        if self.decoding_config is None:
            self.decoding_config = DecodingConfig()
        if self.observability_config is None:
            self.observability_config = ObservabilityConfig()
        if self.load_config is None:
            self.load_config = LoadConfig()
        if self.lora_config is not None:
            self.lora_config.verify_with_model_config(self.model_config)

    def to_dict(self) -> Dict[str, Any]:
        return {f.name: getattr(self, f.name) for f in fields(self)}


@dataclass
class LoadConfig:
    """Weight-loading strategy (reference: vllm/config.py:604).

    load_format: auto | safetensors | dummy | sharded_state | orbax |
                 tensorizer
    """
    load_format: str = "auto"
    download_dir: Optional[str] = None
    model_loader_extra_config: Optional[Dict[str, Any]] = None

    def __post_init__(self):
        valid = ("auto", "safetensors", "pt", "dummy", "sharded_state",
                 "orbax", "tensorizer")
        if self.load_format not in valid:
            raise ValueError(f"load_format must be one of {valid}.")
