"""Offline batch-inference API.

Reference: vllm/entrypoints/llm.py:24 (LLM class; generate:258,
_run_engine:552).
"""
from typing import List, Optional, Sequence, Union

from nmvllm_tpu.engine.arg_utils import EngineArgs
from nmvllm_tpu.engine.llm_engine import LLMEngine
from nmvllm_tpu.logger import init_logger
from nmvllm_tpu.outputs import RequestOutput
from nmvllm_tpu.sampling_params import SamplingParams
from nmvllm_tpu.utils import Counter

logger = init_logger(__name__)


class LLM:
    """Synchronous, offline LLM with continuous batching underneath."""

    def __init__(
        self,
        model: str,
        tokenizer: Optional[str] = None,
        tokenizer_mode: str = "auto",
        skip_tokenizer_init: bool = False,
        trust_remote_code: bool = False,
        tensor_parallel_size: int = 1,
        dtype: str = "auto",
        quantization: Optional[str] = None,
        sparsity: Optional[str] = None,
        revision: Optional[str] = None,
        seed: int = 0,
        gpu_memory_utilization: float = 0.9,
        swap_space: float = 4.0,
        enforce_eager: bool = False,
        max_model_len: Optional[int] = None,
        block_size: int = 16,
        enable_prefix_caching: bool = False,
        enable_chunked_prefill: bool = False,
        max_num_seqs: int = 256,
        max_num_batched_tokens: Optional[int] = None,
        kv_cache_dtype: str = "auto",
        quantization_param_path: Optional[str] = None,
        num_gpu_blocks_override: Optional[int] = None,
        disable_log_stats: bool = True,
        **kwargs,
    ) -> None:
        engine_args = EngineArgs(
            model=model, tokenizer=tokenizer, tokenizer_mode=tokenizer_mode,
            skip_tokenizer_init=skip_tokenizer_init,
            trust_remote_code=trust_remote_code,
            tensor_parallel_size=tensor_parallel_size, dtype=dtype,
            quantization=quantization, sparsity=sparsity, revision=revision,
            seed=seed, gpu_memory_utilization=gpu_memory_utilization,
            swap_space=swap_space, enforce_eager=enforce_eager,
            max_model_len=max_model_len, block_size=block_size,
            enable_prefix_caching=enable_prefix_caching,
            enable_chunked_prefill=enable_chunked_prefill,
            max_num_seqs=max_num_seqs,
            max_num_batched_tokens=max_num_batched_tokens,
            kv_cache_dtype=kv_cache_dtype,
            quantization_param_path=quantization_param_path,
            num_gpu_blocks_override=num_gpu_blocks_override,
            disable_log_stats=disable_log_stats,
            **kwargs)
        self.llm_engine = LLMEngine.from_engine_args(engine_args)
        self.request_counter = Counter()

    def get_tokenizer(self):
        return self.llm_engine.tokenizer

    def generate(
        self,
        prompts: Optional[Union[str, List[str]]] = None,
        sampling_params: Optional[Union[SamplingParams,
                                        Sequence[SamplingParams]]] = None,
        prompt_token_ids: Optional[List[List[int]]] = None,
        use_tqdm: bool = False,
        multi_modal_data: Optional[Union[dict, List[Optional[dict]]]] = None,
    ) -> List[RequestOutput]:
        if prompts is None and prompt_token_ids is None:
            raise ValueError("Either prompts or prompt_token_ids must be "
                             "provided.")
        if isinstance(prompts, str):
            prompts = [prompts]
        num_requests = (len(prompts) if prompts is not None
                        else len(prompt_token_ids))
        if sampling_params is None:
            sampling_params = SamplingParams()
        if isinstance(sampling_params, SamplingParams):
            sampling_params = [sampling_params] * num_requests
        elif len(sampling_params) != num_requests:
            raise ValueError(
                "sampling_params must match the number of prompts.")
        if isinstance(multi_modal_data, dict):
            multi_modal_data = [multi_modal_data] * num_requests
        for i in range(num_requests):
            request_id = str(next(self.request_counter))
            self.llm_engine.add_request(
                request_id,
                prompt=prompts[i] if prompts is not None else None,
                sampling_params=sampling_params[i],
                prompt_token_ids=(prompt_token_ids[i]
                                  if prompt_token_ids is not None else None),
                multi_modal_data=(multi_modal_data[i]
                                  if multi_modal_data is not None else None))
        return self._run_engine(use_tqdm)

    def encode(self, prompts: Union[str, List[str]],
               pooling_params=None) -> List["EmbeddingRequestOutput"]:
        """Pooled embeddings for embedding-architecture models
        (reference LLM.encode / EmbeddingRequestOutput)."""
        from nmvllm_tpu.outputs import (EmbeddingOutput,
                                        EmbeddingRequestOutput)
        from nmvllm_tpu.sequence import SequenceData, SequenceGroupMetadata
        engine = self.llm_engine
        model = engine.executor.runner.model
        if not getattr(model, "is_embedding_model", False):
            raise ValueError(
                f"Model {engine.model_config.model} is not an embedding "
                "model; use generate().")
        if isinstance(prompts, str):
            prompts = [prompts]
        bs = engine.cache_config.block_size
        outputs = []
        for i, prompt in enumerate(prompts):
            ids = engine.tokenizer.encode(prompt)
            nblocks = -(-len(ids) // bs)
            table = list(range(nblocks))  # scratch blocks
            meta = SequenceGroupMetadata(
                request_id=str(i), is_prompt=True,
                seq_data={0: SequenceData(ids)}, sampling_params=None,
                block_tables={0: table})
            kv, pooled = engine.executor.runner.execute_embedding(
                meta, engine.executor.cache_engine.kv_caches)
            engine.executor.cache_engine.kv_caches = kv
            outputs.append(EmbeddingRequestOutput(
                request_id=str(i),
                outputs=EmbeddingOutput(embedding=pooled.tolist()),
                prompt_token_ids=ids, finished=True))
        return outputs

    def _run_engine(self, use_tqdm: bool) -> List[RequestOutput]:
        outputs: List[RequestOutput] = []
        while self.llm_engine.has_unfinished_requests():
            step_outputs = self.llm_engine.step()
            for output in step_outputs:
                if output.finished:
                    outputs.append(output)
        outputs.sort(key=lambda o: int(o.request_id))
        return outputs
