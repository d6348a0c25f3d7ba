"""Tokenizer group: shared encode surface with per-LoRA tokenizers and an
optional thread pool.

Reference: vllm/transformers_utils/tokenizer_group/{base_tokenizer_group,
tokenizer_group,ray_tokenizer_group}.py — a TokenizerGroup with an LRU of
per-LoRA tokenizers and an optional Ray actor pool for parallel prompt
tokenization. TPU-native: there is no Ray; the pool is a
ThreadPoolExecutor (HF fast tokenizers are Rust and release the GIL, so
threads parallelize for real), selected by
TokenizerPoolConfig(pool_type="thread"; "ray" is accepted as an alias so
reference CLI invocations keep working).
"""
import os
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

from nmvllm_tpu.logger import init_logger
from nmvllm_tpu.transformers_utils.tokenizer import get_tokenizer

logger = init_logger(__name__)


def get_lora_tokenizer(lora_request, base_tokenizer, **kwargs):
    """Tokenizer shipped with a LoRA adapter, else the base tokenizer
    (reference transformers_utils/tokenizer.py get_lora_tokenizer)."""
    if lora_request is None:
        return base_tokenizer
    path = getattr(lora_request, "lora_local_path", None) or \
        getattr(lora_request, "lora_path", None)
    if not path:
        return base_tokenizer
    has_files = any(
        os.path.exists(os.path.join(path, f))
        for f in ("tokenizer.json", "tokenizer.model",
                  "tokenizer_config.json"))
    if not has_files:
        return base_tokenizer
    try:
        return get_tokenizer(path, **kwargs)
    except Exception as e:  # adapter tokenizer is best-effort
        logger.warning("Could not load LoRA tokenizer from %s (%s); "
                       "using the base tokenizer.", path, e)
        return base_tokenizer


class TokenizerGroup:
    """Base + per-LoRA tokenizers, sync and async encode."""

    def __init__(self, tokenizer_id: str, *, tokenizer_mode: str = "auto",
                 trust_remote_code: bool = False,
                 max_loras: int = 8, pool_config=None, **kwargs):
        self.tokenizer = get_tokenizer(
            tokenizer_id, tokenizer_mode=tokenizer_mode,
            trust_remote_code=trust_remote_code, **kwargs)
        self._kwargs = kwargs
        self._max_loras = max_loras
        self._lora_tokenizers = {}  # lora_int_id -> tokenizer (LRU)
        self._pool: Optional[ThreadPoolExecutor] = None
        if pool_config is not None and pool_config.pool_size > 0:
            self._pool = ThreadPoolExecutor(
                max_workers=pool_config.pool_size,
                thread_name_prefix="tokenizer")

    # ------------------------------------------------------------- lookup
    def get_lora_tokenizer(self, lora_request=None):
        if lora_request is None:
            return self.tokenizer
        key = getattr(lora_request, "lora_int_id", 0)
        if key in self._lora_tokenizers:
            tok = self._lora_tokenizers.pop(key)
            self._lora_tokenizers[key] = tok  # refresh LRU order
            return tok
        tok = get_lora_tokenizer(lora_request, self.tokenizer,
                                 **self._kwargs)
        self._lora_tokenizers[key] = tok
        while len(self._lora_tokenizers) > self._max_loras:
            self._lora_tokenizers.pop(next(iter(self._lora_tokenizers)))
        return tok

    # ------------------------------------------------------------- encode
    def encode(self, prompt: str, lora_request=None) -> List[int]:
        return self.get_lora_tokenizer(lora_request).encode(prompt)

    async def encode_async(self, prompt: str,
                           lora_request=None) -> List[int]:
        if self._pool is None:
            return self.encode(prompt, lora_request)
        import asyncio
        loop = asyncio.get_running_loop()
        return await loop.run_in_executor(
            self._pool, self.encode, prompt, lora_request)

    # -------------------------------------------------------- passthrough
    @property
    def eos_token_id(self):
        return getattr(self.tokenizer, "eos_token_id", None)
