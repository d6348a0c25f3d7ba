"""TokenizerGroup (transformers_utils/tokenizer_group.py): sync/async
encode parity, thread-pool path, per-LoRA tokenizer fallback (reference
tests/tokenization + tokenizer_group tests)."""
import asyncio
from dataclasses import dataclass

from nmvllm_tpu.config import TokenizerPoolConfig
from nmvllm_tpu.transformers_utils.tokenizer_group import TokenizerGroup


@dataclass
class _Lora:
    lora_int_id: int
    lora_local_path: str = ""


def test_sync_async_parity_and_pool():
    g_plain = TokenizerGroup("debug-llama")
    g_pool = TokenizerGroup(
        "debug-llama",
        pool_config=TokenizerPoolConfig.create_config(2, "thread"))
    prompts = [f"prompt number {i}" for i in range(8)]

    async def run(g):
        return await asyncio.gather(
            *(g.encode_async(p) for p in prompts))

    plain = [g_plain.encode(p) for p in prompts]
    assert asyncio.run(run(g_plain)) == plain
    assert asyncio.run(run(g_pool)) == plain
    assert g_pool._pool is not None and g_plain._pool is None


def test_ray_pool_type_is_thread_alias():
    cfg = TokenizerPoolConfig.create_config(2, "ray", '{"x": 1}')
    assert cfg.pool_size == 2 and cfg.extra_config == {"x": 1}
    assert TokenizerPoolConfig.create_config(0) is None


def test_lora_tokenizer_fallback(tmp_path):
    g = TokenizerGroup("debug-llama", max_loras=2)
    # Adapter dir without tokenizer files -> base tokenizer.
    assert g.get_lora_tokenizer(
        _Lora(1, str(tmp_path))) is g.tokenizer
    # Cached per lora_int_id; LRU evicts beyond max_loras.
    g.get_lora_tokenizer(_Lora(2, str(tmp_path)))
    g.get_lora_tokenizer(_Lora(3, str(tmp_path)))
    assert len(g._lora_tokenizers) == 2
    assert g.encode("hello", _Lora(1, str(tmp_path))) == \
        g.encode("hello")
