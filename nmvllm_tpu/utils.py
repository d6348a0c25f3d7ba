"""Small shared utilities."""
import time
import uuid
from typing import List, Sequence, TypeVar

T = TypeVar("T")

STR_DTYPE_TO_JNP = {
    "float32": "float32",
    "float16": "float16",
    "bfloat16": "bfloat16",
    "fp8": "float8_e4m3fn",
    "fp8_e4m3": "float8_e4m3fn",
    "fp8_e5m2": "float8_e5m2",
    "int8": "int8",
    "auto": "bfloat16",
}


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def next_power_of_2(x: int) -> int:
    if x <= 1:
        return 1
    return 1 << (x - 1).bit_length()


def random_uuid() -> str:
    return str(uuid.uuid4().hex)


def now() -> float:
    return time.monotonic()


def flatten_2d(lists: Sequence[Sequence[T]]) -> List[T]:
    return [x for sub in lists for x in sub]


def pad_to(lst: Sequence[int], length: int, pad: int = 0) -> List[int]:
    out = list(lst)[:length]
    out.extend([pad] * (length - len(out)))
    return out


def get_dtype_bytes(dtype_str: str) -> int:
    import jax.numpy as jnp
    import numpy as np
    name = STR_DTYPE_TO_JNP.get(dtype_str, dtype_str)
    return np.dtype(jnp.dtype(name)).itemsize


class Counter:
    """Monotonic id generator (reference: vllm/utils.py Counter)."""

    def __init__(self, start: int = 0) -> None:
        self.counter = start

    def __next__(self) -> int:
        i = self.counter
        self.counter += 1
        return i

    def reset(self) -> None:
        self.counter = 0


def is_tpu_platform() -> bool:
    import jax
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


class DeviceMemoryProfiler:
    """Measure live device memory around a block (for KV sizing)."""

    def __enter__(self):
        self.before = device_memory_used()
        return self

    def __exit__(self, *a):
        self.consumed = device_memory_used() - self.before
        return False


def device_memory_used() -> int:
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_in_use" in stats:
            return int(stats["bytes_in_use"])
    except Exception:
        pass
    # Platforms without memory_stats (the axon tunnel reports nothing):
    # fall back to summing live arrays — without this, KV sizing assumed
    # an EMPTY device after 6.6 GB of weights loaded and oversized the
    # pool until the first big prefill compile OOMed HBM (round-5
    # serving diagnostics).
    try:
        tot = 0
        for a in jax.live_arrays():
            tot += a.size * a.dtype.itemsize
        return tot
    except Exception:
        return 0


def device_memory_total(default: int = 16 * 1024**3) -> int:
    import jax
    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return default
