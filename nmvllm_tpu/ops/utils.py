"""Kernel dispatch helpers: decide between compiled Pallas, interpret-mode
Pallas, and jnp reference paths."""
import functools

from nmvllm_tpu import envs


@functools.lru_cache(maxsize=None)
def backend_platform() -> str:
    import jax
    try:
        return jax.devices()[0].platform
    except Exception:
        return "cpu"


def use_pallas() -> bool:
    """Whether to call Pallas kernels at all (else jnp reference)."""
    if envs.NMVLLM_DISABLE_PALLAS:
        return False
    return True


def pallas_interpret() -> bool:
    """Interpreter mode is required off-TPU and can be forced by env."""
    if envs.NMVLLM_PALLAS_INTERPRET:
        return True
    return backend_platform() != "tpu"


def cost_estimate(flops: float, bytes_accessed: float,
                  transcendentals: float = 0):
    from jax.experimental import pallas as pl
    return pl.CostEstimate(flops=int(flops),
                           bytes_accessed=int(bytes_accessed),
                           transcendentals=int(transcendentals))
