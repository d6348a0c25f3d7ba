"""Activation functions (reference:
vllm/model_executor/layers/activation.py:16-162 — SiluAndMul, GELU variants;
CUDA kernels csrc/activation_kernels.cu). XLA fuses these natively on TPU."""
import jax
import jax.numpy as jnp


def silu_and_mul(x: jax.Array) -> jax.Array:
    """x: (..., 2d) -> silu(x[..., :d]) * x[..., d:]."""
    a, b = jnp.split(x, 2, axis=-1)
    return jax.nn.silu(a) * b


def gelu_and_mul(x: jax.Array, approximate: str = "none") -> jax.Array:
    a, b = jnp.split(x, 2, axis=-1)
    return jax.nn.gelu(a, approximate=(approximate == "tanh")) * b


ACTIVATIONS = {
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_fast": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
}


def get_act_fn(name: str):
    if name not in ACTIVATIONS:
        raise ValueError(f"Unsupported activation: {name}")
    return ACTIVATIONS[name]
