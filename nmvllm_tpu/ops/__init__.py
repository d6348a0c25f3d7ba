"""Pallas TPU kernels + jnp reference implementations.

This package is the TPU-native replacement for the reference's ``csrc/``
CUDA kernel inventory (see SURVEY.md §2.2): paged attention, cache scatter
ops, fused dequant-GEMMs, 2:4 sparse GEMM, MoE grouped GEMM, and quant ops.
Every kernel has a same-signature jnp reference used for testing (CPU
interpret mode) and as an automatic fallback on non-TPU backends.
"""
