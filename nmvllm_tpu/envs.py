"""Centralized environment-flag registry.

TPU-native analogue of the reference's ``vllm/envs.py:5-43``: every tunable
environment variable the framework reads is declared here once, with a lazy
accessor so values are read at use time (tests can monkeypatch os.environ).
"""
import os
from typing import Any, Callable, Dict

environment_variables: Dict[str, Callable[[], Any]] = {
    # Logging level for the package logger.
    "NMVLLM_LOGGING_LEVEL": lambda: os.getenv("NMVLLM_LOGGING_LEVEL", "INFO"),
    # Force Pallas kernels into interpreter mode (any non-empty value).
    # Automatically implied on non-TPU backends.
    "NMVLLM_PALLAS_INTERPRET": lambda: bool(os.getenv("NMVLLM_PALLAS_INTERPRET", "")),
    # Disable Pallas kernels entirely and use the jnp reference paths.
    "NMVLLM_DISABLE_PALLAS": lambda: bool(os.getenv("NMVLLM_DISABLE_PALLAS", "")),
    # Disable post-load q/k/v and gate/up projection fusion.
    "NMVLLM_DISABLE_FUSION": lambda: bool(os.getenv("NMVLLM_DISABLE_FUSION", "")),
    # Fuse residual adds into the W4 kernel epilogues (measured ~8%
    # SLOWER e2e on the axon stack — off unless explicitly enabled;
    # docs/PERF_NOTES.md "epilogue fusion A/B").
    "NMVLLM_EPILOGUE_FUSION": lambda: bool(os.getenv("NMVLLM_EPILOGUE_FUSION", "")),
    # Disable folding the two RMSNorms into kernel prologues (A/B knob).
    "NMVLLM_DISABLE_NORM_FUSION": lambda: bool(os.getenv("NMVLLM_DISABLE_NORM_FUSION", "")),
    # Serve symmetric INT4 weight-only linears through int8 MXU dots
    # (per-token int8 activation quant — the Machete-class successor to
    # the Marlin W4A16 path). "1"/"grouped": int8-stored weights with
    # exact per-group scales (grouped int8 dots). "channel": requantize
    # to per-channel int8 at load — ONE full-depth int8 dot per linear,
    # the fastest path (docs/PERF_NOTES.md), with a small extra
    # weight-rounding error. Opt-in; empty = exact W4A16 dequant-GEMM.
    "NMVLLM_INT4_A8": lambda: os.getenv("NMVLLM_INT4_A8", ""),
    # Fraction of HBM the engine may use for weights+KV (same role as
    # --gpu-memory-utilization in the reference).
    "NMVLLM_HBM_UTILIZATION": lambda: float(os.getenv("NMVLLM_HBM_UTILIZATION", "0.9")),
    # Host swap space for swapped-out KV blocks, GiB.
    "NMVLLM_SWAP_SPACE_GB": lambda: float(os.getenv("NMVLLM_SWAP_SPACE_GB", "4")),
    # Multi-host pod health-check timeout, seconds (executor
    # check_health -> parallel/multihost.py::check_pod_health).
    "NMVLLM_POD_HEALTH_TIMEOUT_S": lambda: float(
        os.getenv("NMVLLM_POD_HEALTH_TIMEOUT_S", "30")),
    # Engine iteration watchdog, seconds (async engine). Generous default:
    # a step that hits a fresh bucket pays XLA compilation (minutes on a
    # cold cache), unlike the reference's eager CUDA path (envs.py:15).
    "NMVLLM_ENGINE_ITERATION_TIMEOUT_S": lambda: int(
        os.getenv("NMVLLM_ENGINE_ITERATION_TIMEOUT_S", "600")),
    # Persistent XLA compile-cache directory ("" disables).
    "NMVLLM_XLA_CACHE_PATH": lambda: os.getenv(
        "NMVLLM_XLA_CACHE_PATH", os.path.expanduser("~/.cache/nmvllm_tpu/xla")),
    # Port for the OpenAI-compatible server.
    "NMVLLM_PORT": lambda: int(os.getenv("NMVLLM_PORT", "8000")),
    # API key for the OpenAI server ("" = no auth).
    "NMVLLM_API_KEY": lambda: os.getenv("NMVLLM_API_KEY", ""),
    # Usage telemetry is always off (the NM fork also defaults it off).
    "NMVLLM_NO_USAGE_STATS": lambda: True,
    # kv heads per block-diagonal dot in the decode attention kernel
    # (0 = all heads in one dot; see ops/paged_attention.py).
    "NMVLLM_ATTN_HPD": lambda: int(os.getenv("NMVLLM_ATTN_HPD", "0")),
    # One-kernel MLP block (rmsnorm + gate/up dequant-GEMM + silu*mul +
    # down dequant-GEMM, ops/fused_mlp.py) for decode-sized W4 layers.
    # Default ON (+0.9% e2e at 0.1% drift, A/B 2026-08-19); "0" disables.
    "NMVLLM_FUSED_MLP": lambda: os.getenv("NMVLLM_FUSED_MLP", "1") != "0",
    # One-kernel MLP block on the W4A8 'packed' path
    # (ops/fused_mlp.py::fused_mlp_a8p). Default OFF: the chunked down
    # dot loses more MXU efficiency than the saved Pallas call pays
    # (measured 1.27x the two-call path at m=72 decode geometry,
    # docs/PERF_NOTES.md round 5b). Kept flag-gated for re-evaluation
    # at other geometries.
    "NMVLLM_FUSED_MLP_A8": lambda: os.getenv("NMVLLM_FUSED_MLP_A8",
                                             "0") != "0",
    # Native (C++) host-runtime hot loops (csrc/host/nm_host.cpp):
    # decode batch assembly + prefix-cache block hashing. "0" disables
    # (pure-Python fallbacks are always available).
    "NMVLLM_NATIVE_HOST": lambda: os.getenv("NMVLLM_NATIVE_HOST", "1")
    != "0",
    # Weight-only quantize the (untied) LM head at load: "4" or "8" bits,
    # "" = dense (reference behavior: lm_head always fp16). The head
    # weight is the largest per-step HBM read after KV (layers/embedding.py).
    "NMVLLM_QUANT_LM_HEAD": lambda: os.getenv("NMVLLM_QUANT_LM_HEAD", ""),
    # Expert-parallel MoE dispatch: all-to-all token shipping instead of
    # masked-local compute (ops/moe.py fused_moe_ep_a2a; the right
    # pattern for multi-slice EP over DCN — see docs/SCALING.md).
    "NMVLLM_MOE_A2A": lambda: bool(os.getenv("NMVLLM_MOE_A2A", "")),
    # Function-level debug tracing (reference VLLM_TRACE_FUNCTION,
    # envs.py:28): any non-empty value logs every nmvllm_tpu-internal
    # call/return to a per-process file for hang diagnosis.
    "NMVLLM_TRACE_FUNCTION": lambda: bool(
        os.getenv("NMVLLM_TRACE_FUNCTION", "")),
    # Optional logging dictConfig JSON path + master toggle (reference
    # VLLM_LOGGING_CONFIG_PATH / VLLM_CONFIGURE_LOGGING, envs.py:27).
    "NMVLLM_LOGGING_CONFIG_PATH": lambda: os.getenv(
        "NMVLLM_LOGGING_CONFIG_PATH", ""),
    "NMVLLM_CONFIGURE_LOGGING": lambda: bool(int(
        os.getenv("NMVLLM_CONFIGURE_LOGGING", "1"))),
}


def __getattr__(name: str) -> Any:
    if name in environment_variables:
        return environment_variables[name]()
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


def __dir__():
    return list(environment_variables.keys())
