"""nmvllm_tpu: TPU-native LLM serving engine with nm-vllm's capability
surface (paged continuous batching + INT4/INT8/FP8/sparse compression),
built on JAX/XLA/Pallas. See SURVEY.md for the architecture map."""
from nmvllm_tpu.version import __version__

__all__ = [
    "__version__", "LLM", "SamplingParams", "EngineArgs", "LLMEngine",
    "RequestOutput", "CompletionOutput", "ModelRegistry",
]


def __getattr__(name):
    # Lazy imports keep `import nmvllm_tpu` light.
    if name == "LLM":
        from nmvllm_tpu.entrypoints.llm import LLM
        return LLM
    if name == "SamplingParams":
        from nmvllm_tpu.sampling_params import SamplingParams
        return SamplingParams
    if name == "EngineArgs":
        from nmvllm_tpu.engine.arg_utils import EngineArgs
        return EngineArgs
    if name == "LLMEngine":
        from nmvllm_tpu.engine.llm_engine import LLMEngine
        return LLMEngine
    if name in ("RequestOutput", "CompletionOutput"):
        import nmvllm_tpu.outputs as outputs
        return getattr(outputs, name)
    if name == "ModelRegistry":
        from nmvllm_tpu.models import ModelRegistry
        return ModelRegistry
    raise AttributeError(f"module 'nmvllm_tpu' has no attribute {name!r}")
