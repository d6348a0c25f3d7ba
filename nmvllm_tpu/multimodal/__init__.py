"""Multi-modal input plumbing.

Reference: vllm/multimodal/{base,image,registry}.py — a per-modality
plugin registry that maps raw user data (e.g. a PIL image) into the
model-ready tensor dict, with per-model-class mapper overrides, plus
dummy-data factories used by memory profiling.
"""
from nmvllm_tpu.multimodal.base import (MultiModalData, MultiModalInputs,
                                        MultiModalPlugin)
from nmvllm_tpu.multimodal.image import ImagePlugin
from nmvllm_tpu.multimodal.registry import (MULTIMODAL_REGISTRY,
                                            MultiModalRegistry)

__all__ = [
    "MultiModalData", "MultiModalInputs", "MultiModalPlugin",
    "ImagePlugin", "MultiModalRegistry", "MULTIMODAL_REGISTRY",
]
