"""Multi-LoRA serving components.

Reference: vllm/lora/ (layers.py wrappers, LoRAModelManager models.py,
punica.py batched-GEMV kernels, worker_manager.py LRU host<->device
migration).

TPU-native design: adapters live in fixed device-resident stacks
``A (max_loras, K, r)`` / ``B (max_loras, r, N)`` per wrapped layer; the
per-token adapter slot index drives a gather + two thin einsums —
the XLA-native replacement for Punica's bgmv CUDA kernels
(csrc/punica/bgmv, SURVEY.md §2.2). Engine integration (per-request
LoRARequest routing through scheduler metadata into the runner's step
inputs) follows in the next round; the components here are complete and
tested.
"""
from nmvllm_tpu.lora.layers import LoRAConfig, LoRALayerWeights, lora_apply
from nmvllm_tpu.lora.models import LoRAModel, LoRAModelManager
from nmvllm_tpu.lora.request import LoRARequest

__all__ = ["LoRARequest", "LoRAModel", "LoRAModelManager",
           "LoRALayerWeights", "lora_apply", "LoRAConfig"]
