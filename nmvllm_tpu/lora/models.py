"""LoRA adapter management: loading peft checkpoints, LRU slot manager.

Reference: vllm/lora/models.py (LoRAModel.from_local_checkpoint,
LoRAModelManager with LRU cache + slot activation) and
worker_manager.py (CPU<->device migration).
"""
import json
import os
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

import numpy as np

from nmvllm_tpu.logger import init_logger
from nmvllm_tpu.lora.layers import (LoRAConfig, LoRALayerWeights,
                                    clear_lora_slot, set_lora_slot)
from nmvllm_tpu.lora.request import LoRARequest

logger = init_logger(__name__)


class LoRAModel:
    """One adapter: module_name -> LoRALayerWeights."""

    def __init__(self, lora_id: int, rank: int,
                 loras: Dict[str, LoRALayerWeights]):
        self.id = lora_id
        self.rank = rank
        self.loras = loras

    @classmethod
    def from_local_checkpoint(cls, path: str, lora_id: int) -> "LoRAModel":
        """Load a HF peft adapter directory (adapter_config.json +
        adapter_model.safetensors)."""
        import jax.numpy as jnp
        with open(os.path.join(path, "adapter_config.json")) as f:
            cfg = json.load(f)
        rank = int(cfg["r"])
        alpha = float(cfg.get("lora_alpha", rank))
        tensors: Dict[str, np.ndarray] = {}
        st_path = os.path.join(path, "adapter_model.safetensors")
        if os.path.exists(st_path):
            from safetensors.numpy import load_file
            tensors = load_file(st_path)
        else:
            raise FileNotFoundError(f"No adapter_model.safetensors in "
                                    f"{path}")
        loras: Dict[str, LoRALayerWeights] = {}
        # peft names: base_model.model.<module>.lora_A.weight (r, K) and
        # lora_B.weight (N, r).
        by_module: Dict[str, Dict[str, np.ndarray]] = {}
        for name, arr in tensors.items():
            if ".lora_A." in name:
                mod = name.split(".lora_A.")[0]
                by_module.setdefault(mod, {})["a"] = arr
            elif ".lora_B." in name:
                mod = name.split(".lora_B.")[0]
                by_module.setdefault(mod, {})["b"] = arr
        for mod, ab in by_module.items():
            clean = mod.replace("base_model.model.", "")
            loras[clean] = LoRALayerWeights(
                clean, rank, alpha,
                jnp.asarray(ab["a"].T),   # (K, r)
                jnp.asarray(ab["b"].T))   # (r, N)
        return cls(lora_id, rank, loras)


class LoRAModelManager:
    """Slot allocator with LRU eviction (reference models.py
    LRUCacheLoRAModelManager)."""

    def __init__(self, lora_config: LoRAConfig):
        self.config = lora_config
        self.max_loras = lora_config.max_loras
        # lora_id -> slot (1-based); slot 0 = no-LoRA.
        self._active: "OrderedDict[int, int]" = OrderedDict()
        self._registered: Dict[int, LoRAModel] = {}
        self._free_slots = list(range(1, self.max_loras + 1))
        # Callbacks to install/clear adapters in layer stacks; wired by the
        # runner: fn(slot, Optional[LoRAModel]).
        self.install_fn = None

    def register(self, lora_model: LoRAModel) -> None:
        self._registered[lora_model.id] = lora_model

    def deregister(self, lora_id: int) -> None:
        self._registered.pop(lora_id, None)
        slot = self._active.pop(lora_id, None)
        if slot is not None:
            if self.install_fn:
                self.install_fn(slot, None)
            self._free_slots.append(slot)

    def list_loras(self) -> List[int]:
        return list(self._registered)

    def activate(self, lora_id: int) -> int:
        """Ensure the adapter occupies a device slot; returns the slot."""
        if lora_id == 0:
            return 0
        if lora_id in self._active:
            self._active.move_to_end(lora_id)
            return self._active[lora_id]
        if lora_id not in self._registered:
            raise ValueError(f"LoRA {lora_id} is not registered.")
        if not self._free_slots:
            evict_id, slot = self._active.popitem(last=False)
            logger.info("Evicting LoRA %d from slot %d", evict_id, slot)
            self._free_slots.append(slot)
        slot = self._free_slots.pop()
        self._active[lora_id] = slot
        if self.install_fn:
            self.install_fn(slot, self._registered[lora_id])
        return slot

    def slot_for(self, lora_id: int) -> int:
        if lora_id == 0:
            return 0
        return self._active.get(lora_id, 0)
