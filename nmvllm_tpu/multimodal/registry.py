"""Multi-modal registry (reference: vllm/multimodal/registry.py
MultiModalRegistry + MULTIMODAL_REGISTRY singleton).
"""
from typing import Dict, Optional, Sequence

from nmvllm_tpu.logger import init_logger
from nmvllm_tpu.multimodal.base import (MultiModalData, MultiModalInputs,
                                        MultiModalPlugin)
from nmvllm_tpu.multimodal.image import ImagePlugin

logger = init_logger(__name__)


class MultiModalRegistry:

    def __init__(self, *,
                 plugins: Optional[Sequence[MultiModalPlugin]] = None):
        plugins = plugins if plugins is not None else (ImagePlugin(),)
        self._plugins: Dict[str, MultiModalPlugin] = {
            p.get_data_key(): p for p in plugins}

    def register_plugin(self, plugin: MultiModalPlugin) -> None:
        key = plugin.get_data_key()
        if key in self._plugins:
            logger.warning(
                "Overwriting registered multimodal plugin for %s", key)
        self._plugins[key] = plugin

    def _get_plugin(self, key: str) -> MultiModalPlugin:
        plugin = self._plugins.get(key)
        if plugin is None:
            raise NotImplementedError(
                f"Unknown multi-modal data type: {key}")
        return plugin

    def register_input_mapper(self, data_type_key: str, mapper=None):
        return self._get_plugin(data_type_key).register_input_mapper(mapper)

    def register_image_input_mapper(self, mapper=None):
        return self.register_input_mapper("image", mapper)

    def map_input(self, model_config,
                  data: Dict[str, MultiModalData]) -> MultiModalInputs:
        """Map {modality: raw data} -> merged model-input dict."""
        merged: MultiModalInputs = {}
        for key, value in data.items():
            out = self._get_plugin(key).map_input(model_config, value)
            for name, arr in out.items():
                if name in merged:
                    raise ValueError(
                        f"Duplicate multimodal input key {name}")
                merged[name] = arr
        return merged

    def create_input_mapper(self, model_config):
        return lambda data: self.map_input(model_config, data)


MULTIMODAL_REGISTRY = MultiModalRegistry()
