"""Multi-modal plugin base (reference: vllm/multimodal/base.py
MultiModalPlugin / MultiModalInputs).

A plugin owns one modality key (``"image"``, ...). Models register an
input mapper per model CLASS; ``map_input`` dispatches on the model class
of the current engine, falling back to the plugin's default mapper.
Mapped values are jnp-ready arrays keyed by model input name.
"""
from typing import Any, Callable, Dict, Optional, Type

MultiModalData = Any
MultiModalInputs = Dict[str, Any]
# mapper(model_config, data) -> MultiModalInputs
MultiModalInputMapper = Callable[[Any, MultiModalData], MultiModalInputs]


class MultiModalPlugin:

    def __init__(self) -> None:
        self._input_mappers: Dict[Type, MultiModalInputMapper] = {}

    def get_data_key(self) -> str:
        raise NotImplementedError

    def _default_input_mapper(self, model_config,
                              data: MultiModalData) -> MultiModalInputs:
        raise NotImplementedError

    def register_input_mapper(
            self, mapper: Optional[MultiModalInputMapper] = None):
        """Decorator: bind a mapper to a model class (reference
        base.py register_input_mapper)."""

        def wrapper(model_cls):
            self._input_mappers[model_cls] = \
                mapper or self._default_input_mapper
            return model_cls

        return wrapper

    def map_input(self, model_config, data: MultiModalData,
                  model_cls: Optional[Type] = None) -> MultiModalInputs:
        if model_cls is None:
            from nmvllm_tpu.models import resolve_model_cls
            model_cls = resolve_model_cls(
                getattr(model_config.hf_config, "architectures", []) or [])
        mapper = None
        for cls in (model_cls.__mro__ if model_cls is not None else ()):
            if cls in self._input_mappers:
                mapper = self._input_mappers[cls]
                break
        if mapper is None:
            mapper = self._default_input_mapper
        return mapper(model_config, data)
