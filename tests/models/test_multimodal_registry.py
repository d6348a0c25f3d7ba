"""Multimodal registry/plugin tests (reference tests/multimodal/)."""
import numpy as np
import pytest

from nmvllm_tpu.config import ModelConfig
from nmvllm_tpu.multimodal import (MULTIMODAL_REGISTRY, ImagePlugin,
                                   MultiModalRegistry)


@pytest.fixture
def model_config():
    return ModelConfig(model="debug-llama")


def test_default_image_mapper_shapes(model_config):
    reg = MultiModalRegistry()
    img = (np.random.default_rng(0).integers(
        0, 255, (64, 48, 3)).astype(np.uint8))
    out = reg.map_input(model_config, {"image": img})
    pv = out["pixel_values"]
    assert pv.shape == (1, 3, 336, 336)
    assert pv.dtype == np.float32
    # normalized: roughly zero-centered
    assert abs(float(pv.mean())) < 3.0


def test_custom_mapper_dispatch_by_model_class(model_config):
    reg = MultiModalRegistry(plugins=(ImagePlugin(),))

    class FakeVLM:
        pass

    @reg.register_image_input_mapper(
        lambda cfg, data: {"pixel_values": np.zeros((1, 1))})
    class _Registered(FakeVLM):
        pass

    plugin = reg._get_plugin("image")
    out = plugin.map_input(model_config, np.zeros((8, 8, 3)),
                           model_cls=_Registered)
    assert out["pixel_values"].shape == (1, 1)
    # Unregistered class falls back to the default mapper.
    out2 = plugin.map_input(model_config, np.zeros((8, 8, 3)),
                            model_cls=FakeVLM)
    assert out2["pixel_values"].shape[1] == 3


def test_unknown_modality_raises(model_config):
    with pytest.raises(NotImplementedError):
        MULTIMODAL_REGISTRY.map_input(model_config, {"audio": b""})


def test_chw_and_gray_inputs(model_config):
    reg = MultiModalRegistry()
    chw = np.zeros((3, 32, 32), np.float32)
    out = reg.map_input(model_config, {"image": chw})
    assert out["pixel_values"].shape == (1, 3, 336, 336)
    gray = np.zeros((16, 16), np.uint8)
    out2 = reg.map_input(model_config, {"image": gray})
    assert out2["pixel_values"].shape == (1, 3, 336, 336)
