"""Quantization config parsing + scheme dispatch
(reference tests/quantization/test_compressed_tensors.py,
test_configs.py)."""
import pytest

from nmvllm_tpu.quantization import (QUANTIZATION_METHODS,
                                     get_quantization_config)
from nmvllm_tpu.quantization.compressed_tensors import (
    CompressedTensorsConfig)
from nmvllm_tpu.quantization.gptq import GPTQConfig
from nmvllm_tpu.quantization.int8_w8a8 import Int8W8A8LinearMethod
from nmvllm_tpu.quantization.wNa16 import WNA16LinearMethod


def test_registry_contains_reference_methods():
    for name in ("gptq", "gptq_marlin", "marlin", "awq", "fp8",
                 "compressed-tensors"):
        assert name in QUANTIZATION_METHODS, name


def test_gptq_from_config():
    cfg = GPTQConfig.from_config(
        {"bits": 4, "group_size": 128, "desc_act": False, "sym": True})
    method = cfg.get_linear_method()
    assert isinstance(method, WNA16LinearMethod)
    assert method.bits == 4 and method.group_size == 128


def test_awq_from_config():
    cls = get_quantization_config("awq")
    cfg = cls.from_config({"w_bit": 4, "q_group_size": 64,
                           "zero_point": True})
    assert cfg.weight_bits == 4 and cfg.group_size == 64


def test_compressed_tensors_w8a8_dynamic():
    cfg = CompressedTensorsConfig.from_config({
        "config_groups": {
            "group_0": {
                "targets": ["Linear"],
                "weights": {"num_bits": 8, "strategy": "channel",
                            "symmetric": True},
                "input_activations": {"num_bits": 8, "dynamic": True,
                                      "strategy": "token"},
            }
        },
        "ignore": ["lm_head"],
    })
    method = cfg.get_linear_method("model.layers.0.mlp.gate_proj")
    assert isinstance(method, Int8W8A8LinearMethod)
    assert not method.static_input_scale
    # Ignored layer -> unquantized.
    from nmvllm_tpu.layers.linear import UnquantizedLinearMethod
    assert isinstance(cfg.get_linear_method("lm_head"),
                      UnquantizedLinearMethod)


def test_compressed_tensors_wna16():
    cfg = CompressedTensorsConfig.from_config({
        "config_groups": {
            "group_0": {
                "targets": ["re:.*proj"],
                "weights": {"num_bits": 4, "strategy": "group",
                            "group_size": 128, "symmetric": True},
            }
        },
    })
    method = cfg.get_linear_method("model.layers.0.self_attn.q_proj")
    assert isinstance(method, WNA16LinearMethod)
    assert method.bits == 4


def test_unknown_method_raises():
    with pytest.raises(ValueError):
        get_quantization_config("nope")
