"""Config unit tests (reference tests/test_config.py scope, on local
presets — HF hub is unreachable here)."""
import pytest

from nmvllm_tpu.config import ModelConfig, ParallelConfig


def test_get_sliding_window_respects_use_flag():
    cfg = ModelConfig("debug-llama")
    cfg.shape_config.sliding_window = 4096
    cfg.shape_config.use_sliding_window = False
    assert cfg.get_sliding_window() is None
    cfg.shape_config.use_sliding_window = True
    assert cfg.get_sliding_window() == 4096
    cfg.shape_config.sliding_window = None
    assert cfg.get_sliding_window() is None


def test_max_model_len_derived_and_capped():
    cfg = ModelConfig("debug-llama")
    derived = cfg.shape_config.max_position_embeddings
    assert cfg.max_model_len == derived
    # Explicit smaller value wins.
    assert ModelConfig("debug-llama", max_model_len=64).max_model_len == 64


def test_head_and_kv_head_accessors_under_tp():
    cfg = ModelConfig("debug-llama-tp")   # 8 heads, 8 kv heads, hd 128
    assert cfg.get_head_size() == 128
    tp4 = ParallelConfig(tensor_parallel_size=4)
    assert cfg.get_num_attention_heads(tp4) == 2
    assert cfg.get_num_kv_heads(tp4) == 2
    # TP larger than kv heads: replicate down to >= 1 per rank.
    tp16 = ParallelConfig(tensor_parallel_size=16)
    assert cfg.get_num_kv_heads(tp16) == 1


def test_layers_split_over_pp():
    cfg = ModelConfig("debug-llama")      # 2 layers
    pp2 = ParallelConfig(pipeline_parallel_size=2)
    assert cfg.get_num_layers(pp2) == 1


def test_dtype_resolution_aliases():
    assert ModelConfig("debug-llama", dtype="half").dtype == "bfloat16"
    assert ModelConfig("debug-llama", dtype="float16").dtype == "bfloat16"
    assert ModelConfig("debug-llama", dtype="fp32").dtype == "float32"
    with pytest.raises(ValueError):
        ModelConfig("debug-llama", dtype="int8")


def test_unknown_quantization_rejected():
    with pytest.raises(ValueError, match="quantization"):
        ModelConfig("debug-llama", quantization="does-not-exist")


def test_hf_quantization_config_autodetected():
    cfg = ModelConfig("debug-llama")
    cfg2 = ModelConfig("debug-llama", hf_config=cfg.hf_config)
    cfg2.hf_config.quantization_config = {"quant_method": "gptq",
                                          "bits": 4, "group_size": 128}
    cfg3 = ModelConfig("debug-llama", hf_config=cfg2.hf_config)
    assert cfg3.quantization == "gptq"


def test_parallel_config_world_size_and_ep_rule():
    pc = ParallelConfig(tensor_parallel_size=2, data_parallel_size=2,
                        pipeline_parallel_size=1)
    assert pc.world_size == 4
    with pytest.raises(ValueError):
        ParallelConfig(tensor_parallel_size=4, expert_parallel_size=2)
    ok = ParallelConfig(tensor_parallel_size=4, expert_parallel_size=4)
    assert ok.expert_parallel_size == 4
