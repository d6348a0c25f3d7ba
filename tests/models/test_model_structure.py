"""Structural tests for every registered model family: params tree matches
specs tree, TP sharding divides cleanly, hf_name_map targets exist.
(Cheap no-compute analogue of reference tests/models per-architecture
smoke tests.)"""
import jax
import pytest
from jax.sharding import PartitionSpec

from nmvllm_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                               ModelConfig, ParallelConfig, SchedulerConfig)
from nmvllm_tpu.model_loader import build_model

PRESETS = ["debug-llama", "debug-qwen2", "debug-gemma", "debug-mistral",
           "debug-mixtral", "debug-phi3", "debug-arctic"]


def make_engine_config(preset, tp=1, quant=None, sparsity=None):
    model_config = ModelConfig(model=preset, quantization=quant,
                               sparsity=sparsity)
    return EngineConfig(
        model_config=model_config,
        cache_config=CacheConfig(),
        parallel_config=ParallelConfig(tensor_parallel_size=tp),
        scheduler_config=SchedulerConfig(max_model_len=256),
        device_config=DeviceConfig(device="cpu"))


@pytest.mark.parametrize("preset", PRESETS)
def test_init_matches_specs(preset):
    model = build_model(make_engine_config(preset))
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    specs = model.specs()
    ptree = jax.tree.structure(params)
    stree = jax.tree.structure(
        specs, is_leaf=lambda x: isinstance(x, PartitionSpec))
    assert ptree == stree, f"{preset}: params/specs trees differ"


@pytest.mark.parametrize("preset", ["debug-llama-tp", "debug-mixtral"])
def test_tp_specs_divide(preset):
    """Every sharded dim must divide by the tp size."""
    tp = 2
    model = build_model(make_engine_config(preset, tp=tp))
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    specs = model.specs()

    def check(path, leaf, spec):
        for dim, axis in enumerate(spec):
            if axis is not None:
                assert leaf.shape[dim] % tp == 0, (path, leaf.shape, spec)

    flat_p = jax.tree.leaves_with_path(params)
    flat_s = jax.tree.leaves(
        specs, is_leaf=lambda x: isinstance(x, PartitionSpec))
    for (path, leaf), spec in zip(flat_p, flat_s):
        check(path, leaf, spec)


def test_hf_name_map_targets_exist():
    model = build_model(make_engine_config("debug-llama"))
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    for hf_name, (path, transform) in model.hf_name_map().items():
        if "bias" in hf_name:
            continue  # debug model has no biases
        node = params
        for p in path:
            assert (p in node if isinstance(node, dict)
                    else p < len(node)), (hf_name, path)
            node = node[p]


@pytest.mark.parametrize("quant", ["gptq", "awq", "fp8",
                                   "compressed-tensors"])
def test_quantized_model_builds(quant):
    model = build_model(make_engine_config("debug-llama", quant=quant))
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    layer0 = params["layers"][0]["mlp"]["gate_proj"]
    if quant in ("gptq", "awq"):
        assert "qweight" in layer0 and "scales" in layer0
    elif quant == "fp8":
        assert "weight_scale" in layer0
    elif quant == "compressed-tensors":
        assert "weight_scale" in layer0  # default int8 w8a8 scheme


def test_sparse_model_builds():
    model = build_model(
        make_engine_config("debug-llama",
                           sparsity="semi_structured_sparse_w16a16"))
    params = jax.eval_shape(model.init, jax.random.PRNGKey(0))
    layer0 = params["layers"][0]["mlp"]["gate_proj"]
    assert "v0" in layer0 and "meta" in layer0
