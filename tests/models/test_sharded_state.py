"""Sharded-state save/restore roundtrip (reference
tests/tensorizer_loader + save_sharded_state example paths)."""
import numpy as np
import pytest

import jax

from nmvllm_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                               ModelConfig, ParallelConfig, SchedulerConfig)
from nmvllm_tpu.model_loader import (build_model, init_params_on_mesh,
                                     load_sharded_state, save_sharded_state)
from nmvllm_tpu.parallel.mesh import build_mesh


def test_orbax_roundtrip(tmp_path):
    cfg = EngineConfig(
        model_config=ModelConfig(model="debug-llama", dtype="float32"),
        cache_config=CacheConfig(), parallel_config=ParallelConfig(),
        scheduler_config=SchedulerConfig(max_model_len=128),
        device_config=DeviceConfig(device="cpu"))
    mesh = build_mesh(1, 1)
    model = build_model(cfg)
    params = init_params_on_mesh(model, mesh, 0)
    path = str(tmp_path / "ckpt")
    save_sharded_state(params, path)
    restored = load_sharded_state(model, mesh, path)
    a = np.asarray(params["layers"][0]["mlp"]["gate_proj"]["weight"])
    b = np.asarray(restored["layers"][0]["mlp"]["gate_proj"]["weight"])
    np.testing.assert_array_equal(a, b)
