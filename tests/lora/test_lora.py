"""LoRA component tests (reference tests/lora/ layer-level tier)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nmvllm_tpu.lora.layers import (LoRAConfig, LoRALayerWeights,
                                    lora_apply, make_lora_stacks,
                                    set_lora_slot)
from nmvllm_tpu.lora.models import LoRAModel, LoRAModelManager


def test_lora_apply_matches_dense(rng):
    k, n, r, t = 64, 32, 8, 6
    k1, k2, k3 = jax.random.split(rng, 3)
    a = jax.random.normal(k1, (k, r), jnp.float32)
    b = jax.random.normal(k2, (r, n), jnp.float32)
    x = jax.random.normal(k3, (t, k), jnp.float32)
    lora = LoRALayerWeights("m", r, alpha=16.0, a=a, b=b)
    a_stack, b_stack = make_lora_stacks(2, k, n, r, jnp.float32)
    a_stack, b_stack = set_lora_slot(a_stack, b_stack, 1, lora)
    idx = jnp.asarray([1, 0, 1, 1, 0, 1], jnp.int32)
    delta = lora_apply(x, a_stack, b_stack, idx)
    # Reference in numpy f64 — `x @ a` under jnp would itself run at TPU
    # default (bf16 MXU) precision and be less accurate than lora_apply.
    want = (np.asarray(x, np.float64) @ np.asarray(a, np.float64)
            ) * lora.scaling @ np.asarray(b, np.float64)
    got = np.asarray(delta)
    for i in range(t):
        if int(idx[i]) == 1:
            np.testing.assert_allclose(got[i], want[i],
                                       atol=1e-3, rtol=1e-3)
        else:
            np.testing.assert_allclose(got[i], 0.0, atol=1e-6)


def test_manager_lru_eviction():
    mgr = LoRAModelManager(LoRAConfig(max_loras=2))
    installed = {}
    mgr.install_fn = lambda slot, model: installed.__setitem__(
        slot, model.id if model else None)
    for lora_id in (1, 2, 3):
        mgr.register(LoRAModel(lora_id, 8, {}))
    s1 = mgr.activate(1)
    s2 = mgr.activate(2)
    assert {s1, s2} == {1, 2}
    # Touch 1 so 2 becomes LRU, then activate 3 -> evicts 2.
    mgr.activate(1)
    s3 = mgr.activate(3)
    assert s3 == s2
    assert mgr.slot_for(2) == 0
    assert mgr.slot_for(1) == s1


def test_peft_checkpoint_loading(tmp_path):
    import json
    from safetensors.numpy import save_file
    rng = np.random.default_rng(0)
    with open(tmp_path / "adapter_config.json", "w") as f:
        json.dump({"r": 8, "lora_alpha": 16,
                   "target_modules": ["q_proj"]}, f)
    a = rng.normal(size=(8, 64)).astype(np.float32)   # (r, K)
    b = rng.normal(size=(32, 8)).astype(np.float32)   # (N, r)
    save_file({
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight": a,
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": b,
    }, str(tmp_path / "adapter_model.safetensors"))
    model = LoRAModel.from_local_checkpoint(str(tmp_path), lora_id=1)
    lw = model.loras["model.layers.0.self_attn.q_proj"]
    assert lw.rank == 8 and lw.scaling == 2.0
    assert lw.a.shape == (64, 8) and lw.b.shape == (8, 32)
