"""Expert parallelism (EP): sharded-expert MoE matches the dense reference
on the virtual 8-device CPU mesh.

The reference has NO expert parallelism (experts are TP-sharded by
intermediate dim only, fused_moe/layer.py:108-119); EP is a first-class
addition here (SURVEY.md §2.3): experts sharded over the tp axis, token
routing masked per rank, combine via the existing psum.
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nmvllm_tpu.ops.moe import (fused_moe, fused_moe_ep,
                                fused_moe_reference)


def _shard_map(fn, mesh, in_specs, out_specs):
    try:
        from jax import shard_map
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)
    except (ImportError, TypeError):
        from jax.experimental.shard_map import shard_map
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


@pytest.mark.parametrize("top_k", [1, 2])
def test_ep_matches_reference(top_k):
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    from jax.sharding import Mesh
    devs = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("data", "tp"))

    t, h, i, e = 16, 64, 128, 8
    rng = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    x = jax.random.normal(k1, (t, h), jnp.float32)
    w1 = jax.random.normal(k2, (e, h, 2 * i), jnp.float32) * h**-0.5
    w2 = jax.random.normal(k3, (e, i, h), jnp.float32) * i**-0.5
    logits = jax.random.normal(k4, (t, e), jnp.float32)

    ref = fused_moe_reference(x, w1, w2, logits, top_k)

    def ep_fn(x, w1l, w2l, logits):
        out = fused_moe_ep(x, w1l, w2l, logits, top_k, axis_name="tp")
        return jax.lax.psum(out, "tp")

    fn = _shard_map(
        ep_fn, mesh,
        in_specs=(P(), P("tp", None, None), P("tp", None, None), P()),
        out_specs=P())
    with mesh:
        out = jax.jit(fn)(x, w1, w2, logits)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)

    # And EP == the TP-sharded path (which needs the shard-interleaved
    # gate|up layout, ops/moe.py interleave_w1_for_tp).
    from nmvllm_tpu.ops.moe import interleave_w1_for_tp
    w1_il = jnp.asarray(interleave_w1_for_tp(w1, 4))

    def tp_fn(x, w1l, w2l, logits):
        out = fused_moe(x, w1l, w2l, logits, top_k)
        return jax.lax.psum(out, "tp")

    fn_tp = _shard_map(
        tp_fn, mesh,
        in_specs=(P(), P(None, None, "tp"), P(None, "tp", None), P()),
        out_specs=P())
    with mesh:
        out_tp = jax.jit(fn_tp)(x, w1_il, w2, logits)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_tp),
                               atol=2e-3, rtol=2e-3)


def test_ep_engine_dryrun():
    """Mixtral-style model with expert_parallel over a tp=4 mesh: one
    prefill + one decode through the real runner."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    from nmvllm_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                                   ModelConfig, ParallelConfig,
                                   SchedulerConfig)
    from nmvllm_tpu.parallel.mesh import build_mesh, set_expert_parallel
    from nmvllm_tpu.sampling_params import SamplingParams
    from nmvllm_tpu.sequence import SequenceData, SequenceGroupMetadata
    from nmvllm_tpu.worker.runner import ModelRunner

    engine_config = EngineConfig(
        model_config=ModelConfig(model="debug-mixtral", dtype="float32"),
        cache_config=CacheConfig(block_size=16),
        parallel_config=ParallelConfig(tensor_parallel_size=2,
                                       expert_parallel_size=2),
        scheduler_config=SchedulerConfig(max_model_len=128, max_num_seqs=4),
        device_config=DeviceConfig(device="cpu"))
    mesh = build_mesh(1, 2)
    runner = ModelRunner(engine_config, mesh)
    runner.load_model()
    try:
        assert runner.model.layers[0].block_sparse_moe.ep

        kv = []
        for _ in range(len(runner.model.layers)):
            shape = (8, 2, runner.model.total_num_kv_heads, 16,
                     runner.model.head_dim)
            kv.append(jnp.zeros(shape, jnp.float32))
        sp = SamplingParams(temperature=0.0, max_tokens=4)
        data = SequenceData(list(range(3, 20)))
        meta = SequenceGroupMetadata(
            request_id="ep", is_prompt=True, seq_data={0: data},
            sampling_params=sp, block_tables={0: [0, 1]})
        kv, out = runner.execute_prefill(meta, kv)
        assert out is not None and len(out.outputs) == 1
        tok = out.outputs[0].samples[0].output_token
        data.update_num_computed_tokens(17)
        data.append_token_id(int(tok), 0.0)
        meta_d = SequenceGroupMetadata(
            request_id="ep", is_prompt=False, seq_data={0: data},
            sampling_params=sp, block_tables={0: [0, 1]})
        kv, out = runner.execute_decode([meta_d], kv)
        assert out is not None and len(out.outputs) == 1
    finally:
        set_expert_parallel(1)


@pytest.mark.parametrize("top_k", [1, 2])
@pytest.mark.parametrize("t", [16, 17])
def test_ep_a2a_matches_reference(top_k, t):
    """All-to-all token-dispatch EP (SURVEY §2.3's "ragged all-to-all"
    pattern) matches the dense reference; t=17 exercises the
    non-divisible fallback to the masked-local path."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    from jax.sharding import Mesh

    from nmvllm_tpu.ops.moe import fused_moe_ep_a2a
    devs = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("data", "tp"))

    h, i, e = 64, 128, 8
    rng = jax.random.PRNGKey(1)
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    x = jax.random.normal(k1, (t, h), jnp.float32)
    w1 = jax.random.normal(k2, (e, h, 2 * i), jnp.float32) * h**-0.5
    w2 = jax.random.normal(k3, (e, i, h), jnp.float32) * i**-0.5
    logits = jax.random.normal(k4, (t, e), jnp.float32)

    ref = fused_moe_reference(x, w1, w2, logits, top_k)

    def ep_fn(x, w1l, w2l, logits):
        out = fused_moe_ep_a2a(x, w1l, w2l, logits, top_k,
                               axis_name="tp", ep_size=4)
        return jax.lax.psum(out, "tp")

    fn = _shard_map(
        ep_fn, mesh,
        in_specs=(P(), P("tp", None, None), P("tp", None, None), P()),
        out_specs=P())
    with mesh:
        out = jax.jit(fn)(x, w1, w2, logits)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_ep_a2a_imbalanced_routing():
    """Worst-case routing (every token to ONE expert) must fit the a2a
    transport capacity and stay correct (inference can't drop tokens)."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    from jax.sharding import Mesh

    from nmvllm_tpu.ops.moe import fused_moe_ep_a2a
    devs = np.asarray(jax.devices()[:4]).reshape(1, 4)
    mesh = Mesh(devs, ("data", "tp"))

    t, h, i, e, top_k = 16, 64, 128, 8, 2
    rng = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(rng, 3)
    x = jax.random.normal(k1, (t, h), jnp.float32)
    w1 = jax.random.normal(k2, (e, h, 2 * i), jnp.float32) * h**-0.5
    w2 = jax.random.normal(k3, (e, i, h), jnp.float32) * i**-0.5
    # Gate hugely prefers experts 5 then 2: every token routes to the
    # same (rank-owned) experts.
    logits = jnp.tile(
        jnp.array([[0., 0., 5., 0., 0., 9., 0., 0.]], jnp.float32),
        (t, 1))

    ref = fused_moe_reference(x, w1, w2, logits, top_k)

    def ep_fn(x, w1l, w2l, logits):
        out = fused_moe_ep_a2a(x, w1l, w2l, logits, top_k,
                               axis_name="tp", ep_size=4)
        return jax.lax.psum(out, "tp")

    fn = _shard_map(
        ep_fn, mesh,
        in_specs=(P(), P("tp", None, None), P("tp", None, None), P()),
        out_specs=P())
    with mesh:
        out = jax.jit(fn)(x, w1, w2, logits)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_ep_a2a_engine_dryrun(monkeypatch):
    """NMVLLM_MOE_A2A=1 routes the engine's MoE through the a2a dispatch;
    greedy tokens match the default masked-local EP run."""
    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    from nmvllm_tpu.config import (CacheConfig, DeviceConfig, EngineConfig,
                                   ModelConfig, ParallelConfig,
                                   SchedulerConfig)
    from nmvllm_tpu.parallel.mesh import build_mesh, set_expert_parallel
    from nmvllm_tpu.sampling_params import SamplingParams
    from nmvllm_tpu.sequence import SequenceData, SequenceGroupMetadata
    from nmvllm_tpu.worker.runner import ModelRunner

    def run_once():
        engine_config = EngineConfig(
            model_config=ModelConfig(model="debug-mixtral",
                                     dtype="float32"),
            cache_config=CacheConfig(block_size=16),
            parallel_config=ParallelConfig(tensor_parallel_size=2,
                                           expert_parallel_size=2),
            scheduler_config=SchedulerConfig(max_model_len=128,
                                             max_num_seqs=4),
            device_config=DeviceConfig(device="cpu"))
        mesh = build_mesh(1, 2)
        runner = ModelRunner(engine_config, mesh)
        runner.load_model()
        try:
            kv = []
            for _ in range(len(runner.model.layers)):
                shape = (8, 2, runner.model.total_num_kv_heads, 16,
                         runner.model.head_dim)
                kv.append(jnp.zeros(shape, jnp.float32))
            sp = SamplingParams(temperature=0.0, max_tokens=4)
            data = SequenceData(list(range(3, 20)))
            meta = SequenceGroupMetadata(
                request_id="ep", is_prompt=True, seq_data={0: data},
                sampling_params=sp, block_tables={0: [0, 1]})
            kv, out = runner.execute_prefill(meta, kv)
            toks = [int(out.outputs[0].samples[0].output_token)]
            data.update_num_computed_tokens(17)
            data.append_token_id(toks[-1], 0.0)
            meta_d = SequenceGroupMetadata(
                request_id="ep", is_prompt=False, seq_data={0: data},
                sampling_params=sp, block_tables={0: [0, 1]})
            kv, out = runner.execute_decode([meta_d], kv)
            toks.append(int(out.outputs[0].samples[0].output_token))
            return toks
        finally:
            set_expert_parallel(1)

    base = run_once()
    monkeypatch.setenv("NMVLLM_MOE_A2A", "1")
    a2a = run_once()
    assert base == a2a
