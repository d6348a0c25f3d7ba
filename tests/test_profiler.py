"""Profiler: XLA cost analysis + measured per-component decode walltime
table (reference vllm/profiler/nm_profile.py summary tables)."""
import jax.numpy as jnp

from nmvllm_tpu.profiler import cost_analysis, decode_walltime_profile


def test_cost_analysis_counts_flops():
    def f(a, b):
        return a @ b
    r = cost_analysis(f, jnp.ones((128, 128)), jnp.ones((128, 128)))
    assert r.total_flops >= 2 * 128**3 * 0.9


def test_decode_walltime_profile():
    from nmvllm_tpu import LLM
    llm = LLM(model="debug-llama", num_gpu_blocks_override=64,
              max_num_seqs=8, max_model_len=256)
    prof = decode_walltime_profile(llm, batch=8, iters=3)
    assert prof["per_layer_ms"] > 0
    assert prof["embed_head_ms"] > 0
    assert prof["step_ms"] > 0
    assert prof["num_layers"] == 2
    assert "full step (measured)" in prof["table"]
