"""Quantized (INT4 -> W4A8) grouped expert GEMM for fused MoE.

The reference quantizes MoE expert weights (Fp8MoEMethod,
vllm/model_executor/layers/quantization/fp8.py:35+; fused_moe kernel
configs per (E, N)); round 4 surfaced that our ragged_dot expert stacks
loaded bf16 regardless of quant config — a 12-layer Mixtral "INT4"
config OOMed at 34.6 GB (docs/PERF_NOTES.md).

Design: the reference's token-alignment trick (moe_align_block_size,
csrc/moe_align_block_size_kernels.cu) adapted to Pallas — expert-sorted
token rows are padded so every ``block_m`` row-block belongs to exactly
ONE expert, a prefetched per-block expert-id array drives the weight
BlockSpec index maps, and the kernel body is the SAME _w4a8p_kernel
that serves dense W4A8 linears (packed int4 stacks, in-kernel unpack to
int8, one full-depth int8 MXU dot per block, group multipliers + f32
epilogue). Expert stacks stay packed INT4 in HBM: Mixtral-8x7B experts
cost 0.5 byte/param instead of 2 (the bf16 OOM) or 1 (int8-store).
"""
import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nmvllm_tpu.ops.utils import pallas_interpret, use_pallas
from nmvllm_tpu.ops.quant_matmul import (_w4a8p_kernel, _W4_VMEM_BUDGET,
                                         _quantize_acts_a8p, _w4_group,
                                         requantize_grouped_to_a8p,
                                         unpack_weights_a8p)
from nmvllm_tpu.utils import round_up


def quantize_expert_stack(w: jax.Array, group_size: int) -> Dict:
    """(E, K, N) float expert stack -> stacked A8P arrays (runtime
    quantization for tests/benches; checkpoints convert per expert in
    the loader)."""
    from nmvllm_tpu.ops.quant_matmul import quantize_weights_to_packed
    e = w.shape[0]
    outs = []
    for i in range(e):
        qw, s, z = quantize_weights_to_packed(w[i].T, 4, group_size,
                                              symmetric=True)
        outs.append(requantize_grouped_to_a8p(qw, s, z,
                                              group_size=group_size,
                                              k=w.shape[1]))
    return {
        "qweight": jnp.stack([o[0] for o in outs]),
        "mult": jnp.stack([o[1] for o in outs]),
        "scales": jnp.stack([o[2] for o in outs]),
        "zeros": jnp.stack([o[3] for o in outs]),
    }


def is_quant_stack(w) -> bool:
    return isinstance(w, dict) and "qweight" in w


def dequant_expert_stack(stack: Dict, k: int, group_size: int,
                         dtype=jnp.float32) -> jax.Array:
    """(stacked A8P arrays) -> (E, K, N) dense — reference/fallback."""
    g = _w4_group(group_size, k)
    e = stack["qweight"].shape[0]
    outs = []
    for i in range(e):
        v = unpack_weights_a8p(stack["qweight"][i], g, k).astype(
            jnp.float32)
        u = (v - 8.0) * jnp.repeat(stack["mult"][i].astype(jnp.float32),
                                   g, axis=0)
        zfull = jnp.repeat(stack["zeros"][i].astype(jnp.float32), g,
                           axis=0)
        outs.append((u - zfull) * stack["scales"][i])
    return jnp.stack(outs).astype(dtype)


def _plan_blocks(group_sizes: jax.Array, r: int, e: int, bm: int):
    """Expert-sorted row padding plan (all jnp, static shapes).

    Returns (gather_idx (M_pad,), mb_expert (M_pad//bm,),
    back_idx (r,)): x_pad = x_sorted[gather_idx] gives each expert a
    whole number of bm-row blocks; back_idx maps sorted row i to its
    padded position."""
    m_pad = round_up(r, bm) + e * bm
    gs = group_sizes.astype(jnp.int32)
    padded = ((gs + bm - 1) // bm) * bm
    pstart = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(padded)[:-1].astype(jnp.int32)])
    start = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                             jnp.cumsum(gs)[:-1].astype(jnp.int32)])
    row = jnp.arange(m_pad, dtype=jnp.int32)
    e_of = jnp.searchsorted(jnp.cumsum(padded), row, side="right")
    e_of = jnp.clip(e_of, 0, e - 1).astype(jnp.int32)
    within = row - pstart[e_of]
    valid = within < gs[e_of]
    gather_idx = jnp.where(valid, start[e_of] + within, 0)
    mb_expert = e_of[::bm]
    # Inverse map for the real rows.
    i = jnp.arange(r, dtype=jnp.int32)
    e_src = jnp.clip(jnp.searchsorted(jnp.cumsum(gs), i, side="right"),
                     0, e - 1).astype(jnp.int32)
    back_idx = pstart[e_src] + (i - start[e_src])
    return gather_idx, mb_expert, back_idx, m_pad


def ragged_quant_dot_a8p(
    x: jax.Array,            # (R, K) rows SORTED by expert
    stack: Dict,             # stacked A8P arrays (E, ...)
    group_sizes: jax.Array,  # (E,) rows per expert (sum == R)
    *,
    group_size: int,
    block_m: int = 32,
    block_n: int = 1024,
) -> jax.Array:
    """Grouped W4A8 GEMM: y[rows of expert e] = x_rows @ deq(W_e).

    Pads each expert's rows to ``block_m`` blocks (gather), runs the
    dense W4A8 kernel with expert-id-driven weight BlockSpecs, gathers
    real rows back. Output f32 (R, N)."""
    r, k = x.shape
    e, _, n = stack["qweight"].shape
    g = _w4_group(group_size, k)
    g_rows = k // g
    g_pad = round_up(g_rows, 128)

    if not use_pallas():
        dense = dequant_expert_stack(stack, k, g)
        # Segment matmul via one-hot (reference semantics, small shapes).
        ends = jnp.cumsum(group_sizes)
        starts = ends - group_sizes
        rows_e = jnp.searchsorted(ends, jnp.arange(r), side="right")
        xq, xg, s_x = _quantize_acts_a8p(x, g, g_pad)
        del xg
        w_rows = dense[jnp.clip(rows_e, 0, e - 1)]      # (R, K, N)
        y = jnp.einsum("rk,rkn->rn", xq.astype(jnp.float32), w_rows)
        return y * s_x
    del n  # re-read below

    bm = block_m
    xq, xg, s_x = _quantize_acts_a8p(x, g, g_pad)
    gather_idx, mb_expert, back_idx, m_pad = _plan_blocks(
        group_sizes, r, e, bm)
    xq_p = xq[gather_idx]
    xg_p = xg[gather_idx]
    sx_p = s_x[gather_idx]

    n = stack["qweight"].shape[2]
    bn = min(block_n, n)
    while n % bn != 0:
        bn //= 2
    bk = k

    def fits(bn_, bk_):
        # mult/zms ride full-G blocks; the estimate mirrors
        # _a8p_vmem_estimate with the expert dim squeezed.
        est = 2 * bm * bk_ + 2 * (bk_ // 8) * bn_ * 4
        est += 2 * g_rows * bn_ * 4 + 2 * g_pad * bn_ * 4
        est += 2 * bm * g_pad * 4 + 2 * bm * bn_ * 4
        est += bm * bn_ * 4 + bk_ * bn_
        return est <= _W4_VMEM_BUDGET

    while not fits(bn, bk) and bn > 256 and n % (bn // 2) == 0:
        bn //= 2
    while not fits(bn, bk) and bk > g and (bk // 2) % g == 0:
        bk //= 2

    def kern(mb_ref, *refs, **kw):
        del mb_ref
        _w4a8p_kernel(*refs, **kw)

    grid = (m_pad // bm, n // bn, k // bk)
    zms_p = stack["zeros"]
    if g_pad != g_rows:
        zms_p = jnp.pad(zms_p, ((0, 0), (0, g_pad - g_rows), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk, mb: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, g_pad), lambda i, j, kk, mb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, kk, mb: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, bk // 8, bn),
                         lambda i, j, kk, mb: (mb[i], kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g_rows, bn),
                         lambda i, j, kk, mb: (mb[i], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, g_pad, bn),
                         lambda i, j, kk, mb: (mb[i], 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, bn),
                         lambda i, j, kk, mb: (mb[i], 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk, mb: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32),
                        pltpu.VMEM((bk, bn), jnp.int8)],
    )
    kernel = functools.partial(kern, group_size=g, bk=bk, has_res=False)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=(m_pad * k + e * k * n // 2 + m_pad * n * 4),
            transcendentals=0),
        interpret=pallas_interpret(),
    )(mb_expert, xq_p, xg_p, sx_p, stack["qweight"], stack["mult"],
      zms_p, stack["scales"])
    return out[back_idx]


def random_a8p_stack(rng, e: int, k: int, n: int, group_size: int) -> Dict:
    """Random A8P expert stack for debug/bench models: uniform nibbles,
    full multipliers (grid step 16*s_chan), zero-centered (zms = 0).
    s_chan is sized so dequant rms ~= k**-0.5 (matching the bf16 random
    init statistics: (v-8) rms ~= 4.6)."""
    g = _w4_group(group_size, k)
    qweight = jax.random.randint(rng, (e, k // 8, n),
                                 jnp.iinfo(jnp.int32).min,
                                 jnp.iinfo(jnp.int32).max, jnp.int32)
    return {
        "qweight": qweight,
        "mult": jnp.full((e, k // g, n), 16, jnp.int32),
        "scales": jnp.full((e, 1, n), (k ** -0.5) / (16 * 4.64),
                           jnp.float32),
        "zeros": jnp.zeros((e, k // g, n), jnp.float32),
    }
