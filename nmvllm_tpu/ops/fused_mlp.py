"""Fused W4 MLP block: rmsnorm → gate/up dequant-GEMM → silu·mul →
down dequant-GEMM, in ONE Pallas call.

Replaces two quant_matmul calls (gate_up with rmsnorm prologue + down
with silu_mul prologue) per decoder layer. Wins on this stack
(docs/PERF_NOTES.md "per-op fixed costs"):
  * one kernel call instead of two, and HALF the grid steps — gate/up
    column block j and down row block j are consumed in the same step;
  * the (m, 2I) f32 intermediate never round-trips through HBM
    (silu·mul happens on the (m, bn) block in VMEM);
  * the normed activation h stays VMEM-resident across all steps.

Weight layout is the canonical paired W4 packing (ops/quant_matmul.py
pack_weights): the gate_up operand is the post-load fused [gate | up]
buffer passed TWICE with different column index maps; the down operand
streams row blocks. Reference parity: this serves the same GEMMs as the
Marlin kernels (csrc/quantization/marlin/dense/marlin_cuda_kernel.cu)
plus the activation fusion the reference gets from its fused
silu_and_mul CUDA kernel (csrc/activation_kernels.cu:149).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nmvllm_tpu.ops.utils import pallas_interpret, use_pallas
from nmvllm_tpu.utils import round_up


def _paired_dequant(w_words, scales_row, zeros_row, cdtype):
    """(wpg, bn) int32 packed words -> (g, bn) dequantized cdtype.

    Shares quant_matmul's unpack: for bf16 the nibble is OR'd straight
    into a bf16 mantissa (no int->float convert instruction,
    NMVLLM_W4_MAGIC); otherwise masked-shift + int16 bitcast + astype."""
    from nmvllm_tpu.ops.quant_matmul import _unpack_group
    wd, bias = _unpack_group(w_words, cdtype)
    zg = zeros_row.astype(cdtype)
    if bias:
        zg = zg + bias                     # exact: integer <= 143
    return (wd - zg) * scales_row.astype(cdtype)


def _fused_mlp_kernel(x_ref, nw_ref, g_qw_ref, g_s_ref, g_z_ref,
                      u_qw_ref, u_s_ref, u_z_ref, d_qw_ref, d_s_ref,
                      d_z_ref, o_ref, h_ref, deq_ref, dndeq_ref, acc_ref,
                      *, group_size: int, k: int, bn: int, eps: float,
                      act: str):
    g = group_size
    kg = k // g          # groups along K (gate/up dequant)
    ng = bn // g         # groups along the bn rows of the down block
    cdtype = h_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _():
        # h = rmsnorm(x) * norm_w, computed once; VMEM-resident after.
        xf = x_ref[:].astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=1, keepdims=True)
        h_ref[:] = (xf * jax.lax.rsqrt(var + eps) *
                    nw_ref[:].astype(jnp.float32)).astype(cdtype)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    wpg = g // 8

    # gate block: dequant (K, bn) then one full-depth dot.
    def deq_cols(qw_ref, s_ref, z_ref):
        def per_group(gi, _):
            w = qw_ref[pl.ds(pl.multiple_of(gi * wpg, wpg), wpg), :]
            sg = s_ref[pl.ds(gi, 1), :]
            zg = z_ref[pl.ds(gi, 1), :]
            deq_ref[pl.ds(pl.multiple_of(gi * g, g), g), :] = \
                _paired_dequant(w, sg, zg, cdtype)
            return 0
        jax.lax.fori_loop(0, kg, per_group, 0, unroll=False)

    prec = (jax.lax.Precision.HIGHEST if cdtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    h = h_ref[:]
    deq_cols(g_qw_ref, g_s_ref, g_z_ref)
    gate = jnp.dot(h, deq_ref[:], preferred_element_type=jnp.float32,
                   precision=prec)
    deq_cols(u_qw_ref, u_s_ref, u_z_ref)
    up = jnp.dot(h, deq_ref[:], preferred_element_type=jnp.float32,
                 precision=prec)
    if act == "silu":
        a = gate * jax.lax.logistic(gate) * up
    else:  # gelu (tanh approx)
        a = jax.nn.gelu(gate, approximate=True) * up
    a = a.astype(cdtype)

    # down block: dequant (bn, K) rows then accumulate a @ d. Scales and
    # zeros ride as FULL arrays ((I/g, K) is only ~MBs and a blocked
    # (bn/g, K) spec can violate the 8-sublane rule when bn/g < 8), so
    # group rows are offset by the grid step.
    dn_base = pl.program_id(0) * ng

    def per_group_dn(gi, _):
        w = d_qw_ref[pl.ds(pl.multiple_of(gi * wpg, wpg), wpg), :]
        sg = d_s_ref[pl.ds(dn_base + gi, 1), :]
        zg = d_z_ref[pl.ds(dn_base + gi, 1), :]
        dndeq_ref[pl.ds(pl.multiple_of(gi * g, g), g), :] = \
            _paired_dequant(w, sg, zg, cdtype)
        return 0
    jax.lax.fori_loop(0, ng, per_group_dn, 0, unroll=False)
    acc_ref[:] += jnp.dot(a, dndeq_ref[:],
                          preferred_element_type=jnp.float32,
                          precision=prec)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def fused_mlp_reference(x, norm_w, gu_qweight, gu_scales, gu_zeros,
                        d_qweight, d_scales, d_zeros, *, group_size: int,
                        eps: float = 1e-6, act: str = "silu"):
    """jnp reference (and non-TPU fallback)."""
    from nmvllm_tpu.ops.quant_matmul import (apply_prologue_jnp,
                                             quant_matmul_reference)
    m, k = x.shape
    h = apply_prologue_jnp("rmsnorm", x, norm_w, eps)
    gu = quant_matmul_reference(h, gu_qweight, gu_scales, gu_zeros,
                                bits=4, group_size=group_size)
    i = gu.shape[-1] // 2
    gate, up = gu[:, :i], gu[:, i:]
    pro = "silu_mul" if act == "silu" else "gelu_mul"
    a = apply_prologue_jnp(pro, gate, up, eps)
    y = quant_matmul_reference(a, d_qweight, d_scales, d_zeros, bits=4,
                               group_size=group_size)
    return y.astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("group_size", "block_n",
                                             "eps", "act"))
def fused_mlp_w4(
    x: jax.Array,            # (m, K) bf16/f32 residual-stream input
    norm_w: jax.Array,       # (K,) rmsnorm weight
    gu_qweight: jax.Array,   # (K//8, 2I) paired-packed [gate | up]
    gu_scales: jax.Array,    # (K//g, 2I)
    gu_zeros: jax.Array,     # (K//g, 2I) int32
    d_qweight: jax.Array,    # (I//8, K)
    d_scales: jax.Array,     # (I//g, K)
    d_zeros: jax.Array,      # (I//g, K) int32
    *,
    group_size: int,
    block_n: int = 512,
    eps: float = 1e-6,
    act: str = "silu",
) -> jax.Array:
    """out[m, K] = silu_mlp(rmsnorm(x)) with W4 weights; f32 output
    (the residual add + cast stay outside — XLA fuses them for free)."""
    m, k = x.shape
    two_i = gu_qweight.shape[1]
    i = two_i // 2
    g = group_size
    if (not use_pallas()) or g % 8 != 0 or k % g != 0 or i % g != 0:
        return fused_mlp_reference(x, norm_w, gu_qweight, gu_scales,
                                   gu_zeros, d_qweight, d_scales, d_zeros,
                                   group_size=g, eps=eps, act=act)
    bn = block_n
    while i % bn != 0:
        bn //= 2
    assert bn >= g and bn % g == 0, (i, bn, g)

    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    m_pad = round_up(m, sublane)
    xp = jnp.pad(x, ((0, m_pad - m), (0, 0))) if m_pad != m else x
    nw = norm_w.reshape(1, k).astype(jnp.float32)

    n_steps = i // bn
    grid = (n_steps,)
    kg = k // g

    def col_block(j):
        return (0, j)

    def col_block_up(j):
        return (0, j + n_steps)

    def row_block(j):
        return (j, 0)

    in_specs = [
        pl.BlockSpec((m_pad, k), lambda j: (0, 0),
                     memory_space=pltpu.VMEM),           # x
        pl.BlockSpec((1, k), lambda j: (0, 0),
                     memory_space=pltpu.VMEM),           # norm_w
        pl.BlockSpec((k // 8, bn), col_block,
                     memory_space=pltpu.VMEM),           # gate qw
        pl.BlockSpec((kg, bn), col_block,
                     memory_space=pltpu.VMEM),           # gate scales
        pl.BlockSpec((kg, bn), col_block,
                     memory_space=pltpu.VMEM),           # gate zeros
        pl.BlockSpec((k // 8, bn), col_block_up,
                     memory_space=pltpu.VMEM),           # up qw
        pl.BlockSpec((kg, bn), col_block_up,
                     memory_space=pltpu.VMEM),           # up scales
        pl.BlockSpec((kg, bn), col_block_up,
                     memory_space=pltpu.VMEM),           # up zeros
        pl.BlockSpec((bn // 8, k), row_block,
                     memory_space=pltpu.VMEM),           # down qw
        pl.BlockSpec((i // g, k), lambda j: (0, 0),
                     memory_space=pltpu.VMEM),           # down scales (full)
        pl.BlockSpec((i // g, k), lambda j: (0, 0),
                     memory_space=pltpu.VMEM),           # down zeros (full)
    ]
    deq_dtype = jnp.float32 if pallas_interpret() else x.dtype
    kernel = functools.partial(_fused_mlp_kernel, group_size=g, k=k,
                               bn=bn, eps=float(eps), act=act)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m_pad, k), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, k), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((m_pad, k), deq_dtype),     # h (normed x)
            pltpu.VMEM((k, bn), deq_dtype),        # gate/up dequant
            pltpu.VMEM((bn, k), deq_dtype),        # down dequant
            pltpu.VMEM((m_pad, k), jnp.float32),   # down accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # Scratch (h + gate/up dequant + down dequant + acc) plus
            # double-buffered operands exceed the default 16M scoped
            # budget by <2M at the production geometry (K=4096, I=14336,
            # bn=512, m=64); v5e has 128M VMEM — raise the cap instead
            # of shrinking bn (fewer grid steps wins on this stack,
            # docs/PERF_NOTES.md "per-grid-step wall").
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * (2 * i) * k + 2 * m_pad * i * k,
            bytes_accessed=(2 * i * k // 2 + i * k // 2 +
                            m_pad * k * (4 + x.dtype.itemsize)),
            transcendentals=m_pad * i),
        interpret=pallas_interpret(),
    )(xp, nw, gu_qweight, gu_scales, gu_zeros,
      gu_qweight, gu_scales, gu_zeros,
      d_qweight, d_scales, d_zeros)
    return out[:m]
