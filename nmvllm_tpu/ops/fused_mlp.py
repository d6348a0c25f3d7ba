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


# ---------------------------------------------------------------------------
# W4A8 'packed' fused MLP block (round 5).
#
# Same call-count win as fused_mlp_w4 but on the A8P serving path
# (ops/quant_matmul.py "W4A8 packed"): rmsnorm + per-token int8 quantize
# run once at grid step 0 (VMEM-resident x8/group-sums/absmax), each
# grid step unpacks a gate and an up column block to int8 (2 masked
# int32 ops + free bitcasts per 8 weights, SIMD group multipliers),
# runs two int8 MXU dots, applies the silu/gelu gate in f32, quantizes
# the (m, bn) activation CHUNK to int8 with a per-token-per-chunk scale,
# and accumulates the down-projection partial product.
#
# Per-chunk activation scales are FINER-grained than the unfused path's
# per-token scale over the whole intermediate row (each chunk gets its
# own absmax), so fusion does not lose a8 precision. The f32 down
# accumulator carries (int32_dot - group_corr) * a_scale_chunk per step;
# the per-channel down scale folds once in the final-step epilogue.
#
# Reference parity: serves the same GEMM pair as the Marlin kernels
# (csrc/quantization/marlin/dense/marlin_cuda_kernel.cu) plus the fused
# silu_and_mul (csrc/activation_kernels.cu:149).
# ---------------------------------------------------------------------------


_A8P_MASK = 0x0F0F0F0F
_A8P_SBIT = -0x7F7F7F80    # 0x80808080 as int32


def _a8p_unpack_groups(qw_ref, m_ref, deq_ref, n_groups: int,
                       group_size: int):
    """Unpack ``n_groups`` A8P scale groups from ``qw_ref`` into the
    int8 ``deq_ref`` scratch, applying the per-group multiplier rows of
    ``m_ref`` (same math as quant_matmul.py::_w4a8p_kernel)."""
    g = group_size
    wpg = g // 8
    half = g // 2
    mask = jnp.int32(_A8P_MASK)
    sbit = jnp.int32(_A8P_SBIT)

    def per_group(gi, _):
        w = qw_ref[pl.ds(pl.multiple_of(gi * wpg, wpg), wpg), :]
        mg = m_ref[pl.ds(gi, 1), :]
        cg = sbit - mg * jnp.int32(0x08080808)
        lo = ((w & mask) * mg + cg) ^ sbit
        hi = ((jax.lax.shift_right_logical(w, jnp.int32(4)) & mask) * mg
              + cg) ^ sbit
        deq_ref[pl.ds(pl.multiple_of(gi * g, half), half), :] = \
            pltpu.bitcast(lo, jnp.int8)
        deq_ref[pl.ds(pl.multiple_of(gi * g + half, half), half), :] = \
            pltpu.bitcast(hi, jnp.int8)
        return 0

    jax.lax.fori_loop(0, n_groups, per_group, 0, unroll=False)


def _fused_mlp_a8p_kernel(x_ref, nw_ref,
                          g_qw_ref, g_m_ref, g_zms_ref, g_sc_ref,
                          u_qw_ref, u_m_ref, u_zms_ref, u_sc_ref,
                          d_qw_ref, d_m_ref, d_zms_ref, d_sc_ref,
                          o_ref,
                          x8_ref, xg_ref, ax_ref, deq_ref, dndeq_ref,
                          acc_ref,
                          *, group_size: int, k: int, bn: int, eps: float,
                          act: str):
    g = group_size
    kg = k // g           # scale groups along K (gate/up depth)
    ng = bn // g          # scale groups along the down block's rows
    mrows = x8_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=1, keepdims=True)
        h = xf * jax.lax.rsqrt(var + eps) * nw_ref[:].astype(jnp.float32)
        ax = jnp.maximum(jnp.max(jnp.abs(h), axis=1, keepdims=True),
                         1e-8) / 127.0
        xq = jnp.clip(jnp.round(h / ax), -127, 127)
        x8_ref[:] = xq.astype(jnp.int8)
        xg = jnp.sum(xq.reshape(mrows, kg, g), axis=-1)
        g_pad = xg_ref.shape[1]
        if g_pad != kg:
            xg = jnp.pad(xg, ((0, 0), (0, g_pad - kg)))
        xg_ref[:] = xg
        ax_ref[:] = ax
        acc_ref[:] = jnp.zeros_like(acc_ref)

    ax = ax_ref[:, :1]
    hp = jax.lax.Precision.HIGHEST

    _a8p_unpack_groups(g_qw_ref, g_m_ref, deq_ref, kg, g)
    acc_g = jnp.dot(x8_ref[:], deq_ref[:],
                    preferred_element_type=jnp.int32)
    corr_g = jnp.dot(xg_ref[:], g_zms_ref[:],
                     preferred_element_type=jnp.float32, precision=hp)
    gate = (acc_g.astype(jnp.float32) - corr_g) * \
        g_sc_ref[0, :].astype(jnp.float32) * ax

    _a8p_unpack_groups(u_qw_ref, u_m_ref, deq_ref, kg, g)
    acc_u = jnp.dot(x8_ref[:], deq_ref[:],
                    preferred_element_type=jnp.int32)
    corr_u = jnp.dot(xg_ref[:], u_zms_ref[:],
                     preferred_element_type=jnp.float32, precision=hp)
    up = (acc_u.astype(jnp.float32) - corr_u) * \
        u_sc_ref[0, :].astype(jnp.float32) * ax

    if act == "silu":
        a = gate * jax.lax.logistic(gate) * up
    else:  # gelu (tanh approx)
        a = jax.nn.gelu(gate, approximate=True) * up

    # Per-token-per-chunk int8 quantize of the activation block.
    a_ax = jnp.maximum(jnp.max(jnp.abs(a), axis=1, keepdims=True),
                       1e-8) / 127.0
    aq = jnp.clip(jnp.round(a / a_ax), -127, 127)
    ag = jnp.sum(aq.reshape(mrows, ng, g), axis=-1)
    a8 = aq.astype(jnp.int8)

    _a8p_unpack_groups(d_qw_ref, d_m_ref, dndeq_ref, ng, g)
    acc_d = jnp.dot(a8, dndeq_ref[:], preferred_element_type=jnp.int32)
    corr_d = jnp.dot(ag, d_zms_ref[:],
                     preferred_element_type=jnp.float32, precision=hp)
    acc_ref[:] += (acc_d.astype(jnp.float32) - corr_d) * a_ax

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = acc_ref[:] * d_sc_ref[0, :].astype(jnp.float32)


def fused_mlp_a8p_reference(x, norm_w, gu_qweight, gu_mult, gu_s_chan,
                            gu_zms, d_qweight, d_mult, d_s_chan, d_zms, *,
                            group_size: int, block_n: int,
                            eps: float = 1e-6, act: str = "silu"):
    """jnp reference with IDENTICAL quantization semantics (per-chunk
    down-activation scales) — also the non-TPU fallback."""
    from nmvllm_tpu.ops.quant_matmul import (apply_prologue_jnp,
                                             quant_matmul_a8p_reference,
                                             unpack_weights_a8p)
    m, k = x.shape
    g = group_size
    i = gu_qweight.shape[1] // 2
    h = apply_prologue_jnp("rmsnorm", x, norm_w, eps)
    gu = quant_matmul_a8p_reference(h, gu_qweight, gu_mult, gu_s_chan,
                                    gu_zms, group_size=g)
    gate = gu[:, :i].astype(jnp.float32)
    up = gu[:, i:].astype(jnp.float32)
    if act == "silu":
        a = gate * jax.lax.logistic(gate) * up
    else:
        a = jax.nn.gelu(gate, approximate=True) * up
    v = unpack_weights_a8p(d_qweight, g, i).astype(jnp.float32)
    u = (v - 8.0) * jnp.repeat(d_mult.astype(jnp.float32), g, axis=0)
    ng = block_n // g
    acc = jnp.zeros((m, k), jnp.float32)
    for j in range(i // block_n):
        ch = a[:, j * block_n:(j + 1) * block_n]
        a_ax = jnp.maximum(jnp.max(jnp.abs(ch), axis=1, keepdims=True),
                           1e-8) / 127.0
        aq = jnp.clip(jnp.round(ch / a_ax), -127, 127)
        ag = jnp.sum(aq.reshape(m, ng, g), axis=-1)
        zrows = d_zms[j * ng:(j + 1) * ng].astype(jnp.float32)
        acc = acc + (jnp.dot(aq, u[j * block_n:(j + 1) * block_n]) -
                     jnp.dot(ag, zrows)) * a_ax
    return acc * d_s_chan.reshape(1, -1).astype(jnp.float32)


def _fused_a8p_vmem_estimate(m_pad, k, i, g, bn, g_pad, xb):
    v = m_pad * k * xb + 2 * k * 4             # x + norm_w (single fetch)
    v += m_pad * k                             # x8 scratch
    v += m_pad * g_pad * 4 + m_pad * 4         # xg + ax scratches
    v += k * bn + bn * k                       # gate/up + down deq (int8)
    v += m_pad * k * 4                         # down accumulator
    v += 2 * m_pad * k * 4                     # step-0 f32 temporaries
    v += 2 * 2 * (k // 8) * bn * 4             # gate+up qw (dbl-buffered)
    v += 2 * 2 * ((k // g) * bn * 4 + g_pad * bn * 4 + bn * 4)
    v += 2 * (bn // 8) * k * 4                 # down qw
    v += 2 * ((bn // g) * k * 8 + k * 4)       # down mult/zms/s_chan
    v += 2 * m_pad * bn * 4                    # gate/up/a f32 temporaries
    return v


@functools.partial(jax.jit, static_argnames=("group_size", "block_n",
                                             "eps", "act"))
def fused_mlp_a8p(
    x: jax.Array,            # (m, K) bf16/f32 residual-stream input
    norm_w: jax.Array,       # (K,) rmsnorm weight
    gu_qweight: jax.Array,   # (K//8, 2I) int32 A8P-packed [gate | up]
    gu_mult: jax.Array,      # (K//g, 2I) int32 group multipliers
    gu_s_chan: jax.Array,    # (1, 2I) f32 per-channel scale
    gu_zms: jax.Array,       # (K//g, 2I) f32 (zero-8)*mult
    d_qweight: jax.Array,    # (I//8, K) int32 A8P-packed
    d_mult: jax.Array,       # (I//g, K) int32
    d_s_chan: jax.Array,     # (1, K) f32
    d_zms: jax.Array,        # (I//g, K) f32
    *,
    group_size: int,
    block_n: int = 0,
    eps: float = 1e-6,
    act: str = "silu",
):
    """One-kernel silu_mlp(rmsnorm(x)) on the W4A8 packed path; f32
    output (residual add + cast stay outside). Returns ``None`` when the
    geometry cannot run fused (caller falls back to the two-kernel
    path) — all feasibility checks are static."""
    m, k = x.shape
    two_i = gu_qweight.shape[1]
    i = two_i // 2
    g = group_size
    if g % 8 != 0 or k % g != 0 or i % g != 0:
        return None
    # The blocked (bn//g, K) down mult/zms specs need >= 8 sublanes.
    bn = block_n if block_n > 0 else max(8 * g, 1024)
    if i % bn != 0 or bn % g != 0 or bn // g < 8:
        return None
    if not use_pallas():
        return fused_mlp_a8p_reference(
            x, norm_w, gu_qweight, gu_mult, gu_s_chan, gu_zms,
            d_qweight, d_mult, d_s_chan, d_zms, group_size=g,
            block_n=bn, eps=eps, act=act)

    kg = k // g
    g_pad = round_up(kg, 128)
    m_pad = round_up(m, 32)
    if _fused_a8p_vmem_estimate(m_pad, k, i, g, bn, g_pad,
                                x.dtype.itemsize) > 100 * 1024 * 1024:
        return None
    xp = jnp.pad(x, ((0, m_pad - m), (0, 0))) if m_pad != m else x
    nw = norm_w.reshape(1, k).astype(jnp.float32)
    gu_zms_p = gu_zms
    if g_pad != kg:
        gu_zms_p = jnp.pad(gu_zms, ((0, g_pad - kg), (0, 0)))

    n_steps = i // bn
    ng = bn // g

    def col_block(j):
        return (0, j)

    def col_block_up(j):
        return (0, j + n_steps)

    in_specs = [
        pl.BlockSpec((m_pad, k), lambda j: (0, 0),
                     memory_space=pltpu.VMEM),           # x
        pl.BlockSpec((1, k), lambda j: (0, 0),
                     memory_space=pltpu.VMEM),           # norm_w
    ]
    for cb in (col_block, col_block_up):                 # gate, then up
        in_specs += [
            pl.BlockSpec((k // 8, bn), cb, memory_space=pltpu.VMEM),
            pl.BlockSpec((kg, bn), cb, memory_space=pltpu.VMEM),
            pl.BlockSpec((g_pad, bn), cb, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), cb, memory_space=pltpu.VMEM),
        ]
    in_specs += [
        pl.BlockSpec((bn // 8, k), lambda j: (j, 0),
                     memory_space=pltpu.VMEM),           # down qw
        pl.BlockSpec((ng, k), lambda j: (j, 0),
                     memory_space=pltpu.VMEM),           # down mult
        pl.BlockSpec((ng, k), lambda j: (j, 0),
                     memory_space=pltpu.VMEM),           # down zms
        pl.BlockSpec((1, k), lambda j: (0, 0),
                     memory_space=pltpu.VMEM),           # down s_chan
    ]
    kernel = functools.partial(_fused_mlp_a8p_kernel, group_size=g, k=k,
                               bn=bn, eps=float(eps), act=act)
    out = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m_pad, k), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, k), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((m_pad, k), jnp.int8),        # x8
            pltpu.VMEM((m_pad, g_pad), jnp.float32),  # xg (group sums)
            pltpu.VMEM((m_pad, 1), jnp.float32),      # ax (token scale)
            pltpu.VMEM((k, bn), jnp.int8),            # gate/up dequant
            pltpu.VMEM((bn, k), jnp.int8),            # down dequant
            pltpu.VMEM((m_pad, k), jnp.float32),      # down accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * (2 * i) * k + 2 * m_pad * i * k,
            bytes_accessed=(2 * i * k // 2 + i * k // 2 +
                            (k // g) * (2 * i) * 8 + (i // g) * k * 8 +
                            m_pad * k * (4 + x.dtype.itemsize)),
            transcendentals=m_pad * i),
        interpret=pallas_interpret(),
    )(xp, nw,
      gu_qweight, gu_mult, gu_zms_p, gu_s_chan,
      gu_qweight, gu_mult, gu_zms_p, gu_s_chan,
      d_qweight, d_mult, d_zms, d_s_chan)
    return out[:m]
