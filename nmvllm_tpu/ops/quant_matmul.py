"""Fused dequantize + matmul for weight-only quantized linears (W4A16/W8A16).

TPU-native replacement for the reference's Marlin/GPTQ/AWQ CUDA GEMM family
(csrc/quantization/marlin/dense/marlin_cuda_kernel.cu,
csrc/quantization/gptq_marlin/gptq_marlin.cu, csrc/quantization/gptq/q_gemm.cu,
csrc/quantization/awq/gemm_kernels.cu): INT4/INT8 weights with group-wise
scales (+ optional asymmetric zero points) are dequantized in VMEM and fed to
the MXU, so HBM traffic is the *packed* weight size — the kernel targets the
HBM-bandwidth roofline the way Marlin does on GPU.

Canonical 4-bit packed layout (the analogue of ``gptq_marlin_repack``;
every checkpoint format is converted to it once at load): the PAIRED
UNSIGNED layout — pair partners sit 16 bits apart in each int32 word, so
the kernel extracts two weights with ONE masked shift, then a
``pltpu.bitcast(int32 → int16)`` (free) and ``int16 → bf16`` astype (same
(16,128) tile geometry — NO sublane relayout, which was the measured wall
of every earlier dequant path, docs/PERF_NOTES.md). Zero points (incl.
the symmetric 2^(bits-1)) fold into a host-side
``group_sums(x) @ (scales * zeros)`` correction so the kernel sees only
unsigned values. The slab-major packing reproduces the natural row order
in-kernel, so activations go in unpermuted (column gathers and odd
transposes are slow on TPU).

``scales``: ``(K // group_size, N) float32``; ``zeros``:
``(K // group_size, N) int32`` (raw unsigned zero points).

8-bit layers are served as plain bias-signed int8 via XLA fused dequant
(measured faster than any Pallas W8 variant at decode batch sizes).
"""
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nmvllm_tpu.ops.utils import pallas_interpret, use_pallas
from nmvllm_tpu.utils import round_up


def _w4_group(group_size: int, k: int) -> int:
    g = group_size if group_size and group_size > 0 else k
    return g


def pack_weights(w_int: jax.Array, bits: int,
                 group_size: int = 0) -> jax.Array:
    """Pack unsigned integer weights (values in [0, 2^bits)) into the
    canonical layout.

    4-bit: the PAIRED SLAB-MAJOR layout. Within each scale group of g
    rows (w = g/8 words, slab stride s = g/4): word j holds natural rows
    ``m*s + 2j + r`` at bit ``4m + 16r`` (m = slab 0..3, r = pair half).
    The kernel extracts two weights with ONE masked shift per slab, and
    the [P0;P1;P2;P3] sublane concat reproduces the NATURAL row order —
    no activation permutation is needed (column gathers/odd transposes
    are slow on TPU), and the int32->int16 bitcast + int16->bf16 convert
    are relayout-free (docs/PERF_NOTES.md "relayout-free paired
    dequant"). Values stay UNSIGNED; zero points fold into a host-side
    correction term.

    8-bit: sequential bias-signed words (legacy layout; the 8-bit path
    serves unpacked int8 instead).

    Args:
      w_int: (K, N) integer array (K-major weight).
      bits: 4 or 8.
      group_size: scale-group length along K (4-bit layout block;
        0/None/-1 = per-channel, i.e. one block of K rows).
    Returns: (K // (32//bits), N) int32.
    """
    k, n = w_int.shape
    vpw = 32 // bits
    assert k % vpw == 0, (k, vpw)
    if bits == 4:
        g = _w4_group(group_size, k)
        assert k % g == 0 and g % 8 == 0, (k, g)
        w = w_int.astype(jnp.uint32).reshape(k // g, 4, g // 8, 2, n)
        packed = jnp.zeros((k // g, g // 8, n), jnp.uint32)
        for m in range(4):
            for r in range(2):
                packed = packed | (w[:, m, :, r] << (4 * m + 16 * r))
        return packed.reshape(k // 8, n).astype(jnp.int32)
    half = 1 << (bits - 1)
    mask = (1 << bits) - 1
    w = (w_int.astype(jnp.int32) - half) & mask  # bias-signed bit pattern
    w = w.astype(jnp.uint32).reshape(k // vpw, vpw, n)
    shifts = (jnp.arange(vpw, dtype=jnp.uint32) * bits)[None, :, None]
    packed = jnp.sum(w << shifts, axis=1, dtype=jnp.uint32)
    return packed.astype(jnp.int32)


def unpack_weights(packed: jax.Array, bits: int, group_size: int,
                   k: int) -> jax.Array:
    """Inverse of pack_weights → (K, N) int32 unsigned values."""
    vpw = 32 // bits
    mask = (1 << bits) - 1
    n = packed.shape[1]
    p = packed.astype(jnp.uint32)
    if bits == 4:
        g = _w4_group(group_size, k)
        p = p.reshape(k // g, g // 8, n)
        out = jnp.zeros((k // g, 4, g // 8, 2, n), jnp.uint32)
        for m in range(4):
            for r in range(2):
                out = out.at[:, m, :, r].set(
                    (p >> (4 * m + 16 * r)) & mask)
        return out.reshape(k, n).astype(jnp.int32)
    half = 1 << (bits - 1)
    shifts = (jnp.arange(vpw, dtype=jnp.uint32) * bits)[:, None, None]
    vals = ((p[None, :, :] >> shifts) & mask).astype(jnp.int32)
    # Undo bias-signing: stored bits are (v - half) mod 2^bits.
    vals = (vals + half) & mask
    # (vpw, K/vpw, N) -> natural (K, N): row k = j*vpw + i.
    return vals.transpose(1, 0, 2).reshape(k, n)


def pack_weights_sequential(w_int: jax.Array, bits: int,
                            group_size: int = 0) -> jax.Array:
    """LEGACY sequential bias-signed packing (LSB-first fields along K,
    stored value = v - 2^(bits-1)). Kept for the w4a8_matmul experiment
    kernel; the serving paths use the paired layout (pack_weights)."""
    k, n = w_int.shape
    vpw = 32 // bits
    assert k % vpw == 0, (k, vpw)
    half = 1 << (bits - 1)
    mask = (1 << bits) - 1
    w = (w_int.astype(jnp.int32) - half) & mask
    w = w.astype(jnp.uint32).reshape(k // vpw, vpw, n)
    shifts = (jnp.arange(vpw, dtype=jnp.uint32) * bits)[None, :, None]
    packed = jnp.sum(w << shifts, axis=1, dtype=jnp.uint32)
    return packed.astype(jnp.int32)


def pack_fields(fields: jax.Array, bits: int, group_size: int) -> jax.Array:
    """Group-local packing for small metadata fields (used by the 2:4
    sparse kernel's shift/mask unpack path): within each group of
    ``group_size`` rows, packed row ``gi*spw + j`` holds field ``i`` of
    natural row ``gi*g + i*spw + j``."""
    k, n = fields.shape
    vpw = 32 // bits
    g = group_size
    assert k % g == 0 and g % vpw == 0, (k, g, vpw)
    spw = g // vpw
    w = fields.astype(jnp.uint32).reshape(k // g, vpw, spw, n)
    shifts = (jnp.arange(vpw, dtype=jnp.uint32) * bits)[None, :, None, None]
    packed = jnp.sum(w << shifts, axis=1, dtype=jnp.uint32)
    return packed.reshape(k // vpw, n).astype(jnp.int32)


def unpack_fields(packed: jax.Array, bits: int, group_size: int,
                  k: int) -> jax.Array:
    """Inverse of pack_fields → (K, N) int32."""
    vpw = 32 // bits
    g = group_size
    spw = g // vpw
    n = packed.shape[1]
    p = packed.astype(jnp.uint32).reshape(k // g, spw, n)
    shifts = (jnp.arange(vpw, dtype=jnp.uint32) * bits)[None, :, None, None]
    vals = (p[:, None, :, :] >> shifts) & jnp.uint32(2**bits - 1)
    return vals.reshape(k, n).astype(jnp.int32)


def _quant_matmul_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref,
                         deq_ref, *, bits: int, group_size: int, bk: int,
                         symmetric: bool, out_dtype):
    vpw = 32 // bits
    g = group_size
    spw = g // vpw          # packed word-rows per scale group
    gpb = bk // g           # groups per k-block
    half = 1 << (bits - 1)
    target = jnp.int4 if bits == 4 else jnp.int8

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    cdtype = x_ref.dtype
    g0 = pl.program_id(2) * gpb  # global group offset (scales are full-K)

    def dequant_group(gi, _):
        r0 = pl.multiple_of(gi * spw, spw)
        words = w_ref[pl.ds(r0, spw), :]            # (spw, bn) int32
        w4 = pltpu.bitcast(words, target)           # (g, bn) bias-signed
        sg = s_ref[pl.ds(g0 + gi, 1), :].astype(jnp.float32)
        wq = w4.astype(jnp.float32) * sg
        if not symmetric:
            zg = z_ref[pl.ds(g0 + gi, 1), :]
            wq = wq + (half - zg).astype(jnp.float32) * sg
        deq_ref[pl.ds(pl.multiple_of(gi * g, g), g), :] = wq.astype(cdtype)
        return 0

    jax.lax.fori_loop(0, gpb, dequant_group, 0, unroll=False)
    # f32 activations use a true-f32 MXU contract; bf16 stays DEFAULT
    # (Mosaic rejects bf16 + HIGHEST).
    prec = (jax.lax.Precision.HIGHEST if cdtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    acc_ref[:] += jnp.dot(x_ref[:], deq_ref[:],
                          preferred_element_type=jnp.float32,
                          precision=prec)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


def _w4_magic_enabled() -> bool:
    import os
    return os.getenv("NMVLLM_W4_MAGIC", "1") not in ("0", "false")


def _w4_nocat_enabled() -> bool:
    # Store each magic part at its natural slab rows instead of a 4-way
    # sublane concat + one store. A first bracketed reading said 0.77x,
    # but the median-of-5 interleaved rerun read ~1.0-1.08x (tunnel
    # drift had manufactured the win; docs/PERF_NOTES.md round-4
    # variant hunt) — default OFF, kept for hardware A/B.
    import os
    return os.getenv("NMVLLM_W4_NOCAT", "0") not in ("0", "false")


def _unpack_group_parts(w, cdtype):
    """(wpg, bn) int32 paired words -> 4 parts of (2*wpg, bn) cdtype
    nibble values; part m holds natural rows [m*g/4, (m+1)*g/4) of the
    scale group.

    bf16 fast path (NMVLLM_W4_MAGIC, default on): OR each nibble into a
    bf16 mantissa — 0x4300 | n bitcasts to 128 + n exactly (exp 134,
    mantissa ulp 1) — so there is NO int->float convert instruction at
    all; the caller subtracts a (128 + z) zero-bias instead of z.
    Returns (parts, bias) where dequant = (part - (bias + z)) * s and
    every intermediate is an exact small integer in cdtype.

    Fallback (f32 compute, or flag off): masked-shift to int16 pairs +
    astype (same (16,128) tile geometry, no relayout)."""
    mask = jnp.int32(0x000F000F)
    if cdtype == jnp.bfloat16 and _w4_magic_enabled():
        magic = jnp.int32(0x43004300)
        parts = []
        for m in range(4):
            p = (jax.lax.shift_right_logical(w, jnp.int32(4 * m)) & mask
                 ) | magic
            parts.append(pltpu.bitcast(p, jnp.bfloat16))
        return parts, 128
    parts = []
    for m in range(4):
        p = jax.lax.shift_right_logical(w, jnp.int32(4 * m)) & mask
        parts.append(pltpu.bitcast(p, jnp.int16).astype(cdtype))
    return parts, 0


def _unpack_group(w, cdtype):
    """Concat form of _unpack_group_parts -> ((g, bn) values, bias)."""
    parts, bias = _unpack_group_parts(w, cdtype)
    return jnp.concatenate(parts, axis=0), bias


def _dequant_group_store(deq_ref, w_ref, s_ref, z_ref, gi, g0, *,
                         g: int, wpg: int, cdtype):
    """Dequantize scale group ``gi`` of the current k-block into
    deq_ref rows [gi*g, (gi+1)*g). NMVLLM_W4_NOCAT (default OFF —
    matching _w4_nocat_enabled) stores each magic part at its natural
    slab rows, dropping the 4-way sublane concat; a first bracketed
    reading said 0.77x but the median-of-5 interleaved rerun read
    ~1.0-1.08x (drift), so the concat form stays the default
    (docs/PERF_NOTES.md round-4 variant hunt)."""
    w = w_ref[pl.ds(pl.multiple_of(gi * wpg, wpg), wpg), :]
    sg = s_ref[pl.ds(g0 + gi, 1), :].astype(cdtype)
    zg = z_ref[pl.ds(g0 + gi, 1), :].astype(cdtype)
    if _w4_nocat_enabled():
        parts, bias = _unpack_group_parts(w, cdtype)
        if bias:
            zg = zg + bias                 # exact: integer <= 143
        for m in range(4):
            r0 = gi * g + m * (g // 4)
            deq_ref[pl.ds(pl.multiple_of(r0, g // 4), g // 4), :] = \
                (parts[m] - zg) * sg
        return
    wd, bias = _unpack_group(w, cdtype)
    if bias:
        zg = zg + bias
    deq_ref[pl.ds(pl.multiple_of(gi * g, g), g), :] = (wd - zg) * sg


def _w4_paired_kernel(x_ref, *refs, group_size: int, bk: int,
                      has_res: bool = False):
    """Relayout-free paired W4 dequant-GEMM (docs/PERF_NOTES.md).

    Per scale group: ONE masked shift per 2 weights extracts int16 pairs
    (pltpu.bitcast int32->int16 is free; int16->bf16 astype shares the
    (16,128) tile geometry so no sublane relayout), zero-point subtract +
    scale-multiply in the activation dtype (u and z are 4-bit ints —
    exact in bf16), one full-depth MXU dot per k-block. The subtraction
    lives IN-KERNEL because the host-side gsum@(s*z) correction measured
    0.5-1.7 ms of small-op XLA latency per call (docs/PERF_NOTES.md
    "per-op fixed costs").

    ``has_res``: an extra (bm, bn) operand after x is ADDED to the final
    accumulator (fused residual-add epilogue — removes the standalone
    f32 residual-add XLA node from the decode critical path).
    """
    if has_res:
        res_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, deq_ref = refs
    else:
        w_ref, s_ref, z_ref, o_ref, acc_ref, deq_ref = refs
        res_ref = None
    g = group_size
    gpb = bk // g
    wpg = g // 8
    cdtype = deq_ref.dtype

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g0 = pl.program_id(2) * gpb

    def per_group(gi, _):
        _dequant_group_store(deq_ref, w_ref, s_ref, z_ref, gi, g0,
                             g=g, wpg=wpg, cdtype=cdtype)
        return 0

    jax.lax.fori_loop(0, gpb, per_group, 0, unroll=False)
    prec = (jax.lax.Precision.HIGHEST if cdtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    acc_ref[:] += jnp.dot(x_ref[:].astype(cdtype), deq_ref[:],
                          preferred_element_type=jnp.float32,
                          precision=prec)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        out = acc_ref[:]
        if res_ref is not None:
            out = out + res_ref[:].astype(jnp.float32)
        # Store stays f32: an in-kernel f32->bf16 astype would relayout
        # the (8,128) accumulator tile to (16,128) per store (measured
        # 15% e2e regression); the external XLA cast is fused and free.
        o_ref[:] = out


def apply_prologue_jnp(prologue, x, aux, eps):
    """jnp reference/fallback of the kernel prologues."""
    xf = x.astype(jnp.float32)
    if prologue == "silu_mul":
        return (jax.nn.silu(xf) * aux.astype(jnp.float32)).astype(x.dtype)
    if prologue == "gelu_mul":
        return (jax.nn.gelu(xf, approximate=True) *
                aux.astype(jnp.float32)).astype(x.dtype)
    if prologue == "rmsnorm":
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        out = xf * jax.lax.rsqrt(var + eps)
        return (out * aux.astype(jnp.float32)[None, :]).astype(x.dtype)
    raise ValueError(f"unknown prologue {prologue!r}")


def _w4_paired_prologue_kernel(x_ref, aux_ref, *refs, group_size: int,
                               bk: int, prologue: str, eps: float,
                               has_res: bool = False):
    """Paired W4 kernel with a fused activation prologue: the standalone
    silu*up / RMSNorm XLA nodes sit on the decode critical path at
    ~0.4 ms fixed latency each (docs/PERF_NOTES.md) — absorbing them
    into the GEMM removes serial steps. ``rmsnorm`` requires bk == K
    (full rows for the variance). ``has_res``: fused residual-add
    epilogue operand after aux.

    The activation is computed ONCE per (m, k)-block into a VMEM scratch
    at the first n-step and reused across the n grid dim. Recomputing it
    inline every step measured ~300x slower end-to-end (533 ms vs 1.7 ms
    at the gate_up geometry, docs/PERF_NOTES.md round-2): the per-step
    reduce/rsqrt + f32->bf16 convert chain interleaved with the MXU dot
    hits a pathological Mosaic schedule; the hoisted form matches the
    proven-fast fused_mlp kernel structure."""
    if has_res:
        res_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, deq_ref, act_ref = \
            refs
    else:
        w_ref, s_ref, z_ref, o_ref, acc_ref, deq_ref, act_ref = refs
        res_ref = None
    g = group_size
    gpb = bk // g
    wpg = g // 8
    cdtype = deq_ref.dtype

    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    @pl.when(pl.program_id(1) == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        if prologue == "silu_mul":
            act = xf * jax.lax.logistic(xf) * \
                aux_ref[:].astype(jnp.float32)
        elif prologue == "gelu_mul":
            act = jax.nn.gelu(xf, approximate=True) * \
                aux_ref[:].astype(jnp.float32)
        else:  # rmsnorm (bk == K)
            var = jnp.mean(xf * xf, axis=1, keepdims=True)
            act = xf * jax.lax.rsqrt(var + eps) * \
                aux_ref[:].astype(jnp.float32)
        act_ref[:, pl.ds(pl.multiple_of(kk * bk, bk), bk)] = \
            act.astype(cdtype)

    g0 = kk * gpb

    def per_group(gi, _):
        _dequant_group_store(deq_ref, w_ref, s_ref, z_ref, gi, g0,
                             g=g, wpg=wpg, cdtype=cdtype)
        return 0

    jax.lax.fori_loop(0, gpb, per_group, 0, unroll=False)

    act = act_ref[:, pl.ds(pl.multiple_of(kk * bk, bk), bk)]
    prec = (jax.lax.Precision.HIGHEST if cdtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    acc_ref[:] += jnp.dot(act, deq_ref[:],
                          preferred_element_type=jnp.float32,
                          precision=prec)

    @pl.when(kk == pl.num_programs(2) - 1)
    def _():
        out = acc_ref[:]
        if res_ref is not None:
            out = out + res_ref[:].astype(jnp.float32)
        o_ref[:] = out


# Budget for the _w4_vmem_estimate model below, CALIBRATED against
# measured scoped allocations: the model over-counts double-buffered
# operand blocks (prefill qkv: est 21.5M, actual 17.5M) but is near-
# exact when the act/deq scratches dominate (prefill down: est 16.7M,
# actual 16.38M). 16M keeps every proven decode config (est <= 15.5M)
# untouched while rejecting both measured OOM shapes.
_W4_VMEM_BUDGET = 16 * 1024 * 1024


def _w4_vmem_estimate(bm, bn, bk, k, g, xb, db, prologue, has_res):
    """Scoped-VMEM model of the paired kernel: double-buffered operand
    blocks + scratch. Mirrors what Mosaic allocates; the prefill-sized
    qkv/gate_up prologue calls blew the 16MB cap at bm=256 (measured
    17.5M) until blocks were chosen against this budget."""
    est = 2 * bm * bk * xb                 # x block
    est += 2 * (bk // 8) * bn * 4          # packed weights
    est += 2 * 2 * (k // g) * bn * 4       # scales + zeros (full K col)
    est += 2 * bm * bn * 4                 # out
    est += bm * bn * 4                     # acc scratch
    est += bk * bn * db                    # deq scratch
    if prologue in ("silu_mul", "gelu_mul"):
        est += 2 * bm * bk * xb            # aux block
        est += bm * k * db                 # hoisted act scratch
    elif prologue == "rmsnorm":
        est += 2 * bk * 4                  # (1, bk) norm weight
        est += bm * k * db                 # hoisted act scratch
    if has_res:
        est += 2 * bm * bn * 4
    return est


def _quant_matmul_w4_paired(x, qweight, scales, zeros, *, group_size,
                            block_m, block_n, block_k, prologue=None,
                            aux=None, eps=1e-6, epilogue_add=None):
    m, k = x.shape
    n = qweight.shape[1]
    g = group_size
    # Slab-major packing reproduces the natural row order in-kernel;
    # zero points subtract in-kernel: activations go in unpermuted and
    # there is no host-side epilogue beyond the dtype cast.
    xp = x

    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    if block_m <= 0:
        block_m = min(round_up(m, sublane), 256)
    bm = min(block_m, round_up(m, sublane))
    bk = g
    d = g
    if prologue == "rmsnorm":
        limit = k  # full rows needed for the variance
    else:
        limit = block_k if block_k > 0 else 2048
    while d <= min(limit, k):
        if k % d == 0:
            bk = d
        d += g
    if prologue == "rmsnorm":
        assert bk == k, (bk, k)
    bn = min(block_n, n)
    while n % bn != 0:
        bn //= 2
    assert n % bn == 0 and bn >= 128, (n, bn)

    # Shrink blocks until the kernel fits scoped VMEM (prefill-sized m
    # with the full-K rmsnorm scratch otherwise OOMs the 16MB cap).
    db = 2 if x.dtype == jnp.bfloat16 else 4
    xb = x.dtype.itemsize

    def fits(bm_, bn_):
        return _w4_vmem_estimate(bm_, bn_, bk, k, g, xb, db, prologue,
                                 epilogue_add is not None) \
            <= _W4_VMEM_BUDGET

    while not fits(bm, bn) and bn > 256 and n % (bn // 2) == 0:
        bn //= 2
    while not fits(bm, bn) and bm > sublane:
        bm = max(sublane, round_up(bm // 2, sublane))
    m_pad = round_up(m, bm)
    if m_pad != m:
        xp = jnp.pad(xp, ((0, m_pad - m), (0, 0)))

    grid = (m_pad // bm, n // bn, k // bk)
    x_spec = pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                          memory_space=pltpu.VMEM)
    common_specs = [
        pl.BlockSpec((bk // 8, bn), lambda i, j, kk: (kk, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k // g, bn), lambda i, j, kk: (0, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((k // g, bn), lambda i, j, kk: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    has_res = epilogue_add is not None
    res_ops, res_specs = (), []
    if has_res:
        res = epilogue_add
        if m_pad != m:
            res = jnp.pad(res, ((0, m_pad - m), (0, 0)))
        res_ops = (res,)
        res_specs = [pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                                  memory_space=pltpu.VMEM)]
    deq_dtype = jnp.float32 if pallas_interpret() else x.dtype
    kw = dict(
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=(m_pad * k * x.dtype.itemsize + k * n // 2 +
                            m_pad * n * 4),
            transcendentals=0),
        interpret=pallas_interpret(),
    )
    # XLA:CPU (interpret mode) lacks a bf16 dot thunk under shard_map;
    # run the interpreted dot in f32 there (deq_dtype above).
    base_scratch = [pltpu.VMEM((bm, bn), jnp.float32),
                    pltpu.VMEM((bk, bn), deq_dtype)]
    if prologue is None:
        kernel = functools.partial(_w4_paired_kernel, group_size=g, bk=bk,
                                   has_res=has_res)
        acc = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[x_spec] + res_specs + common_specs,
            scratch_shapes=base_scratch, **kw,
        )(xp, *res_ops, qweight, scales, zeros)
        return acc[:m].astype(x.dtype)
    if prologue == "rmsnorm":
        aux_in = aux.reshape(1, k).astype(jnp.float32)
        aux_spec = pl.BlockSpec((1, bk), lambda i, j, kk: (0, kk),
                                memory_space=pltpu.VMEM)
    else:
        aux_in = aux
        if m_pad != m:
            aux_in = jnp.pad(aux_in, ((0, m_pad - m), (0, 0)))
        aux_spec = x_spec
    kernel = functools.partial(_w4_paired_prologue_kernel, group_size=g,
                               bk=bk, prologue=prologue, eps=float(eps),
                               has_res=has_res)
    acc = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[x_spec, aux_spec] + res_specs + common_specs,
        # + the hoisted-activation scratch (computed at n-step 0,
        #   reused across the n grid dim — see the kernel docstring).
        scratch_shapes=base_scratch + [pltpu.VMEM((bm, k), deq_dtype)],
        **kw,
    )(xp, aux_in, *res_ops, qweight, scales, zeros)
    return acc[:m].astype(x.dtype)


@functools.partial(jax.jit,
                   static_argnames=("bits", "group_size", "symmetric",
                                    "block_m", "block_n", "block_k",
                                    "prologue", "eps"))
def quant_matmul(
    x: jax.Array,          # (M, K) activations (bf16/f32)
    qweight: jax.Array,    # (K // vpw, N) int32 packed (bias-signed)
    scales: jax.Array,     # (K // g, N)
    zeros: jax.Array,      # (K // g, N) int32 (raw zero points)
    *,
    bits: int,
    group_size: int,
    symmetric: bool = False,
    block_m: int = 0,
    block_n: int = 0,
    block_k: int = 0,
    prologue=None,         # None | "silu_mul" | "gelu_mul" | "rmsnorm"
    aux=None,              # (M, K) gate partner / (K,) norm weight
    eps: float = 1e-6,
    epilogue_add=None,     # (M, N): fused y += epilogue_add (residual)
) -> jax.Array:
    """y[M, N] = prologue(x) @ dequant(qweight) [+ epilogue_add]."""
    if not use_pallas():
        if prologue is not None:
            x = apply_prologue_jnp(prologue, x, aux, eps)
        y = quant_matmul_reference(x, qweight, scales, zeros, bits=bits,
                                   group_size=group_size)
        if epilogue_add is not None:
            y = (y.astype(jnp.float32) +
                 epilogue_add.astype(jnp.float32)).astype(y.dtype)
        return y
    m, k = x.shape
    vpw = 32 // bits
    n = qweight.shape[1]
    assert qweight.shape[0] == k // vpw
    g = group_size
    assert k % g == 0
    if bits == 4:
        if g % 8 != 0:
            # Paired layout needs whole 8-row words per group.
            if prologue is not None:
                x = apply_prologue_jnp(prologue, x, aux, eps)
            y = quant_matmul_reference(x, qweight, scales, zeros,
                                       bits=bits, group_size=g)
            if epilogue_add is not None:
                y = (y.astype(jnp.float32) +
                     epilogue_add.astype(jnp.float32)).astype(y.dtype)
            return y
        if prologue is not None and m > 128:
            # Prefill-sized batches: the fused prologue's act scratch
            # (bm, K) + f32 temporaries blow the 16MB scoped-VMEM cap
            # (measured 16.4-17.5M OOMs at m=2048), and prefill GEMMs
            # are MXU-bound anyway — run the prologue as (XLA-fused)
            # jnp and the plain kernel. Decode keeps the fused form.
            x = apply_prologue_jnp(prologue, x, aux, eps)
            prologue, aux = None, None
        # Paired relayout-free kernel (the production 4-bit path).
        return _quant_matmul_w4_paired(
            x, qweight, scales, zeros, group_size=g, block_m=block_m,
            block_n=block_n or 1024, block_k=block_k,
            prologue=prologue, aux=aux, eps=eps,
            epilogue_add=epilogue_add)
    if prologue is not None:
        x = apply_prologue_jnp(prologue, x, aux, eps)
    if epilogue_add is not None:
        y = quant_matmul(x, qweight, scales, zeros, bits=bits,
                         group_size=group_size, symmetric=symmetric,
                         block_m=block_m, block_n=block_n,
                         block_k=block_k)
        return (y.astype(jnp.float32) +
                epilogue_add.astype(jnp.float32)).astype(y.dtype)

    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    if block_m <= 0:
        block_m = min(round_up(m, sublane), 256)
    bm = min(block_m, round_up(m, sublane))
    m_pad = round_up(m, bm)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    if block_k <= 0:
        # K blocks sized so the dequant scratch stays VMEM-friendly.
        block_k = 2048
    # Largest divisor of k that's ≤ block_k and a multiple of g.
    bk = g
    d = g
    while d <= min(block_k, k):
        if k % d == 0:
            bk = d
        d += g
    assert k % bk == 0 and bk % g == 0, (k, bk, g)
    bn = min(block_n or 512, n)
    while n % bn != 0:
        bn //= 2
    assert n % bn == 0 and bn >= 128, (n, bn)

    grid = (m_pad // bm, n // bn, k // bk)
    kernel = functools.partial(_quant_matmul_kernel, bits=bits,
                               group_size=g, bk=bk, symmetric=symmetric,
                               out_dtype=x.dtype)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // vpw, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k // g, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k // g, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32),
                        pltpu.VMEM((bk, bn), x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=(m_pad * k * x.dtype.itemsize + k * n * bits // 8 +
                            m_pad * n * x.dtype.itemsize),
            transcendentals=0),
        interpret=pallas_interpret(),
    )(x, qweight, scales, zeros)
    return out[:m]


def _w4a8_matmul_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *,
                        group_size: int, bk: int):
    """INT4-weight x INT8-activation GEMM on native int8 MXU dots.

    The dequant-relayout wall (docs/PERF_NOTES.md): any packed-int ->
    bf16 ``astype`` is a sublane relayout, capping W4A16 at ~60 GB/s.
    This kernel never converts to float. Nibbles are split with int32
    BITWISE ops before a bitcast to int8 (Mosaic has no int8 shifts, and
    int32 masks avoid SWAR borrow): the bias-signed stored nibble is
    ``v ^ 8``, so ``(w ^ 0x08..08) & 0x0F..0F`` recovers the raw UNSIGNED
    value v in each byte, the MXU dots run on v in [0, 15], and the
    symmetric zero point folds out HOST-side as ``-8 * (gsum @ scales)``
    (one tiny f32 matmul on the activations).
    Each scale group is ONE 128-deep int8 dot against activation columns
    pre-permuted to [evens | odds] (the packed layout stores k-row pairs
    (2t, 2t+1) per byte).
    """
    g = group_size
    gpb = bk // g
    wpg = g // 8            # int32 word-rows per group
    xor_mask = jnp.int32(0x08080808)
    nib_mask = jnp.int32(0x0F0F0F0F)

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g0 = pl.program_id(2) * gpb

    def per_group(gi, _):
        words = w_ref[pl.ds(pl.multiple_of(gi * wpg, wpg), wpg), :]
        lo = pltpu.bitcast((words ^ xor_mask) & nib_mask,
                           jnp.int8)                 # (g/2, bn) v of 2t
        hi = pltpu.bitcast((jax.lax.shift_right_logical(
            words, jnp.int32(4)) ^ xor_mask) & nib_mask,
            jnp.int8)                                # (g/2, bn) v of 2t+1
        w_g = jnp.concatenate([lo, hi], axis=0)      # (g, bn) [evens|odds]
        xg = x_ref[:, pl.ds(pl.multiple_of(gi * g, g), g)]
        d = jax.lax.dot_general(xg, w_g, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        sg = s_ref[pl.ds(g0 + gi, 1), :].astype(jnp.float32)
        acc_ref[:] += d.astype(jnp.float32) * sg
        return 0

    jax.lax.fori_loop(0, gpb, per_group, 0, unroll=False)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.lru_cache(maxsize=None)
def _w4a8_perm(k: int, group_size: int):
    """Activation column permutation: per scale group, even k-rows then
    odd (matches the in-kernel [lo | hi] nibble stacking). Cached as
    numpy (a cached jnp array would leak tracers across jit scopes)."""
    import numpy as np
    g = group_size
    idx = np.arange(k).reshape(k // g, g)
    return np.concatenate([idx[:, 0::2], idx[:, 1::2]],
                          axis=1).reshape(-1)


@functools.partial(jax.jit,
                   static_argnames=("group_size", "block_m", "block_n",
                                    "block_k"))
def w4a8_matmul(
    x: jax.Array,          # (M, K) bf16/f32 activations
    qweight: jax.Array,    # (K // 8, N) int32 canonical packed, bias-signed
    scales: jax.Array,     # (K // g, N)
    *,
    group_size: int,
    block_m: int = 0,
    block_n: int = 1024,
    block_k: int = 0,
) -> jax.Array:
    """y = dequant-int8(x) @ dequant(qweight); symmetric weights only.

    Per-token dynamic int8 activation quantization (the reference's
    dynamic_scaled_int8_quant, csrc/quantization/compressed_tensors/
    int8_quant_kernels.cu) fused with the Marlin-class INT4 GEMM.
    """
    m, k = x.shape
    n = qweight.shape[1]
    g = group_size
    assert k % g == 0 and g % 8 == 0

    # Per-token absmax quant (XLA-fused; x is tiny next to the weights).
    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
    s_x = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x), -127, 127)
    xq = xq.astype(jnp.int8)[:, _w4a8_perm(k, g)]
    # Per-group activation sums for the symmetric zero-point correction.
    gsum = jnp.sum(xq.reshape(m, k // g, g).astype(jnp.int32), axis=-1)

    if not use_pallas():
        acc = _w4a8_reference_acc(xq, qweight, scales, g, k)
        return (acc * s_x).astype(x.dtype)

    bm = min(block_m if block_m > 0 else round_up(m, 32), 256)
    bm = min(bm, round_up(m, 32))
    m_pad = round_up(m, bm)
    if m_pad != m:
        xq = jnp.pad(xq, ((0, m_pad - m), (0, 0)))
    bk = g
    d = g
    limit = block_k if block_k > 0 else 2048
    while d <= min(limit, k):
        if k % d == 0:
            bk = d
        d += g
    bn = min(block_n, n)
    while n % bn != 0:
        bn //= 2
    assert n % bn == 0 and bn >= 128

    grid = (m_pad // bm, n // bn, k // bk)
    kernel = functools.partial(_w4a8_matmul_kernel, group_size=g, bk=bk)
    acc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 8, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k // g, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=(m_pad * k + k * n // 2 + m_pad * n * 4),
            transcendentals=0),
        interpret=pallas_interpret(),
    )(xq, qweight, scales)
    # Symmetric zero-point correction: subtract 8 * sum_g(x_g) * s_g.
    corr = jnp.dot(gsum[:m].astype(jnp.float32),
                   scales.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return ((acc[:m] - 8.0 * corr) * s_x).astype(x.dtype)


def _int8_grouped_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *,
                         group_size: int, bk: int):
    """Signed-int8 weights x int8 activations, group-wise scales.

    The W4A8 serving kernel: INT4 checkpoints are expanded to signed int8
    at LOAD (2x HBM for weights, but zero per-element VPU work — no
    nibble unpack, no bitcast relayout, no zero-point correction); each
    scale group is one int8 MXU dot accumulated in f32. Trades weight
    bytes for the dequant-relayout wall (docs/PERF_NOTES.md: packed-int ->
    bf16 converts cap at ~60 GB/s while raw int8 dots stream >400 GB/s).
    """
    g = group_size
    gpb = bk // g

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    g0 = pl.program_id(2) * gpb

    def per_group(gi, _):
        wg = w_ref[pl.ds(pl.multiple_of(gi * g, g), g), :]
        xg = x_ref[:, pl.ds(pl.multiple_of(gi * g, g), g)]
        d = jax.lax.dot_general(xg, wg, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        sg = s_ref[pl.ds(g0 + gi, 1), :].astype(jnp.float32)
        acc_ref[:] += d.astype(jnp.float32) * sg
        return 0

    jax.lax.fori_loop(0, gpb, per_group, 0, unroll=False)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(jax.jit,
                   static_argnames=("group_size", "block_m", "block_n",
                                    "block_k"))
def int8_grouped_matmul(
    x: jax.Array,          # (M, K) bf16/f32 activations
    w8: jax.Array,         # (K, N) SIGNED int8 weights (v - 2^(b-1))
    scales: jax.Array,     # (K // g, N)
    *,
    group_size: int,
    block_m: int = 0,
    block_n: int = 2048,
    block_k: int = 2048,
) -> jax.Array:
    """y = int8(x) @ (w8 * group_scales); per-token dynamic activation
    quant fused outside (XLA), grouped int8 MXU dots inside."""
    m, k = x.shape
    n = w8.shape[1]
    g = group_size
    assert k % g == 0

    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
    s_x = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                  -127, 127).astype(jnp.int8)

    if not use_pallas():
        sfull = jnp.repeat(scales.astype(jnp.float32), g, axis=0)
        acc = jnp.dot(xq.astype(jnp.float32),
                      w8.astype(jnp.float32) * sfull,
                      preferred_element_type=jnp.float32)
        return (acc * s_x).astype(x.dtype)

    bm = min(block_m if block_m > 0 else round_up(m, 32), 256)
    bm = min(bm, round_up(m, 32))
    m_pad = round_up(m, bm)
    if m_pad != m:
        xq = jnp.pad(xq, ((0, m_pad - m), (0, 0)))
    bk = g
    d = g
    while d <= min(block_k, k):
        if k % d == 0:
            bk = d
        d += g
    bn = min(block_n, n)
    while n % bn != 0:
        bn //= 2
    assert n % bn == 0 and bn >= 128

    grid = (m_pad // bm, n // bn, k // bk)
    kernel = functools.partial(_int8_grouped_kernel, group_size=g, bk=bk)
    acc = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k // g, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=(m_pad * k + k * n + m_pad * n * 4),
            transcendentals=0),
        interpret=pallas_interpret(),
    )(xq, w8, scales)
    return (acc[:m] * s_x).astype(x.dtype)


def _int8_channel_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref):
    """Signed-int8 weights x int8 activations, PER-CHANNEL scales.

    The fast path (docs/PERF_NOTES.md): ONE full-depth int8 MXU dot per
    (m, n) block — zero per-element VPU work, zero relayouts, int32
    accumulation across k blocks, scales folded into the f32 epilogue.
    Measured 58.7 TFLOP/s (~447 GB/s weight streaming) on v5e vs the
    ~95 GB/s XLA int8 path and the ~60 GB/s grouped-scale kernels.

    Serves the reference's CUTLASS W8A8 channelwise GEMM
    (csrc/quantization/cutlass_w8a8/scaled_mm_c2x.cu epilogues) and INT4
    checkpoints requantized to int8-channel at load.
    """
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(jnp.float32) * s_ref[0, :].astype(
            jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("block_m", "block_n", "block_k"))
def int8_channel_matmul(
    x: jax.Array,          # (M, K) bf16/f32 activations
    w8: jax.Array,         # (K, N) SIGNED int8 weights
    scales: jax.Array,     # (N,) or (1, N) f32 per-out-channel scales
    *,
    block_m: int = 0,
    block_n: int = 1024,
    block_k: int = 4096,
) -> jax.Array:
    """y = (int8(x) @ w8) * scales * s_x; dynamic per-token activation
    quant (reference dynamic_scaled_int8_quant) fused outside by XLA."""
    m, k = x.shape
    n = w8.shape[1]
    scales = scales.reshape(1, n)

    absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1, keepdims=True)
    s_x = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / s_x),
                  -127, 127).astype(jnp.int8)

    if not use_pallas():
        acc = jnp.dot(xq.astype(jnp.int32), w8.astype(jnp.int32),
                      preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * scales * s_x).astype(x.dtype)

    bm = min(block_m if block_m > 0 else round_up(m, 32), 256)
    bm = min(bm, round_up(m, 32))
    m_pad = round_up(m, bm)
    if m_pad != m:
        xq = jnp.pad(xq, ((0, m_pad - m), (0, 0)))
    bk = min(block_k, k)
    while k % bk != 0:
        bk //= 2
    assert k % bk == 0 and bk >= 128, (k, bk)
    bn = min(block_n, n)
    while n % bn != 0:
        bn //= 2
    assert n % bn == 0 and bn >= 128, (n, bn)

    grid = (m_pad // bm, n // bn, k // bk)
    acc = pl.pallas_call(
        _int8_channel_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=(m_pad * k + k * n + m_pad * n * 4),
            transcendentals=0),
        interpret=pallas_interpret(),
    )(xq, w8, scales)
    return (acc[:m] * s_x).astype(x.dtype)


def requantize_grouped_to_int8_channel(
    qweight: jax.Array,    # (K // vpw, N) int32 canonical packed
    scales: jax.Array,     # (K // g, N)
    zeros: jax.Array,      # (K // g, N) int32 raw zero points
    *,
    bits: int,
    group_size: int,
    k: int,
) -> Tuple[jax.Array, jax.Array]:
    """Convert a group-scaled INT4/INT8 checkpoint into per-channel signed
    int8 ``(w8 (K, N), channel_scales (N,))`` for the single-dot serving
    path.

    Precision: each group's values land on the per-channel int8 grid;
    worst-case extra rounding error is ~0.4 of the source group's own
    quantization step when group absmax varies 16x within a channel —
    below the INT4 grid's inherent error. (The INT4->int8-channel mode is
    opt-in; exact group-scaled kernels remain the default.)
    """
    g = group_size
    w_int = unpack_weights(qweight, bits, g, k)          # (K, N) unsigned
    z = jnp.repeat(zeros.astype(jnp.int32), g, axis=0)
    s = jnp.repeat(scales.astype(jnp.float32), g, axis=0)
    w = (w_int - z).astype(jnp.float32) * s              # dense f32
    ch_absmax = jnp.max(jnp.abs(w), axis=0)              # (N,)
    ch_scale = jnp.maximum(ch_absmax, 1e-10) / 127.0
    w8 = jnp.clip(jnp.round(w / ch_scale[None, :]), -127, 127).astype(
        jnp.int8)
    return w8, ch_scale.astype(jnp.float32)


def _unpack_weights_sequential(packed: jax.Array, bits: int,
                               k: int) -> jax.Array:
    """Inverse of pack_weights_sequential -> (K, N) int32 unsigned."""
    vpw = 32 // bits
    half = 1 << (bits - 1)
    mask = (1 << bits) - 1
    n = packed.shape[1]
    p = packed.astype(jnp.uint32)
    shifts = (jnp.arange(vpw, dtype=jnp.uint32) * bits)[:, None, None]
    vals = ((p[None, :, :] >> shifts) & mask).astype(jnp.int32)
    vals = (vals + half) & mask
    return vals.transpose(1, 0, 2).reshape(k, n)


def _w4a8_reference_acc(xq_perm, qweight, scales, g, k):
    """int32-exact reference of the kernel accumulation (permuted int8
    activations x bias-signed int4 weights, per-group f32 scaling).
    LEGACY sequential layout (pack_weights_sequential)."""
    w_int = _unpack_weights_sequential(qweight, 4, k)  # (K, N) unsigned
    w_signed = (w_int - 8).astype(jnp.int32)          # bias-signed values
    perm = _w4a8_perm(k, g)
    w_perm = w_signed[perm]                           # kernel k-order
    acc = jnp.zeros((xq_perm.shape[0], qweight.shape[1]), jnp.float32)
    for gi in range(k // g):
        xg = xq_perm[:, gi * g:(gi + 1) * g].astype(jnp.int32)
        wg = w_perm[gi * g:(gi + 1) * g]
        d = jnp.dot(xg, wg, preferred_element_type=jnp.int32)
        acc += d.astype(jnp.float32) * scales[gi][None, :].astype(
            jnp.float32)
    return acc


def quant_matmul_reference(x: jax.Array, qweight: jax.Array,
                           scales: jax.Array, zeros: jax.Array, *,
                           bits: int, group_size: int) -> jax.Array:
    """jnp reference: unpack → dequant → dense matmul."""
    m, k = x.shape
    w_int = unpack_weights(qweight, bits, group_size, k)  # (K, N) unsigned
    g = group_size
    z = jnp.repeat(zeros.astype(jnp.int32), g, axis=0)
    s = jnp.repeat(scales.astype(jnp.float32), g, axis=0)
    w = (w_int - z).astype(jnp.float32) * s
    # True-f32 ground truth (TPU default matmul precision truncates to
    # bf16, which would make the reference the imprecise side).
    y = jnp.dot(x.astype(jnp.float32), w, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    return y.astype(x.dtype)


def quantize_weights_to_packed(
    w: jax.Array, bits: int, group_size: int,
    symmetric: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Runtime quantization of a dense (N, K) weight into the packed layout.

    Used for on-the-fly quantization of fp16 checkpoints (the reference's
    Fp8LinearMethod does the analogous runtime quantize; here generalized to
    INT4/INT8) and by tests/benchmarks to fabricate quantized models.

    Returns (qweight (K/vpw, N) int32, scales (K/g, N) f32,
             zeros (K/g, N) int32).
    """
    n, k = w.shape
    g = group_size
    assert k % g == 0
    wt = w.T.astype(jnp.float32).reshape(k // g, g, n)
    qmax = 2**bits - 1
    if symmetric:
        zero = 2**(bits - 1)
        absmax = jnp.max(jnp.abs(wt), axis=1, keepdims=True)
        scale = absmax / (qmax - zero)
        zeros_arr = jnp.full((k // g, n), zero, jnp.int32)
        q = jnp.clip(jnp.round(wt / jnp.maximum(scale, 1e-10)) + zero, 0,
                     qmax)
    else:
        wmin = jnp.min(wt, axis=1, keepdims=True)
        wmax = jnp.max(wt, axis=1, keepdims=True)
        scale = (wmax - wmin) / qmax
        zero = jnp.clip(jnp.round(-wmin / jnp.maximum(scale, 1e-10)), 0, qmax)
        zeros_arr = zero[:, 0, :].astype(jnp.int32)
        q = jnp.clip(jnp.round(wt / jnp.maximum(scale, 1e-10)) + zero, 0,
                     qmax)
    qweight = pack_weights(q.reshape(k, n).astype(jnp.int32), bits, g)
    return qweight, scale[:, 0, :].astype(jnp.float32), zeros_arr


# ---------------------------------------------------------------------------
# W4A8 "packed" serving path (round 5).
#
# The bf16-dequant W4 family is VPU-capped near ~350 GB/s of the 819 GB/s
# weight stream (round-4 `raw` floor, docs/PERF_NOTES.md). This path keeps
# everything integer until one full-depth int8 MXU dot:
#   * weights stay packed INT4 in HBM (group-half byte-lane layout below);
#   * in-kernel unpack is 2 masked int32 ops + 2 free bitcasts per 8
#     weights — no float convert, no sublane relayout;
#   * GPTQ GROUP scales fold into small per-group integer multipliers
#     m_g in [1, 8] applied SIMD-in-int32 during unpack (u8 = v * m_g,
#     byte lanes carry at most 15*8 = 120 < 128 — no carry, fits int8);
#   * the residual per-channel scale S_n and the zero correction
#     z_g * m_g ride a tiny f32 epilogue (one rank-G MXU dot);
#   * activations quantize to per-token int8 in XLA (the reference's
#     dynamic_scaled_int8_quant, csrc/quantization/compressed_tensors/
#     int8_quant_kernels.cu), fused into the preceding elementwise chain.
#
# Numerics: group scales are REQUANTIZED to m_g * S_n (S_n = max_g s_g/8,
# m_g = ceil(s_g / S_n)) and the int4 values re-rounded against the new
# grid at load — groups far below the channel-max scale get a coarser
# grid (bounded by S_n/2); activations carry int8 rounding. This is an
# opt-in approximate mode (NMVLLM_INT4_A8=packed), certified separately
# from the exact dequant path. Measured (bench_w4a8_v5.py, interleaved):
# 0.43x the exact kernel's time at the gate_up decode shape (453 GB/s
# effective on the int4 stream vs 196).


def pack_weights_a8p(v: jax.Array, group_size: int) -> jax.Array:
    """(K, N) unsigned int4 values -> (K/8, N) int32, group-half
    byte-lane layout: within scale group gi, word w, byte b holds group
    row 4w+b in its LOW nibble and group row g/2 + 4w+b in its HIGH
    nibble. ``(word & 0x0F0F0F0F)`` then bitcasts (int32->int8, free) to
    the group's first half in NATURAL row order and ``(word >> 4) &
    0x0F0F0F0F`` to the second half — no activation permutation."""
    k, n = v.shape
    g = _w4_group(group_size, k)
    assert k % g == 0 and g % 8 == 0, (k, g)
    vv = v.astype(jnp.uint32).reshape(k // g, 2, g // 8, 4, n)
    byte = vv[:, 0] | (vv[:, 1] << 4)          # (G, g/8, 4, N)
    word = jnp.zeros((k // g, g // 8, n), jnp.uint32)
    for b in range(4):
        word = word | (byte[:, :, b] << (8 * b))
    return word.reshape(k // 8, n).astype(jnp.int32)


def unpack_weights_a8p(packed: jax.Array, group_size: int,
                       k: int) -> jax.Array:
    """Inverse of pack_weights_a8p -> (K, N) int32 unsigned values."""
    n = packed.shape[1]
    g = _w4_group(group_size, k)
    p = packed.astype(jnp.uint32).reshape(k // g, g // 8, n)
    out = jnp.zeros((k // g, 2, g // 8, 4, n), jnp.uint32)
    for b in range(4):
        byte = (p >> (8 * b)) & 0xFF
        out = out.at[:, 0, :, b].set(byte & 0xF)
        out = out.at[:, 1, :, b].set(byte >> 4)
    return out.reshape(k, n).astype(jnp.int32)


def requantize_grouped_to_a8p(qweight: jax.Array, scales: jax.Array,
                              zeros: jax.Array, *, group_size: int,
                              k: int):
    """Canonical paired W4 (group scales s_g, zeros z_g) -> the A8P
    arrays: (qweight_a8p (K/8,N) i32, mult (G,N) i32, s_chan (1,N) f32,
    zms (G,N) f32).

    s_g is requantized to m_g * S_n with m_g = ceil(s_g/S_n) in [1, 16]
    (ceil never EXPANDS values, so the re-round below cannot clip the
    group extremes) and the int4 values re-rounded against the new grid
    around the UNCHANGED zero point. The kernel serves the RECENTERED
    value (v - 8) * m_g (in [-128, 112], int8-exact even at m = 16), so
    the returned zms is (z_g - 8) * m_g."""
    g = _w4_group(group_size, k)
    v = unpack_weights(qweight, 4, g, k).astype(jnp.float32)    # (K, N)
    s = scales.astype(jnp.float32)                              # (G, N)
    z = zeros.astype(jnp.float32)                               # (G, N)
    s_chan = jnp.maximum(jnp.max(s, axis=0, keepdims=True), 1e-12) / 16.0
    mult = jnp.clip(jnp.ceil(s / s_chan - 1e-6), 1, 16)         # (G, N)
    ratio = s / (mult * s_chan)                                 # <= 1
    zr = jnp.repeat(z, g, axis=0)
    v2 = jnp.clip(jnp.round((v - zr) * jnp.repeat(ratio, g, axis=0)) + zr,
                  0, 15)
    qw = pack_weights_a8p(v2.astype(jnp.int32), g)
    return (qw, mult.astype(jnp.int32), s_chan,
            ((z - 8.0) * mult).astype(jnp.float32))


def _quantize_acts_a8p(x2: jax.Array, g: int, g_pad: int):
    """Per-token int8 quant + per-scale-group sums (XLA, fused into the
    preceding elementwise chain)."""
    m, k = x2.shape
    absmax = jnp.max(jnp.abs(x2.astype(jnp.float32)), axis=1,
                     keepdims=True)
    s_x = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x2.astype(jnp.float32) / s_x),
                  -127, 127)
    xg = jnp.sum(xq.reshape(m, k // g, g), axis=-1)             # (m, G)
    if g_pad != k // g:
        xg = jnp.pad(xg, ((0, 0), (0, g_pad - k // g)))
    return xq.astype(jnp.int8), xg.astype(jnp.float32), s_x


def _w4a8p_kernel(x8_ref, xg_ref, ax_ref, *refs, group_size: int, bk: int,
                  has_res: bool = False):
    """Full-depth int8 GEMM over in-kernel-unpacked INT4 weights.

    Per scale group: 2 masked int32 ops extract the nibble halves, one
    SIMD int32 multiply each applies the group multiplier (constant per
    word — all 8 nibbles of a word share the scale group), two free
    bitcasts land NATURAL-ordered int8 rows in the deq scratch. ONE
    int8 x int8 -> int32 MXU dot per k-block; the k-final epilogue
    applies (acc - xg @ zms) * S_n * ax plus the optional fused
    residual."""
    if has_res:
        res_ref, w_ref, m_ref, zms_ref, sc_ref, o_ref, acc_ref, deq_ref \
            = refs
    else:
        w_ref, m_ref, zms_ref, sc_ref, o_ref, acc_ref, deq_ref = refs
        res_ref = None
    g = group_size
    gpb = bk // g
    wpg = g // 8
    half = g // 2
    mask = jnp.int32(0x0F0F0F0F)

    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # mult rides a full-G block (a (bk//g, bn) block would break tiling
    # when bk//g < 8); index the current k-block's group rows here.
    g0 = pl.program_id(2) * gpb
    sbit = jnp.int32(-0x7F7F7F80)   # 0x80808080 as int32

    def per_group(gi, _):
        w = w_ref[pl.ds(pl.multiple_of(gi * wpg, wpg), wpg), :]
        mg = m_ref[pl.ds(g0 + gi, 1), :]             # (1, bn) int32
        # Recentered SIMD dequant to signed int8 lanes: byte lane
        # t = v*m + (128 - 8m) stays in [0, 240] (no cross-lane carry
        # at m <= 16), and t ^ 0x80 reads as the signed value
        # (v - 8) * m in [-128, 112]. cg's per-byte value 0x80 - 8m is
        # >= 0, so the broadcast constant has no cross-lane borrow.
        cg = sbit - mg * jnp.int32(0x08080808)
        lo = ((w & mask) * mg + cg) ^ sbit
        hi = ((jax.lax.shift_right_logical(w, jnp.int32(4)) & mask) * mg
              + cg) ^ sbit
        deq_ref[pl.ds(pl.multiple_of(gi * g, half), half), :] = \
            pltpu.bitcast(lo, jnp.int8)
        deq_ref[pl.ds(pl.multiple_of(gi * g + half, half), half), :] = \
            pltpu.bitcast(hi, jnp.int8)
        return 0

    jax.lax.fori_loop(0, gpb, per_group, 0, unroll=False)
    acc_ref[:] += jnp.dot(x8_ref[:], deq_ref[:],
                          preferred_element_type=jnp.int32)

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        # HIGHEST: xg entries reach 127*128 and zms ~1e2 — a bf16-pass
        # corr dot costs ~0.1% of the output scale at K=14336.
        corr = jnp.dot(xg_ref[:], zms_ref[:],
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        out = (acc_ref[:].astype(jnp.float32) - corr) * \
            sc_ref[0, :].astype(jnp.float32) * ax_ref[:, :1]
        if res_ref is not None:
            out = out + res_ref[:].astype(jnp.float32)
        o_ref[:] = out


def _a8p_vmem_estimate(bm, bn, bk, k, g, g_pad):
    est = 2 * bm * bk                       # x8 block (int8)
    est += 2 * (bk // 8) * bn * 4           # packed weights
    est += 2 * (k // g) * bn * 4            # mult (full-G block)
    est += 2 * g_pad * bn * 4               # zms
    est += 2 * bm * g_pad * 4               # xg
    est += 2 * bm * bn * 4                  # out
    est += bm * bn * 4                      # acc scratch
    est += bk * bn                          # deq scratch (int8)
    return est


def quant_matmul_a8p_reference(x, qweight, mult, s_chan, zms, *,
                               group_size: int):
    """jnp reference with IDENTICAL quantization semantics (int8 acts,
    requantized group scales)."""
    m, k = x.shape
    g = _w4_group(group_size, k)
    g_pad = round_up(k // g, 128)
    xq, xg, s_x = _quantize_acts_a8p(x, g, g_pad)
    v = unpack_weights_a8p(qweight, g, k).astype(jnp.float32)
    u = (v - 8.0) * jnp.repeat(mult.astype(jnp.float32), g, axis=0)
    acc = jnp.dot(xq.astype(jnp.float32), u,
                  preferred_element_type=jnp.float32)
    corr = jnp.dot(xg[:, :k // g], zms.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return ((acc - corr) * s_chan.reshape(1, -1) * s_x).astype(x.dtype)


@functools.partial(jax.jit,
                   static_argnames=("group_size", "block_m", "block_n",
                                    "block_k", "prologue", "eps"))
def quant_matmul_a8p(
    x: jax.Array,          # (M, K) bf16/f32 activations
    qweight: jax.Array,    # (K/8, N) int32 A8P packed (pack_weights_a8p)
    mult: jax.Array,       # (K/g, N) int32 group multipliers in [1, 8]
    s_chan: jax.Array,     # (1, N) f32 per-channel scale
    zms: jax.Array,        # (K/g, N) f32 zero * mult
    *,
    group_size: int,
    block_m: int = 0,
    block_n: int = 1024,
    block_k: int = 0,
    prologue=None,         # None | "silu_mul" | "gelu_mul" | "rmsnorm"
    aux=None,
    eps: float = 1e-6,
    epilogue_add=None,
) -> jax.Array:
    """y = (int8(x) @ unpack_int8(qweight)) scaled — the W4A8 fast path.

    The activation prologue and int8 quantization run in XLA (in-graph
    elementwise nodes fuse into the preceding chain; only Pallas calls
    carry per-call fixed cost on this stack — docs/PERF_NOTES.md)."""
    m, k = x.shape
    n = qweight.shape[1]
    g = _w4_group(group_size, k)
    x_orig, prologue_orig = x, prologue
    if prologue is not None:
        x = apply_prologue_jnp(prologue, x, aux, eps)
    g_pad = round_up(k // g, 128)
    if not use_pallas():
        y = quant_matmul_a8p_reference(x, qweight, mult, s_chan, zms,
                                       group_size=g)
        if epilogue_add is not None:
            y = (y.astype(jnp.float32) +
                 epilogue_add.astype(jnp.float32)).astype(x.dtype)
        return y
    import os as _os
    if (block_k <= 0
            and _os.getenv("NMVLLM_A8_INQ", "1") not in ("0", "false")):
        # In-kernel prologue + quantize (removes the XLA absmax/round
        # chain from the critical path); the prologue was already
        # consumed above when routed here, so pass the ORIGINAL one.
        # Returns None when the full-depth kernel cannot fit scoped
        # VMEM (prefill-sized m) — fall through to the k-split path.
        y = _quant_matmul_a8p_inq(
            x_orig, qweight, mult, s_chan, zms, group_size=g,
            block_m=block_m, block_n=block_n, prologue=prologue_orig,
            aux=aux, eps=eps, epilogue_add=epilogue_add)
        if y is not None:
            return y
    xq, xg, s_x = _quantize_acts_a8p(x, g, g_pad)

    bm = min(block_m if block_m > 0 else round_up(m, 32), 256)
    bm = min(bm, round_up(m, 32))
    # Full-depth k preferred (ONE dot, scales fold entirely); shrink bn,
    # then split k, until the kernel fits scoped VMEM.
    bn = min(block_n, n)
    while n % bn != 0:
        bn //= 2
    bk = k if block_k <= 0 else block_k

    def fits(bm_, bn_, bk_):
        return _a8p_vmem_estimate(bm_, bn_, bk_, k, g, g_pad) \
            <= _W4_VMEM_BUDGET

    while not fits(bm, bn, bk) and bn > 256 and n % (bn // 2) == 0:
        bn //= 2
    while not fits(bm, bn, bk) and bk > g and bk % 2 == 0 and \
            (bk // 2) % g == 0:
        bk //= 2
    while not fits(bm, bn, bk) and bm > 32:
        bm = max(32, round_up(bm // 2, 32))
    m_pad = round_up(m, bm)
    if m_pad != m:
        xq = jnp.pad(xq, ((0, m_pad - m), (0, 0)))
        xg = jnp.pad(xg, ((0, m_pad - m), (0, 0)))
        s_x = jnp.pad(s_x, ((0, m_pad - m), (0, 0)))
    zms_p = zms
    if g_pad != k // g:
        zms_p = jnp.pad(zms, ((0, g_pad - k // g), (0, 0)))

    grid = (m_pad // bm, n // bn, k // bk)
    has_res = epilogue_add is not None
    res_ops, res_specs = (), []
    if has_res:
        res = epilogue_add
        if m_pad != m:
            res = jnp.pad(res, ((0, m_pad - m), (0, 0)))
        res_ops = (res,)
        res_specs = [pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                                  memory_space=pltpu.VMEM)]
    kernel = functools.partial(_w4a8p_kernel, group_size=g, bk=bk,
                               has_res=has_res)
    acc = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, g_pad), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
        ] + res_specs + [
            pl.BlockSpec((bk // 8, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k // g, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_pad, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32),
                        pltpu.VMEM((bk, bn), jnp.int8)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=(m_pad * k + k * n // 2 + (k // g) * n * 8 +
                            m_pad * n * 4),
            transcendentals=0),
        interpret=pallas_interpret(),
    )(xq, xg, s_x, *res_ops, qweight, mult, zms_p, s_chan)
    y = (acc[:m]).astype(x.dtype)
    return y


def _w4a8p_inq_kernel(x_ref, aux_ref, *refs, group_size: int, k: int,
                      prologue, eps: float, has_res: bool = False):
    """A8P kernel with IN-KERNEL activation prologue + int8 quantize.

    The XLA-side quantize chain (absmax reduce + round + astype + group
    sums) sits on the decode critical path once per GEMM call; hoisting
    it into the kernel at n-step 0 (the proven pattern of
    _w4_paired_prologue_kernel — computed ONCE into scratches, reused
    across the n grid) removes four serial reduces per layer. Requires
    bk == K (full rows for rmsnorm variance / row absmax).

    prologue: None (quantize only) | "rmsnorm" | "silu_mul" | "gelu_mul".
    """
    if has_res:
        res_ref, w_ref, m_ref, zms_ref, sc_ref, o_ref, deq_ref, \
            x8s_ref, xgs_ref, axs_ref = refs
    else:
        w_ref, m_ref, zms_ref, sc_ref, o_ref, deq_ref, \
            x8s_ref, xgs_ref, axs_ref = refs
        res_ref = None
    g = group_size
    gpb = k // g
    wpg = g // 8
    half = g // 2
    g_pad = xgs_ref.shape[1]
    mask = jnp.int32(0x0F0F0F0F)

    @pl.when(pl.program_id(1) == 0)
    def _():
        xf = x_ref[:].astype(jnp.float32)
        if prologue == "rmsnorm":
            var = jnp.mean(xf * xf, axis=1, keepdims=True)
            xf = xf * jax.lax.rsqrt(var + eps) * \
                aux_ref[:].astype(jnp.float32)
        elif prologue == "silu_mul":
            xf = xf * jax.lax.logistic(xf) * aux_ref[:].astype(jnp.float32)
        elif prologue == "gelu_mul":
            xf = jax.nn.gelu(xf, approximate=True) * \
                aux_ref[:].astype(jnp.float32)
        ax = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                         1e-8) / 127.0
        xq = jnp.clip(jnp.round(xf / ax), -127, 127)
        x8s_ref[:] = xq.astype(jnp.int8)
        bm = xq.shape[0]
        xg = jnp.sum(xq.reshape(bm, gpb, g), axis=-1)
        if g_pad != gpb:
            xg = jnp.pad(xg, ((0, 0), (0, g_pad - gpb)))
        xgs_ref[:] = xg
        axs_ref[:] = ax

    sbit = jnp.int32(-0x7F7F7F80)   # 0x80808080 as int32

    def per_group(gi, _):
        w = w_ref[pl.ds(pl.multiple_of(gi * wpg, wpg), wpg), :]
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

    jax.lax.fori_loop(0, gpb, per_group, 0, unroll=False)
    acc = jnp.dot(x8s_ref[:], deq_ref[:],
                  preferred_element_type=jnp.int32)
    corr = jnp.dot(xgs_ref[:], zms_ref[:],
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    out = (acc.astype(jnp.float32) - corr) * \
        sc_ref[0, :].astype(jnp.float32) * axs_ref[:, :1]
    if res_ref is not None:
        out = out + res_ref[:].astype(jnp.float32)
    o_ref[:] = out


def _quant_matmul_a8p_inq(x, qweight, mult, s_chan, zms, *, group_size,
                          block_m, block_n, prologue, aux, eps,
                          epilogue_add):
    """Full-depth (bk == K) A8P call with the in-kernel quantize
    prologue. Caller guarantees the VMEM estimate fits."""
    m, k = x.shape
    n = qweight.shape[1]
    g = _w4_group(group_size, k)
    gpb = k // g
    g_pad = round_up(gpb, 128)
    bm = min(block_m if block_m > 0 else round_up(m, 32), 256)
    bm = min(bm, round_up(m, 32))
    bn = min(block_n, n)
    while n % bn != 0:
        bn //= 2

    # Scoped-VMEM fit (the decode benches never hit prefill-sized m:
    # the first server run OOMed at m=512 x down-proj geometry). Shrink
    # bn, then bm; if even the minimum doesn't fit, the caller falls
    # back to the k-split XLA-quantize path (return None).
    xb = x.dtype.itemsize

    def est(bm_, bn_):
        v = 2 * bm_ * k * xb + bm_ * k + bm_ * g_pad * 4 + bm_ * 4
        # f32 prologue/quantize stack temporaries: Mosaic materializes
        # ~2 (bm, K) f32 intermediates for the astype/activation/round
        # chain (measured 67M actual vs 50M modeled at bm=256, K=14336
        # — the second server OOM).
        v += 2 * bm_ * k * 4
        if prologue in ("silu_mul", "gelu_mul"):
            v += 2 * bm_ * k * xb
        else:
            v += 2 * k * 4
        v += k * bn_ + 2 * (k // 8) * bn_ * 4 + 2 * gpb * bn_ * 4
        v += 2 * g_pad * bn_ * 4 + 2 * bn_ * 4 + 2 * bm_ * bn_ * 4
        if epilogue_add is not None:
            v += 2 * bm_ * bn_ * 4
        return v

    _BUDGET = 56 * 1024 * 1024   # vmem_limit_bytes 64M minus headroom
    while est(bm, bn) > _BUDGET and bn > 256 and n % (bn // 2) == 0:
        bn //= 2
    while est(bm, bn) > _BUDGET and bm > 32:
        bm = max(32, round_up(bm // 2, 32))
    if est(bm, bn) > _BUDGET:
        return None
    m_pad = round_up(m, bm)
    xp = jnp.pad(x, ((0, m_pad - m), (0, 0))) if m_pad != m else x
    if prologue == "rmsnorm":
        aux_in = aux.reshape(1, k).astype(jnp.float32)
        aux_spec = pl.BlockSpec((1, k), lambda i, j, kk: (0, 0),
                                memory_space=pltpu.VMEM)
    elif prologue in ("silu_mul", "gelu_mul"):
        aux_in = aux
        if m_pad != m:
            aux_in = jnp.pad(aux_in, ((0, m_pad - m), (0, 0)))
        aux_spec = pl.BlockSpec((bm, k), lambda i, j, kk: (i, 0),
                                memory_space=pltpu.VMEM)
    else:
        # Quantize-only: a zero-size aux would change the operand list;
        # pass the norm-style dummy (never read).
        aux_in = jnp.zeros((1, k), jnp.float32)
        aux_spec = pl.BlockSpec((1, k), lambda i, j, kk: (0, 0),
                                memory_space=pltpu.VMEM)
    zms_p = zms
    if g_pad != gpb:
        zms_p = jnp.pad(zms, ((0, g_pad - gpb), (0, 0)))
    has_res = epilogue_add is not None
    res_ops, res_specs = (), []
    if has_res:
        res = epilogue_add
        if m_pad != m:
            res = jnp.pad(res, ((0, m_pad - m), (0, 0)))
        res_ops = (res,)
        res_specs = [pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                                  memory_space=pltpu.VMEM)]
    kernel = functools.partial(_w4a8p_inq_kernel, group_size=g, k=k,
                               prologue=prologue, eps=float(eps),
                               has_res=has_res)
    grid = (m_pad // bm, n // bn, 1)
    acc = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            aux_spec,
        ] + res_specs + [
            pl.BlockSpec((k // 8, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_pad, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k, bn), jnp.int8),
                        pltpu.VMEM((bm, k), jnp.int8),
                        pltpu.VMEM((bm, g_pad), jnp.float32),
                        pltpu.VMEM((bm, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=(m_pad * k * x.dtype.itemsize + k * n // 2 +
                            (k // g) * n * 8 + m_pad * n * 4),
            transcendentals=m_pad * k if prologue else 0),
        interpret=pallas_interpret(),
    )(xp, aux_in, *res_ops, qweight, mult, zms_p, s_chan)
    return acc[:m].astype(x.dtype)
