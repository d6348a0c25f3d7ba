"""2:4 semi-structured sparse GEMM (Pallas TPU).

TPU-native replacement for the reference's Marlin-2:4 CUDA kernel
(csrc/quantization/marlin/sparse/marlin_24_cuda_kernel.cu: metadata-indexed
``mma.sp``) and the magic_wand semi-structured path
(vllm sparse_w16a16_linear_method.py:74-92).

TPUs have no sparse tensor cores, so the design converts 50% sparsity into
*HBM bandwidth* savings (SURVEY.md §6 hard-part 5) with a layout chosen so
decompression is pure VPU select — no gathers, no cross-lane shuffles:

  * ``v0``, ``v1``: (K/4, N) — first/second kept value of each group of 4
    consecutive k-rows of the K-major weight.
  * ``meta``: (K/32, N) int32 — per group a 4-bit field (p0 | p1<<2) giving
    the two in-group positions (p0 < p1), packed 8 groups/word with the
    group-local scheme of ops/quant_matmul.py.
  * activations are re-laid-out once per call to x3 (4, M, K/4) with
    x3[r, m, q] = x[m, 4q + r]; then
        y = Σ_r  x3[r] @ dense_r,   dense_r[q, n] = v0⋅(p0==r) + v1⋅(p1==r)
    so each kernel iteration builds dense_r with two compares + selects and
    feeds the MXU directly.

HBM traffic ≈ 9/16 of the dense bf16 weight.
"""
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nmvllm_tpu.ops.utils import pallas_interpret, use_pallas
from nmvllm_tpu.utils import round_up

_GROUPS_PER_WORD = 8  # 4-bit fields per int32
# Meta packing is local to blocks of this many field-rows (= 256 k-rows),
# so kernels can unpack any multiple-of-64 tile with block-local concats.
_PACK_BLOCK = 64


def compress_24(w_t: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Compress a K-major dense weight (K, N), 2:4-structured along K.

    Keeps the 2 largest-|w| entries per group of 4 (positions ascending);
    on an already-pruned checkpoint this selects exactly the nonzeros.
    Returns (v0 (K/4, N), v1 (K/4, N), meta (K/32, N) int32).
    """
    k, n = w_t.shape
    assert k % 32 == 0, k
    g = w_t.astype(jnp.float32).reshape(k // 4, 4, n)
    absg = jnp.abs(g)
    top2 = jax.lax.top_k(absg.swapaxes(1, 2), 2)[1]  # (k/4, n, 2)
    pos = jnp.sort(top2, axis=-1)
    p0, p1 = pos[..., 0], pos[..., 1]                # (k/4, n)
    v0 = jnp.take_along_axis(g, p0[:, None, :], axis=1)[:, 0]
    v1 = jnp.take_along_axis(g, p1[:, None, :], axis=1)[:, 0]
    fields = (p0 | (p1 << 2)).astype(jnp.int32)      # (k/4, n) 4-bit
    from nmvllm_tpu.ops.quant_matmul import pack_fields
    meta = pack_fields(fields, bits=4, group_size=_PACK_BLOCK)
    return v0.astype(w_t.dtype), v1.astype(w_t.dtype), meta


def decompress_24(v0: jax.Array, v1: jax.Array, meta: jax.Array,
                  k: int) -> jax.Array:
    """Inverse of compress_24 → dense (K, N)."""
    from nmvllm_tpu.ops.quant_matmul import unpack_fields
    n = v0.shape[1]
    fields = unpack_fields(meta, 4, _PACK_BLOCK, k // 4)
    p0 = fields & 3
    p1 = fields >> 2
    r = jnp.arange(4)[None, :, None]
    dense = (jnp.where(p0[:, None, :] == r, v0[:, None, :], 0) +
             jnp.where(p1[:, None, :] == r, v1[:, None, :], 0))
    return dense.reshape(k, n).astype(v0.dtype)


def reorder_activations_24(x: jax.Array) -> jax.Array:
    """(M, K) -> x3 (4, M, K/4), x3[r, m, q] = x[m, 4q+r]."""
    m, k = x.shape
    return x.reshape(m, k // 4, 4).transpose(2, 0, 1)


def _sparse24_kernel(x3_ref, v0_ref, v1_ref, m_ref, o_ref, acc_ref, *,
                     bk4: int, out_dtype):
    """Grid (M/bm, N/bn, (K/4)/bk4); x3 block (4, bm, bk4); v blocks
    (bk4, bn); meta block (bk4/8, bn)."""
    @pl.when(pl.program_id(2) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    words = m_ref[:]  # (bk4/8, bn) int32
    spw = _PACK_BLOCK // _GROUPS_PER_WORD  # word-rows per pack block
    blocks = []
    for t in range(bk4 // _PACK_BLOCK):
        wt = words[t * spw:(t + 1) * spw, :]
        parts = [
            (jax.lax.shift_right_logical(wt, 4 * i) & 0xF)
            for i in range(_GROUPS_PER_WORD)
        ]
        blocks.append(jnp.concatenate(parts, axis=0))  # (_PACK_BLOCK, bn)
    fields = (jnp.concatenate(blocks, axis=0)
              if len(blocks) > 1 else blocks[0])  # (bk4, bn) natural order
    p0 = fields & 3
    p1 = jax.lax.shift_right_logical(fields, 2)
    v0 = v0_ref[:]
    v1 = v1_ref[:]
    cdtype = v0.dtype
    prec = (jax.lax.Precision.HIGHEST if cdtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    zero = jnp.zeros((), cdtype)
    acc = acc_ref[:]
    for r in range(4):
        dense_r = (jnp.where(p0 == r, v0, zero) +
                   jnp.where(p1 == r, v1, zero))  # (bk4, bn)
        acc = acc + jnp.dot(x3_ref[r], dense_r,
                            preferred_element_type=jnp.float32,
                            precision=prec)
    acc_ref[:] = acc

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:].astype(out_dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n",
                                             "block_k4"))
def sparse24_matmul(x: jax.Array, v0: jax.Array, v1: jax.Array,
                    meta: jax.Array, *, block_m: int = 0,
                    block_n: int = 512, block_k4: int = 0) -> jax.Array:
    """y[M, N] = x @ decompress_24(v0, v1, meta)."""
    m, k = x.shape
    k4, n = v0.shape
    assert k4 * 4 == k, (k, v0.shape)
    if not use_pallas():
        dense = decompress_24(v0, v1, meta, k).astype(x.dtype)
        return jnp.dot(x, dense, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST).astype(x.dtype)

    sublane = 16 if x.dtype == jnp.bfloat16 else 8
    if block_m <= 0:
        block_m = min(round_up(m, sublane), 256)
    bm = min(block_m, round_up(m, sublane))
    m_pad = round_up(m, bm)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    if block_k4 <= 0:
        block_k4 = min(k4, 1024)
    # x3's lane dim is k4: blocks must be 128-aligned (or the full dim).
    if block_k4 >= k4 or k4 < 128:
        bk4 = k4
    else:
        bk4 = 128
        d = 128
        while d <= min(block_k4, k4):
            if k4 % d == 0:
                bk4 = d
            d += 128
    assert (k4 % bk4 == 0 and bk4 % _PACK_BLOCK == 0
            and (bk4 % 128 == 0 or bk4 == k4)), (k4, bk4)
    bn = min(block_n, n)
    assert n % bn == 0, (n, bn)

    x3 = reorder_activations_24(x)
    grid = (m_pad // bm, n // bn, k4 // bk4)
    kernel = functools.partial(_sparse24_kernel, bk4=bk4,
                               out_dtype=x.dtype)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((4, bm, bk4), lambda i, j, kk: (0, i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk4, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk4, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk4 // _GROUPS_PER_WORD, bn),
                         lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=(m_pad * k * x.dtype.itemsize +
                            k * n * x.dtype.itemsize * 9 // 16 +
                            m_pad * n * x.dtype.itemsize),
            transcendentals=0),
        interpret=pallas_interpret(),
    )(x3, v0, v1, meta)
    return out[:m]
