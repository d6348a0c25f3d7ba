"""Paged-attention decode kernel (Pallas TPU), fused-KV layout.

TPU-native replacement for the reference's CUDA paged attention
(csrc/attention/attention_kernels.cu:1-995, v1/v2) and the shim
vllm/attention/ops/paged_attn.py:82 (forward_decode).

Design (v2 — see docs/PERF_NOTES.md "attention page DMA" analysis):
  * KV layout ``(num_blocks, 2, num_kv_heads, block_size, head_dim)`` —
    K and V of ALL kv heads of a page live contiguously, so fetching a
    page is ONE large DMA (e.g. 128 KB at H=8, bs=32, d=128, bf16)
    instead of the 2*H small 8 KB DMAs of the per-head layout. DMA issue
    bandwidth, not HBM bandwidth, was the measured wall (84 GB/s of the
    chip's 1077 GB/s); this layout cuts DMA count 16x.
  * Grid ``(batch,)``: each program attends one sequence with ALL heads.
    GQA is expressed as ONE block-diagonal MXU dot: queries are laid out
    ``(H * G_pad, d)`` and pages contribute ``(ppcb * H * bs, d)`` key
    rows; cross-head (row_head != col_head) scores are masked to -inf.
    The H-fold extra score compute is MXU-cheap; the win is one big dot
    instead of H small ones (per-dot fixed cost dominated at H dots).
  * Block tables + context lengths arrive via scalar prefetch (SMEM); the
    kernel issues its own HBM→VMEM page DMAs, double-buffered across
    superblocks of ``pages_per_compute_block`` pages.
  * Online softmax (flash-decoding style) across superblocks; the inner
    ``fori_loop`` trip count is ``ceil(context_len / superblock)`` so work
    is proportional to the true context length.
  * FP8 KV: the cache may be float8_e4m3fn with per-tensor k/v scales —
    dequant happens in-VMEM right after the DMA (replaces the reference's
    inline ``convert_fp8`` in the CUDA kernel).
  * Logit soft-cap (gemma-2), sliding-window (mistral) and alibi
    (bloom/mpt/baichuan-13b) are applied in-kernel on the score tile —
    these models no longer fall back to the jnp path.
  * The CUDA v2 split-K (PARTITION_SIZE=512 sequence partitioning +
    reduce kernel, attention_kernels.cu:534,567) is deliberately not
    ported: it exists to spread one long sequence across SMs, but a TPU
    Pallas grid executes sequentially on the tensor core, so
    partitioning would only add a combine pass. The work-proportional
    ``fori_loop`` over superblocks already gives v2's O(true context)
    behavior; on megacore parts the batch grid dim can be marked
    "parallel" instead.
"""
import functools


import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nmvllm_tpu.ops.utils import pallas_interpret, use_pallas

_NEG_INF = float("-inf")

# Exponent re-bias addends for the SIMD-in-int32 fp8 -> bf16 conversion:
# for a normal fp8 value, bf16 bits = sign | ((bits & 0x7f) << shift) +
# (bias_delta << 7). e4m3 (bias 7): shift 4, delta 120 -> 0x3C00;
# e5m2 (bias 15): shift 5, delta 112 -> 0x3800. No carry across 16-bit
# half-lanes: 0x7f << shift + addend < 0x8000 for both formats.
_FP8_FMT = {"float8_e4m3fn": (4, 0x3C003C00), "float8_e5m2": (5, 0x38003800)}


def _fp8_rows_to_bf16(x, shift, addend):
    """(C, d) fp8 -> (C, d) bf16 with 4-interleaved ROW PERMUTATION,
    entirely in the int32 domain (no sublane relayout — the measured
    wall of the astype path, docs/PERF_NOTES.md round 4).

    Bitcasting the fp8 tile to int32 packs rows 4r..4r+3 into word row r
    (byte i at bits 8i). Bytes (0,1) shuffle to the 16-bit half-lanes of
    ``lo``, bytes (2,3) to ``hi``; a SIMD exponent re-bias converts both
    halves at once; bitcasting int32 -> bf16 expands each word into rows
    (2r, 2r+1). Output row j therefore holds input row perm(j):
      j <  C/2: 4*(j//2) + j%2
      j >= C/2: 4*((j-C/2)//2) + 2 + (j-C/2)%2
    Callers must evaluate positional masks in this permuted order (the
    p @ v product is consistent because v permutes identically).
    fp8 zero/subnormal maps to ~2^-7 * (1+m/8) instead of ~0 — an error
    below one fp8 quantization step, certified by the fp8-KV accuracy
    leg; NaN bytes map to finite values (padding is score-masked).
    """
    w = pltpu.bitcast(x, jnp.int32)                    # (C/4, d)
    b01 = (w & 0x000000FF) | ((w & 0x0000FF00) << 8)
    w16 = jax.lax.shift_right_logical(w, jnp.int32(16))
    b23 = (w16 & 0x000000FF) | ((w16 & 0x0000FF00) << 8)

    def conv(y):
        sign = (y & 0x00800080) << 8
        mag = ((y & 0x007F007F) << shift) + addend
        return pltpu.bitcast(sign | mag, jnp.bfloat16)  # (C/2, d)

    return jnp.concatenate([conv(b01), conv(b23)], axis=0)


def _decode_kernel(
    # scalar prefetch
    block_tables_ref,  # (B, max_bpp) int32, SMEM
    context_lens_ref,  # (B,) int32, SMEM
    write_slots_ref,   # (B,) int32, SMEM (-1 = no write / padding row)
    # inputs (bso_ref is present ONLY when blocksparse is enabled — the
    # wrappers below fix the operand list so dense models keep the
    # minimal per-call operand set)
    q_ref,     # (1, R, d) VMEM, R = H * G_pad
    alibi_ref,  # (R, 128) f32 VMEM (slopes broadcast along lanes)
    bso_ref,   # (R, 128) i32 VMEM: per-row blocksparse vertical offsets
    new_k_ref,  # (1, H, d) VMEM — this row's new K
    new_v_ref,  # (1, H, d) VMEM
    kv_hbm,    # (num_blocks, 2, H, bs, d) ANY/HBM (aliased with kv_out)
    # outputs
    o_ref,     # (1, R, d) VMEM
    kv_out,    # (num_blocks, 2, H, bs, d) ANY/HBM, aliased to kv_hbm
    # scratch
    kv_buf,    # (2, ppcb, 2, H, bs, d) VMEM, cache dtype
    page_buf,  # (2, H, bs, d) VMEM — RMW staging for the in-kernel write
    sems,      # DMA sems: (2,) batched, or (2, ppcb) in interpret mode
    wsem,      # write DMA sem
    *,
    scale: float,
    k_scale: float,
    v_scale: float,
    pages_per_compute_block: int,
    block_size: int,
    num_kv_heads: int,
    g_pad: int,
    head_dim: int,
    logit_soft_cap: float,
    sliding_window: int,
    has_alibi: bool,
    blocksparse,         # None or (block, local_blocks, vert_stride)
    fused_write: bool,
    heads_per_dot: int,  # kv heads per block-diagonal MXU dot (<= H)
    fp8_fast: str = "",  # "" (off) or the cache dtype name: use the
                         # relayout-free int-domain fp8->bf16 dequant
    interpret_mode: bool = False,
):
    b = pl.program_id(0)
    ctx = context_lens_ref[b]
    ppcb = pages_per_compute_block
    bs = block_size
    h = num_kv_heads
    sb_tokens = ppcb * bs
    cols = ppcb * h * bs
    rows = h * g_pad
    if fused_write:
        # In-kernel cache write via an OVERLAPPED page read-modify-write.
        # Mosaic cannot DMA to (or store at) a dynamic sublane offset
        # inside a tiled page (a 1-row HBM slice also fails tile-alignment
        # checks — Mosaic requires slice extents on the sublane dim to be
        # multiples of the tiling), so the row is merged into a VMEM copy
        # of the whole page.  The page READ is fire-and-forget here at
        # program entry and awaited only AFTER the attention loop, so it
        # overlaps the entire computation; the write-back overlaps the
        # VMEM fold of the current token below. The current token's
        # attention contribution is folded from VMEM (its HBM slot is
        # stale while the loop runs; the attention loop masks it out via
        # ctx_hist). Each program only RMWs its own (CoW-exclusive) last
        # block, so the concurrent superblock fetches are race-free.
        wslot = write_slots_ref[b]
        wblock = wslot // bs
        woff = wslot % bs
        # History excludes the current token (folded from VMEM) — but
        # only for rows that actually write; a row with wslot == -1 and
        # ctx > 0 attends over fully-materialized HBM pages.
        ctx_hist = jnp.where(wslot >= 0, jnp.maximum(ctx - 1, 0), ctx)

        @pl.when(wslot >= 0)
        def _():
            pltpu.make_async_copy(kv_hbm.at[wblock], page_buf,
                                  wsem).start()
    else:
        ctx_hist = ctx
    num_sb = pl.cdiv(ctx_hist, sb_tokens)

    # Sliding window: skip superblocks that are entirely out of window.
    # (Also required for correctness: a fully-masked superblock would feed
    # exp(-inf - -inf) = NaN into the online softmax.)
    if sliding_window > 0:
        first_valid = jnp.maximum(ctx - sliding_window, 0)
        sb_start = first_valid // sb_tokens
    else:
        sb_start = jnp.int32(0)

    # The last superblock can overhang the table (num_sb*ppcb may exceed
    # the table width by up to ppcb-1 when the width is not a ppcb
    # multiple): clamp the index — the overhanging columns are masked by
    # pos < ctx, so fetching a duplicate valid page is harmless, while an
    # unclamped read walks past the SMEM row into other rows' ids (or,
    # on the last row, off the buffer -> garbage page id -> OOB DMA).
    max_tbl = block_tables_ref.shape[1] - 1

    def copies(sb, slot):
        out = []
        for i in range(ppcb):
            page = block_tables_ref[b, jnp.minimum(sb * ppcb + i, max_tbl)]
            sem = sems.at[slot, i] if interpret_mode else sems.at[slot]
            out.append(pltpu.make_async_copy(
                kv_hbm.at[page], kv_buf.at[slot, i], sem))
        return out

    def start(sb, slot):
        for c in copies(sb, slot):
            c.start()

    def wait(sb, slot):
        if interpret_mode:
            for c in copies(sb, slot):
                c.wait()
        else:
            # All ppcb page copies signal ONE semaphore; a single wait
            # sized as the whole superblock replaces ppcb separate waits
            # (each wait has fixed issue cost — at ppcb=16 the waits were
            # a large share of the ~11us/superblock floor).
            pltpu.make_async_copy(
                kv_buf.at[slot], kv_buf.at[slot], sems.at[slot]).wait()

    # Padding rows have ctx == 0 (num_sb == 0): no DMA may start, or its
    # semaphore would never be awaited and the program would fault.
    @pl.when(num_sb > sb_start)
    def _():
        start(sb_start, jax.lax.rem(sb_start, 2))

    # Fold the softmax scale into q (one extra bf16 rounding, saves a
    # (rows, cols) multiply per superblock). With the fp8 fast path,
    # k_scale folds here too (scores are linear in k) and v_scale folds
    # into the final normalize — the conversion itself then needs ZERO
    # per-element scale work.
    q_premul = scale * (k_scale if fp8_fast else 1.0)
    q = (q_ref[0].astype(jnp.float32) * q_premul).astype(q_ref.dtype)

    # Head chunking: hpd kv heads per block-diagonal dot. hpd == H is one
    # big dot with H-fold masked-score VPU waste; hpd == 1 is H clean
    # per-head dots with H-fold dot-issue overhead. The optimum sits
    # between (sweep NMVLLM_ATTN_HPD on hardware; docs/PERF_NOTES.md).
    hpd = heads_per_dot
    n_chunks = h // hpd
    rows_c = hpd * g_pad
    cols_c = ppcb * hpd * bs

    # Loop-invariant column decomposition within one chunk:
    # c = (p * hpd + h_local) * bs + t.
    col = jax.lax.broadcasted_iota(jnp.int32, (rows_c, cols_c), 1)
    if fp8_fast:
        # The int-domain fp8 dequant permutes K/V rows (4-interleaved,
        # see _fp8_rows_to_bf16) — score column c corresponds to flat
        # kv row perm(c); evaluate all positional masks in that order.
        half = cols_c // 2
        cm = jax.lax.rem(col, half)
        col = 4 * (cm // 2) + jax.lax.rem(cm, 2) + 2 * (col // half)
    col_h = (col // bs) % hpd
    # Position of column c within superblock 0; superblock sb adds
    # sb * sb_tokens (hoisted out of the loop body).
    pos0 = (col // (bs * hpd)) * bs + col % bs
    row_h = jax.lax.broadcasted_iota(jnp.int32, (rows_c, cols_c),
                                     0) // g_pad
    head_ok = col_h == row_h

    def body(sb, carry):
        m, l, acc = carry
        slot = jax.lax.rem(sb, 2)

        @pl.when(sb + 1 < num_sb)
        def _():
            start(sb + 1, jax.lax.rem(sb + 1, 2))

        wait(sb, slot)
        pos = pos0 + sb * sb_tokens
        ms, ls, accs = [], [], []
        for c in range(n_chunks):
            h0 = c * hpd
            r0 = c * rows_c
            k = kv_buf[slot, :, 0, h0:h0 + hpd].reshape(cols_c, head_dim)
            v = kv_buf[slot, :, 1, h0:h0 + hpd].reshape(cols_c, head_dim)
            if fp8_fast:
                # Relayout-free int-domain dequant (rows permuted; the
                # mask iotas above are already in permuted order, and
                # p @ v is consistent because v permutes identically).
                # Scales are folded into q / the final normalize.
                shift, addend = _FP8_FMT[fp8_fast]
                k = _fp8_rows_to_bf16(k, shift, addend)
                v = _fp8_rows_to_bf16(v, shift, addend)
            elif (k.dtype != q_ref.dtype or k_scale != 1.0
                  or v_scale != 1.0):
                # Scaled KV storage (or fast path disabled): dequant in
                # VMEM via astype — a sublane relayout per tile; ~2.6x
                # decode slowdown for fp8 (docs/PERF_NOTES.md round 4).
                k = k.astype(jnp.float32) * k_scale
                v = v.astype(jnp.float32) * v_scale
                k = k.astype(q_ref.dtype)
                v = v.astype(q_ref.dtype)
            qc = q[r0:r0 + rows_c]
            # scores: (rows_c, cols_c) = block-diagonal over chunk heads
            s = jax.lax.dot_general(qc, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.DEFAULT)
            if logit_soft_cap > 0.0:
                s = logit_soft_cap * jnp.tanh(s / logit_soft_cap)
            if has_alibi:
                # slope_h * (key_pos - query_pos); query sits at ctx - 1.
                slopes = alibi_ref[r0:r0 + rows_c, 0:1]  # (rows_c, 1)
                s = s + slopes * (pos - (ctx - 1)).astype(jnp.float32)
            valid = head_ok & (pos < ctx_hist)
            if sliding_window > 0:
                valid &= pos > ctx - 1 - sliding_window
            if blocksparse is not None:
                # Local + vertically-strided key blocks (reference
                # blocksparse_attention/utils.py:141); the query block is
                # always local to itself so qb's own superblock survives.
                bs_blk, bs_local, bs_vert = blocksparse
                kb = pos // bs_blk
                qb = (ctx - 1) // bs_blk
                valid &= ((qb - kb) < bs_local) | (
                    jax.lax.rem(kb + bso_ref[r0:r0 + rows_c, 0:1] + 1,
                                bs_vert) == 0)
            s = jnp.where(valid, s, _NEG_INF)
            mc = m[r0:r0 + rows_c]
            lc = l[r0:r0 + rows_c]
            accc = acc[r0:r0 + rows_c]
            m_new = jnp.maximum(mc, jnp.max(s, axis=1, keepdims=True))
            # A fully-masked superblock (blocksparse stripes, or a fused
            # write with sliding_window shrinking the history window to
            # empty, e.g. sliding_window == 1 where ctx_hist excludes the
            # only in-window key) would give exp(-inf - -inf) = NaN; keep
            # the running max finite so exp(-inf - m) stays 0 instead.
            m_new = jnp.maximum(m_new, -1e30)
            p = jnp.exp(s - m_new)
            alpha = jnp.exp(mc - m_new)
            l_new = lc * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc_new = accc * alpha + jnp.dot(
                p.astype(v.dtype), v,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT)
            ms.append(m_new)
            ls.append(l_new)
            accs.append(acc_new)
        if n_chunks == 1:
            return ms[0], ls[0], accs[0]
        return (jnp.concatenate(ms, 0), jnp.concatenate(ls, 0),
                jnp.concatenate(accs, 0))

    m0 = jnp.full((rows, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((rows, 1), jnp.float32)
    acc0 = jnp.zeros((rows, head_dim), jnp.float32)
    m, l, acc = jax.lax.fori_loop(sb_start, num_sb, body, (m0, l0, acc0))
    if fused_write:
        # The page read issued at program entry has been in flight for the
        # whole loop: await it, merge the token's K/V rows at the in-page
        # sublane via a select (dynamic sublane stores crash Mosaic), and
        # fire the write-back — awaited only at the very end, overlapping
        # the VMEM fold below.
        @pl.when(wslot >= 0)
        def _():
            pltpu.make_async_copy(kv_hbm.at[wblock], page_buf, wsem).wait()
            page = page_buf[:]
            pos_sel = jax.lax.broadcasted_iota(
                jnp.int32, (bs, head_dim), 0)
            sel = (pos_sel == woff)[None, None, :, :]
            newkv = jnp.stack([new_k_ref[0], new_v_ref[0]])[:, :, None, :]
            page_buf[:] = jnp.where(
                sel, jnp.broadcast_to(newkv, page.shape), page)
            pltpu.make_async_copy(page_buf, kv_out.at[wblock],
                                  wsem).start()
        # Fold the current token's K/V (still in VMEM) into the online
        # softmax: its HBM slot may not be written yet (the write-back DMA
        # above overlaps this fold). The new token is its own query
        # position, so alibi bias is 0, it is always inside the sliding
        # window, and its block is local under blocksparse — no extra
        # masking needed.
        # With fp8_fast, k_scale already rides in q and v_scale in the
        # final normalize — fold the raw stored values.
        kf = new_k_ref[0].astype(jnp.float32) * (
            1.0 if fp8_fast else k_scale)                 # (H, d)
        vf = new_v_ref[0].astype(jnp.float32) * (
            1.0 if fp8_fast else v_scale)
        kg = jnp.broadcast_to(kf[:, None, :], (h, g_pad, head_dim)
                              ).reshape(rows, head_dim)
        vg = jnp.broadcast_to(vf[:, None, :], (h, g_pad, head_dim)
                              ).reshape(rows, head_dim)
        s_new = jnp.sum(q.astype(jnp.float32) * kg, axis=1,
                        keepdims=True)                    # (rows, 1)
        if logit_soft_cap > 0.0:
            s_new = logit_soft_cap * jnp.tanh(s_new / logit_soft_cap)
        do = (wslot >= 0)
        m_f = jnp.where(do, jnp.maximum(m, s_new), m)
        # Guard alpha on padding rows (do == False, m == m_f == -inf
        # would give exp(nan)).
        alpha = jnp.where(do, jnp.exp(m - m_f), 1.0)
        p_new = jnp.where(do, jnp.exp(s_new - m_f), 0.0)
        l = l * alpha + p_new
        acc = acc * alpha + p_new * vg
        m = m_f

        @pl.when(wslot >= 0)
        def _():
            pltpu.make_async_copy(page_buf, kv_out.at[wblock],
                                  wsem).wait()
    o_norm = acc / jnp.maximum(l, 1e-30)
    if fp8_fast and v_scale != 1.0:
        o_norm = o_norm * v_scale
    o_ref[0] = o_norm.astype(o_ref.dtype)


def _decode_kernel_dense(block_tables_ref, context_lens_ref,
                         write_slots_ref, q_ref, alibi_ref, new_k_ref,
                         new_v_ref, kv_hbm, o_ref, kv_out, kv_buf,
                         page_buf, sems, wsem, **kw):
    """Operand layout without the blocksparse offsets input."""
    _decode_kernel(block_tables_ref, context_lens_ref, write_slots_ref,
                   q_ref, alibi_ref, None, new_k_ref, new_v_ref, kv_hbm,
                   o_ref, kv_out, kv_buf, page_buf, sems, wsem, **kw)


def _decode_kernel_ro(block_tables_ref, context_lens_ref, write_slots_ref,
                      q_ref, alibi_ref, bso_ref, kv_hbm, o_ref, kv_buf,
                      sems, **kw):
    """Read-only operand layout (no cache write): the kernel takes no
    kv output / new-token inputs at all. Without this, a discarded
    aliased kv output forces XLA to copy the whole cache to preserve
    the caller's value (~0.56 ms at 200 MB, docs/PERF_NOTES.md)."""
    _decode_kernel(block_tables_ref, context_lens_ref, write_slots_ref,
                   q_ref, alibi_ref, bso_ref, None, None, kv_hbm,
                   o_ref, None, kv_buf, None, sems, None, **kw)


def _decode_kernel_ro_dense(block_tables_ref, context_lens_ref,
                            write_slots_ref, q_ref, alibi_ref, kv_hbm,
                            o_ref, kv_buf, sems, **kw):
    _decode_kernel(block_tables_ref, context_lens_ref, write_slots_ref,
                   q_ref, alibi_ref, None, None, None, kv_hbm,
                   o_ref, None, kv_buf, None, sems, None, **kw)


def default_pages_per_compute_block(num_kv_heads: int,
                                    block_size: int) -> int:
    """Target ~4K score columns per superblock: per-superblock fixed cost
    (~5us: semaphore waits + dot issue) dominates below that, VMEM and
    VPU mask/exp work above (measured sweep in docs/PERF_NOTES.md).
    NMVLLM_ATTN_SB_COLS overrides the column target (e2e sweeps)."""
    import os
    cols = int(os.getenv("NMVLLM_ATTN_SB_COLS", "4096"))
    return max(1, cols // (num_kv_heads * block_size))


@functools.partial(
    jax.jit,
    static_argnames=("scale", "k_scale", "v_scale",
                     "pages_per_compute_block", "logit_soft_cap",
                     "sliding_window", "blocksparse"))
def paged_attention(
    q: jax.Array,            # (B, num_q_heads, head_dim)
    kv_cache: jax.Array,     # (num_blocks, 2, H_kv, block_size, head_dim)
    block_tables: jax.Array,  # (B, max_blocks_per_seq) int32
    context_lens: jax.Array,  # (B,) int32, includes the current token
    *,
    scale: float,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
    pages_per_compute_block: int = 0,
    logit_soft_cap: float = 0.0,
    sliding_window: int = 0,
    alibi_slopes=None,
    blocksparse=None,        # static (block, local_blocks, vert_stride)
    bs_head_offsets=None,    # (num_q_heads,) int32, or None (homo heads)
    new_k=None,              # (B, H_kv, head_dim): fuse the cache write
    new_v=None,
    write_slots=None,        # (B,) int32 linear slots; -1 = padding row
):
    """Flash-decoding paged attention.

    Returns (B, num_q_heads, head_dim); with ``new_k/new_v/write_slots``
    the token's K/V rows are written into the cache IN-KERNEL via an
    overlapped page read-modify-write (replacing a separate
    write_to_kv_cache call) — the page read overlaps the attention loop,
    the write-back overlaps the VMEM fold of the current token — and the
    return is ``(out, kv_cache)``.
    """
    fused_write = new_k is not None
    if fused_write and pallas_interpret():
        # The interpreter does not alias input/output buffers, so the
        # in-kernel write would be invisible to the same call's reads:
        # write via the scatter path and attend without fusion.
        from nmvllm_tpu.ops.cache_ops import _write_to_kv_cache_scatter
        kv_cache = _write_to_kv_cache_scatter(kv_cache, new_k, new_v,
                                              write_slots)
        o = paged_attention(
            q, kv_cache, block_tables, context_lens, scale=scale,
            k_scale=k_scale, v_scale=v_scale,
            pages_per_compute_block=pages_per_compute_block,
            logit_soft_cap=logit_soft_cap, sliding_window=sliding_window,
            alibi_slopes=alibi_slopes, blocksparse=blocksparse,
            bs_head_offsets=bs_head_offsets)
        return o, kv_cache
    # Mosaic requires lane-aligned (128) head_dim for the page DMA slices;
    # fall back to the jnp path otherwise (reference pallas.py:103 has the
    # same head_size % 128 constraint).
    # The in-kernel (ppcb, H, bs, d) -> (ppcb*H*bs, d) view is only
    # layout-preserving when the page's sublane extent (block_size) is a
    # multiple of the cache dtype's sublane tile (f32: 8, bf16: 16, fp8: 32).
    sublane_tile = {4: 8, 2: 16, 1: 32}[kv_cache.dtype.itemsize]
    if (not use_pallas() or q.shape[-1] % 128 != 0
            or kv_cache.shape[3] % sublane_tile != 0):
        if fused_write:
            from nmvllm_tpu.ops.cache_ops import (
                _write_to_kv_cache_scatter)
            kv_cache = _write_to_kv_cache_scatter(kv_cache, new_k, new_v,
                                                  write_slots)
        o = paged_attention_reference(
            q, kv_cache, block_tables, context_lens, scale=scale,
            k_scale=k_scale, v_scale=v_scale,
            logit_soft_cap=logit_soft_cap, sliding_window=sliding_window,
            alibi_slopes=alibi_slopes, blocksparse=blocksparse,
            bs_head_offsets=bs_head_offsets)
        return (o, kv_cache) if fused_write else o
    batch, num_q_heads, head_dim = q.shape
    num_blocks, _, num_kv_heads, block_size, _ = kv_cache.shape
    assert num_q_heads % num_kv_heads == 0
    group = num_q_heads // num_kv_heads
    # Rows = H * G; only pad the per-head group when the TOTAL row count
    # would drop under a sublane tile (tiny models) — per-head boundaries
    # inside a tile are handled by the block-diagonal mask, and smaller
    # row counts halve the masked-score VPU work.
    import math
    g_pad = group if num_kv_heads * group >= 8 else math.ceil(
        8 / num_kv_heads)
    rows = num_kv_heads * g_pad
    max_bpp = block_tables.shape[1]
    ppcb = pages_per_compute_block or default_pages_per_compute_block(
        num_kv_heads, block_size)
    if head_dim > 128:  # keep the double-buffered page scratch <= ~4MB
        ppcb = max(1, ppcb * 128 // head_dim)
    ppcb = min(ppcb, max_bpp)
    pad_pages = (-max_bpp) % ppcb
    if pad_pages:
        block_tables = jnp.pad(block_tables, ((0, 0), (0, pad_pages)))
        max_bpp += pad_pages

    q_r = q.reshape(batch, num_kv_heads, group, head_dim)
    if g_pad != group:
        q_r = jnp.pad(q_r, ((0, 0), (0, 0), (0, g_pad - group), (0, 0)))
    q_r = q_r.reshape(batch, rows, head_dim)

    has_alibi = alibi_slopes is not None
    if has_alibi:
        slopes = jnp.asarray(alibi_slopes, jnp.float32).reshape(
            num_kv_heads, group)
        if g_pad != group:
            slopes = jnp.pad(slopes, ((0, 0), (0, g_pad - group)))
        slopes_in = jnp.broadcast_to(
            slopes.reshape(rows, 1), (rows, 128))
    else:
        slopes_in = jnp.zeros((8, 128), jnp.float32)

    has_bso = blocksparse is not None
    if has_bso and bs_head_offsets is not None:
        # Per-row (kv_head, group) vertical offsets; padded group rows
        # reuse the last real head's offset (their outputs are discarded).
        offs = bs_head_offsets.astype(jnp.int32).reshape(
            num_kv_heads, group)
        if g_pad != group:
            offs = jnp.pad(offs, ((0, 0), (0, g_pad - group)),
                           mode="edge")
        bso_in = (jnp.broadcast_to(offs.reshape(rows, 1), (rows, 128)),)
    elif has_bso:
        bso_in = (jnp.zeros((rows, 128), jnp.int32),)
    else:
        bso_in = ()

    if fused_write:
        nk = new_k.astype(kv_cache.dtype)
        nv = new_v.astype(kv_cache.dtype)
        ws = write_slots.astype(jnp.int32)
    else:
        ws = jnp.full((batch,), -1, jnp.int32)

    new_kv_specs = ([
        pl.BlockSpec((1, num_kv_heads, head_dim),
                     lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, num_kv_heads, head_dim),
                     lambda b, *_: (b, 0, 0), memory_space=pltpu.VMEM),
    ] if fused_write else [])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, rows, head_dim), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec(memory_space=pltpu.VMEM)] if has_bso else [])
        + new_kv_specs + [
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, head_dim), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + ([pl.BlockSpec(memory_space=pl.ANY)] if fused_write else []),
        scratch_shapes=[
            pltpu.VMEM((2, ppcb, 2, num_kv_heads, block_size, head_dim),
                       kv_cache.dtype),
        ] + ([pltpu.VMEM((2, num_kv_heads, block_size, head_dim),
                         kv_cache.dtype)] if fused_write else []) + [
            pltpu.SemaphoreType.DMA(
                (2, ppcb) if pallas_interpret() else (2,)),
        ] + ([pltpu.SemaphoreType.DMA(())] if fused_write else []),
    )
    # kv heads per block-diagonal dot: trades masked-score VPU waste
    # (grows with hpd) against per-dot fixed issue cost (grows as H/hpd).
    # Default = all heads (one big dot); sweep NMVLLM_ATTN_HPD on
    # hardware. Read at trace time — changing it mid-process will not
    # retrace already-compiled steps.
    import os
    hpd = int(os.environ.get("NMVLLM_ATTN_HPD", "0")) or num_kv_heads
    # Smallest divisor of H that is >= the request and keeps each chunk's
    # row count at a full f32 sublane tile (8).
    hpd = min((d for d in range(1, num_kv_heads + 1)
               if num_kv_heads % d == 0 and d >= hpd and d * g_pad >= 8),
              default=num_kv_heads)
    if fused_write:
        kernel_fn = _decode_kernel if has_bso else _decode_kernel_dense
    else:
        kernel_fn = _decode_kernel_ro if has_bso else _decode_kernel_ro_dense
    # Relayout-free fp8 dequant (NMVLLM_FP8_KV_FAST, default on): needs a
    # bf16 q (the converted K/V land in bf16) and a 4-divisible chunk
    # column count (block_size % 32 == 0 already guarantees it).
    fp8_fast = ""
    if (kv_cache.dtype.name in _FP8_FMT and q.dtype == jnp.bfloat16
            and os.environ.get("NMVLLM_FP8_KV_FAST", "1")
            not in ("0", "false")):
        fp8_fast = kv_cache.dtype.name
    kernel = functools.partial(
        kernel_fn,
        scale=float(scale), k_scale=float(k_scale), v_scale=float(v_scale),
        pages_per_compute_block=ppcb, block_size=block_size,
        num_kv_heads=num_kv_heads, g_pad=g_pad, head_dim=head_dim,
        logit_soft_cap=float(logit_soft_cap),
        sliding_window=int(sliding_window), has_alibi=has_alibi,
        blocksparse=blocksparse, fused_write=fused_write,
        heads_per_dot=hpd, fp8_fast=fp8_fast,
        interpret_mode=pallas_interpret())
    ctx_bytes = 2 * num_kv_heads * block_size * head_dim * \
        kv_cache.dtype.itemsize
    out_shape = [jax.ShapeDtypeStruct((batch, rows, head_dim), q.dtype)]
    operands = [block_tables.astype(jnp.int32),
                context_lens.astype(jnp.int32), ws, q_r, slopes_in,
                *bso_in]
    aliases = {}
    if fused_write:
        out_shape.append(jax.ShapeDtypeStruct(kv_cache.shape,
                                              kv_cache.dtype))
        operands += [nk, nv, kv_cache]
        # Operand order incl. scalar prefetch: bt(0), cl(1), ws(2), q(3),
        # slopes(4), [bso(5) if blocksparse], nk, nv, kv -> kv (last
        # operand) aliases output 1.
        aliases = {(8 if has_bso else 7): 1}
    else:
        operands += [kv_cache]
    res = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * rows * head_dim * max_bpp * block_size * 2,
            bytes_accessed=batch * max_bpp * ctx_bytes,
            transcendentals=batch * rows * max_bpp * block_size),
        interpret=pallas_interpret(),
    )(*operands)
    out = res[0]
    out = out.reshape(batch, num_kv_heads, g_pad, head_dim)[:, :, :group, :]
    out = out.reshape(batch, num_q_heads, head_dim)
    return (out, res[1]) if fused_write else out


def paged_attention_reference(
    q: jax.Array,
    kv_cache: jax.Array,     # (num_blocks, 2, H_kv, block_size, head_dim)
    block_tables: jax.Array,
    context_lens: jax.Array,
    *,
    scale: float,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
    logit_soft_cap: float = 0.0,
    sliding_window: int = 0,
    alibi_slopes=None,
    blocksparse=None,        # static (block, local_blocks, vert_stride)
    bs_head_offsets=None,    # (num_q_heads,) int32, or None (homo heads)
) -> jax.Array:
    """jnp reference (gather pages -> dense attention). Used by tests and as
    the automatic non-TPU fallback.

    ``sliding_window`` masks keys older than the window in LOGICAL position
    space — with the block manager's wrapped block tables (ring layout)
    those logical indices still gather the correct physical pages, and the
    stale aliased slots fall outside the window mask.
    ``alibi_slopes``: (num_q_heads,) — adds slope*(key_pos - query_pos)
    (reference attention_kernels.cu alibi path); the query position is
    context_len-1.
    """
    batch, num_q_heads, head_dim = q.shape
    _, _, num_kv_heads, block_size, _ = kv_cache.shape
    group = num_q_heads // num_kv_heads
    max_bpp = block_tables.shape[1]
    t = max_bpp * block_size

    # (B, maxb, 2, H, bs, d) -> (B, H, t, d)
    pages = kv_cache[block_tables]
    k = pages[:, :, 0].transpose(0, 2, 1, 3, 4).reshape(
        batch, num_kv_heads, t, head_dim).astype(jnp.float32)
    v = pages[:, :, 1].transpose(0, 2, 1, 3, 4).reshape(
        batch, num_kv_heads, t, head_dim).astype(jnp.float32)
    k = k * k_scale
    v = v * v_scale

    q_r = q.reshape(batch, num_kv_heads, group, head_dim).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhtd->bhgt", q_r, k,
                   precision=jax.lax.Precision.HIGHEST) * scale
    if logit_soft_cap > 0.0:
        s = logit_soft_cap * jnp.tanh(s / logit_soft_cap)
    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, jnp.float32).reshape(
            num_kv_heads, group)
        kpos = jnp.arange(t, dtype=jnp.float32)[None, :]
        qpos = (context_lens[:, None].astype(jnp.float32) - 1.0)
        bias = (kpos - qpos)                                # (B, t), <= 0
        s = s + slopes[None, :, :, None] * bias[:, None, None, :]
    mask = (jnp.arange(t)[None, :] < context_lens[:, None])
    if sliding_window > 0:
        mask &= (jnp.arange(t)[None, :] >
                 context_lens[:, None] - 1 - sliding_window)
    s = jnp.where(mask[:, None, None, :], s, _NEG_INF)
    if blocksparse is not None:
        # reference blocksparse_attention/utils.py:141: local blocks +
        # per-head vertically-strided blocks (query block = last block).
        blk, local, vert = blocksparse
        kb = jnp.arange(t)[None, :] // blk                  # (1, t)
        qb = (context_lens[:, None] - 1) // blk             # (B, 1)
        local_ok = (qb - kb) < local                        # (B, t)
        if bs_head_offsets is None:
            allow = (local_ok | ((kb + 1) % vert == 0))[:, None, None, :]
        else:
            offs = bs_head_offsets.astype(jnp.int32).reshape(
                num_kv_heads, group)
            vert_ok = ((kb[0][None, None, :] + offs[:, :, None] + 1)
                       % vert == 0)[None]                   # (1, h, g, t)
            allow = local_ok[:, None, None, :] | vert_ok
        s = jnp.where(allow, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    # Padding rows (context_len == 0) are fully masked -> softmax NaN;
    # zero them (the Pallas kernel's zero-trip loop does the same).
    p = jnp.where(mask[:, None, None, :], p, 0.0)
    o = jnp.einsum("bhgt,bhtd->bhgd", p, v,
                   precision=jax.lax.Precision.HIGHEST)
    return o.reshape(batch, num_q_heads, head_dim).astype(q.dtype)
