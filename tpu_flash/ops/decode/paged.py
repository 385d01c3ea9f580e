"""Paged GQA decode attention with quantized KV pages.

The decode-side analogue of the reference's execution model: where the
reference overlaps HBM→SMEM tile streaming with compute via two dedicated
loader warps and ``cuda::pipeline`` double buffering (loaders.cuh:114-203,
FlashAttention.cuh:68-83), this kernel overlaps HBM→VMEM *page* streaming
with MXU compute via explicit ``pltpu.make_async_copy`` DMAs, a
double-buffered VMEM page buffer, and DMA semaphores — the true TPU
equivalent of ``cuda::pipeline`` (SURVEY.md §5, distributed-communication
backend row).

Design:
  * KV cache lives in HBM as pages: [num_kv_heads, num_pages, page_size, d]
    (int8 payload, or int4 packed split-nibble with d/2 lanes, or bf16/f32),
    plus per-token scale pages [num_kv_heads, num_pages, page_size] when
    quantized.
  * ``page_indices`` and ``lengths`` arrive via scalar prefetch
    (PrefetchScalarGridSpec), so page DMAs for non-contiguous pages are
    issued before compute needs them — one concurrent DMA per page.
  * Grid (batch, num_kv_heads, kv_blocks); the kernel walks active blocks
    and prefetches the next active block's pages (possibly in the next
    head/sequence) while computing the current block — the same
    producer/consumer overlap the reference builds with loader warps.
  * Online softmax state (m, l, acc) in VMEM scratch across kv blocks;
    deferred normalization in the epilogue.
  * Dequantization is fused rank-1 style: K scales multiply score columns,
    V scales fold into P's columns — integer payloads never materialize as
    dequantized tiles in VMEM.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.core.reference import DEFAULT_MASK_VALUE
from tpu_flash.ops.quant.quantize import (
    QuantizedTensor,
    _unpack_int4_tokens,
    _unpack_uint4_tokens,
    int4g32_num_groups,
)


class _MultiPageCopy:
    """Issue one async DMA per (non-contiguous) KV page of a compute block.

    All page DMAs start concurrently and signal one semaphore; waiting for
    the block waits for them all. Our own TPU-native take on the pattern
    the reference implements with per-fragment ``cuda::memcpy_async``
    (loaders.cuh:55-83).
    """

    def __init__(
        self,
        pages_hbm,  # [num_kv_heads, num_pages, page_size, payload_d]
        scales_hbm,  # [num_kv_heads, num_pages, page_size] or None
        buf,  # VMEM [2, pages_per_block, page_size, payload_d]
        scale_buf,  # VMEM [2, 1, pages_per_block * page_size] or None
        sem,  # DMA sem [2]
        scale_sem,  # DMA sem [2] or None
        page_indices_ref,  # scalar-prefetch [batch, pages_per_seq]
        b,
        h,
        block_idx,
        slot,
        pages_per_block: int,
        pages_per_seq: int,
        page_size: int,
        group_scales: bool = False,
    ):
        self._copies = []
        self._scale_copies = []
        first = block_idx * pages_per_block
        for j in range(pages_per_block):
            pidx = page_indices_ref[b, first + j]
            self._copies.append(
                pltpu.make_async_copy(
                    pages_hbm.at[h, pidx], buf.at[slot, j], sem.at[slot]
                )
            )
            if scales_hbm is not None and group_scales:
                # int4g32 group-affine tier: per-page [2*ng, ps] f32
                # (scale rows then zero rows per 32-channel group,
                # tokens in lanes), one contiguous slice per page.
                self._scale_copies.append(
                    pltpu.make_async_copy(
                        scales_hbm.at[h, pidx],
                        scale_buf.at[slot, j],
                        scale_sem.at[slot],
                    )
                )
            elif scales_hbm is not None:
                # Scales are [hkv, np, 1, ps]: the page dim is an untiled
                # batch dim, so single-page slices stay sublane-aligned at
                # any page_size (a flat [hkv, np, ps] layout trips Mosaic's
                # (8,128)-tiling alignment for ps > 128).
                self._scale_copies.append(
                    pltpu.make_async_copy(
                        scales_hbm.at[h, pidx, 0],
                        scale_buf.at[
                            slot, 0, pl.ds(j * page_size, page_size)
                        ],
                        scale_sem.at[slot],
                    )
                )

    def start(self):
        for c in self._copies + self._scale_copies:
            c.start()

    def wait(self):
        for c in self._copies + self._scale_copies:
            c.wait()


def _paged_attn_kernel(
    # scalar prefetch
    lengths_ref,  # [batch]
    page_indices_ref,  # [batch, pages_per_seq]
    # inputs
    q_ref,  # [1, 1, q_per_kv, head_dim]
    k_pages_hbm,  # ANY [num_kv_heads, num_pages, page_size, payload_d]
    k_scales_hbm,  # ANY or None
    v_pages_hbm,
    v_scales_hbm,
    # outputs
    o_ref,  # [1, 1, q_per_kv, head_dim]
    # scratch
    m_scratch,  # VMEM [q_per_kv_padded, 128]
    l_scratch,
    acc_scratch,  # VMEM [q_per_kv_padded, head_dim]
    k_buf,
    k_scale_buf,
    v_buf,
    v_scale_buf,
    k_sem,
    k_scale_sem,
    v_sem,
    v_scale_sem,
    *,
    batch: int,
    num_kv_heads: int,
    pages_per_block: int,
    pages_per_seq: int,
    page_size: int,
    head_dim: int,
    sm_scale: float,
    kv_quant: Optional[str],  # K-side: None | int8 | int4 | int4g32 | fp8
    v_quant: Optional[str] = None,  # V-side override (None = same as K)
    int8_mxu: bool = False,  # quantized payloads ride the int8 MXU
    int4_bitwise_unpack: bool = True,  # nibble planes via i8 AND/XOR
    fp8_native: bool = False,  # e4m3 pages feed the MXU directly (v6e+)
    skip_scale_dma: bool = False,  # perf diagnostics only (wrong numerics)
    skip_scale_mul: bool = False,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    num_slots: int = 2,  # page-pipeline depth (2 = double buffering)
    sink_ref=None,  # VMEM [1, q_per_kv_p, NUM_LANES] per-head sink or None
    alibi_ref=None,  # VMEM [1, q_per_kv_p, NUM_LANES] per-head slope or None
    m_out_ref=None,  # [1, 1, q_per_kv_p, 128] softmax state out (merging)
    l_out_ref=None,
    ring_k_ref=None,  # VMEM [1, 1, ring_window, head_dim] exact recent K
    ring_v_ref=None,
    ring_window: Optional[int] = None,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    i = pl.program_id(2)
    num_blocks = pl.num_programs(2)
    bk = pages_per_block * page_size
    # Per-side quantization (the k8v4 mixed tier stores K at int8 and V
    # at int4: generation quality tracks K precision much harder than
    # V's — BENCHLOG 2026-08-21 scheme sims — so the mixed cache spends
    # its bytes where they matter).
    k_q = kv_quant
    v_q = v_quant if v_quant is not None else kv_quant

    def eff_len(idx):
        # Exact recent-window ring (engine/cache.py): the pages cover
        # only [0, L - W); the ring block (below) covers the rest in the
        # SAME online-softmax state. Clamped to >= 1 so every (b, h)
        # keeps >= 1 active page block — the pipeline walk's invariant.
        # When the whole context fits the ring, that one structural page
        # block is fully MASKED (ring_quant_len == 0 below): its DMA is
        # wasted but no quantized value leaks into the softmax.
        ln = lengths_ref[idx]
        if ring_window is None:
            return ln
        return jnp.maximum(ln - ring_window, 1)

    length = eff_len(b)
    true_length = lengths_ref[b]
    # True page/ring ownership boundary: pages own [0, ring_quant_len),
    # the ring owns [ring_quant_len, L).
    ring_quant_len = (
        None if ring_window is None
        else jnp.maximum(true_length - ring_window, 0)
    )
    num_active = pl.cdiv(length, bk)

    def first_block(ln):
        # Sliding window: the token at position ln-1 attends to positions
        # >= ln - window; blocks before that are neither fetched nor
        # computed (decode cost scales with the window, not the context).
        if window is None:
            return 0
        return jnp.maximum((ln - window) // bk, 0)

    first_active = first_block(length)

    quantized = kv_quant is not None

    scales_on = quantized and not skip_scale_dma

    def make_copy(pages, scales, buf, sbuf, sem, ssem, bb, hh, ii, slot,
                  group=False):
        return _MultiPageCopy(
            pages, scales if scales_on else None, buf,
            sbuf if scales_on else None, sem, ssem if scales_on else None,
            page_indices_ref, bb, hh, ii, slot,
            pages_per_block=pages_per_block, pages_per_seq=pages_per_seq,
            page_size=page_size,
            group_scales=group,
        )

    def next_block_indices(bb, hh, ii):
        """Next *active* (b, h, block) in grid order; sequences are
        guaranteed length >= 1 so every (b, h) has >= 1 active block.
        With a sliding window the walk starts at the sequence's first
        in-window block, not 0. Safe to chain past the last cell: the
        batch index grows monotonically past ``batch`` (clamp guards the
        lengths lookups), so ``nb < batch`` stays the validity test."""
        ln = eff_len(jnp.minimum(bb, batch - 1))
        na = pl.cdiv(ln, bk)
        ni = ii + 1
        roll_h = ni >= na
        nh = jnp.where(roll_h, hh + 1, hh)
        roll_b = nh >= num_kv_heads
        nh = jnp.where(roll_b, 0, nh)
        nb = jnp.where(roll_b, bb + 1, bb)
        # First block of the NEXT (b, h): same b unless rolling batch.
        nfirst = first_block(eff_len(jnp.minimum(nb, batch - 1)))
        ni = jnp.where(roll_h, nfirst, ni)
        return nb, nh, ni

    @pl.when(jnp.logical_and(i >= first_active, i < num_active))
    def _active():
        @pl.when(i == first_active)
        def _reset_state():
            m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
            l_scratch[...] = jnp.zeros_like(l_scratch)
            acc_scratch[...] = jnp.zeros_like(acc_scratch)

        # --- pipeline bookkeeping ---
        # The buffer-slot index cycles with the count of *active* grid
        # cells before this one (statelessly recomputed; active cells
        # rotate through the ``num_slots`` buffers, inactive cells are
        # skipped by the walk).
        def count_before(bb):
            def body(x, acc):
                lx = eff_len(x)
                per_head = pl.cdiv(lx, bk) - first_block(lx)
                return acc + jnp.where(x < bb, per_head * num_kv_heads, 0)

            return jax.lax.fori_loop(0, batch, body, 0)

        cells_before = (
            count_before(b)
            + h * (num_active - first_active)
            + (i - first_active)
        )
        slot = jax.lax.rem(cells_before, num_slots)

        def start_copies(bb, hh, ii, ss):
            make_copy(
                k_pages_hbm, k_scales_hbm, k_buf, k_scale_buf, k_sem,
                k_scale_sem, bb, hh, ii, ss, group=k_q == "int4g32",
            ).start()
            make_copy(
                v_pages_hbm, v_scales_hbm, v_buf, v_scale_buf, v_sem,
                v_scale_sem, bb, hh, ii, ss, group=v_q == "int4g32",
            ).start()

        @pl.when(cells_before == 0)
        def _prime_first():
            # Fill the pipeline: cells 0 .. num_slots-2 into slots 0..n-2
            # (each subsequent cell keeps the steady-state lookahead of
            # num_slots-1 cells).
            pb, ph, pi = b, h, i
            start_copies(pb, ph, pi, 0)
            for s in range(1, num_slots - 1):
                pb, ph, pi = next_block_indices(pb, ph, pi)
                sb, sh, si, ss = pb, ph, pi, s

                @pl.when(sb < batch)
                def _prime_s(sb=sb, sh=sh, si=si, ss=ss):
                    start_copies(sb, sh, si, ss)

        # --- prefetch the block num_slots-1 cells ahead ---
        nb, nh, ni = b, h, i
        for _ in range(num_slots - 1):
            nb, nh, ni = next_block_indices(nb, nh, ni)

        @pl.when(nb < batch)
        def _prefetch_next():
            next_slot = jax.lax.rem(cells_before + num_slots - 1, num_slots)
            start_copies(nb, nh, ni, next_slot)

        # --- wait K, compute scores ---
        make_copy(
            k_pages_hbm, k_scales_hbm, k_buf, k_scale_buf, k_sem,
            k_scale_sem, b, h, i, slot, group=k_q == "int4g32",
        ).wait()

        q = q_ref[0, 0].astype(jnp.float32) * sm_scale  # [q_per_kv, d]

        k_bitwise = (
            k_q == "int4" and int8_mxu and int4_bitwise_unpack
            and not skip_scale_mul
        )
        v_bitwise = (
            v_q == "int4" and int8_mxu and int4_bitwise_unpack
            and not skip_scale_mul
        )
        # Nibble planes without any i32 round trip: Mosaic legalizes
        # AND/XOR on i8 vectors but not shifts/adds (BENCHLOG
        # 2026-08-17), so the split-packed byte 16*hi + lo decomposes as
        #   lo + 8 = (byte & 0x0F) ^ 0x08   (exact, in [0, 15])
        #   16*hi  =  byte & 0xF0           (exact as signed i8)
        # with the +8 bias / x16 factor folded into rank-1 matmul
        # corrections and the per-token scales. MEASURED SLOWER than the
        # i32 unpack (0.84-0.89x, BENCHLOG 2026-08-19: the correction
        # chain and P-split relayout outweigh the converts saved) —
        # default-off, kept as the recorded third dead end for the int4
        # VPU unpack bound (VERDICT r1 item 5).
        half_rows = (page_size // 2) * pages_per_block if v_bitwise else 0

        def nibble_planes(raw):
            # raw: [ppb, ps/2, d] packed i8 -> (lo+8, 16*hi) planes,
            # each [ppb, ps/2, d] i8 (split layout: plane rows are the
            # page's token halves [0, ps/2) and [ps/2, ps)).
            lo = (raw & jnp.int8(0x0F)) ^ jnp.int8(0x08)
            hi = raw & jnp.int8(-16)  # 0xF0 as signed i8
            return lo, hi

        def lohi_col_mask(shape):
            # [*, bk] mask: True where the column's within-page token
            # index falls in the low-nibble half [0, ps/2).
            tok = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
            return (tok % page_size) < (page_size // 2)

        k_raw = k_buf[slot]  # [ppb, page_rows, head_dim]
        if k_q == "int4" and not k_bitwise:
            # Token-packed nibbles: [ppb, ps/2, d] -> [ppb, ps, d].
            k_raw = _unpack_int4_tokens(k_raw)

        # bf16 payloads feed the MXU natively (bf16xbf16 -> f32 accumulate
        # is exact for bf16 inputs): skipping the VPU int/float->f32
        # conversion is the whole point of the bf16 cache mode — decode is
        # convert-bound, not DMA-bound (BENCHLOG 2026-08-16). Other
        # payloads keep the f32 path with HIGHEST (true-f32 MXU passes) so
        # the kernel meets the exactness contract vs the oracle.
        native_bf16 = kv_quant is None and k_raw.dtype == jnp.bfloat16
        k_group = k_q == "int4g32"
        v_group = v_q == "int4g32"
        k_mxu = k_q in ("int8", "int4") and int8_mxu
        v_mxu = v_q in ("int8", "int4") and int8_mxu
        k_fp8_mxu = k_q == "fp8" and fp8_native
        v_fp8_mxu = v_q == "fp8" and fp8_native
        precision = jax.lax.Precision.HIGHEST
        if k_fp8_mxu:
            # v6e+ tier: e4m3 K pages feed the MXU directly; q rows are
            # renormalized into e4m3's range per row (rank-1 dequant, as
            # the int8-MXU path does with 127). The [bk, d] VPU
            # fp8->f32 dequant of the exact tier never happens.
            q_abs = jnp.max(jnp.abs(q), axis=1, keepdims=True)
            q_scale = jnp.where(q_abs == 0.0, 1.0, q_abs / 448.0)
            q8 = (q / q_scale).astype(jnp.float8_e4m3fn)
            s = jax.lax.dot_general(
                q8, k_raw.reshape(bk, head_dim),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * q_scale
        elif k_group:
            # int4g32 quality tier, affine dequant folded into the
            # SCORES (no K-tile dequant materialization, no transposes):
            # k_d = q4*s_g(token) + z_g(token) for d in group g, so
            #   s = sum_g [ (q_g . q4_g^T) * s_col_g + qsum_g * z_col_g ]
            # where s_col/z_col are [1, bk] tokens-in-lanes rows straight
            # from the page scale tiles ([2*ng, ps] per page) — the same
            # column-broadcast pattern as the symmetric tiers. Nibbles
            # are exact in bf16, so the partial dots ride the bf16 MXU.
            ng = int4g32_num_groups(head_dim)
            gw = head_dim // ng  # group width (32, or d for tiny dims)
            qr = q.shape[0]
            k4 = _unpack_uint4_tokens(k_raw)  # [ppb, ps, d] i32 [0,15]
            kbf = k4.reshape(bk, head_dim).astype(jnp.bfloat16)
            q_bf = q.astype(jnp.bfloat16)
            s_all = k_scale_buf[slot]  # [ppb, 2*ng, ps]
            # ONE full-width MXU call for all ng group partials: stack
            # lane-masked q copies (rows g*qr..(g+1)*qr see only group
            # g's 32 lanes), dot against the full K tile, then apply the
            # per-group column scales to the row bands. 4x the (tiny,
            # M=8-row) FLOPs for 1/4 the MXU dispatches — decode here is
            # op-overhead-bound, not FLOP-bound.
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (ng, 1, head_dim), 2
            ) // gw
            grp = jax.lax.broadcasted_iota(jnp.int32, (ng, 1, 1), 0)
            q_stack = jnp.where(
                lane == grp, q_bf[None], jnp.bfloat16(0)
            ).reshape(ng * qr, head_dim)
            p_all = jax.lax.dot_general(
                q_stack, kbf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(ng, qr, bk)
            s = jnp.zeros((qr, bk), jnp.float32)
            for g in range(ng):
                s_col = s_all[:, g, :].reshape(1, bk)
                z_col = s_all[:, ng + g, :].reshape(1, bk)
                qsum_g = jnp.sum(
                    q[:, g * gw:(g + 1) * gw], axis=1, keepdims=True
                )
                s = s + p_all[g] * s_col + qsum_g * z_col
        elif k_mxu:
            # int8 MXU scores: quantize the (tiny) q rows in-kernel and
            # dot int8 x int8 -> int32, then rank-1 dequant — the [bk, d]
            # VPU int->f32 conversion (the measured int8-decode bottleneck,
            # BENCHLOG 2026-08-16) never happens; only the [q, bk] result
            # converts. sm_scale is already folded into q, so q_scale
            # carries it through the dequant.
            q_abs = jnp.max(jnp.abs(q), axis=1, keepdims=True)
            q_scale = jnp.where(q_abs == 0.0, 1.0, q_abs / 127.0)
            q8 = jnp.clip(
                jnp.round(q / q_scale), -127, 127
            ).astype(jnp.int8)
            if k_bitwise:
                # One bk-wide matmul on the biased nibble planes; the +8
                # lo bias cancels against 8 * rowsum(q8) (exact int math,
                # bitwise-identical scores to the unpack path) and the
                # hi x16 cancels in the column scales below.
                k_lo, k_hi = nibble_planes(k_raw)
                k8 = jnp.concatenate([k_lo, k_hi], axis=-2).reshape(
                    bk, head_dim
                )
                rsum_q = jnp.sum(
                    q8.astype(jnp.int32), axis=1, keepdims=True
                ).astype(jnp.float32)
                s_i = jax.lax.dot_general(
                    q8, k8, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                is_lo = lohi_col_mask(s_i.shape).astype(jnp.float32)
                s = (s_i - 8.0 * rsum_q * is_lo) * q_scale
            else:
                k8 = k_raw.reshape(bk, head_dim)
                if k8.dtype != jnp.int8:
                    k8 = k8.astype(jnp.int8)  # int4: unpacked int32 vals
                s = jax.lax.dot_general(
                    q8, k8, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * q_scale
        else:
            if native_bf16:
                k_f = k_raw.reshape(bk, head_dim)
                q_op = q.astype(jnp.bfloat16)
                precision = jax.lax.Precision.DEFAULT
            else:
                k_f = k_raw.reshape(bk, head_dim).astype(jnp.float32)
                q_op = q
            s = jax.lax.dot_general(
                q_op, k_f, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=precision,
            )  # [q_per_kv, bk]
        if k_q is not None and not k_group and not skip_scale_mul:
            kscale = k_scale_buf[slot]  # [1, bk] column scales
            if k_bitwise:
                # Hi-nibble columns carry 16x values; 1/16 is a power of
                # two, so scale/16 rounds identically to dividing the
                # score — bitwise-equal to the unpack path.
                kscale = kscale * jnp.where(
                    lohi_col_mask(kscale.shape), 1.0, 1.0 / 16.0
                )
            s = s * kscale
        if softcap is not None:
            s = softcap * jnp.tanh(s * (1.0 / softcap))

        # Mask positions beyond the sequence length (and, with a sliding
        # window, before the window's first attended position). With a
        # recent ring, the pages' ownership ends at ring_quant_len.
        pos = i * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        valid = pos < (length if ring_window is None else ring_quant_len)
        if window is not None:
            valid = jnp.logical_and(valid, pos >= length - window)
        if alibi_ref is not None:
            # ALiBi: the decoding token sits at position length-1; each
            # row is one q head of this KV-head group (per-row slope).
            s = s + alibi_ref[0][:, :1] * (
                pos - (length - 1)
            ).astype(jnp.float32)
        s = jnp.where(valid, s, DEFAULT_MASK_VALUE)

        # --- online softmax update ---
        m_prev = m_scratch[...]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_scratch[...] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_scratch[...] = m_next

        # --- wait V, accumulate output ---
        make_copy(
            v_pages_hbm, v_scales_hbm, v_buf, v_scale_buf, v_sem,
            v_scale_sem, b, h, i, slot, group=v_q == "int4g32",
        ).wait()

        v_raw = v_buf[slot]
        if v_q == "int4" and not v_bitwise:
            v_raw = _unpack_int4_tokens(v_raw)
        if v_fp8_mxu:
            # PV on the fp8 MXU: renormalize each (p * v_scale) row into
            # e4m3's range; the e4m3 V payload is the matmul operand.
            pv_f = p * v_scale_buf[slot]
            c = jnp.max(pv_f, axis=1, keepdims=True)
            c = jnp.where(c == 0.0, 1.0, c / 448.0)
            p8 = (pv_f / c).astype(jnp.float8_e4m3fn)
            out = jax.lax.dot(
                p8, v_raw.reshape(bk, head_dim),
                preferred_element_type=jnp.float32,
            ) * c
            acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + out
        elif v_group:
            # PV with the affine fold on P's columns, per channel group:
            #   o[:, g] = (p * s_col_g) . v4[:, g] + (p . z_col_g) * 1_g
            # — the scale-fold the symmetric tiers do, plus a rank-1
            # zero-point correction per group.
            ng = int4g32_num_groups(head_dim)
            gw = head_dim // ng
            qr = p.shape[0]
            v4 = _unpack_uint4_tokens(v_raw)  # [ppb, ps, d]
            vbf = v4.reshape(bk, head_dim).astype(jnp.bfloat16)
            sv_all = v_scale_buf[slot]  # [ppb, 2*ng, ps]
            # Stacked PV mirror of the scores path: rows g*qr..(g+1)*qr
            # carry p folded with group g's column scales; one full-width
            # dot, then each band contributes only its group's 32 lanes.
            p_stack = jnp.concatenate(
                [
                    (p * sv_all[:, g, :].reshape(1, bk)).astype(
                        jnp.bfloat16
                    )
                    for g in range(ng)
                ],
                axis=0,
            )  # [ng*qr, bk]
            o_all = jax.lax.dot(
                p_stack, vbf, preferred_element_type=jnp.float32
            ).reshape(ng, qr, head_dim)
            parts = []
            for g in range(ng):
                zg = jnp.sum(
                    p * sv_all[:, ng + g, :].reshape(1, bk),
                    axis=1, keepdims=True,
                )
                parts.append(o_all[g, :, g * gw:(g + 1) * gw] + zg)
            out = jnp.concatenate(parts, axis=-1)
            acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + out
        elif v_mxu and v_bitwise:
            # PV without unpacking: one half-width matmul per nibble
            # plane. P's columns split per page into the (lo, hi) token
            # halves; each half is scale-folded and quantized separately
            # (so the hi half's x16 payload costs no P-quantization
            # bits), the lo half's +8 bias cancels against
            # 8 * rowsum(p8_lo), and the hi product is rescaled by the
            # exact power-of-two 1/16 at the end.
            rows = p.shape[0]
            v_lo, v_hi = nibble_planes(v_buf[slot])
            v_lo = v_lo.reshape(half_rows, head_dim)
            v_hi = v_hi.reshape(half_rows, head_dim)
            pv = p * v_scale_buf[slot]
            pv3 = pv.reshape(rows, pages_per_block, page_size)
            p_lo = pv3[:, :, : page_size // 2].reshape(rows, half_rows)
            p_hi = pv3[:, :, page_size // 2 :].reshape(rows, half_rows)

            def quant_p(ph):
                a = jnp.max(ph, axis=1, keepdims=True)
                sc = jnp.where(a == 0.0, 1.0, a / 127.0)
                return jnp.clip(
                    jnp.round(ph / sc), 0, 127
                ).astype(jnp.int8), sc

            p8_lo, sc_lo = quant_p(p_lo)
            p8_hi, sc_hi = quant_p(p_hi)
            corr = 8 * jnp.sum(
                p8_lo.astype(jnp.int32), axis=1, keepdims=True
            )
            out = (
                jax.lax.dot(p8_lo, v_lo, preferred_element_type=jnp.int32)
                - corr
            ).astype(jnp.float32) * sc_lo + jax.lax.dot(
                p8_hi, v_hi, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * (sc_hi * (1.0 / 16.0))
            acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + out
        elif v_mxu:
            # PV on the int8 MXU: fold the per-token V scales into P's
            # columns (as the f32 path does), quantize the P rows, dot
            # int8, rank-1 dequant. P >= 0 so the int8 range is one-sided.
            v8 = v_raw.reshape(bk, head_dim)
            if v8.dtype != jnp.int8:
                v8 = v8.astype(jnp.int8)
            pv = p * v_scale_buf[slot] if not skip_scale_mul else p
            p_abs = jnp.max(pv, axis=1, keepdims=True)
            p_scale = jnp.where(p_abs == 0.0, 1.0, p_abs / 127.0)
            p8 = jnp.clip(
                jnp.round(pv / p_scale), 0, 127
            ).astype(jnp.int8)
            out = jax.lax.dot(
                p8, v8, preferred_element_type=jnp.int32
            ).astype(jnp.float32) * p_scale
            acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + out
        else:
            if native_bf16:
                v_f = v_raw.reshape(bk, head_dim)
                p_op = p.astype(jnp.bfloat16)
            else:
                v_f = v_raw.reshape(bk, head_dim).astype(jnp.float32)
                p_op = p
            if v_q is not None and not skip_scale_mul:
                p_op = p_op * v_scale_buf[slot]  # fold V scales into P
            acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + (
                jax.lax.dot(
                    p_op, v_f, preferred_element_type=jnp.float32,
                    precision=precision,
                )
            )

        if ring_k_ref is not None:
            # Exact recent-window ring block: the last ring_window tokens
            # (bf16, unquantized — engine/cache.py dual-writes them) join
            # the SAME online-softmax state as a final W-wide block.
            # Ring row j holds position p_j = (L-1) - ((L-1-j) % W);
            # rows already covered by the pages ([0, eff_len)) and
            # never-written rows (p_j < 0 folds into p_j < eff_len since
            # eff_len >= 1) are masked.
            @pl.when(i == num_active - 1)
            def _ring_block():
                rk = ring_k_ref[0, 0]  # [W, d]
                rv = ring_v_ref[0, 0]
                s_r = jax.lax.dot_general(
                    q.astype(rk.dtype), rk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )  # [q_per_kv_p, W]
                if softcap is not None:
                    s_r = softcap * jnp.tanh(s_r * (1.0 / softcap))
                j = jax.lax.broadcasted_iota(jnp.int32, s_r.shape, 1)
                last = true_length - 1
                # lax.rem keeps the dividend's sign: for j > last (rows a
                # short sequence never wrote) p_j comes out as j itself,
                # ABOVE last — masked by the upper bound below. Lanes
                # j >= ring_window are launcher padding (rings smaller
                # than the 128-lane tile) and alias real residues, so
                # they are masked unconditionally.
                p_j = last - jax.lax.rem(last - j, ring_window)
                if alibi_ref is not None:
                    s_r = s_r + alibi_ref[0][:, :1] * (
                        p_j - last
                    ).astype(jnp.float32)
                valid_r = jnp.logical_and(
                    p_j >= ring_quant_len, p_j <= last
                )
                if ring_k_ref.shape[2] != ring_window:
                    valid_r = jnp.logical_and(valid_r, j < ring_window)
                s_r = jnp.where(valid_r, s_r, DEFAULT_MASK_VALUE)
                m_prev = m_scratch[...]
                l_prev = l_scratch[...]
                m_curr = jnp.max(s_r, axis=1, keepdims=True)
                m_next = jnp.maximum(m_prev, m_curr)
                alpha = jnp.exp(m_prev - m_next)
                p_r = jnp.exp(s_r - m_next[:, :1])
                l_scratch[...] = l_prev * alpha + jnp.sum(
                    p_r, axis=1, keepdims=True
                )
                m_scratch[...] = m_next
                pv_r = jax.lax.dot(
                    p_r.astype(rv.dtype), rv,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT,
                )
                acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + pv_r

        @pl.when(i == num_active - 1)
        def _epilogue():
            if m_out_ref is not None:
                # State out for an external softmax merge (recent-window
                # tail): o normalized as usual, plus (m, l). Sinks are the
                # caller's job at the merge (launcher enforces sinks=None).
                m_out_ref[0, 0] = m_scratch[...]
                l_out_ref[0, 0] = l_scratch[...]
            if sink_ref is None:
                l = l_scratch[:, :1]
                l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
                o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)
            else:
                # Attention sink (shared epilogue math: ops/flash/forward).
                from tpu_flash.ops.flash.forward import sink_denominator

                scale_m, l_tot, _ = sink_denominator(
                    m_scratch[...], l_scratch[...],
                    sink_ref[0],  # [q_per_kv_p, NUM_LANES] per-row logits
                )
                o_ref[0, 0] = (
                    acc_scratch[...] * (scale_m[:, :1] / l_tot[:, :1])
                ).astype(o_ref.dtype)


def paged_attention(
    q: jax.Array,  # [batch, num_q_heads, head_dim]
    k_pages,  # jax.Array or QuantizedTensor
    v_pages,
    lengths: jax.Array,  # [batch] int32, all >= 1
    page_indices: jax.Array,  # [batch, pages_per_seq] int32
    *,
    sm_scale: Optional[float] = None,
    pages_per_compute_block: Optional[int] = None,
    interpret: Optional[bool] = None,
    int8_mxu: bool = True,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,
    alibi: Optional[jax.Array] = None,  # [num_q_heads] ALiBi slopes
    pipeline_slots: Optional[int] = None,
    int4_bitwise_unpack: bool = False,
    fp8_native: Optional[bool] = None,
    return_state: bool = False,
    recent_k: Optional[jax.Array] = None,  # [batch, hkv, W, d] exact ring
    recent_v: Optional[jax.Array] = None,
    _debug_skip_scale_dma: bool = False,  # perf diagnostics; WRONG numerics
    _debug_skip_dequant_mul: bool = False,
):
    """Single-token GQA decode attention over a paged (optionally quantized)
    KV cache.

    Args:
      q: [batch, num_q_heads, head_dim] current-token queries.
      k_pages / v_pages: dense [num_kv_heads, num_pages, page_size, head_dim]
        arrays, or ``QuantizedTensor`` with int8 / packed-int4 payloads and
        per-token scales.
      lengths: valid context length per sequence (>= 1).
      page_indices: page table; entry [b, j] is the physical page holding
        tokens [j*page_size, (j+1)*page_size) of sequence b.
      int8_mxu: quantized payloads only — run QK^T and PV on the int8 MXU
        (q and P rows quantized in-kernel, rank-1 dequant), skipping the
        [bk, d] VPU int->f32 converts that bound int8 decode (2.6x tok/s,
        BENCHLOG 2026-08-17; default ON). Adds ~0.4% relative q/P rounding
        error on top of the KV quantization error; pass False for the
        exact fused-dequant path.
      pages_per_compute_block: pages per kernel block (block kv size =
        pages_per_compute_block * page_size). Default (None) adapts to the
        cache: ~4096 tokens per block for quantized pages / ~2048 for fp —
        measured optima on v5e, where the per-grid-cell fixed cost dominates
        small blocks (BENCHLOG.md). Every page id in a block must be a valid
        page (pad short sequences' tables with a trash page, as the engine
        does); sequences much shorter than the block waste page reads —
        pass a smaller explicit value if your workload is short-context.
      window: sliding-window size — the current token attends only to the
        last ``window`` cache positions. KV blocks entirely before the
        window are neither fetched nor computed, so decode cost scales
        with the window rather than the context length.
      softcap: tanh logit soft-capping (Gemma-2 convention), applied to
        fully-dequantized scores before masking.
      sinks: [num_q_heads] per-head attention-sink logits (StreamingLLM /
        gpt-oss): each head's softmax denominator gains ``exp(sinks[h])``.
      pipeline_slots: page-pipeline depth (2 = classic double buffering,
        the reference's 2-stage ``cuda::pipeline``, FlashAttention.cuh:
        68-75; N adds N-2 more in-flight blocks of DMA lookahead at
        (N/2)x the KV VMEM buffers). Default (None) adapts to the
        measured v5e optima (BENCHLOG 2026-08-19 A/B): 3 for bf16
        payloads (bandwidth-saturated; ~5% faster than 2) and 2 for
        quantized/f32 (deeper pipelines measured neutral-to-slower).
      int4_bitwise_unpack: route int4 nibble extraction through i8
        AND/XOR planes with matmul-folded corrections instead of the
        i32 unpack. Measured 0.84-0.89x on v5e (the corrections and P
        relayouts cost more than the converts saved — BENCHLOG
        2026-08-19); kept as the recorded third dead end, default off.
      fp8_native: fp8 pages only — feed e4m3 payloads to the MXU
        directly (rank-1 renormalized q/P rows) instead of the exact
        f32-dequant tier. Default (None) probes the device: on for
        v6e+ (native fp8 MXU), off for v5e/CPU.

    ``recent_k``/``recent_v`` ([batch, num_kv_heads, W, head_dim], W a
    multiple of 128): the engine's exact recent-window ring
    (engine/cache.py) — token at position p lives at ring row p % W.
    The kernel then attends pages only for [0, max(L - W, 1)) and the
    ring for the rest as a final in-state block (ONE dispatch, no
    external merge; sinks/softcap/alibi compose normally). Incompatible
    with ``window`` and ``return_state``.

    Returns:
      [batch, num_q_heads, head_dim] attention output in q.dtype; with
      ``return_state=True``, a tuple ``(o, m, l)`` with m/l
      [batch, num_q_heads] f32 — the online-softmax state for an external
      merge (the recent-window exact tail). ``return_state`` requires
      ``sinks=None``: the sink logit must be folded exactly once, at the
      caller's final merge.
    """
    ring_true_w = None
    if recent_k is not None:
        if window is not None:
            raise ValueError("recent_k is incompatible with window")
        if return_state:
            raise ValueError("recent_k is incompatible with return_state")
        if recent_k.shape != recent_v.shape:
            raise ValueError(
                f"recent rings must match; got {recent_k.shape} / "
                f"{recent_v.shape}"
            )
        ring_true_w = recent_k.shape[2]
        pad_w = -ring_true_w % 128  # lane-align the scores tile
        if pad_w:
            recent_k = jnp.pad(
                recent_k, ((0, 0), (0, 0), (0, pad_w), (0, 0))
            )
            recent_v = jnp.pad(
                recent_v, ((0, 0), (0, 0), (0, pad_w), (0, 0))
            )
    if return_state and sinks is not None:
        raise ValueError(
            "return_state=True requires sinks=None (fold the sink at the "
            "external merge)"
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if fp8_native is None:
        # fp8 pages ride the MXU natively on v6e+; earlier generations
        # (and CPU interpret) take the exact f32-dequant tier.
        from tpu_flash.utils.device import device_info

        fp8_native = (
            isinstance(k_pages, QuantizedTensor)
            and k_pages.dtype_name == "fp8"
            and device_info().native_fp8_matmul
        )
    if window is not None and window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if softcap is not None and softcap <= 0:
        raise ValueError(f"softcap must be > 0, got {softcap}")

    kv_quant = v_quant = None
    k_scales = v_scales = None
    if isinstance(k_pages, QuantizedTensor) != isinstance(
        v_pages, QuantizedTensor
    ):
        raise ValueError(
            "K and V pages must both be quantized or both dense "
            "(mixed tiers use two quantized dtypes, e.g. k8v4)"
        )
    if isinstance(k_pages, QuantizedTensor):
        kv_quant = k_pages.dtype_name
        v_quant = v_pages.dtype_name
        allowed = ("int8", "int4", "int4g32", "fp8")
        if kv_quant not in allowed or v_quant not in allowed:
            raise ValueError(
                f"unsupported KV quant {kv_quant!r}/{v_quant!r}"
            )
        for qt in (k_pages, v_pages):
            if qt.dtype_name in ("int4", "int4g32") and (
                qt.packing != "tokens"
            ):
                raise ValueError(
                    "int4 KV pages must be token-packed (quantize_pages);"
                    " lane packing breaks TPU DMA alignment"
                )
        k_vals, k_scales = k_pages.values, k_pages.scales
        v_vals, v_scales = v_pages.values, v_pages.scales

        def _prep_scales(scales, dtype_name):
            if dtype_name == "int4g32":
                # Group-affine scales keep their [hkv, np, 2*ng, ps]
                # layout (tokens in LANES): per-page [2*ng, ps] slices
                # are lane-aligned like the symmetric tiers' flat rows,
                # and the kernel reads [1, bk] column vectors per group.
                return scales
            # [hkv, np, ps, 1] -> [hkv, np, 1, ps]: page dim becomes an
            # untiled batch dim so per-page DMA slices are alignment-free
            # at any ps.
            return scales.squeeze(-1)[:, :, None, :]

        k_scales = _prep_scales(k_scales, kv_quant)
        v_scales = _prep_scales(v_scales, v_quant)
    else:
        k_vals, v_vals = k_pages, v_pages

    batch, num_q_heads, head_dim = q.shape
    num_kv_heads, num_pages, page_rows, payload_d = k_vals.shape
    v_page_rows, v_payload_d = v_vals.shape[2], v_vals.shape[3]
    # Logical tokens per page (int4 token-packs two per payload row).
    page_size = (
        page_rows * 2 if kv_quant in ("int4", "int4g32") else page_rows
    )
    v_page_size = (
        v_page_rows * 2 if v_quant in ("int4", "int4g32") else v_page_rows
    )
    if v_page_size != page_size:
        raise ValueError(
            f"K and V pages disagree on tokens/page: {page_size} vs "
            f"{v_page_size}"
        )
    pages_per_seq = page_indices.shape[1]
    if num_q_heads % num_kv_heads:
        raise ValueError(
            f"num_q_heads ({num_q_heads}) must be a multiple of "
            f"num_kv_heads ({num_kv_heads})"
        )
    q_per_kv = num_q_heads // num_kv_heads
    # Pad the per-group query rows to the f32 sublane minimum (8) so the
    # VMEM state tiles are hardware-shaped; pad rows are sliced off after.
    q_per_kv_p = (q_per_kv + 7) // 8 * 8
    if pages_per_compute_block is None:
        # Measured v5e optima: larger blocks amortize the per-cell fixed
        # cost; small payloads (quantized 4x, bf16 2x) want 2x the tokens.
        # fp32 stays at 2048 — 4096-token f32 double buffers exceed VMEM.
        small_payload = kv_quant or k_vals.dtype == jnp.bfloat16
        target_tokens = 4096 if small_payload else 2048
        ppb = max(1, min(target_tokens // page_size, pages_per_seq))
        while pages_per_seq % ppb:
            ppb -= 1
    else:
        ppb = min(pages_per_compute_block, pages_per_seq)
    if pages_per_seq % ppb:
        raise ValueError(
            f"pages_per_seq ({pages_per_seq}) must be a multiple of "
            f"pages_per_compute_block ({ppb})"
        )
    num_blocks = pages_per_seq // ppb
    bk = ppb * page_size
    if pipeline_slots is None:
        # Measured v5e optima (BENCHLOG 2026-08-19): bf16 decode gains
        # ~5% from one extra lookahead block; quantized/f32 do not.
        ns = 3 if (kv_quant is None and k_vals.dtype == jnp.bfloat16) else 2
    else:
        ns = int(pipeline_slots)
    if ns < 2:
        raise ValueError(f"pipeline_slots must be >= 2, got {pipeline_slots}")

    q4 = q.reshape(batch, num_kv_heads, q_per_kv, head_dim)
    if q_per_kv_p != q_per_kv:
        q4 = jnp.pad(
            q4, ((0, 0), (0, 0), (0, q_per_kv_p - q_per_kv), (0, 0))
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, num_kv_heads, num_blocks),
        in_specs=[
            # Index maps receive the scalar-prefetch refs after the grid
            # indices; they are unused here.
            pl.BlockSpec(
                (1, 1, q_per_kv_p, head_dim),
                lambda b, h, i, *_: (b, h, 0, 0),
            ),
            pl.BlockSpec(memory_space=pl.ANY),  # k pages
            pl.BlockSpec(memory_space=pl.ANY),  # k scales
            pl.BlockSpec(memory_space=pl.ANY),  # v pages
            pl.BlockSpec(memory_space=pl.ANY),  # v scales
        ]
        + (
            [
                pl.BlockSpec(
                    (1, q_per_kv_p, 128), lambda b, h, i, *_: (h, 0, 0)
                )
            ]
            if sinks is not None
            else []
        )
        + (
            [
                pl.BlockSpec(
                    (1, q_per_kv_p, 128), lambda b, h, i, *_: (h, 0, 0)
                )
            ]
            if alibi is not None
            else []
        )
        + (
            [
                # Block index constant across i: Pallas elides refetches,
                # so the ring crosses HBM once per (b, h).
                pl.BlockSpec(
                    (1, 1, recent_k.shape[2], head_dim),
                    lambda b, h, i, *_: (b, h, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, recent_k.shape[2], head_dim),
                    lambda b, h, i, *_: (b, h, 0, 0),
                ),
            ]
            if recent_k is not None
            else []
        ),
        out_specs=(
            pl.BlockSpec(
                (1, 1, q_per_kv_p, head_dim),
                lambda b, h, i, *_: (b, h, 0, 0),
            )
            if not return_state
            else [
                pl.BlockSpec(
                    (1, 1, q_per_kv_p, head_dim),
                    lambda b, h, i, *_: (b, h, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, q_per_kv_p, 128),
                    lambda b, h, i, *_: (b, h, 0, 0),
                ),
                pl.BlockSpec(
                    (1, 1, q_per_kv_p, 128),
                    lambda b, h, i, *_: (b, h, 0, 0),
                ),
            ]
        ),
        scratch_shapes=[
            pltpu.VMEM((q_per_kv_p, 128), jnp.float32),  # m
            pltpu.VMEM((q_per_kv_p, 128), jnp.float32),  # l
            pltpu.VMEM((q_per_kv_p, head_dim), jnp.float32),  # acc
            pltpu.VMEM((ns, ppb, page_rows, payload_d), k_vals.dtype),
            # Scale buffers: flat [1, bk] column scales per block, except
            # the int4g32 group-affine tier's [ppb, 2*ng, ps] tiles
            # (group rows in sublanes, tokens in lanes).
            pltpu.VMEM(
                (ns, ppb, 2 * int4g32_num_groups(head_dim), page_size)
                if kv_quant == "int4g32" else (ns, 1, bk),
                jnp.float32,
            ),
            pltpu.VMEM((ns, ppb, v_page_rows, v_payload_d), v_vals.dtype),
            pltpu.VMEM(
                (ns, ppb, 2 * int4g32_num_groups(head_dim), page_size)
                if v_quant == "int4g32" else (ns, 1, bk),
                jnp.float32,
            ),
            pltpu.SemaphoreType.DMA((ns,)),
            pltpu.SemaphoreType.DMA((ns,)),
            pltpu.SemaphoreType.DMA((ns,)),
            pltpu.SemaphoreType.DMA((ns,)),
        ],
    )

    kernel = functools.partial(
        _paged_attn_kernel,
        batch=batch,
        num_kv_heads=num_kv_heads,
        pages_per_block=ppb,
        pages_per_seq=pages_per_seq,
        page_size=page_size,
        head_dim=head_dim,
        sm_scale=float(sm_scale if sm_scale is not None else head_dim**-0.5),
        kv_quant=kv_quant,
        v_quant=v_quant,
        int8_mxu=int8_mxu,
        skip_scale_dma=_debug_skip_scale_dma,
        skip_scale_mul=_debug_skip_dequant_mul,
        window=int(window) if window is not None else None,
        softcap=float(softcap) if softcap is not None else None,
        num_slots=ns,
        int4_bitwise_unpack=int4_bitwise_unpack,
        fp8_native=bool(fp8_native),
    )

    if kv_quant is None:
        # Dummy 1-element scale arrays keep the argument arity fixed.
        k_scales = jnp.zeros((1, 1, 1), jnp.float32)
        v_scales = jnp.zeros((1, 1, 1), jnp.float32)

    def _per_row_lanes(vals):
        # Per-row (q head within the KV-head group) values, lane-
        # replicated: [hkv, q_per_kv_p, 128].
        a2 = vals.astype(jnp.float32).reshape(num_kv_heads, q_per_kv)
        if q_per_kv_p != q_per_kv:
            a2 = jnp.pad(a2, ((0, 0), (0, q_per_kv_p - q_per_kv)))
        return jnp.broadcast_to(
            a2[..., None], (num_kv_heads, q_per_kv_p, 128)
        )

    call_args = (lengths, page_indices, q4, k_vals, k_scales, v_vals,
                 v_scales)
    have_sink, have_alibi = sinks is not None, alibi is not None
    have_ring = recent_k is not None
    if have_sink:
        call_args = call_args + (_per_row_lanes(sinks),)
    if have_alibi:
        call_args = call_args + (_per_row_lanes(alibi),)
    if have_ring:
        call_args = call_args + (recent_k, recent_v)
    if have_sink or have_alibi or return_state or have_ring:
        base_kernel = kernel

        def kernel(lengths_r, pidx_r, q_r, kv_r, ks_r, vv_r, vs_r, *rest):
            it = iter(rest)
            sink_in = next(it) if have_sink else None
            alibi_in = next(it) if have_alibi else None
            rk_in = next(it) if have_ring else None
            rv_in = next(it) if have_ring else None
            o_r = next(it)
            m_r = next(it) if return_state else None
            l_r = next(it) if return_state else None
            return base_kernel(
                lengths_r, pidx_r, q_r, kv_r, ks_r, vv_r, vs_r, o_r,
                *list(it), sink_ref=sink_in, alibi_ref=alibi_in,
                m_out_ref=m_r, l_out_ref=l_r,
                ring_k_ref=rk_in, ring_v_ref=rv_in,
                ring_window=ring_true_w,
            )

    out_shape = jax.ShapeDtypeStruct(q4.shape, q.dtype)
    if return_state:
        state_shape = jax.ShapeDtypeStruct(
            (batch, num_kv_heads, q_per_kv_p, 128), jnp.float32
        )
        out_shape = [out_shape, state_shape, state_shape]

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*call_args)

    if return_state:
        out, m, l = out
        o = out[:, :, :q_per_kv, :].reshape(batch, num_q_heads, head_dim)
        m = m[:, :, :q_per_kv, 0].reshape(batch, num_q_heads)
        l = l[:, :, :q_per_kv, 0].reshape(batch, num_q_heads)
        return o, m, l
    out = out[:, :, :q_per_kv, :]
    return out.reshape(batch, num_q_heads, head_dim)
