"""Prefill attention directly over the paged KV cache.

A prefill chunk's queries attend [its sequence's cached history | the
chunk itself]. The engine's original path materialized the history densely
per layer per chunk (XLA gather: read pages -> write dense -> the flash
kernel reads the dense copy = 3x the history bytes); this kernel reads
each history page exactly ONCE, streaming pages HBM->VMEM with explicit
``pltpu.make_async_copy`` DMAs (the decode kernel's page pipeline,
ops/decode/paged.py, generalized to block_q>1 queries) and taking the
chunk's own K/V as a dense input. Per-row dynamic history lengths ride in
as scalar prefetch, so one program serves same-stage AND mixed-stage
(ragged) chunk batches; history blocks that a row doesn't need are
neither fetched (the DMA is inside the predicate) nor computed.

Two structural choices match the decode kernel (measured on v5e — the
per-q-head variant lost to gather-to-dense 833 vs 630 us/chunk at 8K
history, BENCHLOG 2026-08-17):

* **GQA folding** — the row grid is (batch x KV heads); all ``q_per_kv``
  query heads of a KV head stack into one [q_per_kv * block_q, d] tile,
  so a history page crosses HBM once per KV head, not once per Q head
  (4x traffic on Llama GQA), and the MXU sees 4x-taller matmuls.
* **Cross-block double buffering** — each history block's DMA is issued
  one block ahead into the alternate buffer slot (the decode kernel's
  stateless slot-parity scheme), overlapping page streaming with the
  previous block's compute instead of start->wait serialization.

This closes SURVEY.md §7 "hard part #2" (paged gather on TPU) for the
prefill path: the reference streams dense K/V tiles with loader warps
(loaders.cuh:114-203); here the streamed tiles are dynamically-indexed
quantized cache pages.

Toolchain constraints honored (BENCHLOG 2026-08-17): 3-D grid with
(batch, kv-head) fused, pure-lookup index maps, all-"arbitrary" dimension
semantics (prefetched-scalar-dependent masking + "parallel" semantics
sends the Mosaic compile into a >10 min slow path).

**Window-aware DMA walk.** With ``window`` set, each (row, chunk-block)
group only needs history blocks [first, last) where ``first`` covers the
oldest in-window position of the group's oldest query — so the kv grid
dimension indexes into that per-group window (``abk = first + kv_idx``)
and the static history grid shrinks to ``ceil((window-1)/bk) + 2``
blocks: below-window pages are neither streamed nor visited. The walk
bookkeeping (DMA-cell ordinal for slot parity, next-cell lookahead for
the double-buffer prefetch) is precomputed OUTSIDE the kernel as cheap
vectorized jnp over the dynamic ``q_offsets`` and rides in as scalar
prefetch — no per-cell fori_loop scans in the kernel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.core.reference import DEFAULT_MASK_VALUE
from tpu_flash.ops.decode.paged import _MultiPageCopy
from tpu_flash.ops.quant.quantize import QuantizedTensor, _unpack_int4_tokens

NUM_LANES = 128
TRANS_B_DIM_NUMBERS = (((1,), (1,)), ((), ()))


def _paged_prefill_kernel(
    # scalar prefetch
    offs_ref,  # [BKV] per-row history length
    bmap_ref,  # [BKV] batch index of the row
    khead_ref,  # [BKV] kv-head index within the pages array
    tables_ref,  # [B, pages_per_seq] page table
    cmap_ref,  # [n_kv_steps] chunk-walk map (consumed by index maps only)
    first_ref,  # [BKV * ncb] first needed history block per group
    nblk_ref,  # [BKV * ncb] active history block count per group
    cum_ref,  # [BKV * ncb] exclusive cumsum of nblk (DMA-cell ordinal)
    next_ref,  # [BKV * ncb] next group with nblk > 0 (sentinel = G)
    # inputs
    q_ref,  # [1, q_per_kv * block_q, d] stacked per-head chunk-block tiles
    ck_ref,  # [1, block_q, d] chunk K tile
    cv_ref,  # [1, block_q, d] chunk V tile
    k_pages_hbm,  # ANY [hkv, num_pages, page_rows, payload_d]
    k_scales_hbm,  # ANY [hkv, num_pages, 1, page_size] or None
    v_pages_hbm,  # ANY
    v_scales_hbm,  # ANY or None
    # outputs
    o_ref,  # [1, q_per_kv * block_q, d]
    # scratch
    m_scratch,
    l_scratch,
    acc_scratch,
    k_buf,  # VMEM [2, ppb, page_rows, payload_d]
    k_scale_buf,  # VMEM [2, 1, bk_hist] or None
    v_buf,
    v_scale_buf,
    k_sem,
    k_scale_sem,
    v_sem,
    v_scale_sem,
    *,
    sm_scale: float,
    kv_quant: Optional[str],
    q_per_kv: int,
    pages_per_block: int,
    pages_per_seq: int,
    page_size: int,
    num_hist_blocks: int,
    num_chunk_blocks: int,
    scales_on: bool,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sink_ref=None,  # [1, q_per_kv, NUM_LANES] per-head sink logits or None
    alibi_ref=None,  # [1, q_per_kv, NUM_LANES] per-head ALiBi slopes or None
):
    rows = q_ref.shape[1]  # q_per_kv * block_q
    block_q = rows // q_per_kv
    head_dim = q_ref.shape[2]
    bk = pages_per_block * page_size
    bh_total = pl.num_programs(0)
    bh = pl.program_id(0)
    q_idx = pl.program_id(1)
    kv_idx = pl.program_id(2)
    offs = offs_ref[bh]
    b = bmap_ref[bh]
    h = khead_ref[bh]
    num_groups = bh_total * num_chunk_blocks
    g = bh * num_chunk_blocks + q_idx
    first = first_ref[g]
    nblk = nblk_ref[g]
    abk = first + kv_idx  # actual history block this kv step covers

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    is_bf16 = q_ref.dtype == jnp.bfloat16
    precision = (
        jax.lax.Precision.DEFAULT if is_bf16 else jax.lax.Precision.HIGHEST
    )

    def make_copy(pages, scales, buf, sbuf, sem, ssem, bb, hh, block_idx,
                  slot):
        return _MultiPageCopy(
            pages, scales if scales_on else None, buf,
            sbuf if scales_on else None, sem, ssem if scales_on else None,
            tables_ref, bb, hh, block_idx, slot,
            pages_per_block=pages_per_block, pages_per_seq=pages_per_seq,
            page_size=page_size,
        )

    def start_both(bb, hh, block_idx, slot):
        make_copy(
            k_pages_hbm, k_scales_hbm, k_buf, k_scale_buf, k_sem,
            k_scale_sem, bb, hh, block_idx, slot,
        ).start()
        make_copy(
            v_pages_hbm, v_scales_hbm, v_buf, v_scale_buf, v_sem,
            v_scale_sem, bb, hh, block_idx, slot,
        ).start()

    def dequant(raw, scale_row):
        # raw [ppb, page_rows, payload_d] -> [bk, d] in q dtype, matching
        # the engine's gather path bit-for-bit (dequantize to the model
        # dtype, then the usual matmul).
        if kv_quant == "int4":
            raw = _unpack_int4_tokens(raw)
        tile = raw.reshape(bk, head_dim)
        if kv_quant is not None:
            tile = tile.astype(jnp.float32) * scale_row.reshape(bk, 1)
            return tile.astype(q_ref.dtype)
        if tile.dtype != q_ref.dtype:
            # f32 model over bf16 pages: Mosaic rejects mixed-dtype
            # matmuls on hardware ("Bad rhs type"); promote to the model
            # dtype, as the gather path does.
            return tile.astype(q_ref.dtype)
        return tile  # pages in the model dtype feed the MXU natively

    def softmax_update(s, v_tile):
        m_prev = m_scratch[...]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_scratch[...] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_scratch[...] = m_next
        pv = jax.lax.dot(
            p.astype(v_tile.dtype), v_tile,
            preferred_element_type=jnp.float32, precision=precision,
        )
        acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + pv

    q = q_ref[0]
    if sm_scale != 1.0:
        q = q * sm_scale

    def alibi_row_slopes():
        # Row r of the stacked tile is q head r // block_q: per-row slope.
        return jnp.broadcast_to(
            alibi_ref[0][:, None, :1], (q_per_kv, block_q, 1)
        ).reshape(rows, 1)

    is_hist = kv_idx < num_hist_blocks

    @pl.when(jnp.logical_and(is_hist, kv_idx < nblk))
    def _hist_block():
        # --- double-buffer pipeline (decode-kernel slot-parity scheme) ---
        # DMA cells = active history cells, walked in grid order
        # (bh, q_idx, kv_idx within [0, nblk)). Slot parity is the ordinal
        # of this cell in that walk — precomputed host/device-side as
        # cum (exclusive cumsum of per-group counts).
        cells_before = cum_ref[g] + kv_idx
        slot = jax.lax.rem(cells_before, 2)

        @pl.when(cells_before == 0)
        def _prime_first():
            start_both(b, h, abk, 0)

        # Next DMA cell after this one: the group's next active history
        # block, else the first active block of the next group with any
        # history (precomputed next_ref; sentinel num_groups = none).
        have_next = kv_idx + 1 < nblk
        ng = next_ref[g]
        ng_safe = jnp.minimum(ng, num_groups - 1)
        nbh = jnp.where(have_next, bh, ng_safe // num_chunk_blocks)
        nblk_idx = jnp.where(have_next, abk + 1, first_ref[ng_safe])

        @pl.when(jnp.logical_or(have_next, ng < num_groups))
        def _prefetch_next():
            start_both(
                bmap_ref[nbh], khead_ref[nbh], nblk_idx, 1 - slot
            )

        # --- wait + compute ---
        make_copy(
            k_pages_hbm, k_scales_hbm, k_buf, k_scale_buf, k_sem,
            k_scale_sem, b, h, abk, slot,
        ).wait()
        k_tile = dequant(
            k_buf[slot], k_scale_buf[slot] if scales_on else None
        )
        s = jax.lax.dot_general(
            q, k_tile, TRANS_B_DIM_NUMBERS,
            preferred_element_type=jnp.float32, precision=precision,
        )
        if softcap is not None:
            s = softcap * jnp.tanh(s * (1.0 / softcap))
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 1)
        valid = col + abk * bk < offs
        if window is not None or alibi_ref is not None:
            # Row r of the stacked tile is chunk position
            # q_idx*block_q + (r % block_q), i.e. absolute position
            # offs + that.
            row_in_blk = jax.lax.broadcasted_iota(
                jnp.int32, (q_per_kv, block_q, bk), 1
            ).reshape(rows, bk)
        if window is not None:
            # History col j (= abk*bk + col) is in-window iff
            # j > abs_pos - window.
            valid = jnp.logical_and(
                valid,
                col + abk * bk
                > offs + q_idx * block_q + row_in_blk - window,
            )
        if alibi_ref is not None:
            dist = col + abk * bk - offs - q_idx * block_q - row_in_blk
            s = s + alibi_row_slopes() * dist.astype(jnp.float32)
        s = jnp.where(valid, s, DEFAULT_MASK_VALUE)
        make_copy(
            v_pages_hbm, v_scales_hbm, v_buf, v_scale_buf, v_sem,
            v_scale_sem, b, h, abk, slot,
        ).wait()
        v_tile = dequant(
            v_buf[slot], v_scale_buf[slot] if scales_on else None
        )
        softmax_update(s, v_tile)

    c_idx = kv_idx - num_hist_blocks  # chunk block index when >= 0

    chunk_live = jnp.logical_and(kv_idx >= num_hist_blocks, c_idx <= q_idx)
    if window is not None:
        # Skip chunk tiles entirely below every row's window.
        chunk_live = jnp.logical_and(
            chunk_live,
            (q_idx - c_idx) * block_q - (block_q - 1) < window,
        )

    @pl.when(chunk_live)
    def _chunk_block():
        k_tile = ck_ref[0]
        s = jax.lax.dot_general(
            q, k_tile, TRANS_B_DIM_NUMBERS,
            preferred_element_type=jnp.float32, precision=precision,
        )
        if softcap is not None:
            s = softcap * jnp.tanh(s * (1.0 / softcap))
        # Row r of the stacked tile is query position
        # q_idx * block_q + (r % block_q) of head r // block_q.
        col = jax.lax.broadcasted_iota(jnp.int32, (rows, block_q), 1)
        row_in_blk = jax.lax.broadcasted_iota(
            jnp.int32, (q_per_kv, block_q, block_q), 1
        ).reshape(rows, block_q)
        rel = (col - row_in_blk) - (q_idx - c_idx) * block_q
        mask = rel <= 0
        if window is not None:
            # Chunk col and query share the offs base; the window bound is
            # on their chunk-position difference.
            mask = jnp.logical_and(mask, rel > -window)
        if alibi_ref is not None:
            # rel IS kv_pos - q_pos (both sit past the shared offs base).
            s = s + alibi_row_slopes() * rel.astype(jnp.float32)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
        softmax_update(s, cv_ref[0])

    @pl.when(kv_idx == num_hist_blocks + q_idx)
    def _epilogue():
        if sink_ref is None:
            l = l_scratch[:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)
        else:
            # Per-head sink: row r of the stacked tile belongs to q head
            # r // block_q of this KV head — broadcast the [q_per_kv]
            # logits over each head's block_q rows (shared epilogue math:
            # ops/flash/forward.py::sink_denominator).
            from tpu_flash.ops.flash.forward import sink_denominator

            sk = jnp.broadcast_to(
                sink_ref[0][:, None, :], (q_per_kv, block_q, NUM_LANES)
            ).reshape(rows, NUM_LANES)
            scale_m, l_tot, _ = sink_denominator(
                m_scratch[...], l_scratch[...], sk
            )
            o_ref[0] = (
                acc_scratch[...] * (scale_m[:, :1] / l_tot[:, :1])
            ).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def paged_prefill_attention(
    q: jax.Array,  # [B, hq, q_len, d] chunk queries
    chunk_k: jax.Array,  # [B, hkv, q_len, d] the chunk's own K (dense)
    chunk_v: jax.Array,
    k_pages,  # jax.Array or QuantizedTensor (one layer's pages)
    v_pages,
    q_offsets: jax.Array,  # [B] per-row history length (<= hist_cap)
    page_tables: jax.Array,  # [B, pages_per_seq] int32
    *,
    hist_cap: int,
    sm_scale: Optional[float] = None,
    block_q: Optional[int] = None,
    pages_per_compute_block: Optional[int] = None,
    interpret: Optional[bool] = None,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,  # [num_q_heads] sink logits
    alibi: Optional[jax.Array] = None,  # [num_q_heads] ALiBi slopes
) -> jax.Array:
    """Chunk attention over [paged history | dense chunk].

    Equivalent, per row ``b``, to causal attention of the chunk at
    q_offset=q_offsets[b] over that row's first q_offsets[b] cached
    tokens (dequantized exactly as the decode kernel reads them) plus the
    chunk itself. ``hist_cap`` (static) bounds the history sweep; rows
    read only ceil(q_offsets[b]/block) history blocks.

    ``window`` / ``softcap``: sliding-window band mask over absolute
    positions and tanh logit capping (see flash_attention). The page walk
    is window-aware: history pages entirely below every in-chunk query's
    window are neither streamed nor visited (the kv grid shrinks to
    ``ceil((window-1)/block) + 2`` history steps), so prefill page
    traffic scales with the window, matching the decode kernel's
    below-window block skip.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if window is not None and window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if softcap is not None and softcap <= 0:
        raise ValueError(f"softcap must be > 0, got {softcap}")
    batch, num_q_heads, q_len, head_dim = q.shape
    num_kv_heads = chunk_k.shape[1]
    q_per_kv = num_q_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = head_dim**-0.5
    # head_dim should be lane-aligned (128) on hardware — pages carry the
    # cache's native d, so it cannot be padded here. Interpret mode (and
    # the engine's tiny test models) runs at any d.

    kv_quant = None
    k_scales = v_scales = None
    if isinstance(k_pages, QuantizedTensor):
        kv_quant = k_pages.dtype_name
        if kv_quant not in ("int8", "int4", "fp8"):
            raise ValueError(f"unsupported KV quant {kv_quant!r}")
        k_vals, k_scales = k_pages.values, k_pages.scales
        v_vals, v_scales = v_pages.values, v_pages.scales
        k_scales = k_scales.squeeze(-1)[:, :, None, :]
        v_scales = v_scales.squeeze(-1)[:, :, None, :]
    else:
        k_vals, v_vals = k_pages, v_pages

    _, num_pages, page_rows, payload_d = k_vals.shape
    page_size = page_rows * 2 if kv_quant == "int4" else page_rows
    pages_per_seq = page_tables.shape[1]
    if hist_cap % page_size:
        raise ValueError(f"hist_cap {hist_cap} % page_size {page_size} != 0")
    hist_pages = hist_cap // page_size
    if hist_pages > pages_per_seq:
        raise ValueError("hist_cap exceeds the page table")

    if pages_per_compute_block is None:
        target = 2048 // page_size
        ppb = max(1, min(target, hist_pages))
    else:
        ppb = min(pages_per_compute_block, hist_pages)
    while hist_pages % ppb:
        ppb -= 1
    num_hist_blocks = hist_pages // ppb

    # Default tiling: 512 q rows, with the folded MXU tile
    # [q_per_kv * block_q, d] capped at 1024 rows. Past 1024 rows the
    # f32 accumulator + double-buffered history K/V blocks exceed the
    # 16M scoped-vmem default (measured: bf16 cache, GQA 4,
    # block_q=512 -> rows=2048 OOMs at 25.8M), and the int4 sweep runs
    # 2.7x faster at 1024 rows than 2048 (BENCHLOG 2026-08-18). An
    # explicit ``block_q`` is honored as given.
    if block_q is None:
        block_q = 512
        if q_per_kv * block_q > 1024:
            block_q = max(8, 1024 // q_per_kv)
    block_q = min(block_q, _round_up(q_len, 8))
    q_len_p = _round_up(q_len, block_q)
    num_chunk_blocks = q_len_p // block_q
    rows = q_per_kv * block_q

    def pad_seq(x):
        if x.shape[2] == q_len_p:
            return x
        return jnp.pad(
            x, ((0, 0), (0, 0), (0, q_len_p - x.shape[2]), (0, 0))
        )

    bkv_total = batch * num_kv_heads
    # Stack the q_per_kv query heads of each KV head: for each chunk block
    # qi, rows [h0's block | h1's block | ...] -> one [rows, d] MXU tile
    # whose history K/V is shared (fetched once per KV head, not per Q
    # head — the GQA traffic fix).
    qf = (
        pad_seq(q)
        .reshape(batch, num_kv_heads, q_per_kv, num_chunk_blocks, block_q,
                 head_dim)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(bkv_total, num_chunk_blocks * rows, head_dim)
    )
    ckf = pad_seq(chunk_k).reshape(bkv_total, q_len_p, head_dim)
    cvf = pad_seq(chunk_v).reshape(bkv_total, q_len_p, head_dim)

    offs_bkv = jnp.repeat(q_offsets.astype(jnp.int32), num_kv_heads)
    bmap = np.repeat(np.arange(batch, dtype=np.int32), num_kv_heads)
    khead = np.arange(bkv_total, dtype=np.int32) % num_kv_heads
    bmap = jnp.asarray(bmap)
    khead = jnp.asarray(khead)

    scales_on = kv_quant is not None
    bk = ppb * page_size

    # Window-aware history sweep: with a sliding window only
    # ceil((window-1)/bk) + 2 history blocks can ever be live for one
    # (row, chunk-block) group, so the static kv grid shrinks to that
    # and each group walks its own block window [first, first + nblk).
    if window is not None:
        hist_grid_blocks = min(num_hist_blocks, (window - 1) // bk + 2)
    else:
        hist_grid_blocks = num_hist_blocks

    # Per-group DMA-walk metadata (scalar prefetch; module docstring).
    # Groups are flattened (row, chunk-block) in grid order.
    ncb = num_chunk_blocks
    num_groups = bkv_total * ncb
    last = (offs_bkv + bk - 1) // bk  # [bkv] blocks of real history
    if window is not None:
        qi_pos = jnp.arange(ncb, dtype=jnp.int32) * block_q
        lo = jnp.maximum(
            offs_bkv[:, None] + qi_pos[None, :] - window + 1, 0
        )
        first2d = jnp.minimum(lo // bk, last[:, None])
    else:
        first2d = jnp.zeros((bkv_total, ncb), jnp.int32)
    nblk_flat = (last[:, None] - first2d).reshape(num_groups)
    first_flat = first2d.reshape(num_groups).astype(jnp.int32)
    nblk_flat = nblk_flat.astype(jnp.int32)
    cum_flat = jnp.cumsum(nblk_flat) - nblk_flat
    gidx = jnp.arange(num_groups, dtype=jnp.int32)
    cand = jnp.where(nblk_flat > 0, gidx, num_groups)
    sufmin = jax.lax.cummin(cand[::-1])[::-1]  # min cand[g:]
    next_flat = jnp.concatenate(
        [sufmin[1:], jnp.full((1,), num_groups, jnp.int32)]
    )

    # Chunk-tile walk for the kv grid dim: park on chunk block 0 through
    # the history steps (fetch elided after the first), then walk
    # 0,1,2,... — precomputed host-side so the index map stays a pure
    # prefetch lookup (compile-cliff findings, module docstring).
    cmap = jnp.asarray(
        np.maximum(
            np.arange(hist_grid_blocks + num_chunk_blocks, dtype=np.int32)
            - hist_grid_blocks,
            0,
        )
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=9,
        grid=(
            bkv_total,
            num_chunk_blocks,
            hist_grid_blocks + num_chunk_blocks,
        ),
        in_specs=[
            pl.BlockSpec(
                (1, rows, head_dim),
                lambda bh, qi, kv, offs, bm, kh, tb, cm, fs, nb, cu, nx: (
                    bh, qi, 0,
                ),
            ),
            pl.BlockSpec(
                (1, block_q, head_dim),
                lambda bh, qi, kv, offs, bm, kh, tb, cm, fs, nb, cu, nx: (
                    bh, cm[kv], 0,
                ),
            ),
            pl.BlockSpec(
                (1, block_q, head_dim),
                lambda bh, qi, kv, offs, bm, kh, tb, cm, fs, nb, cu, nx: (
                    bh, cm[kv], 0,
                ),
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # k pages
            pl.BlockSpec(memory_space=pltpu.ANY),  # k scales
            pl.BlockSpec(memory_space=pltpu.ANY),  # v pages
            pl.BlockSpec(memory_space=pltpu.ANY),  # v scales
        ]
        + (
            [
                pl.BlockSpec(
                    (1, q_per_kv, NUM_LANES),
                    lambda bh, qi, kv, offs, bm, kh, tb, cm, fs, nb, cu, nx: (
                        kh[bh], 0, 0,
                    ),
                )
            ]
            if sinks is not None
            else []
        )
        + (
            [
                pl.BlockSpec(
                    (1, q_per_kv, NUM_LANES),
                    lambda bh, qi, kv, offs, bm, kh, tb, cm, fs, nb, cu, nx: (
                        kh[bh], 0, 0,
                    ),
                )
            ]
            if alibi is not None
            else []
        ),
        out_specs=[
            pl.BlockSpec(
                (1, rows, head_dim),
                lambda bh, qi, kv, offs, bm, kh, tb, cm, fs, nb, cu, nx: (
                    bh, qi, 0,
                ),
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, NUM_LANES), jnp.float32),
            pltpu.VMEM((rows, NUM_LANES), jnp.float32),
            pltpu.VMEM((rows, head_dim), jnp.float32),
            pltpu.VMEM((2, ppb, page_rows, payload_d), k_vals.dtype),
            pltpu.VMEM((2, 1, bk), jnp.float32),
            pltpu.VMEM((2, ppb, page_rows, payload_d), v_vals.dtype),
            pltpu.VMEM((2, 1, bk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    if not scales_on:
        k_scales = jnp.zeros((1, 1, 1, 1), jnp.float32)
        v_scales = jnp.zeros((1, 1, 1, 1), jnp.float32)

    kernel = functools.partial(
        _paged_prefill_kernel,
        sm_scale=sm_scale,
        kv_quant=kv_quant,
        q_per_kv=q_per_kv,
        pages_per_block=ppb,
        pages_per_seq=pages_per_seq,
        page_size=page_size,
        num_hist_blocks=hist_grid_blocks,
        num_chunk_blocks=num_chunk_blocks,
        scales_on=scales_on,
        window=int(window) if window is not None else None,
        softcap=float(softcap) if softcap is not None else None,
    )
    def _per_head_lanes(vals):
        return jnp.broadcast_to(
            vals.astype(jnp.float32).reshape(num_kv_heads, q_per_kv)[
                ..., None
            ],
            (num_kv_heads, q_per_kv, NUM_LANES),
        )

    call_inputs = (qf, ckf, cvf, k_vals, k_scales, v_vals, v_scales)
    have_sink, have_alibi = sinks is not None, alibi is not None
    if have_sink:
        call_inputs = call_inputs + (_per_head_lanes(sinks),)
    if have_alibi:
        call_inputs = call_inputs + (_per_head_lanes(alibi),)
    if have_sink or have_alibi:
        base_kernel = kernel

        def kernel(offs_r, bm_r, kh_r, tb_r, cm_r, fs_r, nb_r, cu_r, nx_r,
                   q_r, ck_r, cv_r, kp_r, ks_r, vp_r, vs_r, *rest):
            it = iter(rest)
            sink_in = next(it) if have_sink else None
            alibi_in = next(it) if have_alibi else None
            o_r = next(it)
            return base_kernel(
                offs_r, bm_r, kh_r, tb_r, cm_r, fs_r, nb_r, cu_r, nx_r,
                q_r, ck_r, cv_r, kp_r, ks_r, vp_r, vs_r, o_r, *list(it),
                sink_ref=sink_in, alibi_ref=alibi_in,
            )

    (o,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(
                (bkv_total, num_chunk_blocks * rows, head_dim), q.dtype
            )
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        offs_bkv, bmap, khead, page_tables.astype(jnp.int32), cmap,
        first_flat, nblk_flat, cum_flat, next_flat,
        *call_inputs,
    )
    o = (
        o.reshape(batch, num_kv_heads, num_chunk_blocks, q_per_kv, block_q,
                  head_dim)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(batch, num_q_heads, q_len_p, head_dim)
    )
    return o[:, :, :q_len]
