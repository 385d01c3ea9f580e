"""Pallas TPU flash-attention forward kernel.

TPU-native re-design of the reference's fused attention kernel
(``twoLoaderMhaFlashAttentionKernel``, kernels/FlashAttention.cuh:59-84):

* The reference's warp-specialized loader/compute split with
  ``cuda::pipeline`` double buffering (loaders.cuh:114-203) becomes Pallas
  grid pipelining: ``BlockSpec`` index maps stream Q/K/V HBM→VMEM tiles with
  compiler-managed double buffering, overlapping DMA with MXU compute.
* The per-(q_row, kv_row) warp-shuffle dot products and reductions
  (utils.cuh:18-33, 58-81) become whole-tile MXU matmuls
  (``jax.lax.dot_general``) and VPU lane reductions (``jnp.max/sum``).
* The online-softmax state (running max m, running sum l) lives in VMEM
  scratch carried across the KV grid dimension — the analogue of the
  reference's registers/smem state — but normalization is **deferred** to a
  single epilogue (FA2-style), fixing the reference's eager per-tile
  ``/l_new`` divides (utils.cuh:79-80).
* The reference's tile-level causal early-out (utils.cuh:36-45) becomes grid
  predication (``@pl.when`` on the block diagonal) plus index-map clamping so
  fully-masked KV blocks are neither fetched nor computed.
* The reference's flattened batch·head·seq loop bug (attention leaking across
  batch/head boundaries for B·H > 1, computers.cuh:33,42) is structurally
  impossible here: batch and head are independent grid dimensions.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.core.config import BlockSizes
from tpu_flash.core.reference import DEFAULT_MASK_VALUE

NUM_LANES = 128

TRANS_B_DIM_NUMBERS = (((1,), (1,)), ((), ()))  # q @ k.T


def _seg_mask(qseg_ref, kvseg_ref, start, block_q, block_kv):
    """[block_q, block_kv] equality mask from lane-replicated q ids
    ([block_q, NUM_LANES]) and sublane-replicated kv ids ([8, kv_block])."""
    kv_ids = kvseg_ref[0, :1, start : start + block_kv]  # [1, block_kv]
    q_ids = qseg_ref[0]  # [block_q, NUM_LANES]
    if block_kv > NUM_LANES:
        assert block_kv % NUM_LANES == 0, (block_kv, NUM_LANES)
        q_ids = jnp.tile(q_ids, (1, block_kv // NUM_LANES))
    elif block_kv < NUM_LANES:
        q_ids = q_ids[:, :block_kv]
    return q_ids == kv_ids


def sink_denominator(m, l, sk):
    """Shared attention-sink epilogue math (used by the dense, ragged,
    paged-prefill, and decode kernels): fold a valueless sink logit into
    the softmax denominator, stably in max(m, sink) units.

    Args:
      m, l: lane-replicated online-softmax state [rows, NUM_LANES].
      sk: sink logits broadcastable against m (per-row or per-tile).
    Returns:
      (scale_m, l_tot, m2): normalize the accumulator with
      ``acc * scale_m[:, :1] / l_tot[:, :1]``; ``m2 + log(l_tot)`` is the
      sink-inclusive lse. scale_m is 0 for rows that saw nothing
      (m = -inf), making their output exactly 0.
    """
    m2 = jnp.maximum(m, sk)
    scale_m = jnp.exp(m - m2)
    l_tot = l * scale_m + jnp.exp(sk - m2)
    return scale_m, l_tot, m2


def _finalize(o_ref, lse_ref, m_scratch, l_scratch, acc_scratch, sink_ref):
    """Deferred-normalization epilogue, optionally folding a per-head
    attention-sink logit into the softmax denominator: the sink is a
    virtual position with no value row, so only ``l`` (and lse) change."""
    if sink_ref is None:
        l = l_scratch[:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)
        if lse_ref is not None:
            m = m_scratch[...]
            lse_ref[0, 0] = jnp.where(
                m == -jnp.inf, -jnp.inf, m + jnp.log(l_scratch[...])
            ).astype(lse_ref.dtype)
        return
    sk = sink_ref[0][None, :]  # [1, NUM_LANES] lane-replicated logit
    scale_m, l_tot, m2 = sink_denominator(
        m_scratch[...], l_scratch[...], sk
    )
    o_ref[0, 0] = (
        acc_scratch[...] * (scale_m[:, :1] / l_tot[:, :1])
    ).astype(o_ref.dtype)
    if lse_ref is not None:
        lse_ref[0, 0] = (m2 + jnp.log(l_tot)).astype(lse_ref.dtype)


def _flash_fwd_kernel(
    q_ref,  # [1, 1, block_q, head_dim]
    k_ref,  # [1, 1, block_kv_major, head_dim]
    v_ref,  # [1, 1, block_kv_major, head_dim]
    qseg_ref,  # [1, block_q, NUM_LANES] int32 or None
    kvseg_ref,  # [1, 8, block_kv_major] int32 or None
    sink_ref,  # [1, NUM_LANES] f32 per-head sink logit or None
    alibi_ref,  # [1, NUM_LANES] f32 per-head ALiBi slope or None
    o_ref,  # [1, 1, block_q, head_dim]
    lse_ref,  # [1, 1, block_q, NUM_LANES] or None
    m_scratch,  # VMEM [block_q, NUM_LANES] f32
    l_scratch,  # VMEM [block_q, NUM_LANES] f32
    acc_scratch,  # VMEM [block_q, head_dim] f32
    *,
    causal: bool,
    sm_scale: float,
    block_kv: int,
    q_offset: int,
    kv_len: int,  # true (unpadded) kv length
    num_kv_blocks: int,
    mask_kv_tail: bool,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
):
    block_q = q_ref.shape[2]
    block_kv_major = k_ref.shape[2]
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)

    if window is None:
        first_kv = 0
    else:
        # First kv block intersecting the window of this Q block's first row:
        # positions >= min_q_pos - window + 1 are attended.
        first_kv = jnp.maximum(
            (q_idx * block_q + q_offset - window + 1) // block_kv_major, 0
        )

    @pl.when(kv_idx == first_kv)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    if causal:
        # Block-diagonal predicate: run only if some (q_pos >= kv_pos) pair
        # exists in this tile pair — the grid-level form of the reference's
        # per-element early-out at utils.cuh:43.
        max_q_pos = (q_idx + 1) * block_q - 1 + q_offset
        should_run = max_q_pos >= kv_idx * block_kv_major
        if window is not None:
            # ... and only if the tile is not entirely below the window of
            # this Q block's last attended row.
            min_q_pos = q_idx * block_q + q_offset
            max_kv_pos = (kv_idx + 1) * block_kv_major - 1
            should_run = jnp.logical_and(
                should_run, max_kv_pos >= min_q_pos - window + 1
            )
    else:
        should_run = True

    # FP32 inputs take the exactness path: force true-f32 MXU passes. BF16
    # and narrower take the default fast path.
    precision = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    @pl.when(should_run)
    def _run():
        # Fold the softmax scale into the Q tile: O(block_q * d) instead of
        # an O(block_q * block_kv) pass over the scores.
        q = q_ref[0, 0]  # [block_q, head_dim]
        if sm_scale != 1.0:
            q = q * sm_scale
        for start in range(0, block_kv_major, block_kv):
            k = k_ref[0, 0, start : start + block_kv, :]
            s = jax.lax.dot_general(
                q,
                k,
                TRANS_B_DIM_NUMBERS,
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            if softcap is not None:
                s = softcap * jnp.tanh(s * (1.0 / softcap))

            kv_base = kv_idx * block_kv_major + start
            if causal or mask_kv_tail or qseg_ref is not None:
                # Loop-invariant index matrices + per-tile scalar thresholds:
                # the iotas are grid-cell independent (hoistable), so the
                # per-tile mask costs ~2 VPU passes (compare + select).
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_kv), 1
                )
                mask = None
                if causal:
                    row = jax.lax.broadcasted_iota(
                        jnp.int32, (block_q, block_kv), 0
                    )
                    # col + kv_base <= row + q_offset + q_idx*block_q
                    thr = q_offset + q_idx * block_q - kv_base
                    mask = (col - row) <= thr
                    if window is not None:
                        # Sliding window: col + kv_base > q_pos - window.
                        mask = jnp.logical_and(
                            mask, (col - row) > thr - window
                        )
                    if alibi_ref is not None:
                        # ALiBi: slope * (kv_pos - q_pos) = slope *
                        # (col - row - thr); masked positions are
                        # overwritten below anyway.
                        s = s + alibi_ref[0:1, 0:1] * (
                            col - row - thr
                        ).astype(jnp.float32)
                if qseg_ref is not None:
                    seg = _seg_mask(
                        qseg_ref, kvseg_ref, start, block_q, block_kv
                    )
                    mask = seg if mask is None else jnp.logical_and(mask, seg)
                if mask_kv_tail:
                    tail = col < kv_len - kv_base
                    mask = tail if mask is None else jnp.logical_and(mask, tail)
                s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

            m_prev = m_scratch[...]  # [block_q, NUM_LANES], lane-replicated
            l_prev = l_scratch[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)  # [block_q, 1]
            m_next = jnp.maximum(m_prev, m_curr)  # [block_q, NUM_LANES]
            alpha = jnp.exp(m_prev - m_next)
            p = jnp.exp(s - m_next[:, :1])  # [block_q, block_kv]
            l_curr = jnp.sum(p, axis=1, keepdims=True)
            l_scratch[...] = l_prev * alpha + l_curr
            m_scratch[...] = m_next

            v = v_ref[0, 0, start : start + block_kv, :]
            pv = jax.lax.dot(
                p.astype(v.dtype),
                v,
                preferred_element_type=jnp.float32,
                precision=precision,
            )
            acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + pv

    # Epilogue on the last KV block this Q block visits. For causal Q blocks
    # that end before the last KV block, that is the diagonal block.
    if causal:
        last_kv = jnp.minimum(
            num_kv_blocks - 1,
            ((q_idx + 1) * block_q - 1 + q_offset) // block_kv_major,
        )
    else:
        last_kv = num_kv_blocks - 1

    @pl.when(kv_idx == last_kv)
    def _epilogue():
        _finalize(o_ref, lse_ref, m_scratch, l_scratch, acc_scratch,
                  sink_ref)


def _online_softmax_update(
    m_scratch, l_scratch, acc_scratch, s, v, lo, precision, hi=None
):
    """One FA2 online-softmax state update on scratch rows [lo:hi] — the
    reference's ``updateSoftmaxState`` + ``multiplyVAccumulateO``
    (utils.cuh:58-81, 93-113) as a whole-tile MXU/VPU op, with deferred
    normalization. ``lo``/``hi`` must be static row offsets (``hi=None``
    means through the last row)."""
    m_prev = m_scratch[lo:hi, :]
    l_prev = l_scratch[lo:hi, :]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])
    l_curr = jnp.sum(p, axis=1, keepdims=True)
    l_scratch[lo:hi, :] = l_prev * alpha + l_curr
    m_scratch[lo:hi, :] = m_next
    pv = jax.lax.dot(
        p.astype(v.dtype), v,
        preferred_element_type=jnp.float32, precision=precision,
    )
    acc_scratch[lo:hi, :] = acc_scratch[lo:hi, :] * alpha[:, :1] + pv


def _flash_fwd_onepass_kernel(
    q_ref,  # [1, 1, block_q, head_dim]
    k_ref,  # [1, 1, kv_len, head_dim]  (the FULL padded KV range)
    v_ref,  # [1, 1, kv_len, head_dim]
    sink_ref,  # [1, NUM_LANES] f32 per-head sink logit or None
    alibi_ref,  # [1, NUM_LANES] f32 per-head ALiBi slope or None
    o_ref,  # [1, 1, block_q, head_dim]
    lse_ref,  # [1, 1, block_q, NUM_LANES] or None
    *,
    causal: bool,
    sm_scale: float,
    num_q_blocks: int,
    softcap: Optional[float] = None,
    diag_rows: Optional[int] = None,
    diag_min_block: int = 0,
):
    """Single-pass short-sequence forward: one q-block against its FULL
    (causal) KV extent, softmax in one masked pass — no online merge, no
    (m, l)/accumulator scratch, no rescale. This is the shape the
    reference's streaming loop (kernels/computers.cuh:42-62) degenerates
    to when the whole KV range is SMEM/VMEM-resident, minus its eager
    per-tile normalization (utils.cuh:79-80).

    The grid is (batch, heads, q_blocks) with the K/V BlockSpec pinned to
    block index 0 — Pallas elides refetches of an unchanged block, so K/V
    cross HBM once per (batch, kv_head) exactly like the tiled grids. Each
    causal q-block branches to a static-extent slice of the resident K/V,
    so masked FLOPs match the triangular grid's (only the trailing
    diagonal block is half-wasted) while the softmax VPU chain runs once.

    ``diag_rows`` (causal only): split the trailing diagonal block into
    row slices of this many q rows; slice ``s`` computes only its own
    ``(s+1)*diag_rows`` diagonal columns and merges with the mask-free
    prefix state once (one rescale per slice). This cuts the diagonal's
    computed-but-masked FLOPs from ~1/2 to ~1/(2r) of a block — the
    single-pass analogue of the triangular grid's ``diag_sub`` — while
    the prefix matmul keeps the full block_q MXU row count.
    """
    block_q = q_ref.shape[2]
    kv_len = k_ref.shape[2]
    qb = pl.program_id(2)
    precision = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    q = q_ref[0, 0]
    if sm_scale != 1.0:
        q = q * sm_scale

    def _write(lo, hi, m, l, pv):
        """Finalize rows [lo, hi): normalize, fold sinks, write o/lse."""
        if sink_ref is None:
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, 0, lo:hi] = (pv * l_inv).astype(o_ref.dtype)
            if lse_ref is not None:
                lse = jnp.where(m == -jnp.inf, -jnp.inf, m + jnp.log(l))
                lse_ref[0, 0, lo:hi] = jnp.broadcast_to(
                    lse, (hi - lo, NUM_LANES)
                ).astype(lse_ref.dtype)
        else:
            sk = sink_ref[0:1, 0:1]  # [1, 1] per-head sink logit
            scale_m, l_tot, m2 = sink_denominator(m, l, sk)
            o_ref[0, 0, lo:hi] = (pv * (scale_m / l_tot)).astype(o_ref.dtype)
            if lse_ref is not None:
                lse_ref[0, 0, lo:hi] = jnp.broadcast_to(
                    m2 + jnp.log(l_tot), (hi - lo, NUM_LANES)
                ).astype(lse_ref.dtype)

    def _scores(qs, start: int, extent: int, thr: Optional[int]):
        """[rows, extent] scaled scores of q rows ``qs`` against KV columns
        [start, start+extent). ``thr`` None = no mask (strict prefix);
        else mask col_global - row_local <= thr (row_local 0 sits at
        global row ``thr``)."""
        rows = qs.shape[0]
        k = k_ref[0, 0, start : start + extent, :]
        s = jax.lax.dot_general(
            qs, k, TRANS_B_DIM_NUMBERS,
            preferred_element_type=jnp.float32, precision=precision,
        )
        if softcap is not None:
            s = softcap * jnp.tanh(s * (1.0 / softcap))
        if thr is not None or alibi_ref is not None:
            col = start + jax.lax.broadcasted_iota(
                jnp.int32, (rows, extent), 1
            )
            row = jax.lax.broadcasted_iota(jnp.int32, (rows, extent), 0)
            if alibi_ref is not None:
                base = thr if thr is not None else 0
                s = s + alibi_ref[0:1, 0:1] * (col - row - base).astype(
                    jnp.float32
                )
            if thr is not None:
                s = jnp.where((col - row) <= thr, s, DEFAULT_MASK_VALUE)
        return s

    def _softmax_pv(s, start: int, extent: int):
        m = jnp.max(s, axis=1, keepdims=True)  # [rows, 1]
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot(
            p.astype(v_ref.dtype), v_ref[0, 0, start : start + extent, :],
            preferred_element_type=jnp.float32, precision=precision,
        )
        return m, l, pv

    def _body(extent: int, thr: int):
        s = _scores(q, 0, extent, thr if causal else None)
        m, l, pv = _softmax_pv(s, 0, extent)
        _write(0, block_q, m, l, pv)

    def _body_diag_split(i: int, rs: int):
        """Causal q-block ``i`` with the diagonal block row-sliced: the
        mask-free prefix [0, i*block_q) runs at full block_q rows; each
        rs-row slice computes only its (s+1)*rs diagonal columns and
        merges with its prefix rows once."""
        pre = i * block_q
        if pre > 0:
            s1 = _scores(q, 0, pre, i * block_q if alibi_ref is not None
                         else None)
            # alibi needs col/row offsets even without a mask; _scores
            # masks only when thr covers reachable (col - row) deltas —
            # in the strict prefix col < every global row, so the
            # threshold i*block_q never masks anything.
            m1, l1, pv1 = _softmax_pv(s1, 0, pre)
        for sidx in range(block_q // rs):
            lo, hi = sidx * rs, (sidx + 1) * rs
            qs = q[lo:hi]
            ext = hi  # (s+1)*rs diagonal columns
            s2 = _scores(qs, pre, ext, i * block_q + lo)
            m2, l2, pv2 = _softmax_pv(s2, pre, ext)
            if pre > 0:
                m1s, l1s, pv1s = m1[lo:hi], l1[lo:hi], pv1[lo:hi]
                m = jnp.maximum(m1s, m2)
                a1 = jnp.exp(m1s - m)
                a2 = jnp.exp(m2 - m)
                _write(lo, hi, m, l1s * a1 + l2 * a2,
                       pv1s * a1 + pv2 * a2)
            else:
                _write(lo, hi, m2, l2, pv2)

    # diag_rows == block_q degenerates to a "two-part" body: unmasked
    # full-M prefix + one full-width masked diagonal block, merged once —
    # mask iotas shrink from [bq, extent] to [bq, bq] with no slice
    # granularity cost.
    split = (
        causal
        and diag_rows is not None
        and diag_rows <= block_q
        and block_q % diag_rows == 0
    )
    if causal and num_q_blocks == 1 and split and diag_rows < block_q:
        # Fused staircase: the whole (padded) q range is ONE grid cell;
        # each diag_rows-row stair runs a two-part body (unmasked prefix
        # [0, s*rs) at stair row count + masked diagonal [s*rs, (s+1)*rs)),
        # merged once. Identical matmul/mask shapes to the per-q-block
        # two-part grid, minus (num_stairs - 1)/num_stairs of the grid
        # cells.
        rs = diag_rows
        for sidx in range(block_q // rs):
            lo, hi = sidx * rs, (sidx + 1) * rs
            qs = q[lo:hi]
            if sidx == 0:
                s2 = _scores(qs, 0, rs, 0)
                m2, l2, pv2 = _softmax_pv(s2, 0, rs)
                _write(lo, hi, m2, l2, pv2)
            else:
                s1 = _scores(qs, 0, lo, lo if alibi_ref is not None
                             else None)
                m1, l1, pv1 = _softmax_pv(s1, 0, lo)
                s2 = _scores(qs, lo, rs, lo)
                m2, l2, pv2 = _softmax_pv(s2, lo, rs)
                m = jnp.maximum(m1, m2)
                a1 = jnp.exp(m1 - m)
                a2 = jnp.exp(m2 - m)
                _write(lo, hi, m, l1 * a1 + l2 * a2, pv1 * a1 + pv2 * a2)
        return
    if causal and num_q_blocks > 1:
        # Per-q-block static causal extent: q-block i attends columns
        # [0, (i+1)*block_q). Static branches keep every matmul shape
        # known to Mosaic; the strictly-interior prefix is mask-free by
        # construction of the extent.
        for i in range(num_q_blocks):
            @pl.when(qb == i)
            def _branch(i=i):
                if split and i >= diag_min_block:
                    _body_diag_split(i, diag_rows)
                else:
                    _body((i + 1) * block_q, i * block_q)
    elif split and diag_min_block == 0:
        _body_diag_split(0, diag_rows)
    else:
        # Non-causal (any nb), or a single causal block: full extent;
        # thr=0 masks the lone diagonal when causal.
        _body(kv_len, 0)


def _forward_onepass(
    q, k, v, *, causal, sm_scale, block_q, q_per_kv, save_residuals,
    interpret, softcap=None, sinks=None, alibi=None, diag_rows=None,
    diag_min_block=0,
):
    """Launch the single-pass kernel (see _flash_fwd_onepass_kernel)."""
    batch, num_q_heads, q_len, head_dim = q.shape
    kv_len_padded = k.shape[2]
    num_q_blocks = q_len // block_q

    in_specs = [
        pl.BlockSpec(
            (1, 1, block_q, head_dim), lambda b, h, qb: (b, h, qb, 0)
        ),
        pl.BlockSpec(
            (1, 1, kv_len_padded, head_dim),
            lambda b, h, qb: (b, h // q_per_kv, 0, 0),
        ),
        pl.BlockSpec(
            (1, 1, kv_len_padded, head_dim),
            lambda b, h, qb: (b, h // q_per_kv, 0, 0),
        ),
    ]
    extra_inputs = ()
    have_sink = sinks is not None
    if have_sink:
        sinks_l = jax.lax.broadcast_in_dim(
            sinks.astype(jnp.float32), (num_q_heads, NUM_LANES), (0,)
        )
        in_specs.append(pl.BlockSpec((1, NUM_LANES), lambda b, h, qb: (h, 0)))
        extra_inputs = extra_inputs + (sinks_l,)
    have_alibi = alibi is not None
    if have_alibi:
        alibi_l = jax.lax.broadcast_in_dim(
            alibi.astype(jnp.float32), (num_q_heads, NUM_LANES), (0,)
        )
        in_specs.append(pl.BlockSpec((1, NUM_LANES), lambda b, h, qb: (h, 0)))
        extra_inputs = extra_inputs + (alibi_l,)

    out_shapes = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    out_specs = [
        pl.BlockSpec(
            (1, 1, block_q, head_dim), lambda b, h, qb: (b, h, qb, 0)
        ),
    ]
    if save_residuals:
        out_shapes.append(
            jax.ShapeDtypeStruct(
                (batch, num_q_heads, q_len, NUM_LANES), jnp.float32
            )
        )
        out_specs.append(
            pl.BlockSpec(
                (1, 1, block_q, NUM_LANES), lambda b, h, qb: (b, h, qb, 0)
            )
        )

    base_kernel = functools.partial(
        _flash_fwd_onepass_kernel,
        causal=causal,
        sm_scale=sm_scale,
        num_q_blocks=num_q_blocks,
        softcap=softcap,
        diag_rows=diag_rows,
        diag_min_block=diag_min_block,
    )

    def kernel(*refs):
        it = iter(refs)
        q_r, k_r, v_r = next(it), next(it), next(it)
        sk_r = next(it) if have_sink else None
        al_r = next(it) if have_alibi else None
        o_r = next(it)
        lse_r = next(it) if save_residuals else None
        return base_kernel(q_r, k_r, v_r, sk_r, al_r, o_r, lse_r)

    if causal:
        if diag_rows and diag_rows < block_q:
            r = block_q // diag_rows
            diag_tokens = block_q * block_q * (r + 1) // (2 * r)
        else:
            diag_tokens = block_q * block_q
        cell_tokens = (
            block_q * block_q * num_q_blocks * (num_q_blocks - 1) // 2
            + num_q_blocks * diag_tokens
        )
    else:
        cell_tokens = q_len * kv_len_padded
    cost = pl.CostEstimate(
        flops=4 * batch * num_q_heads * cell_tokens * head_dim,
        bytes_accessed=(
            q.size * q.dtype.itemsize
            + k.size * k.dtype.itemsize
            + v.size * v.dtype.itemsize
            + q.size * q.dtype.itemsize
        ),
        transcendentals=batch * num_q_heads * cell_tokens,
    )

    outs = pl.pallas_call(
        kernel,
        grid=(batch, num_q_heads, num_q_blocks),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(q, k, v, *extra_inputs)

    o = outs[0]
    if save_residuals:
        return o, outs[1][..., 0]
    return o


# Largest f32 scores tile ([block_q, kv_extent]) the single-pass kernel may
# materialize; beyond this the online-softmax grids win (VMEM pressure).
_ONEPASS_MAX_SCORES_BYTES = 8 * 2**20


def _flash_fwd_tri_kernel(
    # scalar prefetch
    qmap_ref,  # [n_cells] q-block index of each active cell
    kvmap_ref,  # [n_cells] kv-block index
    islast_ref,  # [n_cells] 1 on the q block's final kv cell
    # inputs / outputs / scratch: as _flash_fwd_kernel
    q_ref,
    k_ref,
    v_ref,
    qseg_ref,  # [1, block_q, NUM_LANES] int32 or None
    kvseg_ref,  # [1, 8, block_kv_major] int32 or None
    sink_ref,  # [1, NUM_LANES] f32 or None
    alibi_ref,  # [1, NUM_LANES] f32 or None
    o_ref,
    lse_ref,
    m_scratch,
    l_scratch,
    acc_scratch,
    *,
    sm_scale: float,
    block_kv: int,
    q_offset: int,
    kv_len: int,
    mask_kv_tail: bool,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    diag_sub: Optional[int] = None,
):
    """Causal forward over a TRIANGULAR cell enumeration: the grid's last
    dimension walks only the active (q, kv) block pairs (qmap/kvmap via
    scalar prefetch), so above-diagonal cells never exist — no predicated
    dead cells, which is what makes small blocks (less diagonal masking
    waste) affordable. With ``window`` the enumeration is a BAND (cells
    below the window are dropped too). Math identical to _flash_fwd_kernel.

    ``diag_sub`` (launcher-gated: plain causal self-attention, square
    single-level tiles, q_offset 0, no window/segments/tail): cells are
    then either exactly on-diagonal (thr == 0) or strictly interior
    (thr >= block). Interior cells skip the causal mask; diagonal cells
    run a row-sliced sub-tile walk — column chunk [lo, lo+diag_sub)
    against q rows [lo:] — so masked FLOPs shrink from ~half the tile to
    ~diag_sub/(2*block) of it without adding grid cells."""
    block_q = q_ref.shape[2]
    block_kv_major = k_ref.shape[2]
    c = pl.program_id(2)
    q_idx = qmap_ref[c]
    kv_idx = kvmap_ref[c]

    if window is None:
        first_kv = 0
    else:
        first_kv = jnp.maximum(
            (q_idx * block_q + q_offset - window + 1) // block_kv_major, 0
        )

    @pl.when(kv_idx == first_kv)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    precision = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    q = q_ref[0, 0]
    if sm_scale != 1.0:
        q = q * sm_scale

    if diag_sub is not None:
        # Launcher guarantees: q_offset == 0, block_q == block_kv_major ==
        # block_kv, no window/segments/alibi/kv-tail. thr is then exactly 0
        # on diagonal cells and >= block_q on interior ones.
        thr_cell = q_idx - kv_idx  # 0 <=> diagonal

        @pl.when(thr_cell != 0)
        def _interior():
            s = jax.lax.dot_general(
                q, k_ref[0, 0], TRANS_B_DIM_NUMBERS,
                preferred_element_type=jnp.float32, precision=precision,
            )
            if softcap is not None:
                s = softcap * jnp.tanh(s * (1.0 / softcap))
            _online_softmax_update(
                m_scratch, l_scratch, acc_scratch, s, v_ref[0, 0], 0,
                precision,
            )

        @pl.when(thr_cell == 0)
        def _diagonal():
            for lo in range(0, block_kv_major, diag_sub):
                k = k_ref[0, 0, lo : lo + diag_sub, :]
                s = jax.lax.dot_general(
                    q[lo:, :], k, TRANS_B_DIM_NUMBERS,
                    preferred_element_type=jnp.float32, precision=precision,
                )
                if softcap is not None:
                    s = softcap * jnp.tanh(s * (1.0 / softcap))
                rows = block_q - lo
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (rows, diag_sub), 1
                )
                row = jax.lax.broadcasted_iota(
                    jnp.int32, (rows, diag_sub), 0
                )
                s = jnp.where(col <= row, s, DEFAULT_MASK_VALUE)
                _online_softmax_update(
                    m_scratch, l_scratch, acc_scratch, s,
                    v_ref[0, 0, lo : lo + diag_sub, :], lo, precision,
                )
    else:
        for start in range(0, block_kv_major, block_kv):
            k = k_ref[0, 0, start : start + block_kv, :]
            s = jax.lax.dot_general(
                q, k, TRANS_B_DIM_NUMBERS,
                preferred_element_type=jnp.float32, precision=precision,
            )
            if softcap is not None:
                s = softcap * jnp.tanh(s * (1.0 / softcap))
            kv_base = kv_idx * block_kv_major + start
            col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
            thr = q_offset + q_idx * block_q - kv_base
            mask = (col - row) <= thr
            if window is not None:
                mask = jnp.logical_and(mask, (col - row) > thr - window)
            if alibi_ref is not None:
                s = s + alibi_ref[0:1, 0:1] * (col - row - thr).astype(
                    jnp.float32
                )
            if qseg_ref is not None:
                mask = jnp.logical_and(
                    mask,
                    _seg_mask(qseg_ref, kvseg_ref, start, block_q, block_kv),
                )
            if mask_kv_tail:
                mask = jnp.logical_and(mask, col < kv_len - kv_base)
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
            _online_softmax_update(
                m_scratch, l_scratch, acc_scratch, s,
                v_ref[0, 0, start : start + block_kv, :], 0, precision,
            )

    @pl.when(islast_ref[c] == 1)
    def _epilogue():
        _finalize(o_ref, lse_ref, m_scratch, l_scratch, acc_scratch,
                  sink_ref)


def _flash_fwd_tri2_kernel(
    # scalar prefetch
    pmap_ref,  # [n_cells] q-PAIR index of each active cell
    kvmap_ref,  # [n_cells] kv-block index
    islast_ref,  # [n_cells] 1 on the pair's final kv cell
    q_ref,  # [1, 1, 2*block, head_dim] — q blocks 2p and 2p+1 stacked
    k_ref,  # [1, 1, block, head_dim]
    v_ref,
    sink_ref,  # [1, NUM_LANES] f32 or None
    o_ref,  # [1, 1, 2*block, head_dim]
    lse_ref,  # [1, 1, 2*block, NUM_LANES] or None
    m_scratch,  # [2*block, NUM_LANES]
    l_scratch,
    acc_scratch,  # [2*block, head_dim]
    *,
    sm_scale: float,
    softcap: Optional[float] = None,
):
    """Causal forward over a PAIRED triangular enumeration: each cell
    serves TWO adjacent q-blocks (2p, 2p+1) from one K/V fetch, so each
    K/V major block leaves HBM once per pair instead of once per
    q-block (~45% less causal K/V traffic at 8 q-blocks: 20 cell
    fetches vs 36). The halves run as separate block-row dots against
    the shared K tile — per half the diag_sub == block policy holds:
    interior halves are mask-free, diagonal halves one full-width
    masked chunk. Math identical to _flash_fwd_tri_kernel; the online
    state lives per-half in the doubled scratch rows.

    Reference analogue: the CUDA kernel re-streams the whole KV for
    every Q tile (computers.cuh:33,42); this geometry is the TPU-native
    escape that sharing a KV sweep across Q tiles buys."""
    block = k_ref.shape[2]
    c = pl.program_id(2)
    p_idx = pmap_ref[c]
    kv_idx = kvmap_ref[c]
    diag_lo = 2 * p_idx  # kv index of the LO half's diagonal cell

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    precision = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    q = q_ref[0, 0]
    if sm_scale != 1.0:
        q = q * sm_scale
    k = k_ref[0, 0]
    v = v_ref[0, 0]

    col = jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (block, block), 0)
    diag_mask = col <= row

    def _half(lo, hi, masked):
        s = jax.lax.dot_general(
            q[lo:hi, :], k, TRANS_B_DIM_NUMBERS,
            preferred_element_type=jnp.float32, precision=precision,
        )
        if softcap is not None:
            s = softcap * jnp.tanh(s * (1.0 / softcap))
        if masked:
            s = jnp.where(diag_mask, s, DEFAULT_MASK_VALUE)
        _online_softmax_update(
            m_scratch, l_scratch, acc_scratch, s, v, lo, precision, hi
        )

    @pl.when(kv_idx < diag_lo)
    def _lo_interior():
        _half(0, block, masked=False)

    @pl.when(kv_idx == diag_lo)
    def _lo_diag():
        _half(0, block, masked=True)

    @pl.when(kv_idx < diag_lo + 1)
    def _hi_interior():
        _half(block, None, masked=False)

    @pl.when(kv_idx == diag_lo + 1)
    def _hi_diag():
        _half(block, None, masked=True)

    @pl.when(islast_ref[c] == 1)
    def _epilogue():
        _finalize(o_ref, lse_ref, m_scratch, l_scratch, acc_scratch,
                  sink_ref)


def flash_attention_forward(
    q: jax.Array,  # [batch, num_q_heads, q_len, head_dim] (padded, aligned)
    k: jax.Array,  # [batch, num_kv_heads, kv_len_padded, head_dim]
    v: jax.Array,
    *,
    causal: bool,
    sm_scale: float,
    block_sizes: BlockSizes,
    q_offset: int = 0,
    kv_len: Optional[int] = None,  # true kv length before padding
    save_residuals: bool = False,
    interpret: bool = False,
    triangular: bool = False,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    q_seg: Optional[jax.Array] = None,  # [batch, q_len] int32 (pre-padded)
    kv_seg: Optional[jax.Array] = None,  # [batch, kv_len_padded] int32
    sinks: Optional[jax.Array] = None,  # [num_q_heads] f32 sink logits
    alibi: Optional[jax.Array] = None,  # [num_q_heads] f32 ALiBi slopes
):
    """Launch the forward kernel on pre-padded inputs.

    Shapes must already satisfy: q_len % block_q == 0,
    kv_len_padded % block_kv_major == 0, head_dim % 128 == 0.
    Returns ``o`` or ``(o, lse)`` with lse of shape [b, hq, q_len]
    (logsumexp of scaled scores, the FA2 backward residual).

    ``triangular`` (causal only): enumerate active (q, kv) block cells in
    a 1-D scalar-prefetch grid instead of a rectangular grid with
    predicated dead cells — see _flash_fwd_tri_kernel.
    """
    batch, num_q_heads, q_len, head_dim = q.shape
    _, num_kv_heads, kv_len_padded, _ = k.shape
    if kv_len is None:
        kv_len = kv_len_padded
    q_per_kv = num_q_heads // num_kv_heads
    if window is not None and not causal:
        raise ValueError("window requires causal=True")

    block_q = min(block_sizes.block_q, q_len)
    block_kv_major = min(block_sizes.block_kv_major, kv_len_padded)
    block_kv = min(block_sizes.block_kv, block_kv_major)
    num_q_blocks = q_len // block_q
    num_kv_blocks = kv_len_padded // block_kv_major

    # Single-pass short-sequence path: plain (self-)attention whose f32
    # scores tile fits VMEM. Gates mirror the diag_sub launcher pattern —
    # out-of-scope calls fall through to the tiled grids. Row-count
    # selection (paired v5e A/Bs, BENCHLOG 2026-08-20): causal prefers
    # 512-row q blocks — the shrinking diagonal waste beats bigger-M MXU
    # occupancy at every seq (2K: 103.1 vs 99.4 TF/s; 4K: 142.9 vs the
    # tri grid's 112.4) while 256 rows lose (88.2) — so 256-row tiles are
    # accepted only when they hold the WHOLE q. Non-causal has no
    # diagonal waste and keeps the largest scores-feasible row count
    # (158.9 vs rect 134.7 at 2K, bq1024).
    if (
        getattr(block_sizes, "onepass", False)
        and q_offset == 0
        and kv_len == kv_len_padded
        and window is None
        and q_seg is None
        and (not causal or q_len == kv_len_padded)
    ):
        op_bq = min(512 if causal else 1024, block_q)
        while (
            op_bq > 128
            and op_bq * kv_len_padded * 4 > _ONEPASS_MAX_SCORES_BYTES
        ):
            op_bq //= 2
        # Causal <=2K: fuse ALL q-blocks of a head into one grid cell
        # (staircase of 512-row two-part bodies). Same matmul/mask
        # shapes as the per-q-block grid, 1/4 the grid cells: 2K causal
        # 119.5 -> 127.1 TF/s on v5e (BENCHLOG 2026-08-20 round 4). At
        # 4K+ the stairs' scores tiles exceed scoped VMEM (Mosaic does
        # not reuse the stack across stairs: 29.7M > 16M) and the
        # per-block grid is already at the measured matmul-mix ceiling.
        fuse_stairs = (
            causal
            and block_sizes.onepass_diag is None
            and q_len <= 2048
            and q_len % 512 == 0
            and q_len > 512
            and op_bq == 512
            and q_len == kv_len_padded
        )
        if fuse_stairs:
            return _forward_onepass(
                q, k, v,
                causal=causal, sm_scale=sm_scale, block_q=q_len,
                q_per_kv=q_per_kv, save_residuals=save_residuals,
                interpret=interpret, softcap=softcap, sinks=sinks,
                alibi=alibi, diag_rows=512,
            )
        if (
            op_bq >= min(512, q_len)
            and q_len % op_bq == 0
            and op_bq * kv_len_padded * 4 <= _ONEPASS_MAX_SCORES_BYTES
            and (not causal or q_len // op_bq <= 8)
        ):
            # Diagonal treatment policy (paired v5e A/Bs, BENCHLOG
            # 2026-08-20 round 4): "two-part" — unmasked full-M prefix +
            # one full-width masked diagonal block, merged once
            # (diag_rows == block_q) — wins at every seq: mask iotas/
            # where shrink from [bq, extent] to [bq, bq] (4K causal
            # 136.1 → 149.9 TF/s, 2K 117.2 → 120.6). Row-sliced
            # diagonals (diag_rows < block_q) cut the diagonal's masked
            # FLOPs too but their slice granularity costs more than the
            # cut saves (4K rs128: 146.1 < 149.9; 2K rs128: 111 < 121).
            # BlockSizes.onepass_diag overrides; 0 forces off.
            diag_rows = getattr(block_sizes, "onepass_diag", None)
            if diag_rows is None and causal:
                diag_rows = op_bq
            if not diag_rows or diag_rows > op_bq or op_bq % diag_rows:
                diag_rows = None
            return _forward_onepass(
                q, k, v,
                causal=causal, sm_scale=sm_scale, block_q=op_bq,
                q_per_kv=q_per_kv, save_residuals=save_residuals,
                interpret=interpret, softcap=softcap, sinks=sinks,
                alibi=alibi, diag_rows=diag_rows,
            )

    if causal:
        # Clamp the KV index past the diagonal so masked-out blocks re-map to
        # the diagonal block — Pallas elides refetches of an unchanged block,
        # so above-diagonal K/V tiles never leave HBM. With a sliding window,
        # also clamp below the window's first block.
        def kv_block_index(q, kv):
            last = ((q + 1) * block_q - 1 + q_offset) // block_kv_major
            kv = jnp.minimum(kv, last)
            if window is not None:
                first = jnp.maximum(
                    (q * block_q + q_offset - window + 1) // block_kv_major, 0
                )
                kv = jnp.maximum(kv, first)
            return kv

    else:

        def kv_block_index(q, kv):
            return kv

    grid = (batch, num_q_heads, num_q_blocks, num_kv_blocks)

    in_specs = [
        pl.BlockSpec(
            (1, 1, block_q, head_dim), lambda b, h, q, kv: (b, h, q, 0)
        ),
        pl.BlockSpec(
            (1, 1, block_kv_major, head_dim),
            lambda b, h, q, kv: (b, h // q_per_kv, kv_block_index(q, kv), 0),
        ),
        pl.BlockSpec(
            (1, 1, block_kv_major, head_dim),
            lambda b, h, q, kv: (b, h // q_per_kv, kv_block_index(q, kv), 0),
        ),
    ]
    have_seg = q_seg is not None
    extra_inputs = ()
    if have_seg:
        # Lane-replicated q ids and sublane-replicated kv ids: the hardware
        # layouts the (block_q x block_kv) equality mask builds from with
        # one tile/broadcast each (the splash-attention segment-id scheme).
        qseg_l = jax.lax.broadcast_in_dim(
            q_seg.astype(jnp.int32), (batch, q_len, NUM_LANES), (0, 1)
        )
        kvseg_s = jax.lax.broadcast_in_dim(
            kv_seg.astype(jnp.int32), (batch, 8, kv_len_padded), (0, 2)
        )
        in_specs += [
            pl.BlockSpec(
                (1, block_q, NUM_LANES), lambda b, h, q, kv: (b, q, 0)
            ),
            pl.BlockSpec(
                (1, 8, block_kv_major),
                lambda b, h, q, kv: (b, 0, kv_block_index(q, kv)),
            ),
        ]
        extra_inputs = (qseg_l, kvseg_s)
    have_sink = sinks is not None
    if have_sink:
        sinks_l = jax.lax.broadcast_in_dim(
            sinks.astype(jnp.float32), (num_q_heads, NUM_LANES), (0,)
        )
        in_specs.append(
            pl.BlockSpec((1, NUM_LANES), lambda b, h, q, kv: (h, 0))
        )
        extra_inputs = extra_inputs + (sinks_l,)
    have_alibi = alibi is not None
    if have_alibi:
        if not causal:
            raise ValueError("alibi requires causal=True")
        alibi_l = jax.lax.broadcast_in_dim(
            alibi.astype(jnp.float32), (num_q_heads, NUM_LANES), (0,)
        )
        in_specs.append(
            pl.BlockSpec((1, NUM_LANES), lambda b, h, q, kv: (h, 0))
        )
        extra_inputs = extra_inputs + (alibi_l,)
    out_shapes = [
        jax.ShapeDtypeStruct(q.shape, q.dtype),
    ]
    out_specs = [
        pl.BlockSpec(
            (1, 1, block_q, head_dim), lambda b, h, q, kv: (b, h, q, 0)
        ),
    ]
    if save_residuals:
        out_shapes.append(
            jax.ShapeDtypeStruct(
                (batch, num_q_heads, q_len, NUM_LANES), jnp.float32
            )
        )
        out_specs.append(
            pl.BlockSpec(
                (1, 1, block_q, NUM_LANES), lambda b, h, q, kv: (b, h, q, 0)
            )
        )

    base_kernel = functools.partial(
        _flash_fwd_kernel,
        causal=causal,
        sm_scale=sm_scale,
        block_kv=block_kv,
        q_offset=q_offset,
        kv_len=kv_len,
        num_kv_blocks=num_kv_blocks,
        mask_kv_tail=kv_len < kv_len_padded,
        window=window,
        softcap=softcap,
    )
    # Splice Nones for the optional refs absent from the positional list.
    def kernel(*refs):
        it = iter(refs)
        q_r, k_r, v_r = next(it), next(it), next(it)
        qs_r = next(it) if have_seg else None
        ks_r = next(it) if have_seg else None
        sk_r = next(it) if have_sink else None
        al_r = next(it) if have_alibi else None
        o_r = next(it)
        lse_r = next(it) if save_residuals else None
        m_s, l_s, acc_s = next(it), next(it), next(it)
        return base_kernel(
            q_r, k_r, v_r, qs_r, ks_r, sk_r, al_r, o_r, lse_r,
            m_s, l_s, acc_s,
        )

    scratch_shapes = [
        pltpu.VMEM((block_q, NUM_LANES), jnp.float32),  # m
        pltpu.VMEM((block_q, NUM_LANES), jnp.float32),  # l
        pltpu.VMEM((block_q, head_dim), jnp.float32),  # acc
    ]

    if causal and (triangular or block_sizes.triangular):
        # Paired-q geometry (opt-in, BlockSizes.tri_pair): two adjacent
        # q-blocks share each K/V fetch — same active-FLOP count, ~45%
        # less K/V HBM traffic at 8 q-blocks. Gates mirror diag_sub's
        # (plain causal self-attention, square single-level blocks)
        # plus an even q-block count and no residual-saving extras the
        # tri2 kernel doesn't carry (window/segments/alibi).
        if (
            getattr(block_sizes, "tri_pair", False)
            and q_offset == 0
            and kv_len == kv_len_padded
            and q_len == kv_len_padded
            and window is None
            and q_seg is None
            and alibi is None
            and block_q == block_kv_major == block_kv
            and num_q_blocks % 2 == 0
            and num_q_blocks >= 2
        ):
            return _forward_tri_paired(
                q, k, v,
                sm_scale=sm_scale, block=block_q,
                num_q_blocks=num_q_blocks, q_per_kv=q_per_kv,
                save_residuals=save_residuals, interpret=interpret,
                softcap=softcap, sinks=sinks,
            )
        # Diagonal sub-tiling applies only to the plain causal
        # self-attention cell geometry where thr == 0 identifies diagonal
        # cells exactly (see _flash_fwd_tri_kernel). Default (None) is the
        # measured winner diag_sub == block: interior cells skip the mask
        # iotas/where entirely and the diagonal stays one full-width
        # masked chunk (8K causal 119.7 -> 125.7 TF/s on v5e, BENCHLOG
        # 2026-08-20 round 4; genuine row-slicing like 512 loses, 112.9 —
        # same granularity tax the onepass A/Bs measured). 0 forces the
        # mask-everywhere path.
        diag_sub = getattr(block_sizes, "diag_sub", None)
        if diag_sub is None:
            diag_sub = block_q
        elif diag_sub == 0:
            diag_sub = None
        if diag_sub is not None and not (
            q_offset == 0
            and kv_len == kv_len_padded
            and window is None
            and q_seg is None
            and alibi is None
            and block_q == block_kv_major == block_kv
            and block_q % diag_sub == 0
            and diag_sub % 128 == 0
        ):
            diag_sub = None
        return _forward_triangular(
            q, k, v,
            sm_scale=sm_scale, block_q=block_q,
            block_kv_major=block_kv_major, block_kv=block_kv,
            q_offset=q_offset, kv_len=kv_len,
            num_q_blocks=num_q_blocks, num_kv_blocks=num_kv_blocks,
            q_per_kv=q_per_kv, save_residuals=save_residuals,
            interpret=interpret, window=window, softcap=softcap,
            q_seg=q_seg, kv_seg=kv_seg, sinks=sinks, alibi=alibi,
            diag_sub=diag_sub,
        )

    # 2 matmuls (QK^T and PV), 2*M*N*K flops each.
    cost = pl.CostEstimate(
        flops=4 * batch * num_q_heads * q_len * kv_len_padded * head_dim,
        bytes_accessed=(
            q.size * q.dtype.itemsize
            + k.size * k.dtype.itemsize
            + v.size * v.dtype.itemsize
            + q.size * q.dtype.itemsize  # O
        ),
        transcendentals=batch * num_q_heads * q_len * kv_len_padded,
    )

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(q, k, v, *extra_inputs)

    o = outs[0]
    if save_residuals:
        lse = outs[1][..., 0]  # lanes are replicated; keep one
        return o, lse
    return o


def build_tri_cells(
    num_q_blocks: int,
    num_kv_blocks: int,
    block_q: int,
    block_kv_major: int,
    q_offset: int,
    window: Optional[int] = None,
):
    """(qmap, kvmap, islast) int32 arrays enumerating the causally-active
    (q, kv) block cells in q-major order — the scalar-prefetch inputs of
    the triangular kernels. With ``window`` the enumeration is the active
    BAND: cells entirely below the Q block's sliding window are dropped."""
    import numpy as np

    qmap, kvmap, islast = [], [], []
    for qb in range(num_q_blocks):
        last = min(
            num_kv_blocks - 1,
            ((qb + 1) * block_q - 1 + q_offset) // block_kv_major,
        )
        first = 0
        if window is not None:
            first = max(
                0, (qb * block_q + q_offset - window + 1) // block_kv_major
            )
        for kvb in range(first, last + 1):
            qmap.append(qb)
            kvmap.append(kvb)
            islast.append(1 if kvb == last else 0)
    return (
        jnp.asarray(np.asarray(qmap, np.int32)),
        jnp.asarray(np.asarray(kvmap, np.int32)),
        jnp.asarray(np.asarray(islast, np.int32)),
    )


def _forward_triangular(
    q, k, v, *, sm_scale, block_q, block_kv_major, block_kv, q_offset,
    kv_len, num_q_blocks, num_kv_blocks, q_per_kv, save_residuals,
    interpret, window=None, softcap=None, q_seg=None, kv_seg=None,
    sinks=None, alibi=None, diag_sub=None,
):
    """Causal forward over the active-cell enumeration (triangular grid)."""
    batch, num_q_heads, q_len, head_dim = q.shape
    kv_len_padded = k.shape[2]

    qmap, kvmap, islast = build_tri_cells(
        num_q_blocks, num_kv_blocks, block_q, block_kv_major, q_offset,
        window=window,
    )
    n_cells = qmap.shape[0]

    in_specs = [
        pl.BlockSpec(
            (1, 1, block_q, head_dim),
            lambda b, h, c, qm, km, il: (b, h, qm[c], 0),
        ),
        pl.BlockSpec(
            (1, 1, block_kv_major, head_dim),
            lambda b, h, c, qm, km, il: (b, h // q_per_kv, km[c], 0),
        ),
        pl.BlockSpec(
            (1, 1, block_kv_major, head_dim),
            lambda b, h, c, qm, km, il: (b, h // q_per_kv, km[c], 0),
        ),
    ]
    have_seg = q_seg is not None
    extra_inputs = ()
    if have_seg:
        qseg_l = jax.lax.broadcast_in_dim(
            q_seg.astype(jnp.int32), (batch, q_len, NUM_LANES), (0, 1)
        )
        kvseg_s = jax.lax.broadcast_in_dim(
            kv_seg.astype(jnp.int32), (batch, 8, kv_len_padded), (0, 2)
        )
        in_specs += [
            pl.BlockSpec(
                (1, block_q, NUM_LANES),
                lambda b, h, c, qm, km, il: (b, qm[c], 0),
            ),
            pl.BlockSpec(
                (1, 8, block_kv_major),
                lambda b, h, c, qm, km, il: (b, 0, km[c]),
            ),
        ]
        extra_inputs = (qseg_l, kvseg_s)
    have_sink = sinks is not None
    if have_sink:
        sinks_l = jax.lax.broadcast_in_dim(
            sinks.astype(jnp.float32), (num_q_heads, NUM_LANES), (0,)
        )
        in_specs.append(
            pl.BlockSpec((1, NUM_LANES), lambda b, h, c, qm, km, il: (h, 0))
        )
        extra_inputs = extra_inputs + (sinks_l,)
    have_alibi = alibi is not None
    if have_alibi:
        alibi_l = jax.lax.broadcast_in_dim(
            alibi.astype(jnp.float32), (num_q_heads, NUM_LANES), (0,)
        )
        in_specs.append(
            pl.BlockSpec((1, NUM_LANES), lambda b, h, c, qm, km, il: (h, 0))
        )
        extra_inputs = extra_inputs + (alibi_l,)
    out_shapes = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    out_specs = [
        pl.BlockSpec(
            (1, 1, block_q, head_dim),
            lambda b, h, c, qm, km, il: (b, h, qm[c], 0),
        ),
    ]
    if save_residuals:
        out_shapes.append(
            jax.ShapeDtypeStruct(
                (batch, num_q_heads, q_len, NUM_LANES), jnp.float32
            )
        )
        out_specs.append(
            pl.BlockSpec(
                (1, 1, block_q, NUM_LANES),
                lambda b, h, c, qm, km, il: (b, h, qm[c], 0),
            )
        )

    base_kernel = functools.partial(
        _flash_fwd_tri_kernel,
        sm_scale=sm_scale,
        block_kv=block_kv,
        q_offset=q_offset,
        kv_len=kv_len,
        mask_kv_tail=kv_len < kv_len_padded,
        window=window,
        softcap=softcap,
        diag_sub=diag_sub,
    )
    def kernel(*refs):
        it = iter(refs)
        qm, km, il = next(it), next(it), next(it)
        q_r, k_r, v_r = next(it), next(it), next(it)
        qs_r = next(it) if have_seg else None
        ks_r = next(it) if have_seg else None
        sk_r = next(it) if have_sink else None
        al_r = next(it) if have_alibi else None
        o_r = next(it)
        lse_r = next(it) if save_residuals else None
        m_s, l_s, acc_s = next(it), next(it), next(it)
        return base_kernel(
            qm, km, il, q_r, k_r, v_r, qs_r, ks_r, sk_r, al_r, o_r, lse_r,
            m_s, l_s, acc_s,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(batch, num_q_heads, n_cells),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),  # m
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),  # l
            pltpu.VMEM((block_q, head_dim), jnp.float32),  # acc
        ],
    )
    cell_tokens = n_cells * block_q * block_kv_major
    cost = pl.CostEstimate(
        flops=4 * batch * num_q_heads * cell_tokens * head_dim,
        bytes_accessed=(
            q.size * q.dtype.itemsize
            + k.size * k.dtype.itemsize
            + v.size * v.dtype.itemsize
            + q.size * q.dtype.itemsize
        ),
        transcendentals=batch * num_q_heads * cell_tokens,
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(qmap, kvmap, islast, q, k, v, *extra_inputs)

    o = outs[0]
    if save_residuals:
        return o, outs[1][..., 0]
    return o


def build_tri2_cells(num_pairs: int):
    """(pmap, kvmap, islast) int32 arrays enumerating the PAIRED causal
    cells: pair p = q-blocks (2p, 2p+1) walks kv blocks 0..2p+1 once —
    the scalar-prefetch inputs of _flash_fwd_tri2_kernel."""
    import numpy as np

    pmap, kvmap, islast = [], [], []
    for p in range(num_pairs):
        for kv in range(2 * p + 2):
            pmap.append(p)
            kvmap.append(kv)
            islast.append(1 if kv == 2 * p + 1 else 0)
    return (
        jnp.asarray(np.asarray(pmap, np.int32)),
        jnp.asarray(np.asarray(kvmap, np.int32)),
        jnp.asarray(np.asarray(islast, np.int32)),
    )


def _forward_tri_paired(
    q, k, v, *, sm_scale, block, num_q_blocks, q_per_kv, save_residuals,
    interpret, softcap=None, sinks=None,
):
    """Causal forward with two adjacent q-blocks sharing each K/V fetch
    (see _flash_fwd_tri2_kernel). Launcher-gated: plain causal
    self-attention, square blocks, even q-block count."""
    batch, num_q_heads, q_len, head_dim = q.shape

    num_pairs = num_q_blocks // 2
    pmap, kvmap, islast = build_tri2_cells(num_pairs)
    n_cells = pmap.shape[0]

    in_specs = [
        pl.BlockSpec(
            (1, 1, 2 * block, head_dim),
            lambda b, h, c, pm, km, il: (b, h, pm[c], 0),
        ),
        pl.BlockSpec(
            (1, 1, block, head_dim),
            lambda b, h, c, pm, km, il: (b, h // q_per_kv, km[c], 0),
        ),
        pl.BlockSpec(
            (1, 1, block, head_dim),
            lambda b, h, c, pm, km, il: (b, h // q_per_kv, km[c], 0),
        ),
    ]
    extra_inputs = ()
    have_sink = sinks is not None
    if have_sink:
        sinks_l = jax.lax.broadcast_in_dim(
            sinks.astype(jnp.float32), (num_q_heads, NUM_LANES), (0,)
        )
        in_specs.append(
            pl.BlockSpec((1, NUM_LANES), lambda b, h, c, pm, km, il: (h, 0))
        )
        extra_inputs = (sinks_l,)
    out_shapes = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    out_specs = [
        pl.BlockSpec(
            (1, 1, 2 * block, head_dim),
            lambda b, h, c, pm, km, il: (b, h, pm[c], 0),
        ),
    ]
    if save_residuals:
        out_shapes.append(
            jax.ShapeDtypeStruct(
                (batch, num_q_heads, q_len, NUM_LANES), jnp.float32
            )
        )
        out_specs.append(
            pl.BlockSpec(
                (1, 1, 2 * block, NUM_LANES),
                lambda b, h, c, pm, km, il: (b, h, pm[c], 0),
            )
        )

    base_kernel = functools.partial(
        _flash_fwd_tri2_kernel, sm_scale=sm_scale, softcap=softcap,
    )

    def kernel(*refs):
        it = iter(refs)
        pm, km, il = next(it), next(it), next(it)
        q_r, k_r, v_r = next(it), next(it), next(it)
        sk_r = next(it) if have_sink else None
        o_r = next(it)
        lse_r = next(it) if save_residuals else None
        m_s, l_s, acc_s = next(it), next(it), next(it)
        return base_kernel(
            pm, km, il, q_r, k_r, v_r, sk_r, o_r, lse_r, m_s, l_s, acc_s,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(batch, num_q_heads, n_cells),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2 * block, NUM_LANES), jnp.float32),  # m
            pltpu.VMEM((2 * block, NUM_LANES), jnp.float32),  # l
            pltpu.VMEM((2 * block, head_dim), jnp.float32),  # acc
        ],
    )
    # Active (q_row, kv_col) products: pair p runs (2p+1) full-block
    # halves plus one diagonal half per side — same count as the plain
    # triangular enumeration.
    active = sum(
        (2 * p + 1) * 2 * block * block + block * block
        for p in range(num_pairs)
    )
    cost = pl.CostEstimate(
        flops=4 * batch * num_q_heads * active * head_dim,
        bytes_accessed=(
            q.size * q.dtype.itemsize
            + k.size * k.dtype.itemsize
            + v.size * v.dtype.itemsize
            + q.size * q.dtype.itemsize
        ),
        transcendentals=batch * num_q_heads * active,
    )

    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(pmap, kvmap, islast, q, k, v, *extra_inputs)

    o = outs[0]
    if save_residuals:
        return o, outs[1][..., 0]
    return o
