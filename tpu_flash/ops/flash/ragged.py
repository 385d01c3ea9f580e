"""Ragged (mixed-stage) prefill attention kernel.

One dispatch for a BATCH of prefill chunks whose sequences are at
*different* stages: row ``b`` holds a chunk of queries at absolute
positions ``[q_offsets[b], q_offsets[b] + q_len)`` of its own sequence,
and its KV buffer is laid out as

    [ history (valid cols 0..q_offsets[b])  |  chunk keys  |  pad ]
      ^-- padded to the static hist_cap --^  ^- at hist_cap -^

i.e. every row's history is padded to one static ``hist_cap`` and the
chunk's own K/V sit at columns ``[hist_cap, hist_cap + q_len)``. Query
row ``i`` of batch ``b`` may attend history columns ``j < q_offsets[b]``
and chunk columns ``j - hist_cap <= i`` (causal). The per-row offset is a
scalar-prefetch input: fully-masked history tiles of shorter-history rows
are neither fetched (index-map remap) nor computed (predication) — the
TPU-native generalization of the reference's tile-level causal early-out
(utils.cuh:36-45) to per-sequence dynamic boundaries.

The engine uses this to fuse prefill chunks of DIFFERENT requests at
different prompt positions into ONE program call per step (continuous
batching without per-stage dispatches). The reference has no batching at
all — its kernel even miscomputes batch*heads > 1 (computers.cuh:33,42);
here batch rows are independent grid dimensions with per-row masking.

Toolchain note: the grid is 3-D with (batch, head) fused, and every
index map is a PURE scalar-prefetch lookup. Both constraints are
load-bearing on the current TPU toolchain: 4-D grids with scalar
prefetch, and index maps containing `//`/`%` on grid indices, each send
the Mosaic compile into a pathological (>10 min for a trivial kernel)
slow path. The whole (b, h, q, kv) -> kv-block mapping is therefore
precomputed into a small int32 tensor (in-jit, from the offsets) and
looked up by the index maps — the same pattern as the triangular causal
grid (forward.py), which is proven fast.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.core.config import BlockSizes
from tpu_flash.core.reference import DEFAULT_MASK_VALUE
from tpu_flash.utils.tuning import default_block_sizes

NUM_LANES = 128
TRANS_B_DIM_NUMBERS = (((1,), (1,)), ((), ()))


def _ragged_prefill_kernel(
    offs_ref,  # prefetch [batch*hq] int32: per-ROW history length, by bh
    kvh_ref,  # prefetch [batch*hq] int32: flattened kv-head index, by bh
    kvmap_ref,  # prefetch [batch*hq, nq, nkv] int32: kv block index map
    q_ref,  # [1, block_q, d]   (q flattened to [batch*hq, q_len, d])
    k_ref,  # [1, block_kv, d]  (k flattened to [batch*hkv, kv_len, d])
    v_ref,
    sink_ref,  # [1, NUM_LANES] f32 per-row sink logit or None
    alibi_ref,  # [1, NUM_LANES] f32 per-row ALiBi slope or None
    o_ref,
    m_scratch,  # VMEM [block_q, NUM_LANES] f32
    l_scratch,
    acc_scratch,  # VMEM [block_q, d] f32
    *,
    sm_scale: float,
    hist_cap: int,
    num_kv_blocks: int,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
):
    block_q = q_ref.shape[1]
    block_kv = k_ref.shape[1]
    bh = pl.program_id(0)
    q_idx = pl.program_id(1)
    kv_idx = pl.program_id(2)
    offs = offs_ref[bh]
    kv_base = kv_idx * block_kv

    @pl.when(kv_idx == 0)
    def _init():
        m_scratch[...] = jnp.full_like(m_scratch, -jnp.inf)
        l_scratch[...] = jnp.zeros_like(l_scratch)
        acc_scratch[...] = jnp.zeros_like(acc_scratch)

    # A tile contributes iff it overlaps the row's live history
    # (kv_base < offs) or the causally-visible part of the chunk region —
    # and, with a sliding window, reaches past the window's lower edge.
    # Absolute positions: history column j sits at j; chunk column c at
    # offs + (c - hist_cap); query row i at offs + i.
    max_q_pos = (q_idx + 1) * block_q - 1
    in_hist = kv_base < offs
    in_chunk = jnp.logical_and(
        kv_base + block_kv > hist_cap, kv_base <= hist_cap + max_q_pos
    )
    if window is not None:
        min_q_pos = q_idx * block_q
        # History tile: its last column must be >= the first row's window
        # start (offs + min_q_pos - window + 1).
        in_hist = jnp.logical_and(
            in_hist,
            kv_base + block_kv - 1 >= offs + min_q_pos - window + 1,
        )
        # Chunk tile: its last chunk column must be > min_q_pos - window.
        in_chunk = jnp.logical_and(
            in_chunk,
            kv_base + block_kv - 1 - hist_cap > min_q_pos - window,
        )
    should_run = jnp.logical_or(in_hist, in_chunk)

    precision = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    @pl.when(should_run)
    def _run():
        q = q_ref[0]
        if sm_scale != 1.0:
            q = q * sm_scale
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, TRANS_B_DIM_NUMBERS,
            preferred_element_type=jnp.float32, precision=precision,
        )
        if softcap is not None:
            s = softcap * jnp.tanh(s * (1.0 / softcap))
        col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
        col_glob = col + kv_base
        row_glob = row + q_idx * block_q
        vis_hist = col_glob < offs
        vis_chunk = jnp.logical_and(
            col_glob >= hist_cap, col_glob - hist_cap <= row_glob
        )
        if window is not None:
            # Window lower edge in absolute positions (query row_glob sits
            # at offs + row_glob): history col j visible iff
            # j > offs + row_glob - window; chunk col c iff
            # (c - hist_cap) > row_glob - window.
            vis_hist = jnp.logical_and(
                vis_hist, col_glob > offs + row_glob - window
            )
            vis_chunk = jnp.logical_and(
                vis_chunk, col_glob - hist_cap > row_glob - window
            )
        if alibi_ref is not None:
            # ALiBi distance kv_pos - q_pos: history col j is at absolute
            # j (query at offs + row_glob); chunk col c at offs +
            # (c - hist_cap). Masked columns are overwritten below.
            dist = jnp.where(
                col_glob >= hist_cap,
                col_glob - hist_cap - row_glob,
                col_glob - offs - row_glob,
            )
            s = s + alibi_ref[0:1, 0:1] * dist.astype(jnp.float32)
        s = jnp.where(
            jnp.logical_or(vis_hist, vis_chunk), s, DEFAULT_MASK_VALUE
        )

        m_prev = m_scratch[...]
        l_prev = l_scratch[...]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_curr)
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        l_scratch[...] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_scratch[...] = m_next

        v = v_ref[0]
        pv = jax.lax.dot(
            p.astype(v.dtype), v,
            preferred_element_type=jnp.float32, precision=precision,
        )
        acc_scratch[...] = acc_scratch[...] * alpha[:, :1] + pv

    # The chunk's diagonal tile is every row's final contribution (a query
    # always sees at least itself), so the epilogue index is static.
    last_kv = jnp.minimum(
        num_kv_blocks - 1, (hist_cap + max_q_pos) // block_kv
    )

    @pl.when(kv_idx == last_kv)
    def _epilogue():
        if sink_ref is None:
            l = l_scratch[:, :1]
            l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0] = (acc_scratch[...] * l_inv).astype(o_ref.dtype)
        else:
            # Per-head attention sink (shared epilogue math: forward.py).
            from tpu_flash.ops.flash.forward import sink_denominator

            scale_m, l_tot, _ = sink_denominator(
                m_scratch[...], l_scratch[...], sink_ref[0][None, :]
            )
            o_ref[0] = (
                acc_scratch[...] * (scale_m[:, :1] / l_tot[:, :1])
            ).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_axis(x: jax.Array, axis: int, target: int) -> jax.Array:
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def flash_attention_ragged(
    q: jax.Array,  # [B, hq, q_len, d] chunk queries
    k: jax.Array,  # [B, hkv, hist_cap + q_len, d] per the layout above
    v: jax.Array,
    q_offsets: jax.Array,  # [B] int32 per-row history length (<= hist_cap)
    *,
    hist_cap: int,
    sm_scale: Optional[float] = None,
    block_sizes: Optional[BlockSizes] = None,
    interpret: Optional[bool] = None,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,  # [num_q_heads] sink logits
    alibi: Optional[jax.Array] = None,  # [num_q_heads] ALiBi slopes
) -> jax.Array:
    """Mixed-stage chunk attention over [history | chunk] KV buffers.

    Returns [B, hq, q_len, d]. Equivalent, per row ``b``, to causal
    attention of the chunk at q_offset=q_offsets[b] over that row's first
    q_offsets[b] history tokens plus the chunk itself; history columns in
    [q_offsets[b], hist_cap) are ignored (padding/garbage allowed, but
    must be finite).

    ``window``: Mistral-style sliding window over absolute positions (the
    chunk's query i of row b sits at position q_offsets[b] + i); tiles
    entirely below a row's window are neither fetched nor computed.
    ``softcap``: Gemma-2-style tanh logit capping.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if window is not None and window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if softcap is not None and softcap <= 0:
        raise ValueError(f"softcap must be > 0, got {softcap}")
    batch, num_q_heads, q_len, head_dim = q.shape
    _, num_kv_heads, kv_len, _ = k.shape
    if kv_len != hist_cap + q_len:
        raise ValueError(
            f"kv length {kv_len} != hist_cap {hist_cap} + q_len {q_len}"
        )
    q_per_kv = num_q_heads // num_kv_heads
    if sm_scale is None:
        sm_scale = head_dim**-0.5
    if block_sizes is None:
        block_sizes = default_block_sizes(
            q_len, kv_len, head_dim, str(jnp.dtype(q.dtype))
        )

    # Alignment: lane-pad d, block-pad q and kv. KV tail padding is never
    # visible (chunk causality bounds col_glob - hist_cap <= row_glob).
    head_dim_p = _round_up(head_dim, NUM_LANES)
    block_q = min(block_sizes.block_q, _round_up(q_len, 8))
    q_len_p = _round_up(q_len, block_q)
    block_kv = min(block_sizes.block_kv_major, _round_up(kv_len, NUM_LANES))
    kv_len_p = _round_up(kv_len, block_kv)
    qp = _pad_axis(_pad_axis(q, 3, head_dim_p), 2, q_len_p)
    kp = _pad_axis(_pad_axis(k, 3, head_dim_p), 2, kv_len_p)
    vp = _pad_axis(_pad_axis(v, 3, head_dim_p), 2, kv_len_p)
    num_q_blocks = q_len_p // block_q
    num_kv_blocks = kv_len_p // block_kv
    first_chunk_blk = hist_cap // block_kv

    bh_total = batch * num_q_heads
    # Flatten (batch, head) so index maps need no grid-index decomposition.
    qf = qp.reshape(bh_total, q_len_p, head_dim_p)
    kf = kp.reshape(batch * num_kv_heads, kv_len_p, head_dim_p)
    vf = vp.reshape(batch * num_kv_heads, kv_len_p, head_dim_p)

    offs = q_offsets.astype(jnp.int32)
    offs_bh = jnp.repeat(offs, num_q_heads)  # [bh_total]
    kvh = jnp.asarray(
        np.repeat(np.arange(batch), num_q_heads) * num_kv_heads
        + (np.arange(bh_total) % num_q_heads) // q_per_kv,
        jnp.int32,
    )
    # Precompute the ENTIRE kv-block index map [bh, nq, nkv] (tiny):
    # fully-dead history tiles remap to the first chunk tile (next tile
    # actually read -> Pallas elides their fetches); tiles past the chunk
    # diagonal clamp to the diagonal.
    kvi = jnp.arange(num_kv_blocks, dtype=jnp.int32)
    qi = jnp.arange(num_q_blocks, dtype=jnp.int32)
    last_q = jnp.minimum(
        num_kv_blocks - 1,
        (hist_cap + (qi + 1) * block_q - 1) // block_kv,
    )  # [nq]
    if window is None:
        dead = jnp.logical_and(
            kvi[None, :] * block_kv >= offs_bh[:, None],
            (kvi[None, :] + 1) * block_kv <= hist_cap,
        )  # [bh, nkv]
        idx = jnp.where(dead, jnp.int32(first_chunk_blk), kvi[None, :])
        kvmap = jnp.minimum(idx[:, None, :], last_q[None, :, None])
    else:
        # Windowed map: mark the LIVE tiles per (row, q-block, kv-block)
        # exactly as the kernel's predicate does, then remap every dead
        # tile to the next live tile at a higher index (reverse cummin) so
        # runs of dead tiles alias the tile fetched right after them and
        # their DMAs are elided. Tiles with no live successor clamp to the
        # diagonal (always live: a query sees at least itself).
        kv_base = kvi[None, None, :] * block_kv  # [1, 1, nkv]
        kv_last = kv_base + block_kv - 1
        offs3 = offs_bh[:, None, None]
        min_qp = (qi * block_q)[None, :, None]
        max_qp = ((qi + 1) * block_q - 1)[None, :, None]
        live_hist = jnp.logical_and(
            kv_base < offs3,
            kv_last >= offs3 + min_qp - window + 1,
        )
        live_chunk = (
            (kv_last + 1 > hist_cap)
            & (kv_base <= hist_cap + max_qp)
            & (kv_last - hist_cap > min_qp - window)
        )
        live = jnp.logical_or(live_hist, live_chunk)  # [bh, nq, nkv]
        big = jnp.int32(num_kv_blocks)
        nxt = jax.lax.cummin(
            jnp.where(live, kvi[None, None, :], big), axis=2, reverse=True
        )
        kvmap = jnp.minimum(
            jnp.where(nxt >= big, last_q[None, :, None], nxt),
            last_q[None, :, None],
        )

    in_specs = [
        pl.BlockSpec(
            (1, block_q, head_dim_p),
            lambda bh, qi, kvi, offs, kvh, kvmap: (bh, qi, 0),
        ),
        pl.BlockSpec(
            (1, block_kv, head_dim_p),
            lambda bh, qi, kvi, offs, kvh, kvmap: (
                kvh[bh], kvmap[bh, qi, kvi], 0,
            ),
        ),
        pl.BlockSpec(
            (1, block_kv, head_dim_p),
            lambda bh, qi, kvi, offs, kvh, kvmap: (
                kvh[bh], kvmap[bh, qi, kvi], 0,
            ),
        ),
    ]
    call_inputs = (qf, kf, vf)

    def _per_bh_lanes(vals):
        # Per-bh-row lane-replicated values (the bh -> head mapping is
        # precomputed host-side; index maps stay pure lookups).
        return jnp.broadcast_to(
            jnp.tile(vals.astype(jnp.float32), batch)[:, None],
            (bh_total, NUM_LANES),
        )

    have_sink, have_alibi = sinks is not None, alibi is not None
    for vals, have in ((sinks, have_sink), (alibi, have_alibi)):
        if have:
            in_specs.append(
                pl.BlockSpec(
                    (1, NUM_LANES),
                    lambda bh, qi, kvi, offs, kvh, kvmap: (bh, 0),
                )
            )
            call_inputs = call_inputs + (_per_bh_lanes(vals),)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bh_total, num_q_blocks, num_kv_blocks),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec(
                (1, block_q, head_dim_p),
                lambda bh, qi, kvi, offs, kvh, kvmap: (bh, qi, 0),
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, head_dim_p), jnp.float32),
        ],
    )
    cost = pl.CostEstimate(
        flops=4 * batch * num_q_heads * q_len_p * kv_len_p * head_dim_p,
        bytes_accessed=(
            qf.size * qf.dtype.itemsize
            + kf.size * kf.dtype.itemsize
            + vf.size * vf.dtype.itemsize
            + qf.size * qf.dtype.itemsize
        ),
        transcendentals=batch * num_q_heads * q_len_p * kv_len_p,
    )
    base_kernel = functools.partial(
        _ragged_prefill_kernel,
        sm_scale=sm_scale,
        hist_cap=hist_cap,
        num_kv_blocks=num_kv_blocks,
        window=int(window) if window is not None else None,
        softcap=float(softcap) if softcap is not None else None,
    )
    def kernel(offs_r, kvh_r, kvmap_r, q_r, k_r, v_r, *rest):
        it = iter(rest)
        sk_r = next(it) if have_sink else None
        al_r = next(it) if have_alibi else None
        o_r, m_s, l_s, acc_s = next(it), next(it), next(it), next(it)
        return base_kernel(
            offs_r, kvh_r, kvmap_r, q_r, k_r, v_r, sk_r, al_r, o_r,
            m_s, l_s, acc_s,
        )

    (o,) = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bh_total, q_len_p, head_dim_p), q.dtype)
        ],
        compiler_params=pltpu.CompilerParams(
            # All-"arbitrary", like the decode kernel: "parallel" grid
            # semantics combined with control flow / masking that depends
            # on a PREFETCHED scalar (offs) sends the Mosaic compile into
            # a >10-minute slow path (measured 2026-08-17; with
            # "arbitrary" the same kernel compiles in seconds after the
            # per-process warmup).
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(offs_bh, kvh, kvmap, *call_inputs)
    o = o.reshape(batch, num_q_heads, q_len_p, head_dim_p)
    return o[:, :, :q_len, :head_dim]
