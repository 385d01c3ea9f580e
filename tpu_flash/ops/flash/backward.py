"""Pallas TPU flash-attention backward kernels (FA2-style).

The reference is forward/inference-only (no gradient code anywhere in its
tree); training support is part of this framework's capabilities contract, so
the backward pass is designed TPU-first rather than translated:

* Residuals are ``o`` and ``lse = logsumexp(scaled scores)`` — the softmax is
  *recomputed* per tile from ``p = exp(s - lse)``, never materialized.
* Two kernels with independent tilings (SURVEY.md §7 hard-parts list):
  - dKV: grid (batch, q_head, kv_block, q_block) — for a resident KV tile,
    stream Q/dO tiles and accumulate dK/dV in VMEM scratch.
  - dQ:  grid (batch, q_head, q_block, kv_block) — for a resident Q tile,
    stream K/V tiles and accumulate dQ in VMEM scratch.
* ``di = rowsum(o * do)`` is precomputed once in the wrapper and shared by
  both kernels.
* Causal blocks that are fully masked are skipped by grid predication, and
  their fetches are elided by clamped BlockSpec index maps (same trick as
  the forward kernel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.core.config import BlockSizes

NUM_LANES = 128

TRANS_B = (((1,), (1,)), ((), ()))  # a @ b.T
CONTRACT_0 = (((0,), (0,)), ((), ()))  # a.T @ b without explicit transpose


def _precision(dtype):
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _recompute_p(q, k, lse_col, *, sm_scale, causal, mask_kv_tail, kv_len,
                 q_pos0, kv_pos0, precision, window=None, softcap=None,
                 qseg_ref=None, kvseg_ref=None, alibi_ref=None):
    """Recompute attention weights p = exp(sm_scale * q k^T - lse), masked.

    Returns ``(p, dcap)`` where ``dcap`` is the softcap chain-rule factor
    ``1 - tanh(s/softcap)^2`` (None when softcap is off): with
    ``s_capped = softcap * tanh(s / softcap)``, d(s_capped)/ds = dcap.
    ``alibi_ref`` adds the forward's ``slope * (kv_pos - q_pos)`` bias
    before the exp — the bias is additive and position-only, so the
    ds/dq/dk chain is unchanged (and dcap still applies only to the
    capped QK^T term, matching the forward's cap-then-bias order).
    """
    block_q, block_kv = q.shape[0], k.shape[0]
    s = jax.lax.dot_general(
        q, k, TRANS_B, preferred_element_type=jnp.float32, precision=precision
    )
    if sm_scale != 1.0:
        s = s * sm_scale
    dcap = None
    if softcap is not None:
        t = jnp.tanh(s * (1.0 / softcap))
        s = softcap * t
        dcap = 1.0 - t * t
    row_ids = col_ids = None
    if (causal or mask_kv_tail or qseg_ref is not None
            or alibi_ref is not None):
        row_ids = q_pos0 + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_kv), 0
        )
        col_ids = kv_pos0 + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_kv), 1
        )
    if alibi_ref is not None:
        s = s + alibi_ref[0:1, 0:1] * (col_ids - row_ids).astype(
            jnp.float32
        )
    p = jnp.exp(s - lse_col)
    if causal or mask_kv_tail or qseg_ref is not None:
        mask = None
        if causal:
            mask = col_ids <= row_ids
            if window is not None:
                mask = jnp.logical_and(mask, col_ids > row_ids - window)
        if qseg_ref is not None:
            from tpu_flash.ops.flash.forward import _seg_mask

            seg = _seg_mask(qseg_ref, kvseg_ref, 0, block_q, block_kv)
            mask = seg if mask is None else jnp.logical_and(mask, seg)
        if mask_kv_tail:
            tail = col_ids < kv_len
            mask = tail if mask is None else jnp.logical_and(mask, tail)
        p = jnp.where(mask, p, 0.0)
    return p, dcap


def _flash_bwd_dkv_kernel(
    *args,  # [prefetch kvmap/qmap/isfirst/islast when triangular,] q_ref,
    # k_ref, v_ref, do_ref, lse_ref, di_ref, dk_ref, dv_ref, dk_scratch,
    # dv_scratch
    causal: bool,
    sm_scale: float,
    q_offset: int,
    kv_len: int,
    mask_kv_tail: bool,
    num_q_blocks: int,
    triangular: bool = False,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    have_seg: bool = False,
    have_alibi: bool = False,
):
    it = iter(args)
    if triangular:
        kvmap_ref, qmap_ref, isfirst_ref, islast_ref = (
            next(it), next(it), next(it), next(it),
        )
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref = (
        next(it), next(it), next(it), next(it), next(it), next(it),
    )
    qseg_ref = next(it) if have_seg else None
    kvseg_ref = next(it) if have_seg else None
    alibi_ref = next(it) if have_alibi else None
    dk_ref, dv_ref, dk_scratch, dv_scratch = (
        next(it), next(it), next(it), next(it),
    )
    if triangular:
        c = pl.program_id(2)
        kv_idx = kvmap_ref[c]
        q_idx = qmap_ref[c]
        init_now = isfirst_ref[c] == 1
        is_last = islast_ref[c] == 1
    else:
        kv_idx = pl.program_id(2)
        q_idx = pl.program_id(3)
        init_now = q_idx == 0
        is_last = q_idx == num_q_blocks - 1
    block_q = q_ref.shape[2]
    block_kv = k_ref.shape[2]

    @pl.when(init_now)
    def _init():
        dk_scratch[...] = jnp.zeros_like(dk_scratch)
        dv_scratch[...] = jnp.zeros_like(dv_scratch)

    if causal and not triangular:
        max_q_pos = (q_idx + 1) * block_q - 1 + q_offset
        should_run = max_q_pos >= kv_idx * block_kv
        if window is not None:
            # Skip q tiles entirely past this kv tile's window reach.
            min_q_pos = q_idx * block_q + q_offset
            max_kv_pos = (kv_idx + 1) * block_kv - 1
            should_run = jnp.logical_and(
                should_run, min_q_pos <= max_kv_pos + window - 1
            )
    else:
        should_run = True  # triangular: only active cells exist

    precision = _precision(q_ref.dtype)

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse_col = lse_ref[0, 0][:, :1]
        di_col = di_ref[0, 0][:, :1]

        p, dcap = _recompute_p(
            q, k, lse_col,
            sm_scale=sm_scale, causal=causal, mask_kv_tail=mask_kv_tail,
            kv_len=kv_len, q_pos0=q_offset + q_idx * block_q,
            kv_pos0=kv_idx * block_kv, precision=precision,
            window=window, softcap=softcap,
            qseg_ref=qseg_ref, kvseg_ref=kvseg_ref, alibi_ref=alibi_ref,
        )

        # dv += p^T @ do    (contract over the q dimension, no transpose op)
        dv_scratch[...] += jax.lax.dot_general(
            p.astype(do.dtype), do, CONTRACT_0,
            preferred_element_type=jnp.float32, precision=precision,
        )
        # dp = do @ v^T ; ds = p * (dp - di) [* dcap] * sm_scale
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), TRANS_B,
            preferred_element_type=jnp.float32, precision=precision,
        )
        ds = p * (dp - di_col)
        if dcap is not None:
            ds = ds * dcap
        if sm_scale != 1.0:
            ds = ds * sm_scale
        # dk += ds^T @ q
        dk_scratch[...] += jax.lax.dot_general(
            ds.astype(q.dtype), q, CONTRACT_0,
            preferred_element_type=jnp.float32, precision=precision,
        )

    @pl.when(is_last)
    def _epilogue():
        dk_ref[0, 0] = dk_scratch[...].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scratch[...].astype(dv_ref.dtype)


def _flash_bwd_dq_kernel(
    *args,  # [prefetch qmap/kvmap/islast when triangular,] q_ref, k_ref,
    # v_ref, do_ref, lse_ref, di_ref, dq_ref, dq_scratch
    causal: bool,
    sm_scale: float,
    q_offset: int,
    kv_len: int,
    mask_kv_tail: bool,
    num_kv_blocks: int,
    triangular: bool = False,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    have_seg: bool = False,
    have_alibi: bool = False,
):
    it = iter(args)
    if triangular:
        qmap_ref, kvmap_ref, islast_ref = next(it), next(it), next(it)
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref = (
        next(it), next(it), next(it), next(it), next(it), next(it),
    )
    qseg_ref = next(it) if have_seg else None
    kvseg_ref = next(it) if have_seg else None
    alibi_ref = next(it) if have_alibi else None
    dq_ref, dq_scratch = next(it), next(it)
    if triangular:
        c = pl.program_id(2)
        q_idx = qmap_ref[c]
        kv_idx = kvmap_ref[c]
        is_last = islast_ref[c] == 1
        should_run = True  # only active cells are enumerated
    else:
        q_idx = pl.program_id(2)
        kv_idx = pl.program_id(3)
        if causal:
            block_q_ = q_ref.shape[2]
            block_kv_ = k_ref.shape[2]
            max_q_pos = (q_idx + 1) * block_q_ - 1 + q_offset
            should_run = max_q_pos >= kv_idx * block_kv_
            if window is not None:
                min_q_pos = q_idx * block_q_ + q_offset
                max_kv_pos = (kv_idx + 1) * block_kv_ - 1
                should_run = jnp.logical_and(
                    should_run, max_kv_pos >= min_q_pos - window + 1
                )
            is_last = kv_idx == jnp.minimum(
                num_kv_blocks - 1,
                ((q_idx + 1) * block_q_ - 1 + q_offset) // block_kv_,
            )
        else:
            should_run = True
            is_last = kv_idx == num_kv_blocks - 1
    block_q = q_ref.shape[2]
    block_kv = k_ref.shape[2]

    if window is None:
        first_kv = 0
    else:
        first_kv = jnp.maximum(
            (q_idx * block_q + q_offset - window + 1) // block_kv, 0
        )

    @pl.when(kv_idx == first_kv)
    def _init():
        dq_scratch[...] = jnp.zeros_like(dq_scratch)

    precision = _precision(q_ref.dtype)

    @pl.when(should_run)
    def _run():
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0].astype(jnp.float32)
        lse_col = lse_ref[0, 0][:, :1]
        di_col = di_ref[0, 0][:, :1]

        p, dcap = _recompute_p(
            q, k, lse_col,
            sm_scale=sm_scale, causal=causal, mask_kv_tail=mask_kv_tail,
            kv_len=kv_len, q_pos0=q_offset + q_idx * block_q,
            kv_pos0=kv_idx * block_kv, precision=precision,
            window=window, softcap=softcap,
            qseg_ref=qseg_ref, kvseg_ref=kvseg_ref, alibi_ref=alibi_ref,
        )
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), TRANS_B,
            preferred_element_type=jnp.float32, precision=precision,
        )
        ds = p * (dp - di_col)
        if dcap is not None:
            ds = ds * dcap
        if sm_scale != 1.0:
            ds = ds * sm_scale
        dq_scratch[...] += jax.lax.dot(
            ds.astype(k.dtype), k,
            preferred_element_type=jnp.float32, precision=precision,
        )

    @pl.when(is_last)
    def _epilogue():
        dq_ref[0, 0] = dq_scratch[...].astype(dq_ref.dtype)


def _bwd_dq_onepass_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, alibi_ref, dq_ref,
    *, causal: bool, sm_scale: float, num_q_blocks: int,
    softcap: Optional[float] = None,
):
    """Single-pass dQ: one q-block against its FULL (causal) KV extent —
    resident K/V, p recomputed once, dq written directly (no scratch
    accumulation). The backward face of the forward single-pass kernel
    (measured +31% on the 2K grad step vs bt1024, BENCHLOG 2026-08-20)."""
    block_q = q_ref.shape[2]
    kv_len = k_ref.shape[2]
    qb = pl.program_id(2)
    precision = _precision(q_ref.dtype)
    q = q_ref[0, 0]
    do = do_ref[0, 0].astype(jnp.float32)
    lse_col = lse_ref[0, 0][:, :1]
    di_col = di_ref[0, 0][:, :1]

    def _body(extent: int, thr: int):
        k = k_ref[0, 0, :extent, :]
        v = v_ref[0, 0, :extent, :]
        p, dcap = _recompute_p(
            q, k, lse_col,
            sm_scale=sm_scale, causal=causal, mask_kv_tail=False,
            kv_len=extent, q_pos0=thr, kv_pos0=0, precision=precision,
            softcap=softcap, alibi_ref=alibi_ref,
        )
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), TRANS_B,
            preferred_element_type=jnp.float32, precision=precision,
        )
        ds = p * (dp - di_col)
        if dcap is not None:
            ds = ds * dcap
        if sm_scale != 1.0:
            ds = ds * sm_scale
        dq_ref[0, 0] = jax.lax.dot(
            ds.astype(k.dtype), k,
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(dq_ref.dtype)

    if causal and num_q_blocks > 1:
        for i in range(num_q_blocks):
            @pl.when(qb == i)
            def _branch(i=i):
                _body((i + 1) * block_q, i * block_q)
    else:
        _body(kv_len, 0)


def _bwd_dkv_onepass_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, di_ref, alibi_ref, dk_ref,
    dv_ref, *, causal: bool, sm_scale: float, num_kv_blocks: int,
    q_len: int, softcap: Optional[float] = None,
):
    """Single-pass dKV (kv-major): one kv-block against its FULL causal
    q extent — resident Q/dO/residuals, dk/dv written directly."""
    block_kv = k_ref.shape[2]
    kvb = pl.program_id(2)
    precision = _precision(q_ref.dtype)
    k = k_ref[0, 0]
    v = v_ref[0, 0]

    def _body(start: int):
        qs = q_ref[0, 0, start:, :]
        do = do_ref[0, 0, start:, :].astype(jnp.float32)
        lse_col = lse_ref[0, 0, start:, :][:, :1]
        di_col = di_ref[0, 0, start:, :][:, :1]
        # Global positions: q rows start at `start`, kv cols at
        # kvb*block_kv == start for causal (the diagonal aligns).
        p, dcap = _recompute_p(
            qs, k, lse_col,
            sm_scale=sm_scale, causal=causal, mask_kv_tail=False,
            kv_len=block_kv, q_pos0=start, kv_pos0=start,
            precision=precision, softcap=softcap, alibi_ref=alibi_ref,
        )
        dv_ref[0, 0] = jax.lax.dot_general(
            p.astype(do.dtype), do, CONTRACT_0,
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), TRANS_B,
            preferred_element_type=jnp.float32, precision=precision,
        )
        ds = p * (dp - di_col)
        if dcap is not None:
            ds = ds * dcap
        if sm_scale != 1.0:
            ds = ds * sm_scale
        dk_ref[0, 0] = jax.lax.dot_general(
            ds.astype(qs.dtype), qs, CONTRACT_0,
            preferred_element_type=jnp.float32, precision=precision,
        ).astype(dk_ref.dtype)

    if causal and num_kv_blocks > 1:
        for j in range(num_kv_blocks):
            @pl.when(kvb == j)
            def _branch(j=j):
                _body(j * block_kv)
    else:
        _body(0)


def _backward_onepass(
    q, k, v, do, lse_rep, di_rep, *, causal, sm_scale, block, q_per_kv,
    interpret, softcap=None, alibi_l=None,
):
    """Launch the single-pass backward pair (see the kernels above)."""
    batch, num_q_heads, q_len, head_dim = q.shape
    kv_len_padded = k.shape[2]
    nb_q = q_len // block
    nb_kv = kv_len_padded // block
    have_alibi = alibi_l is not None

    def specs(maps):
        out = [
            pl.BlockSpec((1, 1, n, head_dim), m)
            for n, m in maps
        ]
        return out

    qb = lambda b_, h, c: (b_, h, c, 0)  # noqa: E731
    full_q = lambda b_, h, c: (b_, h, 0, 0)  # noqa: E731
    kv_full = lambda b_, h, c: (b_, h // q_per_kv, 0, 0)  # noqa: E731
    kvb = lambda b_, h, c: (b_, h // q_per_kv, c, 0)  # noqa: E731

    dq_in = specs([
        (block, qb), (kv_len_padded, kv_full), (kv_len_padded, kv_full),
        (block, qb),
    ]) + [
        pl.BlockSpec((1, 1, block, NUM_LANES), qb),
        pl.BlockSpec((1, 1, block, NUM_LANES), qb),
    ]
    dq_inputs = (q, k, v, do, lse_rep, di_rep)
    if have_alibi:
        dq_in.append(pl.BlockSpec((1, NUM_LANES), lambda b_, h, c: (h, 0)))
        dq_inputs = dq_inputs + (alibi_l,)

    def dq_kernel(*refs):
        it = iter(refs)
        q_r, k_r, v_r, do_r, lse_r, di_r = (
            next(it), next(it), next(it), next(it), next(it), next(it),
        )
        al_r = next(it) if have_alibi else None
        dq_r = next(it)
        return _bwd_dq_onepass_kernel(
            q_r, k_r, v_r, do_r, lse_r, di_r, al_r, dq_r,
            causal=causal, sm_scale=sm_scale, num_q_blocks=nb_q,
            softcap=softcap,
        )

    dq = pl.pallas_call(
        dq_kernel,
        grid=(batch, num_q_heads, nb_q),
        in_specs=dq_in,
        out_specs=pl.BlockSpec((1, 1, block, head_dim), qb),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*dq_inputs)

    dkv_in = specs([
        (q_len, full_q), (block, kvb), (block, kvb), (q_len, full_q),
    ]) + [
        pl.BlockSpec((1, 1, q_len, NUM_LANES), full_q),
        pl.BlockSpec((1, 1, q_len, NUM_LANES), full_q),
    ]
    dkv_inputs = (q, k, v, do, lse_rep, di_rep)
    if have_alibi:
        dkv_in.append(pl.BlockSpec((1, NUM_LANES), lambda b_, h, c: (h, 0)))
        dkv_inputs = dkv_inputs + (alibi_l,)

    def dkv_kernel(*refs):
        it = iter(refs)
        q_r, k_r, v_r, do_r, lse_r, di_r = (
            next(it), next(it), next(it), next(it), next(it), next(it),
        )
        al_r = next(it) if have_alibi else None
        dk_r, dv_r = next(it), next(it)
        return _bwd_dkv_onepass_kernel(
            q_r, k_r, v_r, do_r, lse_r, di_r, al_r, dk_r, dv_r,
            causal=causal, sm_scale=sm_scale, num_kv_blocks=nb_kv,
            q_len=q_len, softcap=softcap,
        )

    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(batch, num_q_heads, nb_kv),
        in_specs=dkv_in,
        out_specs=[
            pl.BlockSpec((1, 1, block, head_dim), qb),
            pl.BlockSpec((1, 1, block, head_dim), qb),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(
                (batch, num_q_heads, kv_len_padded, head_dim), k.dtype
            )
        ] * 2,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*dkv_inputs)
    return dq, dk, dv


# Largest [rows, cols] f32 transient the single-pass backward may build
# (s/p/dp/ds chains): beyond this the tiled grids win on VMEM pressure.
_BWD_ONEPASS_MAX_SCORES_BYTES = 4 * 2**20


def _build_dkv_cells(
    num_q_blocks: int,
    num_kv_blocks: int,
    block_q: int,
    block_kv: int,
    q_offset: int,
    window: Optional[int] = None,
):
    """kv-major enumeration of causally-active (kv, q) cells for the dKV
    kernel: per kv block, q runs from its first contributing block to the
    last (the end, or — with a sliding window — the last q block whose
    window still reaches this kv block). A kv block with NO contributing q
    still gets one (fully-masked) cell so its dk/dv output block is
    written (zeros)."""
    import numpy as np

    kvmap, qmap, isfirst, islast = [], [], [], []
    for kvb in range(num_kv_blocks):
        first = min(
            max(0, (kvb * block_kv - q_offset) // block_q),
            num_q_blocks - 1,
        )
        last = num_q_blocks - 1
        if window is not None:
            # Max q position attending into this kv block:
            # p <= max_kv_pos + window - 1.
            max_q_pos = (kvb + 1) * block_kv - 1 + window - 1 - q_offset
            last = min(last, max(first, max_q_pos // block_q))
        for qb in range(first, last + 1):
            kvmap.append(kvb)
            qmap.append(qb)
            isfirst.append(1 if qb == first else 0)
            islast.append(1 if qb == last else 0)
    return (
        jnp.asarray(np.asarray(kvmap, np.int32)),
        jnp.asarray(np.asarray(qmap, np.int32)),
        jnp.asarray(np.asarray(isfirst, np.int32)),
        jnp.asarray(np.asarray(islast, np.int32)),
    )


def flash_attention_backward(
    q: jax.Array,  # padded [b, hq, q_len_p, head_dim_p]
    k: jax.Array,  # padded [b, hkv, kv_len_p, head_dim_p]
    v: jax.Array,
    o: jax.Array,  # padded like q
    lse_rep: jax.Array,  # [b, hq, q_len_p, NUM_LANES] lane-replicated
    do: jax.Array,  # padded like q
    *,
    causal: bool,
    sm_scale: float,
    block_sizes: BlockSizes,
    q_offset: int,
    kv_len: int,
    interpret: bool,
    dlse: Optional[jax.Array] = None,  # [b, hq, q_len_p] lse cotangent
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    q_seg: Optional[jax.Array] = None,  # [b, q_len_p] int32 (pre-padded)
    kv_seg: Optional[jax.Array] = None,  # [b, kv_len_p] int32
    alibi: Optional[jax.Array] = None,  # [num_q_heads] f32 ALiBi slopes
):
    """Compute (dq, dk, dv) on pre-padded inputs.

    Returns dk/dv with num_q_heads (per-q-head partials); the caller sums
    groups of q_per_kv heads for GQA.

    When the forward's lse output is itself used downstream (ring
    attention's cross-chip merge), its cotangent enters the softmax
    backward as ds = p * (dp - di + dlse) — since dL/ds_ij = p_ij — which
    folds into the same kernels as di_eff = di - dlse.
    """
    batch, num_q_heads, q_len, head_dim = q.shape
    _, num_kv_heads, kv_len_padded, _ = k.shape
    q_per_kv = num_q_heads // num_kv_heads
    mask_kv_tail = kv_len < kv_len_padded
    if window is not None and not causal:
        raise ValueError("window requires causal=True")

    # di = rowsum(o * do) [- dlse], lane-replicated to match lse layout.
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)
    if dlse is not None:
        di = di - dlse.astype(jnp.float32)
    di_rep = jnp.broadcast_to(di[..., None], (*di.shape, NUM_LANES))

    have_seg = q_seg is not None
    if have_seg:
        # Hardware layouts shared by both backward kernels (block-size
        # independent; only the BlockSpecs differ).
        qseg_l = jax.lax.broadcast_in_dim(
            q_seg.astype(jnp.int32), (batch, q_len, NUM_LANES), (0, 1)
        )
        kvseg_s = jax.lax.broadcast_in_dim(
            kv_seg.astype(jnp.int32), (batch, 8, kv_len_padded), (0, 2)
        )
    have_alibi = alibi is not None
    if have_alibi:
        alibi_l = jax.lax.broadcast_in_dim(
            alibi.astype(jnp.float32), (num_q_heads, NUM_LANES), (0,)
        )

    # Single-pass short-sequence backward: same gates as the forward's
    # onepass path (plain (self-)attention, scores transient fits VMEM).
    # Measured grad step at 2K h32: bt1024 tri 1.67 ms -> onepass 1.27 ms
    # (+31%); dlse folds into di above, so the ring path qualifies too.
    if (
        getattr(block_sizes, "onepass", False)
        and q_offset == 0
        and not mask_kv_tail
        and window is None
        and q_seg is None
        and (not causal or q_len == kv_len_padded)
    ):
        op_b = min(512, block_sizes.block_q_dkv, q_len)
        if (
            op_b >= min(512, q_len)
            and q_len % op_b == 0
            and kv_len_padded % op_b == 0
            and q_len * op_b * 4 <= _BWD_ONEPASS_MAX_SCORES_BYTES
            and op_b * kv_len_padded * 4 <= _BWD_ONEPASS_MAX_SCORES_BYTES
            and (not causal or q_len // op_b <= 4)
        ):
            return _backward_onepass(
                q, k, v, do, lse_rep, di_rep,
                causal=causal, sm_scale=sm_scale, block=op_b,
                q_per_kv=q_per_kv, interpret=interpret, softcap=softcap,
                alibi_l=alibi_l if have_alibi else None,
            )

    # ---- dKV kernel ----
    block_q = min(block_sizes.block_q_dkv, q_len)
    block_kv = min(block_sizes.block_kv_dkv, kv_len_padded)
    if q_len % block_q or kv_len_padded % block_kv:
        raise ValueError(
            f"backward block sizes ({block_q}, {block_kv}) must divide the "
            f"padded sequence lengths ({q_len}, {kv_len_padded}); use "
            f"power-of-two block sizes"
        )
    num_q_blocks = q_len // block_q
    num_kv_blocks = kv_len_padded // block_kv

    if causal:
        # Early (fully-masked) q blocks re-map to the first contributing
        # block so their fetches are elided; with a sliding window, late q
        # blocks past the window's reach re-map likewise.
        def q_block_index(q_i, kv_i):
            first = jnp.maximum(
                (kv_i * block_kv - q_offset) // block_q, 0
            )
            q_i = jnp.maximum(q_i, first)
            if window is not None:
                last = jnp.maximum(
                    ((kv_i + 1) * block_kv - 1 + window - 1 - q_offset)
                    // block_q,
                    first,
                )
                q_i = jnp.minimum(q_i, last)
            return q_i

    else:

        def q_block_index(q_i, kv_i):
            return q_i

    q_spec = pl.BlockSpec(
        (1, 1, block_q, head_dim),
        lambda b, h, kv, q_i: (b, h, q_block_index(q_i, kv), 0),
    )
    kv_spec = pl.BlockSpec(
        (1, 1, block_kv, head_dim),
        lambda b, h, kv, q_i: (b, h // q_per_kv, kv, 0),
    )
    res_spec = pl.BlockSpec(
        (1, 1, block_q, NUM_LANES),
        lambda b, h, kv, q_i: (b, h, q_block_index(q_i, kv), 0),
    )

    triangular = causal and block_sizes.triangular

    dkv_kernel = functools.partial(
        _flash_bwd_dkv_kernel,
        causal=causal,
        sm_scale=sm_scale,
        q_offset=q_offset,
        kv_len=kv_len,
        mask_kv_tail=mask_kv_tail,
        num_q_blocks=num_q_blocks,
        triangular=triangular,
        window=window,
        softcap=softcap,
        have_seg=have_seg,
        have_alibi=have_alibi,
    )
    dkv_out_shape = [
        jax.ShapeDtypeStruct(
            (batch, num_q_heads, kv_len_padded, head_dim), k.dtype
        )
    ] * 2
    dkv_scratch = [
        pltpu.VMEM((block_kv, head_dim), jnp.float32),
        pltpu.VMEM((block_kv, head_dim), jnp.float32),
    ]
    if triangular:
        kvmap, qmap, isfirst, islast = _build_dkv_cells(
            num_q_blocks, num_kv_blocks, block_q, block_kv, q_offset,
            window=window,
        )
        n_cells = kvmap.shape[0]
        tq_spec = pl.BlockSpec(
            (1, 1, block_q, head_dim),
            lambda b, h, c, km, qm, fi, il: (b, h, qm[c], 0),
        )
        tkv_spec = pl.BlockSpec(
            (1, 1, block_kv, head_dim),
            lambda b, h, c, km, qm, fi, il: (b, h // q_per_kv, km[c], 0),
        )
        tres_spec = pl.BlockSpec(
            (1, 1, block_q, NUM_LANES),
            lambda b, h, c, km, qm, fi, il: (b, h, qm[c], 0),
        )
        tri_in_specs = [
            tq_spec, tkv_spec, tkv_spec, tq_spec, tres_spec, tres_spec,
        ]
        tri_inputs = (kvmap, qmap, isfirst, islast, q, k, v, do, lse_rep,
                      di_rep)
        if have_seg:
            tri_in_specs += [
                pl.BlockSpec(
                    (1, block_q, NUM_LANES),
                    lambda b, h, c, km, qm, fi, il: (b, qm[c], 0),
                ),
                pl.BlockSpec(
                    (1, 8, block_kv),
                    lambda b, h, c, km, qm, fi, il: (b, 0, km[c]),
                ),
            ]
            tri_inputs = tri_inputs + (qseg_l, kvseg_s)
        if have_alibi:
            tri_in_specs.append(
                pl.BlockSpec(
                    (1, NUM_LANES),
                    lambda b, h, c, km, qm, fi, il: (h, 0),
                )
            )
            tri_inputs = tri_inputs + (alibi_l,)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(batch, num_q_heads, n_cells),
            in_specs=tri_in_specs,
            out_specs=[
                pl.BlockSpec(
                    (1, 1, block_kv, head_dim),
                    lambda b, h, c, km, qm, fi, il: (b, h, km[c], 0),
                )
            ]
            * 2,
            scratch_shapes=dkv_scratch,
        )
        dk, dv = pl.pallas_call(
            dkv_kernel,
            grid_spec=grid_spec,
            out_shape=dkv_out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(*tri_inputs)
    else:
        rect_in_specs = [q_spec, kv_spec, kv_spec, q_spec, res_spec,
                         res_spec]
        rect_inputs = (q, k, v, do, lse_rep, di_rep)
        if have_seg:
            rect_in_specs += [
                pl.BlockSpec(
                    (1, block_q, NUM_LANES),
                    lambda b, h, kv, q_i: (b, q_block_index(q_i, kv), 0),
                ),
                pl.BlockSpec(
                    (1, 8, block_kv), lambda b, h, kv, q_i: (b, 0, kv)
                ),
            ]
            rect_inputs = rect_inputs + (qseg_l, kvseg_s)
        if have_alibi:
            rect_in_specs.append(
                pl.BlockSpec((1, NUM_LANES), lambda b, h, kv, q_i: (h, 0))
            )
            rect_inputs = rect_inputs + (alibi_l,)
        dk, dv = pl.pallas_call(
            dkv_kernel,
            grid=(batch, num_q_heads, num_kv_blocks, num_q_blocks),
            in_specs=rect_in_specs,
            out_specs=[
                pl.BlockSpec(
                    (1, 1, block_kv, head_dim),
                    lambda b, h, kv, q_i: (b, h, kv, 0),
                )
            ]
            * 2,
            out_shape=dkv_out_shape,
            scratch_shapes=dkv_scratch,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    "parallel", "parallel", "parallel", "arbitrary",
                ),
            ),
            interpret=interpret,
        )(*rect_inputs)

    # ---- dQ kernel ----
    block_q_dq = min(block_sizes.block_q_dq, q_len)
    block_kv_dq = min(block_sizes.block_kv_dq, kv_len_padded)
    if q_len % block_q_dq or kv_len_padded % block_kv_dq:
        raise ValueError(
            f"dq block sizes ({block_q_dq}, {block_kv_dq}) must divide the "
            f"padded sequence lengths ({q_len}, {kv_len_padded})"
        )
    num_q_blocks_dq = q_len // block_q_dq
    num_kv_blocks_dq = kv_len_padded // block_kv_dq

    if causal:

        def kv_block_index(q_i, kv_i):
            last = ((q_i + 1) * block_q_dq - 1 + q_offset) // block_kv_dq
            kv_i = jnp.minimum(kv_i, last)
            if window is not None:
                first = jnp.maximum(
                    (q_i * block_q_dq + q_offset - window + 1)
                    // block_kv_dq,
                    0,
                )
                kv_i = jnp.maximum(kv_i, first)
            return kv_i

    else:

        def kv_block_index(q_i, kv_i):
            return kv_i

    q_spec_dq = pl.BlockSpec(
        (1, 1, block_q_dq, head_dim), lambda b, h, q_i, kv: (b, h, q_i, 0)
    )
    kv_spec_dq = pl.BlockSpec(
        (1, 1, block_kv_dq, head_dim),
        lambda b, h, q_i, kv: (b, h // q_per_kv, kv_block_index(q_i, kv), 0),
    )
    res_spec_dq = pl.BlockSpec(
        (1, 1, block_q_dq, NUM_LANES), lambda b, h, q_i, kv: (b, h, q_i, 0)
    )

    dq_kernel = functools.partial(
        _flash_bwd_dq_kernel,
        causal=causal,
        sm_scale=sm_scale,
        q_offset=q_offset,
        kv_len=kv_len,
        mask_kv_tail=mask_kv_tail,
        num_kv_blocks=num_kv_blocks_dq,
        triangular=triangular,
        window=window,
        softcap=softcap,
        have_seg=have_seg,
        have_alibi=have_alibi,
    )
    dq_scratch_shapes = [pltpu.VMEM((block_q_dq, head_dim), jnp.float32)]
    if triangular:
        from tpu_flash.ops.flash.forward import build_tri_cells

        qmap, kvmap, islast = build_tri_cells(
            num_q_blocks_dq, num_kv_blocks_dq, block_q_dq, block_kv_dq,
            q_offset, window=window,
        )
        n_cells = qmap.shape[0]
        tq_spec = pl.BlockSpec(
            (1, 1, block_q_dq, head_dim),
            lambda b, h, c, qm, km, il: (b, h, qm[c], 0),
        )
        tkv_spec = pl.BlockSpec(
            (1, 1, block_kv_dq, head_dim),
            lambda b, h, c, qm, km, il: (b, h // q_per_kv, km[c], 0),
        )
        tres_spec = pl.BlockSpec(
            (1, 1, block_q_dq, NUM_LANES),
            lambda b, h, c, qm, km, il: (b, h, qm[c], 0),
        )
        tri_in_specs = [
            tq_spec, tkv_spec, tkv_spec, tq_spec, tres_spec, tres_spec,
        ]
        tri_inputs = (qmap, kvmap, islast, q, k, v, do, lse_rep, di_rep)
        if have_seg:
            tri_in_specs += [
                pl.BlockSpec(
                    (1, block_q_dq, NUM_LANES),
                    lambda b, h, c, qm, km, il: (b, qm[c], 0),
                ),
                pl.BlockSpec(
                    (1, 8, block_kv_dq),
                    lambda b, h, c, qm, km, il: (b, 0, km[c]),
                ),
            ]
            tri_inputs = tri_inputs + (qseg_l, kvseg_s)
        if have_alibi:
            tri_in_specs.append(
                pl.BlockSpec(
                    (1, NUM_LANES), lambda b, h, c, qm, km, il: (h, 0)
                )
            )
            tri_inputs = tri_inputs + (alibi_l,)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(batch, num_q_heads, n_cells),
            in_specs=tri_in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, block_q_dq, head_dim),
                lambda b, h, c, qm, km, il: (b, h, qm[c], 0),
            ),
            scratch_shapes=dq_scratch_shapes,
        )
        dq = pl.pallas_call(
            dq_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(*tri_inputs)
    else:
        rect_in_specs = [
            q_spec_dq, kv_spec_dq, kv_spec_dq, q_spec_dq, res_spec_dq,
            res_spec_dq,
        ]
        rect_inputs = (q, k, v, do, lse_rep, di_rep)
        if have_seg:
            rect_in_specs += [
                pl.BlockSpec(
                    (1, block_q_dq, NUM_LANES),
                    lambda b, h, q_i, kv: (b, q_i, 0),
                ),
                pl.BlockSpec(
                    (1, 8, block_kv_dq),
                    lambda b, h, q_i, kv: (b, 0, kv_block_index(q_i, kv)),
                ),
            ]
            rect_inputs = rect_inputs + (qseg_l, kvseg_s)
        if have_alibi:
            rect_in_specs.append(
                pl.BlockSpec((1, NUM_LANES), lambda b, h, q_i, kv: (h, 0))
            )
            rect_inputs = rect_inputs + (alibi_l,)
        dq = pl.pallas_call(
            dq_kernel,
            grid=(batch, num_q_heads, num_q_blocks_dq, num_kv_blocks_dq),
            in_specs=rect_in_specs,
            out_specs=pl.BlockSpec(
                (1, 1, block_q_dq, head_dim),
                lambda b, h, q_i, kv: (b, h, q_i, 0),
            ),
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
            scratch_shapes=dq_scratch_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(
                    "parallel", "parallel", "parallel", "arbitrary",
                ),
            ),
            interpret=interpret,
        )(*rect_inputs)

    return dq, dk, dv
