"""Public flash-attention API: alignment, padding, GQA, and autodiff wiring.

The TPU analogue of the reference's host launch recipe (tests/main.cu:50-61):
where the reference burns tile shapes into the binary via template params and
asserts ``seqLen % tile == 0`` (helpers.hpp:34), this layer pads arbitrary
shapes to hardware alignment (lane dim 128, block multiples), masks the
padding inside the kernel, and slices results back. Training support (absent
in the reference) is wired via ``jax.custom_vjp`` onto the Pallas backward
kernels.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from tpu_flash.core.config import BlockSizes
from tpu_flash.ops.flash.backward import flash_attention_backward
from tpu_flash.ops.flash.forward import NUM_LANES, flash_attention_forward
from tpu_flash.utils.tuning import default_block_sizes


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _default_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_axis(x: jax.Array, axis: int, target: int) -> jax.Array:
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _pow2_round_up(x: int, lo: int) -> int:
    p = lo
    while p < x:
        p *= 2
    return p


def _padded_shapes(q_shape, kv_len, block_sizes):
    """(head_dim_p, block_q, block_kv_major, q_len_p, kv_len_p).

    Sequence dims are padded to a power of two (>= 8 sublanes for Q, >= 128
    lanes for KV) below the requested block size so that the forward AND
    backward block sizes — all powers of two in the tuning table — divide the
    padded lengths.
    """
    q_len, head_dim = q_shape[2], q_shape[3]
    head_dim_p = _round_up(head_dim, NUM_LANES)
    block_q = min(block_sizes.block_q, _pow2_round_up(q_len, 8))
    block_kv_major = min(
        block_sizes.block_kv_major, _pow2_round_up(kv_len, NUM_LANES)
    )
    q_len_p = _round_up(q_len, block_q)
    kv_len_p = _round_up(kv_len, block_kv_major)
    return head_dim_p, block_q, block_kv_major, q_len_p, kv_len_p


def _pad_qkv(q, k, v, block_sizes):
    head_dim_p, _, _, q_len_p, kv_len_p = _padded_shapes(
        q.shape, k.shape[2], block_sizes
    )
    qp = _pad_axis(_pad_axis(q, 3, head_dim_p), 2, q_len_p)
    kp = _pad_axis(_pad_axis(k, 3, head_dim_p), 2, kv_len_p)
    vp = _pad_axis(_pad_axis(v, 3, head_dim_p), 2, kv_len_p)
    return qp, kp, vp


# ---------------------------------------------------------------------------
# custom_vjp core (fixed static params, original shapes in/out)
# ---------------------------------------------------------------------------


def _pad_segs(q_seg, kv_seg, q_len_p, kv_len_p):
    """Pad segment ids to the kernel shapes with DISTINCT sentinels (-1 for
    q, -2 for kv) so padded rows/cols never match anything real (or each
    other)."""
    if q_seg is None:
        return None, None
    b, q_len = q_seg.shape
    kv_len = kv_seg.shape[1]
    qs = jnp.pad(
        q_seg.astype(jnp.int32), ((0, 0), (0, q_len_p - q_len)),
        constant_values=-1,
    )
    ks = jnp.pad(
        kv_seg.astype(jnp.int32), ((0, 0), (0, kv_len_p - kv_len)),
        constant_values=-2,
    )
    return qs, ks


def _sink_grad(sinks, lse, di_eff):
    """dL/dsinks[h] = sum_{b,q} p_sink * (dlse - di) with
    p_sink = exp(sinks[h] - lse[b,h,q]) and di_eff = di - dlse — the sink
    is a valueless softmax column, so its gradient needs no kernel pass."""
    p_sink = jnp.exp(
        sinks.astype(jnp.float32)[None, :, None] - lse.astype(jnp.float32)
    )
    return (-(p_sink * di_eff).sum(axis=(0, 2))).astype(sinks.dtype)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13)
)
def _flash_core(q, k, v, q_seg, kv_seg, sinks, alibi, causal, sm_scale,
                block_sizes, q_offset, interpret, window, softcap):
    q_len, head_dim = q.shape[2], q.shape[3]
    qp, kp, vp = _pad_qkv(q, k, v, block_sizes)
    qs, ks = _pad_segs(q_seg, kv_seg, qp.shape[2], kp.shape[2])
    o = flash_attention_forward(
        qp, kp, vp,
        causal=causal, sm_scale=sm_scale, block_sizes=block_sizes,
        q_offset=q_offset, kv_len=k.shape[2], save_residuals=False,
        interpret=interpret, window=window, softcap=softcap,
        q_seg=qs, kv_seg=ks, sinks=sinks, alibi=alibi,
    )
    return o[:, :, :q_len, :head_dim]


def _flash_core_fwd(q, k, v, q_seg, kv_seg, sinks, alibi, causal,
                    sm_scale, block_sizes, q_offset, interpret, window,
                    softcap):
    q_len, head_dim = q.shape[2], q.shape[3]
    qp, kp, vp = _pad_qkv(q, k, v, block_sizes)
    qs, ks = _pad_segs(q_seg, kv_seg, qp.shape[2], kp.shape[2])
    o_p, lse_p = flash_attention_forward(
        qp, kp, vp,
        causal=causal, sm_scale=sm_scale, block_sizes=block_sizes,
        q_offset=q_offset, kv_len=k.shape[2], save_residuals=True,
        interpret=interpret, window=window, softcap=softcap,
        q_seg=qs, kv_seg=ks, sinks=sinks, alibi=alibi,
    )
    o = o_p[:, :, :q_len, :head_dim]
    return o, (q, k, v, q_seg, kv_seg, sinks, alibi, o_p, lse_p)


def _flash_core_bwd(causal, sm_scale, block_sizes, q_offset, interpret,
                    window, softcap, residuals, g):
    q, k, v, q_seg, kv_seg, sinks, alibi, o_p, lse_p = residuals
    batch, num_q_heads, q_len, head_dim = q.shape
    num_kv_heads, kv_len = k.shape[1], k.shape[2]
    q_per_kv = num_q_heads // num_kv_heads

    qp, kp, vp = _pad_qkv(q, k, v, block_sizes)
    q_len_p = qp.shape[2]
    head_dim_p = qp.shape[3]
    do_p = _pad_axis(_pad_axis(g, 3, head_dim_p), 2, q_len_p)
    lse_rep = jnp.broadcast_to(
        _pad_axis(lse_p, 2, q_len_p)[..., None],
        (batch, num_q_heads, q_len_p, NUM_LANES),
    )

    qs, ks = _pad_segs(q_seg, kv_seg, qp.shape[2], kp.shape[2])
    dq, dk, dv = flash_attention_backward(
        qp, kp, vp, o_p, lse_rep, do_p,
        causal=causal, sm_scale=sm_scale, block_sizes=block_sizes,
        q_offset=q_offset, kv_len=kv_len, interpret=interpret,
        window=window, softcap=softcap, q_seg=qs, kv_seg=ks, alibi=alibi,
    )
    dq = dq[:, :, :q_len, :head_dim]
    dk = dk[:, :, :kv_len, :head_dim]
    dv = dv[:, :, :kv_len, :head_dim]
    if q_per_kv > 1:
        # Per-q-head dK/dV partials → sum over each GQA group.
        dk = dk.reshape(batch, num_kv_heads, q_per_kv, kv_len, head_dim)
        dk = dk.sum(axis=2).astype(k.dtype)
        dv = dv.reshape(batch, num_kv_heads, q_per_kv, kv_len, head_dim)
        dv = dv.sum(axis=2).astype(v.dtype)
    dsink = None
    if sinks is not None:
        o_u = o_p[:, :, :q_len, :head_dim].astype(jnp.float32)
        di_u = jnp.sum(o_u * g.astype(jnp.float32), axis=-1)
        dsink = _sink_grad(sinks, lse_p[:, :, :q_len], di_u)
    return dq, dk, dv, None, None, dsink, None


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


# Residuals variant: returns (o, lse) and is differentiable in BOTH outputs.
# Ring attention consumes lse in its cross-chip merge, so its cotangent is
# live; it folds into the standard backward as di_eff = di - dlse (see
# flash_attention_backward).


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13)
)
def _flash_core_res(q, k, v, q_seg, kv_seg, sinks, alibi, causal, sm_scale,
                    block_sizes, q_offset, interpret, window, softcap):
    q_len, head_dim = q.shape[2], q.shape[3]
    qp, kp, vp = _pad_qkv(q, k, v, block_sizes)
    qs, ks = _pad_segs(q_seg, kv_seg, qp.shape[2], kp.shape[2])
    o_p, lse_p = flash_attention_forward(
        qp, kp, vp,
        causal=causal, sm_scale=sm_scale, block_sizes=block_sizes,
        q_offset=q_offset, kv_len=k.shape[2], save_residuals=True,
        interpret=interpret, window=window, softcap=softcap,
        q_seg=qs, kv_seg=ks, sinks=sinks, alibi=alibi,
    )
    return o_p[:, :, :q_len, :head_dim], lse_p[:, :, :q_len]


def _flash_core_res_fwd(q, k, v, q_seg, kv_seg, sinks, alibi, causal,
                        sm_scale, block_sizes, q_offset, interpret, window,
                        softcap):
    q_len, head_dim = q.shape[2], q.shape[3]
    qp, kp, vp = _pad_qkv(q, k, v, block_sizes)
    qs, ks = _pad_segs(q_seg, kv_seg, qp.shape[2], kp.shape[2])
    o_p, lse_p = flash_attention_forward(
        qp, kp, vp,
        causal=causal, sm_scale=sm_scale, block_sizes=block_sizes,
        q_offset=q_offset, kv_len=k.shape[2], save_residuals=True,
        interpret=interpret, window=window, softcap=softcap,
        q_seg=qs, kv_seg=ks, sinks=sinks, alibi=alibi,
    )
    out = (o_p[:, :, :q_len, :head_dim], lse_p[:, :, :q_len])
    return out, (q, k, v, q_seg, kv_seg, sinks, alibi, o_p, lse_p)


def _flash_core_res_bwd(causal, sm_scale, block_sizes, q_offset, interpret,
                        window, softcap, residuals, gs):
    g, g_lse = gs
    q, k, v, q_seg, kv_seg, sinks, alibi, o_p, lse_p = residuals
    batch, num_q_heads, q_len, head_dim = q.shape
    num_kv_heads, kv_len = k.shape[1], k.shape[2]
    q_per_kv = num_q_heads // num_kv_heads

    qp, kp, vp = _pad_qkv(q, k, v, block_sizes)
    q_len_p = qp.shape[2]
    head_dim_p = qp.shape[3]
    do_p = _pad_axis(_pad_axis(g, 3, head_dim_p), 2, q_len_p)
    dlse_p = _pad_axis(g_lse, 2, q_len_p)
    lse_rep = jnp.broadcast_to(
        _pad_axis(lse_p, 2, q_len_p)[..., None],
        (batch, num_q_heads, q_len_p, NUM_LANES),
    )

    qs, ks = _pad_segs(q_seg, kv_seg, qp.shape[2], kp.shape[2])
    dq, dk, dv = flash_attention_backward(
        qp, kp, vp, o_p, lse_rep, do_p,
        causal=causal, sm_scale=sm_scale, block_sizes=block_sizes,
        q_offset=q_offset, kv_len=kv_len, interpret=interpret,
        dlse=dlse_p, window=window, softcap=softcap, q_seg=qs, kv_seg=ks,
        alibi=alibi,
    )
    dq = dq[:, :, :q_len, :head_dim]
    dk = dk[:, :, :kv_len, :head_dim]
    dv = dv[:, :, :kv_len, :head_dim]
    if q_per_kv > 1:
        dk = dk.reshape(batch, num_kv_heads, q_per_kv, kv_len, head_dim)
        dk = dk.sum(axis=2).astype(k.dtype)
        dv = dv.reshape(batch, num_kv_heads, q_per_kv, kv_len, head_dim)
        dv = dv.sum(axis=2).astype(v.dtype)
    dsink = None
    if sinks is not None:
        o_u = o_p[:, :, :q_len, :head_dim].astype(jnp.float32)
        di_u = jnp.sum(o_u * g.astype(jnp.float32), axis=-1)
        di_eff = di_u - g_lse.astype(jnp.float32)
        dsink = _sink_grad(sinks, lse_p[:, :, :q_len], di_eff)
    return dq, dk, dv, None, None, dsink, None


_flash_core_res.defvjp(_flash_core_res_fwd, _flash_core_res_bwd)


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "sm_scale", "block_sizes", "q_offset", "save_residuals",
        "interpret", "window", "softcap",
    ),
)
def _flash_entry(q, k, v, causal, sm_scale, block_sizes, q_offset,
                 save_residuals, interpret, window=None, softcap=None,
                 q_seg=None, kv_seg=None, sinks=None, alibi=None):
    if not save_residuals:
        return _flash_core(
            q, k, v, q_seg, kv_seg, sinks, alibi, causal, sm_scale,
            block_sizes, q_offset, interpret, window, softcap,
        )
    return _flash_core_res(
        q, k, v, q_seg, kv_seg, sinks, alibi, causal, sm_scale,
        block_sizes, q_offset, interpret, window, softcap,
    )


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_sizes: Optional[BlockSizes] = None,
    q_offset: int = 0,
    save_residuals: bool = False,
    interpret: Optional[bool] = None,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    segment_ids=None,
    sinks: Optional[jax.Array] = None,
    alibi: Optional[jax.Array] = None,
) -> jax.Array:
    """Fused multi-head / grouped-query flash attention (differentiable).

    O = softmax(sm_scale * Q K^T + mask) V, computed tile-by-tile with online
    softmax so the (q_len, kv_len) score matrix is never materialized.
    Gradients flow through FA2-style Pallas backward kernels.

    Args:
      q: [batch, num_q_heads, q_len, head_dim].
      k, v: [batch, num_kv_heads, kv_len, head_dim]; ``num_kv_heads`` must
        divide ``num_q_heads`` (GQA/MQA supported natively).
      causal: causal masking; query position ``i + q_offset`` attends to kv
        positions ``<= i + q_offset``.
      sm_scale: score scale, default ``1/sqrt(head_dim)``.
      block_sizes: kernel tile shapes; default from the per-generation
        tuning table (utils/tuning.py).
      q_offset: global position of the first query row (chunked prefill).
      save_residuals: also return ``lse = logsumexp(scaled scores)`` of shape
        [batch, num_q_heads, q_len] (not differentiable through this path).
      interpret: run the kernel in interpreter mode (default: auto — True
        when no TPU backend is present, so CI runs on CPU).
      window: sliding-window size (requires ``causal=True``): query position
        p attends to kv positions in ``[p - window + 1, p]`` (Mistral
        convention — window counts attended positions including self).
        Blocks entirely outside the band are neither fetched nor computed.
      softcap: logit soft-capping — scores become
        ``softcap * tanh(scores / softcap)`` after scaling, before masking
        (Gemma-2 convention). Differentiable.
      segment_ids: ``SegmentIds(q=[batch, q_len], kv=[batch, kv_len])``
        int32 ids (or a 2-tuple) for packed multi-document attention:
        positions with differing ids never attend each other. Composes
        with ``causal``/``window``/``softcap``; gradients do not flow to
        the ids.
      sinks: [num_q_heads] per-head attention-sink logits (StreamingLLM /
        gpt-oss convention): each head's softmax denominator gains
        ``exp(sinks[h])``, a virtual position with no value row.
        Differentiable (dsinks computed analytically from the residuals).
      alibi: [num_q_heads] per-head ALiBi slopes (BLOOM/MPT convention;
        ``core.reference.alibi_slopes`` builds the standard set): scores
        gain ``slope_h * (kv_pos - q_pos)`` — a linear distance penalty
        replacing positional embeddings. Requires ``causal=True``; the
        bias is translation-invariant, so it composes with
        ``segment_ids`` (per-document distances) and ``window``. Applied
        after ``softcap``. The slopes are constants (no gradient).

    Returns:
      [batch, num_q_heads, q_len, head_dim] in q.dtype, or ``(o, lse)``.
    """
    if q.ndim != 4 or k.ndim != 4 or v.ndim != 4:
        raise ValueError(
            f"q/k/v must be rank-4 [b, h, s, d]; got {q.shape}, {k.shape}, "
            f"{v.shape}"
        )
    if k.shape != v.shape:
        raise ValueError(f"k/v shape mismatch: {k.shape} vs {v.shape}")
    if q.shape[1] % k.shape[1] != 0:
        raise ValueError(
            f"num_q_heads ({q.shape[1]}) must be a multiple of num_kv_heads "
            f"({k.shape[1]})"
        )
    if q.shape[-1] != k.shape[-1]:
        raise ValueError(f"head_dim mismatch: {q.shape[-1]} vs {k.shape[-1]}")
    if window is not None:
        if not causal:
            raise ValueError("window requires causal=True")
        if window < 1:
            raise ValueError(f"window must be >= 1, got {window}")
        window = int(window)
        if window >= q.shape[2] + q_offset:
            window = None  # window reaches position 0 for every q row:
            # plain causal
    if softcap is not None:
        if softcap <= 0:
            raise ValueError(f"softcap must be > 0, got {softcap}")
        softcap = float(softcap)
    q_seg = kv_seg = None
    if segment_ids is not None:
        q_seg, kv_seg = segment_ids  # SegmentIds NamedTuple or 2-tuple
        if q_seg.shape != (q.shape[0], q.shape[2]):
            raise ValueError(
                f"q segment ids must be [batch, q_len] = "
                f"{(q.shape[0], q.shape[2])}, got {q_seg.shape}"
            )
        if kv_seg.shape != (k.shape[0], k.shape[2]):
            raise ValueError(
                f"kv segment ids must be [batch, kv_len] = "
                f"{(k.shape[0], k.shape[2])}, got {kv_seg.shape}"
            )
    if sinks is not None and sinks.shape != (q.shape[1],):
        raise ValueError(
            f"sinks must be [num_q_heads] = ({q.shape[1]},), got "
            f"{sinks.shape}"
        )
    if alibi is not None:
        if not causal:
            raise ValueError("alibi requires causal=True")
        if alibi.shape != (q.shape[1],):
            raise ValueError(
                f"alibi must be [num_q_heads] = ({q.shape[1]},), got "
                f"{alibi.shape}"
            )

    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    if block_sizes is None:
        block_sizes = default_block_sizes(
            q.shape[2], k.shape[2], q.shape[3], str(q.dtype)
        )
    if interpret is None:
        interpret = _default_interpret()

    return _flash_entry(
        q, k, v, causal, float(sm_scale), block_sizes, q_offset,
        save_residuals, interpret, window, softcap, q_seg, kv_seg, sinks,
        alibi,
    )
