"""Public flash-attention API: alignment, padding, GQA, and autodiff wiring.

The TPU analogue of the reference's host launch recipe (tests/main.cu:50-61):
where the reference burns tile shapes into the binary via template params and
asserts ``seqLen % tile == 0`` (helpers.hpp:34), this layer pads arbitrary
shapes to hardware alignment (lane dim 128, block multiples), masks the
padding inside the kernel, and slices results back.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from tpu_flash.core.config import BlockSizes
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


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal",
        "sm_scale",
        "block_sizes",
        "q_offset",
        "save_residuals",
        "interpret",
    ),
)
def _flash_attention(
    q,
    k,
    v,
    causal,
    sm_scale,
    block_sizes,
    q_offset,
    save_residuals,
    interpret,
):
    batch, num_q_heads, q_len, head_dim = q.shape
    _, num_kv_heads, kv_len, _ = k.shape

    if sm_scale is None:
        sm_scale = head_dim**-0.5
    if block_sizes is None:
        block_sizes = default_block_sizes(q_len, kv_len, head_dim)
    if interpret is None:
        interpret = _default_interpret()

    # Hardware alignment: lane dim (head_dim) to 128; sequence dims to block
    # multiples. Zero-padded head_dim is exact (pads contribute 0 to QK^T and
    # zero columns to O); padded KV rows are masked in-kernel; padded Q rows
    # are sliced off.
    head_dim_p = _round_up(head_dim, NUM_LANES)
    block_q = min(block_sizes.block_q, _round_up(q_len, 8))
    block_kv_major = min(block_sizes.block_kv_major, _round_up(kv_len, NUM_LANES))
    q_len_p = _round_up(q_len, block_q)
    kv_len_p = _round_up(kv_len, block_kv_major)

    qp = _pad_axis(_pad_axis(q, 3, head_dim_p), 2, q_len_p)
    kp = _pad_axis(_pad_axis(k, 3, head_dim_p), 2, kv_len_p)
    vp = _pad_axis(_pad_axis(v, 3, head_dim_p), 2, kv_len_p)

    out = flash_attention_forward(
        qp,
        kp,
        vp,
        causal=causal,
        sm_scale=sm_scale,
        block_sizes=block_sizes,
        q_offset=q_offset,
        kv_len=kv_len,
        save_residuals=save_residuals,
        interpret=interpret,
    )
    if save_residuals:
        o, lse = out
        return o[:, :, :q_len, :head_dim], lse[:, :, :q_len]
    return out[:, :, :q_len, :head_dim]


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
) -> jax.Array:
    """Fused multi-head / grouped-query flash attention.

    O = softmax(sm_scale * Q K^T + mask) V, computed tile-by-tile with online
    softmax so the (q_len, kv_len) score matrix is never materialized.

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
        [batch, num_q_heads, q_len] (the FA2 backward residual).
      interpret: run the kernel in interpreter mode (default: auto — True
        when no TPU backend is present, so CI runs on CPU).

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
    return _flash_attention(
        q, k, v, causal, sm_scale, block_sizes, q_offset, save_residuals,
        interpret,
    )
