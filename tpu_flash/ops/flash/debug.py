"""Attention-probability debug surface.

The reference's golden oracle returns the full attention map alongside the
output (``return (output, attn)``, check.py:25) so misbehaving kernels can
be debugged against inspectable probabilities. The flash kernels never
materialize P — this module extracts it FROM THE KERNEL'S OWN STATE in two
passes:

1. the production forward runs with ``save_residuals=True``, yielding the
   kernel's internal logsumexp (the online-softmax state the reference
   carries at utils.cuh:58-81, sink-inclusive after the epilogue);
2. a stateless Pallas kernel re-walks the score tiles with the SAME
   mask/scale/softcap/ALiBi logic and emits ``P = exp(s - lse)`` per tile.

Any divergence between these weights and the oracle's
(``reference_attention(..., return_weights=True)``) localizes a bug to the
score path (weights wrong) vs the PV/accumulation path (weights right,
output wrong).
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
from tpu_flash.ops.flash.forward import (
    NUM_LANES,
    TRANS_B_DIM_NUMBERS,
    flash_attention_forward,
)


def _weights_kernel(
    q_ref,  # [1, 1, block_q, head_dim]
    k_ref,  # [1, 1, block_kv, head_dim]
    lse_ref,  # [1, 1, block_q, NUM_LANES] f32
    alibi_ref,  # [1, NUM_LANES] f32 or None
    w_ref,  # [1, 1, block_q, block_kv] f32 out
    *,
    causal: bool,
    sm_scale: float,
    q_offset: int,
    kv_len: int,
    mask_kv_tail: bool,
    window: Optional[int],
    softcap: Optional[float],
):
    block_q = q_ref.shape[2]
    block_kv = k_ref.shape[2]
    q_idx = pl.program_id(2)
    kv_idx = pl.program_id(3)

    q = q_ref[0, 0]
    if sm_scale != 1.0:
        q = q * sm_scale
    s = jax.lax.dot_general(
        q, k_ref[0, 0], TRANS_B_DIM_NUMBERS,
        preferred_element_type=jnp.float32,
        precision=(
            jax.lax.Precision.HIGHEST
            if q_ref.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT
        ),
    )
    if softcap is not None:
        s = softcap * jnp.tanh(s * (1.0 / softcap))

    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
    thr = q_offset + q_idx * block_q - kv_idx * block_kv
    mask = None
    if causal:
        mask = (col - row) <= thr
        if window is not None:
            mask = jnp.logical_and(mask, (col - row) > thr - window)
    if alibi_ref is not None:
        s = s + alibi_ref[0:1, 0:1] * (col - row - thr).astype(jnp.float32)
    if mask_kv_tail:
        tail = col < kv_len - kv_idx * block_kv
        mask = tail if mask is None else jnp.logical_and(mask, tail)
    if mask is not None:
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

    lse = lse_ref[0, 0][:, :1]  # [block_q, 1], lane-replicated source
    w = jnp.where(lse == -jnp.inf, 0.0, jnp.exp(s - lse))
    w_ref[0, 0] = w


def attention_weights(
    q: jax.Array,  # [batch, num_q_heads, q_len, head_dim] (aligned)
    k: jax.Array,  # [batch, num_kv_heads, kv_len_padded, head_dim]
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    block_sizes: Optional[BlockSizes] = None,
    q_offset: int = 0,
    kv_len: Optional[int] = None,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,
    alibi: Optional[jax.Array] = None,
    interpret: bool = False,
):
    """(output, P) where P [batch, hq, q_len, kv_len] f32 are the kernel's
    attention probabilities (kernel-extracted: normalized by the production
    kernel's own lse residual). Debug-only — P is O(q_len * kv_len) HBM.

    Shapes follow flash_attention_forward (pre-padded/aligned). With
    ``sinks`` the rows sum to < 1 (the sink absorbs the rest), exactly as
    served.
    """
    batch, num_q_heads, q_len, head_dim = q.shape
    _, num_kv_heads, kv_len_padded, _ = k.shape
    if kv_len is None:
        kv_len = kv_len_padded
    q_per_kv = num_q_heads // num_kv_heads
    scale = sm_scale if sm_scale is not None else head_dim**-0.5
    if block_sizes is None:
        block_sizes = BlockSizes(
            block_q=min(512, q_len),
            block_kv_major=min(512, kv_len_padded),
            block_kv=min(512, kv_len_padded),
        )

    o, lse = flash_attention_forward(
        q, k, v, causal=causal, sm_scale=scale, block_sizes=block_sizes,
        q_offset=q_offset, kv_len=kv_len, save_residuals=True,
        interpret=interpret, window=window, softcap=softcap, sinks=sinks,
        alibi=alibi,
    )

    block_q = min(block_sizes.block_q, q_len)
    block_kv = min(block_sizes.block_kv_major, kv_len_padded)
    grid = (batch, num_q_heads, q_len // block_q, kv_len_padded // block_kv)

    lse_l = jax.lax.broadcast_in_dim(
        lse.astype(jnp.float32),
        (batch, num_q_heads, q_len, NUM_LANES),
        (0, 1, 2),
    )
    in_specs = [
        pl.BlockSpec(
            (1, 1, block_q, head_dim), lambda b, h, qi, ki: (b, h, qi, 0)
        ),
        pl.BlockSpec(
            (1, 1, block_kv, head_dim),
            lambda b, h, qi, ki: (b, h // q_per_kv, ki, 0),
        ),
        pl.BlockSpec(
            (1, 1, block_q, NUM_LANES), lambda b, h, qi, ki: (b, h, qi, 0)
        ),
    ]
    inputs = [q, k, lse_l]
    if alibi is not None:
        alibi_l = jax.lax.broadcast_in_dim(
            alibi.astype(jnp.float32), (num_q_heads, NUM_LANES), (0,)
        )
        in_specs.append(
            pl.BlockSpec((1, NUM_LANES), lambda b, h, qi, ki: (h, 0))
        )
        inputs.append(alibi_l)

    have_alibi = alibi is not None

    def kernel(*refs):
        it = iter(refs)
        q_r, k_r, lse_r = next(it), next(it), next(it)
        al_r = next(it) if have_alibi else None
        w_r = next(it)
        return functools.partial(
            _weights_kernel,
            causal=causal,
            sm_scale=scale,
            q_offset=q_offset,
            kv_len=kv_len,
            mask_kv_tail=kv_len < kv_len_padded,
            window=window,
            softcap=softcap,
        )(q_r, k_r, lse_r, al_r, w_r)

    w = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, 1, block_q, block_kv), lambda b, h, qi, ki: (b, h, qi, ki)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, num_q_heads, q_len, kv_len_padded), jnp.float32
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                "parallel", "parallel", "parallel", "parallel",
            ),
        ),
        interpret=interpret,
    )(*inputs)
    return o, w[..., :kv_len]
