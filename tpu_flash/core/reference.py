"""Exact-attention oracles in pure jnp.

The numerical contract every kernel in this framework must match — the
TPU-native equivalent of the reference's two golden references: the PyTorch
``multi_head_attention`` (check.py:4-25) and the CPU exact-softmax loop in its
integration test (tests/main.cu:74-91). All math is done in float32 regardless
of input dtype, with masking applied as a large negative additive bias (the
reference uses -1e9 at tests/main.cu:84; we use a dtype-aware large-negative
to stay NaN-free, see DEFAULT_MASK_VALUE).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

# -0.7 * float32 max: large enough to zero out after exp, small enough that
# (mask + mask) does not overflow to -inf and produce NaN in exp(x - m).
DEFAULT_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


class SegmentIds(NamedTuple):
    """Per-token segment ids for packed (multi-document) attention.

    Attention is masked wherever ``q`` and ``kv`` ids differ, so packed
    sequences never attend across document boundaries. Shapes:
    ``q`` [batch, q_len] int32, ``kv`` [batch, kv_len] int32.
    """

    q: jax.Array
    kv: jax.Array


def reference_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    bias: Optional[jax.Array] = None,
    q_segment_ids: Optional[jax.Array] = None,
    kv_segment_ids: Optional[jax.Array] = None,
    q_offset: int = 0,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,
    alibi: Optional[jax.Array] = None,
    return_weights: bool = False,
) -> jax.Array:
    """Exact multi-head attention: softmax(scale * Q K^T + mask) V.

    Args:
      q: [batch, num_heads, q_len, head_dim]
      k: [batch, num_heads, kv_len, head_dim]
      v: [batch, num_heads, kv_len, head_dim]
      causal: apply causal mask (q position i attends to kv positions <= i).
      sm_scale: score scale; defaults to 1/sqrt(head_dim) (check.py:19).
      bias: optional additive [batch, num_heads, q_len, kv_len] bias.
      q_segment_ids / kv_segment_ids: [batch, q_len] / [batch, kv_len] int
        segment ids; attention is masked across segment boundaries.
      q_offset: global position of q[..., 0, :] for causal masking when the
        query block is a suffix of the kv sequence (decode).
      window: sliding-window size (causal only): q position p attends to kv
        positions in [p - window + 1, p] (Mistral convention: window counts
        the attended positions including self).
      softcap: logit soft-capping — scores become
        ``softcap * tanh(scores / softcap)`` after scaling, before masking
        (Gemma-2 convention).
      sinks: [num_heads] per-head attention-sink logits (StreamingLLM /
        gpt-oss convention): each head's softmax denominator gains
        ``exp(sinks[h])`` — a virtual position with no value — damping
        attention mass when nothing matches.
      alibi: [num_heads] per-head ALiBi slopes (positive; see
        ``alibi_slopes``): scores gain ``slope_h * (kv_pos - q_pos)`` —
        a linear distance penalty replacing positional embeddings
        (BLOOM/MPT convention). Positions are absolute (q_offset-aware).
      return_weights: also return the post-softmax attention probabilities
        [batch, num_heads, q_len, kv_len] f32 — the debug surface of the
        reference's golden oracle, which returns ``(output, attn)``
        (check.py:25), for inspecting attention maps while debugging
        kernel variants.

    Returns:
      [batch, num_heads, q_len, head_dim] in q.dtype, or
      ``(output, weights)`` when ``return_weights``.
    """
    orig_dtype = q.dtype
    q = q.astype(jnp.float32)
    k = k.astype(jnp.float32)
    v = v.astype(jnp.float32)
    head_dim = q.shape[-1]
    scale = sm_scale if sm_scale is not None else head_dim**-0.5

    scores = (
        jnp.einsum("bhqd,bhkd->bhqk", q, k, precision=jax.lax.Precision.HIGHEST)
        * scale
    )
    if softcap is not None:
        scores = softcap * jnp.tanh(scores / softcap)
    if bias is not None:
        scores = scores + bias.astype(jnp.float32)
    if alibi is not None:
        q_pos = jnp.arange(q.shape[2], dtype=jnp.float32)[:, None] + q_offset
        kv_pos = jnp.arange(k.shape[2], dtype=jnp.float32)[None, :]
        scores = scores + (
            alibi.astype(jnp.float32)[None, :, None, None]
            * (kv_pos - q_pos)[None, None]
        )

    mask = None
    if window is not None and not causal:
        raise ValueError("window requires causal=True")
    if causal:
        q_len, kv_len = q.shape[2], k.shape[2]
        q_pos = jnp.arange(q_len)[:, None] + q_offset
        kv_pos = jnp.arange(kv_len)[None, :]
        mask = kv_pos <= q_pos  # [q_len, kv_len]
        if window is not None:
            mask = jnp.logical_and(mask, kv_pos > q_pos - window)
        mask = mask[None, None]
    if q_segment_ids is not None:
        seg = q_segment_ids[:, :, None] == kv_segment_ids[:, None, :]
        seg = seg[:, None]  # [batch, 1, q_len, kv_len]
        mask = seg if mask is None else jnp.logical_and(mask, seg)

    if mask is not None:
        scores = jnp.where(mask, scores, DEFAULT_MASK_VALUE)

    if sinks is None:
        weights = jax.nn.softmax(scores, axis=-1)
    else:
        # Softmax over [scores | sink]: the sink is a per-head virtual
        # logit with no value row, so it only inflates the denominator.
        sink_col = jnp.broadcast_to(
            sinks.astype(jnp.float32)[None, :, None, None],
            (*scores.shape[:3], 1),
        )
        full = jnp.concatenate([scores, sink_col], axis=-1)
        weights = jax.nn.softmax(full, axis=-1)[..., :-1]
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", weights, v, precision=jax.lax.Precision.HIGHEST
    )
    if return_weights:
        return out.astype(orig_dtype), weights
    return out.astype(orig_dtype)


def reference_gqa_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    q_offset: int = 0,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,
    alibi: Optional[jax.Array] = None,
) -> jax.Array:
    """Exact grouped-query attention.

    Args:
      q: [batch, num_q_heads, q_len, head_dim]
      k, v: [batch, num_kv_heads, kv_len, head_dim], num_kv_heads divides
        num_q_heads.
    """
    num_q_heads = q.shape[1]
    num_kv_heads = k.shape[1]
    if num_q_heads % num_kv_heads != 0:
        raise ValueError(f"{num_q_heads=} not a multiple of {num_kv_heads=}")
    rep = num_q_heads // num_kv_heads
    k = jnp.repeat(k, rep, axis=1)
    v = jnp.repeat(v, rep, axis=1)
    return reference_attention(
        q, k, v, causal=causal, sm_scale=sm_scale, q_offset=q_offset,
        window=window, softcap=softcap, sinks=sinks, alibi=alibi,
    )


def alibi_slopes(num_heads: int) -> jax.Array:
    """Standard ALiBi per-head slopes (positive, descending).

    Power-of-two head counts use the geometric sequence
    ``2^(-8(h+1)/n)``; other counts interleave the next power's odd
    entries (the published ALiBi recipe, train-short-test-long paper).
    """
    import math

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start ** (i + 1) for i in range(n)]

    if math.log2(num_heads).is_integer():
        vals = pow2_slopes(num_heads)
    else:
        m = 2 ** int(math.floor(math.log2(num_heads)))
        vals = (
            pow2_slopes(m)
            + pow2_slopes(2 * m)[0::2][: num_heads - m]
        )
    return jnp.asarray(vals, jnp.float32)


def reference_decode_attention(
    q: jax.Array,
    k_cache: jax.Array,
    v_cache: jax.Array,
    lengths: jax.Array,
    *,
    sm_scale: Optional[float] = None,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,
    alibi: Optional[jax.Array] = None,
) -> jax.Array:
    """Exact single-token GQA decode against a (ragged) dense KV cache.

    Args:
      q: [batch, num_q_heads, head_dim] — one new token per sequence.
      k_cache, v_cache: [batch, num_kv_heads, max_len, head_dim].
      lengths: [batch] int32 valid lengths per sequence.
      window: sliding window — the token at position lengths-1 attends only
        to cache positions > lengths - 1 - window.
      softcap: logit soft-capping (see reference_attention).
    """
    max_len = k_cache.shape[2]
    num_q_heads, num_kv_heads = q.shape[1], k_cache.shape[1]
    rep = num_q_heads // num_kv_heads
    k = jnp.repeat(k_cache, rep, axis=1).astype(jnp.float32)
    v = jnp.repeat(v_cache, rep, axis=1).astype(jnp.float32)
    scale = sm_scale if sm_scale is not None else q.shape[-1] ** -0.5

    scores = (
        jnp.einsum(
            "bhd,bhkd->bhk",
            q.astype(jnp.float32),
            k,
            precision=jax.lax.Precision.HIGHEST,
        )
        * scale
    )
    if softcap is not None:
        scores = softcap * jnp.tanh(scores / softcap)
    pos = jnp.arange(max_len)[None, None, :]
    valid = pos < lengths[:, None, None]
    if window is not None:
        valid = jnp.logical_and(valid, pos > lengths[:, None, None] - 1 - window)
    if alibi is not None:
        scores = scores + alibi.astype(jnp.float32)[None, :, None] * (
            pos - (lengths[:, None, None] - 1)
        ).astype(jnp.float32)
    scores = jnp.where(valid, scores, DEFAULT_MASK_VALUE)
    if sinks is None:
        weights = jax.nn.softmax(scores, axis=-1)
    else:
        sink_col = jnp.broadcast_to(
            sinks.astype(jnp.float32)[None, :, None],
            (*scores.shape[:2], 1),
        )
        full = jnp.concatenate([scores, sink_col], axis=-1)
        weights = jax.nn.softmax(full, axis=-1)[..., :-1]
    out = jnp.einsum(
        "bhk,bhkd->bhd", weights, v, precision=jax.lax.Precision.HIGHEST
    )
    return out.astype(q.dtype)


def gather_pages_to_dense(
    pages: jax.Array,  # [num_kv_heads, num_pages, page_size, head_dim]
    page_indices: jax.Array,  # [batch, pages_per_seq]
) -> jax.Array:
    """Materialize a paged cache as dense [batch, hkv, max_len, head_dim] —
    the oracle-side inverse of the page table, for differential testing of
    the paged decode kernel."""
    gathered = pages[:, page_indices]  # [hkv, batch, pages_per_seq, ps, d]
    hkv, batch, pps, ps, d = gathered.shape
    return gathered.transpose(1, 0, 2, 3, 4).reshape(batch, hkv, pps * ps, d)
