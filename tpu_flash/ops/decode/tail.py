"""Exact recent-window tail attention for quantized paged decode —
EXTERNAL-merge construction.

The engine's burst decode now uses the fused form instead
(``paged_attention(recent_k=..., recent_v=...)``: the ring rides as a
final in-kernel block, one dispatch). This module remains the reference
construction the fused kernel is tested against
(tests/test_recent_window.py) and the building block for paths that
already hold a softmax state externally (future ragged/prefill tails).


KIVI-style residual window (Liu et al. 2024 — "KIVI: A Tuning-Free
Asymmetric 2bit Quantization for KV Cache" popularized keeping a small
full-precision residual window; the mechanism here is the same, applied
page-free): the engine's cache keeps the last W tokens of every slot in
an exact bf16 ring alongside the quantized pages (engine/cache.py).
Decode attends pages for positions [0, L - W) via the paged kernel
(``return_state=True``) and the ring for [L - W, L) here, then merges
the two online-softmax states once. On the config-9 stress model this
moves int4 greedy token-match from ~0.10 to ~1.0 within the window
(BENCHLOG 2026-08-20 round 4).

Ring semantics: token at absolute position p lives at ring row p % W
(the cache dual-writes on append). Row j's position is recoverable from
the sequence length alone: p_j = (L-1) - ((L-1-j) mod W); rows with
p_j < quant_len are stale or already covered by the paged call and are
masked. The softmax is order-invariant, so ring rotation needs no
unrotate.

The reference has no decode/cache analogue (prefill-only,
kernels/FlashAttention.cuh); this extends the north-star serving scope.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from tpu_flash.core.reference import DEFAULT_MASK_VALUE


def recent_tail_state(
    q: jax.Array,  # [batch, num_q_heads, head_dim] (pre-scaled NOT applied)
    k_ring: jax.Array,  # [batch, num_kv_heads, W, head_dim] bf16
    v_ring: jax.Array,
    lengths: jax.Array,  # [batch] post-append context length L
    quant_len: jax.Array,  # [batch] tokens covered by the paged call
    *,
    sm_scale: float,
    softcap: Optional[float] = None,
    alibi: Optional[jax.Array] = None,  # [num_q_heads] slopes
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Softmax state (o, m, l) of q against ring positions
    [quant_len, L). o is normalized; m/l are [batch, num_q_heads] f32.
    Rows always have >= 1 valid position (quant_len < L for L >= 1)."""
    b, hq, d = q.shape
    hkv, w = k_ring.shape[1], k_ring.shape[2]
    g = hq // hkv
    # Scaled q rounds to the ring dtype before QK^T — the same rounding
    # the paged kernel's native-bf16 tier applies (q_op = q.astype(bf16),
    # ops/decode/paged.py) — so a context fully inside the window
    # reproduces the bf16-cache engine's numerics instead of adding a
    # second path.
    qg = (
        q.reshape(b, hkv, g, d).astype(jnp.float32) * sm_scale
    ).astype(k_ring.dtype)
    s = jnp.einsum(
        "bhgd,bhwd->bhgw", qg, k_ring,
        preferred_element_type=jnp.float32,
    )
    if softcap is not None:
        s = softcap * jnp.tanh(s * (1.0 / softcap))
    j = jnp.arange(w)
    last = (lengths - 1)[:, None]  # [b, 1]
    pos = last - ((last - j) % w)  # [b, w] position held by ring row j
    valid = (pos >= quant_len[:, None]) & (pos >= 0)
    if alibi is not None:
        slopes = alibi.astype(jnp.float32).reshape(1, hkv, g, 1)
        s = s + slopes * (pos[:, None, None, :] - last[:, None, None, :])
    s = jnp.where(valid[:, None, None, :], s, DEFAULT_MASK_VALUE)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = jnp.where(valid[:, None, None, :], p, 0.0)
    l = jnp.sum(p, axis=-1, keepdims=True)
    # P rounds to the ring dtype before PV — the same rounding the paged
    # kernel's native-bf16 tier applies — so a context fully inside the
    # window reproduces the bf16-cache engine bit-for-bit-ish instead of
    # adding a second numerics path.
    o = jnp.einsum(
        "bhgw,bhwd->bhgd", p.astype(v_ring.dtype), v_ring,
        preferred_element_type=jnp.float32,
    )
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o = (o * l_inv).reshape(b, hq, d)
    return (
        o.astype(q.dtype),
        m[..., 0].reshape(b, hq),
        l[..., 0].reshape(b, hq),
    )


def merge_attention_states(
    o1: jax.Array,  # [batch, num_q_heads, head_dim] normalized
    m1: jax.Array,  # [batch, num_q_heads]
    l1: jax.Array,
    o2: jax.Array,
    m2: jax.Array,
    l2: jax.Array,
    *,
    part1_valid: Optional[jax.Array] = None,  # [batch] rows where part 1
    sinks: Optional[jax.Array] = None,  # [num_q_heads] sink logits
) -> jax.Array:
    """Merge two normalized attention parts by their softmax states; fold
    the per-head attention-sink logit (valueless denominator term) exactly
    once. ``part1_valid=False`` rows (entire context inside part 2) drop
    part 1, whose state is garbage from a clamped-length kernel call."""
    if part1_valid is not None:
        pv = part1_valid[:, None]
        m1 = jnp.where(pv, m1, -jnp.inf)
        l1 = jnp.where(pv, l1, 0.0)
    m = jnp.maximum(m1, m2)
    if sinks is not None:
        m = jnp.maximum(m, sinks.astype(jnp.float32)[None, :])
    a1 = jnp.where(m1 == -jnp.inf, 0.0, jnp.exp(m1 - m)) * l1
    a2 = jnp.where(m2 == -jnp.inf, 0.0, jnp.exp(m2 - m)) * l2
    denom = a1 + a2
    if sinks is not None:
        denom = denom + jnp.exp(sinks.astype(jnp.float32)[None, :] - m)
    denom = jnp.where(denom == 0.0, 1.0, denom)
    o = (
        o1.astype(jnp.float32) * (a1 / denom)[..., None]
        + o2.astype(jnp.float32) * (a2 / denom)[..., None]
    )
    return o.astype(o1.dtype)
