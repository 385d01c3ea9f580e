"""Online-softmax merge algebra.

The reference's ``updateSoftmaxState`` (utils.cuh:58-81) fuses the running
(max, sum) update into the per-tile kernel loop. Here the same mathematics is
factored out as a standalone **associative, commutative** binary operator on
partial-attention states, because the framework reuses it at three scales:

  1. in-kernel, across KV tiles (ops/flash/forward.py),
  2. across KV shards of a context-parallel mesh (parallel/ring.py),
  3. across chunks of a paged decode (ops/decode/paged.py).

Unlike the reference — which eagerly normalizes O by the running sum after
every tile (utils.cuh:79-80, costing extra divides and precision) — states
here carry an *unnormalized* accumulator; normalization happens once, in
:func:`finalize`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SoftmaxState(NamedTuple):
    """Partial attention over a subset S of KV positions.

    acc: sum_{j in S} exp(s_j - m) * v_j     [..., head_dim]  (unnormalized)
    m:   max_{j in S} s_j                    [..., 1]
    l:   sum_{j in S} exp(s_j - m)           [..., 1]
    """

    acc: jax.Array
    m: jax.Array
    l: jax.Array


def empty_state(shape, head_dim, dtype=jnp.float32) -> SoftmaxState:
    """Identity element: attention over the empty KV set."""
    return SoftmaxState(
        acc=jnp.zeros((*shape, head_dim), dtype),
        m=jnp.full((*shape, 1), -jnp.inf, dtype),
        l=jnp.zeros((*shape, 1), dtype),
    )


def merge_softmax_states(a: SoftmaxState, b: SoftmaxState) -> SoftmaxState:
    """Combine partial attention over disjoint KV sets. Associative.

    m = max(m_a, m_b); each side is rescaled by exp(m_side - m), which is the
    generalization of the reference's per-tile correction factor
    ``exp(m_old - m_new)`` at utils.cuh:75-80.
    """
    m = jnp.maximum(a.m, b.m)
    # Guard the identity element: exp(-inf - -inf) would be NaN.
    alpha = jnp.where(a.m == -jnp.inf, 0.0, jnp.exp(a.m - m))
    beta = jnp.where(b.m == -jnp.inf, 0.0, jnp.exp(b.m - m))
    return SoftmaxState(
        acc=a.acc * alpha + b.acc * beta,
        m=jnp.where(jnp.isneginf(a.m) & jnp.isneginf(b.m), -jnp.inf, m),
        l=a.l * alpha + b.l * beta,
    )


def state_from_block(
    scores: jax.Array, v: jax.Array, preferred_dtype=jnp.float32
) -> SoftmaxState:
    """Build a state from one block of (already masked, scaled) scores.

    Args:
      scores: [..., q, kv] float32 scores.
      v: [..., kv, head_dim] values.
    """
    m = jnp.max(scores, axis=-1, keepdims=True)
    # Fully-masked rows: keep m=-inf convention, p=0.
    p = jnp.where(m == -jnp.inf, 0.0, jnp.exp(scores - m))
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum(
        "...qk,...kd->...qd",
        p,
        v.astype(preferred_dtype),
        precision=jax.lax.Precision.HIGHEST,
    )
    return SoftmaxState(acc=acc, m=m, l=l)


def finalize(state: SoftmaxState, dtype=None) -> jax.Array:
    """Deferred normalization: O = acc / l (safe where l == 0)."""
    l_inv = jnp.where(state.l == 0.0, 1.0, 1.0 / state.l)
    out = state.acc * l_inv
    return out.astype(dtype) if dtype is not None else out


def finalize_with_sinks(
    state: SoftmaxState, sinks: jax.Array, dtype=None
) -> jax.Array:
    """Finalize with per-head attention-sink logits folded into the
    denominator exactly once (the sink is a valueless softmax column, so
    it must NOT be added per partial block — only here, after all merges).

    Args:
      state: merged state with m/l of shape [batch, heads, q, 1].
      sinks: [heads] logits.
    """
    sk = sinks.astype(jnp.float32)[None, :, None, None]
    m2 = jnp.maximum(state.m, sk)
    scale = jnp.where(state.m == -jnp.inf, 0.0, jnp.exp(state.m - m2))
    l_tot = state.l * scale + jnp.exp(sk - m2)
    out = state.acc * (scale / l_tot)
    return out.astype(dtype) if dtype is not None else out


def merge_over_axis(state: SoftmaxState, axis_name: str) -> SoftmaxState:
    """Cross-chip merge of partial states inside shard_map/pmap.

    The distributed analogue of merge_softmax_states: pmax for the global
    max, psum of rescaled (acc, l). Used by context-parallel attention.
    """
    m_global = jax.lax.pmax(state.m, axis_name=axis_name)
    alpha = jnp.where(state.m == -jnp.inf, 0.0, jnp.exp(state.m - m_global))
    acc = jax.lax.psum(state.acc * alpha, axis_name=axis_name)
    l = jax.lax.psum(state.l * alpha, axis_name=axis_name)
    return SoftmaxState(acc=acc, m=m_global, l=l)
