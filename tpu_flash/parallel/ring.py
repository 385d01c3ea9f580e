"""Ring attention: sequence-parallel exact attention over the ICI ring.

KV shards rotate around the ``seq`` mesh axis via ``jax.lax.ppermute`` while
every chip runs the Pallas flash kernel on the block in front of it; partial
results merge through the associative online-softmax algebra
(core/softmax.py) — the same (m, l, O) update the single-chip kernel carries
across KV tiles (and the reference carries across SMEM tiles,
utils.cuh:58-81), lifted to cross-chip scale. XLA schedules each ppermute
concurrently with the next block's compute, hiding the transfer behind the
MXU work (BASELINE config 5).

The per-block partial is recovered from the kernel's (o, lse) residuals:
a normalized block output o with logsumexp lse is exactly the state
(acc=o, m=lse, l=1) — so no kernel change is needed for distribution.

Causal blocks decompose by block position (equal chunks): below-diagonal
blocks run dense, the diagonal block runs causal, above-diagonal blocks are
skipped entirely — the cross-chip form of the kernel's block-level causal
predication.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tpu_flash.core.softmax import SoftmaxState, finalize, merge_softmax_states
from tpu_flash.ops.flash.api import flash_attention


def _block_state(q, k, v, *, causal, sm_scale, interpret):
    """Partial-attention state of one KV block (static causal flag)."""
    o, lse = flash_attention(
        q, k, v, causal=causal, sm_scale=sm_scale,
        save_residuals=True, interpret=interpret,
    )
    m = lse[..., None]
    return SoftmaxState(
        acc=o.astype(jnp.float32), m=m, l=jnp.ones_like(m)
    )


def _empty_like_state(q):
    shape = (*q.shape[:3], 1)
    return SoftmaxState(
        acc=jnp.zeros(q.shape, jnp.float32),
        m=jnp.full(shape, -jnp.inf, jnp.float32),
        l=jnp.zeros(shape, jnp.float32),
    )


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    seq_axis: str = "seq",
    data_axis: str = "data",
    model_axis: Optional[str] = "model",
    interpret: Optional[bool] = None,
):
    """Exact attention with Q/K/V sharded along the sequence dimension.

    Args:
      q, k, v: [batch, heads, seq, head_dim] global arrays; seq must divide
        the ``seq`` axis size. Heads additionally shard over ``model`` when
        that axis exists (2D parallelism: ring x head).

    Returns [batch, heads, seq, head_dim] sharded the same way.
    """
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    n_ring = mesh.shape[seq_axis]
    head_spec = model_axis if model_axis and mesh.shape.get(model_axis, 1) > 1 else None
    spec = P(data_axis, head_spec, seq_axis, None)

    def _ring(q_blk, k_blk, v_blk):
        return ring_attention_local(
            q_blk, k_blk, v_blk,
            seq_axis=seq_axis, n_ring=n_ring, causal=causal,
            sm_scale=sm_scale, interpret=interpret,
        )

    fn = shard_map(
        _ring,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def ring_attention_local(
    q_blk: jax.Array,
    k_blk: jax.Array,
    v_blk: jax.Array,
    *,
    seq_axis: str,
    n_ring: int,
    causal: bool,
    sm_scale: Optional[float] = None,
    interpret: Optional[bool] = None,
):
    """Per-shard ring attention body — callable inside an enclosing
    shard_map (e.g. the TP+SP training step), where q/k/v are the local
    sequence blocks of this chip."""
    if sm_scale is None:
        sm_scale = q_blk.shape[-1] ** -0.5
    if n_ring == 1:
        return flash_attention(
            q_blk, k_blk, v_blk, causal=causal, sm_scale=sm_scale,
            interpret=interpret,
        )
    my = jax.lax.axis_index(seq_axis)
    perm = [(i, (i + 1) % n_ring) for i in range(n_ring)]

    def step(carry, step_idx):
        state, k_cur, v_cur = carry
        src = jax.lax.rem(my - step_idx + n_ring, n_ring)
        if causal:
            # Block relation: src == my → diagonal (causal); src < my →
            # fully below diagonal (dense); src > my → skip.
            kind = jnp.where(src == my, 1, jnp.where(src < my, 0, 2))
        else:
            kind = jnp.zeros((), jnp.int32)

        blk = jax.lax.switch(
            kind,
            [
                lambda: _block_state(
                    q_blk, k_cur, v_cur, causal=False,
                    sm_scale=sm_scale, interpret=interpret,
                ),
                lambda: _block_state(
                    q_blk, k_cur, v_cur, causal=True,
                    sm_scale=sm_scale, interpret=interpret,
                ),
                lambda: _empty_like_state(q_blk),
            ],
        )
        state = merge_softmax_states(state, blk)
        # Rotate KV to the next chip; XLA overlaps this ppermute with
        # the next iteration's flash kernel.
        k_nxt = jax.lax.ppermute(k_cur, seq_axis, perm)
        v_nxt = jax.lax.ppermute(v_cur, seq_axis, perm)
        return (state, k_nxt, v_nxt), None

    init = (_empty_like_state(q_blk), k_blk, v_blk)
    (state, _, _), _ = jax.lax.scan(
        step, init, jnp.arange(n_ring), length=n_ring
    )
    return finalize(state, q_blk.dtype)
