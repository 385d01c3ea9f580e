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

from tpu_flash.core.softmax import (
    SoftmaxState,
    finalize,
    finalize_with_sinks,
    merge_softmax_states,
)
from tpu_flash.ops.flash.api import flash_attention


def _block_state(q, k, v, *, causal, sm_scale, interpret, window=None,
                 q_offset=0, softcap=None, alibi=None):
    """Partial-attention state of one KV block (static causal flag; the
    banded sub-diagonal blocks of a windowed ring run causal at a static
    q_offset so the band mask lands on the right absolute positions)."""
    o, lse = flash_attention(
        q, k, v, causal=causal, sm_scale=sm_scale, window=window,
        q_offset=q_offset, softcap=softcap,
        save_residuals=True, interpret=interpret, alibi=alibi,
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
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,
    alibi: Optional[jax.Array] = None,
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
        # Heads may shard over the model axis: slice the per-head slopes
        # to this shard's range.
        from tpu_flash.parallel.mesh import shard_head_slice

        al = alibi
        if al is not None and head_spec is not None:
            al = shard_head_slice(
                al, al.shape[0] // mesh.shape[head_spec], head_spec
            )
        return ring_attention_local(
            q_blk, k_blk, v_blk,
            seq_axis=seq_axis, n_ring=n_ring, causal=causal,
            sm_scale=sm_scale, interpret=interpret,
            window=window, softcap=softcap, sinks=sinks, alibi=al,
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
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,
    alibi: Optional[jax.Array] = None,
):
    """Per-shard ring attention body — callable inside an enclosing
    shard_map (e.g. the TP+SP training step), where q/k/v are the local
    sequence blocks of this chip.

    ``window``/``softcap``: per the flash kernel. A sliding window
    decomposes over ring blocks by the chip distance d = my - src: the
    diagonal runs causal+window; blocks fully inside the window run
    dense; blocks straddling the window's lower edge run BANDED (causal
    at static q_offset = d * block so the band mask lands on absolute
    positions); blocks entirely below the window are skipped — windowed
    long context does O(window) work per chip, not O(context).

    ``sinks`` ([local q heads]): folded into the denominator exactly once
    at the final normalization — NOT per block (each block's lse must
    stay sink-free or the sink mass would be counted n_ring times)."""
    if sm_scale is None:
        sm_scale = q_blk.shape[-1] ** -0.5
    if window is not None and not causal:
        raise ValueError("window requires causal=True")
    if alibi is not None and not causal:
        raise ValueError("alibi requires causal=True")
    if n_ring == 1:
        return flash_attention(
            q_blk, k_blk, v_blk, causal=causal, sm_scale=sm_scale,
            interpret=interpret, window=window, softcap=softcap,
            sinks=sinks, alibi=alibi,
        )
    my = jax.lax.axis_index(seq_axis)
    perm = [(i, (i + 1) % n_ring) for i in range(n_ring)]
    blk_len = q_blk.shape[2]

    # Branch per chip-distance d = my - src, deduped: most distances
    # collapse to "dense", "empty", or the diagonal; only the <= 2
    # window-straddling distances compile their own banded kernel.
    #
    # ALiBi keeps the dedup: the bias slope*(kv_pos - q_pos) splits into
    # an in-block part the kernel computes and a per-(head, distance)
    # CONSTANT — and a constant added to every score of a block is
    # exactly a shift of its state's m (weights and l unchanged), applied
    # after the switch with the dynamic distance. Diag/band branches pass
    # the exact q_offset so their in-kernel bias is already absolute; the
    # shared dense branch runs causal at q_offset=blk_len (an all-visible
    # mask) and gets the m-shift slope * blk_len * (1 - d).
    def _dense():
        if alibi is None:
            return _block_state(
                q_blk_c[0], q_blk_c[1], q_blk_c[2], causal=False,
                sm_scale=sm_scale, interpret=interpret, softcap=softcap,
            )
        return _block_state(
            q_blk_c[0], q_blk_c[1], q_blk_c[2], causal=True,
            sm_scale=sm_scale, interpret=interpret, softcap=softcap,
            q_offset=blk_len, alibi=alibi,
        )

    def _kind_for(d: int):
        if not causal:
            return ("dense",)
        if d == 0:
            return ("diag",)
        if window is None or window >= d * blk_len + blk_len:
            return ("dense",)
        if window <= d * blk_len - blk_len + 1:
            return ("empty",)
        return ("band", d)

    def _branch(kind):
        if kind == ("diag",):
            return lambda: _block_state(
                q_blk_c[0], q_blk_c[1], q_blk_c[2], causal=True,
                sm_scale=sm_scale, interpret=interpret, window=window,
                softcap=softcap, alibi=alibi,
            )
        if kind == ("dense",):
            return _dense
        if kind == ("empty",):
            return lambda: _empty_like_state(q_blk_c[0])
        d = kind[1]
        return lambda: _block_state(
            q_blk_c[0], q_blk_c[1], q_blk_c[2], causal=True,
            sm_scale=sm_scale, interpret=interpret, window=window,
            q_offset=d * blk_len, softcap=softcap, alibi=alibi,
        )

    kinds = [_kind_for(d) for d in range(n_ring)] + [("empty",)]
    unique = []
    table = []
    for kd in kinds:
        if kd not in unique:
            unique.append(kd)
        table.append(unique.index(kd))
    branch_table = jnp.asarray(table, jnp.int32)  # delta (or skip) → branch
    q_blk_c = [q_blk, None, None]  # mutable cell: branches read k/v per step

    def step(carry, step_idx):
        state, k_cur, v_cur = carry
        src = jax.lax.rem(my - step_idx + n_ring, n_ring)
        if causal:
            # src > my (future block): index n_ring → the skip branch.
            delta = jnp.where(src > my, n_ring, my - src)
        else:
            delta = jnp.zeros((), jnp.int32)
        q_blk_c[1] = k_cur
        q_blk_c[2] = v_cur
        blk = jax.lax.switch(
            branch_table[delta], [_branch(kd) for kd in unique]
        )
        if alibi is not None and ("dense",) in unique:
            # Correct the shared dense branch's constant bias offset: it
            # computed the ALiBi bias at q_offset=blk_len; the true
            # distance needs q_offset=d*blk_len. The difference is a
            # per-head constant over the whole block — an m-shift.
            is_dense = branch_table[delta] == unique.index(("dense",))
            shift = jnp.where(
                is_dense, jnp.float32(blk_len) * (1.0 - delta), 0.0
            )
            blk = SoftmaxState(
                acc=blk.acc,
                m=blk.m
                + alibi.astype(jnp.float32)[None, :, None, None] * shift,
                l=blk.l,
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
    if sinks is not None:
        return finalize_with_sinks(state, sinks, q_blk.dtype)
    return finalize(state, q_blk.dtype)
