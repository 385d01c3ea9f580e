"""Ulysses sequence parallelism: all-to-all head-scatter / seq-gather.

The alternative SP strategy to ring attention (SURVEY.md §2 parallelism
checklist), behind the same call shape. Where ring attention keeps heads
whole and rotates KV blocks around the ``seq`` axis (n_ring ppermute hops,
O(s/n) memory), Ulysses keeps the *sequence* whole during attention:

  1. all-to-all: inputs arrive sequence-sharded [b, h, s/n, d]; each chip
     trades its sequence shard of (n-1)/n of the heads for all sequence
     shards of h/n heads → [b, h/n, s, d];
  2. every chip runs the ordinary single-chip flash kernel on its heads —
     full context, exact causal masking, no cross-chip merge algebra;
  3. inverse all-to-all restores sequence sharding.

Tradeoffs vs ring: 2 all-to-alls instead of n ppermutes (better on
all-to-all-rich ICI fabrics, worse on a bare ring), needs
num_{q,kv}_heads % n == 0, and holds O(s) KV per chip during attention
(ring holds O(s/n)). It composes with TP on a separate mesh axis.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tpu_flash.ops.flash.api import flash_attention


def ulysses_attention(
    mesh: Mesh,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    seq_axis: str = "seq",
    interpret: Optional[bool] = None,
    window: Optional[int] = None,
    softcap: Optional[float] = None,
    sinks: Optional[jax.Array] = None,
    alibi: Optional[jax.Array] = None,
):
    """Returns a jitted fn(q, k, v) with q/k/v sequence-sharded on
    ``seq_axis`` ([b, h, s, d] global shapes; s divisible by the axis size,
    heads divisible by the axis size).

    Attention variants pass straight through: each chip runs the ordinary
    single-chip kernel on its full-context head slice, so ``window``/
    ``softcap`` apply as-is and the per-head ``sinks``/``alibi`` arrays
    slice to the chip's contiguous head range."""
    n = mesh.shape[seq_axis]

    def _per_head_slice(vals, hq_local):
        from tpu_flash.parallel.mesh import shard_head_slice

        if vals is None or n == 1:
            return vals
        return shard_head_slice(vals, hq_local, seq_axis)

    def _local(q, k, v):
        # [b, h, s/n, d] -> [b, h/n, s, d]: scatter heads, gather sequence.
        if q.shape[1] % n or k.shape[1] % n:
            raise ValueError(
                f"ulysses needs num_q_heads ({q.shape[1] * 1}) and "
                f"num_kv_heads ({k.shape[1]}) divisible by the seq axis "
                f"size ({n}); use ring attention for few-head models"
            )
        if n > 1:
            a2a = lambda x: jax.lax.all_to_all(  # noqa: E731
                x, seq_axis, split_axis=1, concat_axis=2, tiled=True
            )
            q, k, v = a2a(q), a2a(k), a2a(v)
        hq_local = q.shape[1]
        o = flash_attention(
            q, k, v, causal=causal, sm_scale=sm_scale, interpret=interpret,
            window=window, softcap=softcap,
            sinks=_per_head_slice(sinks, hq_local),
            alibi=_per_head_slice(alibi, hq_local),
        )
        if n > 1:
            # Inverse: [b, h/n, s, d] -> [b, h, s/n, d].
            o = jax.lax.all_to_all(
                o, seq_axis, split_axis=2, concat_axis=1, tiled=True
            )
        return o

    spec = P(None, None, seq_axis, None)
    return jax.jit(
        shard_map(
            _local,
            mesh=mesh,
            in_specs=(spec, spec, spec),
            out_specs=spec,
            check_vma=False,
        )
    )
