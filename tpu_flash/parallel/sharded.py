"""shard_map-wrapped attention: head-sharded TP + data parallelism.

The distributed layer the reference lacks entirely (SURVEY.md §2 parallelism
checklist): Q heads shard over the ``model`` axis with zero communication
during attention (GQA co-locates each KV head with its query group); batch
shards over ``data``. The paged decode kernel shards its KV pages over KV
heads on ``model`` — each chip owns the pages of its heads.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from tpu_flash.ops.decode.paged import paged_attention
from tpu_flash.ops.flash.api import flash_attention


def sharded_flash_attention(
    mesh: Mesh,
    *,
    causal: bool = False,
    sm_scale: Optional[float] = None,
    q_offset: int = 0,
    data_axis: str = "data",
    model_axis: str = "model",
    interpret: Optional[bool] = None,
):
    """Returns a jitted fn(q, k, v) with batch on ``data`` and heads on
    ``model``. num_q_heads and num_kv_heads must both divide the model-axis
    size (GQA head groups stay co-located)."""

    qkv_spec = P(data_axis, model_axis, None, None)

    def _local(q, k, v):
        return flash_attention(
            q, k, v, causal=causal, sm_scale=sm_scale, q_offset=q_offset,
            interpret=interpret,
        )

    return jax.jit(
        shard_map(
            _local,
            mesh=mesh,
            in_specs=(qkv_spec, qkv_spec, qkv_spec),
            out_specs=qkv_spec,
            check_vma=False,
        )
    )


def sharded_paged_attention(
    mesh: Mesh,
    *,
    sm_scale: Optional[float] = None,
    pages_per_compute_block: int = 4,
    model_axis: str = "model",
    interpret: Optional[bool] = None,
):
    """Paged GQA decode sharded over KV heads: pages, scales, and query-head
    groups all split on ``model``; lengths/page tables replicated. Returns a
    jitted fn(q, k_pages, v_pages, lengths, page_indices) for dense pages,
    where k_pages/v_pages are plain arrays [hkv, pages, page_size, d]."""

    def _local(q, k_pages, v_pages, lengths, page_indices):
        return paged_attention(
            q, k_pages, v_pages, lengths, page_indices,
            sm_scale=sm_scale,
            pages_per_compute_block=pages_per_compute_block,
            interpret=interpret,
        )

    return jax.jit(
        shard_map(
            _local,
            mesh=mesh,
            in_specs=(
                P(None, model_axis, None),  # q: heads sharded
                P(model_axis, None, None, None),  # k pages: kv heads sharded
                P(model_axis, None, None, None),  # v pages
                P(),  # lengths
                P(),  # page tables
            ),
            out_specs=P(None, model_axis, None),
            check_vma=False,
        )
    )
