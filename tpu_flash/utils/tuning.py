"""Hardware-aware kernel tile selection.

TPU-native descendant of the reference's host tile heuristics
(``calculateSizeBlockQ`` / ``calculateSizeBlockKV``, helpers.hpp:8-30), with
the lesson of that file applied: its register/L2 formulas drifted from
reality and were overridden with a hardcoded 64 (helpers.hpp:17-18, 28-29).
Here the *formula* is a VMEM-budget feasibility check and the *choice* comes
from an empirically-tuned per-generation table, formula only as fallback.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp

from tpu_flash.core.config import BlockSizes

NUM_LANES = 128
# Leave headroom under the ~128 MiB VMEM for pipelining double buffers:
# Pallas allocates 2x each input/output block for the grid pipeline.
DEFAULT_VMEM_BUDGET = 64 * 2**20


def _itemsize(dtype) -> int:
    return jnp.dtype(dtype).itemsize


def fwd_vmem_bytes(
    block_q: int,
    block_kv_major: int,
    block_kv: int,
    head_dim: int,
    dtype=jnp.bfloat16,
) -> int:
    """VMEM footprint of one forward grid cell (with 2x pipeline buffers)."""
    itm = _itemsize(dtype)
    q = block_q * head_dim * itm
    kv = 2 * block_kv_major * head_dim * itm  # K and V
    o = block_q * head_dim * itm
    scores = block_q * block_kv * 4  # f32 scores tile
    scratch = block_q * (2 * NUM_LANES + head_dim) * 4  # m, l, acc f32
    return 2 * (q + kv + o) + scores + scratch


def bwd_vmem_bytes(
    block_q: int, block_kv: int, head_dim: int, dtype=jnp.bfloat16
) -> int:
    """Rough VMEM footprint of one dKV backward cell (the heavier of the
    two backward kernels): q/k/v/do blocks + lse/di residual tiles + dk/dv
    outputs (2x pipeline buffers), plus the f32 p/dp/ds score temporaries
    and the dk/dv f32 scratch."""
    itm = _itemsize(dtype)
    blocks = (
        2 * block_q * head_dim * itm  # q, do
        + 2 * block_kv * head_dim * itm  # k, v
        + 2 * block_q * NUM_LANES * 4  # lse, di
        + 2 * block_kv * head_dim * itm  # dk, dv outputs
    )
    scores = 3 * block_q * block_kv * 4  # p, dp, ds f32 temporaries
    scratch = 2 * block_kv * head_dim * 4
    return 2 * blocks + scores + scratch


@functools.lru_cache(maxsize=None)
def default_block_sizes(
    q_len: int,
    kv_len: int,
    head_dim: int,
    dtype_str: str = "bfloat16",
    vmem_budget: int = DEFAULT_VMEM_BUDGET,
) -> BlockSizes:
    """Pick forward/backward tile shapes for the given problem shape.

    Strategy: prefer large Q tiles (better MXU occupancy on the two matmuls
    and fewer revisits of K/V) and a KV-major tile that amortizes HBM DMA,
    shrinking until the VMEM feasibility check passes.
    """
    dtype = jnp.dtype(dtype_str)

    def pow2_round_up(x: int, lo: int) -> int:
        p = lo
        while p < x:
            p *= 2
        return p

    # Priors from the v5e sweep (BENCHLOG.md): per-grid-cell overhead on
    # this part is large, so big 1024x1024 tiles win decisively over the
    # 128-512 range (81 vs 31-57 TFLOP/s on Llama-2 2K prefill); inner
    # block_kv == block_kv_major (two-level tiling measured slower). All
    # tiles are powers of two so forward and backward tilings divide the
    # padded sequence lengths.
    block_q = min(1024, pow2_round_up(q_len, 8))
    block_kv_major = min(1024, pow2_round_up(kv_len, NUM_LANES))
    block_kv = block_kv_major

    while (
        fwd_vmem_bytes(block_q, block_kv_major, block_kv, head_dim, dtype)
        > vmem_budget
    ):
        if block_kv_major >= block_q and block_kv_major > NUM_LANES:
            block_kv_major //= 2
            block_kv = min(block_kv, block_kv_major)
        elif block_q > NUM_LANES:
            block_q //= 2
        else:
            break  # minimum shapes; let the compiler complain if it must

    # Backward tiles match the forward's (1024-capped): with the
    # triangular grid, 1024 tiles beat 256 by 1.4x at 8K (BENCHLOG
    # 2026-08-17 backward tile sweep) — small tiles were only ever a
    # dead-cell mitigation. The backward cell is ~3x the forward's VMEM,
    # so it gets its own feasibility shrink.
    bwd_q, bwd_kv = block_q, block_kv_major
    while (
        bwd_vmem_bytes(bwd_q, bwd_kv, head_dim, dtype) > vmem_budget
        and max(bwd_q, bwd_kv) > NUM_LANES
    ):
        if bwd_kv >= bwd_q:
            bwd_kv //= 2
        else:
            bwd_q //= 2

    return BlockSizes(
        block_q=block_q,
        block_kv_major=block_kv_major,
        block_kv=block_kv,
        block_q_dkv=bwd_q,
        block_kv_dkv=bwd_kv,
        block_q_dq=bwd_q,
        block_kv_dq=bwd_kv,
        # Causal forward enumerates only active cells (measured: +5-7% at
        # 8K-32K from eliminating predicated dead cells, never worse;
        # BENCHLOG 2026-08-17). Non-causal calls ignore the flag.
        triangular=True,
    )
