"""Hardware-aware kernel tile selection.

TPU-native descendant of the reference's host tile heuristics
(``calculateSizeBlockQ`` / ``calculateSizeBlockKV``, helpers.hpp:8-30), with
the lesson of that file applied twice over: its register/L2 formulas drifted
from reality and were overridden with a hardcoded 64 (helpers.hpp:17-18,
28-29), and its ``check_gpu_props`` probe (main.cpp:5-26) was never wired to
the launch. Here the probe (:mod:`tpu_flash.utils.device`) *is* wired in:

* the VMEM feasibility budget comes from the probed generation's VMEM size,
* tile caps come from a per-generation prior table (v5e entries measured on
  hardware, other generations formula-scaled until measured),
* an opt-in :func:`autotune` sweeps candidate tilings on the attached chip
  and caches the winner (process-level + on-disk), so the empirical path the
  reference left unbuilt exists end to end.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Iterable, Optional

import jax.numpy as jnp

from tpu_flash.core.config import BlockSizes

NUM_LANES = 128


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


# Per-generation tuning priors. ``tile_cap`` is the largest forward tile the
# generation's grid-cell overhead amortizes (v5e: measured, BENCHLOG.md —
# 1024x1024 beats 128-512 decisively on 2K prefill; per-cell fixed cost is
# large). v5p/v6e share the 128 MiB VMEM and MXU tile, so the cap carries
# over as a formula-scaled prior until a chip of that kind is measured;
# their faster MXUs only *raise* the relative per-cell overhead, which
# favors the same large tiles. ``budget_frac`` leaves headroom under VMEM
# for the compiler and the pipeline's own double buffers.
_GENERATION_PRIORS = {
    "v4": {"tile_cap": 1024, "budget_frac": 0.5, "measured": False},
    "v5e": {"tile_cap": 1024, "budget_frac": 0.5, "measured": True},
    "v5p": {"tile_cap": 1024, "budget_frac": 0.5, "measured": False},
    "v6e": {"tile_cap": 1024, "budget_frac": 0.5, "measured": False},
    "cpu": {"tile_cap": 1024, "budget_frac": 0.5, "measured": False},
}
_DEFAULT_PRIOR = _GENERATION_PRIORS["v5e"]

# 128 MiB: every shipping generation in device._GENERATION_TABLE. Used only
# if the probe is unavailable (e.g. building block sizes before backends
# initialize is not a supported path — callers run under jit anyway).
_FALLBACK_VMEM = 128 * 2**20
DEFAULT_VMEM_BUDGET = _FALLBACK_VMEM // 2  # back-compat export


def generation_key(kind: str) -> str:
    """Map a probed ``device_kind`` string to a prior-table key."""
    k = kind.lower()
    if "v6" in k:
        return "v6e"
    if "v5p" in k:
        return "v5p"
    if "v5" in k:  # "TPU v5 lite", "v5e", plain "v5"
        return "v5e"
    if "v4" in k:
        return "v4"
    return "cpu"


@functools.lru_cache(maxsize=1)
def _probed() -> tuple:
    """(generation_key, vmem_bytes) of the attached device, probed once."""
    try:
        from tpu_flash.utils.device import device_info

        info = device_info()
        return generation_key(info.kind), info.vmem_bytes
    except Exception:  # no backend yet / probe failure: conservative default
        return "v5e", _FALLBACK_VMEM


@functools.lru_cache(maxsize=None)
def default_block_sizes(
    q_len: int,
    kv_len: int,
    head_dim: int,
    dtype_str: str = "bfloat16",
    vmem_budget: Optional[int] = None,
    generation: Optional[str] = None,
) -> BlockSizes:
    """Pick forward/backward tile shapes for the given problem shape.

    Strategy: start from the probed generation's empirically-capped tile
    (large Q tiles = better MXU occupancy + fewer K/V revisits), then shrink
    until the VMEM feasibility formula passes — formula as constraint,
    measurement as prior, per the helpers.hpp lesson. ``generation`` /
    ``vmem_budget`` override the probe (tests, offline tuning).
    """
    dtype = jnp.dtype(dtype_str)
    if generation is None or vmem_budget is None:
        probed_gen, probed_vmem = _probed()
        if generation is None:
            generation = probed_gen
        prior = _GENERATION_PRIORS.get(generation, _DEFAULT_PRIOR)
        if vmem_budget is None:
            vmem_budget = int(probed_vmem * prior["budget_frac"])
    prior = _GENERATION_PRIORS.get(generation, _DEFAULT_PRIOR)
    cap = prior["tile_cap"]

    def pow2_round_up(x: int, lo: int) -> int:
        p = lo
        while p < x:
            p *= 2
        return p

    # Inner block_kv == block_kv_major: two-level tiling measured slower on
    # v5e (BENCHLOG). All tiles are powers of two so forward and backward
    # tilings divide the padded sequence lengths.
    block_q = min(cap, pow2_round_up(q_len, 8))
    block_kv_major = min(cap, pow2_round_up(kv_len, NUM_LANES))
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

    # Backward tiles match the forward's (cap-limited): with the triangular
    # grid, 1024 tiles beat 256 by 1.4x at 8K (BENCHLOG 2026-08-17 backward
    # tile sweep) — small tiles were only ever a dead-cell mitigation. At
    # <= 2K the sweep (and the 2026-08-20 grad-step A/B: bt512 1.42 ms vs
    # bt1024 1.67) says 512 tiles win — less diagonal waste at few cells.
    # The backward cell is ~3x the forward's VMEM, so it gets its own
    # shrink.
    bwd_q, bwd_kv = block_q, block_kv_major
    if max(q_len, kv_len) <= 2048:
        bwd_q = min(bwd_q, 512)
        bwd_kv = min(bwd_kv, 512)
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
        # Short sequences take the single-pass kernel (no online-softmax
        # merge) when the launcher's feasibility gates pass — measured
        # +17-29% at the 2K headline (BENCHLOG 2026-08-20).
        onepass=True,
    )


# ---------------------------------------------------------------------------
# Regime-aware cache-layout policy: page size + recent-window selection.
# ---------------------------------------------------------------------------


def select_cache_policy(
    kv_dtype: str,
    max_seq_len: int,
    max_batch_size: int,
    generation: Optional[str] = None,
) -> dict:
    """Measured serving-layout policy for the paged KV cache.

    Owns the engine's auto defaults (CacheConfig fields left as None), so
    the hardware-aware selection lives here with the tile heuristics
    rather than frozen into config constants — closing the helpers.hpp
    loop (it computed budgets, then hardcoded 64; helpers.hpp:17-18).

    Measured v5e evidence (BENCHLOG.md):
    * page_size: quantized caches at ps=128 pay a 31% kernel-level
      per-page scale-DMA tax (2026-08-20) and a 23% engine-level deficit
      in the KV-bound b32 production regime (2026-08-21 A/B: ps512+ring0
      4211 vs default 3428 tok/s); 512-token pages are the measured
      optimum (1024 ties at 8K). bf16/fp32 caches want 1024 (64-128 KB
      page DMAs, no scales). Pages never exceed the context (rounded up
      to the 128-token lane-aligned minimum).
    * recent_window: int4/fp8 NEED the exact ring (token match
      0.094 -> 1.000 with W=128) and default to 128 (clamped to the
      context). int8 passes every random-weight gate with ring=0, but on
      the TRAINED checkpoint the ring lifts int8 greedy match 0.881 ->
      1.000 at 1K ctx (BENCHLOG 2026-08-21 r5) — and the ring is free at
      multi-K contexts while costing ~30 us/layer-dispatch below ~1K
      (where the b32 engine A/B favors ring=0). So int8 rings at
      max_seq_len >= 2048 and runs ringless below.
    * num_pages: reserve-admission capacity (batch x pages/seq) + 25%
      headroom for prefix-cache reuse + the trash page.

    Returns {"page_size", "num_pages", "max_pages_per_seq",
    "recent_window"} — every value concrete.
    """
    quantized = kv_dtype in ("int8", "int4", "int4g32", "k8v4", "fp8")

    def pow2_at_most(x: int, lo: int = 128) -> int:
        p = lo
        while p * 2 <= x:
            p *= 2
        return p

    cap = 512 if quantized else 1024
    page_size = min(cap, pow2_at_most(max(max_seq_len, 128)))
    max_pages_per_seq = -(-max_seq_len // page_size)
    reserve = max_batch_size * max_pages_per_seq
    num_pages = reserve + max(1, reserve // 4) + 1  # +25% prefix headroom
    if kv_dtype in ("int4", "int4g32", "k8v4", "fp8"):
        recent_window = min(128, pow2_at_most(max(max_seq_len, 128)))
    elif kv_dtype == "int8" and max_seq_len >= 2048:
        recent_window = 128
    else:
        recent_window = 0
    return {
        "page_size": page_size,
        "num_pages": num_pages,
        "max_pages_per_seq": max_pages_per_seq,
        "recent_window": recent_window,
    }


def resolve_cache_config(
    cache,
    *,
    max_seq_len: int,
    max_batch_size: int,
    generation: Optional[str] = None,
):
    """Fill a CacheConfig's auto (None) fields from the measured policy.

    Explicitly-set fields always win; only None fields are selected. The
    auto max_pages_per_seq/num_pages respect an explicit page_size (and
    vice versa the auto page_size never exceeds an explicit
    max_pages_per_seq's implied context).
    """
    import dataclasses

    if cache.resolved:
        return cache
    policy = select_cache_policy(
        cache.kv_dtype, max_seq_len, max_batch_size, generation
    )
    page_size = cache.page_size
    if page_size is None:
        page_size = policy["page_size"]
        if cache.kv_dtype in ("int4", "int4g32", "k8v4") and (
            page_size % 2
        ):
            page_size += 1  # int4 token-packing needs even pages
    max_pages_per_seq = cache.max_pages_per_seq
    if max_pages_per_seq is None:
        max_pages_per_seq = -(-max_seq_len // page_size)
    num_pages = cache.num_pages
    if num_pages is None:
        reserve = max_batch_size * max_pages_per_seq
        num_pages = reserve + max(1, reserve // 4) + 1
    recent_window = cache.recent_window
    if recent_window is None:
        recent_window = min(policy["recent_window"], max_seq_len)
    return dataclasses.replace(
        cache,
        page_size=page_size,
        num_pages=num_pages,
        max_pages_per_seq=max_pages_per_seq,
        recent_window=recent_window,
    )


# ---------------------------------------------------------------------------
# Opt-in empirical autotune: sweep candidate tilings on the attached chip.
# ---------------------------------------------------------------------------

_AUTOTUNE_CACHE: dict = {}


def _autotune_cache_path() -> str:
    base = os.environ.get(
        "TPU_FLASH_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "tpu_flash"),
    )
    return os.path.join(base, "autotune.json")


def _load_disk_cache() -> dict:
    try:
        with open(_autotune_cache_path()) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _save_disk_cache(cache: dict) -> None:
    path = _autotune_cache_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
    except OSError:
        pass  # read-only FS: keep the process-level cache only


def candidate_block_sizes(
    q_len: int, kv_len: int, head_dim: int, dtype_str: str = "bfloat16"
) -> list:
    """VMEM-feasible (block_q, block_kv_major) candidates for the sweep."""
    gen, vmem = _probed()
    budget = int(vmem * _GENERATION_PRIORS.get(gen, _DEFAULT_PRIOR)["budget_frac"])
    dtype = jnp.dtype(dtype_str)
    out = []
    for bq in (256, 512, 1024):
        for bkv in (256, 512, 1024):
            if bq > q_len or bkv > kv_len:
                continue
            if fwd_vmem_bytes(bq, bkv, bkv, head_dim, dtype) <= budget:
                out.append((bq, bkv))
    return out or [(min(256, q_len), min(256, kv_len))]


def autotune(
    q_len: int,
    kv_len: int,
    head_dim: int,
    *,
    num_q_heads: int = 8,
    num_kv_heads: int = 8,
    dtype_str: str = "bfloat16",
    causal: bool = True,
    candidates: Optional[Iterable] = None,
    use_disk_cache: bool = True,
) -> BlockSizes:
    """Sweep candidate tile shapes ON THE ATTACHED CHIP and return the
    fastest (cached per device-kind + shape, in-process and on disk).

    This is the empirical tuning mode the reference computed formulas for
    but never ran (helpers.hpp:17-18, 28-29 hardcode the answer). Timing is
    paired in-process (chained-loop differential, bench/suite.py) so relay
    dispatch noise cancels.
    """
    import jax

    gen, _ = _probed()
    key = f"{gen}|{q_len}x{kv_len}x{head_dim}|{dtype_str}|causal={causal}"
    if key in _AUTOTUNE_CACHE:
        return _AUTOTUNE_CACHE[key]
    disk = _load_disk_cache() if use_disk_cache else {}
    if key in disk:
        d = disk[key]
        bs = dataclass_from_pair(d["block_q"], d["block_kv_major"])
        _AUTOTUNE_CACHE[key] = bs
        return bs

    from tpu_flash.bench.suite import bench_flash_prefill

    base = default_block_sizes(q_len, kv_len, head_dim, dtype_str)
    cands = list(
        candidates
        or candidate_block_sizes(q_len, kv_len, head_dim, dtype_str)
    )
    best, best_t = base, None
    for bq, bkv in cands:
        bs = dataclass_from_pair(bq, bkv, template=base)
        try:
            res = bench_flash_prefill(
                batch=1,
                num_q_heads=num_q_heads,
                num_kv_heads=num_kv_heads,
                seq=q_len,
                head_dim=head_dim,
                dtype=jnp.dtype(dtype_str),
                causal=causal,
                block_sizes=bs,
                iters=8,
            )
        except Exception:
            continue  # infeasible tiling (compile OOM): skip
        if best_t is None or res.seconds < best_t:
            best, best_t = bs, res.seconds
    _AUTOTUNE_CACHE[key] = best
    if use_disk_cache:
        disk[key] = {
            "block_q": best.block_q,
            "block_kv_major": best.block_kv_major,
        }
        _save_disk_cache(disk)
    del jax
    return best


def dataclass_from_pair(
    block_q: int, block_kv_major: int, template: Optional[BlockSizes] = None
) -> BlockSizes:
    """BlockSizes with fwd tiles (block_q, block_kv_major) and backward
    tiles carried from ``template`` (or matched to the forward's)."""
    t = template
    return BlockSizes(
        block_q=block_q,
        block_kv_major=block_kv_major,
        block_kv=block_kv_major,
        block_q_dkv=t.block_q_dkv if t else block_q,
        block_kv_dkv=t.block_kv_dkv if t else block_kv_major,
        block_q_dq=t.block_q_dq if t else block_q,
        block_kv_dq=t.block_kv_dq if t else block_kv_major,
        triangular=True,
        onepass=t.onepass if t else True,
    )
