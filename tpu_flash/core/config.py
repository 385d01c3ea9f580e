"""Dataclass configuration for kernels, models, engine, and mesh.

TPU-native replacement for the reference's three config mechanisms
(compile-time template params ``<D_HEAD, Q_TILE_ROWS, KV_TILE_ROWS>`` at
FlashAttention.cuh:59, runtime kernel args at FlashAttention.cuh:60-62, and
the hardware-derived tile heuristics of helpers.hpp:8-30). Here block sizes
are plain static dataclasses threaded into ``pallas_call`` as Python-level
constants — the JIT analogue of template parameters — and the hardware
heuristics live in :mod:`tpu_flash.utils.tuning`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


def _check_pos(name: str, v: int) -> None:
    if v <= 0:
        raise ValueError(f"{name} must be positive, got {v}")


@dataclasses.dataclass(frozen=True)
class BlockSizes:
    """Tile shapes for the flash-attention kernels.

    The TPU analogue of the reference's ``Q_TILE_ROWS``/``KV_TILE_ROWS``
    template parameters (FlashAttention.cuh:59) and the ``calculateSizeBlockQ``
    / ``calculateSizeBlockKV`` host heuristics (helpers.hpp:8-30). Two-level
    KV tiling: ``block_kv_major`` controls HBM→VMEM DMA granularity (the
    pipelining the reference built by hand with loader warps), ``block_kv``
    controls the per-MXU-matmul scores tile.
    """

    block_q: int = 128
    block_kv_major: int = 128
    block_kv: int = 128
    # Backward-pass tiles (dKV kernel iterates Q inside KV; dQ the reverse).
    block_q_dkv: int = 128
    block_kv_dkv: int = 128
    block_q_dq: int = 128
    block_kv_dq: int = 128
    # Causal forward: enumerate only active (q, kv) cells in a 1-D
    # scalar-prefetch grid (no predicated dead cells) instead of the
    # rectangular grid. See ops/flash/forward.py::_flash_fwd_tri_kernel.
    triangular: bool = False
    # Triangular forward only: split each DIAGONAL cell into row-sliced
    # sub-tiles of this KV width (column chunk [lo, lo+diag_sub) pairs with
    # q rows [lo:]); strictly interior cells then skip the causal mask
    # entirely. None = launcher default: diag_sub == block (interior
    # mask-skip, one full-width masked diagonal chunk — the measured
    # winner; real row-slicing loses to its granularity tax, BENCHLOG
    # 2026-08-20). 0 = force the mask-everywhere path.
    diag_sub: Optional[int] = None
    # Short-sequence single-pass forward: when a q-block's FULL (causal)
    # KV extent fits VMEM, skip the online-softmax merge entirely — one
    # masked softmax pass per q-block, no (m, l) scratch, no accumulator
    # rescale, one grid cell per q-block. Measured +18-32% at 2K and
    # +27% at 4K on v5e (BENCHLOG 2026-08-20); the backward pair has a
    # matching single-pass path (+31% on the 2K grad step). The launcher applies
    # feasibility gates (plain self-attention, scores tile <= VMEM
    # budget); out-of-scope calls fall through to the triangular path.
    onepass: bool = False
    # Single-pass causal only: row-slice each q-block's trailing DIAGONAL
    # block into sub-extents of this many q rows (the onepass analogue of
    # ``diag_sub``): slice s computes only its (s+1)*onepass_diag diagonal
    # columns and merges once with the mask-free full-row prefix state,
    # cutting the diagonal's masked FLOPs ~1/2 → ~1/(2r). None = launcher
    # default (measured per-geometry policy); 0 = force off.
    onepass_diag: Optional[int] = None
    # Triangular causal forward only: pair ADJACENT q-blocks (2i, 2i+1)
    # into one grid cell stream sharing a single K/V sweep — each K/V
    # major block is fetched once per PAIR instead of once per q-block,
    # cutting causal K/V HBM re-reads ~45% at 8 q-blocks (20 vs 36 cell
    # fetches). Compute is unchanged: each cell runs the lo/hi halves as
    # separate block_q-row dots against the shared K tile (interior
    # halves mask-free, diagonal halves one full-width masked chunk —
    # the diag_sub == block policy per half). Launcher-gated to plain
    # causal self-attention with an even q-block count; out-of-scope
    # calls keep the per-q-block triangular grid.
    #
    # MEASURED LOSER on v5e (2026-08-21, tools/hw_ab/tri_pair_ab.py):
    # 8K causal 112-114 TF/s vs the plain tri grid's 128-129 (bq1024;
    # bq512 pairs 63) — the K/V re-read traffic it halves was already
    # hidden behind compute by the grid pipeline, so only the extra
    # per-cell branches and doubled q/acc VMEM footprint remain. Kept
    # opt-in: it is the measured proof that the 8K ceiling is per-cell
    # machinery rate, not K/V bandwidth (ROADMAP R1 resolved).
    tri_pair: bool = False

    def __post_init__(self):
        for f in dataclasses.fields(self):
            if f.type is int or f.type == "int":
                _check_pos(f.name, getattr(self, f.name))
        if self.block_kv_major % self.block_kv != 0:
            raise ValueError(
                f"block_kv ({self.block_kv}) must divide block_kv_major "
                f"({self.block_kv_major})"
            )

    @property
    def has_backward_blocks(self) -> bool:
        return True


@dataclasses.dataclass(frozen=True)
class AttentionConfig:
    """Shapes of one attention operator — the model-level contract.

    Generalises the reference's runtime kernel args
    ``batchSize/numHeads/seqLen/scale/is_causal`` (FlashAttention.cuh:60-62)
    to GQA (separate q/kv head counts) and per-dtype precision.
    """

    num_q_heads: int
    num_kv_heads: int
    head_dim: int
    causal: bool = True
    sm_scale: Optional[float] = None  # None → 1/sqrt(head_dim)

    def __post_init__(self):
        _check_pos("num_q_heads", self.num_q_heads)
        _check_pos("num_kv_heads", self.num_kv_heads)
        _check_pos("head_dim", self.head_dim)
        if self.num_q_heads % self.num_kv_heads != 0:
            raise ValueError(
                f"num_q_heads ({self.num_q_heads}) must be a multiple of "
                f"num_kv_heads ({self.num_kv_heads})"
            )

    @property
    def q_per_kv(self) -> int:
        return self.num_q_heads // self.num_kv_heads

    @property
    def scale(self) -> float:
        if self.sm_scale is not None:
            return self.sm_scale
        return float(self.head_dim) ** -0.5


@dataclasses.dataclass(frozen=True)
class CacheConfig:
    """Paged KV-cache layout: page size, capacity, and quantization.

    Layout knobs default to ``None`` = **auto**: the engine resolves them
    at init from the serving regime (kv_dtype, max_seq_len, batch) via
    :func:`tpu_flash.utils.tuning.resolve_cache_config`, so the shipped
    defaults track the repo's measurements instead of freezing one
    workload's answer (the helpers.hpp:17-18 lesson — it computed a
    budget, then hardcoded 64). Measured v5e policy (BENCHLOG.md
    2026-08-20/21): production serving wants page_size 512 (quantized —
    at ps=128 the per-page scale DMAs cost 31% at kernel level and 23%
    at engine level in the KV-bound b32 regime) or 1024 (bf16); int4/fp8
    need the 128-token exact ring, and int8 rings at >= 2K contexts
    (free there, and it lifts trained-model greedy match 0.881 -> 1.000)
    but runs ringless below (where the ring's fixed per-dispatch tax is
    measurable). Set any field explicitly to override.

    kv_dtype speed order at 8K ctx is int4 > int8 > bfloat16 > float32
    (int8-MXU decode path); bfloat16 is the quality-safe default (zero
    quantization error), int8/int4 the long-context memory levers. "fp8"
    (e4m3 payload + per-token scales) targets v6e+ where the MXU is
    fp8-native; on v5e it takes the exact f32-dequant path (the int8-MXU
    fast tier stays int8/int4-only).
    """

    page_size: Optional[int] = None  # tokens per page; lane-aligned. None=auto
    num_pages: Optional[int] = None  # None=auto (sized from batch x context)
    max_pages_per_seq: Optional[int] = None  # None=auto (ceil(max_seq/page))
    # Payload: bfloat16|int8|int4|int4g32|k8v4|fp8. "int4" = per-token
    # symmetric (fastest 4-bit tier); "int4g32" = per-32-channel-group
    # ASYMMETRIC (the 4-bit QUALITY tier — picked on trained-checkpoint
    # evidence, see ops/quant/quantize.py::quantize_group_asym);
    # "k8v4" = MIXED: K int8 + V int4 (generation quality tracks K
    # precision hardest — the byte-equivalent 4-bit-class tier).
    kv_dtype: str = "bfloat16"
    scale_dtype: str = "float32"
    # Quantized caches only: keep the last ``recent_window`` tokens of each
    # sequence ALSO in an exact bf16 ring (KIVI-style residual window);
    # burst decode attends pages for [0, L - W) and the ring for the rest,
    # cutting the dominant quantization-error feedback path of generation
    # (stress-model int4 token match 0.10 -> ~1.0 within the window,
    # 0.66-0.79 beyond it; BENCHLOG 2026-08-20). Memory cost: W tokens
    # bf16 per slot per layer (~3-6% of an int4 cache at 8K context).
    # Time cost: free at multi-K contexts, but a fixed ~30 us/layer-
    # dispatch at short (<~1K) contexts (BENCHLOG 2026-08-21 ring-cost
    # attribution). None = auto: 128 for int4/fp8 (quality-load-bearing),
    # 0 for int8 (passes quality gates without it). 0 disables. Ignored
    # for fp caches.
    recent_window: Optional[int] = None

    def __post_init__(self):
        if self.page_size is not None:
            _check_pos("page_size", self.page_size)
        if self.num_pages is not None:
            _check_pos("num_pages", self.num_pages)
        if self.max_pages_per_seq is not None:
            _check_pos("max_pages_per_seq", self.max_pages_per_seq)
        if self.kv_dtype not in (
            "bfloat16", "float32", "int8", "int4", "int4g32", "k8v4",
            "fp8"
        ):
            raise ValueError(f"unsupported kv_dtype {self.kv_dtype!r}")
        if self.recent_window is not None and self.recent_window < 0:
            raise ValueError(
                f"recent_window must be >= 0, got {self.recent_window}"
            )

    @property
    def quantized(self) -> bool:
        return self.kv_dtype in (
            "int8", "int4", "int4g32", "k8v4", "fp8"
        )

    @property
    def resolved(self) -> bool:
        """True when every auto (None) layout knob has a concrete value."""
        return not (
            self.page_size is None
            or self.num_pages is None
            or self.max_pages_per_seq is None
            or self.recent_window is None
        )

    @property
    def max_context(self) -> int:
        if self.page_size is None or self.max_pages_per_seq is None:
            raise ValueError(
                "CacheConfig has unresolved auto fields; resolve via "
                "tpu_flash.utils.tuning.resolve_cache_config (the engine "
                "does this at init) before reading max_context"
            )
        return self.page_size * self.max_pages_per_seq


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    """Continuous-batching decode engine configuration.

    ``health`` is the failure-detection policy (engine/health.py): NaN/Inf
    watchdog on step logits and optional per-step fetch deadline. Import is
    deferred to avoid a core→engine cycle; None means defaults.
    """

    max_batch_size: int = 8
    max_seq_len: int = 8192
    prefill_chunk: int = 512
    cache: CacheConfig = dataclasses.field(default_factory=CacheConfig)
    health: Optional[object] = None  # engine.health.HealthConfig
    prefix_cache: bool = True  # reuse full prompt-prefix pages (engine/prefix.py)
    # Prefill chunks attend their paged history IN-KERNEL
    # (ops/flash/paged_prefill.py): each history page is read once,
    # instead of gather-to-dense (3x the history bytes) + dense flash.
    # Speculative verify rides the same kernel (draft rows = a tiny
    # chunk at per-row dynamic offsets), replacing the whole-table
    # dense gather + f32 einsum.
    #
    # "auto" (default): in-kernel paged on EVERY cache dtype — measured
    # at parity-or-better with gather on v5e for int8/int4 and (after
    # the 1024-row GQA-fold cap) bf16 (BENCHLOG 2026-08-17/18), and it
    # skips the dense (dequantized) history intermediate; speculative
    # verify rides it too (the gather alternative reads the WHOLE table
    # per layer). True forces the paged kernel everywhere it applies;
    # False forces gather everywhere. Prefill falls back to gather when
    # the chunk stage is not page-aligned regardless.
    paged_prefill: object = "auto"  # "auto" | True | False
    # Page-pool policy. "reserve" (default) preallocates a request's FULL
    # context (prompt + generation budget) at admission, so decode can
    # never run out of pages mid-flight. "optimistic" admits with prompt
    # pages only and tops decode capacity up step by step (vLLM-style):
    # the same pool serves more concurrent sequences (most stop early),
    # at the cost of preempting the newest sequence when the pool
    # overcommits.
    admission: str = "reserve"  # "reserve" | "optimistic"
    # What preemption does to the victim: "recompute" drops its pages and
    # re-prefills prompt+generated on re-admission (no extra memory,
    # costs prefill FLOPs); "swap" round-trips its KV pages through host
    # memory (no recompute, costs D2H/H2D transfers).
    preemption: str = "recompute"  # "recompute" | "swap"
    # Mixed prefill+decode steps as ONE dispatch: decode slots ride the
    # ragged prefill program as length-1 rows (same KV append + attention
    # semantics), halving dispatches when both phases are active — the
    # big lever when dispatch latency dominates (remote/relay-attached
    # devices). The decode rows pad to the prefill chunk bucket, so each
    # costs ~a chunk row of extra FLOPs: "auto" fuses only while decode
    # rows <= prefill rows; True always; False never.
    fused_mixed_step: object = "auto"  # "auto" | True | False
    # Decode burst cap: up to this many single-token steps fuse into one
    # lax.scan dispatch (one host round-trip per burst). Larger bursts
    # amortize dispatch latency — the dominant cost on remote/relay
    # attachments (41x on the axon relay, BENCHLOG 2026-08-16) — but
    # delay admission of waiting requests by up to burst steps.
    max_decode_burst: int = 8

    def __post_init__(self):
        _check_pos("max_batch_size", self.max_batch_size)
        _check_pos("max_seq_len", self.max_seq_len)
        _check_pos("prefill_chunk", self.prefill_chunk)
        _check_pos("max_decode_burst", self.max_decode_burst)
        if self.paged_prefill not in ("auto", True, False):
            raise ValueError(
                f"paged_prefill must be 'auto', True or False, got "
                f"{self.paged_prefill!r}"
            )
        if self.admission not in ("reserve", "optimistic"):
            raise ValueError(
                f"admission must be 'reserve' or 'optimistic', got "
                f"{self.admission!r}"
            )
        if self.preemption not in ("recompute", "swap"):
            raise ValueError(
                f"preemption must be 'recompute' or 'swap', got "
                f"{self.preemption!r}"
            )
        if self.fused_mixed_step not in ("auto", True, False):
            raise ValueError(
                f"fused_mixed_step must be 'auto', True or False, got "
                f"{self.fused_mixed_step!r}"
            )


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Named device-mesh layout. Axis sizes of 1 are dropped at build time.

    ``data``  — batch / request parallelism (DP)
    ``model`` — attention-head tensor parallelism (TP, GQA-aware)
    ``seq``   — sequence/context parallelism (ring attention)
    """

    data: int = 1
    model: int = 1
    seq: int = 1

    def __post_init__(self):
        _check_pos("data", self.data)
        _check_pos("model", self.model)
        _check_pos("seq", self.seq)

    @property
    def num_devices(self) -> int:
        return self.data * self.model * self.seq
