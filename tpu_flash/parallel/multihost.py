"""Multi-host initialization (DCN) for multi-slice / multi-process runs.

The reference is strictly single-GPU — no NCCL/MPI anywhere in its tree
(SURVEY.md §2 "Comm backend: Absent"). On TPU pods the host boundary is
DCN: each host process must call ``jax.distributed.initialize`` before any
device op so XLA can stitch the global device set. This wraps that with
idempotence and environment autodetection (TPU pods autoconfigure from the
metadata server; explicit coordinator args cover CPU/GPU fleets and tests).

Mesh axis placement for multi-host (mesh.py AXIS_ORDER): keep ``data``
outermost so its all-reduces are the only traffic crossing DCN; ``seq`` and
``model`` axes should stay within a slice (ICI) — build_mesh's use of
``create_device_mesh`` preserves that as long as axis sizes divide the
slice.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax

logger = logging.getLogger(__name__)

_initialized = False


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed once per process.

    No-ops (returns False) when running single-process with no coordinator
    configured — safe to call unconditionally at engine startup. On TPU
    pods all three args autodetect; pass them explicitly elsewhere.
    """
    global _initialized
    if _initialized:
        return True
    # Detect prior jax.distributed init WITHOUT touching backend-querying
    # APIs: jax.process_count() would itself initialize the XLA backend
    # with a single-process view and poison the subsequent
    # jax.distributed.initialize() on a real pod.
    try:
        from jax._src import distributed as _jd

        if getattr(_jd.global_state, "client", None) is not None:
            _initialized = True
            return True
    except ImportError:  # pragma: no cover - private-API drift
        pass
    if coordinator_address is None and num_processes is None:
        import os

        auto = (
            os.environ.get("COORDINATOR_ADDRESS")
            or os.environ.get("JAX_COORDINATOR_ADDRESS")
        )
        if auto is None and not _on_tpu_pod():
            logger.info("single-process run; skipping jax.distributed init")
            return False
        coordinator_address = auto
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    logger.info(
        "jax.distributed initialized: process %d/%d, %d global devices",
        jax.process_index(), jax.process_count(), jax.device_count(),
    )
    return True


def _on_tpu_pod() -> bool:
    """Heuristic: TPU runtime env vars present → metadata autoconfig works."""
    import os

    return any(
        k in os.environ
        for k in ("TPU_WORKER_HOSTNAMES", "TPU_SKIP_MDS_QUERY", "MEGASCALE_COORDINATOR_ADDRESS")
    ) and os.environ.get("JAX_PLATFORMS", "").lower() not in ("cpu",)
