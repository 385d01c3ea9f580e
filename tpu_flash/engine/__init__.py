from tpu_flash.engine.allocator import PageAllocator
from tpu_flash.engine.cache import PagedKVCache
from tpu_flash.engine.dp import DataParallelEngine
from tpu_flash.engine.health import (
    EngineFailure,
    HealthConfig,
    HealthMonitor,
    NumericsError,
    StepTimeoutError,
)
from tpu_flash.engine.scheduler import Request, Scheduler

__all__ = [
    "DataParallelEngine",
    "EngineFailure",
    "HealthConfig",
    "HealthMonitor",
    "NumericsError",
    "PageAllocator",
    "PagedKVCache",
    "Request",
    "Scheduler",
    "StepTimeoutError",
]
