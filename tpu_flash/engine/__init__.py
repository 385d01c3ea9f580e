from tpu_flash.engine.allocator import PageAllocator
from tpu_flash.engine.cache import PagedKVCache
from tpu_flash.engine.scheduler import Request, Scheduler

__all__ = ["PageAllocator", "PagedKVCache", "Request", "Scheduler"]
