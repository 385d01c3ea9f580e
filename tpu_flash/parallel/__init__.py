from tpu_flash.parallel.mesh import build_mesh
from tpu_flash.parallel.ring import ring_attention
from tpu_flash.parallel.sharded import (
    sharded_flash_attention,
    sharded_paged_attention,
)

__all__ = [
    "build_mesh",
    "ring_attention",
    "sharded_flash_attention",
    "sharded_paged_attention",
]
