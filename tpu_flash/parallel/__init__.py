from tpu_flash.parallel.mesh import build_mesh
from tpu_flash.parallel.multihost import initialize_multihost
from tpu_flash.parallel.ring import ring_attention
from tpu_flash.parallel.sharded import (
    sharded_flash_attention,
    sharded_paged_attention,
)
from tpu_flash.parallel.ulysses import ulysses_attention

__all__ = [
    "build_mesh",
    "initialize_multihost",
    "ring_attention",
    "sharded_flash_attention",
    "sharded_paged_attention",
    "ulysses_attention",
]
