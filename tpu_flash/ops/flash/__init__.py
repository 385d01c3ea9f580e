from tpu_flash.ops.flash.api import flash_attention

__all__ = ["flash_attention"]
