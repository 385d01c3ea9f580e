from tpu_flash.ops.flash import flash_attention

__all__ = ["flash_attention"]
