from tpu_flash.ops.decode.paged import paged_attention

__all__ = ["paged_attention"]
