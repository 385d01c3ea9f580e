from tpu_flash.utils.device import device_info
from tpu_flash.utils.tuning import default_block_sizes

__all__ = ["device_info", "default_block_sizes"]
