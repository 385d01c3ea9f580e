from tpu_flash.models.configs import (
    LLAMA2_7B,
    LLAMA3_8B,
    TINY_TEST,
    ModelConfig,
)
from tpu_flash.models.transformer import FlashTransformer

__all__ = [
    "ModelConfig",
    "LLAMA2_7B",
    "LLAMA3_8B",
    "TINY_TEST",
    "FlashTransformer",
]
