from tpu_flash.models.configs import (
    BLOOM_7B,
    GEMMA2_9B,
    LLAMA2_7B,
    LLAMA3_8B,
    LLAMA31_8B,
    MISTRAL_7B,
    QWEN2_7B,
    TINY_TEST,
    ModelConfig,
)
from tpu_flash.models.transformer import FlashTransformer

__all__ = [
    "ModelConfig",
    "BLOOM_7B",
    "GEMMA2_9B",
    "LLAMA2_7B",
    "LLAMA3_8B",
    "LLAMA31_8B",
    "MISTRAL_7B",
    "QWEN2_7B",
    "TINY_TEST",
    "FlashTransformer",
]
