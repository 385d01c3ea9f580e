from tpu_flash.ops.flash.api import flash_attention
from tpu_flash.ops.flash.quantized import (
    QuantizedAttentionInputs,
    dequantize_attention_inputs,
    flash_attention_quantized,
    quantize_attention_inputs,
)

__all__ = [
    "QuantizedAttentionInputs",
    "dequantize_attention_inputs",
    "flash_attention",
    "flash_attention_quantized",
    "quantize_attention_inputs",
]
