from tpu_flash.ops.flash.api import flash_attention
from tpu_flash.core.reference import SegmentIds
from tpu_flash.ops.flash.quantized import (
    QuantizedAttentionInputs,
    dequantize_attention_inputs,
    flash_attention_quantized,
    quantize_attention_inputs,
)
from tpu_flash.ops.flash.paged_prefill import paged_prefill_attention
from tpu_flash.ops.flash.ragged import flash_attention_ragged

__all__ = [
    "paged_prefill_attention",
    "QuantizedAttentionInputs",
    "dequantize_attention_inputs",
    "flash_attention",
    "flash_attention_quantized",
    "flash_attention_ragged",
    "quantize_attention_inputs",
]
