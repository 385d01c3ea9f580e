from tpu_flash.ops.quant.quantize import (
    QuantizedTensor,
    dequantize,
    quantize,
    quantize_pages,
    quantize_pallas,
)

__all__ = [
    "QuantizedTensor",
    "quantize",
    "dequantize",
    "quantize_pages",
    "quantize_pallas",
]
