from tpu_flash.ops.quant.quantize import (
    QuantizedTensor,
    dequantize,
    quantize,
    quantize_pallas,
)

__all__ = ["QuantizedTensor", "quantize", "dequantize", "quantize_pallas"]
