from hnd_ghnd_tpu.codec.quantizer import (
    QuantizedTensor, quantize_tensor, dequantize_tensor,
    Quantizer, Dequantizer, Compose, get_bottleneck_transformer,
)

__all__ = [
    "QuantizedTensor", "quantize_tensor", "dequantize_tensor",
    "Quantizer", "Dequantizer", "Compose", "get_bottleneck_transformer",
]
