"""Int8 post-training quantization for serving (the TensorRT-int8 slot)."""

from streamyolo_tpu.quant.ptq import (
    calibrate_activations,
    quantize_for_serving,
    quantize_variables,
)

__all__ = [
    "calibrate_activations",
    "quantize_for_serving",
    "quantize_variables",
]
