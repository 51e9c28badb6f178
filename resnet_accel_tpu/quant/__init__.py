"""INT8 post-training quantization and activation calibration."""

from resnet_accel_tpu.quant.quantize import (
    quantize_symmetric_per_tensor,
    quantize_symmetric_per_channel,
    quantize_asymmetric_per_channel,
    dequantize,
    compute_quantization_error,
    quantize_params_per_channel,
    bias_to_int32,
)
from resnet_accel_tpu.quant.calibrate import (
    ActivationCalibrator,
    TapRange,
    calibrate,
)

__all__ = [
    "quantize_symmetric_per_tensor",
    "quantize_symmetric_per_channel",
    "quantize_asymmetric_per_channel",
    "dequantize",
    "compute_quantization_error",
    "quantize_params_per_channel",
    "bias_to_int32",
    "ActivationCalibrator",
    "TapRange",
    "calibrate",
]
