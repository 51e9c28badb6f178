"""Bit-exact pure-numpy golden models — the numerical specification.

Semantics-parity with the reference's golden layer
(hw/sim/cpp/src/golden_models.cpp, sw/golden/gemm_bsr_int8.py,
sw/golden/golden_fc1_test.py).  Every TPU kernel in ``resnet_accel_tpu.ops``
is verified bit-for-bit against these functions.
"""

from resnet_accel_tpu.golden.gemm import (
    matmul_int8,
    bsr_matmul_int8,
    bsr_matmul_int8_wt,
    gemm_bsr_dequant,
)
from resnet_accel_tpu.golden.ops import (
    relu_int8,
    relu_int32,
    relu6_int8,
    requantize_int32_to_int8,
    requantize_q16,
    scale_to_q16,
    q16_to_scale,
    add_residual_int8,
    maxpool2d_int8,
    avgpool_global_int8,
)
from resnet_accel_tpu.golden.conv import (
    im2col_int8,
    conv2d_int8_simple,
    conv2d_int8_im2col,
)

__all__ = [
    "matmul_int8",
    "bsr_matmul_int8",
    "bsr_matmul_int8_wt",
    "gemm_bsr_dequant",
    "relu_int8",
    "relu_int32",
    "relu6_int8",
    "requantize_int32_to_int8",
    "requantize_q16",
    "scale_to_q16",
    "q16_to_scale",
    "add_residual_int8",
    "maxpool2d_int8",
    "avgpool_global_int8",
    "im2col_int8",
    "conv2d_int8_simple",
    "conv2d_int8_im2col",
]
