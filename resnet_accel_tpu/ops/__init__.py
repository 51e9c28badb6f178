"""The TPU compute path: Pallas MXU kernels and XLA ops."""

from resnet_accel_tpu.ops.matmul_int8 import matmul_int8, matmul_int8_xla
from resnet_accel_tpu.ops.conv import conv2d_int8, im2col_nchw
from resnet_accel_tpu.ops.flash_attention import flash_attention
from resnet_accel_tpu.ops.expand_fused import expand_add_int8
from resnet_accel_tpu.ops.conv_bm import (conv3x3_bm, block3x3_bm,
                                          rowvec_of_nchw,
                                          nchw_of_rowvec,
                                          pack_weights_bm)
from resnet_accel_tpu.ops.epilogue import exact_pow2_inv, pow2_scale
from resnet_accel_tpu.ops.pooling import maxpool2d_int8, avgpool_global_int8
from resnet_accel_tpu.ops.epilogue import (
    requantize,
    requantize_q16,
    requant_factors,
    add_residual,
    exact_inv_out_scale,
    relu_int8,
    relu6_int8,
    quantize_input,
    dequantize_output,
)

__all__ = [
    "matmul_int8",
    "flash_attention",
    "matmul_int8_xla",
    "conv2d_int8",
    "im2col_nchw",
    "maxpool2d_int8",
    "avgpool_global_int8",
    "requantize",
    "requantize_q16",
    "requant_factors",
    "add_residual",
    "exact_inv_out_scale",
    "expand_add_int8",
    "relu_int8",
    "relu6_int8",
    "quantize_input",
    "dequantize_output",
    "conv3x3_bm",
    "block3x3_bm",
    "rowvec_of_nchw",
    "nchw_of_rowvec",
    "pack_weights_bm",
    "exact_pow2_inv",
    "pow2_scale",
]
