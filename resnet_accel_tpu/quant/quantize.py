"""INT8 post-training quantization — scale formulas and error statistics.

Semantics-parity with the reference quantizers
(sw/INT8 quantization/quantize.py):
- ``quantize_symmetric_per_tensor``  (:55)  scale = max(|x|)/127, rint, clip
- ``quantize_symmetric_per_channel`` (:71)  per-channel along an axis
- ``quantize_asymmetric_per_channel`` (:101) UINT8 with zero-points
- ``compute_quantization_error``     (:138) max/mean/mse/SNR(dB)

Scales are guarded at 1e-12 against all-zero channels exactly like the
reference.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

from resnet_accel_tpu.config import SCALE_EPS


def quantize_symmetric_per_tensor(
    x: np.ndarray,
) -> Tuple[np.ndarray, float]:
    """Symmetric per-tensor INT8: max|x| -> 127."""
    x = np.asarray(x, dtype=np.float32)
    maxabs = float(np.max(np.abs(x))) if x.size else 0.0
    scale = max(maxabs / 127.0, SCALE_EPS)
    q = np.clip(np.rint(x / scale), -128, 127).astype(np.int8)
    return q, scale


def quantize_symmetric_per_channel(
    x: np.ndarray, axis: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetric per-channel INT8 along ``axis`` (output channels)."""
    x = np.asarray(x, dtype=np.float32)
    reduce_axes = tuple(i for i in range(x.ndim) if i != axis)
    maxabs = np.max(np.abs(x), axis=reduce_axes, keepdims=True)
    scales = np.maximum(maxabs / 127.0, SCALE_EPS)
    q = np.clip(np.rint(x / scales), -128, 127).astype(np.int8)
    scales_flat = np.squeeze(scales, axis=reduce_axes).astype(np.float32)
    return q, scales_flat


def quantize_asymmetric_per_channel(
    x: np.ndarray, axis: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Asymmetric per-channel UINT8 with signed zero-points."""
    x = np.asarray(x, dtype=np.float32)
    reduce_axes = tuple(i for i in range(x.ndim) if i != axis)
    x_min = np.min(x, axis=reduce_axes, keepdims=True)
    x_max = np.max(x, axis=reduce_axes, keepdims=True)
    scales = np.maximum((x_max - x_min) / 255.0, SCALE_EPS)
    zero_points = np.rint(-x_min / scales)
    q = np.clip(np.rint(x / scales + zero_points), 0, 255).astype(np.uint8)
    scales_flat = np.squeeze(scales, axis=reduce_axes).astype(np.float32)
    zp_flat = np.squeeze(zero_points, axis=reduce_axes).astype(np.int32)
    return q, scales_flat, zp_flat


def dequantize(
    q: np.ndarray, scale, zero_point=None, axis: int = 0
) -> np.ndarray:
    """float = (q - zp) * scale, broadcasting per-channel scales on ``axis``."""
    q = np.asarray(q).astype(np.float32)
    scale = np.asarray(scale, dtype=np.float32)
    if scale.ndim > 0 and scale.size > 1:
        shape = [1] * q.ndim
        shape[axis] = -1
        scale = scale.reshape(shape)
        if zero_point is not None:
            zero_point = np.asarray(zero_point, np.float32).reshape(shape)
    if zero_point is not None:
        q = q - zero_point
    return q * scale


def compute_quantization_error(
    x_fp32: np.ndarray, x_q: np.ndarray, scale, axis: int = 0
) -> Dict[str, float]:
    """max/mean/MSE error + SNR in dB of the dequantized reconstruction."""
    x_fp32 = np.asarray(x_fp32, dtype=np.float32)
    x_deq = dequantize(x_q, scale, axis=axis)
    error = np.abs(x_fp32 - x_deq)
    return {
        "max_error": float(np.max(error)),
        "mean_error": float(np.mean(error)),
        "mse": float(np.mean(error ** 2)),
        "snr_db": float(
            20 * np.log10(np.std(x_fp32) / (np.std(error) + 1e-12))),
    }


# --------------------------------------------------------------------------
# Whole-model quantization
# --------------------------------------------------------------------------

def quantize_params_per_channel(
    params: Mapping[str, np.ndarray],
    weight_suffix: str = "weight",
    bias_suffix: str = "bias",
) -> Dict[str, Dict]:
    """Quantize a flat dict of {layer.weight / layer.bias: fp32 array}.

    Weights: per-output-channel symmetric INT8 (axis 0).
    Biases: per-tensor symmetric INT8 (quantize.py:197-208 keeps biases
    per-tensor).  Returns per-param dicts with data/scales/shape/error.
    """
    out: Dict[str, Dict] = {}
    for name, arr in params.items():
        arr = np.asarray(arr, dtype=np.float32)
        if name.endswith(weight_suffix):
            q, scales = quantize_symmetric_per_channel(arr, axis=0)
            out[name] = {
                "data": q,
                "scales": scales,
                "shape": tuple(arr.shape),
                "axis": 0,
                "error": compute_quantization_error(arr, q, scales),
            }
        elif name.endswith(bias_suffix):
            q, scale = quantize_symmetric_per_tensor(arr)
            out[name] = {
                "data": q,
                "scale": scale,
                "shape": tuple(arr.shape),
                "error": compute_quantization_error(arr, q, scale),
            }
        else:
            raise ValueError(f"unrecognized param kind: {name}")
    return out


def bias_to_int32(
    bias_fp32: np.ndarray, act_scale: float, wgt_scales: np.ndarray
) -> np.ndarray:
    """Quantize bias into the int32 accumulator domain.

    acc represents value/(act_scale*wgt_scale), so the bias that adds
    correctly pre-requant is rint(bias / (act_scale * wgt_scale_c)) per
    channel.  (The reference keeps INT8 biases applied post-hoc; folding
    into the accumulator is the standard integer-inference formulation and
    is what the fused TPU epilogue consumes.)
    """
    bias_fp32 = np.asarray(bias_fp32, dtype=np.float64)
    wgt_scales = np.asarray(wgt_scales, dtype=np.float64).reshape(-1)
    q = np.rint(bias_fp32 / (float(act_scale) * wgt_scales))
    # All-zero channels have the epsilon scale guard (1e-12) which makes
    # q blow up; their outputs are zero anyway — clamp safely.
    q = np.nan_to_num(q, nan=0.0, posinf=2**31 - 1, neginf=-2**31)
    return np.clip(q, -2**31, 2**31 - 1).astype(np.int64).astype(np.int32)
