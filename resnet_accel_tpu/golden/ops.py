"""Golden elementwise / pooling / requantization models, pure numpy.

Semantics-parity with golden_models.cpp:
- relu_int8/int32          (:278, :298)
- relu6_int8               (:323)
- requantize_int32_to_int8 (:378-410) — float32 scaling, round-half-to-even
  (banker's rounding via nearbyint under FE_TONEAREST), saturate [-128,127].
- add_residual_int8        (:465-490) — dequant-add-requant across scales.
- maxpool2d_int8           (:534-571) — CHW, window max, scale-preserving.
- avgpool_global_int8      (:601-628) — int32 sum, (sum + HW/2) / HW with
  C truncating integer division.

All float arithmetic is float32, matching the C++ reference ops, so numpy
results are bit-identical on IEEE-754 hardware.
"""

from __future__ import annotations

import numpy as np


def relu_int8(x: np.ndarray) -> np.ndarray:
    """max(0, x) on int8."""
    x = np.asarray(x, dtype=np.int8)
    return np.maximum(x, np.int8(0))


def relu_int32(x: np.ndarray) -> np.ndarray:
    """max(0, x) on int32 accumulators (pre-requantization ReLU)."""
    x = np.asarray(x, dtype=np.int32)
    return np.maximum(x, np.int32(0))


def relu6_int8(x: np.ndarray, scale: float) -> np.ndarray:
    """Clamped ReLU: [0, int8(6.0/scale)].

    The upper bound is the C cast of float32 6.0/scale to int8
    (truncation toward zero, golden_models.cpp:326).
    """
    x = np.asarray(x, dtype=np.int8)
    max_val = np.int8(int(np.float32(6.0) / np.float32(scale)))
    return np.clip(x, np.int8(0), max_val)


def requantize_int32_to_int8(
    x: np.ndarray, in_scale: float, out_scale: float
) -> np.ndarray:
    """Requantize int32 accumulators to int8 for the next layer.

    out = saturate(rint(float32(x) * float32(in_scale / out_scale)))
    with round-half-to-even and saturation (never wrap).
    """
    x = np.asarray(x, dtype=np.int32)
    scale_factor = np.float32(in_scale) / np.float32(out_scale)
    scaled = x.astype(np.float32) * scale_factor
    rounded = np.rint(scaled)  # round-half-to-even, like nearbyint
    return np.clip(rounded, -128, 127).astype(np.int8)


def scale_to_q16(scale: float) -> int:
    """Convert a float scale to the hardware's Q16.16 register encoding.

    Exactly the reference driver's conversion (sw/host/accel.py:377):
    ``int(scale * 65536) & 0xFFFFFFFF`` — C-style truncation toward zero,
    computed in Python float (double) precision like the reference.
    """
    return int(float(scale) * 65536.0) & 0xFFFFFFFF


def q16_to_scale(q16: int) -> float:
    """Inverse of scale_to_q16 (the value the hardware effectively applies,
    including its fraction-only truncation — see requantize_q16)."""
    return float(q16 & 0xFFFF) / 65536.0


def requantize_q16(
    x: np.ndarray, scale_q16: int, relu: bool = False
) -> np.ndarray:
    """Hardware-exact Q16.16 fixed-point requantization.

    Bit-exact model of the reference accelerator's output pipeline
    (hw/rtl/buffer/output_accumulator.sv:397-426 ``quantize_relu``):

        1. optional ReLU on the int32 accumulator,
        2. ``scaled = (acc * scale_q16[15:0]) >>> 16``  — the RTL multiplies
           by the zero-extended LOW 16 bits only (the Q16.16 *fraction*;
           integer-part bits of the register are ignored by the datapath),
           with a 64-bit product and arithmetic (floor) shift,
        3. saturate to [-128, 127].

    This is the on-silicon semantics behind CSR SCALE_Sa/Sw; the float32
    ``requantize_int32_to_int8`` is the reference's *software golden*
    semantics.  Both are provided: float for production accuracy, Q16 for
    hardware-replay verification.
    """
    x = np.asarray(x, dtype=np.int32).astype(np.int64)
    if relu:
        x = np.maximum(x, 0)
    frac = np.int64(int(scale_q16) & 0xFFFF)
    scaled = (x * frac) >> np.int64(16)  # arithmetic shift = floor
    return np.clip(scaled, -128, 127).astype(np.int8)


def requantize_per_channel(
    x: np.ndarray, in_scales: np.ndarray, out_scale: float, axis: int = -1
) -> np.ndarray:
    """Per-output-channel requantization.

    Extension of requantize_int32_to_int8 for per-channel weight scales
    (the reference quantizes weights per output channel, quantize.py:71;
    its SCALE_Sw CSR then carries one Q16.16 value per layer — per-channel
    requant is the exact software semantics the hardware approximates).
    ``in_scales`` broadcasts along ``axis`` of ``x``.
    """
    x = np.asarray(x, dtype=np.int32)
    in_scales = np.asarray(in_scales, dtype=np.float32)
    shape = [1] * x.ndim
    shape[axis] = -1
    factors = (in_scales / np.float32(out_scale)).reshape(shape)
    scaled = x.astype(np.float32) * factors
    return np.clip(np.rint(scaled), -128, 127).astype(np.int8)


def add_residual_int8(
    main: np.ndarray,
    residual: np.ndarray,
    main_scale: float,
    residual_scale: float,
    out_scale: float,
) -> np.ndarray:
    """ResNet skip-connection add across differing quantization scales.

    Dequantize both paths to float32, add, requantize to ``out_scale``
    with round-half-to-even and saturation.
    """
    m = np.asarray(main, dtype=np.int8).astype(np.float32) * np.float32(main_scale)
    r = (
        np.asarray(residual, dtype=np.int8).astype(np.float32)
        * np.float32(residual_scale)
    )
    s = m + r
    q = np.rint(s / np.float32(out_scale))
    return np.clip(q, -128, 127).astype(np.int8)


def maxpool2d_int8(
    x: np.ndarray, pool_size: int, stride: int, padding: int = 0
) -> np.ndarray:
    """2D max pooling over CHW int8 input.  Scale-preserving.

    ``padding`` extends the reference op (which is padding-free,
    golden_models.cpp:534) for ResNet-18's 3x3/2 p1 stem pool; padding
    cells hold INT8_MIN so they never win the max (torch's -inf).
    """
    x = np.asarray(x, dtype=np.int8)
    if padding > 0:
        C0, H0, W0 = x.shape
        xp = np.full((C0, H0 + 2 * padding, W0 + 2 * padding), -128,
                     dtype=np.int8)
        xp[:, padding:padding + H0, padding:padding + W0] = x
        x = xp
    C, H, W = x.shape
    H_out = (H - pool_size) // stride + 1
    W_out = (W - pool_size) // stride + 1
    out = np.full((C, H_out, W_out), -128, dtype=np.int8)
    for ph in range(pool_size):
        for pw in range(pool_size):
            window = x[:, ph:ph + stride * H_out:stride,
                       pw:pw + stride * W_out:stride]
            out = np.maximum(out, window)
    return out


def avgpool_global_int8(x: np.ndarray) -> np.ndarray:
    """Global average pool CHW -> [C] with the reference's rounding.

    avg = (sum + HW/2) / HW using C integer division (truncation toward
    zero — significant for negative sums), then saturate to int8.
    """
    x = np.asarray(x, dtype=np.int8)
    C, H, W = x.shape
    hw = H * W
    s = x.reshape(C, hw).astype(np.int64).sum(axis=1) + hw // 2
    # C-style truncating division.
    avg = np.sign(s) * (np.abs(s) // hw)
    return np.clip(avg, -128, 127).astype(np.int8)
