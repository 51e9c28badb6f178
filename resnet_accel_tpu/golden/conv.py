"""Golden INT8 convolution models (direct + im2col->GEMM), pure numpy.

Semantics-parity with golden_models.cpp:
- conv2d_int8_simple (:684-750) — 6-loop direct conv, CHW in, OIHW weights,
  zero padding, int32 bias + accumulation.
- im2col_int8        (:801-842) — patch matrix [C_in*K*K, H_out*W_out],
  row order (c_in, kh, kw), zero fill for padding.
- conv2d_int8_im2col (:883-933) — weight [C_out, C_in*K*K] @ im2col.

Both conv variants produce identical int32 outputs; the im2col variant is
the shape the TPU kernels consume (conv weights flatten
[O,I,kh,kw] -> [O, I*kh*kw], exactly as export_bsr_14x14.py:556).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from resnet_accel_tpu.golden.gemm import matmul_int8


def im2col_int8(
    x: np.ndarray,
    kernel: int,
    stride: int,
    padding: int,
) -> np.ndarray:
    """Transform CHW int8 input into the [C_in*K*K, H_out*W_out] patch matrix.

    Column ``oh*W_out + ow`` holds the flattened receptive field of output
    position (oh, ow); rows are ordered (c_in, kh, kw).  Out-of-bounds
    positions contribute zeros (zero padding).
    """
    x = np.asarray(x, dtype=np.int8)
    C, H, W = x.shape
    K = kernel
    H_out = (H + 2 * padding - K) // stride + 1
    W_out = (W + 2 * padding - K) // stride + 1

    if padding > 0:
        xp = np.zeros((C, H + 2 * padding, W + 2 * padding), dtype=np.int8)
        xp[:, padding:padding + H, padding:padding + W] = x
    else:
        xp = x

    cols = np.empty((C * K * K, H_out * W_out), dtype=np.int8)
    row = 0
    for c in range(C):
        for kh in range(K):
            for kw in range(K):
                patch = xp[c, kh:kh + stride * H_out:stride,
                           kw:kw + stride * W_out:stride]
                cols[row] = patch.reshape(-1)
                row += 1
    return cols


def conv2d_int8_simple(
    x: np.ndarray,
    weight: np.ndarray,
    bias: Optional[np.ndarray],
    stride: int = 1,
    padding: int = 0,
) -> np.ndarray:
    """Direct int8 conv: CHW input, OIHW weight, int32 bias/output."""
    x = np.asarray(x, dtype=np.int8)
    weight = np.asarray(weight, dtype=np.int8)
    C_out, C_in, K, _ = weight.shape
    C, H, W = x.shape
    if C != C_in:
        raise ValueError(f"channel mismatch: input {C} vs weight {C_in}")
    H_out = (H + 2 * padding - K) // stride + 1
    W_out = (W + 2 * padding - K) // stride + 1

    cols = im2col_int8(x, K, stride, padding)              # [C_in*K*K, P]
    w2d = weight.reshape(C_out, C_in * K * K)              # [C_out, C_in*K*K]
    out = matmul_int8(w2d, cols).astype(np.int64)          # [C_out, P]
    if bias is not None:
        out = out + np.asarray(bias, dtype=np.int64)[:, None]
    return out.astype(np.uint32).astype(np.int32).reshape(C_out, H_out, W_out)


def conv2d_int8_im2col(
    x: np.ndarray,
    weight2d: np.ndarray,
    bias: Optional[np.ndarray],
    in_channels: int,
    kernel: int,
    stride: int = 1,
    padding: int = 0,
) -> np.ndarray:
    """im2col conv with pre-flattened weights [C_out, C_in*K*K]."""
    x = np.asarray(x, dtype=np.int8)
    weight2d = np.asarray(weight2d, dtype=np.int8)
    C_out = weight2d.shape[0]
    C, H, W = x.shape
    if C != in_channels or weight2d.shape[1] != in_channels * kernel * kernel:
        raise ValueError("weight2d shape does not match conv geometry")
    H_out = (H + 2 * padding - kernel) // stride + 1
    W_out = (W + 2 * padding - kernel) // stride + 1

    cols = im2col_int8(x, kernel, stride, padding)
    out = matmul_int8(weight2d, cols).astype(np.int64)
    if bias is not None:
        out = out + np.asarray(bias, dtype=np.int64)[:, None]
    return out.astype(np.uint32).astype(np.int32).reshape(C_out, H_out, W_out)
