"""Golden INT8 GEMM models (dense + BSR sparse), pure numpy.

Semantics-parity with the reference:
- dense:  golden::matmul_int8       (golden_models.cpp:111)
- sparse: golden::bsr_matmul_int8   (golden_models.cpp:187) — B is [K, N]
- sparse, weight-transposed orientation used by the exported artifacts:
  gemm_bsr_int8_golden (sw/golden/golden_fc1_test.py:49) — W is [N, K] in
  BSR, computing C = A @ W^T.
- dequantizing variant: gemm_bsr_int8 (sw/golden/gemm_bsr_int8.py:16).

All integer accumulation is int8 x int8 -> int32.  int32 addition is
associative, so vectorized numpy reductions produce the same bits as the
reference's scalar k-inner loops as long as no int32 overflow occurs; the
worst case (K=9216, |a*b| <= 16384) peaks at ~1.5e8, far inside int32.
We still accumulate in int64 and wrap to int32 to reproduce C's wraparound
behavior in degenerate stress cases (parity with sw/utils/golden_c_tile.py
wrap-to-int32 semantics).
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def _wrap_i32(x: np.ndarray) -> np.ndarray:
    """Wrap int64 values to int32 two's-complement (C overflow semantics)."""
    return x.astype(np.int64).astype(np.uint32).astype(np.int32)


def matmul_int8(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Dense C[M,N] = A[M,K] @ B[K,N], int8 inputs, int32 accumulation.

    Parity: golden::matmul_int8 (golden_models.cpp:111-132).
    """
    A = np.asarray(A, dtype=np.int8)
    B = np.asarray(B, dtype=np.int8)
    if A.ndim != 2 or B.ndim != 2 or A.shape[1] != B.shape[0]:
        raise ValueError(f"shape mismatch: A{A.shape} B{B.shape}")
    acc = A.astype(np.int64) @ B.astype(np.int64)
    return _wrap_i32(acc)


def bsr_matmul_int8(
    A: np.ndarray,
    data: np.ndarray,
    row_ptr: np.ndarray,
    col_idx: np.ndarray,
    M: int,
    K: int,
    N: int,
    block_h: int,
    block_w: int,
) -> np.ndarray:
    """Sparse C[M,N] = A[M,K] @ B_bsr[K,N] with int32 accumulation.

    B is stored as BSR over [K, N]: block-row ``br`` covers K rows
    [br*block_h, br*block_h+block_h), block-column ``bc`` covers N columns
    [bc*block_w, ...).  Edge blocks extending past K or N are masked, and
    multiple blocks accumulate into the same output columns across
    block-rows.

    Parity: golden::bsr_matmul_int8 (golden_models.cpp:187-255) including
    the k>=K / n>=N skip behavior for partial edge blocks.
    """
    A = np.asarray(A, dtype=np.int8)
    data = np.asarray(data, dtype=np.int8).reshape(-1, block_h, block_w)
    row_ptr = np.asarray(row_ptr, dtype=np.int64)
    col_idx = np.asarray(col_idx, dtype=np.int64)

    C = np.zeros((M, N), dtype=np.int64)
    num_block_rows = len(row_ptr) - 1
    A64 = A.astype(np.int64)

    for br in range(num_block_rows):
        k0 = br * block_h
        kh = min(block_h, K - k0)
        if kh <= 0:
            continue
        a_slice = A64[:, k0:k0 + kh]                      # [M, kh]
        for idx in range(int(row_ptr[br]), int(row_ptr[br + 1])):
            bc = int(col_idx[idx])
            n0 = bc * block_w
            nw = min(block_w, N - n0)
            if nw <= 0:
                continue
            blk = data[idx][:kh, :nw].astype(np.int64)    # [kh, nw]
            C[:, n0:n0 + nw] += a_slice @ blk
    return _wrap_i32(C)


def bsr_matmul_int8_wt(
    A: np.ndarray,
    data: np.ndarray,
    row_ptr: np.ndarray,
    col_idx: np.ndarray,
    block_h: int,
    block_w: int,
    N: int | None = None,
) -> np.ndarray:
    """Sparse C[M,N] = A[M,K] @ W^T where W[N,K] is stored in BSR.

    This is the orientation of the exported artifacts
    (data/bsr_export_14x14/*): the weight matrix is [out_features,
    in_features]; block-rows index *output* features, block-columns index
    *input* features.

    Parity: gemm_bsr_int8_golden (sw/golden/golden_fc1_test.py:49-108),
    which the reference's Verilator e2e test checks against.

    Args:
        A: activations [M, K] int8 (K may be the padded input dim).
        N: output features; defaults to num_block_rows * block_h (padded).
    """
    A = np.asarray(A, dtype=np.int8)
    data = np.asarray(data, dtype=np.int8).reshape(-1, block_h, block_w)
    row_ptr = np.asarray(row_ptr, dtype=np.int64)
    col_idx = np.asarray(col_idx, dtype=np.int64)

    M, K = A.shape
    num_block_rows = len(row_ptr) - 1
    if N is None:
        N = num_block_rows * block_h
    C = np.zeros((M, N), dtype=np.int64)
    A64 = A.astype(np.int64)

    for br in range(num_block_rows):
        n0 = br * block_h
        nh = min(block_h, N - n0)
        if nh <= 0:
            continue
        for idx in range(int(row_ptr[br]), int(row_ptr[br + 1])):
            bc = int(col_idx[idx])
            k0 = bc * block_w
            kw = min(block_w, K - k0)
            if kw <= 0:
                continue
            a_slice = A64[:, k0:k0 + kw]                    # [M, kw]
            blk = data[idx][:nh, :kw].astype(np.int64)      # [nh, kw]
            C[:, n0:n0 + nh] += a_slice @ blk.T
    return _wrap_i32(C)


def gemm_bsr_dequant(
    A_int8: np.ndarray,
    bsr: Mapping,
    scale_a: float,
    scales_b: np.ndarray,
) -> np.ndarray:
    """Dequantizing BSR GEMM: C_fp32 = (A_int8 @ B_bsr_int8) * scale_a * scales_b.

    B is BSR over [K, N] with FP32 blocks that are quantized per *global
    row* (K-dim row) on the fly, exactly like the teaching golden
    (sw/golden/gemm_bsr_int8.py:16-104): each block row ``local_row`` maps
    to global row ``br*block_h + local_row`` whose scale is
    ``scales_b[global_row]`` (falling back to ``scales_b[0]`` out of
    range), blocks multiply as A_slice @ block^T... the reference actually
    computes A[:, k-slice] @ block_int8.T and scales per row; we reproduce
    the equivalent per-row dequantized accumulation.
    """
    blocks = np.asarray(bsr["data"], dtype=np.float32)
    col_idx = np.asarray(bsr["indices"], dtype=np.int64)
    row_ptr = np.asarray(bsr["indptr"], dtype=np.int64)
    K, N = bsr["shape"]
    block_h, block_w = bsr["blocksize"]
    scales_b = np.asarray(scales_b, dtype=np.float32).reshape(-1)

    M = A_int8.shape[0]
    C = np.zeros((M, N), dtype=np.float32)
    A64 = np.asarray(A_int8, dtype=np.int64)

    for br in range(len(row_ptr) - 1):
        k0 = br * block_h
        kh = min(block_h, K - k0)
        if kh <= 0:
            continue
        # Per-global-row scales for this block row.
        row_scales = np.empty(kh, dtype=np.float32)
        for i in range(kh):
            g = k0 + i
            row_scales[i] = scales_b[g] if g < len(scales_b) else scales_b[0]
        for idx in range(int(row_ptr[br]), int(row_ptr[br + 1])):
            bc = int(col_idx[idx])
            n0 = bc * block_w
            nw = min(block_w, N - n0)
            if nw <= 0:
                continue
            blk_f = blocks[idx][:kh, :nw]
            # Quantize the block per global row (gemm_bsr_int8.py:73-79).
            blk_i8 = np.clip(
                np.rint(blk_f / row_scales[:, None]), -128, 127
            ).astype(np.int8)
            # int8 GEMM then per-row dequant-accumulate.
            for i in range(kh):
                part = A64[:, k0 + i, None] * blk_i8[i].astype(np.int64)[None, :]
                C[:, n0:n0 + nw] += (
                    part.astype(np.float32)
                    * np.float32(scale_a)
                    * row_scales[i]
                )
    return C
