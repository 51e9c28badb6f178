"""Exact block-size regrouping — map small logical blocks onto MXU tiles.

The reference's 14x14 block size is a Zynq-7020 DSP-count artifact; the
TPU MXU wants 128-aligned tiles.  Because int8 x int8 -> int32 GEMM is
exact and zero blocks contribute exactly zero, regrouping a BSR matrix to
a larger block size (keeping any superblock that contains at least one
nonzero logical block, zero-filling the rest) produces BIT-IDENTICAL
matmul results — only the skip granularity changes.

This is the TPU analog of the reference's block_reorder_buffer.sv: a
host-side metadata transform that re-shapes the sparse schedule to fit
the compute geometry.
"""

from __future__ import annotations

import numpy as np

from resnet_accel_tpu.config import MXU_BLOCK
from resnet_accel_tpu.sparse.bsr import BSRMatrix, build_bsr_int8_direct


def regroup_bsr(
    bsr: BSRMatrix,
    new_block_h: int = MXU_BLOCK,
    new_block_w: int = MXU_BLOCK,
) -> BSRMatrix:
    """Repack a BSR matrix at a different block size (exact).

    The dense content is preserved exactly (padding is zeros), so any
    int32 matmul over the result is bit-identical.  Superblocks that are
    entirely zero are dropped; sparsity_pct generally decreases when the
    new blocks are coarser than the sparsity structure.
    """
    if bsr.data.dtype != np.int8:
        raise ValueError("regroup_bsr expects int8 blocks")
    dense = bsr.to_dense(padded=False)
    return build_bsr_int8_direct(dense, new_block_h, new_block_w)


def effective_density(bsr: BSRMatrix, block_h: int, block_w: int) -> float:
    """Fraction of (block_h x block_w) superblocks that would be nonzero.

    Planning helper: tells you how much skip survives a regroup before
    paying for it (e.g. unstructured 14x14 sparsity regrouped to 128
    usually densifies; 128-structured pruning keeps its skip).
    """
    dense = bsr.to_dense(padded=False)
    H = -(-dense.shape[0] // block_h) * block_h
    W = -(-dense.shape[1] // block_w) * block_w
    padded = np.zeros((H, W), dtype=dense.dtype)
    padded[:dense.shape[0], :dense.shape[1]] = dense
    t = padded.reshape(H // block_h, block_h, W // block_w, block_w)
    nz = np.any(t != 0, axis=(1, 3))
    return float(nz.mean()) if nz.size else 0.0
