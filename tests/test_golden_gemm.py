"""Golden GEMM tests — dense, BSR, edge cases.

Re-expresses the reference's golden test strategy
(sw/tests/test_golden_models.py, sw/tests/test_edges.py): dense vs sparse
equivalence, zero-column cases, row_ptr indexing invariants, empty rows,
100% dense / 100% sparse, non-divisible shapes.
"""

import numpy as np
import pytest

from resnet_accel_tpu.golden import (
    matmul_int8,
    bsr_matmul_int8,
    bsr_matmul_int8_wt,
)


def dense_to_bsr(W, bh, bw, drop_zero=True):
    """Minimal dense->BSR packer for tests (padding with zeros)."""
    H, K = W.shape
    ph, pw = -H % bh, -K % bw
    Wp = np.pad(W, ((0, ph), (0, pw)))
    nbr, nbc = Wp.shape[0] // bh, Wp.shape[1] // bw
    data, col_idx, row_ptr = [], [], [0]
    for br in range(nbr):
        for bc in range(nbc):
            blk = Wp[br * bh:(br + 1) * bh, bc * bw:(bc + 1) * bw]
            if not drop_zero or np.any(blk != 0):
                data.append(blk)
                col_idx.append(bc)
        row_ptr.append(len(data))
    data = (np.stack(data) if data
            else np.zeros((0, bh, bw), dtype=W.dtype))
    return data.astype(np.int8), np.array(row_ptr), np.array(col_idx)


class TestDenseMatmul:
    def test_known_values(self):
        A = np.array([[1, 2], [3, 4]], dtype=np.int8)
        B = np.array([[5, 6], [7, 8]], dtype=np.int8)
        C = matmul_int8(A, B)
        np.testing.assert_array_equal(C, [[19, 22], [43, 50]])
        assert C.dtype == np.int32

    def test_extremes_no_overflow(self):
        A = np.full((4, 1024), -128, dtype=np.int8)
        B = np.full((1024, 4), -128, dtype=np.int8)
        C = matmul_int8(A, B)
        assert np.all(C == 1024 * 16384)

    def test_int32_wraparound(self):
        # 140000 * 16384 = 2.29e9 overflows int32; golden must wrap like C.
        K = 140000
        A = np.full((1, K), -128, dtype=np.int8)
        B = np.full((K, 1), -128, dtype=np.int8)
        C = matmul_int8(A, B)
        expected = np.int64(K * 16384)
        wrapped = np.int64(np.uint32(expected)).astype(np.int64)
        if wrapped >= 2**31:
            wrapped -= 2**32
        assert C[0, 0] == np.int32(wrapped)

    def test_shape_mismatch_raises(self):
        with pytest.raises(ValueError):
            matmul_int8(np.zeros((2, 3), np.int8), np.zeros((4, 2), np.int8))


class TestBsrMatmul:
    def rng(self):
        return np.random.default_rng(42)

    @pytest.mark.parametrize("bh,bw", [(14, 14), (8, 8), (4, 4), (128, 128)])
    def test_fully_dense_matches_dense(self, bh, bw):
        rng = self.rng()
        M, K, N = 16, 4 * bh, 3 * bw
        A = rng.integers(-128, 128, (M, K)).astype(np.int8)
        B = rng.integers(-128, 128, (K, N)).astype(np.int8)
        data, row_ptr, col_idx = dense_to_bsr(B, bh, bw, drop_zero=False)
        C = bsr_matmul_int8(A, data, row_ptr, col_idx, M, K, N, bh, bw)
        np.testing.assert_array_equal(C, matmul_int8(A, B))

    def test_sparse_matches_dense(self):
        rng = self.rng()
        bh = bw = 14
        M, K, N = 8, 14 * 6, 14 * 5
        B = rng.integers(-128, 128, (K, N)).astype(np.int8)
        # Zero out ~60% of blocks.
        for br in range(6):
            for bc in range(5):
                if rng.random() < 0.6:
                    B[br * 14:(br + 1) * 14, bc * 14:(bc + 1) * 14] = 0
        A = rng.integers(-128, 128, (M, K)).astype(np.int8)
        data, row_ptr, col_idx = dense_to_bsr(B, bh, bw)
        C = bsr_matmul_int8(A, data, row_ptr, col_idx, M, K, N, bh, bw)
        np.testing.assert_array_equal(C, matmul_int8(A, B))

    def test_empty_block_rows_skipped(self):
        # Entire block rows of zeros (edge case from test_edges.py).
        bh = bw = 8
        M, K, N = 4, 32, 16
        B = np.zeros((K, N), dtype=np.int8)
        B[8:16] = 3  # only block-row 1 nonzero
        A = np.ones((M, K), dtype=np.int8)
        data, row_ptr, col_idx = dense_to_bsr(B, bh, bw)
        assert row_ptr[1] == row_ptr[0]  # row 0 empty
        C = bsr_matmul_int8(A, data, row_ptr, col_idx, M, K, N, bh, bw)
        np.testing.assert_array_equal(C, matmul_int8(A, B))

    def test_all_zero_matrix(self):
        bh = bw = 14
        M, K, N = 4, 28, 28
        B = np.zeros((K, N), dtype=np.int8)
        A = np.ones((M, K), dtype=np.int8)
        data, row_ptr, col_idx = dense_to_bsr(B, bh, bw)
        assert len(col_idx) == 0
        C = bsr_matmul_int8(A, data, row_ptr, col_idx, M, K, N, bh, bw)
        assert np.all(C == 0)

    def test_single_block(self):
        bh = bw = 14
        M, K, N = 2, 28, 28
        B = np.zeros((K, N), dtype=np.int8)
        B[14:28, 0:14] = 2
        A = np.ones((M, K), dtype=np.int8)
        data, row_ptr, col_idx = dense_to_bsr(B, bh, bw)
        assert len(col_idx) == 1 and col_idx[0] == 0
        C = bsr_matmul_int8(A, data, row_ptr, col_idx, M, K, N, bh, bw)
        np.testing.assert_array_equal(C, matmul_int8(A, B))

    def test_partial_edge_blocks_masked(self):
        # K and N not multiples of the block: padded blocks must be masked
        # exactly like the k>=K / n>=N skips in the C++ golden.
        rng = self.rng()
        bh = bw = 14
        M, K, N = 5, 30, 20  # pads to 42 x 28
        B = rng.integers(-128, 128, (K, N)).astype(np.int8)
        A = rng.integers(-128, 128, (M, K)).astype(np.int8)
        data, row_ptr, col_idx = dense_to_bsr(B, bh, bw, drop_zero=False)
        C = bsr_matmul_int8(A, data, row_ptr, col_idx, M, K, N, bh, bw)
        np.testing.assert_array_equal(C, matmul_int8(A, B))

    def test_row_ptr_invariants(self):
        rng = self.rng()
        B = rng.integers(-128, 128, (56, 56)).astype(np.int8)
        data, row_ptr, col_idx = dense_to_bsr(B, 14, 14)
        assert row_ptr[0] == 0
        assert row_ptr[-1] == len(col_idx) == len(data)
        assert np.all(np.diff(row_ptr) >= 0)


class TestBsrMatmulWT:
    """Weight-transposed orientation (exported-artifact layout)."""

    def test_matches_dense_transpose(self):
        rng = np.random.default_rng(7)
        bh = bw = 14
        N_out, K = 28, 56
        W = rng.integers(-128, 128, (N_out, K)).astype(np.int8)
        W[0:14, 14:28] = 0
        A = rng.integers(-128, 128, (3, K)).astype(np.int8)
        data, row_ptr, col_idx = dense_to_bsr(W, bh, bw)
        C = bsr_matmul_int8_wt(A, data, row_ptr, col_idx, bh, bw, N=N_out)
        np.testing.assert_array_equal(C, matmul_int8(A, W.T))

    def test_padded_output_default(self):
        rng = np.random.default_rng(8)
        # N=10 outputs pad to 14 (one block row), like fc2 [10, 128].
        W = rng.integers(-128, 128, (10, 28)).astype(np.int8)
        A = rng.integers(-128, 128, (2, 28)).astype(np.int8)
        data, row_ptr, col_idx = dense_to_bsr(W, 14, 14, drop_zero=False)
        C = bsr_matmul_int8_wt(A, data, row_ptr, col_idx, 14, 14)
        assert C.shape == (2, 14)
        np.testing.assert_array_equal(C[:, :10], matmul_int8(A, W.T))
        assert np.all(C[:, 10:] == 0)  # padded rows are zero weights
