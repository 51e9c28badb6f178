"""BSR packing + serialization tests (edge cases from test_edges.py)."""

import numpy as np
import pytest

from resnet_accel_tpu.golden import matmul_int8, bsr_matmul_int8_wt
from resnet_accel_tpu.sparse import (
    BSRMatrix,
    build_bsr,
    build_bsr_int8_direct,
    conv_weight_to_2d,
    save_layer_dir,
    load_layer_dir,
    serialize_hw_stream,
    deserialize_hw_stream,
    pack_dma_image,
    unpack_dma_image,
)


def random_sparse(rng, shape, bh, bw, sparsity):
    W = rng.integers(-128, 128, shape).astype(np.int8)
    nbr, nbc = -(-shape[0] // bh), -(-shape[1] // bw)
    for br in range(nbr):
        for bc in range(nbc):
            if rng.random() < sparsity:
                W[br * bh:(br + 1) * bh, bc * bw:(bc + 1) * bw] = 0
    return W


class TestBuildBSR:
    def test_roundtrip_int8(self):
        rng = np.random.default_rng(0)
        W = random_sparse(rng, (60, 90), 14, 14, 0.7)
        bsr = build_bsr_int8_direct(W, 14)
        bsr.validate()
        np.testing.assert_array_equal(bsr.to_dense(), W)

    def test_padding_non_divisible(self):
        W = np.ones((15, 29), dtype=np.int8)
        bsr = build_bsr_int8_direct(W, 14)
        assert bsr.padded_shape == (28, 42)
        assert bsr.num_block_rows == 2 and bsr.num_block_cols == 3
        np.testing.assert_array_equal(bsr.to_dense(), W)
        padded = bsr.to_dense(padded=True)
        assert np.all(padded[15:] == 0) and np.all(padded[:, 29:] == 0)

    def test_all_zero(self):
        bsr = build_bsr_int8_direct(np.zeros((28, 28), np.int8), 14)
        assert bsr.nnz_blocks == 0
        assert bsr.sparsity_pct == 100.0
        bsr.validate()

    def test_fully_dense(self):
        rng = np.random.default_rng(1)
        W = rng.integers(1, 127, (28, 28)).astype(np.int8)
        bsr = build_bsr_int8_direct(W, 14)
        assert bsr.nnz_blocks == 4 and bsr.density == 1.0

    def test_l2_threshold_drops_small_blocks(self):
        W = np.zeros((28, 28), dtype=np.float32)
        W[0, 0] = 1e-7   # tiny norm block
        W[14, 14] = 1.0
        bsr = build_bsr(W, 14, threshold=1e-3)
        assert bsr.nnz_blocks == 1
        assert bsr.col_idx[0] == 1

    def test_quantize_per_row_scales(self):
        # Per-output-row quantization inside blocks (export_bsr_14x14:171-199).
        rng = np.random.default_rng(2)
        W = rng.normal(size=(28, 14)).astype(np.float32)
        scales = np.maximum(np.abs(W).max(axis=1) / 127.0, 1e-12)
        bsr = build_bsr(W, 14, quantize=True, scales=scales)
        assert bsr.data.dtype == np.int8
        dense_q = bsr.to_dense()
        expected = np.clip(np.rint(W / scales[:, None]), -128, 127)
        np.testing.assert_array_equal(dense_q, expected.astype(np.int8))

    def test_quantize_requires_scales(self):
        with pytest.raises(ValueError):
            build_bsr(np.ones((14, 14), np.float32), 14, quantize=True)

    def test_rectangular_blocks(self):
        rng = np.random.default_rng(3)
        W = rng.integers(-128, 128, (32, 256)).astype(np.int8)
        bsr = build_bsr_int8_direct(W, block_h=8, block_w=128)
        np.testing.assert_array_equal(bsr.to_dense(), W)

    def test_validate_catches_corruption(self):
        bsr = build_bsr_int8_direct(np.ones((28, 28), np.int8), 14)
        bad = BSRMatrix(bsr.data, bsr.row_ptr.copy(), bsr.col_idx.copy(),
                        bsr.shape, 14, 14)
        bad.col_idx[0] = 99
        with pytest.raises(ValueError):
            bad.validate()

    def test_conv_weight_flatten(self):
        w = np.arange(2 * 3 * 3 * 3, dtype=np.int8).reshape(2, 3, 3, 3)
        w2d = conv_weight_to_2d(w)
        assert w2d.shape == (2, 27)
        np.testing.assert_array_equal(w2d[0], w[0].reshape(-1))

    def test_matmul_through_bsr(self):
        rng = np.random.default_rng(4)
        W = random_sparse(rng, (42, 70), 14, 14, 0.5)
        A = rng.integers(-128, 128, (3, 70)).astype(np.int8)
        bsr = build_bsr_int8_direct(W, 14)
        C = bsr_matmul_int8_wt(A, bsr.data, bsr.row_ptr, bsr.col_idx,
                               14, 14, N=42)
        np.testing.assert_array_equal(C, matmul_int8(A, W.T))


class TestSerialization:
    def make(self):
        rng = np.random.default_rng(5)
        W = random_sparse(rng, (56, 84), 14, 14, 0.6)
        return build_bsr_int8_direct(W, 14)

    def test_layer_dir_roundtrip(self, tmp_path):
        bsr = self.make()
        save_layer_dir(bsr, str(tmp_path / "fc"), "fc")
        loaded = load_layer_dir(str(tmp_path / "fc"))
        np.testing.assert_array_equal(loaded.data, bsr.data)
        np.testing.assert_array_equal(loaded.row_ptr, bsr.row_ptr)
        np.testing.assert_array_equal(loaded.col_idx, bsr.col_idx)
        assert loaded.shape == bsr.shape

    def test_hw_stream_roundtrip(self):
        bsr = self.make()
        buf = serialize_hw_stream(bsr)
        # 12B header + row_ptr u16 + col_idx u16 + blocks
        assert len(buf) == 12 + (bsr.num_block_rows + 1) * 2 \
            + bsr.nnz_blocks * 2 + bsr.nnz_blocks * 196
        out = deserialize_hw_stream(buf, 14, 14, shape=bsr.shape)
        np.testing.assert_array_equal(out.data, bsr.data)
        np.testing.assert_array_equal(out.row_ptr, bsr.row_ptr)
        np.testing.assert_array_equal(out.col_idx, bsr.col_idx)

    def test_dma_image_roundtrip(self):
        bsr = self.make()
        buf = pack_dma_image(bsr)
        out = unpack_dma_image(buf, bsr.num_block_rows, bsr.nnz_blocks,
                               14, 14, shape=bsr.shape)
        np.testing.assert_array_equal(out.data, bsr.data)
        np.testing.assert_array_equal(out.to_dense(), bsr.to_dense())

    def test_dma_image_crc_roundtrip(self):
        bsr = self.make()
        buf = pack_dma_image(bsr, crc=True)
        assert len(buf) == len(pack_dma_image(bsr)) + 4
        out = unpack_dma_image(buf, bsr.num_block_rows, bsr.nnz_blocks,
                               14, 14, shape=bsr.shape, crc=True)
        np.testing.assert_array_equal(out.to_dense(), bsr.to_dense())

    def test_dma_image_crc_detects_corruption(self):
        import pytest
        bsr = self.make()
        buf = bytearray(pack_dma_image(bsr, crc=True))
        buf[len(buf) // 2] ^= 0x40  # flip one payload bit
        with pytest.raises(ValueError, match="CRC mismatch"):
            unpack_dma_image(bytes(buf), bsr.num_block_rows,
                             bsr.nnz_blocks, 14, 14, shape=bsr.shape,
                             crc=True)
