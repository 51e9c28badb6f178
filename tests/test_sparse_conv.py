"""Fused-gather sparse conv kernel vs golden — bit-exact."""

import numpy as np
import pytest
import jax.numpy as jnp

from resnet_accel_tpu import golden
from resnet_accel_tpu.ops import requant_factors
from resnet_accel_tpu.ops.sparse_conv import pack_conv_bsr, sparse_conv2d_int8


def sparse_conv_weight(rng, o, c, k, block_o, block_c, sparsity):
    """Tap-aligned block-sparse conv weights."""
    w = rng.integers(-128, 128, (o, c, k, k)).astype(np.int8)
    for kh in range(k):
        for kw in range(k):
            for cb in range(c // block_c):
                for ob in range(-(-o // block_o)):
                    if rng.random() < sparsity:
                        w[ob * block_o:(ob + 1) * block_o,
                          cb * block_c:(cb + 1) * block_c, kh, kw] = 0
    return w


class TestPackConvBSR:
    def test_counts(self):
        rng = np.random.default_rng(0)
        w = sparse_conv_weight(rng, 128, 128, 3, 128, 128, 0.5)
        cb = pack_conv_bsr(w, padding=1)
        assert cb.total_source == 9
        assert 0.1 < cb.sparsity < 0.9

    def test_c_not_divisible_raises(self):
        with pytest.raises(ValueError):
            pack_conv_bsr(np.zeros((128, 96, 3, 3), np.int8), 1,
                          block_c=128)


class TestSparseConvKernel:
    @pytest.mark.parametrize("sparsity", [0.0, 0.5])
    def test_bit_exact_vs_golden(self, sparsity):
        rng = np.random.default_rng(1)
        O, C, K = 128, 128, 3
        w = sparse_conv_weight(rng, O, C, K, 128, 128, sparsity)
        x = rng.integers(-128, 128, (2, C, 10, 10)).astype(np.int8)
        bias = rng.integers(-2000, 2000, O).astype(np.int32)
        cbsr = pack_conv_bsr(w, padding=1)
        out = np.asarray(sparse_conv2d_int8(
            jnp.asarray(x), cbsr, bias=jnp.asarray(bias)))
        exp = np.stack([
            golden.conv2d_int8_simple(x[i], w, bias, 1, 1)
            for i in range(2)])
        np.testing.assert_array_equal(out, exp)

    def test_fused_requant_relu(self):
        rng = np.random.default_rng(2)
        O, C, K = 64, 64, 3
        w = sparse_conv_weight(rng, O, C, K, 64, 64, 0.4)
        x = rng.integers(-128, 128, (1, C, 8, 8)).astype(np.int8)
        ws = rng.uniform(0.001, 0.01, O).astype(np.float32)
        f = requant_factors(0.02, ws, 0.06)
        cbsr = pack_conv_bsr(w, padding=1, block_o=64, block_c=64)
        out = np.asarray(sparse_conv2d_int8(
            jnp.asarray(x), cbsr, factors=f, relu=True))
        acc = golden.conv2d_int8_simple(x[0], w, None, 1, 1)
        acc = np.maximum(acc, 0)
        exp = np.clip(np.rint(acc.astype(np.float32)
                              * f[:, None, None]), -128, 127).astype(np.int8)
        np.testing.assert_array_equal(out[0], exp)

    def test_non_multiple_batch(self):
        rng = np.random.default_rng(3)
        w = sparse_conv_weight(rng, 128, 128, 3, 128, 128, 0.3)
        x = rng.integers(-128, 128, (3, 128, 6, 6)).astype(np.int8)
        cbsr = pack_conv_bsr(w, padding=1)
        out = np.asarray(sparse_conv2d_int8(jnp.asarray(x), cbsr,
                                            img_tile=2))
        exp = np.stack([golden.conv2d_int8_simple(x[i], w, None, 1, 1)
                        for i in range(3)])
        np.testing.assert_array_equal(out, exp)

    def test_all_zero_weights(self):
        w = np.zeros((128, 128, 3, 3), np.int8)
        x = np.ones((1, 128, 6, 6), np.int8)
        cbsr = pack_conv_bsr(w, padding=1)
        assert cbsr.nnz_source == 0
        out = np.asarray(sparse_conv2d_int8(jnp.asarray(x), cbsr))
        assert np.all(out == 0)

    @pytest.mark.parametrize("hw", [8, 9])
    def test_stride2_3x3_bit_exact(self, hw):
        rng = np.random.default_rng(5)
        O, C, K = 128, 128, 3
        w = sparse_conv_weight(rng, O, C, K, 128, 128, 0.4)
        x = rng.integers(-128, 128, (2, C, hw, hw)).astype(np.int8)
        bias = rng.integers(-2000, 2000, O).astype(np.int32)
        cbsr = pack_conv_bsr(w, padding=1)
        out = np.asarray(sparse_conv2d_int8(
            jnp.asarray(x), cbsr, bias=jnp.asarray(bias), stride=2))
        exp = np.stack([
            golden.conv2d_int8_simple(x[i], w, bias, 2, 1)
            for i in range(2)])
        np.testing.assert_array_equal(out, exp)

    def test_stride2_1x1_downsample_shape(self):
        # The ResNet-18 downsample conv: 1x1, stride 2, padding 0.
        rng = np.random.default_rng(6)
        O, C = 128, 64
        w = sparse_conv_weight(rng, O, C, 1, 128, 64, 0.5)
        x = rng.integers(-128, 128, (2, C, 8, 8)).astype(np.int8)
        cbsr = pack_conv_bsr(w, padding=0, block_c=64)
        out = np.asarray(sparse_conv2d_int8(jnp.asarray(x), cbsr,
                                            stride=2))
        exp = np.stack([golden.conv2d_int8_simple(x[i], w, None, 2, 0)
                        for i in range(2)])
        np.testing.assert_array_equal(out, exp)

    def test_stride2_fused_requant_relu(self):
        rng = np.random.default_rng(7)
        O, C, K = 64, 64, 3
        w = sparse_conv_weight(rng, O, C, K, 64, 64, 0.4)
        x = rng.integers(-128, 128, (1, C, 9, 9)).astype(np.int8)
        ws = rng.uniform(0.001, 0.01, O).astype(np.float32)
        f = requant_factors(0.02, ws, 0.06)
        cbsr = pack_conv_bsr(w, padding=1, block_o=64, block_c=64)
        out = np.asarray(sparse_conv2d_int8(
            jnp.asarray(x), cbsr, factors=f, relu=True, stride=2))
        acc = golden.conv2d_int8_simple(x[0], w, None, 2, 1)
        acc = np.maximum(acc, 0)
        exp = np.clip(np.rint(acc.astype(np.float32)
                              * f[:, None, None]), -128, 127).astype(np.int8)
        np.testing.assert_array_equal(out[0], exp)

    def test_output_channels_not_multiple(self):
        rng = np.random.default_rng(4)
        # O=100 pads to block_o grid
        w = rng.integers(-128, 128, (100, 128, 3, 3)).astype(np.int8)
        x = rng.integers(-128, 128, (1, 128, 6, 6)).astype(np.int8)
        cbsr = pack_conv_bsr(w, padding=1)
        out = np.asarray(sparse_conv2d_int8(jnp.asarray(x), cbsr))
        exp = golden.conv2d_int8_simple(x[0], w, None, 1, 1)
        np.testing.assert_array_equal(out[0], exp)
