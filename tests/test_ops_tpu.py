"""TPU compute path vs numpy goldens — bit-exact, on CPU interpret mode.

The backend seam pins these to the CPU "software model" (conftest sets
RESNET_ACCEL_TPU_BACKEND=cpu), mirroring how the reference tests its
driver against SoftwareModelBackend before touching hardware.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from resnet_accel_tpu import golden
from resnet_accel_tpu.ops import (
    matmul_int8,
    matmul_int8_xla,
    conv2d_int8,
    im2col_nchw,
    maxpool2d_int8,
    avgpool_global_int8,
    requantize,
    requantize_q16,
    requant_factors,
    add_residual,
    quantize_input,
)
from resnet_accel_tpu.quant import bias_to_int32


def rand_i8(rng, shape):
    return rng.integers(-128, 128, shape).astype(np.int8)


class TestMatmul:
    @pytest.mark.parametrize("use_pallas", [False, True])
    @pytest.mark.parametrize("shape", [
        (4, 64, 32),         # small, all dims unaligned
        (1, 9216, 128),      # FC1 geometry, batch 1
        (33, 100, 130),      # ragged everything
        (128, 256, 256),     # aligned
    ])
    def test_raw_int32_bit_exact(self, shape, use_pallas):
        rng = np.random.default_rng(0)
        M, K, N = shape
        A, B = rand_i8(rng, (M, K)), rand_i8(rng, (K, N))
        out = matmul_int8(jnp.asarray(A), jnp.asarray(B),
                          use_pallas=use_pallas)
        np.testing.assert_array_equal(np.asarray(out),
                                      golden.matmul_int8(A, B))

    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_fused_bias_relu_requant(self, use_pallas):
        rng = np.random.default_rng(1)
        M, K, N = 16, 192, 72
        A, B = rand_i8(rng, (M, K)), rand_i8(rng, (K, N))
        wgt_scales = rng.uniform(0.001, 0.02, N).astype(np.float32)
        act_scale, out_scale = 0.015, 0.05
        bias = rng.integers(-5000, 5000, N).astype(np.int32)
        factors = requant_factors(act_scale, wgt_scales, out_scale)

        out = matmul_int8(
            jnp.asarray(A), jnp.asarray(B), bias=jnp.asarray(bias),
            factors=factors, relu=True, use_pallas=use_pallas)
        assert np.asarray(out).dtype == np.int8

        acc = golden.matmul_int8(A, B).astype(np.int64) + bias[None, :]
        acc = np.maximum(acc, 0).astype(np.int32)
        expected = np.clip(
            np.rint(acc.astype(np.float32) * factors[None, :]),
            -128, 127).astype(np.int8)
        np.testing.assert_array_equal(np.asarray(out), expected)

    def test_pallas_matches_xla(self):
        rng = np.random.default_rng(2)
        A, B = rand_i8(rng, (64, 384)), rand_i8(rng, (384, 192))
        p = matmul_int8(jnp.asarray(A), jnp.asarray(B), use_pallas=True)
        x = matmul_int8_xla(jnp.asarray(A), jnp.asarray(B))
        np.testing.assert_array_equal(np.asarray(p), np.asarray(x))

    def test_shape_mismatch(self):
        with pytest.raises(ValueError):
            matmul_int8(jnp.zeros((2, 3), jnp.int8),
                        jnp.zeros((4, 5), jnp.int8))


class TestEpilogue:
    def test_requantize_bit_exact(self):
        rng = np.random.default_rng(3)
        acc = rng.integers(-(2**20), 2**20, (37, 53)).astype(np.int32)
        out = requantize(jnp.asarray(acc), np.float32(0.01) / np.float32(0.07))
        exp = golden.requantize_int32_to_int8(acc, 0.01, 0.07)
        np.testing.assert_array_equal(np.asarray(out), exp)

    def test_requantize_ties(self):
        acc = jnp.asarray([1, 3, 5, -5], jnp.int32)
        out = requantize(acc, np.float32(0.5))
        np.testing.assert_array_equal(np.asarray(out), [0, 2, 2, -2])

    @pytest.mark.parametrize("scale_q16", [0x0001, 0x1234, 0x8000, 0xFFFF])
    @pytest.mark.parametrize("relu", [False, True])
    def test_requantize_q16_bit_exact(self, scale_q16, relu):
        # Hardware-replay path: the int32-decomposed device op must match
        # the 64-bit golden on the full int32 range, including extremes.
        rng = np.random.default_rng(6)
        acc = rng.integers(-(2**31), 2**31, 4096).astype(np.int64)
        acc = np.concatenate(
            [acc, [2**31 - 1, -(2**31), 0, -1, 1, 65535, -65536, -65537]]
        ).astype(np.int32)
        fn = jax.jit(lambda a: requantize_q16(a, scale_q16, relu=relu))
        out = fn(jnp.asarray(acc))
        exp = golden.requantize_q16(acc, scale_q16, relu=relu)
        np.testing.assert_array_equal(np.asarray(out), exp)

    def test_residual_bit_exact(self):
        rng = np.random.default_rng(4)
        m = rand_i8(rng, (4, 64))
        r = rand_i8(rng, (4, 64))
        out = add_residual(jnp.asarray(m), jnp.asarray(r), 0.03, 0.05, 0.04)
        exp = golden.add_residual_int8(m, r, 0.03, 0.05, 0.04)
        np.testing.assert_array_equal(np.asarray(out), exp)

    def test_quantize_input_matches_reference_formula(self):
        rng = np.random.default_rng(5)
        x = rng.normal(size=(8, 8)).astype(np.float32)
        s = 0.0123
        out = quantize_input(jnp.asarray(x), s)
        exp = np.clip(np.rint(x / np.float32(s)), -128, 127).astype(np.int8)
        np.testing.assert_array_equal(np.asarray(out), exp)


class TestConv:
    @pytest.mark.parametrize("stride,pad", [(1, 0), (1, 1), (2, 1)])
    def test_im2col_matches_golden(self, stride, pad):
        rng = np.random.default_rng(6)
        x = rand_i8(rng, (2, 3, 9, 9))
        cols = np.asarray(im2col_nchw(jnp.asarray(x), 3, stride, pad))
        for n in range(2):
            g = golden.im2col_int8(x[n], 3, stride, pad)  # [CKK, P]
            np.testing.assert_array_equal(cols[n], g.T)

    @pytest.mark.parametrize("use_pallas", [False, True])
    def test_conv_raw_bit_exact(self, use_pallas):
        rng = np.random.default_rng(7)
        x = rand_i8(rng, (2, 3, 12, 12))
        w = rand_i8(rng, (8, 3, 3, 3))
        b = rng.integers(-1000, 1000, 8).astype(np.int32)
        out = conv2d_int8(
            jnp.asarray(x), jnp.asarray(w.reshape(8, -1)),
            bias=jnp.asarray(b), kernel=3, stride=1, padding=1,
            use_pallas=use_pallas)
        assert out.shape == (2, 8, 12, 12)
        for n in range(2):
            exp = golden.conv2d_int8_simple(x[n], w, b, 1, 1)
            np.testing.assert_array_equal(np.asarray(out[n]), exp)

    def test_conv_fused_requant_relu(self):
        rng = np.random.default_rng(8)
        x = rand_i8(rng, (1, 4, 8, 8))
        w = rand_i8(rng, (6, 4, 3, 3))
        wgt_scales = rng.uniform(0.001, 0.01, 6).astype(np.float32)
        factors = requant_factors(0.02, wgt_scales, 0.06)
        out = conv2d_int8(
            jnp.asarray(x), jnp.asarray(w.reshape(6, -1)), kernel=3,
            factors=factors, relu=True)
        acc = golden.conv2d_int8_simple(x[0], w, None, 1, 0)
        acc = np.maximum(acc, 0)
        exp = np.clip(
            np.rint(acc.astype(np.float32) * factors[:, None, None]),
            -128, 127).astype(np.int8)
        np.testing.assert_array_equal(np.asarray(out[0]), exp)


class TestPooling:
    def test_maxpool_bit_exact(self):
        rng = np.random.default_rng(9)
        x = rand_i8(rng, (2, 4, 10, 10))
        out = np.asarray(maxpool2d_int8(jnp.asarray(x), 2, 2))
        for n in range(2):
            exp = golden.maxpool2d_int8(x[n], 2, 2)
            np.testing.assert_array_equal(out[n], exp)

    def test_avgpool_bit_exact_incl_negatives(self):
        rng = np.random.default_rng(10)
        x = rand_i8(rng, (3, 5, 7, 7))
        out = np.asarray(avgpool_global_int8(jnp.asarray(x)))
        for n in range(3):
            exp = golden.avgpool_global_int8(x[n])
            np.testing.assert_array_equal(out[n], exp)
